package graft.llmdata

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MinHash-LSH index maintenance — the shape near-dup
  * detection takes in a production ingest pipeline. dd03's batch form
  * re-shingles, re-signs, and re-bands the WHOLE corpus every run —
  * O(corpus) per run, unacceptable once the corpus dwarfs the daily
  * batch. Here the (band, key → doc_id) index persists as a bucketed
  * table: each new batch is signed ONCE (same codegen kernel chain as
  * dd03), probed against the index for cross-batch candidates, self-
  * joined for within-batch candidates, and appended. Per-batch cost is
  * O(batch + collisions).
  *
  * Scale shape: the index is bucketed (and sorted) on `key`, so the
  * probe join shuffles only the tiny batch side into the bucket
  * layout and reads index buckets co-located — the index is NEVER
  * shuffled, re-signed, or rewritten (append-only). This is the same
  * co-location contract BucketingSpec proves for fact-fact joins.
  * Candidate semantics match [[DedupFunctions.lshCandidates]] exactly:
  * feeding the corpus through in any batch split yields the same pair
  * set as one batch run (IncrementalLshSpec).
  */
object IncrementalLsh {

  /** (doc_id, band, key) LSH band keys of a batch — shingle → MinHash
    * signature → band keys, all codegen kernels. Documents with no
    * shingles (< 2 tokens) produce no keys, matching dd03. */
  def bandKeys(docs: DataFrame, k: Int = 8, bands: Int = 4,
               rowsPerBand: Int = 2): DataFrame = {
    require(k >= bands * rowsPerBand,
      s"signature length $k shorter than bands*rows = ${bands * rowsPerBand}")
    docs.select(col("doc_id"),
        graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
          .as("th"))
      .filter(size(col("th")) > 0)
      .select(col("doc_id"),
        DedupFunctions.minhashSignature(col("th"), k).as("sig"))
      .select(col("doc_id"), posexplode(
        graft.functions.HashExpressions.lshBandKeys(col("sig"), bands,
          rowsPerBand)))
      .toDF("doc_id", "band", "key")
  }

  /** Enforce the doc_id-disjoint contract: drop batch rows whose
    * doc_id is already in the index. Re-feeding an indexed id would
    * silently duplicate its index rows and re-emit its pairs — a
    * silent corruption of the candidate stream — so violation is made
    * HARMLESS here rather than trusted away. The guard also makes
    * [[indexBatch]] replay-idempotent (a crashed-then-replayed batch
    * finds its ids indexed and contributes nothing).
    *
    * Cost shape: the index side is a column-pruned scan of doc_id
    * semi-filtered against the BROADCAST batch ids (micro-batches are
    * small by contract), so the index is never shuffled; the surviving
    * collision set is ≤ batch-size and is broadcast back for the
    * anti-join. O(index scan of one column + batch), zero wide
    * shuffles. */
  /** Heal a crashed [[compact]] swap. The swap is write-tmp → drop →
    * rename; a crash between drop and rename leaves the fully-
    * compacted copy under `<table>_compacting` and NOTHING under the
    * index name — and an unhealed [[indexBatch]] would then see
    * tableExists=false, treat every doc as fresh, and silently
    * recreate an EMPTY index, losing all history and every future
    * batch-vs-history pair. Both entry points call this first, so the
    * crash window needs no manual repair: if the main table is absent
    * but the compacted copy exists, the copy (which holds the complete
    * pre-crash index — compaction only rewrites layout) is renamed
    * into place. */
  private[llmdata] def recoverCompacting(spark: SparkSession,
                                         indexTable: String): Unit = {
    val tmp = s"${indexTable}_compacting"
    if (!spark.catalog.tableExists(indexTable) &&
        spark.catalog.tableExists(tmp))
      spark.sql(s"ALTER TABLE $tmp RENAME TO $indexTable")
  }

  private[graft] def freshOnly(spark: SparkSession, indexTable: String,
                               docs: DataFrame): DataFrame =
    if (!spark.catalog.tableExists(indexTable)) docs
    else {
      val batchIds = docs.select("doc_id").distinct()
      val already = spark.table(indexTable).select("doc_id")
        .join(broadcast(batchIds), Seq("doc_id"), "left_semi").distinct()
      docs.join(broadcast(already), Seq("doc_id"), "left_anti")
    }

  /** Probe one batch against the historical index, then append its
    * keys. Returns the candidate near-dup pairs this batch surfaces:
    * batch-vs-history plus within-batch, as distinct (id_a, id_b)
    * with id_a < id_b — the exact [[DedupFunctions.lshCandidates]]
    * contract, delivered incrementally. The returned frame is
    * materialized (localCheckpoint) BEFORE the append so its lineage
    * cannot observe the batch's own keys through the index.
    *
    * Batches are expected doc_id-DISJOINT (each document indexed
    * exactly once — feed from an exactly-once deduped source such as
    * [[graft.streaming.DocumentIngest]]'s merge output); violations
    * are enforced harmless by [[freshOnly]], which drops already-
    * indexed ids (so a full re-feed is a no-op: no duplicate index
    * rows, no re-emitted pairs).
    *
    * `pairsSink` (optional) is invoked with the materialized pairs
    * BEFORE the index append: a caller that persists pairs durably in
    * the sink gets crash-safety ordering for free — if the process
    * dies before the append, a replay recomputes and rewrites the
    * same pairs (ids still unindexed); if it dies after the append,
    * a replay is dropped whole by the guard and the already-persisted
    * pairs stand. See [[graft.streaming.StreamingLshJob]].
    */
  def indexBatch(spark: SparkSession, indexTable: String, docs: DataFrame,
                 k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2,
                 buckets: Int = 16,
                 pairsSink: DataFrame => Unit = _ => ()): DataFrame = {
    recoverCompacting(spark, indexTable) // heal a crashed compact swap
    // signed once, used three times (history probe, self-join, append)
    val keys = bandKeys(freshOnly(spark, indexTable, docs), k, bands,
      rowsPerBand).localCheckpoint(true)
    val a = keys.toDF("id_a", "band", "key")
    val b = keys.toDF("id_b", "band", "key")
    val within = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val pairs =
      if (spark.catalog.tableExists(indexTable)) {
        val hist = spark.table(indexTable).toDF("id_b", "band", "key")
        // history ids and batch ids can interleave — canonicalize
        val cross = keys.toDF("id_a", "band", "key")
          .join(hist, Seq("band", "key"))
          .filter(col("id_a") =!= col("id_b"))
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"))
        within.union(cross).distinct()
      } else within.distinct()
    val out = pairs.localCheckpoint(true)
    pairsSink(out)
    keys.write.mode(SaveMode.Append).format("parquet")
      .bucketBy(buckets, "key").sortBy("key").saveAsTable(indexTable)
    keys.unpersist()
    out
  }

  /** Bucket-preserving compaction of the index table. Every
    * [[indexBatch]] append adds one file set per bucket it touches;
    * at streaming cadence (~3-min triggers → ~480 appends/day) the
    * probe join's co-located read degrades into hundreds of tiny
    * files per bucket. This rewrites the table to ONE file per
    * occupied bucket while keeping the `bucketBy(buckets, "key")`
    * layout the probe relies on: `repartition(buckets, key)` uses
    * exactly Spark's bucket hash (murmur3 pmod buckets), so each
    * write task holds precisely one bucket's rows and bucketBy emits
    * a single file for it.
    *
    * Cost is O(index) — a maintenance operation for compaction
    * cadence (nightly), not per batch; appends stay O(batch). The
    * swap is write-tmp → drop → rename (a catalog without
    * transactional DDL has no single-step swap), but the crash window
    * between drop and rename SELF-HEALS: both [[compact]] and
    * [[indexBatch]] begin with [[recoverCompacting]], which renames a
    * leftover complete `<table>_compacting` copy back into place when
    * the main table is absent — no manual repair, no lost history.
    * Run from the single maintenance writer; do not interleave with
    * [[indexBatch]].
    */
  def compact(spark: SparkSession, indexTable: String,
              buckets: Int = 16): Unit = {
    recoverCompacting(spark, indexTable) // heal first — a leftover tmp
    // with no main table is the ONLY copy; dropping it would lose the
    // index (the pre-fix code did exactly that via DROP IF EXISTS)
    require(spark.catalog.tableExists(indexTable),
      s"no index table $indexTable to compact")
    val tmp = s"${indexTable}_compacting"
    // main exists, so any surviving tmp is a stale duplicate from a
    // crash BEFORE the drop — main is authoritative; redo from it
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.table(indexTable)
      .repartition(buckets, col("key"))
      .write.format("parquet")
      .bucketBy(buckets, "key").sortBy("key")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $indexTable")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $indexTable")
  }
}

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
    * shingles (< 2 tokens) produce no keys, matching dd03.
    *
    * The key is BAND-QUALIFIED (`"<band>:<group values>"`, unlike
    * dd03's bare group string): a band collision is only a valid LSH
    * collision within the SAME band, and folding the band index into
    * the key makes a key-only equi-join exact — which is what lets
    * the probe join carry a single join key matching the index's
    * `bucketBy(buckets, "key")` layout (see [[probeJoin]]). Keeping
    * `band` in the JOIN keys instead makes the planner disable the
    * bucketed scan and re-shuffle both sides on (band, key) — the
    * full-index shuffle this operator exists to avoid. */
  def bandKeys(docs: DataFrame, k: Int = 8, bands: Int = 4,
               rowsPerBand: Int = 2): DataFrame = {
    require(k >= bands * rowsPerBand,
      s"signature length $k shorter than bands*rows = ${bands * rowsPerBand}")
    // r17: redistribute before the shingle/minhash kernels when the
    // batch scan is under-split (guide §2.5) — identity at production
    // split counts
    graft.SparkUtil.parallelScan(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
          .as("th"))
      .filter(size(col("th")) > 0)
      .select(col("doc_id"),
        DedupFunctions.minhashSignature(col("th"), k).as("sig"))
      .select(col("doc_id"), posexplode(
        graft.functions.HashExpressions.lshBandKeys(col("sig"), bands,
          rowsPerBand)))
      .toDF("doc_id", "band", "key0")
      .select(col("doc_id"), col("band"),
        concat_ws(":", col("band"), col("key0")).as("key"))
  }

  // ---- doc_id Bloom sidecar (the freshOnly O(index)→O(batch) guard) --
  // The replay guard must know "is any of this batch's ids already
  // indexed?" — answered by a Bloom filter over doc_id kept as a
  // `_docid_bloom.bin` sidecar in the index table's directory (the
  // underscore prefix keeps every parquet read away from it; same
  // device as TableStore's `_keybloom.bin`). The filter is maintained
  // as a SUPERSET of indexed ids: it is absorbed BEFORE the append
  // (a crash between the two leaves ids in the bloom that are not in
  // the index — a false-positive-class slowdown, never corruption;
  // the reverse order would let a replayed batch slip past the guard
  // and silently duplicate index rows). A bloom MISS is therefore
  // definitive: the id was never indexed, and a batch of all-misses
  // — the steady-state no-replay case — skips the index id scan
  // entirely. Only bloom hits (true replays or false positives) pay
  // the column-pruned index confirmation scan. Single-writer, like
  // the index itself: the in-process cache assumes no other writer
  // appends ids behind our back.

  private val BloomItems = 1000000L
  private val BloomFpp = 0.01
  private[llmdata] val bloomCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]

  /** Catalog metadata of `table`, parsed as a real (possibly
    * db-qualified) identifier — `TableIdentifier(table)` treats
    * "docs.idx" as a BARE name in the current database and throws
    * NoSuchTableException for a table that tableExists just said is
    * there. */
  private def tableMeta(spark: SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))

  /** JVM-global cache key carrying the TABLE IDENTITY, not just the
    * name: a dropped-and-recreated (or migrate/compact-swapped) index
    * gets a new catalog createTime, so cached verdicts/payloads for
    * the old incarnation can never serve the new one — a stale
    * qualified-keys `true` would skip the format guard for the JVM's
    * lifetime, and a stale Bloom would silently drop fresh docs as
    * replays. Entries for dead incarnations are purged on the next
    * write/put for the same table name. The location is mixed in for
    * recreates that land elsewhere; a drop-and-recreate at the SAME
    * path within createTime's one-millisecond granularity could still
    * collide, accepted as implausible — any real recreate writes data
    * (many ms) before the first guarded probe. */
  private def cacheKey(spark: SparkSession, table: String): String = {
    val meta = tableMeta(spark, table)
    s"$table@${meta.createTime}@${meta.location}"
  }

  private def purgeStale(cache: scala.collection.concurrent.TrieMap[String, _],
                         table: String, keep: String): Unit =
    cache.keys.filter(k => (k == table || k.startsWith(table + "@")) &&
        k != keep)
      .foreach(cache.remove)

  private[llmdata] def bloomPath(spark: SparkSession,
                        table: String): java.nio.file.Path =
    java.nio.file.Paths.get(tableMeta(spark, table).location)
      .resolve("_docid_bloom.bin")

  private def bloomBytes(spark: SparkSession,
                         table: String): Option[Array[Byte]] = {
    val ck = cacheKey(spark, table)
    bloomCache.get(ck).orElse {
      val p = bloomPath(spark, table)
      if (!java.nio.file.Files.exists(p)) None
      else {
        val b = java.nio.file.Files.readAllBytes(p)
        bloomCache.put(ck, b)
        purgeStale(bloomCache, table, keep = ck)
        Some(b)
      }
    }
  }

  private def writeBloom(spark: SparkSession, table: String,
                         bytes: Array[Byte]): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val p = bloomPath(spark, table)
    val tmp = p.resolveSibling(s"._docid_bloom.${System.nanoTime()}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    val ck = cacheKey(spark, table)
    bloomCache.put(ck, bytes)
    purgeStale(bloomCache, table, keep = ck)
  }

  /** Bloom of a frame's doc_id column via the codegen runtime-filter
    * aggregate (no UDF, no driver loop); None on an empty frame. */
  private def aggIdBloom(df: DataFrame): Option[Array[Byte]] = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.util.sketch.{BloomFilter => SketchBloom}
    val bits = SketchBloom.optimalNumOfBits(BloomItems, BloomFpp)
    val agg = new BloomFilterAggregate(expression(xxhash64(col("doc_id"))),
      Literal(BloomItems), Literal(bits)).toAggregateExpression()
    Option(df.select(column(agg)).head().get(0))
      .map(_.asInstanceOf[Array[Byte]])
  }

  private def mightContainId(bloom: Array[Byte]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    column(BloomFilterMightContain(Literal(bloom, BinaryType),
      expression(xxhash64(col("doc_id")))))
  }

  /** OR `ids` into the sidecar — O(batch); filters merge because every
    * one is built with the same (items, bits). */
  private def bloomAbsorb(spark: SparkSession, table: String,
                          ids: DataFrame): Unit =
    aggIdBloom(ids).foreach { delta =>
      import org.apache.spark.util.sketch.{BloomFilter => SketchBloom}
      val merged = bloomBytes(spark, table) match {
        case Some(old) =>
          val f = SketchBloom.readFrom(old)
          f.mergeInPlace(SketchBloom.readFrom(delta))
          val out = new java.io.ByteArrayOutputStream()
          f.writeTo(out)
          out.toByteArray
        case None => delta
      }
      writeBloom(spark, table, merged)
    }

  // ---- key-format guard (r10 band-qualified keys) -------------------
  // r10 changed the index key from the bare '_'-joined signature group
  // to the band-qualified "<band>:<group>" (what makes the key-only
  // co-located probe exact). An index persisted by the old format
  // would silently match ZERO history rows against new-format batch
  // keys — and freshOnly's Bloom would keep the old docs from ever
  // being re-signed — losing every pair that spans the upgrade
  // boundary. So the format is CHECKED, loudly: one limit(1) probe per
  // table per JVM, cached after the first pass.

  private[llmdata] val qualifiedKeys =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Evict this table's JVM-global cache entries (the multi-MB doc_id
    * Bloom payload and the key-format verdict). Call when an index
    * table is dropped or abandoned — gate queries and tests create
    * nanoTime-named per-run indexes, and without eviction a
    * long-lived JVM accumulates a Bloom payload per run forever (the
    * same leak class the store caches closed with close()/dropRoot). */
  def dropCaches(indexTable: String): Unit = {
    purgeStale(bloomCache, indexTable, keep = "")
    purgeStale(qualifiedKeys, indexTable, keep = "")
  }

  private def requireQualifiedKeys(spark: SparkSession,
                                   indexTable: String): Unit =
    if (spark.catalog.tableExists(indexTable) &&
        !qualifiedKeys.getOrElse(cacheKey(spark, indexTable), false)) {
      // probe for a BARE key, not for any one row: a mixed-format
      // index (old history + a few qualified appends) must still
      // fail loud — an arbitrary limit(1) could sample a qualified
      // row and cache a false all-clear. The filter early-terminates
      // on the first bare row; the all-qualified case pays one
      // column-pruned key scan per table per JVM.
      val head = spark.table(indexTable).select("key")
        .filter(!col("key").contains(":")).limit(1).collect()
      if (head.nonEmpty)
        throw new IllegalStateException(
          s"index table $indexTable holds pre-r10 LSH keys (bare band " +
            "groups, no band qualifier) — probing it with the current " +
            "format would silently surface zero cross-boundary pairs. " +
            "Run IncrementalLsh.migrateKeyFormat(spark, " +
            s""""$indexTable") once to rewrite it in place.""")
      val ck = cacheKey(spark, indexTable)
      qualifiedKeys.put(ck, true)
      purgeStale(qualifiedKeys, indexTable, keep = ck)
    }

  /** One-time in-place rewrite of a pre-r10 index to band-qualified
    * keys — the [[compact]] swap (write-tmp → drop → rename, crash
    * window self-healing via [[recoverCompacting]]) with the key
    * mapping applied; already-qualified rows pass through unchanged,
    * so re-running is a no-op rewrite. The doc_id Bloom sidecar stays
    * valid (ids are untouched) and is carried across the swap. */
  def migrateKeyFormat(spark: SparkSession, indexTable: String,
                       buckets: Int = 16): Unit = {
    recoverCompacting(spark, indexTable)
    require(spark.catalog.tableExists(indexTable),
      s"no index table $indexTable to migrate")
    val tmp = s"${indexTable}_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    val savedBloom = bloomBytes(spark, indexTable)
    spark.table(indexTable)
      .select(col("doc_id"), col("band"),
        when(col("key").contains(":"), col("key"))
          .otherwise(concat_ws(":", col("band"), col("key"))).as("key"))
      .repartition(buckets, col("key"))
      .write.format("parquet")
      .bucketBy(buckets, "key").sortBy("key")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $indexTable")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $indexTable")
    savedBloom.foreach(writeBloom(spark, indexTable, _))
    // keyed to the POST-swap incarnation (the rename gives the table
    // a fresh createTime) — pre-migration verdicts go stale naturally
    val ck = cacheKey(spark, indexTable)
    qualifiedKeys.put(ck, true)
    purgeStale(qualifiedKeys, indexTable, keep = ck)
  }

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

  /** Enforce the doc_id-disjoint contract: drop batch rows whose
    * doc_id is already in the index. Re-feeding an indexed id would
    * silently duplicate its index rows and re-emit its pairs — a
    * silent corruption of the candidate stream — so violation is made
    * HARMLESS here rather than trusted away. The guard also makes
    * [[indexBatch]] replay-idempotent (a crashed-then-replayed batch
    * finds its ids indexed and contributes nothing).
    *
    * Cost shape: the Bloom sidecar answers the steady-state no-replay
    * case in O(batch) — batch ids are tested row-locally against the
    * filter, and if NONE hit, the batch is provably fresh (the filter
    * is a superset of indexed ids) and the index is never scanned at
    * all (r5's version scanned the index id column EVERY batch —
    * O(index) per micro-batch forever). Only bloom hits (true replays
    * or ~1% false positives) pay the old path: a column-pruned index
    * doc_id scan semi-filtered against the BROADCAST hit ids, the
    * surviving collision set (≤ batch) broadcast back for the
    * anti-join — the index is never shuffled. An index predating the
    * sidecar is seeded from its id column once: O(index) once,
    * O(batch) forever after. */
  private[graft] def freshOnly(spark: SparkSession, indexTable: String,
                               docs: DataFrame): DataFrame =
    if (!spark.catalog.tableExists(indexTable)) docs
    else {
      val bloom = bloomBytes(spark, indexTable).orElse {
        val seeded = aggIdBloom(spark.table(indexTable).select("doc_id"))
        seeded.foreach(writeBloom(spark, indexTable, _))
        seeded // None ⇔ index exists but holds no rows → nothing collides
      }
      bloom match {
        case None => docs
        case Some(b) =>
          val batchIds = docs.select("doc_id").distinct()
          val hits = batchIds.filter(mightContainId(b))
          if (hits.isEmpty) docs
          else {
            val already = spark.table(indexTable).select("doc_id")
              .join(broadcast(hits), Seq("doc_id"), "left_semi").distinct()
            docs.join(broadcast(already), Seq("doc_id"), "left_anti")
          }
      }
    }

  /** The history-probe join, shaped for the index's bucket layout:
    * the equi-join is on `key` ALONE — exact because [[bandKeys]]
    * band-qualifies the key — and a single join key matching
    * `bucketBy(buckets, "key")` is what lets the index scan keep
    * `HashPartitioning(key)` and read in place while only the batch
    * side shuffles into the bucket layout. The r10 production-shape
    * plan pin in IncrementalLshSpec exists because the obvious
    * (band, key) join instead makes the planner disable the bucketed
    * scan and re-shuffle BOTH sides — a full-index shuffle per batch
    * (a band-equality post-join filter doesn't survive either:
    * Catalyst folds it straight back into the join keys). */
  private[graft] def probeJoin(batchKeys: DataFrame,
                                 hist: DataFrame): DataFrame =
    batchKeys.select(col("doc_id").as("id_a"), col("key"))
      .join(hist.select(col("doc_id").as("id_b"), col("key")), Seq("key"))

  /** Probe-key literal ceiling for [[prunedHist]]. ≤ batch × bands
    * short strings on the driver — the bounded-collect class every
    * other prune here uses (ANN probed cells, corpus id buckets). */
  private val MaxProbeKeyLiterals = 8192

  /** The history side of the probe, pruned to the batch's own band
    * keys. [[probeJoin]] is an equi-join on `key`, so restricting the
    * index scan to `key IN (batch keys)` is lossless by construction —
    * and it is what bounds the probe's READ: the IN-set on the bucket
    * column lets Spark prune whole bucket FILES (SelectedBucketsCount
    * in the scan), and the per-file `sortBy("key")` layout lets
    * parquet row-group stats skip within the survivors, so a
    * steady-state trickle batch reads O(touched buckets), not the
    * whole index — the same read-amplification fix as
    * [[IncrementalCorpus]]'s scanRange pruning, shaped for a bucketed
    * catalog table (which `scanRange` zones don't cover). The filter
    * sits ABOVE the scan, so the bucketed layout (and the
    * ≤1-exchange plan pin) is untouched.
    *
    * `ceiling` bounds the IN-list's LITERAL count, and the gate is the
    * batch's ROW count — deliberately NOT its distinct-key count. The
    * row gate is load-bearing twice over (both learned by measuring):
    * r12 tried widening it to ceiling × bands rows and measured
    * +1.2 s/batch; r15 tried gating on distinct keys and a 16k-row
    * sf0.1 batch with 3,994 DISTINCT keys (near-dup docs share band
    * keys) slipped under the ceiling and paid ~1 s/batch for a
    * 3,994-literal IN on the probe scan — plan bloat and predicate
    * cost the unfiltered co-located scan simply doesn't have. Rows
    * bound literals from above, and a batch big enough to trip the
    * row gate amortizes its full-index read anyway.
    *
    * ONE driver job decides the gate AND produces the literals (the
    * r14 shape ran two: count(), then distinct+collect): each
    * partition counts its rows and collects distinct keys into a set
    * CAPPED at ceiling+1 — past the cap it keeps counting but stops
    * decoding key strings — and the driver folds (sum, capped merge).
    * Over the ceiling → the unfiltered scan; under → the merged array
    * IS the IN-list (distinct keys ≤ rows ≤ ceiling, so the cap never
    * truncates a pruned batch's literals). (Not distinct().limit(n)
    * .collect(): CollectLimit's executeTake scales partitions up
    * across MULTIPLE jobs when early partitions under-fill the limit
    * — the trickle case, always.) Runs over toRdd's InternalRows: the
    * decision needs one string column, not a Row-encoder pass. */
  private[graft] def prunedHist(spark: SparkSession, indexTable: String,
                                 batchKeys: DataFrame,
                                 ceiling: Int = MaxProbeKeyLiterals)
      : DataFrame = {
    val hist = spark.table(indexTable)
    val cap = ceiling + 1
    def merge(a: Array[String], b: Iterator[String]): Array[String] =
      if (a.length >= cap) a
      else {
        val s = scala.collection.mutable.LinkedHashSet.empty[String]
        s ++= a
        while (b.hasNext && s.size < cap) s += b.next()
        s.toArray
      }
    val (nRows, ks) = batchKeys.select("key").queryExecution.toRdd
      .mapPartitions { rows =>
        var n = 0L
        val s = scala.collection.mutable.LinkedHashSet.empty[String]
        while (rows.hasNext) {
          val r = rows.next()
          // a null key can never match the index — skip it entirely:
          // not just the literal set (getUTF8String would NPE) but
          // the ROW GATE too, or a mostly-null batch would trip the
          // ceiling and force the unfiltered full-index scan for a
          // handful of joinable keys (keys are concat_ws products
          // today, so this guards future null-keyed batches)
          if (!r.isNullAt(0)) {
            n += 1
            if (s.size < cap) s += r.getUTF8String(0).toString
          }
        }
        Iterator.single((n, s.toArray))
      }
      .fold((0L, Array.empty[String])) { case ((n1, a), (n2, b)) =>
        (n1 + n2, merge(a, b.iterator))
      }
    if (nRows > ceiling) hist
    else hist.filter(col("key").isin(ks.toIndexedSeq: _*))
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
    requireQualifiedKeys(spark, indexTable) // pre-r10 index: fail loud
    // signed once, used three times (history probe, self-join, append)
    val keys = bandKeys(freshOnly(spark, indexTable, docs), k, bands,
      rowsPerBand).localCheckpoint(true)
    val within = probeJoin(keys, keys)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val pairs =
      if (spark.catalog.tableExists(indexTable)) {
        // history ids and batch ids can interleave — canonicalize
        val cross = probeJoin(keys, prunedHist(spark, indexTable, keys))
          .filter(col("id_a") =!= col("id_b"))
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"))
        within.union(cross).distinct()
      } else within.distinct()
    val out = pairs.localCheckpoint(true)
    pairsSink(out)
    val existed = spark.catalog.tableExists(indexTable)
    if (existed)
      // absorb BEFORE the append: the bloom must stay a SUPERSET of
      // indexed ids (a crash here leaves bloomed-but-unindexed ids —
      // a false-positive-class cost; the reverse order would let a
      // replay slip past the guard and duplicate index rows)
      bloomAbsorb(spark, indexTable, keys.select("doc_id").distinct())
    // r17: cluster by the bucket hash BEFORE the bucketed write (the
    // compact path's own device, same murmur3-pmod hash as bucketBy),
    // so each append lands ~one file per occupied bucket regardless of
    // the signing stage's parallelism — without it an N-partition
    // batch writes up to N files PER BUCKET per append and the
    // co-located probe read degrades into thousands of tiny files
    // (guide §6, small files). The shuffle moves O(batch) key rows.
    keys.repartition(buckets, col("key"))
      .write.mode(SaveMode.Append).format("parquet")
      .bucketBy(buckets, "key").sortBy("key").saveAsTable(indexTable)
    if (!existed)
      // creation batch: the table directory only exists now; a crash
      // between append and absorb leaves no sidecar at all, which the
      // next freshOnly reseeds from the index — still a superset
      bloomAbsorb(spark, indexTable, keys.select("doc_id").distinct())
    graft.SparkUtil.releaseCheckpoint(keys)
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
    // the sidecar lives inside the table directory, which DROP deletes
    // — carry it across the swap (same id set, so the filter is still
    // exact; a crash before the re-write just loses the sidecar, and
    // freshOnly reseeds from the index id column on the next batch)
    val savedBloom = bloomBytes(spark, indexTable)
    // the relation-cache refresh of indexTable (the pinned session is
    // SHARED across compacts and a prior swap leaves a stale file
    // listing) and the cross-db resolution of both names are the
    // helper's contract; tmp is CREATED inside, so it is qualified
    // here rather than declared for refresh
    withBucketedScan(spark, Seq(indexTable)) { (s, names) =>
      s.table(names.head)
        .repartition(buckets, col("key"))
        .write.format("parquet")
        .bucketBy(buckets, "key").sortBy("key")
        .saveAsTable(graft.SparkUtil.qualifiedName(spark, tmp))
    }
    spark.sql(s"DROP TABLE $indexTable")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $indexTable")
    savedBloom.foreach(writeBloom(spark, indexTable, _))
  }

  /** Force the BUCKETED read for a same-bucket-count rewrite — what
    * keeps [[compact]]'s "one file per occupied bucket" contract true
    * AND makes the rewrite shuffle-free. Without this, two planner
    * rules interact to break the layout once the index outgrows one
    * AQE partition: the optimizer removes the explicit
    * `repartition(buckets, key)` as redundant over a table already
    * bucketed on key, and auto-bucketed-scan then DISABLES the
    * bucketed read because no remaining operator requires the
    * distribution — so the write sees bin-packed file splits
    * (~128 MB each) holding ROWS OF EVERY BUCKET, and each task
    * emits one file per bucket it sees (measured at a 10M-row index:
    * 51 files over 16 buckets from 5 tasks, ~3× the files every
    * future probe must open). With the bucketed scan pinned on, each
    * task reads exactly one bucket's files and writes its single
    * compacted file — no exchange at all. A compact to a DIFFERENT
    * bucket count still shuffles (the repartition is not redundant
    * there).
    *
    * The pin lives in the memoized ISOLATED session
    * ([[graft.SparkUtil.withPinnedSession]]: own SQL conf, shared
    * SparkContext/catalog/cache, one allocation per context), not in
    * a flip of the caller's session-global conf around the O(index)
    * rewrite: a flip there would deny auto-bucketed-scan selection to
    * every query the caller's session plans concurrently, and two
    * concurrent compacts racing the save/restore could leave the conf
    * permanently off. The body sees the same catalog tables (the
    * declared ones refreshed on entry and handed back
    * caller-qualified — the helper's contract); caller runtime conf
    * tweaks made AFTER session construction don't carry over —
    * irrelevant to this rewrite, which depends only on the
    * bucketed-scan pin and the shared catalog. */
  private def withBucketedScan[A](spark: SparkSession,
                                  tables: Seq[String])
      (body: (SparkSession, Seq[String]) => A): A =
    graft.SparkUtil.withPinnedSession(spark,
      Map("spark.sql.sources.bucketing.autoBucketedScan.enabled" ->
        "false"), tables)(body)
}

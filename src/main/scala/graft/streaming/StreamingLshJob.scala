package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llmdata.IncrementalLsh

/** Streaming near-dup candidate detection — [[IncrementalLsh]] driven
  * by a document stream: each micro-batch is signed once, probed
  * against the persistent bucketed LSH index of every document seen
  * before, appended to the index, and the candidate pairs it surfaces
  * land in a pairs table for the downstream clustering/representative
  * steps (dd08/t11). The streaming face of dd12: feeding a corpus
  * through in any micro-batch split yields exactly the one-shot dd03
  * candidate set (IncrementalLshSpec proves the equivalence;
  * StreamingLshSpec proves it across a MemoryStream).
  *
  * Crash-safety (foreachBatch is at-least-once): every step of a
  * batch is replay-idempotent, so there is NO double-apply window —
  * the durable [[BatchMarker]] is a fast-path skip, not the safety
  * mechanism. Ordering does the work:
  *   1. pairs are computed and OVERWRITTEN into the batch's own
  *      `batch_id` partition of the pairs table (dynamic partition
  *      overwrite — a replayed write replaces, never duplicates);
  *   2. only then are the batch's keys appended to the index, and
  *      [[IncrementalLsh.freshOnly]] drops already-indexed ids — a
  *      replay after the append contributes zero keys and zero pairs
  *      (an empty dynamic overwrite touches no partitions, so the
  *      original batch's persisted pairs stand).
  * The residual exposure is a non-atomic partial index append
  * (Hadoop commit-protocol job-commit interruption) — the same class
  * of tail risk a table format with atomic commits (Iceberg/Delta)
  * closes; see TableStore's activation note.
  *
  * Scale shape: per trigger the work is O(batch + collisions) — the
  * index is probed co-located on its bucket layout and never
  * re-signed; the only growing state is the index table itself, which
  * is exactly the state the problem requires (a pair can involve a
  * document from any point in history, so near-dup detection against
  * the full corpus cannot be watermark-bounded).
  */
class StreamingLshJob(indexTable: String, pairsTable: String,
                      checkpoint: String,
                      trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                      k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2,
                      buckets: Int = 16, compactIndexAbove: Int = 256,
                      maintainEvery: Int = 8) {

  private val marker = new BatchMarker(checkpoint)
  private val maintenance = new MaintenanceCadence(maintainEvery)

  private[streaming] def lastIndexed: Long = marker.lastCompleted

  /** Idempotent per-batch pairs write: the batch's pairs replace its
    * own `batch_id` partition. Creates the partitioned table on first
    * use; an empty pairs frame touches no partitions (dynamic mode). */
  private def writePairs(pairs: DataFrame, batchId: Long): Unit = {
    val spark = pairs.sparkSession
    val withId = pairs.withColumn("batch_id", lit(batchId))
    if (!spark.catalog.tableExists(pairsTable))
      withId.write.partitionBy("batch_id").format("parquet")
        .saveAsTable(pairsTable)
    else {
      // the writer-level option is not honored on the insertInto path
      // (only the session conf is) — scope the conf to this write.
      // This flip deliberately does NOT use SparkUtil.pinnedSession
      // (the AnnIndex/IncrementalLsh maintenance discipline): a
      // foreachBatch frame is bound to the STREAM's session and
      // executes there no matter which session's catalog handle
      // issues the write, so the pin cannot be relocated. The flip is
      // sound in this context where it wasn't in those: `spark` here
      // is the stream's PRIVATE cloned session (MicroBatchExecution
      // clones per query), foreachBatch serializes its batches, and
      // nothing else plans queries in that clone — no concurrent
      // flipper to race, no bystander query to bleed into.
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "dynamic")
      try withId.write.mode(SaveMode.Overwrite).insertInto(pairsTable)
      finally spark.conf.set(key, prev)
    }
  }

  /** Index one micro-batch unless its id is a known replay. Safe even
    * when the marker is stale (crash between the last write and the
    * marker commit): see the class doc — pairs overwrite their own
    * partition and the index append drops already-indexed ids. */
  private[streaming] def indexOnce(batch: DataFrame, batchId: Long): Unit =
    if (marker.isReplay(batchId)) {
      println(s"[lsh] batch $batchId already indexed — replay skipped")
    } else {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val pairs = IncrementalLsh.indexBatch(spark, indexTable, batch,
          k, bands, rowsPerBand, buckets,
          pairsSink = p => writePairs(p, batchId))
        println(s"[lsh] batch $batchId: ${pairs.count()} candidate pairs")
        // index maintenance on the job's own cadence, not a manual
        // operator chore (the LlmOrchestrator compactAssignState
        // pattern): every append adds one file set per touched bucket,
        // so at streaming cadence the co-located probe degrades into
        // hundreds of tiny files per bucket. foreachBatch serializes
        // batches, so the job IS compact's required single maintenance
        // writer — run it between batches when the file count drifts
        // past the threshold; a crash mid-swap self-heals via
        // recoverCompacting on the next batch.
        // trigger floor = bucket count (the post-compaction file
        // count), so the cadence self-resets for ANY buckets setting;
        // the probe's inputFiles listing is amortized across batches
        if (maintenance.due() &&
            spark.table(indexTable).inputFiles.length >
            buckets + compactIndexAbove)
          IncrementalLsh.compact(spark, indexTable, buckets)
      }
      marker.commit(batchId)
    }

  /** `docStream` needs (doc_id long, text string). */
  def start(docStream: DataFrame): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        indexOnce(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

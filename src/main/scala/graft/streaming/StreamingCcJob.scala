package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llmdata.IncrementalLsh
import graft.operators.IncrementalCc
import graft.store.TableStore

/** Live duplicate-cluster maintenance — the full incremental dedup
  * chain driven by a document stream: each micro-batch is signed and
  * probed by [[IncrementalLsh]] (candidates against everything seen
  * before, O(batch + collisions) per trigger), and the surfaced pairs
  * fold straight into the persisted [[IncrementalCc]] assignment, so
  * the (doc → cluster) table is CURRENT after every trigger instead
  * of waiting for the next batch recluster. The streaming face of
  * dd15 the way [[StreamingLshJob]] is the streaming face of dd12.
  *
  * Crash-safety (foreachBatch is at-least-once): the fold runs inside
  * [[IncrementalLsh.indexBatch]]'s `pairsSink` hook, which fires
  * BEFORE the durable index append — the ordering that makes the two
  * individually-idempotent halves jointly safe. A crash after the
  * fold but before the append replays the batch: its ids are still
  * unindexed, so freshOnly passes them, the same pairs are recomputed
  * and re-folded (a no-op — IncrementalCc contracts known edges to
  * self-loops), and the append lands. A crash after the append drops
  * the replay whole, with the fold already durable. The REVERSE order
  * (append, then fold) would lose the batch's merges forever: on
  * replay freshOnly drops the already-indexed ids, zero pairs
  * surface, and nothing ever re-folds them.
  *
  * Scale shape per trigger: the LSH index is probed co-located and
  * never re-signed; the closure runs on the contracted root graph
  * (O(batch) nodes at any corpus size); the assignment store merges
  * only changed rows. The only growing state is the index + the
  * assignment — exactly the state the problem requires.
  */
class StreamingCcJob(indexTable: String, store: TableStore,
                     assignTable: String, checkpoint: String,
                     trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                     k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2,
                     buckets: Int = 16, compactAbove: Int = 256,
                     maintainEvery: Int = 8) {

  private val maintenance = new MaintenanceCadence(maintainEvery)

  private[streaming] def foldOnce(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      IncrementalCc.ensure(store, assignTable)
      // fold via the sink hook: runs before the index append, so the
      // pairs are durably folded (or safely replayable) in every
      // crash window — see the class doc
      IncrementalLsh.indexBatch(spark, indexTable, batch,
        k, bands, rowsPerBand, buckets,
        pairsSink = pairs => IncrementalCc.update(store, assignTable,
          pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b"))
      // both growing states get maintenance on the job's own cadence
      // (the LlmOrchestrator/StreamingLshJob pattern): the bucketed
      // index compacts to one file per occupied bucket, the assignment
      // re-clusters by id so the fold's scanRange pruning and the
      // COW's matched-file search stay selective. The assignment
      // trigger counts SMALL files (what compaction folds) so the
      // cadence self-resets at any state size; the index's total
      // count is fine — its compaction output is bounded by the
      // bucket count, not by table bytes. Both probes are driver
      // metadata listings, amortized across batches
      if (maintenance.due()) {
        if (spark.table(indexTable).inputFiles.length >
            buckets + compactAbove)
          IncrementalLsh.compact(spark, indexTable, buckets)
        if (store.smallFileCount(assignTable,
            128L * 1024 * 1024) > compactAbove)
          store.compact(assignTable, 128L * 1024 * 1024, Seq("id"))
      }
      println(s"[cc] batch $batchId folded into $assignTable")
    }

  /** `docStream` needs (doc_id long, text string). */
  def start(docStream: DataFrame): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldOnce(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

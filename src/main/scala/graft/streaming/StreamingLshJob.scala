package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
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
                      k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2) {

  private val marker = new BatchMarker(checkpoint)

  private[streaming] def lastIndexed: Long = marker.lastCompleted

  /** Index one micro-batch unless its id is a replay: index appends
    * and the pairs log are NOT replay-idempotent (a re-indexed batch
    * would duplicate its keys and re-emit its pairs), so the durable
    * marker closes foreachBatch's at-least-once restart path the same
    * way [[StreamingGoldJob]] protects the additive gold state. */
  private[streaming] def indexOnce(batch: DataFrame, batchId: Long): Unit =
    if (marker.isReplay(batchId)) {
      println(s"[lsh] batch $batchId already indexed — replay skipped")
    } else {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val pairs = IncrementalLsh.indexBatch(spark, indexTable, batch,
          k, bands, rowsPerBand)
        // append-only pairs log: each pair surfaces in exactly one
        // batch (IncrementalLsh contract), so appends never duplicate
        pairs.write.mode(SaveMode.Append).format("parquet")
          .saveAsTable(pairsTable)
        println(s"[lsh] batch $batchId: ${pairs.count()} candidate pairs")
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

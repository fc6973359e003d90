package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.store.TableStore
import graft.wiki.{Clock, IncrementalGold}

/** Streaming gold maintenance: each silver micro-batch is folded into
  * the WHOLE gold family — hourly stats (A1), risk scores (A2/A3) and
  * the daily summary (A4-A6) — through [[IncrementalGold.refreshAll]],
  * O(batch) work per trigger, where the reference re-runs the full
  * gold batch job on a schedule (2-3 min of silver rescan per cycle,
  * gold_batch_job.py:68-400). Gold freshness becomes the trigger
  * interval instead of the batch-cycle cadence.
  *
  * Delivery guarantee: foreachBatch is at-least-once — a crash between
  * a completed fold and the checkpoint commit replays the batch on
  * restart, and IncrementalGold's additive state is NOT
  * replay-idempotent. This job therefore keeps its own durable
  * last-folded-batchId marker beside the checkpoint, written
  * atomically (tmp + rename) AFTER each fold: a replayed batchId ≤
  * marker is skipped, which closes the restart-replay path entirely.
  * The residual window is a crash between the fold's final table swap
  * and the marker rename (milliseconds, no Spark work in between); a
  * double-fold there persists only until the nightly
  * [[IncrementalGold.rebuildAllDates]] repair recomputes the touched
  * dates from silver truth. The job must be the single writer of the
  * state table and the upstream must be the deduplicated silver
  * stream (BronzeStreamingJob's merge output or an equivalent
  * exactly-once source).
  */
class StreamingGoldJob(store: TableStore, checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                       clock: Clock = Clock.system) {

  private val marker = new BatchMarker(checkpoint)

  private[streaming] def lastFolded: Long = marker.lastCompleted

  private def commitMarker(batchId: Long): Unit = marker.commit(batchId)

  /** Fold one micro-batch, skipping batch ids already folded (batch
    * ids are deterministic across restarts, so ≤ marker ⇒ replay). */
  private[streaming] def foldBatch(batch: DataFrame, batchId: Long): Unit =
    if (marker.isReplay(batchId)) {
      println(s"[gold] batch $batchId already folded — replay skipped")
    } else {
      if (!batch.isEmpty) {
        IncrementalGold.refreshAll(store, batch, clock)
        println(s"[gold] batch $batchId folded into the gold family state")
      }
      // empty batches advance the marker too: their replay is harmless
      // but skipping keeps the marker monotonic with the checkpoint
      commitMarker(batchId)
    }

  /** `silverStream` needs the silver columns IncrementalGold groups
    * and measures on (event_date, event_timestamp, domain, region,
    * user_normalized, title, length_delta, is_bot, is_anonymous,
    * event_type, is_large_deletion, is_large_addition). */
  def start(silverStream: DataFrame): StreamingQuery =
    silverStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

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
  * replay-idempotent. The batch folds THREE independent state
  * families (hourly, risk, daily), so each family keeps its OWN
  * durable last-folded-batchId marker, committed atomically
  * (tmp + rename) immediately after that family's fold: on replay,
  * families whose marker already covers the batch are skipped and
  * only the genuinely-unfolded tail re-runs. A single shared marker
  * here would reopen r5's window — a crash between the hourly fold
  * and the later daily fold replays ALL three, double-folding the
  * completed ones. Each family's residual window is back to the
  * instant between ITS fold's final table swap and ITS marker rename
  * (milliseconds, no Spark work in between); a double-fold there
  * persists only until the nightly
  * [[IncrementalGold.rebuildAllDates]] repair recomputes the touched
  * dates from silver truth. The legacy single marker is still
  * committed after all three families (so pre-upgrade checkpoints
  * migrate: sub-markers floor at its value) and serves as the
  * "whole batch done" watermark. The job must be the single writer
  * of the state tables and the upstream must be the deduplicated
  * silver stream (BronzeStreamingJob's merge output or an equivalent
  * exactly-once source).
  */
class StreamingGoldJob(store: TableStore, checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                       clock: Clock = Clock.system) {

  private val marker = new BatchMarker(checkpoint)
  private val familyMarkers = Seq(
    new BatchMarker(checkpoint, "graft_last_folded_hourly") ->
      ((b: DataFrame) => IncrementalGold.refresh(store, b, clock)),
    new BatchMarker(checkpoint, "graft_last_folded_risk") ->
      ((b: DataFrame) => IncrementalGold.refreshRisk(store, b, clock)),
    new BatchMarker(checkpoint, "graft_last_folded_daily") ->
      ((b: DataFrame) => IncrementalGold.refreshDaily(store, b, clock)))

  private[streaming] def lastFolded: Long = marker.lastCompleted

  /** A family's replay floor: its own marker, or — for checkpoints
    * written before per-family markers existed — the legacy whole-
    * batch marker (which only ever committed after every family). */
  private def familyReplay(m: BatchMarker, batchId: Long): Boolean =
    m.isReplay(batchId) || marker.isReplay(batchId)

  /** Fold one micro-batch, skipping (per family) batch ids already
    * folded (batch ids are deterministic across restarts, so
    * ≤ marker ⇒ replay). */
  private[streaming] def foldBatch(batch: DataFrame, batchId: Long): Unit = {
    if (marker.isReplay(batchId)) {
      println(s"[gold] batch $batchId already folded — replay skipped")
    } else {
      if (!batch.isEmpty) {
        var folded = 0
        familyMarkers.foreach { case (m, fold) =>
          if (!familyReplay(m, batchId)) {
            fold(batch)
            m.commit(batchId)
            folded += 1
          }
        }
        println(s"[gold] batch $batchId folded into $folded gold " +
          s"families (${familyMarkers.size - folded} already done)")
      } else {
        // empty batches advance every marker too: their replay is
        // harmless but skipping keeps markers monotonic with the
        // checkpoint
        familyMarkers.foreach { case (m, _) => m.commit(batchId) }
      }
      marker.commit(batchId)
    }
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

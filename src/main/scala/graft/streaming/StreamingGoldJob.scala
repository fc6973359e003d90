package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.store.TableStore
import graft.wiki.{Clock, IncrementalGold}

/** Streaming gold maintenance: each silver micro-batch is folded into
  * `gold.hourly_stats` through [[IncrementalGold]] — O(batch) work per
  * trigger, where the reference re-runs the full gold batch job on a
  * schedule (2-3 min of silver rescan per cycle,
  * gold_batch_job.py:68-121). Gold freshness becomes the trigger
  * interval instead of the batch-cycle cadence.
  *
  * Exactly-once: foreachBatch + the checkpoint give at-least-once
  * batch delivery with deterministic batch ids; IncrementalGold's
  * additive state is NOT replay-idempotent, so this job must be the
  * single writer and the upstream must be the deduplicated silver
  * stream (BronzeStreamingJob's merge output or an equivalent
  * exactly-once source). A restarted query resumes from the last
  * committed batch id — completed batches are not re-folded.
  */
class StreamingGoldJob(store: TableStore, checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                       clock: Clock = Clock.system) {

  /** `silverStream` needs the silver columns IncrementalGold groups
    * and measures on (event_date, event_timestamp, domain, region,
    * user_normalized, title, length_delta, is_bot, is_anonymous,
    * event_type, is_large_deletion, is_large_addition). */
  def start(silverStream: DataFrame): StreamingQuery =
    silverStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          IncrementalGold.refresh(store, batch, clock)
          println(s"[gold] batch $batchId folded into hourly state")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

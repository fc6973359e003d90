package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST6 extension: the reference computes its tumbling 1-hour windows
  * in batch (`GROUP BY event_date, HOUR(ts)` — gold_batch_job.py:118);
  * this is the same aggregate expressed as a Structured Streaming
  * windowed aggregation with a watermark, for sub-batch freshness.
  *
  * Scale seam (SURVEY §7.4): exact `COUNT(DISTINCT)` is not supported
  * (nor advisable) in streaming state — distinct users/pages use
  * `approx_count_distinct` (HLL). The batch job remains the exact
  * source of truth; this stream serves dashboards.
  */
object StreamingHourlyStats {

  def apply(bronzeStream: DataFrame,
            watermark: String = "10 minutes"): DataFrame =
    bronzeStream
      .withWatermark("event_timestamp", watermark)
      .groupBy(window(col("event_timestamp"), "1 hour"), col("domain"))
      .agg(
        count(lit(1)).as("total_events"),
        approx_count_distinct(col("user")).as("approx_unique_users"),
        approx_count_distinct(col("title")).as("approx_unique_pages"),
        sum(when(col("length_delta") > 0, col("length_delta")).otherwise(0L))
          .as("bytes_added"),
        sum(when(col("length_delta") < 0, abs(col("length_delta")))
          .otherwise(0L)).as("bytes_removed"),
        sum(when(col("is_bot") === true, 1L).otherwise(0L)).as("bot_edits"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("domain"), col("total_events"), col("approx_unique_users"),
        col("approx_unique_pages"), col("bytes_added"),
        col("bytes_removed"), col("bot_edits"))
}

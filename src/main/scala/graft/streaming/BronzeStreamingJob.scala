package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.store.TableStore
import graft.wiki.{BronzeTransform, Clock, WikiSchemas}

/** Streaming ingestion replacing the reference's Kafka → Iceberg job
  * (SURVEY §3.1, bronze_streaming_job.py:307-408): any Kafka-shaped
  * streaming source (MemoryStream in tests, file source, or the real
  * Kafka connector when its jars are on the classpath) → BronzeTransform
  * (watermark + stateful dedup) → foreachBatch idempotent insert-only
  * MERGE. Exactly-once = checkpointed offsets + keyed idempotent sink
  * (ST4).
  */
class BronzeStreamingJob(store: TableStore,
                         table: String = "bronze.raw_events",
                         checkpoint: String,
                         trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                         clock: Clock = Clock.system) {

  /** `source` must have the Kafka shape:
    * topic, partition, offset, timestamp, value. */
  def start(source: DataFrame): StreamingQuery = {
    store.ensure(table, WikiSchemas.BronzeSchema, Seq("event_date", "event_hour"))
    BronzeTransform(source, clock).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ST7: empty-batch short-circuit
        if (!batch.isEmpty) {
          val inserted = store.mergeInsertOnly(table, batch, Seq("event_id"))
          println(s"[bronze] batch $batchId inserted $inserted rows")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** S3: companion DLQ query — malformed envelopes append to the DLQ
    * table (its own checkpoint, so replays stay independent). */
  def startDlq(source: DataFrame,
               dlqTable: String = "bronze.dlq_events"): StreamingQuery = {
    store.ensure(dlqTable, WikiSchemas.DlqSchema, Seq("failed_date"))
    BronzeTransform.dlq(source, clock).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.append(dlqTable, batch)
        ()
      }
      .option("checkpointLocation", checkpoint + "_dlq")
      .trigger(trigger)
      .start()
  }
}

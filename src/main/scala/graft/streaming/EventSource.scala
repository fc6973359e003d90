package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transport abstraction for the Bronze ingestion job (SURVEY §2.1
  * S1/S2): every source yields the Kafka shape
  * `topic, partition, offset, timestamp, value` that BronzeTransform
  * consumes.
  *
  *  - [[EventSource.kafka]] is the production path
  *    (bronze_streaming_job.py:381-395). It needs the
  *    spark-sql-kafka connector on the classpath — not bundled in this
  *    environment, so it is configuration-only here.
  *  - [[EventSource.fileReplay]] replays newline-delimited envelope
  *    JSON files from a directory — the deterministic local stand-in
  *    for the SSE→Kafka producer, usable in streaming mode.
  *  - Tests use MemoryStream directly (see StreamingDedupSpec).
  */
object EventSource {

  /** The exact reader-option contract of the reference's Kafka source
    * (bronze_streaming_job.py:381-395): subscribe + consumer group +
    * startingOffsets, with broker-auth settings (e.g. SASL) passed
    * through `extra` rather than hardcoded. `failOnDataLoss=false` is
    * a deliberate addition: expired/compacted offsets must not kill a
    * long-running ingest job (the dedup sink makes replays safe).
    *
    * Activation: drop `spark-sql-kafka-0-10_2.13` +
    * `kafka-clients` (+ `commons-pool2`) on the classpath — the option
    * map and downstream plumbing are connector-version independent.
    */
  def kafkaOptions(bootstrap: String,
                   topic: String = "raw-events",
                   groupId: String = "graft-bronze-streaming-consumer",
                   startingOffsets: String = "latest",
                   extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "kafka.group.id" -> groupId,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false") ++ extra

  /** Kafka streaming source (requires the kafka connector jar). */
  def kafka(spark: SparkSession, bootstrap: String,
            topic: String = "raw-events",
            startingOffsets: String = "latest",
            extra: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrap, topic,
        startingOffsets = startingOffsets, extra = extra))
      .load()
      .select(col("topic"), col("partition"), col("offset"),
        col("timestamp"), col("value"))

  private val fileSchema = StructType(Seq(
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("value", StringType)))

  /** Replayable file source: each line-file row is (offset, timestamp,
    * value-json). Streaming-capable via `readStream` directory watch.
    */
  def fileReplay(spark: SparkSession, dir: String,
                 streaming: Boolean = true): DataFrame = {
    val base =
      if (streaming) spark.readStream.schema(fileSchema).json(dir)
      else spark.read.schema(fileSchema).json(dir)
    base.select(
      lit("raw-events").as("topic"),
      lit(0).as("partition"),
      col("offset"), col("timestamp"), col("value"))
  }
}

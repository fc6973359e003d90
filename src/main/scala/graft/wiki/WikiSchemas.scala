package graft.wiki

import org.apache.spark.sql.types._

/** Explicit, versioned schemas for every layer — never inferred
  * (SURVEY §1.4). Mirrors the reference's spark/schemas python modules
  * and the job DDLs (bronze_streaming_job.py:64-102,332-375;
  * silver_batch_job.py:220-260).
  */
object WikiSchemas {

  /** Kafka envelope produced by the SSE producer
    * (bronze_streaming_job.py:64-72). `data` is a JSON *string*. */
  val KafkaValueSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("data", StringType),
    StructField("_processing", StructType(Seq(
      StructField("ingested_at", StringType),
      StructField("producer_version", StringType),
      StructField("environment", StringType))))))

  /** Declared schema of the Wikimedia recentchange payload
    * (bronze_schema.py:37-108). Parsed ONCE with from_json — the
    * reference's 17 get_json_object calls each re-parse the JSON
    * string per row (SURVEY §2.2 P2 notes the equivalence). */
  val RecentchangeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("namespace", IntegerType),
    StructField("title", StringType),
    StructField("title_url", StringType),
    StructField("comment", StringType),
    StructField("timestamp", LongType),
    StructField("user", StringType),
    StructField("bot", BooleanType),
    StructField("server_name", StringType),
    StructField("wiki", StringType),
    StructField("length", StructType(Seq(
      StructField("old", IntegerType),
      StructField("new", IntegerType)))),
    StructField("revision", StructType(Seq(
      StructField("old", LongType),
      StructField("new", LongType)))),
    StructField("meta", StructType(Seq(
      StructField("domain", StringType),
      StructField("dt", StringType),
      StructField("id", StringType))))))

  /** Flattened Bronze row (bronze_streaming_job.py:75-102). */
  val BronzeSchema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("kafka_topic", StringType),
    StructField("kafka_partition", IntegerType),
    StructField("kafka_offset", LongType),
    StructField("kafka_timestamp", TimestampType),
    StructField("rc_id", LongType),
    StructField("event_type", StringType),
    StructField("namespace", IntegerType),
    StructField("domain", StringType),
    StructField("title", StringType),
    StructField("title_url", StringType),
    StructField("user", StringType),
    StructField("is_bot", BooleanType),
    StructField("comment", StringType),
    StructField("wiki", StringType),
    StructField("server_name", StringType),
    StructField("length_old", IntegerType),
    StructField("length_new", IntegerType),
    StructField("length_delta", IntegerType),
    StructField("revision_old", LongType),
    StructField("revision_new", LongType),
    StructField("event_timestamp", TimestampType),
    StructField("producer_ingested_at", TimestampType),
    StructField("bronze_processed_at", TimestampType),
    StructField("event_date", StringType),
    StructField("event_hour", IntegerType),
    StructField("schema_version", StringType)))

  /** Silver row (silver_batch_job.py:151-177). */
  val SilverSchema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("rc_id", LongType),
    StructField("event_type", StringType),
    StructField("domain", StringType),
    StructField("region", StringType),
    StructField("language", StringType),
    StructField("title", StringType),
    StructField("namespace", IntegerType),
    StructField("user_normalized", StringType),
    StructField("is_bot", BooleanType),
    StructField("is_anonymous", BooleanType),
    StructField("length_old", IntegerType),
    StructField("length_new", IntegerType),
    StructField("length_delta", IntegerType),
    StructField("revision_old", LongType),
    StructField("revision_new", LongType),
    StructField("is_valid", BooleanType),
    StructField("is_large_deletion", BooleanType),
    StructField("is_large_addition", BooleanType),
    StructField("event_timestamp", TimestampType),
    StructField("bronze_processed_at", TimestampType),
    StructField("silver_processed_at", TimestampType),
    StructField("event_date", StringType),
    StructField("schema_version", StringType)))

  /** DLQ row (bronze_schema.py:189-199). */
  val DlqSchema: StructType = StructType(Seq(
    StructField("raw_value", StringType),
    StructField("error_reason", StringType),
    StructField("failed_at", TimestampType),
    StructField("failed_date", StringType)))

  /** Statistical profile row (dq_utils.py:83-102). */
  val ProfileMetricSchema: StructType = StructType(Seq(
    StructField("run_id", StringType),
    StructField("run_date", StringType),
    StructField("layer", StringType),
    StructField("column_name", StringType),
    StructField("row_count", LongType),
    StructField("null_rate", DoubleType),
    StructField("distinct_count", LongType),
    StructField("mean", DoubleType),
    StructField("stddev", DoubleType),
    StructField("min_value", DoubleType),
    StructField("max_value", DoubleType),
    StructField("p25", DoubleType),
    StructField("p50", DoubleType),
    StructField("p75", DoubleType),
    StructField("p95", DoubleType)))

  /** DQ audit row (dq_utils.py:63-81). */
  val QualityResultSchema: StructType = StructType(Seq(
    StructField("run_id", StringType),
    StructField("run_date", StringType),
    StructField("layer", StringType),
    StructField("check_name", StringType),
    StructField("check_type", StringType),
    StructField("status", StringType),
    StructField("metric_value", DoubleType),
    StructField("threshold", DoubleType),
    StructField("details", StringType),
    StructField("created_at", TimestampType)))
}

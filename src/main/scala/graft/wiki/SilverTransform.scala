package graft.wiki

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Settings

/** Bronze → Silver cleanse/enrich. Faithful to
  * /root/reference/spark/jobs/silver_batch_job.py:82-179
  * (P9-P13 + dedup in SURVEY §2).
  */
object SilverTransform {

  private val Ipv4 = "^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$"

  /** P9: 18-entry domain → (region, language) chained CASE with
    * fallback region "other" / language substring(domain,1,2).
    * A chained `when` over a compile-time map keeps the whole thing
    * inside whole-stage codegen — no join, no shuffle, scales to any
    * fact-side cardinality.
    */
  private def regionExpr: Column =
    Settings.DomainRegionMap.foldLeft(null: Column) {
      case (null, (dom, region, _)) => when(col("domain") === dom, lit(region))
      case (acc, (dom, region, _))  => acc.when(col("domain") === dom, lit(region))
    }.otherwise(lit("other"))

  private def languageExpr: Column =
    Settings.DomainRegionMap.foldLeft(null: Column) {
      case (null, (dom, _, lang)) => when(col("domain") === dom, lit(lang))
      case (acc, (dom, _, lang))  => acc.when(col("domain") === dom, lit(lang))
    }.otherwise(substring(col("domain"), 1, 2))

  def apply(bronze: DataFrame, clock: Clock = Clock.system): DataFrame =
    project(enriched(bronze)
      // historical-duplicate dedup on the PK (batch-only: streams get
      // their dedup from Bronze's watermarked state + keyed MERGE)
      .dropDuplicates(Seq("event_id")), clock)

  private[wiki] def enriched(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("region", regionExpr)
      .withColumn("language", languageExpr)
      // P10: strip control characters, trim
      .withColumn("user_normalized",
        trim(regexp_replace(col("user"), "[\\x00-\\x1f\\x7f]", "")))
      // P11: anonymous = IPv4-shaped username
      .withColumn("is_anonymous",
        when(col("user_normalized").rlike(Ipv4), true).otherwise(false))
      // P12: validity + anomaly flags
      .withColumn("is_valid",
        col("event_id").isNotNull && col("event_type").isNotNull &&
          col("domain").isNotNull && col("event_timestamp").isNotNull)
      .withColumn("is_large_deletion",
        when(col("length_delta").isNotNull &&
          (col("length_delta") < Settings.LargeDeletionThreshold), true)
          .otherwise(false))
      .withColumn("is_large_addition",
        when(col("length_delta").isNotNull &&
          (col("length_delta") > Settings.LargeAdditionThreshold), true)
          .otherwise(false))

  private[wiki] def project(df: DataFrame, clock: Clock): DataFrame =
    df
      .withColumn("silver_processed_at", clock.now)
      .withColumn("schema_version", lit(Settings.SchemaVersion))
      .select(
        "event_id", "rc_id", "event_type", "domain", "region", "language",
        "title", "namespace", "user_normalized", "is_bot", "is_anonymous",
        "length_old", "length_new", "length_delta", "revision_old",
        "revision_new", "is_valid", "is_large_deletion", "is_large_addition",
        "event_timestamp", "bronze_processed_at", "silver_processed_at",
        "event_date", "schema_version")
      // P13: valid-only filter
      .filter(col("is_valid"))
}

/** Streaming silver: the same cleanse/enrich chain without the batch
  * dropDuplicates — the stream already arrives deduplicated from
  * Bronze (watermarked state + keyed MERGE), and every remaining step
  * is stateless, so silver freshness is one micro-batch behind Bronze.
  */
object SilverTransformStreaming {
  def apply(bronze: DataFrame, clock: Clock = Clock.system): DataFrame =
    SilverTransform.project(SilverTransform.enriched(bronze), clock)
}

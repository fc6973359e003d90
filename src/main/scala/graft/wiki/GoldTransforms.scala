package graft.wiki

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Settings

/** Silver → Gold aggregations, faithful to
  * /root/reference/spark/jobs/gold_batch_job.py (A1-A6, W1, J1 in
  * SURVEY §2.4-2.5) — including the reference's quirks, reproduced on
  * purpose and flagged below:
  *  - `risk_level` omits the cross-domain factor in its MEDIUM branch
  *    and uses only the top-two velocity branches (HIGH branch keeps
  *    cross-domain);
  *  - `alert_triggered` considers only the top velocity + deletion
  *    factors;
  *  - `edits_per_hour_avg` divides by 24.0 regardless of active hours.
  */
object GoldTransforms {

  private def cnt(p: Column): Column = sum(when(p, 1L).otherwise(0L))

  /** A1: hourly stats by (date, hour, domain, region)
    * (gold_batch_job.py:68-121). */
  def hourlyStats(silver: DataFrame, clock: Clock = Clock.system): DataFrame =
    silver
      .groupBy(col("event_date").as("stat_date"),
        hour(col("event_timestamp")).as("stat_hour"),
        col("domain"), col("region"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_normalized")).as("unique_users"),
        countDistinct(col("title")).as("unique_pages"),
        sum(when(col("length_delta") > 0, col("length_delta")).otherwise(0L))
          .as("bytes_added"),
        sum(when(col("length_delta") < 0, abs(col("length_delta")))
          .otherwise(0L)).as("bytes_removed"),
        avg(abs(coalesce(col("length_delta"), lit(0)))).as("avg_edit_size"),
        cnt(col("is_bot") === true).as("bot_edits"),
        cnt(col("is_bot") === false).as("human_edits"),
        round(lit(100.0) * cnt(col("is_bot") === true) / count(lit(1)), 2)
          .as("bot_percentage"),
        cnt(col("is_anonymous") === true).as("anonymous_edits"),
        cnt(col("event_type") === "edit").as("type_edit"),
        cnt(col("event_type") === "new").as("type_new"),
        cnt(col("event_type") === "categorize").as("type_categorize"),
        cnt(col("event_type") === "log").as("type_log"),
        cnt(col("is_large_deletion") === true).as("large_deletions"),
        cnt(col("is_large_addition") === true).as("large_additions"))
      .withColumn("gold_processed_at", clock.now)
      .withColumn("schema_version", lit(Settings.SchemaVersion))

  /** A2: per-user-day metrics with the >=5 activity gate
    * (gold_batch_job.py:137-164). */
  def userMetrics(silver: DataFrame): DataFrame =
    silver
      .filter(col("is_bot") === false && col("user_normalized").isNotNull)
      .groupBy(col("event_date").as("stat_date"),
        col("user_normalized").as("entity_id"))
      .agg(
        count(lit(1)).as("total_edits"),
        (count(lit(1)) / 24.0).as("edits_per_hour_avg"),
        (max(hour(col("event_timestamp"))) -
          min(hour(col("event_timestamp"))) + 1).as("active_hours"),
        countDistinct(col("domain")).as("domains_edited"),
        countDistinct(col("title")).as("pages_edited"),
        cnt(col("is_large_deletion") === true).as("large_deletions"),
        cnt(col("is_large_addition") === true).as("large_additions"),
        cnt(col("is_anonymous") === true).as("anonymous_edits"),
        cnt(col("is_bot") === true).as("bot_edits"),
        avg(coalesce(col("length_delta"), lit(0))).as("avg_length_delta"),
        min(col("length_delta")).as("min_length_delta"))
      .filter(col("total_edits") >= Settings.MinActivityForRisk)
      .withColumn("entity_type", lit("user"))

  /** A3: additive risk scoring over user metrics
    * (gold_batch_job.py:169-247). The full score expression is built
    * once and reused; the level/alert expressions reproduce the
    * reference's reduced factor sets exactly.
    */
  def riskScores(metrics: DataFrame, clock: Clock = Clock.system): DataFrame = {
    val eph = col("edits_per_hour_avg")
    val velocityFull = when(eph > Settings.RiskEditsPerHour, 40)
      .when(eph > Settings.RiskEditsPerHour / 2, 25)
      .when(eph > 10, 10).otherwise(0)
    // quirk: the level expression drops the third velocity branch
    val velocityLevel = when(eph > Settings.RiskEditsPerHour, 40)
      .when(eph > Settings.RiskEditsPerHour / 2, 25).otherwise(0)
    val deletions = when(col("large_deletions") > Settings.RiskLargeDeletions, 30)
      .when(col("large_deletions") > 1, 15).otherwise(0)
    val anonymous = when(
      col("anonymous_edits") > col("total_edits") * Settings.RiskAnonymousRatio,
      20).otherwise(0)
    val crossDomain = when(col("domains_edited") > 5 && eph > 20, 10).otherwise(0)

    def clamp(c: Column): Column = least(lit(100), greatest(lit(0), c))

    val score      = clamp(velocityFull + deletions + anonymous + crossDomain)
    val scoreHigh  = clamp(velocityLevel + deletions + anonymous + crossDomain)
    val scoreMed   = clamp(velocityLevel + deletions + anonymous)
    // quirk: alert considers only the top velocity + deletion factors
    val alertScore = clamp(
      when(eph > Settings.RiskEditsPerHour, 40).otherwise(0) +
        when(col("large_deletions") > Settings.RiskLargeDeletions, 30)
          .otherwise(0))

    metrics.select(
      col("stat_date"), col("entity_id"), col("entity_type"),
      col("total_edits"), col("edits_per_hour_avg"),
      col("large_deletions"), col("domains_edited"),
      score.as("risk_score"),
      when(scoreHigh >= 70, "HIGH").when(scoreMed >= 40, "MEDIUM")
        .otherwise("LOW").as("risk_level"),
      concat(lit("{"),
        lit("\"edits_per_hour\":"), round(eph, 2).cast("string"), lit(","),
        lit("\"large_deletions\":"), col("large_deletions").cast("string"), lit(","),
        lit("\"domains_edited\":"), col("domains_edited").cast("string"), lit(","),
        lit("\"total_edits\":"), col("total_edits").cast("string"), lit(","),
        lit("\"anonymous_edits\":"), col("anonymous_edits").cast("string"),
        lit("}")).as("evidence"),
      (alertScore >= 70).as("alert_triggered"))
      .withColumn("gold_processed_at", clock.now)
      .withColumn("schema_version", lit(Settings.SchemaVersion))
  }

  /** A5: per-day risk rollup (gold_batch_job.py:317-330). */
  def riskSummary(risk: DataFrame): DataFrame =
    risk.groupBy(col("stat_date"))
      .agg(
        count(lit(1)).as("total_scored_users"),
        cnt(col("risk_level") === "HIGH").as("high_risk_users"),
        cnt(col("risk_level") === "MEDIUM").as("medium_risk_users"),
        cnt(col("risk_level") === "LOW").as("low_risk_users"),
        avg(col("risk_score")).as("avg_risk_score"),
        max(col("risk_score")).as("max_risk_score"),
        cnt(col("alert_triggered") === true).as("alerts_triggered"))

  /** W1 + A4 + J1 + A6: daily executive summary
    * (gold_batch_job.py:264-400). `risk` is the already-written
    * risk_scores table — the reference's implicit table-mediated
    * dataflow (SURVEY §3.3).
    */
  def dailySummary(silver: DataFrame, risk: DataFrame,
                   clock: Clock = Clock.system): DataFrame = {
    // W1 as two-level aggregation: the reference writes
    // COUNT(*) OVER (PARTITION BY date, hour) then MAX per day
    // (gold_batch_py:298-314) — identical result, but the window form
    // shuffles+sorts every raw event row. groupBy(date, hour) then
    // max-per-day shuffles |date×hour| rows instead of |events|.
    val peak = silver
      .groupBy(col("event_date"), hour(col("event_timestamp")).as("__hr"))
      .agg(count(lit(1)).as("hour_events"))
      .groupBy(col("event_date"))
      .agg(max(col("hour_events")).as("peak_hour_events"))

    val dailyBase = silver.groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_normalized")).as("unique_users"),
        countDistinct(col("domain")).as("active_domains"),
        countDistinct(col("title")).as("unique_pages_edited"),
        cnt(col("is_bot") === true).as("bot_events"),
        cnt(col("is_anonymous") === true).as("anonymous_events"),
        cnt(col("is_bot") === false && col("is_anonymous") === false)
          .as("registered_user_events"),
        sum(when(col("length_delta") > 0, col("length_delta")).otherwise(0L))
          .as("total_bytes_added"),
        sum(when(col("length_delta") < 0, abs(col("length_delta")))
          .otherwise(0L)).as("total_bytes_removed"),
        avg(abs(coalesce(col("length_delta"), lit(0))))
          .as("avg_edit_size_bytes"),
        cnt(col("event_type") === "edit").as("edit_events"),
        cnt(col("event_type") === "new").as("new_page_events"),
        cnt(col("is_large_deletion") === true).as("large_deletions_count"),
        cnt(col("is_large_addition") === true).as("large_additions_count"),
        cnt(col("region") === "europe").as("europe_events"),
        cnt(col("region") === "americas").as("americas_events"),
        cnt(col("region") === "asia_pacific").as("asia_pacific_events"))
      .join(peak, Seq("event_date")) // every date has ≥1 hour row

    summaryProject(dailyBase, risk, clock)
  }

  /** The A6 projection over a prepared daily base — shared by the
    * batch path above and [[IncrementalGold]]'s state-fold publish so
    * the two can never drift arithmetically. `dailyBase` needs the
    * column set built in [[dailySummary]] (incl. `peak_hour_events`);
    * `risk` is the A3 output (summarized here). */
  private[wiki] def summaryProject(dailyBase: DataFrame, risk: DataFrame,
                                   clock: Clock): DataFrame = {
    val rs = riskSummary(risk)

    val d = dailyBase.as("d")
    val r = rs.as("r")
    def pct(num: Column, scale: Int = 2): Column =
      round(lit(100.0) * num / nullif(col("d.total_events"), lit(0)), scale)

    d.join(r, col("d.event_date") === col("r.stat_date"), "left")
      .select(
        col("d.event_date").as("summary_date"),
        col("d.total_events").as("total_events"),
        col("d.unique_users").as("unique_users"),
        col("d.active_domains").as("active_domains"),
        col("d.unique_pages_edited").as("unique_pages_edited"),
        pct(col("d.bot_events")).as("bot_percentage"),
        pct(col("d.anonymous_events")).as("anonymous_percentage"),
        pct(col("d.registered_user_events")).as("registered_user_percentage"),
        col("d.total_bytes_added").as("total_bytes_added"),
        col("d.total_bytes_removed").as("total_bytes_removed"),
        (col("d.total_bytes_added") - col("d.total_bytes_removed"))
          .as("net_content_change"),
        round(col("d.avg_edit_size_bytes"), 2).as("avg_edit_size_bytes"),
        col("d.new_page_events").as("new_pages_created"),
        col("d.large_deletions_count").as("large_deletions_count"),
        col("d.large_additions_count").as("large_additions_count"),
        pct(col("d.large_deletions_count"), 4).as("large_deletion_rate"),
        coalesce(col("r.high_risk_users"), lit(0L)).as("high_risk_user_count"),
        coalesce(col("r.medium_risk_users"), lit(0L)).as("medium_risk_user_count"),
        coalesce(col("r.low_risk_users"), lit(0L)).as("low_risk_user_count"),
        coalesce(col("r.avg_risk_score"), lit(0.0)).as("platform_avg_risk_score"),
        coalesce(col("r.max_risk_score"), lit(0)).as("platform_max_risk_score"),
        coalesce(col("r.alerts_triggered"), lit(0L)).as("total_alerts_triggered"),
        pct(col("d.europe_events")).as("europe_percentage"),
        pct(col("d.americas_events")).as("americas_percentage"),
        pct(col("d.asia_pacific_events")).as("asia_pacific_percentage"),
        col("d.peak_hour_events").as("peak_hour_events"),
        round(col("d.total_events") / 24.0, 2).as("avg_events_per_hour"),
        round(least(lit(100), greatest(lit(0),
          lit(40) * coalesce(col("r.low_risk_users"), lit(0L)) /
            nullif(coalesce(col("r.total_scored_users"), lit(1L)), lit(0L))
            + lit(30) * col("d.registered_user_events") /
              nullif(col("d.total_events"), lit(1L))
            + when(col("d.total_bytes_added") > col("d.total_bytes_removed"), 20)
              .when(col("d.total_bytes_added") >
                col("d.total_bytes_removed") * 0.5, 10).otherwise(0)
            + when(col("d.large_deletions_count") <
                col("d.total_events") * 0.01, 10)
              .when(col("d.large_deletions_count") <
                col("d.total_events") * 0.05, 5).otherwise(0))), 2)
          .as("platform_health_score"))
      .withColumn("gold_processed_at", clock.now)
      .withColumn("schema_version", lit(Settings.SchemaVersion))
  }

  /** O1: top-10 high-risk alert report (gold_batch_job.py:729-735). */
  def topAlerts(risk: DataFrame): DataFrame =
    risk.filter(col("alert_triggered") === true)
      .orderBy(col("risk_score").desc)
      .limit(10)
}

package graft.wiki

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class GoldTransformsSpec extends SparkSpec {

  private lazy val silver = SilverTransform(
    BronzeTransform(FixtureData.kafkaDf(spark), Clock.fixed("2024-01-02 15:00:00")),
    Clock.fixed("2024-01-02 15:05:00")).cache()

  test("A1 hourly stats: en.wikipedia 13:00 bucket") {
    val hourly = GoldTransforms.hourlyStats(silver, Clock.fixed("2024-01-02 16:00:00"))
    val r = hourly.filter(col("domain") === "en.wikipedia.org" &&
      col("stat_hour") === 13).collect()(0)
    assert(r.getAs[Long]("total_events") === 2L)
    assert(r.getAs[Long]("unique_users") === 2L)
    assert(r.getAs[Long]("bytes_added") === 5150L)
    assert(r.getAs[Long]("bytes_removed") === 0L)
    assert(r.getAs[Long]("type_edit") === 1L)
    assert(r.getAs[Long]("type_new") === 1L)
    assert(r.getAs[Double]("bot_percentage") === 0.0)
    assert(r.getAs[String]("region") === "americas")
  }

  /** Synthetic silver rows for a risky user: 1300 edits in one day →
    * 54.2 edits/hour (>50 → 40 pts), 4 large deletions (>3 → 30 pts),
    * 60% anonymous (>50% → 20 pts), 6 domains with high velocity
    * (→ 10 pts) = raw 100.
    */
  private def riskySilver = {
    val sp = spark
    import sp.implicits._
    val rows = (1 to 1300).map { i =>
      (s"ev-$i", "edit", s"dom${i % 6}.wikipedia.org", s"Title${i % 40}",
        "RiskyUser", false, i % 5 < 3, // 60% anonymous
        if (i <= 4) -6000 else 10,     // 4 large deletions
        Timestamp.valueOf(f"2024-01-02 ${i % 24}%02d:00:00"), "2024-01-02")
    } ++ (1 to 6).map { i =>
      // a quiet user: 6 edits, no flags → LOW
      (s"qv-$i", "edit", "en.wikipedia.org", "QuietPage", "QuietUser",
        false, false, 5, Timestamp.valueOf("2024-01-02 10:00:00"), "2024-01-02")
    }
    rows.toDF("event_id", "event_type", "domain", "title", "user_normalized",
        "is_bot", "is_anonymous", "length_delta", "event_timestamp",
        "event_date")
      .withColumn("is_large_deletion", col("length_delta") < -5000)
      .withColumn("is_large_addition", col("length_delta") > 50000)
  }

  test("A2 user metrics: HAVING >= 5 gate and per-user aggregates") {
    val m = GoldTransforms.userMetrics(riskySilver)
    assert(m.count() === 2)
    val risky = m.filter(col("entity_id") === "RiskyUser").collect()(0)
    assert(risky.getAs[Long]("total_edits") === 1300L)
    assert(risky.getAs[Double]("edits_per_hour_avg") === 1300 / 24.0)
    assert(risky.getAs[Long]("large_deletions") === 4L)
    assert(risky.getAs[Long]("domains_edited") === 6L)
  }

  test("A3 risk scoring: all factors light up; quirks preserved") {
    val risk = GoldTransforms.riskScores(
      GoldTransforms.userMetrics(riskySilver), Clock.fixed("2024-01-02 16:00:00"))
    val r = risk.filter(col("entity_id") === "RiskyUser").collect()(0)
    assert(r.getAs[Int]("risk_score") === 100)
    assert(r.getAs[String]("risk_level") === "HIGH")
    assert(r.getAs[Boolean]("alert_triggered")) // 40 + 30 = 70 >= 70
    val ev = r.getAs[String]("evidence")
    assert(ev.startsWith("{\"edits_per_hour\":54.17,"))
    assert(ev.contains("\"large_deletions\":4"))
    val quiet = risk.filter(col("entity_id") === "QuietUser").collect()(0)
    assert(quiet.getAs[Int]("risk_score") === 0)
    assert(quiet.getAs[String]("risk_level") === "LOW")
    assert(!quiet.getAs[Boolean]("alert_triggered"))
  }

  test("A4-A6 daily summary: volumes, percentages, health score") {
    val risk = GoldTransforms.riskScores(
      GoldTransforms.userMetrics(silver), Clock.fixed("2024-01-02 16:00:00"))
    val summary = GoldTransforms.dailySummary(silver, risk,
      Clock.fixed("2024-01-02 16:00:00"))
    val r = summary.collect()(0)
    assert(r.getAs[String]("summary_date") === "2024-01-02")
    assert(r.getAs[Long]("total_events") === 4L)
    assert(r.getAs[Long]("unique_users") === 4L)
    assert(r.getAs[Long]("total_bytes_added") === 5150L)
    assert(r.getAs[Long]("total_bytes_removed") === 19000L)
    assert(r.getAs[Long]("net_content_change") === -13850L)
    assert(r.getAs[Double]("anonymous_percentage") === 25.0)
    // fixtures have no scored users (nobody has >= 5 edits):
    assert(r.getAs[Long]("high_risk_user_count") === 0L)
    // health: 0 (no scored) + 30*3/4 + 0 growth (removed > added) +
    // 0 deletion-rate (1 of 4 = 25% ≥ 5%) = 22.5
    assert(r.getAs[Double]("platform_health_score") === 22.5)
    assert(r.getAs[Long]("peak_hour_events") === 2L)
  }

  test("O1 top alerts ranked by risk score") {
    val risk = GoldTransforms.riskScores(
      GoldTransforms.userMetrics(riskySilver), Clock.fixed("2024-01-02 16:00:00"))
    val top = GoldTransforms.topAlerts(risk).collect()
    assert(top.length === 1)
    assert(top(0).getAs[String]("entity_id") === "RiskyUser")
  }
}

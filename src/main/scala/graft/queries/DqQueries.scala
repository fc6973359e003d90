package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Remaining DQ-constraint operators from SURVEY §2.9 (D7-D14) plus
  * the P1 declared-schema JSON parse. The reference's accuracy checks
  * literally re-derive Silver columns and compare (dq_checks.py:825-974);
  * consistency asserts cross-column invariants (dq_checks.py:1166-1213);
  * the gate aggregates check statuses and blocks downstream on FAILED
  * (dq_checks.py:119-140, *_dq_gate.py).
  */
object DqQueries extends QueryDsl {

  val queries: Map[String, Q] = Map(
    // P1: parse against a declared schema with from_json (the Kafka
    // envelope parse, bronze_streaming_job.py:144-150) — not inference.
    "p01_from_json" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      // r17: under-split-scan repair before the JSON parse (guide §2.5)
      graft.SparkUtil.parallelScanSized(Tables.events(s, d),
        graft.SparkUtil.CheapKernelBytesPerTask, col("event_id"))
        .select(
        col("event_id"),
        from_json(col("props"), schema).getField("k").as("k"))
    }),

    // D7/D8: accuracy — re-derive a column independently and measure
    // the equality ratio against a 0.99 threshold.
    "d07_accuracy_recompute" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        col("event_id"),
        when(col("event_type") === "error", -col("value"))
          .otherwise(col("value")).as("length_delta"),
        col("event_type"), col("value"))
      val checked = e.select(
        (col("length_delta") ===
          when(col("event_type") === "error", -col("value"))
            .otherwise(col("value"))).as("delta_matches"),
        (abs(col("length_delta")) === col("value")).as("abs_matches"))
      checked.agg(
        count(lit(1)).as("total_rows"),
        countIf(col("delta_matches")).as("delta_match_count"),
        countIf(col("abs_matches")).as("abs_match_count")
      ).select(col("*"),
        round(col("delta_match_count").cast("double") / col("total_rows"), 6)
          .as("delta_accuracy"),
        (col("delta_match_count").cast("double") / col("total_rows") >= 0.99)
          .as("accuracy_passed"))
    }),

    // D11: consistency — total_events >= unique_users must hold in
    // every aggregate row; violation count must be 0.
    "d11_consistency_check" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(eventDate(col("ts")).as("event_date"),
                 hour(col("ts")).as("event_hour"))
        .agg(count(lit(1)).as("total_events"),
             countDistinct(col("user_id")).as("unique_users"))
      hourly.agg(
        count(lit(1)).as("group_count"),
        countIf(col("total_events") < col("unique_users"))
          .as("violation_count")
      ).select(col("*"),
        (col("violation_count") === 0).as("consistency_passed"))
    }),

    // D15: volume anomaly detection — z-score of hourly event counts
    // against the corpus mean/stddev, |z| > 2 flags the hour. The
    // stddev is derived from exact integer sums (n, Σc, Σc²) via the
    // same double expression in both engines, so the threshold
    // comparison is bit-deterministic — no stddev_samp() parity risk.
    // One aggregation + a broadcast one-row stats frame: the raw scan
    // is touched once.
    "d15_anomaly_hours" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(eventDate(col("ts")).as("event_date"),
                 hour(col("ts")).as("event_hour"))
        .agg(count(lit(1)).as("hour_events"))
      val stats = hourly.agg(
        count(lit(1)).as("n"),
        sum(col("hour_events")).as("s"),
        sum(col("hour_events") * col("hour_events")).as("sq"))
      hourly.crossJoin(broadcast(stats))
        .withColumn("mean_events", col("s").cast("double") / col("n"))
        .withColumn("stddev_events",
          sqrt((col("sq").cast("double") -
            col("s").cast("double") * col("s") / col("n")) / (col("n") - 1)))
        .filter(abs(col("hour_events") - col("mean_events")) >
          lit(2.0) * col("stddev_events"))
        .select(col("event_date"), col("event_hour"), col("hour_events"),
          round(col("mean_events"), 6).as("mean_events"),
          round((col("hour_events") - col("mean_events")) /
            col("stddev_events"), 6).as("zscore"))
    }),

    // D14: gate aggregation — evaluate several constraints in one
    // pass, derive per-check status, gate passes iff none FAILED
    // (WARNING passes). One row per check + status.
    "d14_gate_aggregation" -> ((s, d) => {
      val m = Tables.events(s, d).agg(
        count(lit(1)).as("total_rows"),
        countIf(col("event_id").isNull).as("null_ids"),
        countDistinct(col("event_id")).as("distinct_ids"),
        countIf(!col("event_type").isin(
          "click", "view", "purchase", "signup", "error")).as("bad_types"),
        countIf(col("value") < 0).as("negative_values"))
      val checks = m.select(
        lit("completeness").as("check_name"),
        when(col("null_ids") === 0, "PASSED").otherwise("FAILED").as("status"))
        .unionByName(m.select(
          lit("uniqueness").as("check_name"),
          when(col("distinct_ids") === col("total_rows"), "PASSED")
            .otherwise("FAILED").as("status")))
        .unionByName(m.select(
          lit("containment").as("check_name"),
          when(col("bad_types") === 0, "PASSED").otherwise("FAILED")
            .as("status")))
        .unionByName(m.select(
          lit("non_negative").as("check_name"),
          when(col("negative_values") === 0, "PASSED").otherwise("WARNING")
            .as("status")))
      checks.crossJoin(
        checks.agg(countIf(col("status") === "FAILED").as("failed_count"))
          .select((col("failed_count") === 0).as("gate_passed")))
    })
  )

  val oracle: Map[String, String] = Map(
    "p01_from_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,

    "d07_accuracy_recompute" ->
      """SELECT total_rows, delta_match_count, abs_match_count,
        |  ROUND(CAST(delta_match_count AS DOUBLE) / total_rows, 6) AS delta_accuracy,
        |  CAST(delta_match_count AS DOUBLE) / total_rows >= 0.99 AS accuracy_passed
        |FROM (
        |  SELECT COUNT(*) AS total_rows,
        |    CAST(SUM(CASE WHEN delta_matches THEN 1 ELSE 0 END) AS BIGINT) AS delta_match_count,
        |    CAST(SUM(CASE WHEN abs_matches THEN 1 ELSE 0 END) AS BIGINT) AS abs_match_count
        |  FROM (
        |    SELECT
        |      length_delta = CASE WHEN event_type = 'error' THEN -value ELSE value END AS delta_matches,
        |      ABS(length_delta) = value AS abs_matches
        |    FROM (
        |      SELECT event_id,
        |        CASE WHEN event_type = 'error' THEN -value ELSE value END AS length_delta,
        |        event_type, value
        |      FROM events)))""".stripMargin,

    "d11_consistency_check" ->
      """SELECT group_count, violation_count,
        |  violation_count = 0 AS consistency_passed
        |FROM (
        |  SELECT COUNT(*) AS group_count,
        |    CAST(SUM(CASE WHEN total_events < unique_users THEN 1 ELSE 0 END) AS BIGINT) AS violation_count
        |  FROM (
        |    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |      hour(ts) AS event_hour,
        |      COUNT(*) AS total_events,
        |      COUNT(DISTINCT user_id) AS unique_users
        |    FROM events GROUP BY 1, 2))""".stripMargin,

    "d15_anomaly_hours" ->
      """WITH hourly AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |    CAST(hour(ts) AS INTEGER) AS event_hour,
        |    COUNT(*) AS hour_events
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(hour_events) AS BIGINT) AS s,
        |    CAST(SUM(hour_events * hour_events) AS BIGINT) AS sq
        |  FROM hourly),
        |scored AS (
        |  SELECT h.event_date, h.event_hour, h.hour_events,
        |    CAST(t.s AS DOUBLE) / t.n AS mean_events,
        |    sqrt((CAST(t.sq AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n)
        |      / (t.n - 1)) AS stddev_events
        |  FROM hourly h CROSS JOIN stats t)
        |SELECT event_date, event_hour, hour_events,
        |  ROUND(mean_events, 6) AS mean_events,
        |  ROUND((hour_events - mean_events) / stddev_events, 6) AS zscore
        |FROM scored
        |WHERE abs(hour_events - mean_events) > 2.0 * stddev_events""".stripMargin,

    "d14_gate_aggregation" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS total_rows,
        |    CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ids,
        |    COUNT(DISTINCT event_id) AS distinct_ids,
        |    CAST(SUM(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS bad_types,
        |    CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_values
        |  FROM events),
        |checks AS (
        |  SELECT 'completeness' AS check_name,
        |    CASE WHEN null_ids = 0 THEN 'PASSED' ELSE 'FAILED' END AS status FROM m
        |  UNION ALL
        |  SELECT 'uniqueness',
        |    CASE WHEN distinct_ids = total_rows THEN 'PASSED' ELSE 'FAILED' END FROM m
        |  UNION ALL
        |  SELECT 'containment',
        |    CASE WHEN bad_types = 0 THEN 'PASSED' ELSE 'FAILED' END FROM m
        |  UNION ALL
        |  SELECT 'non_negative',
        |    CASE WHEN negative_values = 0 THEN 'PASSED' ELSE 'WARNING' END FROM m)
        |SELECT c.check_name, c.status, g.gate_passed
        |FROM checks c CROSS JOIN (
        |  SELECT CAST(SUM(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) = 0 AS gate_passed
        |  FROM checks) g""".stripMargin
  )
}

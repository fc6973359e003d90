package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Settings

/** Higher-order DQ checks beyond single-column constraints
  * (SURVEY §2.9 D6-D13), faithful to
  * /root/reference/spark/jobs/dq/dq_checks.py.
  */
object Checks {

  /** D6: timeliness — P95(|processed - event ts|) vs SLA; WARNING,
    * never FAILED (non-blocking by design, dq_checks.py:722-730). */
  def timeliness(df: DataFrame, processedCol: String, eventCol: String,
                 p95ThresholdSeconds: Double = Settings.TimelinessP95Seconds)
      : CheckResult = {
    val lat = df.select(abs(unix_timestamp(col(processedCol)) -
      unix_timestamp(col(eventCol))).as("latency_seconds"))
    val row = lat.agg(
      expr("percentile(latency_seconds, 0.95D)").as("p95"),
      count(lit(1)).as("n")).collect()(0)
    if (row.isNullAt(0))
      return CheckResult("timeliness_p95", "timeliness", "PASSED", 0.0,
        p95ThresholdSeconds, "no rows")
    val p95 = row.getDouble(0)
    CheckResult("timeliness_p95", "timeliness",
      if (p95 <= p95ThresholdSeconds) "PASSED" else "WARNING",
      p95, p95ThresholdSeconds, f"p95 latency $p95%.1f s")
  }

  /** D7/D8/D9: accuracy — re-derive a column and require an equality
    * ratio >= threshold (dq_checks.py:825-974). The expected value is
    * recomputed inside the same job; for D9 the per-domain loop of the
    * reference (18 jobs) collapses into one aggregation.
    */
  def accuracy(df: DataFrame, name: String,
               expected: org.apache.spark.sql.Column,
               actual: org.apache.spark.sql.Column,
               threshold: Double = Settings.AccuracyThreshold): CheckResult = {
    val row = df.agg(
      sum(when(expected <=> actual, 1L).otherwise(0L)).as("matches"),
      count(lit(1)).as("total")).collect()(0)
    val total = row.getLong(1)
    val r = if (total == 0) 1.0 else row.getLong(0).toDouble / total
    CheckResult(s"accuracy_$name", "accuracy",
      if (r >= threshold) "PASSED" else "FAILED", r, threshold,
      f"recomputed-match ratio $r%.6f")
  }

  /** D10/D11: consistency — a cross-column invariant must hold on
    * every row (violations == 0). */
  def consistency(df: DataFrame, name: String,
                  invariant: org.apache.spark.sql.Column): CheckResult = {
    val row = df.agg(
      sum(when(!coalesce(invariant, lit(false)), 1L).otherwise(0L))
        .as("violations"),
      count(lit(1)).as("total")).collect()(0)
    val v = row.getLong(0)
    CheckResult(s"consistency_$name", "consistency",
      if (v == 0) "PASSED" else "FAILED", v.toDouble, 0.0,
      s"$v violating rows of ${row.getLong(1)}")
  }

  /** D13: drift — current metric vs baseline; >10% WARNING, >20%
    * treated as alert-level WARNING (non-blocking,
    * silver_dq_gate.py:195-223). */
  def drift(current: Double, baseline: Double, name: String): CheckResult = {
    val pct =
      if (baseline == 0.0) 0.0
      else math.abs(current - baseline) / math.abs(baseline) * 100.0
    val status = if (pct > 10.0) "WARNING" else "PASSED"
    CheckResult(s"drift_$name", "drift", status, pct, 10.0,
      f"drift $pct%.2f%% (current=$current%.4f baseline=$baseline%.4f, " +
        s"alert=${pct > 20.0})")
  }
}

package graft.dq

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.store.TableStore
import graft.wiki.WikiSchemas

/** Alert/metric sink replacing CloudWatch/SNS (SURVEY §7.1 module 6). */
trait Notifier {
  def notify(layer: String, result: GateResult): Unit
}

object ConsoleNotifier extends Notifier {
  def notify(layer: String, result: GateResult): Unit = {
    val tag = if (result.passed) "PASS" else "FAIL"
    println(s"[dq] $layer gate $tag — " +
      result.results.map(r => s"${r.checkName}:${r.status}").mkString(", "))
  }
}

/** D14: gate aggregation — passes iff no FAILED/ERROR (WARNING passes,
  * dq_checks.py:119-140); audit trail appended per run
  * (dq_utils.py:125-194). Blocking semantics live in the orchestrator,
  * which stops the cycle on a failed gate.
  */
final case class GateResult(layer: String, runId: String,
                            results: Seq[CheckResult]) {
  def passed: Boolean = !results.exists(_.failed)
}

class GateRunner(spark: SparkSession, store: TableStore,
                 notifier: Notifier = ConsoleNotifier,
                 auditTable: String = "dq_audit.quality_results") {

  def run(layer: String, runId: String, runDate: String,
          results: Seq[CheckResult]): GateResult = {
    val gate = GateResult(layer, runId, results)
    writeAudit(layer, runId, runDate, results)
    notifier.notify(layer, gate)
    gate
  }

  /** D12: latest upstream gate status from the audit table; missing
    * history is treated as passed (dq_checks.py:1130-1164). */
  def upstreamPassed(layer: String): Boolean = {
    if (!store.exists(auditTable)) return true
    val df = store.scan(auditTable)
    if (df.isEmpty) return true
    import org.apache.spark.sql.functions._
    // latest by write time, not run_id — lexicographic run_id ordering
    // lies for non-padded ids ("run-9" > "run-10") and across restarts
    val latest = df.filter(col("layer") === layer)
      .groupBy(col("run_id"))
      .agg(max(when(col("status").isin("FAILED", "ERROR"), 1).otherwise(0))
        .as("has_failure"),
        max(col("created_at")).as("latest_at"))
      .orderBy(col("latest_at").desc).limit(1).collect()
    latest.isEmpty || latest(0).getInt(1) == 0
  }

  /** A8 persistence: append column profiles for this run
    * (dq_utils.py:241-257). */
  def writeProfiles(layer: String, runId: String, runDate: String,
                    profiles: Seq[ColumnProfile],
                    table: String = "dq_audit.profile_metrics"): Unit = {
    if (profiles.isEmpty) return
    store.ensure(table, WikiSchemas.ProfileMetricSchema,
      Seq("run_date", "layer"))
    val rows = profiles.map { p =>
      Row(runId, runDate, layer, p.column, p.rowCount, p.nullRate,
        p.distinctCount, p.mean.orNull, p.stddev.orNull, p.min.orNull,
        p.max.orNull, p.p25.orNull, p.p50.orNull, p.p75.orNull,
        p.p95.orNull)
    }
    store.append(table, spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      WikiSchemas.ProfileMetricSchema))
  }

  /** D13 baseline: mean-of-means over PRIOR runs for a column
    * (dq_utils.py:439-482, 7-day lookback semantics ≙ run history). */
  def baselineMean(layer: String, columnName: String, excludeRunId: String,
                   table: String = "dq_audit.profile_metrics"): Option[Double] = {
    if (!store.exists(table)) return None
    val df = store.scan(table)
    if (df.isEmpty) return None
    import org.apache.spark.sql.functions._
    val rows = df.filter(col("layer") === layer &&
        col("column_name") === columnName && col("run_id") =!= excludeRunId)
      .agg(avg(col("mean")).as("baseline"), count(lit(1)).as("n")).collect()
    if (rows.isEmpty || rows(0).isNullAt(0) || rows(0).getLong(1) == 0) None
    else Some(rows(0).getDouble(0))
  }

  private def writeAudit(layer: String, runId: String, runDate: String,
                         results: Seq[CheckResult]): Unit = {
    store.ensure(auditTable, WikiSchemas.QualityResultSchema,
      Seq("run_date", "layer"))
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val rows = results.map(r => Row(runId, runDate, layer, r.checkName,
      r.checkType, r.status, r.metricValue, r.threshold, r.details, now))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      WikiSchemas.QualityResultSchema)
    store.append(auditTable, df)
  }
}

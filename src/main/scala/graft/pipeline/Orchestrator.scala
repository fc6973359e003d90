package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Settings
import graft.dq._
import graft.store.TableStore
import graft.wiki._

/** Batch-cycle orchestrator replacing the reference's Step Functions
  * state machine (SURVEY §3.3 + batch_pipeline.json.tftpl): BronzeDQ →
  * Silver → SilverDQ → Gold (hourly, risk, summary — risk strictly
  * before summary, the reference's table-mediated dependency) → GoldDQ,
  * fail-fast on any FAILED gate.
  */
final case class CycleResult(runId: String, completed: Seq[String],
                             failedGate: Option[String],
                             gateResults: Seq[GateResult]) {
  def succeeded: Boolean = failedGate.isEmpty
}

class Orchestrator(spark: SparkSession, store: TableStore,
                   clock: Clock = Clock.system,
                   notifier: Notifier = ConsoleNotifier) {

  private val gates = new GateRunner(spark, store, notifier)

  def runCycle(runId: String, startDate: String, endDate: String): CycleResult = {
    var completed = Vector.empty[String]
    var gateResults = Vector.empty[GateResult]

    def gate(layer: String, results: Seq[CheckResult]): Boolean = {
      val g = gates.run(layer, runId, startDate, results)
      gateResults :+= g
      g.passed
    }

    // Declare bronze before scanning: a standalone batch run (restart
    // without the streaming job) must read the declared types, not
    // partition-inferred ones (event_date stays STRING). Idempotent —
    // persisted metadata wins if the table already exists.
    store.ensure("bronze.raw_events", WikiSchemas.BronzeSchema,
      Seq("event_date", "event_hour"))

    // ---- Bronze DQ gate (bronze_dq_gate.py) ----
    val bronze = store.scanRange("bronze.raw_events", "event_date",
      startDate, endDate)
    val bronzeChecks = ConstraintEval.run(bronze, Seq(
      Constraint.Complete("event_id"),
      Constraint.Complete("event_type"),
      Constraint.Complete("domain"),
      Constraint.Complete("event_timestamp"),
      Constraint.Completeness("title", Settings.CompletenessThreshold),
      Constraint.Completeness("user", Settings.CompletenessThreshold),
      Constraint.Completeness("wiki", Settings.CompletenessThreshold),
      Constraint.ContainedIn("event_type",
        Seq("edit", "new", "log", "categorize", "external", "unknown")),
      Constraint.Bounded("event_hour", 0, 23),
      Constraint.Unique(Seq("event_id"), Settings.UniquenessThreshold))) :+
      Checks.timeliness(bronze, "bronze_processed_at", "event_timestamp")
    if (!gate("bronze", bronzeChecks))
      return CycleResult(runId, completed, Some("bronze"), gateResults)

    // D12: cross-cycle upstream gate blocking (dq_checks.py:1130-1164).
    // Within a cycle the fail-fast return above already stops on a
    // failed gate; this guards stage reruns against audit history
    // written by an earlier failed run.
    if (!gates.upstreamPassed("bronze"))
      return CycleResult(runId, completed, Some("bronze:upstream"), gateResults)

    // ---- Silver batch (silver_batch_job.py) ----
    store.ensure("silver.cleaned_events", WikiSchemas.SilverSchema,
      Seq("event_date", "region"))
    val silver = SilverTransform(bronze, clock)
    store.mergeUpsert("silver.cleaned_events", silver, Seq("event_id"))
    completed :+= "silver"

    // ---- Silver DQ gate (silver_dq_gate.py) ----
    val silverT = store.scanRange("silver.cleaned_events", "event_date",
      startDate, endDate)
    // A8 + D13: profile the silver batch, persist, and drift-check the
    // key metric against prior-run history (WARNING-only)
    val silverProfiles = Profiler.profile(silverT,
      Seq("length_delta", "namespace"), Seq("region", "user_normalized"))
    gates.writeProfiles("silver", runId, startDate, silverProfiles)
    val driftChecks = for {
      profile <- silverProfiles.find(_.column == "length_delta").toSeq
      current <- profile.mean.toSeq
      baseline <- gates.baselineMean("silver", "length_delta", runId).toSeq
    } yield Checks.drift(current, baseline, "length_delta_mean")

    val silverChecks = driftChecks ++ ConstraintEval.run(silverT, Seq(
      Constraint.Complete("event_id"),
      Constraint.Complete("domain"),
      Constraint.Complete("region"),
      Constraint.Complete("event_timestamp"),
      Constraint.ContainedIn("region",
        Settings.DomainRegionMap.map(_._2).distinct :+ "other"),
      Constraint.Unique(Seq("event_id"), 1.0))) ++ Seq(
      Checks.accuracy(silverT, "length_delta",
        col("length_new") - col("length_old"), col("length_delta")),
      Checks.accuracy(silverT, "is_anonymous",
        // null users: rlike yields NULL but the transform writes false —
        // coalesce so the recompute matches the transform's fallback
        coalesce(col("user_normalized")
          .rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$"), lit(false)),
        col("is_anonymous")),
      Checks.consistency(silverT, "is_valid_all_true", col("is_valid")))
    if (!gate("silver", silverChecks))
      return CycleResult(runId, completed, Some("silver"), gateResults)

    if (!gates.upstreamPassed("silver"))
      return CycleResult(runId, completed, Some("silver:upstream"), gateResults)

    // ---- Gold batch (gold_batch_job.py; risk before summary) ----
    val hourly = GoldTransforms.hourlyStats(silverT, clock)
    store.ensure("gold.hourly_stats", hourly.schema,
      Seq("stat_date", "region"))
    store.mergeUpsert("gold.hourly_stats", hourly,
      Seq("stat_date", "region", "stat_hour", "domain"))
    completed :+= "gold.hourly_stats"

    val risk = GoldTransforms.riskScores(GoldTransforms.userMetrics(silverT), clock)
    store.ensure("gold.risk_scores", risk.schema, Seq("stat_date"))
    store.mergeUpsert("gold.risk_scores", risk, Seq("stat_date", "entity_id"))
    completed :+= "gold.risk_scores"

    val riskT = store.scanRange("gold.risk_scores", "stat_date",
      startDate, endDate)
    val summary = GoldTransforms.dailySummary(silverT, riskT, clock)
    store.ensure("gold.daily_analytics_summary", summary.schema,
      Seq("summary_date"))
    store.mergeUpsert("gold.daily_analytics_summary", summary,
      Seq("summary_date"))
    completed :+= "gold.daily_analytics_summary"

    // ---- Gold DQ gate (gold_dq_gate.py) ----
    val hourlyT = store.scanRange("gold.hourly_stats", "stat_date",
      startDate, endDate)
    val goldChecks = ConstraintEval.run(hourlyT, Seq(
      Constraint.Complete("domain"),
      Constraint.Complete("total_events"),
      Constraint.Bounded("bot_percentage", 0, 100))) ++
      ConstraintEval.run(riskT, Seq(
        Constraint.Complete("entity_id"),
        Constraint.Bounded("risk_score", 0, 100),
        Constraint.ContainedIn("risk_level", Seq("LOW", "MEDIUM", "HIGH")))) :+
      Checks.consistency(hourlyT, "events_ge_users",
        col("total_events") >= col("unique_users"))
    if (!gate("gold", goldChecks))
      return CycleResult(runId, completed, Some("gold"), gateResults)

    CycleResult(runId, completed, None, gateResults)
  }
}

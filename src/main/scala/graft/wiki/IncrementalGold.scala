package graft.wiki

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Settings
import graft.store.TableStore

/** Incremental maintenance of `gold.hourly_stats` (A1) from silver
  * batch DELTAS — the scale path the reference lacks: its gold job
  * recomputes every aggregate from a full silver rescan each cycle
  * (gold_batch_job.py:68-121), so cycle cost grows with history even
  * when a micro-batch touches one hour.
  *
  * The trick is keeping a mergeable partial-aggregate STATE table
  * beside the published gold table:
  *   - additive measures (counts, conditional counts, byte sums) merge
  *     by `sum`;
  *   - the two COUNT(DISTINCT) measures keep Datasketches HLL sketches
  *     (`hll_sketch_agg`) which merge by `hll_union_agg` — the same
  *     exact↔approx seam as a13 and the streaming job (the batch
  *     recompute stays the exact source of truth);
  *   - ratios (`avg_edit_size`, `bot_percentage`) are derived at
  *     publish time from exact sums, never merged.
  *
  * Per batch the work is O(batch) + O(touched state partitions): the
  * batch is aggregated once map-side, the state scan is pruned to the
  * dates the batch lands in, and both writes are partition-scoped
  * MERGEs. Nothing rescans silver.
  *
  * Exactly-once contract: each silver row must be folded in exactly
  * once — feed `refresh` from the deduplicated output of the silver
  * MERGE (fresh rows), or run it inside the same foreachBatch that
  * holds the streaming checkpoint. Replaying a batch double-counts by
  * design (state merge is additive, not idempotent).
  */
object IncrementalGold {

  /** Merge keys of both the state and the published table. */
  val GroupKeys: Seq[String] = Seq("stat_date", "stat_hour", "domain", "region")

  private def cnt(p: Column): Column = sum(when(p, 1L).otherwise(0L))

  private val additive = Seq("total_events", "bytes_added", "bytes_removed",
    "abs_delta_sum", "bot_edits", "human_edits", "anonymous_edits",
    "type_edit", "type_new", "type_categorize", "type_log",
    "large_deletions", "large_additions")

  /** One silver batch → mergeable partial state. Pure map-side-combined
    * aggregation of the batch; the group key mirrors A1. */
  def partialState(silverBatch: DataFrame): DataFrame =
    silverBatch
      .groupBy(col("event_date").as("stat_date"),
        hour(col("event_timestamp")).as("stat_hour"),
        col("domain"), col("region"))
      .agg(
        count(lit(1)).as("total_events"),
        hll_sketch_agg(col("user_normalized")).as("users_sketch"),
        hll_sketch_agg(col("title")).as("pages_sketch"),
        sum(when(col("length_delta") > 0, col("length_delta")).otherwise(0L))
          .as("bytes_added"),
        sum(when(col("length_delta") < 0, abs(col("length_delta")))
          .otherwise(0L)).as("bytes_removed"),
        sum(abs(coalesce(col("length_delta"), lit(0))).cast("long"))
          .as("abs_delta_sum"),
        cnt(col("is_bot") === true).as("bot_edits"),
        cnt(col("is_bot") === false).as("human_edits"),
        cnt(col("is_anonymous") === true).as("anonymous_edits"),
        cnt(col("event_type") === "edit").as("type_edit"),
        cnt(col("event_type") === "new").as("type_new"),
        cnt(col("event_type") === "categorize").as("type_categorize"),
        cnt(col("event_type") === "log").as("type_log"),
        cnt(col("is_large_deletion") === true).as("large_deletions"),
        cnt(col("is_large_addition") === true).as("large_additions"))

  /** Combine states: one shuffle on the group key; sums add, sketches
    * union. Both inputs must already have the partialState schema. */
  def merged(state: DataFrame, delta: DataFrame): DataFrame = {
    val aggs = additive.map(c => sum(col(c)).as(c)) ++ Seq(
      hll_union_agg(col("users_sketch")).as("users_sketch"),
      hll_union_agg(col("pages_sketch")).as("pages_sketch"))
    state.unionByName(delta)
      .groupBy(GroupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      // agg emits additive ++ sketches; restore the partialState order
      .select((GroupKeys.map(col) ++ Seq(col("total_events"),
        col("users_sketch"), col("pages_sketch")) ++
        additive.drop(1).map(col)): _*)
  }

  /** State → the published A1 schema (same columns, same order, same
    * arithmetic as [[GoldTransforms.hourlyStats]]; distinct counts are
    * HLL estimates — exact for low-cardinality groups, ~2% at scale).
    */
  def publish(state: DataFrame, clock: Clock = Clock.system): DataFrame =
    state.select(
      col("stat_date"), col("stat_hour"), col("domain"), col("region"),
      col("total_events"),
      hll_sketch_estimate(col("users_sketch")).as("unique_users"),
      hll_sketch_estimate(col("pages_sketch")).as("unique_pages"),
      col("bytes_added"), col("bytes_removed"),
      // avg(long) in the batch path = exact long sum / count in double
      (col("abs_delta_sum").cast("double") / col("total_events"))
        .as("avg_edit_size"),
      col("bot_edits"), col("human_edits"),
      round(lit(100.0) * col("bot_edits") / col("total_events"), 2)
        .as("bot_percentage"),
      col("anonymous_edits"),
      col("type_edit"), col("type_new"), col("type_categorize"),
      col("type_log"), col("large_deletions"), col("large_additions"))
      .withColumn("gold_processed_at", clock.now)
      .withColumn("schema_version", lit(Settings.SchemaVersion))

  /** Repair path (the lambda-architecture reconciliation): REBUILD the
    * state and gold rows of the given dates from the silver slice —
    * exact truth replaces whatever the additive stream accumulated
    * (double-folds from an at-least-once source, HLL drift, manual
    * edits). Unlike [[refresh]] this is idempotent: state(date) is a
    * pure function of the silver rows passed in. Run it from the
    * nightly batch cycle over the dates the cycle covers.
    */
  def rebuildDates(store: TableStore, silverSlice: DataFrame,
                   clock: Clock = Clock.system,
                   stateTable: String = "gold.hourly_stats_state",
                   goldTable: String = "gold.hourly_stats"): Unit = {
    val truth = partialState(silverSlice).localCheckpoint(true)
    try {
      store.ensure(stateTable, truth.schema, Seq("stat_date"))
      val dates = truth.select(col("stat_date")).distinct()
        .collect().map(_.getString(0))
      if (dates.isEmpty) return
      // drop every state/gold row of the touched dates first: groups
      // that vanished from silver (e.g. post-hoc deletes) must not
      // survive the rebuild — a key-merge alone would leave them
      store.delete(stateTable, col("stat_date").isin(dates.toSeq: _*))
      store.mergeUpsert(stateTable, truth, GroupKeys)
      val published = publish(truth, clock)
      store.ensure(goldTable, published.schema, Seq("stat_date", "region"))
      store.delete(goldTable, col("stat_date").isin(dates.toSeq: _*))
      store.mergeUpsert(goldTable, published, GroupKeys)
    } finally graft.SparkUtil.releaseCheckpoint(truth)
  }

  /** Fold one silver batch into the state and republish the touched
    * slice of the gold table. Every scan and write here is scoped to
    * the dates present in the batch.
    */
  def refresh(store: TableStore, silverBatch: DataFrame,
              clock: Clock = Clock.system,
              stateTable: String = "gold.hourly_stats_state",
              goldTable: String = "gold.hourly_stats"): Unit = {
    val delta = partialState(silverBatch)
    store.ensure(stateTable, delta.schema, Seq("stat_date"))
    val dates = delta.select(col("stat_date")).distinct()
      .collect().map(_.getString(0))
    if (dates.isEmpty) return
    val existing = store.scan(stateTable)
      .filter(col("stat_date").isin(dates.toSeq: _*))
    val next = merged(existing, delta).localCheckpoint(true)
    try {
      store.mergeUpsert(stateTable, next, GroupKeys)
      val published = publish(next, clock)
      store.ensure(goldTable, published.schema, Seq("stat_date", "region"))
      store.mergeUpsert(goldTable, published, GroupKeys)
    } finally graft.SparkUtil.releaseCheckpoint(next)
  }

  // ---- A2/A3: user metrics + risk scores -----------------------------
  //
  // The reference recomputes per-user metrics and risk scores from a
  // full silver rescan each cycle (gold_batch_job.py:124-249). The
  // measures are all mergeable: counts/sums add, hour bounds merge by
  // min/max, the two per-user COUNT(DISTINCT)s keep HLL sketches, and
  // EVERYTHING downstream — the ≥5-edits activity gate, the A3 scoring
  // expressions, the evidence JSON — is a post-aggregation projection,
  // applied at publish time over the merged state. A user whose edits
  // straddle batches crosses the activity gate exactly when the batch
  // recompute says so, because the gate sees merged totals, never
  // per-batch ones.

  /** Merge keys of the user-metrics state and the published risk
    * table. */
  val UserKeys: Seq[String] = Seq("stat_date", "entity_id")

  private val userAdditive = Seq("total_edits", "large_deletions",
    "large_additions", "anonymous_edits", "bot_edits", "delta_sum")

  /** One silver batch → mergeable per-(date, user) partial state.
    * Mirrors [[GoldTransforms.userMetrics]]'s pre-gate aggregation;
    * the ≥5 gate is deliberately NOT applied here (see publish). */
  def userState(silverBatch: DataFrame): DataFrame =
    silverBatch
      .filter(col("is_bot") === false && col("user_normalized").isNotNull)
      .groupBy(col("event_date").as("stat_date"),
        col("user_normalized").as("entity_id"))
      .agg(
        count(lit(1)).as("total_edits"),
        min(hour(col("event_timestamp"))).as("min_hour"),
        max(hour(col("event_timestamp"))).as("max_hour"),
        hll_sketch_agg(col("domain")).as("domains_sketch"),
        hll_sketch_agg(col("title")).as("pages_sketch"),
        cnt(col("is_large_deletion") === true).as("large_deletions"),
        cnt(col("is_large_addition") === true).as("large_additions"),
        cnt(col("is_anonymous") === true).as("anonymous_edits"),
        cnt(col("is_bot") === true).as("bot_edits"),
        sum(coalesce(col("length_delta"), lit(0)).cast("long"))
          .as("delta_sum"),
        min(col("length_delta")).as("min_length_delta"))

  /** Combine user states: one shuffle on (date, user). */
  def mergedUserState(state: DataFrame, delta: DataFrame): DataFrame = {
    val aggs = userAdditive.map(c => sum(col(c)).as(c)) ++ Seq(
      min(col("min_hour")).as("min_hour"),
      max(col("max_hour")).as("max_hour"),
      hll_union_agg(col("domains_sketch")).as("domains_sketch"),
      hll_union_agg(col("pages_sketch")).as("pages_sketch"),
      min(col("min_length_delta")).as("min_length_delta"))
    state.unionByName(delta)
      .groupBy(UserKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((UserKeys.map(col) ++ Seq(col("total_edits"),
        col("min_hour"), col("max_hour"),
        col("domains_sketch"), col("pages_sketch"),
        col("large_deletions"), col("large_additions"),
        col("anonymous_edits"), col("bot_edits"),
        col("delta_sum"), col("min_length_delta"))): _*)
  }

  /** State → the A2 schema (same columns, order, and arithmetic as
    * [[GoldTransforms.userMetrics]]; distinct counts are HLL
    * estimates, exact at per-user cardinalities). The ≥5-edits gate
    * lands HERE, on merged totals. */
  def publishUserMetrics(state: DataFrame): DataFrame =
    state.select(
      col("stat_date"), col("entity_id"),
      col("total_edits"),
      (col("total_edits") / 24.0).as("edits_per_hour_avg"),
      (col("max_hour") - col("min_hour") + 1).as("active_hours"),
      hll_sketch_estimate(col("domains_sketch")).as("domains_edited"),
      hll_sketch_estimate(col("pages_sketch")).as("pages_edited"),
      col("large_deletions"), col("large_additions"),
      col("anonymous_edits"), col("bot_edits"),
      (col("delta_sum").cast("double") / col("total_edits"))
        .as("avg_length_delta"),
      col("min_length_delta"))
      .filter(col("total_edits") >= graft.Settings.MinActivityForRisk)
      .withColumn("entity_type", lit("user"))

  /** Fold one silver batch into the user state and republish the A3
    * risk scores AND the A5 per-day risk rollup of the touched dates
    * — the scoring/rollup are the UNCHANGED [[GoldTransforms]]
    * projections, so the incremental path inherits the reference
    * quirks verbatim. The A5 rollup costs one aggregate over the
    * touched dates' published risk rows (bounded by active users). */
  def refreshRisk(store: TableStore, silverBatch: DataFrame,
                  clock: Clock = Clock.system,
                  stateTable: String = "gold.user_metrics_state",
                  riskTable: String = "gold.risk_scores",
                  summaryTable: String = "gold.risk_summary"): Unit = {
    val delta = userState(silverBatch)
    store.ensure(stateTable, delta.schema, Seq("stat_date"))
    val dates = delta.select(col("stat_date")).distinct()
      .collect().map(_.getString(0))
    if (dates.isEmpty) return
    val existing = store.scan(stateTable)
      .filter(col("stat_date").isin(dates.toSeq: _*))
    val next = mergedUserState(existing, delta).localCheckpoint(true)
    try {
      store.mergeUpsert(stateTable, next, UserKeys)
      val published = GoldTransforms.riskScores(publishUserMetrics(next), clock)
        .localCheckpoint(true)
      try {
        store.ensure(riskTable, published.schema, Seq("stat_date"))
        store.mergeUpsert(riskTable, published, UserKeys)
        val summary = GoldTransforms.riskSummary(published)
        store.ensure(summaryTable, summary.schema, Seq("stat_date"))
        store.mergeUpsert(summaryTable, summary, Seq("stat_date"))
      } finally graft.SparkUtil.releaseCheckpoint(published)
    } finally graft.SparkUtil.releaseCheckpoint(next)
  }

  /** Exact rebuild of the user state + risk rows of the given dates
    * from silver truth — the idempotent repair twin of [[refreshRisk]]
    * (same role as [[rebuildDates]] for A1). */
  def rebuildRiskDates(store: TableStore, silverSlice: DataFrame,
                       clock: Clock = Clock.system,
                       stateTable: String = "gold.user_metrics_state",
                       riskTable: String = "gold.risk_scores",
                       summaryTable: String = "gold.risk_summary"): Unit = {
    val truth = userState(silverSlice).localCheckpoint(true)
    try {
      store.ensure(stateTable, truth.schema, Seq("stat_date"))
      val dates = truth.select(col("stat_date")).distinct()
        .collect().map(_.getString(0))
      if (dates.isEmpty) return
      store.delete(stateTable, col("stat_date").isin(dates.toSeq: _*))
      store.mergeUpsert(stateTable, truth, UserKeys)
      val published = GoldTransforms.riskScores(publishUserMetrics(truth), clock)
        .localCheckpoint(true)
      try {
        store.ensure(riskTable, published.schema, Seq("stat_date"))
        store.delete(riskTable, col("stat_date").isin(dates.toSeq: _*))
        store.mergeUpsert(riskTable, published, UserKeys)
        val summary = GoldTransforms.riskSummary(published)
        store.ensure(summaryTable, summary.schema, Seq("stat_date"))
        store.delete(summaryTable, col("stat_date").isin(dates.toSeq: _*))
        store.mergeUpsert(summaryTable, summary, Seq("stat_date"))
      } finally graft.SparkUtil.releaseCheckpoint(published)
    } finally graft.SparkUtil.releaseCheckpoint(truth)
  }

  // ---- A4-A6: daily executive summary --------------------------------
  //
  // State is kept at (date, HOUR) grain — finer than the published
  // (date) grain — because peak_hour_events needs per-hour event
  // counts that keep accumulating as batches land in the same hour
  // (a max of per-batch maxima would undercount). Publishing folds at
  // most 24 state rows per date: sums add, sketches union, peak is
  // the max hourly count. The A6 projection itself is the SHARED
  // [[GoldTransforms.summaryProject]], so batch and incremental
  // arithmetic cannot drift.

  /** Merge keys of the daily-summary state table. */
  val DailyKeys: Seq[String] = Seq("event_date", "stat_hour")

  private val dailyAdditive = Seq("hour_events", "bot_events",
    "anonymous_events", "registered_user_events", "total_bytes_added",
    "total_bytes_removed", "abs_delta_sum", "edit_events",
    "new_page_events", "large_deletions_count", "large_additions_count",
    "europe_events", "americas_events", "asia_pacific_events")

  /** One silver batch → mergeable per-(date, hour) partial state. */
  def dailyState(silverBatch: DataFrame): DataFrame =
    silverBatch
      .groupBy(col("event_date"),
        hour(col("event_timestamp")).as("stat_hour"))
      .agg(
        count(lit(1)).as("hour_events"),
        hll_sketch_agg(col("user_normalized")).as("users_sketch"),
        hll_sketch_agg(col("domain")).as("domains_sketch"),
        hll_sketch_agg(col("title")).as("pages_sketch"),
        cnt(col("is_bot") === true).as("bot_events"),
        cnt(col("is_anonymous") === true).as("anonymous_events"),
        cnt(col("is_bot") === false && col("is_anonymous") === false)
          .as("registered_user_events"),
        sum(when(col("length_delta") > 0, col("length_delta")).otherwise(0L))
          .as("total_bytes_added"),
        sum(when(col("length_delta") < 0, abs(col("length_delta")))
          .otherwise(0L)).as("total_bytes_removed"),
        sum(abs(coalesce(col("length_delta"), lit(0))).cast("long"))
          .as("abs_delta_sum"),
        cnt(col("event_type") === "edit").as("edit_events"),
        cnt(col("event_type") === "new").as("new_page_events"),
        cnt(col("is_large_deletion") === true).as("large_deletions_count"),
        cnt(col("is_large_addition") === true).as("large_additions_count"),
        cnt(col("region") === "europe").as("europe_events"),
        cnt(col("region") === "americas").as("americas_events"),
        cnt(col("region") === "asia_pacific").as("asia_pacific_events"))

  /** Combine daily states: one shuffle on (date, hour). */
  def mergedDailyState(state: DataFrame, delta: DataFrame): DataFrame = {
    val aggs = dailyAdditive.map(c => sum(col(c)).as(c)) ++ Seq(
      hll_union_agg(col("users_sketch")).as("users_sketch"),
      hll_union_agg(col("domains_sketch")).as("domains_sketch"),
      hll_union_agg(col("pages_sketch")).as("pages_sketch"))
    state.unionByName(delta)
      .groupBy(DailyKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((DailyKeys.map(col) ++ Seq(col("hour_events"),
        col("users_sketch"), col("domains_sketch"), col("pages_sketch")) ++
        dailyAdditive.drop(1).map(col)): _*)
  }

  /** Fold the ≤24 hourly state rows of each date into the daily base
    * the shared A6 projection expects. */
  private def dailyBaseFromState(state: DataFrame): DataFrame =
    state.groupBy(col("event_date"))
      .agg(
        sum(col("hour_events")).as("total_events"),
        hll_sketch_estimate(hll_union_agg(col("users_sketch")))
          .as("unique_users"),
        hll_sketch_estimate(hll_union_agg(col("domains_sketch")))
          .as("active_domains"),
        hll_sketch_estimate(hll_union_agg(col("pages_sketch")))
          .as("unique_pages_edited"),
        sum(col("bot_events")).as("bot_events"),
        sum(col("anonymous_events")).as("anonymous_events"),
        sum(col("registered_user_events")).as("registered_user_events"),
        sum(col("total_bytes_added")).as("total_bytes_added"),
        sum(col("total_bytes_removed")).as("total_bytes_removed"),
        (sum(col("abs_delta_sum")).cast("double") / sum(col("hour_events")))
          .as("avg_edit_size_bytes"),
        sum(col("edit_events")).as("edit_events"),
        sum(col("new_page_events")).as("new_page_events"),
        sum(col("large_deletions_count")).as("large_deletions_count"),
        sum(col("large_additions_count")).as("large_additions_count"),
        sum(col("europe_events")).as("europe_events"),
        sum(col("americas_events")).as("americas_events"),
        sum(col("asia_pacific_events")).as("asia_pacific_events"),
        max(col("hour_events")).as("peak_hour_events"))

  /** The risk rows feeding the daily publish: the already-published
    * risk table's slice for the touched dates (the reference's
    * table-mediated dataflow, SURVEY §3.3), or an empty typed frame
    * when risk has not been maintained yet. */
  private def riskSlice(store: TableStore, like: DataFrame,
                        riskTable: String, dates: Seq[String]): DataFrame =
    if (store.exists(riskTable))
      store.scan(riskTable).filter(col("stat_date").isin(dates: _*))
    else like.limit(0).select(lit("").as("stat_date"),
      lit(0).as("risk_score"), lit("").as("risk_level"),
      lit(false).as("alert_triggered"))

  /** Fold one silver batch into the daily state and republish the
    * touched dates of the daily summary. Run [[refreshRisk]] FIRST in
    * the same cycle — the summary's risk columns read the published
    * risk table, mirroring the reference's job ordering
    * (gold_batch_job.py writes risk_scores before daily_summary). */
  def refreshDaily(store: TableStore, silverBatch: DataFrame,
                   clock: Clock = Clock.system,
                   stateTable: String = "gold.daily_summary_state",
                   goldTable: String = "gold.daily_summary",
                   riskTable: String = "gold.risk_scores"): Unit = {
    val delta = dailyState(silverBatch)
    store.ensure(stateTable, delta.schema, Seq("event_date"))
    val dates = delta.select(col("event_date")).distinct()
      .collect().map(_.getString(0))
    if (dates.isEmpty) return
    val existing = store.scan(stateTable)
      .filter(col("event_date").isin(dates.toSeq: _*))
    val next = mergedDailyState(existing, delta).localCheckpoint(true)
    try {
      store.mergeUpsert(stateTable, next, DailyKeys)
      val published = GoldTransforms.summaryProject(dailyBaseFromState(next),
        riskSlice(store, silverBatch, riskTable, dates.toSeq), clock)
      store.ensure(goldTable, published.schema, Seq("summary_date"))
      store.mergeUpsert(goldTable, published, Seq("summary_date"))
    } finally graft.SparkUtil.releaseCheckpoint(next)
  }

  /** Exact rebuild of the daily state + summary rows of the given
    * dates from silver truth — idempotent repair twin of
    * [[refreshDaily]]. */
  def rebuildDailyDates(store: TableStore, silverSlice: DataFrame,
                        clock: Clock = Clock.system,
                        stateTable: String = "gold.daily_summary_state",
                        goldTable: String = "gold.daily_summary",
                        riskTable: String = "gold.risk_scores"): Unit = {
    val truth = dailyState(silverSlice).localCheckpoint(true)
    try {
      store.ensure(stateTable, truth.schema, Seq("event_date"))
      val dates = truth.select(col("event_date")).distinct()
        .collect().map(_.getString(0))
      if (dates.isEmpty) return
      store.delete(stateTable, col("event_date").isin(dates.toSeq: _*))
      store.mergeUpsert(stateTable, truth, DailyKeys)
      val published = GoldTransforms.summaryProject(dailyBaseFromState(truth),
        riskSlice(store, silverSlice, riskTable, dates.toSeq), clock)
      store.ensure(goldTable, published.schema, Seq("summary_date"))
      store.delete(goldTable, col("summary_date").isin(dates.toSeq: _*))
      store.mergeUpsert(goldTable, published, Seq("summary_date"))
    } finally graft.SparkUtil.releaseCheckpoint(truth)
  }

  /** One silver batch → the WHOLE gold family in O(batch): hourly
    * stats (A1), risk scores (A2/A3), daily summary (A4-A6). Risk
    * refreshes before the summary because the summary reads the
    * published risk table. */
  def refreshAll(store: TableStore, silverBatch: DataFrame,
                 clock: Clock = Clock.system): Unit = {
    refresh(store, silverBatch, clock)
    refreshRisk(store, silverBatch, clock)
    refreshDaily(store, silverBatch, clock)
  }

  /** Exact-repair twin of [[refreshAll]] for the dates in the slice. */
  def rebuildAllDates(store: TableStore, silverSlice: DataFrame,
                      clock: Clock = Clock.system): Unit = {
    rebuildDates(store, silverSlice, clock)
    rebuildRiskDates(store, silverSlice, clock)
    rebuildDailyDates(store, silverSlice, clock)
  }
}

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
    } finally truth.unpersist()
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
    } finally next.unpersist()
  }
}

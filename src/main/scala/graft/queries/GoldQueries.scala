package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Gold-layer analytics from SURVEY §2.4-2.5 (A2-A6, W1), re-expressed
  * over the `events` testdata table with the reference's exact SQL
  * structure — including its documented quirks: the risk LEVEL
  * expression omits the cross-domain factor and the third velocity
  * branch, and `alert_triggered` uses only the top velocity+deletion
  * branches (reference: gold_batch_job.py:169-247, 264-400).
  *
  * The SQL text is shared verbatim between Spark and the DuckDB oracle;
  * only the silver-analog CTE differs by dialect (`date_format` /
  * `get_json_object` vs `strftime` / `json_extract_string`). Velocity
  * thresholds are scaled to the testdata's events-per-user-day range
  * (the reference's 50/25/10 edits-per-hour become 0.5/0.25/0.2).
  */
object GoldQueries extends QueryDsl {

  /** Silver-analog projection: the cleansed/enriched event row
    * (SURVEY §2.2 P9-P12 analog) — Spark SQL dialect. */
  private val silverSpark: String =
    """SELECT event_id, user_id, event_type,
      |  date_format(ts, 'yyyy-MM-dd') AS event_date,
      |  hour(ts) AS event_hour,
      |  CAST(get_json_object(props, '$.k') AS INT) AS page_id,
      |  event_id % 7 = 0 AS is_bot,
      |  event_id % 5 = 0 AS is_anonymous,
      |  CASE WHEN event_type = 'error' THEN -value ELSE value END AS length_delta,
      |  CASE WHEN user_id % 3 = 0 THEN 'europe'
      |       WHEN user_id % 3 = 1 THEN 'americas'
      |       ELSE 'asia_pacific' END AS region
      |FROM events""".stripMargin

  /** Same projection — DuckDB dialect. */
  private val silverDuck: String =
    """SELECT event_id, user_id, event_type,
      |  strftime(ts, '%Y-%m-%d') AS event_date,
      |  CAST(hour(ts) AS INTEGER) AS event_hour,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS page_id,
      |  event_id % 7 = 0 AS is_bot,
      |  event_id % 5 = 0 AS is_anonymous,
      |  CASE WHEN event_type = 'error' THEN -value ELSE value END AS length_delta,
      |  CASE WHEN user_id % 3 = 0 THEN 'europe'
      |       WHEN user_id % 3 = 1 THEN 'americas'
      |       ELSE 'asia_pacific' END AS region
      |FROM events""".stripMargin

  /** A2: per-user-day metrics with activity gate
    * (gold_batch_job.py:137-164). */
  private val userMetrics: String =
    """SELECT event_date AS stat_date,
      |  user_id AS entity_id,
      |  'user' AS entity_type,
      |  COUNT(*) AS total_edits,
      |  CAST(COUNT(*) AS DOUBLE) / 24.0 AS edits_per_hour_avg,
      |  MAX(event_hour) - MIN(event_hour) + 1 AS active_hours,
      |  COUNT(DISTINCT event_type) AS domains_edited,
      |  COUNT(DISTINCT page_id) AS pages_edited,
      |  CAST(SUM(CASE WHEN length_delta < -150 THEN 1 ELSE 0 END) AS BIGINT) AS large_deletions,
      |  CAST(SUM(CASE WHEN length_delta > 150 THEN 1 ELSE 0 END) AS BIGINT) AS large_additions,
      |  CAST(SUM(CASE WHEN is_anonymous THEN 1 ELSE 0 END) AS BIGINT) AS anonymous_edits,
      |  CAST(SUM(CAST(COALESCE(length_delta, 0) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_length_delta,
      |  MIN(length_delta) AS min_length_delta
      |FROM silver
      |WHERE is_bot = false AND user_id IS NOT NULL
      |GROUP BY event_date, user_id
      |HAVING COUNT(*) >= 5""".stripMargin

  /** A3: risk scoring — faithful structure incl. the level/alert
    * asymmetry (gold_batch_job.py:169-247). */
  private val riskSelect: String =
    """SELECT
      |  stat_date, entity_id, entity_type, total_edits, edits_per_hour_avg,
      |  large_deletions, domains_edited,
      |  CAST(LEAST(100, GREATEST(0,
      |    CASE WHEN edits_per_hour_avg > 0.5 THEN 40
      |         WHEN edits_per_hour_avg > 0.25 THEN 25
      |         WHEN edits_per_hour_avg > 0.2 THEN 10 ELSE 0 END
      |    + CASE WHEN large_deletions > 3 THEN 30
      |           WHEN large_deletions > 1 THEN 15 ELSE 0 END
      |    + CASE WHEN anonymous_edits > total_edits * 0.5 THEN 20 ELSE 0 END
      |    + CASE WHEN domains_edited > 3 AND edits_per_hour_avg > 0.25 THEN 10 ELSE 0 END
      |  )) AS BIGINT) AS risk_score,
      |  CASE WHEN LEAST(100, GREATEST(0,
      |      CASE WHEN edits_per_hour_avg > 0.5 THEN 40
      |           WHEN edits_per_hour_avg > 0.25 THEN 25 ELSE 0 END
      |      + CASE WHEN large_deletions > 3 THEN 30
      |             WHEN large_deletions > 1 THEN 15 ELSE 0 END
      |      + CASE WHEN anonymous_edits > total_edits * 0.5 THEN 20 ELSE 0 END
      |      + CASE WHEN domains_edited > 3 AND edits_per_hour_avg > 0.25 THEN 10 ELSE 0 END
      |    )) >= 70 THEN 'HIGH'
      |    WHEN LEAST(100, GREATEST(0,
      |      CASE WHEN edits_per_hour_avg > 0.5 THEN 40
      |           WHEN edits_per_hour_avg > 0.25 THEN 25 ELSE 0 END
      |      + CASE WHEN large_deletions > 3 THEN 30
      |             WHEN large_deletions > 1 THEN 15 ELSE 0 END
      |      + CASE WHEN anonymous_edits > total_edits * 0.5 THEN 20 ELSE 0 END
      |    )) >= 40 THEN 'MEDIUM'
      |    ELSE 'LOW' END AS risk_level,
      |  CONCAT('{',
      |    '"edits_per_hour":', ROUND(edits_per_hour_avg, 2), ',',
      |    '"large_deletions":', large_deletions, ',',
      |    '"domains_edited":', domains_edited, ',',
      |    '"total_edits":', total_edits, ',',
      |    '"anonymous_edits":', anonymous_edits,
      |  '}') AS evidence,
      |  CASE WHEN LEAST(100, GREATEST(0,
      |      CASE WHEN edits_per_hour_avg > 0.5 THEN 40 ELSE 0 END
      |      + CASE WHEN large_deletions > 3 THEN 30 ELSE 0 END
      |    )) >= 70 THEN true ELSE false END AS alert_triggered,
      |  '1.0.0' AS schema_version
      |FROM user_metrics""".stripMargin

  /** A5: risk summary per day (gold_batch_job.py:317-330). */
  private val riskSummary: String =
    """SELECT stat_date,
      |  COUNT(*) AS total_scored_users,
      |  CAST(SUM(CASE WHEN risk_level = 'HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_users,
      |  CAST(SUM(CASE WHEN risk_level = 'MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium_risk_users,
      |  CAST(SUM(CASE WHEN risk_level = 'LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low_risk_users,
      |  AVG(risk_score) AS avg_risk_score,
      |  MAX(risk_score) AS max_risk_score,
      |  CAST(SUM(CASE WHEN alert_triggered THEN 1 ELSE 0 END) AS BIGINT) AS alerts_triggered
      |FROM risk
      |GROUP BY stat_date""".stripMargin

  /** A4: daily base + W1 peak hour (gold_batch_job.py:265-315). The
    * reference phrases W1 as COUNT(*) OVER (PARTITION BY date, hour)
    * then MAX — identical result via two-level aggregation, without
    * shuffling/sorting every raw event row through a window. */
  private val dailyBase: String =
    """SELECT b.*, p.peak_hour_events FROM (
      |SELECT
      |  event_date,
      |  COUNT(*) AS total_events,
      |  COUNT(DISTINCT user_id) AS unique_users,
      |  COUNT(DISTINCT event_type) AS active_domains,
      |  COUNT(DISTINCT page_id) AS unique_pages_edited,
      |  CAST(SUM(CASE WHEN is_bot THEN 1 ELSE 0 END) AS BIGINT) AS bot_events,
      |  CAST(SUM(CASE WHEN is_anonymous THEN 1 ELSE 0 END) AS BIGINT) AS anonymous_events,
      |  CAST(SUM(CASE WHEN is_bot = false AND is_anonymous = false THEN 1 ELSE 0 END) AS BIGINT) AS registered_user_events,
      |  CAST(SUM(CAST(CASE WHEN length_delta > 0 THEN length_delta ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS total_bytes_added,
      |  CAST(SUM(CAST(CASE WHEN length_delta < 0 THEN ABS(length_delta) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS total_bytes_removed,
      |  CAST(SUM(CAST(ABS(COALESCE(length_delta, 0)) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_edit_size_bytes,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS edit_events,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS new_page_events,
      |  CAST(SUM(CASE WHEN length_delta < -150 THEN 1 ELSE 0 END) AS BIGINT) AS large_deletions_count,
      |  CAST(SUM(CASE WHEN length_delta > 150 THEN 1 ELSE 0 END) AS BIGINT) AS large_additions_count,
      |  CAST(SUM(CASE WHEN region = 'europe' THEN 1 ELSE 0 END) AS BIGINT) AS europe_events,
      |  CAST(SUM(CASE WHEN region = 'americas' THEN 1 ELSE 0 END) AS BIGINT) AS americas_events,
      |  CAST(SUM(CASE WHEN region = 'asia_pacific' THEN 1 ELSE 0 END) AS BIGINT) AS asia_pacific_events
      |FROM silver
      |GROUP BY event_date) b
      |JOIN (
      |  SELECT event_date, MAX(hour_events) AS peak_hour_events FROM (
      |    SELECT event_date, event_hour, COUNT(*) AS hour_events
      |    FROM silver GROUP BY event_date, event_hour) h
      |  GROUP BY event_date) p USING (event_date)""".stripMargin

  /** A6: executive summary projection incl. platform health score
    * (gold_batch_job.py:331-400). */
  private val summarySelect: String =
    """SELECT
      |  d.event_date AS summary_date,
      |  d.total_events,
      |  d.unique_users,
      |  d.active_domains,
      |  d.unique_pages_edited,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.bot_events / NULLIF(d.total_events, 0), 2) AS bot_percentage,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.anonymous_events / NULLIF(d.total_events, 0), 2) AS anonymous_percentage,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.registered_user_events / NULLIF(d.total_events, 0), 2) AS registered_user_percentage,
      |  d.total_bytes_added,
      |  d.total_bytes_removed,
      |  d.total_bytes_added - d.total_bytes_removed AS net_content_change,
      |  ROUND(d.avg_edit_size_bytes, 2) AS avg_edit_size_bytes,
      |  d.new_page_events AS new_pages_created,
      |  d.large_deletions_count,
      |  d.large_additions_count,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.large_deletions_count / NULLIF(d.total_events, 0), 4) AS large_deletion_rate,
      |  COALESCE(r.high_risk_users, 0) AS high_risk_user_count,
      |  COALESCE(r.medium_risk_users, 0) AS medium_risk_user_count,
      |  COALESCE(r.low_risk_users, 0) AS low_risk_user_count,
      |  COALESCE(r.avg_risk_score, 0) AS platform_avg_risk_score,
      |  COALESCE(r.max_risk_score, 0) AS platform_max_risk_score,
      |  COALESCE(r.alerts_triggered, 0) AS total_alerts_triggered,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.europe_events / NULLIF(d.total_events, 0), 2) AS europe_percentage,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.americas_events / NULLIF(d.total_events, 0), 2) AS americas_percentage,
      |  ROUND(CAST(100.0 AS DOUBLE) * d.asia_pacific_events / NULLIF(d.total_events, 0), 2) AS asia_pacific_percentage,
      |  d.peak_hour_events,
      |  ROUND(CAST(d.total_events AS DOUBLE) / 24.0, 2) AS avg_events_per_hour,
      |  ROUND(LEAST(100, GREATEST(0,
      |    40 * COALESCE(r.low_risk_users, 0) / NULLIF(COALESCE(r.total_scored_users, 1), 0)
      |    + 30 * d.registered_user_events / NULLIF(d.total_events, 1)
      |    + CASE
      |        WHEN d.total_bytes_added > d.total_bytes_removed THEN 20
      |        WHEN d.total_bytes_added > d.total_bytes_removed * 0.5 THEN 10
      |        ELSE 0
      |      END
      |    + CASE
      |        WHEN d.large_deletions_count < d.total_events * 0.01 THEN 10
      |        WHEN d.large_deletions_count < d.total_events * 0.05 THEN 5
      |        ELSE 0
      |      END
      |  )), 2) AS platform_health_score,
      |  '1.0.0' AS schema_version
      |FROM daily_base d
      |LEFT JOIN risk_summary r ON d.event_date = r.stat_date""".stripMargin

  private def riskSql(silver: String): String =
    s"WITH silver AS (\n$silver\n), user_metrics AS (\n$userMetrics\n)\n$riskSelect"

  private def riskSummarySql(silver: String): String =
    s"WITH silver AS (\n$silver\n), user_metrics AS (\n$userMetrics\n), " +
      s"risk AS (\n$riskSelect\n)\n$riskSummary"

  /** r18 (guide §2.3 "aggregate before you shuffle" + VERDICT r17
    * #3): Spark-side replacement for [[dailyBase]]'s 3-distinct
    * aggregate. Spark plans `COUNT(*) + 3×COUNT(DISTINCT dim) + 13
    * sums GROUP BY event_date` as a 4-arm Expand — every silver row
    * duplicated 4×, the partial aggregate keyed by
    * (date,user,page,type,gid) over 2.4 M expanded rows; ProfileQuery
    * measured that single stage at 3.8–8.7 s task CPU, the suite's
    * worst. Split form: the 13 sums aggregate in ONE ungrouped-by-dim
    * pass (600 k rows → 30 groups, no Expand), and each distinct
    * count becomes its own dedup-then-count pass over a 2-column
    * projection — 3×600 k narrow rows instead of 2.4 M wide ones,
    * and the four branches are independent AQE stages that schedule
    * concurrently. Result-identical by construction:
    * COUNT(DISTINCT x) counts distinct NON-NULL x, so each distinct
    * branch filters nulls and the LEFT JOIN + COALESCE(0) restores
    * the zero a date with all-null dims must report; the NULL
    * event_date group drops at the peak-hour INNER JOIN exactly as
    * before. The ORACLE keeps the verbatim [[dailyBase]] text —
    * equivalence is proven by the DuckDB hash gate (sf0.01 +
    * sf0.001) and pinned in GoldEquivalenceSpec against the original
    * chain. */
  private val dailyBaseSplit: String =
    """SELECT b.event_date, b.total_events,
      |  CAST(COALESCE(u.unique_users, 0) AS BIGINT) AS unique_users,
      |  CAST(COALESCE(dm.active_domains, 0) AS BIGINT) AS active_domains,
      |  CAST(COALESCE(pg.unique_pages_edited, 0) AS BIGINT) AS unique_pages_edited,
      |  b.bot_events, b.anonymous_events, b.registered_user_events,
      |  b.total_bytes_added, b.total_bytes_removed, b.avg_edit_size_bytes,
      |  b.edit_events, b.new_page_events, b.large_deletions_count,
      |  b.large_additions_count, b.europe_events, b.americas_events,
      |  b.asia_pacific_events, p.peak_hour_events
      |FROM (
      |SELECT
      |  event_date,
      |  COUNT(*) AS total_events,
      |  CAST(SUM(CASE WHEN is_bot THEN 1 ELSE 0 END) AS BIGINT) AS bot_events,
      |  CAST(SUM(CASE WHEN is_anonymous THEN 1 ELSE 0 END) AS BIGINT) AS anonymous_events,
      |  CAST(SUM(CASE WHEN is_bot = false AND is_anonymous = false THEN 1 ELSE 0 END) AS BIGINT) AS registered_user_events,
      |  CAST(SUM(CAST(CASE WHEN length_delta > 0 THEN length_delta ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS total_bytes_added,
      |  CAST(SUM(CAST(CASE WHEN length_delta < 0 THEN ABS(length_delta) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE) AS total_bytes_removed,
      |  CAST(SUM(CAST(ABS(COALESCE(length_delta, 0)) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_edit_size_bytes,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS edit_events,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS new_page_events,
      |  CAST(SUM(CASE WHEN length_delta < -150 THEN 1 ELSE 0 END) AS BIGINT) AS large_deletions_count,
      |  CAST(SUM(CASE WHEN length_delta > 150 THEN 1 ELSE 0 END) AS BIGINT) AS large_additions_count,
      |  CAST(SUM(CASE WHEN region = 'europe' THEN 1 ELSE 0 END) AS BIGINT) AS europe_events,
      |  CAST(SUM(CASE WHEN region = 'americas' THEN 1 ELSE 0 END) AS BIGINT) AS americas_events,
      |  CAST(SUM(CASE WHEN region = 'asia_pacific' THEN 1 ELSE 0 END) AS BIGINT) AS asia_pacific_events
      |FROM silver
      |GROUP BY event_date) b
      |LEFT JOIN (
      |  SELECT event_date, COUNT(*) AS unique_users FROM (
      |    SELECT DISTINCT event_date, user_id FROM silver
      |    WHERE user_id IS NOT NULL)
      |  GROUP BY event_date) u ON b.event_date = u.event_date
      |LEFT JOIN (
      |  SELECT event_date, COUNT(*) AS active_domains FROM (
      |    SELECT DISTINCT event_date, event_type FROM silver
      |    WHERE event_type IS NOT NULL)
      |  GROUP BY event_date) dm ON b.event_date = dm.event_date
      |LEFT JOIN (
      |  SELECT event_date, COUNT(*) AS unique_pages_edited FROM (
      |    SELECT DISTINCT event_date, page_id FROM silver
      |    WHERE page_id IS NOT NULL)
      |  GROUP BY event_date) pg ON b.event_date = pg.event_date
      |JOIN (
      |  SELECT event_date, MAX(hour_events) AS peak_hour_events FROM (
      |    SELECT event_date, event_hour, COUNT(*) AS hour_events
      |    FROM silver GROUP BY event_date, event_hour) h
      |  GROUP BY event_date) p ON b.event_date = p.event_date""".stripMargin

  /** The gold chain ABOVE silver — shared by the CTE form (oracle) and
    * the view form (Spark, a04_a06's materialized-silver path) so the
    * two can never drift. `splitDistincts` swaps [[dailyBase]] for its
    * Spark-side Expand-free twin [[dailyBaseSplit]] (r18); the oracle
    * always uses the original text. */
  private def summaryChain(splitDistincts: Boolean = false): String =
    s"WITH user_metrics AS (\n$userMetrics\n), " +
      s"risk AS (\n$riskSelect\n), risk_summary AS (\n$riskSummary\n), " +
      s"daily_base AS (\n${if (splitDistincts) dailyBaseSplit else dailyBase}\n)\n$summarySelect"

  private def summarySql(silver: String): String =
    summaryChain().replaceFirst("^WITH ",
      s"WITH silver AS (\n${java.util.regex.Matcher.quoteReplacement(silver)}\n), ")

  /** The original (Expand-planned) Spark chain — kept so
    * GoldEquivalenceSpec can pin dailyBaseSplit ≡ dailyBase on real
    * data every suite run. */
  private[queries] def summaryChainOriginal: String = summaryChain()
  private[queries] def summaryChainSplit: String =
    summaryChain(splitDistincts = true)
  private[queries] def silverSparkSql: String = silverSpark

  private def onEvents(sql: String): Q = (s: SparkSession, d: String) => {
    // r17: the silver CTE (per-row JSON extraction) is inlined into
    // every consumer and ran single-task over the under-split events
    // scan (guide §2.5) — redistribute at the view seam; the shared
    // SQL text (and so the oracle) is untouched, and at production
    // split counts this is the identity. r18: width capped by input
    // size — the JSON kernel is cheap per row (VERDICT r17 #2).
    graft.SparkUtil.parallelScanSized(Tables.events(s, d),
        graft.SparkUtil.CheapKernelBytesPerTask,
        org.apache.spark.sql.functions.col("event_id"))
      .createOrReplaceTempView("events")
    s.sql(sql)
  }

  /** a04_a06 references silver THREE times (user_metrics, daily_base's
    * base and peak-hour arms); Catalyst inlines the CTE into each, and
    * because every consumer prunes different columns the three
    * repartition subtrees never canonicalize equal, so ReuseExchange
    * cannot collapse them — measured (r17 plan audit): 3 full scans,
    * 3 JSON-extraction passes, 3 exchanges each carrying the raw
    * `props` string, ~10 s task CPU at sf0.1. The reference pipeline
    * itself materializes silver as a TABLE between the silver and gold
    * jobs; this does the same per invocation (guide §5 — reused 3×,
    * recompute costs 3 corpus-wide JSON parses): one parallel JSON
    * pass into a localCheckpoint, the gold chain reads the
    * materialized frame (a persist()+InMemoryRelation was tried and
    * measured ~1.5 s MORE CPU — columnar encode/decode plus consumer
    * subtrees racing to fill the same cache partitions in one job).
    * Recomputed from parquet every run: nothing persists across
    * invocations — Bench/Verify clearCache + sweep blocks inside each
    * invocation's finally. The checkpoint truncates lineage, so the
    * returned plan's leaf is a LogicalRDD, not the events relation —
    * EventsEncodingSpec proves this query's events dependency
    * BEHAVIORALLY instead (different events content ⇒ different
    * result). */
  private def onMaterializedSilver(sql: String): Q =
    (s: SparkSession, d: String) => {
      graft.SparkUtil.parallelScanSized(Tables.events(s, d),
          graft.SparkUtil.CheapKernelBytesPerTask,
          org.apache.spark.sql.functions.col("event_id"))
        .createOrReplaceTempView("events")
      // r18: event_id is consumed INSIDE silver (is_bot/is_anonymous)
      // and never by the gold chain — drop it before materializing
      // (guide §2.3, narrow what the checkpoint stores and every
      // consumer re-reads)
      // the PREVIOUS invocation's silver blocks release here (VERDICT
      // r17 #4): see SparkUtil.swapCheckpoint's caller contract
      val ck = graft.SparkUtil.swapCheckpoint("gold.silver",
        s.sql(silverSpark).drop("event_id").localCheckpoint(true))
      ck.createOrReplaceTempView("silver")
      val out = s.sql(sql)
      // the analyzed plan above resolved (and embedded) the view; drop
      // it so no session-global name dangles at a dead checkpoint
      // after the harness sweeps blocks (ADVICE r17: the latent
      // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND trap for future queries)
      s.catalog.dropTempView("silver")
      out
    }

  val queries: Map[String, Q] = Map(
    "a02_a03_risk_scores"   -> onEvents(riskSql(silverSpark)),
    "a05_risk_summary"      -> onEvents(riskSummarySql(silverSpark)),
    "a04_a06_daily_summary" ->
      onMaterializedSilver(summaryChain(splitDistincts = true))
  )

  val oracle: Map[String, String] = Map(
    "a02_a03_risk_scores"   -> riskSql(silverDuck),
    "a05_risk_summary"      -> riskSummarySql(silverDuck),
    "a04_a06_daily_summary" -> summarySql(silverDuck)
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operators from SURVEY.md §2, re-expressed over the
  * driver testdata. Each entry has a DuckDB oracle in [[oracle]].
  *
  * Operator IDs in names refer to SURVEY §2 rows, e.g. `a01` = the
  * hourly-stats aggregation (reference: gold_batch_job.py:80-119),
  * `p04` = the md5 surrogate key (bronze_streaming_job.py:189-201).
  */
object CoreQueries extends QueryDsl {

  val queries: Map[String, Q] = Map(
    // S4: partition-prune-style scan with a date-range predicate pushed
    // to the parquet reader (reference: silver_batch_job.py:263-266).
    "s04_scan_prune" -> ((s, d) => {
      Tables.eventsRange(s, d, "2024-01-05", "2024-01-10")
        .select(col("event_id"), eventDate(col("ts")).as("event_date"),
                col("event_type"), col("value"))
    }),

    // P1/P2: JSON-path extraction with cast + coalesce defaults
    // (reference: bronze_streaming_job.py:164-188).
    "p02_json_extract" -> ((s, d) => {
      // r17: under-split-scan repair before the JSON kernel (guide
      // §2.5); identity at production split counts
      graft.SparkUtil.parallelScanSized(Tables.events(s, d),
        graft.SparkUtil.CheapKernelBytesPerTask, col("event_id"))
        .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        coalesce(get_json_object(col("props"), "$.missing").cast("int"),
                 lit(-1)).as("k_missing"))
    }),

    // P4: deterministic md5 surrogate key over coalesced parts
    // (reference: bronze_streaming_job.py:189-201).
    "p04_surrogate_key" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        md5(concat_ws("-",
          coalesce(col("user_id").cast("string"), lit("unknown")),
          col("event_id").cast("string"),
          coalesce(col("event_type"), lit("unknown")))).as("surrogate_key"))
    }),

    // P6/P7: timestamp → date/hour/minute/iso derivations
    // (reference: bronze_streaming_job.py:209-221).
    "p06_time_derive" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        eventDate(col("ts")).as("event_date"),
        hour(col("ts")).as("event_hour"),
        minute(col("ts")).as("event_minute"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso_ts"))
    }),

    // P5/P12: derived deltas + anomaly flag conjunctions
    // (reference: silver_batch_job.py:115-132).
    "p12_flags" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"), col("value"),
        when(col("value") > 150, lit("high"))
          .when(col("value") > 50, lit("mid"))
          .otherwise(lit("low")).as("value_band"),
        (col("value") > 150 && col("event_type") === "purchase")
          .as("is_big_purchase"),
        when(col("user_id").isNotNull && col("value").isNotNull,
             col("value") * 2).as("value_doubled"))
    }),

    // A1: hourly stats — multi-measure hash aggregation with
    // count/countDistinct/conditional sums/ratios
    // (reference: gold_batch_job.py:80-119).
    "a01_hourly_stats" -> ((s, d) => {
      // r17: under-split-scan repair before the multi-measure partial
      // aggregation (guide §2.5); identity at production split counts
      graft.SparkUtil.parallelScanSized(Tables.events(s, d),
        graft.SparkUtil.CheapKernelBytesPerTask, col("event_id"))
        .groupBy(eventDate(col("ts")).as("event_date"),
                 hour(col("ts")).as("event_hour"),
                 col("event_type"))
        .agg(
          count(lit(1)).as("total_events"),
          countDistinct(col("user_id")).as("unique_users"),
          exactSum(col("value")).as("sum_value"),
          (sum(dec(abs(col("value")))).cast("double") / count(lit(1)))
            .as("avg_abs_value"),
          countIf(col("value") > 100).as("high_value_events"),
          round(lit(100.0) * countIf(col("value") > 100) / count(lit(1)), 2)
            .as("high_value_pct"))
    }),

    // J1: left-outer join of two aggregated CTEs + COALESCE null-fill
    // (reference: gold_batch_job.py:358-399).
    "j01_left_join_nullfill" -> ((s, d) => {
      val e = Tables.events(s, d)
      val daily = e.groupBy(eventDate(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("total_events"))
      val purch = e.filter(col("event_type") === "purchase")
        .groupBy(eventDate(col("ts")).as("p_date"))
        .agg(count(lit(1)).as("purchase_events"),
             exactSum(col("value")).as("purchase_value"))
      daily.join(purch, col("event_date") === col("p_date"), "left")
        .select(col("event_date"), col("total_events"),
                coalesce(col("purchase_events"), lit(0L)).as("purchase_events"),
                coalesce(col("purchase_value"), lit(0.0)).as("purchase_value"))
    }),

    // J2-analog: left-anti join (MERGE insert-only emulation's probe;
    // reference: bronze_streaming_job.py:265-270).
    "j02_anti_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
    }),

    // P14-analog: left-semi join (EXISTS membership).
    "j03_semi_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // W1: peak-hour detection. The reference writes COUNT(*) OVER
    // (PARTITION BY date, hour) then MAX (gold_batch_job.py:298-314);
    // the identical result comes from two-level aggregation — partial
    // map-side combine, |date×hour| shuffled rows instead of a full
    // sort of every raw event (parity is semantic, not plan-shaped).
    "w01_peak_hour" -> ((s, d) => {
      Tables.events(s, d)
        .select(eventDate(col("ts")).as("event_date"),
                hour(col("ts")).as("event_hour"))
        .groupBy(col("event_date"), col("event_hour"))
        .agg(count(lit(1)).as("hour_events"))
        .groupBy(col("event_date"))
        .agg(sum(col("hour_events")).as("total_events"),
             max(col("hour_events")).as("peak_hour_events"))
    }),

    // W3: hour-over-hour trend via lag() — the reference's gold schema
    // DECLARES events_change_pct (gold_schema.py:66-69) but no job ever
    // computes it; this completes the aspirational schema.
    "w03_hourly_trend" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, d)
        .groupBy(eventDate(col("ts")).as("event_date"),
                 hour(col("ts")).as("event_hour"))
        .agg(count(lit(1)).as("total_events"))
      val w = Window.partitionBy(col("event_date")).orderBy(col("event_hour"))
      hourly
        .withColumn("prev_events", lag(col("total_events"), 1).over(w))
        .withColumn("events_change_pct",
          round(lit(100.0) * (col("total_events") - col("prev_events")) /
            col("prev_events"), 2))
    }),

    // W5: time-spine gap filling — hourly counts of a sparse event
    // slice with every missing hour present as an explicit zero (what
    // the reference's hourly trend silently skips: lag() over a table
    // with holes compares non-adjacent hours). The spine is generated
    // from a 1-row min/max aggregate (`sequence` + explode — rows
    // created ∝ |span hours|, never a scan blowup) and LEFT-joins the
    // aggregated counts; at scale both sides are |hours|-sized, so the
    // join is broadcast-cheap no matter how big the raw table was.
    "w05_gap_fill" -> ((s, d) => {
      val sparse = Tables.events(s, d).filter(col("value") > 300)
      val hourly = sparse
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n_events"))
      val spine = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
      spine.join(hourly, Seq("h"), "left")
        .select(date_format(col("h"), "yyyy-MM-dd HH:00").as("stat_hour"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
    }),

    // A14: pivot — per-type event counts as columns (the reference
    // hand-writes this as conditional sums, gold_batch_job.py:109-112;
    // this is the operator form).
    "a14_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(eventDate(col("ts")).as("event_date"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // A16: ROLLUP — (date, type) detail, per-date subtotals, and the
    // grand total in ONE aggregation pass. Catalyst plans this as a
    // single Expand + hash aggregate (one shuffle keyed on the padded
    // grouping tuple), where the naive form runs three jobs and scans
    // the fact table three times. grouping_id() disambiguates the
    // NULL-padded subtotal rows from genuine NULL group values.
    "a16_rollup" -> ((s, d) => {
      Tables.events(s, d)
        .rollup(eventDate(col("ts")).as("event_date"), col("event_type"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("total_events"),
          exactSum(col("value")).as("sum_value"))
    }),

    // W4: batch sessionization — gaps-and-islands with lag + running
    // sum (the batch twin of streaming UserSessions; 30-minute gap).
    "w04_sessionization" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val marked = Tables.events(s, d)
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("events"),
          min(col("us")).as("session_start_us"),
          max(col("us")).as("session_end_us"))
        .withColumn("duration_sec",
          expr("(session_end_us - session_start_us) div 1000000"))
    }),

    // W2: row_number dedup keep-first (reference: deduplicate_bronze.py:80-85).
    "w02_window_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
                col("value"))
    }),

    // O1: top-k — ORDER BY … DESC LIMIT 10 with a unique tiebreak
    // (reference: gold_batch_job.py:729-735). TakeOrderedAndProject.
    "o01_topk" -> ((s, d) => {
      Tables.events(s, d)
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(10)
        .select(col("event_id"), col("event_type"), col("value"))
    }),

    // A7: duplicate census — groupBy key, count, keep count>1
    // (reference: deduplicate_bronze.py:58-66).
    "a07_duplicate_census" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
    }),

    // D1-D5: single-pass DQ constraint evaluation — completeness,
    // uniqueness, containment, bounds (reference: dq_checks.py §2.9).
    "d01_dq_constraints" -> ((s, d) => {
      Tables.events(s, d)
        .agg(
          count(lit(1)).as("total_rows"),
          countIf(col("event_type").isNull).as("null_event_type"),
          round(countIf(col("props").isNotNull).cast("double") /
                count(lit(1)), 6).as("props_completeness"),
          countDistinct(col("event_id")).as("distinct_event_ids"),
          round(countIf(col("event_type").isin(
            "click", "view", "purchase", "signup", "error"))
            .cast("double") / count(lit(1)), 6).as("event_type_containment"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(col("*"),
          (col("distinct_event_ids") === col("total_rows"))
            .as("event_id_unique"),
          (col("min_value") >= 0).as("value_non_negative"))
    }),

    // A12: latest-run gate-status lookup — MAX(CASE…) GROUP BY run
    // ORDER BY run DESC LIMIT 1 (reference: dq_utils.py:198-234).
    "a12_gate_status" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(eventDate(col("ts")).as("run_date"))
        .agg(max(when(col("event_type") === "error", 1).otherwise(0))
          .as("has_failure"))
        .orderBy(col("run_date").desc)
        .limit(1)
    })
  )

  val oracle: Map[String, String] = Map(
    "s04_scan_prune" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-10'""".stripMargin,

    "p02_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  COALESCE(CAST(json_extract_string(props, '$.missing') AS INTEGER), -1) AS k_missing
        |FROM events""".stripMargin,

    "p04_surrogate_key" ->
      """SELECT event_id,
        |  md5(concat_ws('-',
        |    COALESCE(CAST(user_id AS VARCHAR), 'unknown'),
        |    CAST(event_id AS VARCHAR),
        |    COALESCE(event_type, 'unknown'))) AS surrogate_key
        |FROM events""".stripMargin,

    "p06_time_derive" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d') AS event_date,
        |  CAST(hour(ts) AS INTEGER) AS event_hour,
        |  CAST(minute(ts) AS INTEGER) AS event_minute,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
        |FROM events""".stripMargin,

    "p12_flags" ->
      """SELECT event_id, value,
        |  CASE WHEN value > 150 THEN 'high'
        |       WHEN value > 50 THEN 'mid'
        |       ELSE 'low' END AS value_band,
        |  (value > 150 AND event_type = 'purchase') AS is_big_purchase,
        |  CASE WHEN user_id IS NOT NULL AND value IS NOT NULL
        |       THEN value * 2 END AS value_doubled
        |FROM events""".stripMargin,

    "a01_hourly_stats" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |  CAST(hour(ts) AS INTEGER) AS event_hour,
        |  event_type,
        |  COUNT(*) AS total_events,
        |  COUNT(DISTINCT user_id) AS unique_users,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(abs(value) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_abs_value,
        |  CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_events,
        |  ROUND(CAST(100.0 AS DOUBLE) * SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) / COUNT(*), 2) AS high_value_pct
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,

    "j01_left_join_nullfill" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS event_date, COUNT(*) AS total_events
        |  FROM events GROUP BY 1),
        |purch AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS p_date,
        |    COUNT(*) AS purchase_events,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT d.event_date, d.total_events,
        |  COALESCE(p.purchase_events, 0) AS purchase_events,
        |  COALESCE(p.purchase_value, 0.0) AS purchase_value
        |FROM daily d LEFT JOIN purch p ON d.event_date = p.p_date""".stripMargin,

    "j02_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)""".stripMargin,

    "j03_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)""".stripMargin,

    "w01_peak_hour" ->
      """SELECT event_date, COUNT(*) AS total_events, MAX(hour_events) AS peak_hour_events
        |FROM (
        |  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |    COUNT(*) OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), hour(ts)) AS hour_events
        |  FROM events)
        |GROUP BY event_date""".stripMargin,

    "a14_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,

    "a16_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
        |  CAST(GROUPING(strftime(ts, '%Y-%m-%d'), event_type) AS BIGINT) AS gid,
        |  COUNT(*) AS total_events,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY ROLLUP(strftime(ts, '%Y-%m-%d'), event_type)""".stripMargin,

    "w04_sessionization" ->
      """WITH marked AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  COUNT(*) AS events,
        |  MIN(us) AS session_start_us,
        |  MAX(us) AS session_end_us,
        |  (MAX(us) - MIN(us)) // 1000000 AS duration_sec
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,

    "w03_hourly_trend" ->
      """SELECT event_date, event_hour, total_events, prev_events,
        |  ROUND(CAST(100.0 AS DOUBLE) * (total_events - prev_events) / prev_events, 2) AS events_change_pct
        |FROM (
        |  SELECT event_date, event_hour, total_events,
        |    LAG(total_events, 1) OVER (PARTITION BY event_date ORDER BY event_hour) AS prev_events
        |  FROM (
        |    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |      CAST(hour(ts) AS INTEGER) AS event_hour,
        |      COUNT(*) AS total_events
        |    FROM events GROUP BY 1, 2))""".stripMargin,

    "w05_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n_events
        |  FROM events WHERE value > 300 GROUP BY 1),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b)
        |SELECT strftime(spine.h, '%Y-%m-%d %H:00') AS stat_hour,
        |  CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events
        |FROM spine LEFT JOIN hourly ON spine.h = hourly.h""".stripMargin,

    "w02_window_dedup" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "o01_topk" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 10""".stripMargin,

    "a07_duplicate_census" ->
      """SELECT user_id, event_type, COUNT(*) AS n FROM events
        |GROUP BY 1, 2 HAVING COUNT(*) > 1""".stripMargin,

    "d01_dq_constraints" ->
      """SELECT total_rows, null_event_type, props_completeness,
        |  distinct_event_ids, event_type_containment, min_value, max_value,
        |  distinct_event_ids = total_rows AS event_id_unique,
        |  min_value >= 0 AS value_non_negative
        |FROM (
        |  SELECT COUNT(*) AS total_rows,
        |    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
        |    ROUND(CAST(SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS props_completeness,
        |    COUNT(DISTINCT event_id) AS distinct_event_ids,
        |    ROUND(CAST(SUM(CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS event_type_containment,
        |    MIN(value) AS min_value,
        |    MAX(value) AS max_value
        |  FROM events)""".stripMargin,

    "a12_gate_status" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS run_date,
        |  CAST(MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INTEGER) AS has_failure
        |FROM events GROUP BY 1 ORDER BY 1 DESC LIMIT 1""".stripMargin
  )
}

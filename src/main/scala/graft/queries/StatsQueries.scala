package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Profiling, timeliness, and drift operators (SURVEY §2.4 A8-A11,
  * §2.9 D6/D13). Stddev is computed from exact decimal-accumulated
  * sums via the textbook formula so both engines perform identical
  * double arithmetic; percentiles use exact interpolation
  * (Spark `percentile` ≡ DuckDB `quantile_cont`), rounded to absorb
  * last-ulp interpolation differences.
  */
object StatsQueries extends QueryDsl {

  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  private def profileOneSql(c: String): String =
    s"""SELECT '$c' AS column_name, row_count, null_count, distinct_count,
       |  ROUND(sum_d / row_count, 6) AS mean,
       |  ROUND(sqrt((sumsq_d - sum_d * sum_d / row_count) / (row_count - 1)), 6) AS stddev,
       |  min_value, max_value,
       |  ROUND(p25_raw, 4) AS p25, ROUND(p50_raw, 4) AS p50,
       |  ROUND(p75_raw, 4) AS p75, ROUND(p95_raw, 4) AS p95
       |FROM (
       |  SELECT COUNT(*) AS row_count,
       |    CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       |    COUNT(DISTINCT $c) AS distinct_count,
       |    CAST(SUM(CAST($c AS DECIMAL(30,6))) AS DOUBLE) AS sum_d,
       |    CAST(SUM(CAST($c * $c AS DECIMAL(38,12))) AS DOUBLE) AS sumsq_d,
       |    MIN($c) AS min_value, MAX($c) AS max_value,
       |    quantile_cont($c, 0.25) AS p25_raw,
       |    quantile_cont($c, 0.5) AS p50_raw,
       |    quantile_cont($c, 0.75) AS p75_raw,
       |    quantile_cont($c, 0.95) AS p95_raw
       |  FROM lineitem)""".stripMargin

  val queries: Map[String, Q] = Map(
    // ONE scan for all profiled columns: every aggregate for all three
    // columns in a single agg, reshaped to per-column rows with
    // inline/explode. The per-column helper (profileOne) would scan
    // the table once per column — at 100 TB that's the difference
    // between 1 and N table reads.
    "a08_profile_stats" -> ((s, d) => {
      val li = graft.SparkUtil.parallelScan( // r17: guide §2.5
        Tables.lineitem(s, d), col("l_orderkey"))
      // ONE custom TypedImperativeAggregate per column: its single
      // value→count map answers nulls/distinct/min/max/percentiles AND
      // the decimal-exact sums (bit-identical to the builtin
      // composition — ProfileAggregateSpec). The builtin formulation
      // paid three independent heavyweights in this Aggregate: the
      // percentile map, a countDistinct Expand (row duplication per
      // distinct agg), and per-ROW decimal sum allocations — 13 s vs
      // ~3 s at sf0.1, same bytes out (r7 measurement).
      val aggs = count(lit(1)).as("row_count") +: profileCols.map(c =>
        graft.functions.ProfileAggregate
          .columnProfile(col(c), Seq(0.25, 0.5, 0.75, 0.95))
          .as(s"${c}__p"))
      val one = li.agg(aggs.head, aggs.tail: _*)
      val rows = one.select(explode(array(profileCols.map { c =>
        def p(f: String) = col(s"${c}__p.$f")
        struct(
          lit(c).as("column_name"),
          col("row_count"),
          p("null_count").as("null_count"),
          p("distinct_count").as("distinct_count"),
          round(p("sum6") / col("row_count"), 6).as("mean"),
          round(sqrt((p("sumsq12") -
            p("sum6") * p("sum6") / col("row_count")) /
            (col("row_count") - 1)), 6).as("stddev"),
          p("min").as("min_value"),
          p("max").as("max_value"),
          round(element_at(p("pcts"), 1), 4).as("p25"),
          round(element_at(p("pcts"), 2), 4).as("p50"),
          round(element_at(p("pcts"), 3), 4).as("p75"),
          round(element_at(p("pcts"), 4), 4).as("p95"))
      }: _*)).as("r"))
      rows.select(col("r.*"))
    }),

    // A15: the approx twin of a08 (exact↔approx seam, same pattern as
    // a13). percentile_approx is a mergeable bounded-memory sketch —
    // exact percentile buffers every group value, the profiling
    // bottleneck at 100 TB. No oracle: sketch internals differ across
    // engines by construction → rows-only gate; the error bound vs
    // exact is asserted in DqSpec instead.
    "a15_profile_approx" -> ((s, d) => {
      val li = graft.SparkUtil.parallelScan( // r17: guide §2.5
        Tables.lineitem(s, d), col("l_orderkey"))
      val aggs = count(lit(1)).as("row_count") +: profileCols.flatMap { c =>
        val x = col(c)
        Seq(
          countIf(x.isNull).as(s"${c}__nulls"),
          approx_count_distinct(x).as(s"${c}__distinct"),
          min(x).as(s"${c}__min"),
          max(x).as(s"${c}__max"),
          percentile_approx(x.cast("double"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(10000))
            .as(s"${c}__pcts"))
      }
      val one = li.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(profileCols.map { c =>
        struct(
          lit(c).as("column_name"),
          col("row_count"),
          col(s"${c}__nulls").as("null_count"),
          col(s"${c}__distinct").as("approx_distinct"),
          col(s"${c}__min").as("min_value"),
          col(s"${c}__max").as("max_value"),
          round(element_at(col(s"${c}__pcts"), 1), 4).as("p25"),
          round(element_at(col(s"${c}__pcts"), 2), 4).as("p50"),
          round(element_at(col(s"${c}__pcts"), 3), 4).as("p75"),
          round(element_at(col(s"${c}__pcts"), 4), 4).as("p95"))
      }: _*)).as("r")).select(col("r.*"))
    }),

    // D6/A9/P15: timeliness — P95 latency vs SLA with WARNING-only
    // status (reference: dq_checks.py:671-752).
    "d06_timeliness_p95" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      val lat = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate").cast("date"),
                         col("o_orderdate").cast("date")).as("latency_days"))
      lat.agg(
        count(lit(1)).as("n"),
        expr("percentile(latency_days, 0.95D)").as("p95_raw"),
        countIf(col("latency_days") > 90).as("over_90d")
      ).select(
        col("n"),
        round(col("p95_raw"), 4).as("p95_latency_days"),
        col("over_90d"),
        when(round(col("p95_raw"), 4) <= 120.0, "PASS")
          .otherwise("WARNING").as("status"))
    }),

    // D16: PER-COLUMN profile drift — the reference profiles mean/
    // stddev per column (dq_utils.py:439-482) but its drift check only
    // compares null rates (silver_dq_gate.py:195-223); this closes the
    // gap: baseline-vs-current mean, stddev, and null-rate drift for
    // every profiled column, in ONE conditional-aggregation scan (no
    // second table read for the baseline window). Derived metrics are
    // computed from 6-dp-rounded window stats so both engines compare
    // identical doubles.
    "d16_column_drift" -> ((s, d) => {
      // r17: deliberately NOT parallelScan'd (unlike a08/a15). d16's
      // scale pin is CONSTANT shuffle — the moments partials are O(1)
      // per task, so the only exchange carries a handful of fixed-size
      // buffers no matter the input (ScaleSpec's 'constant' model).
      // The under-split repair would insert an O(rows) exchange ahead
      // of a 3-row result — the exact anti-pattern the pin forbids —
      // to parallelize a kernel that is already the cheap staged-map
      // aggregate. Keep the scale property; the local single-task
      // cost is the moments fold itself (~1 s at sf0.1).
      val li = Tables.lineitem(s, d)
      val base = col("l_shipdate") < "1998-01-01"
      // window sums via the CONSTANT-state moments aggregate: one
      // primitive map update per row per column, decimal-exact sums
      // amortized per DISTINCT value through a bounded staging map
      // that flushes into two BigDecimal accumulators — d16 needs
      // only nulls/mean/stddev, so the O(distinct) profile map
      // (percentiles, distinct counts) would be wasted state here;
      // the direct conditional form paid ~0.3 s per wide-decimal
      // aggregate in the codegen hash aggregate (12 of them; the r7
      // d16 ablation). The groupBy keys the two windows; the 2-row
      // re-agg below reshapes to one row, replacing a pivot.
      val prof = li.groupBy(base.as("is_base"))
        .agg(count(lit(1)).as("n"),
          profileCols.map(c => graft.functions.MomentsAggregate
            .columnMoments(col(c)).as(s"${c}__p")): _*)
      def pick(t: String, x: Column) =
        max(when(if (t == "b") col("is_base") else !col("is_base"), x))
      val reshape = Seq("b", "c").flatMap { t =>
        pick(t, col("n")).as(s"__${t}_n") +: profileCols.flatMap { c =>
          Seq(
            pick(t, col(s"${c}__p.null_count")).as(s"${c}__${t}_nulls"),
            pick(t, col(s"${c}__p.sum6")).as(s"${c}__${t}_sum"),
            pick(t, col(s"${c}__p.sumsq12")).as(s"${c}__${t}_sumsq"))
        }
      }
      val one = prof.agg(reshape.head, reshape.tail: _*)
      def nn(c: String, t: String) =
        (col(s"__${t}_n") - col(s"${c}__${t}_nulls")).cast("double")
      def meanOf(c: String, t: String) =
        round(col(s"${c}__${t}_sum") / nn(c, t), 6)
      def stdOf(c: String, t: String) =
        round(sqrt((col(s"${c}__${t}_sumsq") -
          col(s"${c}__${t}_sum") * col(s"${c}__${t}_sum") / nn(c, t)) /
          (nn(c, t) - 1)), 6)
      def nullRate(c: String, t: String) =
        round(col(s"${c}__${t}_nulls") / col(s"__${t}_n").cast("double"), 6)
      def driftPct(b: Column, cu: Column) =
        round(lit(100.0) * abs(cu - b) / b, 4)
      one.select(explode(array(profileCols.map { c =>
        val (bm, cm) = (meanOf(c, "b"), meanOf(c, "c"))
        val (bs, cs) = (stdOf(c, "b"), stdOf(c, "c"))
        struct(
          lit(c).as("column_name"),
          bm.as("baseline_mean"), cm.as("current_mean"),
          driftPct(bm, cm).as("mean_drift_pct"),
          bs.as("baseline_stddev"), cs.as("current_stddev"),
          driftPct(bs, cs).as("stddev_drift_pct"),
          nullRate(c, "b").as("baseline_null_rate"),
          nullRate(c, "c").as("current_null_rate"),
          (driftPct(bm, cm) > 10.0 || driftPct(bs, cs) > 10.0 ||
            abs(nullRate(c, "c") - nullRate(c, "b")) > 0.05)
            .as("drift_alert"))
      }: _*)).as("r")).select(col("r.*"))
    }),

    // D13/A11: drift — per-day metric vs a baseline-window mean
    // (reference: silver_dq_gate.py:195-223, dq_utils.py:439-482).
    "d13_drift_detection" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(eventDate(col("ts")).as("event_date"))
        .agg((sum(dec(col("value"))).cast("double") / count(lit(1)))
          .as("avg_value"))
      val baseline = daily.filter(col("event_date") <= "2024-01-20")
        .agg((sum(col("avg_value").cast("decimal(30,12)")).cast("double") /
          count(lit(1))).as("baseline_avg"))
      daily.filter(col("event_date") > "2024-01-20")
        .crossJoin(broadcast(baseline))
        .withColumn("drift_pct",
          round(lit(100.0) * abs(col("avg_value") - col("baseline_avg")) /
            col("baseline_avg"), 4))
        .select(col("event_date"), col("avg_value"), col("baseline_avg"),
          col("drift_pct"),
          (col("drift_pct") > 10.0).as("drift_warning"),
          (col("drift_pct") > 20.0).as("drift_alert"))
    })
  )

  private def driftOneSql(c: String): String =
    s"""SELECT '$c' AS column_name,
       |  ROUND(b_sum / b_nn, 6) AS baseline_mean,
       |  ROUND(c_sum / c_nn, 6) AS current_mean,
       |  ROUND(CAST(100.0 AS DOUBLE) * ABS(ROUND(c_sum / c_nn, 6) - ROUND(b_sum / b_nn, 6))
       |    / ROUND(b_sum / b_nn, 6), 4) AS mean_drift_pct,
       |  ROUND(sqrt((b_sumsq - b_sum * b_sum / b_nn) / (b_nn - 1)), 6) AS baseline_stddev,
       |  ROUND(sqrt((c_sumsq - c_sum * c_sum / c_nn) / (c_nn - 1)), 6) AS current_stddev,
       |  ROUND(CAST(100.0 AS DOUBLE)
       |    * ABS(ROUND(sqrt((c_sumsq - c_sum * c_sum / c_nn) / (c_nn - 1)), 6)
       |        - ROUND(sqrt((b_sumsq - b_sum * b_sum / b_nn) / (b_nn - 1)), 6))
       |    / ROUND(sqrt((b_sumsq - b_sum * b_sum / b_nn) / (b_nn - 1)), 6), 4) AS stddev_drift_pct,
       |  ROUND(b_nulls / CAST(b_n AS DOUBLE), 6) AS baseline_null_rate,
       |  ROUND(c_nulls / CAST(c_n AS DOUBLE), 6) AS current_null_rate,
       |  (ROUND(CAST(100.0 AS DOUBLE) * ABS(ROUND(c_sum / c_nn, 6) - ROUND(b_sum / b_nn, 6))
       |     / ROUND(b_sum / b_nn, 6), 4) > 10.0
       |   OR ROUND(CAST(100.0 AS DOUBLE)
       |     * ABS(ROUND(sqrt((c_sumsq - c_sum * c_sum / c_nn) / (c_nn - 1)), 6)
       |         - ROUND(sqrt((b_sumsq - b_sum * b_sum / b_nn) / (b_nn - 1)), 6))
       |     / ROUND(sqrt((b_sumsq - b_sum * b_sum / b_nn) / (b_nn - 1)), 6), 4) > 10.0
       |   OR ABS(ROUND(c_nulls / CAST(c_n AS DOUBLE), 6)
       |        - ROUND(b_nulls / CAST(b_n AS DOUBLE), 6)) > 0.05) AS drift_alert
       |FROM (
       |  SELECT
       |    CAST(SUM(CASE WHEN base THEN 1 ELSE 0 END) AS BIGINT) AS b_n,
       |    CAST(SUM(CASE WHEN base AND $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS b_nulls,
       |    CAST(SUM(CASE WHEN base THEN 1 ELSE 0 END)
       |       - SUM(CASE WHEN base AND $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS b_nn,
       |    CAST(SUM(CASE WHEN base THEN CAST($c AS DECIMAL(30,6)) END) AS DOUBLE) AS b_sum,
       |    CAST(SUM(CASE WHEN base THEN CAST($c * $c AS DECIMAL(38,12)) END) AS DOUBLE) AS b_sumsq,
       |    CAST(SUM(CASE WHEN NOT base THEN 1 ELSE 0 END) AS BIGINT) AS c_n,
       |    CAST(SUM(CASE WHEN NOT base AND $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
       |    CAST(SUM(CASE WHEN NOT base THEN 1 ELSE 0 END)
       |       - SUM(CASE WHEN NOT base AND $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS c_nn,
       |    CAST(SUM(CASE WHEN NOT base THEN CAST($c AS DECIMAL(30,6)) END) AS DOUBLE) AS c_sum,
       |    CAST(SUM(CASE WHEN NOT base THEN CAST($c * $c AS DECIMAL(38,12)) END) AS DOUBLE) AS c_sumsq
       |  FROM (SELECT *, l_shipdate < '1998-01-01' AS base FROM lineitem))""".stripMargin

  val oracle: Map[String, String] = Map(
    "a08_profile_stats" ->
      profileCols.map(profileOneSql).mkString("\nUNION ALL\n"),

    "d16_column_drift" ->
      profileCols.map(driftOneSql).mkString("\nUNION ALL\n"),

    "d06_timeliness_p95" ->
      """SELECT n, ROUND(p95_raw, 4) AS p95_latency_days, over_90d,
        |  CASE WHEN ROUND(p95_raw, 4) <= 120.0 THEN 'PASS' ELSE 'WARNING' END AS status
        |FROM (
        |  SELECT COUNT(*) AS n,
        |    quantile_cont(latency_days, 0.95) AS p95_raw,
        |    CAST(SUM(CASE WHEN latency_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS over_90d
        |  FROM (
        |    SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS latency_days
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey))""".stripMargin,

    "d13_drift_detection" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_value
        |  FROM events GROUP BY 1),
        |baseline AS (
        |  SELECT CAST(SUM(CAST(avg_value AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS baseline_avg
        |  FROM daily WHERE event_date <= '2024-01-20')
        |SELECT event_date, avg_value, baseline_avg, drift_pct,
        |  drift_pct > 10.0 AS drift_warning,
        |  drift_pct > 20.0 AS drift_alert
        |FROM (
        |  SELECT d.event_date, d.avg_value, b.baseline_avg,
        |    ROUND(CAST(100.0 AS DOUBLE) * ABS(d.avg_value - b.baseline_avg) / b.baseline_avg, 4) AS drift_pct
        |  FROM daily d CROSS JOIN baseline b
        |  WHERE d.event_date > '2024-01-20')""".stripMargin
  )
}

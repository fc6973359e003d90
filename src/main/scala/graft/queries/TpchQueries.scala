package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-shaped headline queries for the benchmark — the canonical
  * scan-heavy aggregation (Q1-like), selective join + top-k (Q3-like),
  * and multi-way join with dimension broadcast (Q5-like). These
  * exercise whole-stage codegen, AQE broadcast selection, and
  * partial aggregation at scale. Plus S12 (SQL over temp views).
  */
object TpchQueries extends QueryDsl {

  private def discPrice = (col("l_extendedprice") * (lit(1) - col("l_discount")))
  private def charge    = discPrice * (lit(1) + col("l_tax"))

  val queries: Map[String, Q] = Map(
    // B1 (TPC-H Q1 shape): pricing summary report.
    "b01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice.cast("decimal(30,6)")).cast("double").as("sum_disc_price"),
          sum(charge.cast("decimal(30,6)")).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // B2 (TPC-H Q3 shape): shipping priority — selective joins, agg,
    // top-k by computed measure.
    "b02_shipping_priority" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp_ntz"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp_ntz"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(discPrice.cast("decimal(30,6)")).cast("double").as("revenue"))
        .select(col("l_orderkey").as("orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("orderkey").asc)
        .limit(10)
    }),

    // B3 (TPC-H Q5 shape): local supplier volume — 6-way join with
    // broadcast dimensions and the c_nationkey = s_nationkey predicate.
    "b03_local_supplier_volume" -> ((s, d) => {
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, d)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
                col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
                   col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice.cast("decimal(30,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc)
    }),

    // B5 (TPC-H Q10 shape): returned-item report — fact-to-fact join
    // (lineitem⋈orders shuffle on orderkey), customer re-key, dimension
    // broadcast, wide GROUP BY, top-k by revenue. The join order keeps
    // the selective returnflag filter on the fact side so the shuffle
    // carries only returned lineitems.
    "b05_returned_items" -> ((s, d) => {
      val ret = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp_ntz") &&
                col("o_orderdate") < lit("1996-10-01").cast("timestamp_ntz"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
      val nat = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      ret.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(discPrice.cast("decimal(30,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // B4 (TPC-H Q6 shape): selective scan-filter-agg — the pushdown
    // showcase: all three predicates reach the parquet reader.
    "b04_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(30,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // A13: the exact↔approx COUNT(DISTINCT) seam (SURVEY §7.4) — HLL
    // sketch beside the exact count. No oracle: DuckDB's approx sketch
    // differs by construction; the driver records a rows-only check.
    "a13_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("approx_users"))
        .select(col("*"),
          (abs(col("exact_users") - col("approx_users")) <=
            col("exact_users") * 0.1).as("within_10pct"))
    }),

    // S12: temp-view staging + SQL entry point
    // (reference: bronze_streaming_job.py:260 et al).
    "s12_sql_tempview" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT event_type, COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY event_type""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "b01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "b02_shipping_priority" ->
      """SELECT l_orderkey AS orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, orderkey LIMIT 10""".stripMargin,

    "b03_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC""".stripMargin,

    "b05_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "b04_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "s12_sql_tempview" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin
  )
}

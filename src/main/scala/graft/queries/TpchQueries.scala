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
      // r17: the partial aggregation (6 decimal(30,6) sums per row) is
      // the whole cost and runs in the scan stage — one task over a
      // single-row-group input (guide §2.5). Redistribute first so the
      // map-side aggregation uses every core; identity at production
      // split counts. The shipdate filter still reaches PushedFilters
      // (predicates push through a repartition).
      graft.SparkUtil.parallelScan(
          Tables.lineitem(s, d)
            .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp_ntz")),
          col("l_orderkey"))
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

    // B6 (TPC-H Q4 shape): order priority census gated by EXISTS — the
    // decorrelated left-semi join. Both sides are fact-scale, so the
    // semi join shuffles on orderkey (no broadcast); the semi shape
    // means lineitem contributes AT MOST one match per order and the
    // payload never widens.
    "b06_priority_exists" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp_ntz") &&
                col("o_orderdate") < lit("1996-10-01").cast("timestamp_ntz"))
      val returned = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // B7 (TPC-H Q13 shape): customer order-count distribution — LEFT
    // OUTER with a join-side predicate (the filter belongs in the ON
    // clause: a WHERE would turn the outer join inner and drop the
    // zero-order customers the histogram exists to count), then a
    // two-level aggregation: per-customer count, then histogram.
    "b07_custdist" -> ((s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // B8 (TPC-H Q14 shape): promo revenue share — fact⋈dimension on
    // partkey with a conditional aggregate ratio. part scales with the
    // corpus (no forced broadcast; AQE picks one when the filtered
    // build side is small), and the CASE folds into the map-side
    // partial agg so the join output never rescans.
    "b08_promo_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp_ntz") &&
                col("l_shipdate") < lit("1996-10-01").cast("timestamp_ntz"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val part = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", discPrice)
              .otherwise(lit(0.0)).cast("decimal(30,6)")).cast("double") * 100.0 /
            sum(discPrice.cast("decimal(30,6)")).cast("double"))
            .as("promo_revenue_pct"))
    }),

    // B9 (TPC-H Q17 shape): small-quantity revenue — the correlated
    // scalar subquery (per-part average quantity) decorrelated into a
    // window over the brand-filtered join. The brand filter prunes the
    // dimension ~25× BEFORE the join (broadcast-eligible), and the
    // window partitions by partkey — bounded rows per part, no global
    // sort.
    "b09_small_qty_revenue" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val brand = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val w = Window.partitionBy(col("l_partkey"))
      li.join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty",
          sum(dec(col("l_quantity"))).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"))
    }),

    // B10 (TPC-H Q18 shape): large-volume orders — the HAVING-subquery
    // membership test as an aggregate-then-join: lineitem pre-aggregates
    // by orderkey (map-side partial combine carries the fact scale),
    // the >300 filter shrinks it to a sliver, and orders/customer join
    // against the sliver (AQE broadcasts it at runtime).
    "b10_large_orders" -> ((s, d) => {
      // r17: repartition by the grouping key when the scan is
      // under-split (guide §2.5) — the hash distribution pre-satisfies
      // the groupBy, so the aggregation parallelizes with no second
      // exchange; identity at production split counts
      val big = graft.SparkUtil.parallelScan(
          Tables.lineitem(s, d), col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(exactSum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // B11 (TPC-H Q19 shape): disjunctive join predicates — the OR of
    // three (brand, size, quantity) brackets. Spark can't split an OR
    // across tables, so the IMPLIED single-side envelopes (brand IN,
    // size/quantity ranges) are added as conjunct prefilters that push
    // to both scans; the exact disjunction then runs as the join's
    // residual condition on the pruned sides.
    "b11_disjunctive_pred" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val part = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
                col("p_size").between(1, 15))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val bracket =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      li.join(part, col("l_partkey") === col("p_partkey") && bracket)
        .agg(sum(discPrice.cast("decimal(30,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // B12 (TPC-H Q22 shape): dormant high-balance customers — a scalar
    // subquery (global positive-balance average, one broadcast row)
    // plus NOT EXISTS as a left-anti join against orders. The anti
    // probe carries only the custkeys of RECENT orders (dormant = no
    // order since 2000), pruned by the date predicate at the scan.
    "b12_dormant_customers" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("avg_bal"))
      val ordKeys = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          exactSum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // B13 (TPC-H Q7 shape): volume shipping between two nations — the
    // double-dimension join (supplier's nation AND customer's nation)
    // with a symmetric pair predicate, grouped by the pair and ship
    // year. Both nation sides broadcast (25 rows); the fact table
    // joins supplier/orders/customer on their keys and the pair filter
    // prunes before the aggregate.
    "b13_nation_volume" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      li.join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(discPrice.cast("decimal(30,6)")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // B14 (TPC-H Q15 shape): top supplier — an aggregated view joined
    // against its own scalar MAX (the classic decorrelated scalar
    // subquery). The comparison runs on the exact decimal sums, not
    // their double projections, so both engines pick identical rows;
    // the max is a 1-row broadcast.
    "b14_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey"))
        .agg(sum(discPrice.cast("decimal(30,6)")).as("rev_d"))
      val maxRev = rev.agg(max(col("rev_d")).as("max_rev"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(maxRev))
        .filter(col("rev_d") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_d").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // B15 (TPC-H Q21 shape): the multi-correlated EXISTS + NOT EXISTS
    // self-join — suppliers whose item in a multi-supplier order was
    // returned while NO other supplier's item in that order was (the
    // sole-blame pattern; l_returnflag = 'R' stands in for the missing
    // receipt/commit dates). Both subqueries decorrelate to one semi
    // and one anti join on the order key with a supplier-inequality
    // residual — the lineitem table is scanned once per branch, never
    // per (order, supplier) pair.
    "b15_sole_blame" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val l1 = li.filter(col("l_returnflag") === "R")
      val anyOther = li.select(col("l_orderkey").as("o2_key"),
        col("l_suppkey").as("o2_supp"))
      val otherReturned = l1.select(col("l_orderkey").as("o3_key"),
        col("l_suppkey").as("o3_supp"))
      l1.join(anyOther,
          col("l_orderkey") === col("o2_key") &&
            col("l_suppkey") =!= col("o2_supp"), "left_semi")
        .join(otherReturned,
          col("l_orderkey") === col("o3_key") &&
            col("l_suppkey") =!= col("o3_supp"), "left_anti")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
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

    // B16 (TPC-H Q10 shape): returned-item revenue — which customers
    // returned the most value in a quarter. Selective date + flag
    // filters, 3-way join, per-customer rollup, top-20 by the EXACT
    // decimal revenue (unique custkey tiebreak ⇒ both engines pick
    // identical rows). Scale: nation broadcasts; the top-k is
    // TakeOrderedAndProject, never a global sort.
    "b16_returned_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
                col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz"))
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(discPrice.cast("decimal(30,6)")).as("rev_d"))
        .orderBy(col("rev_d").desc, col("c_custkey").asc)
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          col("rev_d").cast("double").as("revenue"),
          col("c_acctbal"), col("n_name").as("nation"))
    }),

    // B17 (TPC-H Q8 shape): market share — one nation's suppliers'
    // fraction of a region's order volume for one part type, per
    // year. The conditional-numerator ratio-of-sums: both sums
    // accumulate exactly in decimal and the share is ONE double
    // division (the cross-engine ratio discipline). Scale: region,
    // nation, and the type-pruned part dimension all broadcast; one
    // fact shuffle for the year rollup.
    "b17_market_share" -> ((s, d) => {
      val eurNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cust_nk"))
      val suppNation = Tables.nation(s, d)
        .select(col("n_nationkey").as("supp_nk"),
          col("n_name").as("supp_nation"))
      val parts = Tables.part(s, d).filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      Tables.lineitem(s, d)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(eurNations), col("c_nationkey") === col("cust_nk"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("supp_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", discPrice)
            .otherwise(lit(0)).cast("decimal(30,6)")).as("nat_d"),
          sum(discPrice.cast("decimal(30,6)")).as("tot_d"))
        .select(col("o_year"),
          (col("nat_d").cast("double") / col("tot_d").cast("double"))
            .as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // B18 (TPC-H Q9 shape): product-line profit by supplier nation
    // and year, over parts selected by a substring predicate (the
    // schema has no partsupp, so supply cost is modeled as 10% of
    // retail price per unit — the SHAPE is Q9's: compute a derived
    // profit measure across a part-pruned multi-join, roll up by
    // (nation, year)). The profit expression keeps Q9's explicit
    // parenthesization so both engines evaluate the identical double
    // tree before the exact decimal accumulation.
    "b18_product_profit" -> ((s, d) => {
      val widgetParts = Tables.part(s, d)
        .filter(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))
      val amount = discPrice -
        (col("p_retailprice") * col("l_quantity")) * lit(0.1)
      Tables.lineitem(s, d)
        .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount.cast("decimal(30,6)")).cast("double")
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
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
        |FROM events GROUP BY event_type""".stripMargin,

    "b06_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "b07_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "b08_promo_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount)
        |      ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) * 100.0 /
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,

    "b09_small_qty_revenue" ->
      """WITH joined AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |stats AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
        |        OVER (PARTITION BY l_partkey) AS DOUBLE) /
        |      COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
        |  FROM joined)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM stats
        |WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""".stripMargin,

    "b10_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 300
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "b11_disjunctive_pred" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "b12_dormant_customers" ->
      """SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
        |        / COUNT(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "b13_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "b14_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
        |      AS rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rev_d = (SELECT MAX(rev_d) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "b15_sole_blame" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    "b16_returned_revenue" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name AS nation
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount)
        |  AS DECIMAL(30,6))) DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "b17_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END
        |    AS DECIMAL(30,6))) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "b18_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    - (p_retailprice * l_quantity) * CAST(0.1 AS DOUBLE)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY 1, 2 DESC""".stripMargin
  )
}

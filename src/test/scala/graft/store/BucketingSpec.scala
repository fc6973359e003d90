package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.saveBucketed(orders.withColumnRenamed("o_orderkey", "key"),
      "b_orders", "key", 8)
    Bucketing.saveBucketed(lineitem.withColumnRenamed("l_orderkey", "key"),
      "b_lineitem", "key", 8)

    // force the non-broadcast path: at real scale neither side fits in
    // a broadcast, which is exactly when co-located buckets matter
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, bucketed) = try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "key")
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
          .as("qty"))
      val rows = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      (joined.queryExecution.executedPlan.toString, rows)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join itself must read bucketed files directly — no Exchange
    // feeding the SortMergeJoin
    assert(plan.contains("SortMergeJoin"), plan.take(1500))
    val joinSection = plan.substring(0, plan.indexOf("HashAggregate") max 0) match {
      case "" => plan
      case s  => s
    }
    assert(!joinSection.contains("Exchange hashpartitioning(key"),
      s"join should be shuffle-free over co-located buckets:\n${plan.take(3000)}")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      plan.take(3000))

    // same result as the unbucketed join
    val direct = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
        .as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bucketed === direct)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}

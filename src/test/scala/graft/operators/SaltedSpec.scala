package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltedSpec extends SparkSpec {

  private lazy val skewed = {
    val sp = spark
    import sp.implicits._
    // 90% of rows share one hot key
    (1 to 2000).map { i =>
      (if (i % 10 == 0) s"key${i % 7}" else "hotkey", i.toLong, i * 1.5)
    }.toDF("k", "id", "v")
  }

  test("salted sum/count equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Salted.saltedSumCount(skewed, Seq("k"), "v", 8, col("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("two-phase distinct count equals countDistinct") {
    val direct = skewed.groupBy("k")
      .agg(countDistinct(col("id") % 50).as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val twoPhase = Salted.distinctCount(
      skewed.withColumn("idm", col("id") % 50), Seq("k"), "idm")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(twoPhase === direct)
  }

  test("salted join equals the plain join") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(("hotkey", "HOT"), ("key1", "K1"), ("key3", "K3"))
      .toDF("k", "label")
    val direct = skewed.join(dim, "k").agg(
      count(lit(1)), sum(col("v"))).collect()(0)
    val salted = Salted.saltedJoin(skewed, dim, "k", 8, col("id")).agg(
      count(lit(1)), sum(col("v"))).collect()(0)
    assert(salted.getLong(0) === direct.getLong(0))
    assert(salted.getDouble(1) === direct.getDouble(1))
  }

  test("salted join keeps rows whose salt source is NULL") {
    val sp = spark
    import sp.implicits._
    val big = Seq(("key1", Some(1)), ("key1", None), ("key2", None))
      .toDF("k", "src")
    val dim = Seq(("key1", "K1"), ("key2", "K2")).toDF("k", "label")
    // crc32(NULL) is NULL — without coalesce these rows would vanish
    val out = Salted.saltedJoin(big, dim, "k", 8, col("src"))
    assert(out.count() === big.join(dim, "k").count())
  }
}

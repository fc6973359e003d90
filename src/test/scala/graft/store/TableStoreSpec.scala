package graft.store

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class TableStoreSpec extends SparkSpec {

  private def freshStore = new ParquetTableStore(spark, tmpDir("store"))

  private def df(rows: Seq[(String, String, Double)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("id", "part", "v")
  }

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("part", StringType),
    StructField("v", DoubleType)))

  test("ensure + append + scan round trip with partitioning") {
    val store = freshStore
    store.ensure("t.base", schema, Seq("part"))
    assert(store.scan("t.base").count() === 0)
    store.append("t.base", df(Seq(("a", "p1", 1.0), ("b", "p2", 2.0))))
    assert(store.scan("t.base").count() === 2)
    assert(store.scanRange("t.base", "part", "p1", "p1").count() === 1)
  }

  test("S7 mergeInsertOnly is idempotent (run twice ≡ run once)") {
    val store = freshStore
    store.ensure("t.ins", schema, Seq("part"))
    val batch = df(Seq(("a", "p1", 1.0), ("b", "p1", 2.0), ("a", "p1", 1.0)))
    assert(store.mergeInsertOnly("t.ins", batch, Seq("id")) === 2) // in-batch dedup
    assert(store.mergeInsertOnly("t.ins", batch, Seq("id")) === 0) // replay
    assert(store.scan("t.ins").count() === 2)
    // new keys still insert
    assert(store.mergeInsertOnly("t.ins",
      df(Seq(("c", "p2", 3.0))), Seq("id")) === 1)
    assert(store.scan("t.ins").count() === 3)
  }

  test("S8 mergeUpsert updates matched keys, keeps unmatched, only rewrites touched partitions") {
    val store = freshStore
    store.ensure("t.up", schema, Seq("part"))
    store.append("t.up",
      df(Seq(("a", "p1", 1.0), ("b", "p1", 2.0), ("c", "p2", 3.0))))
    store.mergeUpsert("t.up",
      df(Seq(("a", "p1", 10.0), ("d", "p1", 4.0))), Seq("id"))
    val out = store.scan("t.up").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("v")).toMap
    assert(out === Map("a" -> 10.0, "b" -> 2.0, "c" -> 3.0, "d" -> 4.0))
    // idempotent under replay
    store.mergeUpsert("t.up",
      df(Seq(("a", "p1", 10.0), ("d", "p1", 4.0))), Seq("id"))
    assert(store.scan("t.up").count() === 4)
  }

  test("alternate sink format (ORC) supports the full merge surface") {
    val store = new ParquetTableStore(spark, tmpDir("orcstore"), "orc")
    store.ensure("t.orc", schema, Seq("part"))
    store.append("t.orc", df(Seq(("a", "p1", 1.0), ("b", "p2", 2.0))))
    assert(store.mergeInsertOnly("t.orc",
      df(Seq(("a", "p1", 1.0), ("c", "p1", 3.0))), Seq("id")) === 1)
    store.mergeUpsert("t.orc", df(Seq(("b", "p2", 20.0))), Seq("id"))
    val out = store.scan("t.orc").collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("v")).toMap
    assert(out === Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0))
  }

  test("compaction packs many small files into few, data intact") {
    val store = freshStore
    store.ensure("t.cmp", schema, Seq("part"))
    // simulate 10 micro-batch appends → ≥10 files
    (1 to 10).foreach { i =>
      store.append("t.cmp", df(Seq((s"r$i", s"p${i % 2}", i.toDouble))))
    }
    val beforeRows = store.scan("t.cmp").collect()
      .map(r => r.getAs[String]("id")).toSet
    val (before, after) = store.compact("t.cmp")
    assert(before >= 10)
    assert(after < before)
    assert(store.scan("t.cmp").collect()
      .map(r => r.getAs[String]("id")).toSet === beforeRows)
  }

  test("S11 delete removes matching rows only") {
    val store = freshStore
    store.ensure("t.del", schema, Seq("part"))
    store.append("t.del",
      df(Seq(("a", "p1", 1.0), ("b", "p1", 2.0), ("c", "p2", 3.0))))
    assert(store.delete("t.del", col("id") === "b") === 1)
    assert(store.scan("t.del").select("id").collect().map(_.getString(0))
      .toSet === Set("a", "c"))
  }
}

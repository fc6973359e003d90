package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks the latest right row at or before left ts") {
    val sp = spark
    import sp.implicits._
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 12:00:00"), 105.0),
      ("B", ts("2024-01-01 11:00:00"), 50.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 09:00:00")), // before any quote → null
      (2L, "A", ts("2024-01-01 10:00:00")), // exactly at quote → 100 (inclusive)
      (3L, "A", ts("2024-01-01 11:59:00")), // between quotes → 100
      (4L, "A", ts("2024-01-01 13:00:00")), // after both → 105
      (5L, "B", ts("2024-01-01 12:00:00"))) // B's only quote → 50
      .toDF("trade_id", "sym", "tts")

    val out = AsOfJoin.backward(trades, quotes, "sym", "tts", "qts",
        Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(105.0), 5L -> Some(50.0)))
  }

  test("MinHashUnion aggregator: group signature = elementwise min") {
    val sp = spark
    import sp.implicits._
    val sigs = Seq(
      ("g1", Seq(5L, 9L, 2L)),
      ("g1", Seq(3L, 10L, 7L)),
      ("g2", Seq(1L, 1L, 1L)))
      .toDF("g", "sig")
    val mhu = udaf(new MinHashUnion(3))
    val out = sigs.groupBy(col("g")).agg(mhu(col("sig")).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("g1") === Seq(3L, 9L, 2L))
    assert(out("g2") === Seq(1L, 1L, 1L))
  }
}

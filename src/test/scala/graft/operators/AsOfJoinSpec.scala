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

  test("range self-join finds exactly the pairs within the window") {
    val sp = spark
    import sp.implicits._
    val events = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:03:00")), // 180s from 1 → pair
      (3L, "u1", ts("2024-01-01 10:09:30")), // 390s from 2 → no
      (4L, "u2", ts("2024-01-01 10:00:30")), // other key
      (5L, "u1", ts("2024-01-01 10:04:59"))) // 119s from 2, 299s from 1
      .toDF("event_id", "user", "ts")
    val pairs = RangeJoin.selfPairsWithin(events, "user", "ts",
        "event_id", 300)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (3,5) qualifies too: 10:09:30 - 10:04:59 = 271s <= 300
    assert(pairs === Set((1L, 2L), (2L, 5L), (1L, 5L), (3L, 5L)))
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

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamJoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join enriches events within the lookback") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val events = MemoryStream[(Long, String, Timestamp)]
    val meta = MemoryStream[(String, String, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      events.toDF().toDF("event_id", "domain", "event_ts"),
      "domain", "event_ts",
      meta.toDF().toDF("m_domain", "category", "meta_ts"),
      "m_domain", "meta_ts",
      watermark = "10 minutes", lookback = "5 minutes")

    val q = joined.writeStream.format("memory")
      .queryName("ssj_inner").outputMode("append").start()
    try {
      meta.addData(
        ("en.wiki", "encyclopedia", ts("2024-01-02 10:00:00")),
        ("commons", "media", ts("2024-01-02 10:00:30")))
      events.addData(
        (1L, "en.wiki", ts("2024-01-02 10:02:00")), // 2 min after meta → hit
        (2L, "en.wiki", ts("2024-01-02 10:09:00")), // 9 min after → outside 5-min lookback
        (3L, "nl.wiki", ts("2024-01-02 10:02:00"))) // no meta for key
      q.processAllAvailable()

      // a second meta row for the same key: event 4 must match ONLY the
      // row inside its lookback, not the stale 10:00 one
      meta.addData(("en.wiki", "encyclopedia-v2", ts("2024-01-02 10:20:00")))
      events.addData((4L, "en.wiki", ts("2024-01-02 10:22:00")))
      q.processAllAvailable()

      val out = spark.table("ssj_inner")
        .select("event_id", "category").as[(Long, String)].collect().toSet
      assert(out === Set(1L -> "encyclopedia", 4L -> "encyclopedia-v2"))
    } finally q.stop()
  }

  test("leftOuter emits null-padded rows once the watermark passes the bound") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val events = MemoryStream[(Long, String, Timestamp)]
    val meta = MemoryStream[(String, String, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      events.toDF().toDF("event_id", "domain", "event_ts"),
      "domain", "event_ts",
      meta.toDF().toDF("m_domain", "category", "meta_ts"),
      "m_domain", "meta_ts",
      watermark = "1 minute", lookback = "5 minutes",
      joinType = "leftOuter")

    val q = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      meta.addData(("en.wiki", "encyclopedia", ts("2024-01-02 10:00:00")))
      events.addData(
        (1L, "en.wiki", ts("2024-01-02 10:02:00")), // matched
        (2L, "nl.wiki", ts("2024-01-02 10:02:00"))) // unmatched
      q.processAllAvailable()
      // unmatched rows are held back until the watermark proves no
      // match can arrive — push event time far ahead on BOTH sides
      events.addData((9L, "zz", ts("2024-01-02 11:00:00")))
      meta.addData(("zz2", "x", ts("2024-01-02 11:00:00")))
      q.processAllAvailable()
      events.addData((10L, "zz", ts("2024-01-02 12:00:00")))
      meta.addData(("zz3", "x", ts("2024-01-02 12:00:00")))
      q.processAllAvailable()

      val out = spark.table("ssj_outer")
        .select("event_id", "category").as[(Long, Option[String])]
        .collect().toMap
      assert(out(1L) === Some("encyclopedia"))
      assert(out.contains(2L), s"unmatched row not emitted: $out")
      assert(out(2L) === None)
    } finally q.stop()
  }
}

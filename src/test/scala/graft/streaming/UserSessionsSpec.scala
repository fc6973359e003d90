package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class UserSessionsSpec extends SparkSpec {

  test("gap-based session windows close via event-time timeout") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    def ts(s: String) = Timestamp.valueOf(s)

    val sessions = UserSessions.sessionize(
      input.toDF().toDF("user", "ts"), "user", "ts",
      gapMinutes = 30, watermark = "5 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.ProcessingTime(0)).start()

    // session 1: two events 5 minutes apart
    input.addData(("alice", ts("2024-01-02 10:00:00")),
      ("alice", ts("2024-01-02 10:05:00")),
      ("bob", ts("2024-01-02 10:10:00")))
    q.processAllAvailable()

    // 90 minutes later: alice's first session is past the gap — the
    // new event both advances the watermark and starts session 2
    input.addData(("alice", ts("2024-01-02 11:30:00")))
    q.processAllAvailable()
    // one more far-future event so the watermark passes every timeout
    input.addData(("carol", ts("2024-01-02 13:00:00")))
    q.processAllAvailable()
    input.addData(("carol", ts("2024-01-02 15:00:00")))
    q.processAllAvailable()

    val out = spark.table("sessions").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    val alice1 = out.find(s => s._1 == "alice" &&
      s._2.startsWith("2024-01-02 10:00"))
    assert(alice1.isDefined, out.mkString("; "))
    assert(alice1.get._3.startsWith("2024-01-02 10:05"))
    assert(alice1.get._4 === 2L)
    // bob's lone event also closed once the watermark passed its gap
    assert(out.exists(s => s._1 == "bob" && s._4 == 1L), out.mkString("; "))
    q.stop()
  }
}

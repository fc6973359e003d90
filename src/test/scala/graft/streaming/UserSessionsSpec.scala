package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class UserSessionsSpec extends SparkSpec {

  /** Drives either implementation through the same 4-batch scenario
    * and returns (user, start, end, events) rows. */
  private def run(name: String,
                  sessionize: org.apache.spark.sql.DataFrame =>
                    org.apache.spark.sql.Dataset[UserSessions.ClosedSession])
      : Array[(String, String, String, Long)] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    def ts(s: String) = Timestamp.valueOf(s)

    val q = sessionize(input.toDF().toDF("user", "ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
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

    val out = spark.table(name).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    q.stop()
    out
  }

  private def checkSessions(out: Array[(String, String, String, Long)]): Unit = {
    val alice1 = out.find(s => s._1 == "alice" &&
      s._2.startsWith("2024-01-02 10:00"))
    assert(alice1.isDefined, out.mkString("; "))
    assert(alice1.get._3.startsWith("2024-01-02 10:05"))
    assert(alice1.get._4 === 2L)
    // bob's lone event also closed once the watermark passed its gap
    assert(out.exists(s => s._1 == "bob" && s._4 == 1L), out.mkString("; "))
  }

  test("gap-based session windows close via event-time timeout") {
    checkSessions(run("sessions",
      UserSessions.sessionize(_, "user", "ts",
        gapMinutes = 30, watermark = "5 minutes")))
  }

  test("transformWithState twin emits the same sessions") {
    // the new state API's virtual-column-family layout is RocksDB-only
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tws = run("sessions_tws",
        UserSessions.sessionizeTws(_, "user", "ts",
          gapMinutes = 30, watermark = "5 minutes"))
      checkSessions(tws)
      val fmgws = run("sessions_fmgws",
        UserSessions.sessionize(_, "user", "ts",
          gapMinutes = 30, watermark = "5 minutes"))
      // full equivalence, not just spot checks
      assert(tws.sorted.toSeq === fmgws.sorted.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}

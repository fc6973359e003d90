package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session windows over user activity — an extension beyond the
  * reference (SURVEY §2.8 ST8 notes it has none), implemented with the
  * canonical Structured Streaming custom-state operator:
  * `flatMapGroupsWithState` with event-time timeout. A session closes
  * when `gapMinutes` pass without activity (decided by the watermark,
  * so late events inside the gap still extend their session).
  */
object UserSessions {

  final case class Activity(user: String, ts: Timestamp)
  final case class SessionState(start: Long, lastSeen: Long, events: Long)
  final case class ClosedSession(user: String, session_start: Timestamp,
                                 session_end: Timestamp, events: Long)

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int, watermark: String = "10 minutes")
      : Dataset[ClosedSession] = {
    implicit val actEnc = Encoders.product[Activity]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val strEnc = Encoders.STRING
    val gapMs = gapMinutes * 60000L

    def update(user: String, rows: Iterator[Activity],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(ClosedSession(user, new Timestamp(s.start),
          new Timestamp(s.lastSeen), s.events))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = Vector.empty[ClosedSession]
      var cur = state.getOption
      sorted.foreach { a =>
        val t = a.ts.getTime
        cur match {
          case Some(s) if t - s.lastSeen <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.lastSeen, t),
              s.events + 1))
          case Some(s) =>
            closed :+= ClosedSession(user, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.events)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // a late/replayed event can carry lastSeen + gap below the
        // current watermark — Spark throws on a timeout in the past,
        // so clamp just above the watermark (fires next batch)
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(s.lastSeen + gapMs, wm + 1))
      }
      closed.iterator
    }

    events
      .select(col(userCol).cast("string").as("user"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[Activity]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update _)
  }
}

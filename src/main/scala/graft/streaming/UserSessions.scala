package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Session windows over user activity — an extension beyond the
  * reference (SURVEY §2.8 ST8 notes it has none), implemented with the
  * canonical Structured Streaming custom-state operator:
  * `flatMapGroupsWithState` with event-time timeout. A session closes
  * when `gapMinutes` pass without activity (decided by the watermark,
  * so late events inside the gap still extend their session).
  */
// Serializable: the state-update closures call foldActivities and so
// capture this module reference
object UserSessions extends Serializable {

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
      val (closed, cur) = foldActivities(user,
        rows.toSeq.sortBy(_.ts.getTime), state.getOption, gapMs)
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

  /** Session-merging core shared by both state-API implementations:
    * fold sorted activities into the open session, emitting sessions
    * that closed because the gap elapsed between events. */
  private def foldActivities(user: String, sorted: Seq[Activity],
                             open: Option[SessionState], gapMs: Long)
      : (Vector[ClosedSession], Option[SessionState]) = {
    var closed = Vector.empty[ClosedSession]
    var cur = open
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
    (closed, cur)
  }

  /** The same session-window operator on Spark 4's arbitrary-state API
    * (`transformWithState` + StatefulProcessor): typed ValueState for
    * the open session, an explicit event-time timer per key for the
    * gap timeout (replacing GroupState's single implicit timeout).
    * Requires the RocksDB state store provider — the API's virtual-
    * column-family state layout is RocksDB-only in Spark 4.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, Activity, ClosedSession] {
    @transient private var session: ValueState[SessionState] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: String, rows: Iterator[Activity],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val open = if (session.exists()) Some(session.get()) else None
      val (closed, cur) =
        foldActivities(user, rows.toSeq.sortBy(_.ts.getTime), open, gapMs)
      cur.foreach { s =>
        session.update(s)
        // timers accumulate rather than overwrite — delete the stale
        // one, then clamp above the watermark exactly like the
        // flatMapGroupsWithState twin (a timer in the past throws)
        if (timer.exists()) getHandle.deleteTimer(timer.get())
        val at = math.max(s.lastSeen + gapMs, tv.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(at)
        timer.update(at)
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // a stale timer (superseded but fired before deletion landed)
      // must not close a still-live session
      if (!session.exists() ||
          (timer.exists() && timer.get() > info.getExpiryTimeInMs()))
        return Iterator.empty
      val s = session.get()
      session.clear()
      timer.clear()
      Iterator(ClosedSession(user, new Timestamp(s.start),
        new Timestamp(s.lastSeen), s.events))
    }
  }

  /** transformWithState twin of [[sessionize]] (same output contract,
    * equivalence asserted in UserSessionsSpec). */
  def sessionizeTws(events: DataFrame, userCol: String, tsCol: String,
                    gapMinutes: Int, watermark: String = "10 minutes")
      : Dataset[ClosedSession] = {
    implicit val actEnc = Encoders.product[Activity]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val strEnc = Encoders.STRING
    events
      .select(col(userCol).cast("string").as("user"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[Activity]
      .groupByKey(_.user)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

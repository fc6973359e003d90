package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the streaming extension of
  * the engine's join family (SURVEY §2.3 covers the batch joins; this
  * is their continuous twin, e.g. enriching the live edit stream with
  * a concurrently-updating page-metadata feed instead of a static
  * dimension table).
  *
  * Scale contract: BOTH sides carry a watermark and the join condition
  * bounds the event-time distance between matching rows. Spark can
  * then expire state on both sides once the watermark passes the
  * bound — without the time-range condition, stream-stream join state
  * grows without limit (every row must be retained forever). Rows are
  * co-located by a shuffle on the join key, exactly like the batch
  * equi-join; state size per key is O(rows inside the time bound).
  */
object StreamJoins {

  /** Join `left` rows to `right` rows with the same key whose
    * timestamp falls in `[leftTs - lookback, leftTs]` — "enrich each
    * event with the metadata rows that preceded it recently".
    *
    * `joinType` supports "inner" and "leftOuter" (outer results for
    * unmatched left rows are emitted once the watermark passes the
    * bound, which is when Spark can prove no match can still arrive).
    * The two inputs must not share column names other than the keys
    * (rename upstream); both must be streaming (or both static —
    * Spark then treats it as a plain interval join).
    */
  def intervalJoin(left: DataFrame, leftKey: String, leftTs: String,
                   right: DataFrame, rightKey: String, rightTs: String,
                   watermark: String, lookback: String,
                   joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"unsupported stream-stream joinType: $joinType")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      joinType)
  }
}

package graft

import org.apache.spark.sql.Dataset

/** Small session-level utilities shared by operators and jobs. */
object SparkUtil {

  /** Free a materialized frame's storage NOW, whether it was `cache()`d
    * or `localCheckpoint()`ed. `Dataset.unpersist` alone is a silent
    * no-op for checkpointed frames — it only clears CacheManager
    * entries, and a checkpoint RDD was never cached there; its blocks
    * would otherwise linger until GC + ContextCleaner get around to
    * them (verified on Spark 4.1: getPersistentRDDs still holds the
    * checkpoint RDD after Dataset.unpersist). The checkpointed RDD sits
    * behind the frame's `LogicalRDD` leaf, so release must also happen
    * at the RDD level. Targeting the frame's own RDD (rather than
    * sweeping getPersistentRDDs) stays correct when other frames'
    * checkpoint blocks are legitimately alive in the same session.
    *
    * After this call the frame is DEAD: a checkpointed frame's lineage
    * was truncated, so any later action on it throws
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Only call once the result has
    * been fully consumed.
    *
    * Precondition: pass the checkpointed frame ITSELF (the value
    * `localCheckpoint` returned), not something derived from it. The
    * match below is deliberately TOP-LEVEL only — a checkpointed
    * frame's analyzed plan IS a bare LogicalRDD leaf — so a derived
    * frame is a safe no-op here instead of a deep collectFirst
    * silently destroying a still-live upstream checkpoint.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit = {
    df.unpersist(blocking = false) // covers the cache()'d case
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => () // not a checkpoint leaf — nothing to free at RDD level
    }
  }

  private val pinnedSessions = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.SparkContext, Map[String, String]),
      org.apache.spark.sql.SparkSession]

  /** A memoized isolated session with `confs` pinned — the home for
    * maintenance rewrites that need ONE SQL conf forced without
    * flipping it on the caller's session (IncrementalLsh's
    * bucketed-scan pin, AnnIndex's dynamic-overwrite pin). Flipping
    * the caller's conf races concurrent flippers and bleeds into
    * every query that session plans; allocating a fresh `newSession`
    * per call builds a full SessionState and registers listener-bus
    * state per maintenance tick (hundreds per hour at streaming
    * cadence). One session per (SparkContext, pin-set), created
    * lazily, shared thereafter: same catalog and block cache as the
    * caller, own immutable-by-convention conf. Builder-time options
    * carry into it via initialSessionOptions; the caller's RUNTIME
    * conf tweaks do not — callers must depend only on the pins and
    * the shared catalog. */
  def pinnedSession(spark: org.apache.spark.sql.SparkSession,
                    confs: Map[String, String])
      : org.apache.spark.sql.SparkSession =
    pinnedSessions.getOrElseUpdate((spark.sparkContext, confs), {
      val s = spark.newSession()
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      s
    })
}

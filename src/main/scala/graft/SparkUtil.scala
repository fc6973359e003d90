package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Small session-level utilities shared by operators and jobs. */
object SparkUtil {

  /** Scale-adaptive repair for CPU-heavy kernels over under-split
    * scans (optimization guide §2.5, "input skew — one huge
    * unsplittable file"): when the frame's ACTUAL partition count is
    * below the session's core count, redistribute rows before the
    * expensive per-row work downstream; otherwise return the frame
    * untouched.
    *
    * Why this exists: a parquet ROW GROUP is the unit of split — a
    * table written as few large row groups (the bench testdata is one
    * file × one row group per table) scans as that many tasks no
    * matter what `spark.sql.files.maxPartitionBytes` says, so every
    * downstream row-local kernel (shingle/minhash signing, PQ encode,
    * decimal aggregation) runs single-threaded while the other cores
    * idle. At production scale the scan has thousands of row groups,
    * the partition count exceeds the core count, and this helper is
    * the identity — the extra Exchange exists ONLY where the input
    * cannot otherwise parallelize, which is exactly the guide's
    * "repartition immediately after the read" case.
    *
    * `keys` (hash distribution, no pre-sort) keeps the redistribution
    * deterministic under task retries — guide §2.5 warns round-robin
    * repartition re-draws row placement when a map stage re-runs;
    * with no keys it falls back to round-robin (safe here only
    * because rows are re-sorted by Spark's sortBeforeRepartition).
    * Callers pass the row's natural id.
    *
    * The partition probe (`rdd.getNumPartitions`) is plan-time only —
    * building the RDD DAG schedules no job for the scan-level frames
    * this is applied to. */
  def parallelScan(df: DataFrame, keys: Column*): DataFrame =
    parallelScanSized(df, 0L, keys: _*)

  /** [[parallelScan]] with a SIZE-DERIVED width cap (r18, VERDICT r17
    * #2 + guide §2.2 "fewer, larger partitions"): when
    * `bytesPerTask > 0`, the repartition target is
    * `min(defaultParallelism, ceil(estimatedBytes / bytesPerTask))`
    * instead of a flat `defaultParallelism` — a tiny frame no longer
    * pays one task setup per core for microseconds of kernel work.
    * Measured (sf0.1, 32 cores): the flat-width form spent
    * 0.3–1.0 s MORE task CPU per query on the cheap-kernel events
    * family at identical wall; a frame small enough to target 1
    * partition skips the exchange entirely.
    *
    * Sizing input is the optimizer's `stats.sizeInBytes` (file bytes
    * for scan-level frames — plan-time metadata, no job, and cheaper
    * than the `df.rdd` probe because no physical plan is built unless
    * the frame is actually under-split). Callers pick `bytesPerTask`
    * by KERNEL WEIGHT, not storage: cheap per-row kernels (JSON
    * extraction, conditional sums) take [[CheapKernelBytesPerTask]];
    * heavy text/vector kernels (shingle/minhash signing, PQ encode)
    * keep the flat form — their per-row cost dwarfs any per-task
    * setup, so full width is right even for small inputs. At
    * production split counts both forms are the identity, exactly as
    * before. */
  def parallelScanSized(df: DataFrame, bytesPerTask: Long,
                        keys: Column*): DataFrame = {
    val max = df.sparkSession.sparkContext.defaultParallelism
    val target =
      if (bytesPerTask <= 0L) max
      else {
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val t = (bytes / bytesPerTask) + 1
        t.min(BigInt(max)).max(BigInt(1)).toInt
      }
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

  /** Width sizing for CHEAP per-row kernels over small scans (≈1–2 µs
    * per row: get_json_object/from_json extraction, conditional
    * sums). 256 KiB of input per task keeps every measured
    * cheap-kernel stage at identical wall while dropping the
    * per-task fixed CPU; at production sizes the cap saturates at
    * defaultParallelism and the helper stays the identity. */
  val CheapKernelBytesPerTask: Long = 256L * 1024L

  /** Pin the width of a CPU-heavy stage against AQE's BYTE-based
    * post-shuffle coalescing (r18, guide §2.5 — the runtime twin of
    * the under-split-scan repair). AQE coalesces reduce partitions to
    * a byte target, which is right for shuffle-bound stages but
    * serializes a stage whose rows are byte-tiny and CPU-expensive:
    * dd02's candidate-pair frame (two longs per row) coalesced to ONE
    * partition, and the exact-Jaccard scoring over the re-joined
    * shingle arrays ran 1.4 s single-task while 31 cores idled. An
    * explicit REPARTITION_BY_NUM is exempt from AQE coalescing, so
    * hashing by `keys` at the session's configured shuffle width
    * keeps the downstream work wide. Deterministic under retries
    * (hash distribution, never round-robin). The exchange payload is
    * whatever the caller narrowed the frame to — apply AFTER
    * projecting to ids (§2.3). */
  def wideStage(df: DataFrame, keys: Column*): DataFrame = {
    val r = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(r, keys: _*)
  }

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

  /** Release-on-next-invocation registry for construction-time
    * checkpoints the RETURNED frame still references (r18, VERDICT
    * r17 #4/#7). A query constructor that materializes an
    * intermediate (a04_a06's silver, t23's enrichment, e09's truth
    * set) cannot release it before returning — the caller's lazy
    * frame reads those blocks — so in a long-lived session the blocks
    * linger until GC + ContextCleaner. Registering the checkpoint
    * under a stable key frees the PREVIOUS invocation's blocks the
    * moment a new one is built, capping leakage at one outstanding
    * checkpoint per key per context.
    *
    * Caller contract: consume the returned frame before invoking the
    * same query again on the same SparkContext — re-invocation kills
    * the prior frame's checkpoint blocks (Bench/Verify run queries
    * strictly sequentially and additionally sweep per query). */
  private val swapCks = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.SparkContext, String), Dataset[_]]

  def swapCheckpoint[T](key: String, df: Dataset[T]): Dataset[T] = {
    swapCks.put((df.sparkSession.sparkContext, key), df)
      .foreach(releaseCheckpoint)
    // stopped contexts: their blocks died with the executors — drop
    // the references so test runners cycling contexts don't pin frames
    swapCks.keysIterator.filter(_._1.isStopped).foreach(swapCks.remove)
    df
  }

  private val pinnedSessions = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.SparkContext, Map[String, String]),
      org.apache.spark.sql.SparkSession]

  /** The caller-session-resolved catalog-qualified form of `table`
    * (`db.table`). Parse + session-state currentDatabase, both
    * in-memory — no catalog RPC. Qualification is what lets a name be
    * handed to ANOTHER session (the pinned maintenance session, whose
    * currentDatabase is always `default`) and still resolve to the
    * table the CALLER meant. */
  def qualifiedName(spark: org.apache.spark.sql.SparkSession,
                    table: String): String = {
    val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val db = id.database.getOrElse(
      spark.sessionState.catalog.getCurrentDatabase)
    // the result is RE-PARSED downstream (refreshTable, s.table,
    // saveAsTable/insertInto in pinned bodies), so any part that is
    // not a plain identifier must go back behind backticks — parsing
    // strips the caller's quoting, and bare re-concatenation would
    // turn `my idx` or a dashed database into a ParseException (or
    // worse, a different name)
    def q(part: String): String =
      if (part.matches("[a-zA-Z_][a-zA-Z0-9_]*")) part
      else "`" + part.replace("`", "``") + "`"
    s"${q(db)}.${q(id.table)}"
  }

  /** Run `body` in a memoized isolated session with `confs` pinned —
    * the home for maintenance rewrites that need ONE SQL conf forced
    * without flipping it on the caller's session (IncrementalLsh's
    * bucketed-scan pin, AnnIndex's dynamic-overwrite pin). Flipping
    * the caller's conf races concurrent flippers and bleeds into
    * every query that session plans; allocating a fresh `newSession`
    * per call builds a full SessionState and registers listener-bus
    * state per maintenance tick (hundreds per hour at streaming
    * cadence). One session per (SparkContext, pin-set), created
    * lazily, shared thereafter: same catalog and block cache as the
    * caller, own immutable-by-convention conf. Builder-time options
    * carry into it via initialSessionOptions; the caller's RUNTIME
    * conf tweaks do not — bodies must depend only on the pins and
    * the shared catalog.
    *
    * Two sharp edges of that sharing are CONTRACT here, not call-site
    * convention (both were real defects — the r13 soak caught the
    * first live, the r13 advisor flagged the second):
    *
    *  1. '''Stale relation cache.''' The memoized session keeps its
    *     own SessionCatalog relation cache across calls; a compact
    *     swap or drop/recreate done through ANY other session leaves
    *     a cached file listing pointing at deleted files — the next
    *     read fails on a missing file, and an `insertInto` through a
    *     stale relation writes to a dropped incarnation's LOCATION.
    *     So the body must declare the catalog `tables` it touches and
    *     they are `refreshTable`d on entry, every call.
    *  2. '''Database resolution.''' The pinned session starts (and
    *     stays) at currentDatabase=`default`, so a BARE name that
    *     meant `db.t` in a caller running under `USE db` silently
    *     resolves to `default.t` inside — a write lands in the wrong
    *     database and the caller's follow-up DROP/RENAME destroys the
    *     real table. So `tables` are resolved to their
    *     caller-qualified form ([[qualifiedName]]) and the body
    *     receives those QUALIFIED names — use them, never the bare
    *     originals, for every `s.table`/`saveAsTable`/`insertInto`
    *     inside.
    *
    * `tables` must exist in the catalog (refresh of a missing table
    * throws — a table the body CREATES belongs qualified in the
    * body's own hands, not in `tables`). */
  def withPinnedSession[A](spark: org.apache.spark.sql.SparkSession,
                           confs: Map[String, String],
                           tables: Seq[String])
      (body: (org.apache.spark.sql.SparkSession, Seq[String]) => A): A = {
    // drop sessions of stopped contexts (test runners cycle contexts;
    // retaining their SessionStates for the JVM lifetime is a leak)
    pinnedSessions.keysIterator
      .filter(_._1.isStopped).foreach(pinnedSessions.remove)
    val key = (spark.sparkContext, confs)
    // lock-free fast path; construction under a lock — a bare
    // TrieMap.getOrElseUpdate is not atomic, and two racing callers
    // would each build a SessionState (one silently discarded)
    val s = pinnedSessions.get(key).getOrElse(
      pinnedSessions.synchronized {
        pinnedSessions.getOrElseUpdate(key, {
          val fresh = spark.newSession()
          confs.foreach { case (k, v) => fresh.conf.set(k, v) }
          fresh
        })
      })
    val qualified = tables.map(qualifiedName(spark, _))
    qualified.foreach(s.catalog.refreshTable)
    body(s, qualified)
  }
}

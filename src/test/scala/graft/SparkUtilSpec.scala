package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the one behavior `SparkUtil.releaseCheckpoint` exists for:
  * Dataset.unpersist does NOT free a localCheckpoint'd frame's blocks
  * (it only clears CacheManager entries), while the RDD-level release
  * does. If a Spark upgrade ever changes either fact, this suite says
  * so before the memory-hygiene call sites silently stop (or start
  * double-) working.
  */
class SparkUtilSpec extends SparkSpec {

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist alone leaves a localCheckpoint RDD registered") {
    val before = persistentIds
    val df = spark.range(1000).toDF("id").localCheckpoint(true)
    val created = persistentIds -- before
    assert(created.nonEmpty, "localCheckpoint should register an RDD")
    df.unpersist(blocking = true)
    assert((persistentIds -- before) == created,
      "if this starts failing, Spark fixed Dataset.unpersist for " +
        "checkpointed frames and releaseCheckpoint can be simplified")
    // clean up for the other test / suites
    SparkUtil.releaseCheckpoint(df)
  }

  test("releaseCheckpoint frees the checkpoint blocks immediately") {
    val before = persistentIds
    val df = spark.range(1000).toDF("id").localCheckpoint(true)
    assert(df.count() == 1000)
    assert((persistentIds -- before).nonEmpty)
    SparkUtil.releaseCheckpoint(df)
    // unpersist(blocking=false) unregisters synchronously; only the
    // block removal is async
    assert((persistentIds -- before).isEmpty,
      "checkpoint RDD still registered after releaseCheckpoint")
  }

  test("releaseCheckpoint also unpersists a cache()'d frame") {
    val df = spark.range(1000).toDF("id").cache()
    assert(df.count() == 1000)
    assert(df.storageLevel.useMemory)
    SparkUtil.releaseCheckpoint(df)
    assert(!df.storageLevel.useMemory)
  }

  // ---- parallelScan (r17, guide §2.5) ---------------------------
  // The under-split-scan repair's two contractual behaviors. The
  // identity arm is the scale story: at production split counts the
  // helper adds NOTHING to the plan, so every exchange-count and
  // shuffle-growth pin measured elsewhere holds unchanged at scale.

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  test("parallelScan is the identity at >= defaultParallelism partitions") {
    val target = spark.sparkContext.defaultParallelism
    val wellSplit = spark.range(0, 10000, 1, target).toDF("id")
    val repaired = SparkUtil.parallelScan(wellSplit,
      org.apache.spark.sql.functions.col("id"))
    assert(repaired eq wellSplit,
      "parallelScan must return the SAME frame (no added Exchange) " +
        "when the scan already has enough splits")
    assert(exchanges(repaired.select(org.apache.spark.sql.functions
      .sum(org.apache.spark.sql.functions.col("id")))) <= 1) // agg only
  }

  test("parallelScan redistributes an under-split frame by the given key") {
    val target = spark.sparkContext.defaultParallelism
    assume(target > 1)
    val oneTask = spark.range(0, 10000, 1, 1).toDF("id")
    val repaired = SparkUtil.parallelScan(oneTask,
      org.apache.spark.sql.functions.col("id"))
    assert(repaired.rdd.getNumPartitions == target,
      "under-split input must spread to defaultParallelism partitions")
    // hash distribution on the caller's key: deterministic under task
    // retry (round-robin would re-draw placement; guide §2.5). Checked
    // on the LOGICAL plan — AQE hides the physical exchange behind
    // AdaptiveSparkPlanExec until execution.
    val dist = repaired.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical
          .RepartitionByExpression => r
    }
    assert(dist.exists(r =>
      r.partitionExpressions.nonEmpty &&
        r.optNumPartitions.contains(target)),
      s"expected a keyed repartition into $target partitions, got $dist")
    assert(repaired.count() == 10000)
  }

  // ---- parallelScanSized (r18, VERDICT r17 #2) -------------------
  // The size-derived width cap: tiny frames must not fan out to one
  // task per core for microseconds of kernel work, and a frame small
  // enough to target one partition must skip the exchange entirely.
  // At large estimated sizes the cap saturates at defaultParallelism
  // — identical to the flat form, so the at-scale identity arm above
  // covers it.

  test("parallelScanSized caps the width by estimated input bytes") {
    val target = spark.sparkContext.defaultParallelism
    assume(target > 2)
    val oneTask = spark.range(0, 10000, 1, 1).toDF("id")
    val bytes = oneTask.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes > 0)
    // pick bytesPerTask so the cap lands strictly between 1 and max
    val perTask = (bytes / (target / 2)).toLong.max(1L)
    val repaired = SparkUtil.parallelScanSized(oneTask, perTask,
      org.apache.spark.sql.functions.col("id"))
    val parts = repaired.rdd.getNumPartitions
    assert(parts > 1 && parts < target,
      s"expected a mid-range width, got $parts (max $target)")
  }

  test("parallelScanSized skips the exchange when one task is enough") {
    val oneTask = spark.range(0, 100, 1, 1).toDF("id")
    val bytes = oneTask.queryExecution.optimizedPlan.stats.sizeInBytes
    val repaired = SparkUtil.parallelScanSized(oneTask,
      bytes.toLong * 10, org.apache.spark.sql.functions.col("id"))
    assert(repaired eq oneTask,
      "a frame whose size targets 1 partition must come back untouched")
  }

  test("parallelScanSized with bytesPerTask=0 is the flat parallelScan") {
    val target = spark.sparkContext.defaultParallelism
    val oneTask = spark.range(0, 10000, 1, 1).toDF("id")
    val repaired = SparkUtil.parallelScanSized(oneTask, 0L,
      org.apache.spark.sql.functions.col("id"))
    assert(repaired.rdd.getNumPartitions == target)
  }

  // ---- wideStage (r18) -------------------------------------------
  // The AQE-coalesce pin for CPU-heavy stages: the repartition must
  // be an explicit-numPartitions hash repartition at the session's
  // configured shuffle width (REPARTITION_BY_NUM is exempt from AQE
  // byte-based coalescing; a keyless or no-num form would not be),
  // preserving the row multiset.

  test("wideStage hash-repartitions to the configured shuffle width") {
    import org.apache.spark.sql.functions.col
    val conf = spark.sessionState.conf.numShufflePartitions
    val df = spark.range(0, 1000, 1, 2).toDF("id")
    val wide = SparkUtil.wideStage(df, col("id"))
    val rep = wide.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical
          .RepartitionByExpression => r
    }
    assert(rep.exists(_.optNumPartitions.contains(conf)),
      s"expected an explicit $conf-partition keyed repartition, got $rep")
    assert(rep.exists(_.partitionExpressions.nonEmpty))
    assert(wide.count() == 1000)
  }
}

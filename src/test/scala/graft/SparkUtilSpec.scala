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
}

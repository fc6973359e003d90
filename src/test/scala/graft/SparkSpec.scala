package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, getOrCreate reuse). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Total shuffle-write bytes of every stage `thunk` runs — the
    * shared harness behind the exchange-payload guards (ScaleSpec,
    * Dd02AblationSpec). The listener bus delivers asynchronously, so
    * after the thunk returns we poll until the counter is stable for
    * 300 ms (10 s deadline). Single shared implementation: the polling
    * and deadline logic must not fork between the two guards.
    */
  def shuffleWriteBytesOf(thunk: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      thunk
      var last = -1L
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = bytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      // a lagging listener bus must FAIL the guard, not masquerade as
      // low shuffle volume — an undercounted total silently weakens
      // every ScaleSpec/Dd02Ablation bound built on this number
      if (stable < 3)
        fail(s"shuffleWriteBytesOf: listener bus never went quiet " +
          s"within 10 s (counter still moving, last=$last bytes) — " +
          "measurement would undercount; rerun")
      bytes.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Free checkpoint blocks operators leave behind (same sweep as
    * Bench/Verify — see the invariant note in Bench.scala). */
  def sweepPersistentRdds(): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference semantics: Spark 3 non-ANSI — malformed field values
      // cast to NULL instead of throwing (bad-typed JSON fields must
      // degrade gracefully, not kill the streaming job)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.queries

import graft.SparkSpec
import graft.llmdata.DedupFunctions
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Pins the dd02 exchange-payload decision (see the design note on
  * DedupFunctions.ngramJaccardLsh): the serving ids+rejoin shape and
  * the carried-arrays ablation must emit identical pair sets, and the
  * serving shape must keep its measured shuffle-byte advantage — if
  * the carried shape ever shuffles LESS, the decision should flip. */
class Dd02AblationSpec extends SparkSpec {
  // noop sink, not count(): count() would let Catalyst prune the
  // shingle payloads out of the exchanges being compared (r7 lesson)
  private def bytesOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val bytes = new AtomicLong
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      df.write.mode("overwrite").format("noop").save()
      var last = -1L; var stable = 0
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = bytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (bytes.get(), df.count())
    } finally spark.sparkContext.removeSparkListener(l)
  }
  test("serving (ids+rejoin) shape: same output, less shuffle than carried") {
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = graft.Tables.documents(spark, s"/root/testdata/$sf")
      def sweep() = spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
      val (bCarried, nCarried) =
        bytesOf(DedupFunctions.ngramJaccardLshCarried(docs))
      sweep()
      val (bServing, nServing) =
        bytesOf(DedupFunctions.ngramJaccardLsh(docs))
      sweep()
      info(f"$sf carried: $bCarried%,d B ($nCarried rows); " +
        f"serving: $bServing%,d B ($nServing rows)")
      assert(nCarried == nServing, "shapes must emit identical pair counts")
      // full row-set equality, not just counts
      val a = DedupFunctions.ngramJaccardLshCarried(docs)
        .collect().map(_.toString).sorted.toSeq
      val b = DedupFunctions.ngramJaccardLsh(docs)
        .collect().map(_.toString).sorted.toSeq
      sweep()
      assert(a == b, "shapes diverged on pair rows or scores")
      // measured r7: 247 KB vs 6 KB (sf0.01), 20.9 MB vs 0.5 MB (sf0.1)
      assert(bServing <= bCarried,
        s"serving shape now shuffles MORE ($bServing > $bCarried) — " +
          "re-run the ablation and flip the shape if it holds")
    }
  }
}

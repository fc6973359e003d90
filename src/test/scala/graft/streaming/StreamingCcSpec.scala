package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.llmdata.DedupFunctions
import graft.operators.{ConnectedComponents, IncrementalCc}
import graft.store.LogTableStore

/** The streamed incremental chain (LSH probe → pair fold → persisted
  * assignment) must land on the same clusters as clustering the
  * one-shot candidate set — under any micro-batch split and under
  * batch replay. */
class StreamingCcSpec extends SparkSpec {

  test("streamed micro-batches keep the cluster assignment equal to the one-shot closure") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different content about spark shuffles and joins"),
      (4L, "completely different content about spark shuffles and joins"),
      (5L, "unrelated text mentioning minhash signatures and lsh bands"),
      (6L, "the quick brown fox jumps over the lazy dog again and again")
    )
    // one-shot truth: CC over the full candidate pair set
    val oneShot = {
      val df = docs.toDF("doc_id", "text")
      val sigs = df.select(col("doc_id"),
          graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
            .as("th"))
        .filter(size(col("th")) > 0)
        .select(col("doc_id"),
          DedupFunctions.minhashSignature(col("th"), 8).as("sig"))
      val cand = DedupFunctions.lshCandidates(sigs, "doc_id", 4, 2)
      ConnectedComponents.label(cand, cand.columns(0), cand.columns(1))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(oneShot.nonEmpty)

    val idx = s"s_cc_idx_${System.nanoTime()}"
    val store = new LogTableStore(spark, tmpDir("sccstore"))
    val job = new StreamingCcJob(idx, store, "t.assign", tmpDir("sccck"),
      Trigger.ProcessingTime(0))
    val input = MemoryStream[(Long, String)]
    val q = job.start(input.toDF().toDF("doc_id", "text"))
    // splits chosen so a cluster SPANS batches: 0,1 arrive first, the
    // bridging near-dups 2 and 6 arrive later
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.slice(2, 5): _*)
    q.processAllAvailable()
    input.addData(docs.drop(5): _*)
    q.processAllAvailable()

    def assigned: Map[Long, Long] =
      IncrementalCc.assignments(store, "t.assign").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned === oneShot,
      s"streamed assignment $assigned != one-shot $oneShot")

    // at-least-once: re-delivering an already-folded batch changes
    // nothing (freshOnly drops the ids; the fold is idempotent anyway)
    job.foldOnce(docs.take(2).toDF("doc_id", "text"), batchId = 0L)
    assert(assigned === oneShot, "replayed batch perturbed the assignment")
    q.stop()
  }
}

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

  test("crash between pair fold and index append replays safely (jointly atomic)") {
    // the r9 ordering folded pairs AFTER the durable index append: a
    // crash in between lost the batch's merges forever (the replay's
    // ids hit freshOnly, zero pairs resurface). The fold now rides
    // indexBatch's pairsSink — BEFORE the append — so every crash
    // window is replay-safe: this test simulates dying exactly inside
    // the old loss window and proves the merge survives.
    val sp = spark
    import sp.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val idx = s"s_cc_idx2_${System.nanoTime()}"
    val store = new LogTableStore(spark, tmpDir("sccrash"))
    val job = new StreamingCcJob(idx, store, "t.assign", tmpDir("sccck2"))
    def assigned: Map[Long, Long] =
      graft.operators.IncrementalCc.assignments(store, "t.assign")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    job.foldOnce(Seq((0L, text), (1L, text)).toDF("doc_id", "text"), 0L)
    assert(assigned === Map(0L -> 0L, 1L -> 0L))
    // batch 2 bridges doc 2 into the cluster; the "process" dies after
    // the fold, before the index append
    val batch2 = Seq((2L, text)).toDF("doc_id", "text")
    graft.operators.IncrementalCc.ensure(store, "t.assign")
    intercept[RuntimeException] {
      graft.llmdata.IncrementalLsh.indexBatch(spark, idx, batch2, 8, 4, 2,
        pairsSink = { pairs =>
          graft.operators.IncrementalCc.update(store, "t.assign",
            pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
          throw new RuntimeException("simulated crash before index append")
        })
    }
    // the fold is already durable; the index does NOT hold doc 2 yet
    assert(assigned === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
    assert(spark.table(idx).where(col("doc_id") === 2L).count() === 0L)
    // at-least-once replay: ids still unindexed → same pairs recompute,
    // re-fold as a no-op, and the append finally lands — exactly once
    job.foldOnce(batch2, 1L)
    assert(assigned === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
    val keys = spark.table(idx)
    assert(keys.where(col("doc_id") === 2L).count() > 0L)
    assert(keys.count() === keys.distinct().count(),
      "replay duplicated index rows")
  }

  test("index and assignment file counts stay bounded across folds") {
    // the job's own maintenance cadence, both growing states: with the
    // threshold at 4 neither the bucketed index nor the assignment
    // store may ratchet past threshold + one batch's appends, and the
    // assignment still equals the one-shot closure at the end
    val sp = spark
    import sp.implicits._
    val idx = s"s_cc_cidx_${System.nanoTime()}"
    val store = new LogTableStore(spark, tmpDir("scccstore"))
    val job = new StreamingCcJob(idx, store, "t.assign", tmpDir("scccck"),
      Trigger.ProcessingTime(0), buckets = 4, compactAbove = 4,
      maintainEvery = 1)
    val mk = (i: Long) => (i, s"shared template text block number ${i % 3} " +
      "with enough words to shingle and band reliably every time")
    var maxIdx, maxAssign = 0
    (0 until 8).foreach { b =>
      job.foldOnce(Seq(mk(b * 2L), mk(b * 2L + 1)).toDF("doc_id", "text"),
        b.toLong)
      maxIdx = math.max(maxIdx, spark.table(idx).inputFiles.length)
      maxAssign = math.max(maxAssign,
        store.scan("t.assign").inputFiles.length)
    }
    assert(maxIdx <= 4 + 4 + 8, s"index files ratcheted to $maxIdx")
    assert(maxAssign <= 4 + 8, s"assignment files ratcheted to $maxAssign")
    val oneShot = {
      val df = (0L until 16L).map(mk).toDF("doc_id", "text")
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
    assert(IncrementalCc.assignments(store, "t.assign").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === oneShot,
      "maintenance cadence broke the closure equivalence")
    store.close()
    spark.sql(s"DROP TABLE IF EXISTS $idx")
  }
}

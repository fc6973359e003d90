package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.llmdata.DedupFunctions

class StreamingLshSpec extends SparkSpec {

  test("streamed micro-batches accumulate exactly the one-shot pair set") {
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
    val oneShot = {
      val df = docs.toDF("doc_id", "text")
      val sigs = df.select(col("doc_id"),
          graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
            .as("th"))
        .filter(size(col("th")) > 0)
        .select(col("doc_id"),
          DedupFunctions.minhashSignature(col("th"), 8).as("sig"))
      DedupFunctions.lshCandidates(sigs, "doc_id", 4, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    val idx = s"s_lsh_idx_${System.nanoTime()}"
    val prs = s"s_lsh_pairs_${System.nanoTime()}"
    val input = MemoryStream[(Long, String)]
    val job = new StreamingLshJob(idx, prs, tmpDir("lshck"),
      Trigger.ProcessingTime(0))
    val q = job.start(input.toDF().toDF("doc_id", "text"))
    input.addData(docs.take(3): _*)
    q.processAllAvailable()
    input.addData(docs.slice(3, 5): _*)
    q.processAllAvailable()
    input.addData(docs.drop(5): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(prs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === oneShot, s"streamed $streamed != one-shot $oneShot")
    // pairs log has no duplicates (each pair surfaced exactly once)
    assert(spark.table(prs).count() === oneShot.size)
    // cross-batch pair: 6 (batch 3) vs 0 (batch 1)
    assert(streamed.contains((0L, 6L)))

    // foreachBatch's at-least-once crash path: a REPLAYED batch id
    // must be a no-op — no duplicate index rows, no re-emitted pairs
    val idxRows = spark.table(idx).count()
    assert(job.lastIndexed >= 2L)
    job.indexOnce(docs.toDF("doc_id", "text"), job.lastIndexed)
    assert(spark.table(idx).count() === idxRows, "replay re-indexed")
    assert(spark.table(prs).count() === oneShot.size, "replay re-emitted")

    // the STALE-MARKER window (crash after the index append, before
    // marker.commit — the marker does NOT skip): the freshOnly guard
    // drops the already-indexed ids and the empty dynamic overwrite
    // touches no pairs partition, so the original pairs stand
    job.indexOnce(docs.toDF("doc_id", "text"), job.lastIndexed + 1)
    assert(spark.table(idx).count() === idxRows, "stale-marker re-indexed")
    assert(spark.table(prs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === oneShot,
      "stale-marker replay corrupted the pairs log")

    // END-TO-END: the streamed pairs table feeds the SAME clustering +
    // representative selection as the batch pipeline (dd08 → t11),
    // closing the streaming dedup loop — clusters and keep flags from
    // stream-accumulated candidates are identical to the one-shot run
    val docsDf = docs.toDF("doc_id", "text")
    val streamKeep = DedupFunctions.clusterKeep(docsDf,
        spark.table(prs).select(col("id_a").as("doc_a"),
          col("id_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    val batchKeep = DedupFunctions.clusterKeep(docsDf, {
        val sp2 = spark
        import sp2.implicits._
        oneShot.toSeq.toDF("doc_a", "doc_b")
      })
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    assert(streamKeep === batchKeep,
      s"stream-fed clusters diverge:\n$streamKeep\n$batchKeep")
    // the loop actually deduplicates: docs 0,1,6 are one cluster with
    // exactly one keeper; every doc appears exactly once
    assert(streamKeep.map(_._1) === docs.map(_._1).toSet)
    val dupCluster = streamKeep.filter(t => Set(0L, 1L, 6L).contains(t._1))
    assert(dupCluster.size === 3 && dupCluster.map(_._2).size === 1,
      s"split: $dupCluster")
    assert(dupCluster.count(_._3) === 1, s"keeper count: $dupCluster")

    spark.sql(s"DROP TABLE IF EXISTS $idx")
    spark.sql(s"DROP TABLE IF EXISTS $prs")
  }

  test("index file count stays bounded across folds (compaction cadence)") {
    // the maintenance loop the class doc prescribes, run by the job
    // itself (the LlmOrchestrator compactAssignState pattern): every
    // batch appends one file set per touched bucket, and with the
    // threshold at 4 the job must compact often enough that the live
    // file count never ratchets past threshold + one batch's appends —
    // while losing no history (the final pair set still matches the
    // one-shot run over everything fed)
    val sp = spark
    import sp.implicits._
    val idx = s"s_lsh_cidx_${System.nanoTime()}"
    val prs = s"s_lsh_cprs_${System.nanoTime()}"
    val job = new StreamingLshJob(idx, prs, tmpDir("lshcck"),
      Trigger.ProcessingTime(0), buckets = 4, compactIndexAbove = 4,
      maintainEvery = 1)
    val mk = (i: Long) => (i, s"shared template text block number ${i % 3} " +
      "with enough words to shingle and band reliably every time")
    var maxFiles = 0
    (0 until 8).foreach { b =>
      val batch = Seq(mk(b * 2L), mk(b * 2L + 1))
      job.indexOnce(batch.toDF("doc_id", "text"), b.toLong)
      maxFiles = math.max(maxFiles, spark.table(idx).inputFiles.length)
    }
    // bound: the trigger's floor (buckets=4, the post-compaction file
    // count) + threshold (4) + one batch's worth of appends — bucketBy
    // emits up to one file per (write task × touched bucket), so a
    // 2-task batch can add up to 8 — NOT the unbounded accumulation a
    // cadence-less job reaches (8 batches × up-to-8 files each)
    assert(maxFiles <= 4 + 4 + 8, s"file count ratcheted to $maxFiles")
    assert(spark.table(idx).inputFiles.length <= 4 + 4 + 8)
    // no history lost: stream-accumulated pairs equal the one-shot set
    val all = (0L until 16L).map(mk)
    val oneShot = {
      val sigs = all.toDF("doc_id", "text").select(col("doc_id"),
          graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
            .as("th"))
        .filter(size(col("th")) > 0)
        .select(col("doc_id"),
          DedupFunctions.minhashSignature(col("th"), 8).as("sig"))
      DedupFunctions.lshCandidates(sigs, "doc_id", 4, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(spark.table(prs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === oneShot,
      "compaction cadence lost candidate history")
    spark.sql(s"DROP TABLE IF EXISTS $idx")
    spark.sql(s"DROP TABLE IF EXISTS $prs")
  }
}

package graft.llmdata

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.LlmOrchestrator
import graft.store.ParquetTableStore

/** Differential oracle for the incremental corpus gold: after every
  * batch, the maintained cluster/keeper state and the published
  * summary must equal the one-shot batch recompute
  * (LlmOrchestrator.electKeepers / corpusSummary) over everything seen
  * so far. The fixture forces the hard transitions: a cross-batch
  * cluster merge through a bridging doc, a merge reached via a
  * NON-keeper member, a keeper demotion, and a quality tie resolved
  * by min doc_id. */
class IncrementalCorpusSpec extends SparkSpec {

  // (doc_id, lang, source, n_tokens, quality_score)
  private type Doc = (Long, String, String, Int, Double)

  private def docsDf(docs: Seq[Doc]): DataFrame = {
    val sp = spark
    import sp.implicits._
    docs.toDF("doc_id", "lang", "source", "n_tokens", "quality_score")
  }

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def keeperSet(df: DataFrame) =
    df.select("doc_id", "cluster_id", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private def summarySet(df: DataFrame) =
    df.select("lang", "source", "n_docs", "n_keepers", "dup_ratio",
        "avg_quality", "total_tokens").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        math.round(r.getDouble(4) * 1e9), math.round(r.getDouble(5) * 1e9),
        r.getLong(6))).toSet

  test("incremental fold ≡ batch recompute across merges, demotions, ties") {
    val store = new ParquetTableStore(spark, tmpDir("inccorpus"))

    val b1: Seq[Doc] = Seq((1L, "en", "web", 40, 0.9),
      (2L, "en", "web", 35, 0.5), (3L, "en", "books", 50, 0.8))
    val p1 = Seq((1L, 2L))
    // doc 5 bridges clusters {1,2} and {3}; doc 6 is a singleton slice
    val b2: Seq[Doc] = Seq((5L, "en", "crawl", 20, 0.7),
      (6L, "de", "web", 30, 0.6))
    val p2 = Seq((1L, 5L), (3L, 5L))
    // doc 7 ties doc 1's quality (min id keeps); doc 8 reaches the
    // cluster through NON-keeper doc 2 and dethrones doc 1
    val b3: Seq[Doc] = Seq((7L, "en", "web", 25, 0.9),
      (8L, "en", "books", 45, 0.95))
    val p3 = Seq((1L, 7L), (2L, 8L))

    var seenDocs = Seq.empty[Doc]
    var seenPairs = Seq.empty[(Long, Long)]
    for ((docs, pairs) <- Seq((b1, p1), (b2, p2), (b3, p3))) {
      IncrementalCorpus.applyBatch(store, docsDf(docs), pairsDf(pairs))
      seenDocs ++= docs; seenPairs ++= pairs

      val batchKeepers =
        LlmOrchestrator.electKeepers(docsDf(seenDocs), pairsDf(seenPairs))
      assert(keeperSet(store.scan("docs.cluster_state")) ===
        keeperSet(batchKeepers), s"state diverged after docs $docs")
      val batchSummary = LlmOrchestrator.corpusSummary(
        docsDf(seenDocs), batchKeepers.select(col("doc_id"), col("keep")))
      assert(summarySet(IncrementalCorpus.publish(store)) ===
        summarySet(batchSummary), s"summary diverged after docs $docs")
    }

    // the semantics the fixture encodes, pinned explicitly
    val state = store.scan("docs.cluster_state").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))).toMap
    assert(state(8L) === ((1L, true)), "doc 8 should dethrone doc 1")
    assert(state(1L) === ((1L, false)))
    assert(state(3L)._2 === false, "doc 3 was demoted by the bridge merge")
    assert(state(6L) === ((6L, true)), "singleton keeps itself")
    assert(Seq(2L, 5L, 7L).forall(d => state(d)._1 == 1L && !state(d)._2))

    // pair-only replay (empty fresh batch, already-applied pairs) is a
    // no-op — the at-least-once crash window for a streaming driver
    val before = keeperSet(store.scan("docs.cluster_state"))
    val beforeSummary = summarySet(IncrementalCorpus.publish(store))
    val emptyBatch = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(
        IncrementalCorpus.ClusterStateSchema
          .filter(f => Set("doc_id", "lang", "source", "n_tokens",
            "quality_score").contains(f.name))))
    IncrementalCorpus.applyBatch(store, emptyBatch, pairsDf(p2))
    assert(keeperSet(store.scan("docs.cluster_state")) === before)
    assert(summarySet(IncrementalCorpus.publish(store)) === beforeSummary)
  }
}

package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dq.{GateResult, Notifier}
import graft.store.ParquetTableStore
import graft.streaming.DocumentIngest

/** Edge paths of the llmdata batch cycle that the streamed end-to-end
  * spec (which always has a populated pair log) cannot reach: the very
  * first cycle of a deployment, before any near-dup pair has ever been
  * logged — and a cycle over an empty corpus. Both are day-one
  * production states, not corner cases. */
class LlmOrchestratorSpec extends SparkSpec {

  private object QuietNotifier extends Notifier {
    def notify(layer: String, result: GateResult): Unit = ()
  }

  private val t0 = Timestamp.valueOf("2024-03-01 12:00:00")

  private def ingestedDocs(rows: Seq[(Long, String, String, String)]) = {
    val sp = spark
    import sp.implicits._
    DocumentIngest.enrich(
      rows.map { case (id, text, lang, src) => (id, text, lang, src, t0) }
        .toDF("doc_id", "text", "lang", "source", "ingest_ts"))
  }

  test("first cycle with no pairs table: every doc is its own keeper") {
    val store = new ParquetTableStore(spark, tmpDir("llmorch1"))
    store.ensure("docs.ingested", DocumentIngest.IngestedSchema,
      Seq("digest_bucket"))
    store.append("docs.ingested", ingestedDocs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river " +
        "bank where tall grass grows in the morning light", "en", "web"),
      (2L, "completely different prose about distributed query engines " +
        "and the shuffles they avoid", "en", "books"))))

    val orch = new LlmOrchestrator(spark, store, QuietNotifier,
      pairsTable = s"no_such_pairs_${System.nanoTime()}")
    val result = orch.runCycle("first-cycle", "2024-03-01")
    assert(result.succeeded, result.gateResults.flatMap(_.results)
      .filter(_.failed).mkString("; "))

    val keepers = store.scan("docs.keepers").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("keep"))).toSet
    assert(keepers === Set((1L, 1L, true), (2L, 2L, true)))
    val summary = store.scan("gold.corpus_summary")
    assert(summary.count() === 2)
    assert(summary.filter(col("dup_ratio") =!= 0.0).count() === 0)
    assert(summary.filter(col("n_keepers") =!= 1).count() === 0)
  }

  test("first cycle runs identically on the transactional LogTableStore backend") {
    val store = new graft.store.LogTableStore(spark, tmpDir("llmorchlog"))
    store.ensure("docs.ingested", DocumentIngest.IngestedSchema,
      Seq("digest_bucket"))
    store.append("docs.ingested", ingestedDocs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river " +
        "bank where tall grass grows in the morning light", "en", "web"),
      (2L, "completely different prose about distributed query engines " +
        "and the shuffles they avoid", "en", "books"))))
    val orch = new LlmOrchestrator(spark, store, QuietNotifier,
      pairsTable = s"no_such_pairs_${System.nanoTime()}")
    val result = orch.runCycle("first-cycle", "2024-03-01")
    assert(result.succeeded, result.gateResults.flatMap(_.results)
      .filter(_.failed).mkString("; "))
    val keepers = store.scan("docs.keepers").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"))).toSet
    assert(keepers === Set((1L, true), (2L, true)))
    assert(store.scan("gold.corpus_summary").count() === 2)
  }

  test("empty corpus: the cycle completes with empty outputs, no crash") {
    val store = new ParquetTableStore(spark, tmpDir("llmorch2"))
    store.ensure("docs.ingested", DocumentIngest.IngestedSchema,
      Seq("digest_bucket"))

    val orch = new LlmOrchestrator(spark, store, QuietNotifier,
      pairsTable = s"no_such_pairs_${System.nanoTime()}")
    val result = orch.runCycle("empty-cycle", "2024-03-01")
    assert(result.succeeded)
    assert(result.completed === Seq("keepers", "summary"))
    assert(store.scan("docs.keepers").count() === 0)
    assert(store.scan("gold.corpus_summary").count() === 0)
  }
}

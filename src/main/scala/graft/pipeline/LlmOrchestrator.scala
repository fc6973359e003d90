package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Settings
import graft.dq._
import graft.operators.ConnectedComponents
import graft.store.TableStore

/** Training-data sibling of [[Orchestrator]]: the batch cycle that
  * runs BETWEEN streaming triggers on the llmdata side. The streaming
  * jobs ([[graft.streaming.DocumentIngest]] filling `docs.ingested`,
  * [[graft.streaming.StreamingLshJob]] filling the candidate-pairs
  * log, [[graft.streaming.EmbeddingIngest]] growing the ANN index)
  * handle per-record work; this cycle does the corpus-global steps a
  * micro-batch cannot: gate the ingested corpus, contract the pair
  * log into duplicate clusters, elect keepers, and publish the gold
  * corpus summary — fail-fast on a FAILED gate, same D12/D14
  * semantics as the wiki cycle (dq_checks.py:1130-1164 analogue).
  *
  * Scale shape: the gate is one agg pass over the docs table; the
  * clustering is the O(log n) star-contraction over the pair log
  * (whose size is the LSH collision set, not the corpus); keepers are
  * one window over (cluster_id) — each a bounded, shuffle-on-key
  * stage. Publishing is key-scoped MERGE, so reruns are idempotent.
  */
class LlmOrchestrator(spark: SparkSession, store: TableStore,
                      notifier: Notifier = ConsoleNotifier,
                      docsTable: String = "docs.ingested",
                      pairsTable: String = "docs_lsh_pairs",
                      keepersTable: String = "docs.keepers",
                      summaryTable: String = "gold.corpus_summary",
                      // incremental clustering: fold only pair-log
                      // batches newer than the persisted high-water
                      // mark into the IncrementalCc assignment instead
                      // of re-closing ALL of pair history every cycle
                      incrementalCc: Boolean = false,
                      ccAssignTable: String = "docs.cc_assign",
                      // state maintenance cadence: each fold's COW
                      // upsert stages a small file set, so the cycle
                      // compacts the assignment (clustered by id —
                      // what keeps the lookup's zone pruning and the
                      // COW matched-file search selective) whenever
                      // its live file count exceeds this bound.
                      // File-count-triggered rather than every-N:
                      // self-regulating under any fold size, and
                      // idempotent across crash-replayed cycles.
                      compactStateAbove: Int = 16) {

  import LlmOrchestrator._

  private val gates = new GateRunner(spark, store, notifier)

  /** One batch cycle: DocsDQ → cluster+keepers → summary → CorpusDQ. */
  def runCycle(runId: String, runDate: String): CycleResult = {
    var completed = Vector.empty[String]
    var gateResults = Vector.empty[GateResult]

    def gate(layer: String, results: Seq[CheckResult]): Boolean = {
      val g = gates.run(layer, runId, runDate, results)
      gateResults :+= g
      g.passed
    }

    // ---- Docs DQ gate (the llmdata bronze) ----
    val docs = store.scan(docsTable)
    val docChecks = ConstraintEval.run(docs, Seq(
      Constraint.Complete("doc_id"),
      Constraint.Complete("text"),
      Constraint.Complete("text_digest"),
      Constraint.Unique(Seq("text_digest")),
      Constraint.Bounded("quality_score", 0.0, 1.0),
      Constraint.Completeness("predicted_lang",
        Settings.CompletenessThreshold)))
    if (!gate("docs", docChecks))
      return CycleResult(runId, completed, Some("docs"), gateResults)
    if (!gates.upstreamPassed("docs"))
      return CycleResult(runId, completed, Some("docs:upstream"), gateResults)

    // ---- Duplicate clusters + keeper election ----
    // The streamed pair log accumulates (id_a, id_b) per micro-batch;
    // a near-dup can span any two batches, so the closure must cover
    // ALL of history. Two ways to get there:
    //  - batch mode: one-shot ConnectedComponents over the whole log
    //    (O(all pairs) per cycle);
    //  - incremental mode: the persisted IncrementalCc assignment IS
    //    history — only batches past the folded high-water mark are
    //    contracted in (O(new pairs) per cycle), and IncrementalCcSpec
    //    pins the two modes to identical assignments.
    val keepers =
      if (incrementalCc) electKeepersFrom(docs, foldNewPairBatches())
      else {
        val pairs: DataFrame =
          if (spark.catalog.tableExists(pairsTable))
            spark.table(pairsTable)
              .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
          else spark.emptyDataFrame
            .select(lit(0L).as("doc_a"), lit(0L).as("doc_b")).limit(0)
        electKeepers(docs, pairs)
      }
    store.ensure(keepersTable, KeepersSchema)
    store.mergeUpsert(keepersTable, keepers, Seq("doc_id"))
    completed :+= "keepers"

    // ---- Gold corpus summary ----
    val summary = corpusSummary(docs, store.scan(keepersTable))
    store.ensure(summaryTable, SummarySchema)
    store.mergeUpsert(summaryTable, summary, Seq("lang", "source"))
    completed :+= "summary"

    // ---- Corpus DQ gate on the published summary ----
    val published = store.scan(summaryTable)
    val corpusChecks = ConstraintEval.run(published, Seq(
      Constraint.Complete("lang"),
      Constraint.Complete("source"),
      Constraint.Bounded("dup_ratio", 0.0, 1.0),
      // every (lang, source) slice must keep at least one document —
      // a zero-keeper slice means clustering ate a whole feed
      Constraint.Bounded("n_keepers", 1.0, Long.MaxValue.toDouble)))
    if (!gate("corpus", corpusChecks))
      return CycleResult(runId, completed, Some("corpus"), gateResults)

    CycleResult(runId, completed, None, gateResults)
  }

  /** Fold pair-log batches newer than the persisted high-water mark
    * into the [[graft.operators.IncrementalCc]] assignment and return
    * the current (id, component) frame. Folding is idempotent, so a
    * crash between the fold and the mark advance replays safely. */
  private def foldNewPairBatches(): DataFrame = {
    import graft.operators.IncrementalCc
    val hwmTable = ccAssignTable + "_hwm"
    IncrementalCc.ensure(store, ccAssignTable)
    store.ensure(hwmTable, CcHwmSchema)
    if (spark.catalog.tableExists(pairsTable)) {
      val hwm = store.scan(hwmTable).agg(max(col("folded_through")))
        .head().getAs[Any](0) match {
          case null => -1L
          case v: java.lang.Long => v.longValue()
        }
      val fresh = spark.table(pairsTable)
        .filter(col("batch_id") > hwm)
      val newMax = fresh.agg(max(col("batch_id"))).head()
      if (!newMax.isNullAt(0)) {
        IncrementalCc.update(store, ccAssignTable,
          fresh.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")),
          "doc_a", "doc_b")
        store.mergeUpsert(hwmTable,
          spark.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(0L, newMax.getLong(0))),
            CcHwmSchema),
          Seq("k"))
        // table maintenance on the orchestrator's own cadence — not a
        // manual operator chore (IncrementalCc's doc): the assignment
        // store accretes one small file set per fold, and scan cost
        // rides file count, not bytes. The trigger counts SMALL files
        // (what compaction folds), not total files: a total-count
        // trigger stops resetting once the state outgrows
        // threshold×targetBytes and degrades into a full clustered
        // rewrite after every fold
        if (store.smallFileCount(ccAssignTable,
            CompactTargetBytes) > compactStateAbove)
          compactAssignState()
      }
    }
    graft.operators.IncrementalCc.assignments(store, ccAssignTable)
  }

  private val CompactTargetBytes = 128L * 1024 * 1024

  /** Clustered compaction of the CC assignment — backend-agnostic via
    * the trait's compact (compaction is a layout concern, not a
    * semantics one; every backend must supply it). */
  private def compactAssignState(): Unit =
    store.compact(ccAssignTable, CompactTargetBytes, Seq("id"))
}

object LlmOrchestrator {

  val CcHwmSchema: StructType = StructType(Seq(
    StructField("k", LongType),
    StructField("folded_through", LongType)))

  val KeepersSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("cluster_id", LongType),
    StructField("quality_score", DoubleType),
    StructField("keep", BooleanType)))

  val SummarySchema: StructType = StructType(Seq(
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_docs", LongType),
    StructField("n_keepers", LongType),
    StructField("dup_ratio", DoubleType),
    StructField("avg_quality", DoubleType),
    StructField("total_tokens", LongType)))

  /** [[graft.llmdata.DedupFunctions.clusterKeep]] semantics over the
    * ALREADY-ENRICHED docs table: identical ranking (quality desc,
    * doc_id asc per cluster) but reading the stored `quality_score`
    * instead of re-hashing text — the streaming enrich and the batch
    * twin share one projection (`DocumentIngest.enrich`), so the
    * scores are bit-identical by construction. */
  def electKeepers(docs: DataFrame, pairs: DataFrame): DataFrame =
    electKeepersFrom(docs, ConnectedComponents.label(pairs, "doc_a", "doc_b"))

  /** Keeper election from an ALREADY-COMPUTED (id, component) frame —
    * the one-shot path above and the orchestrator's incremental path
    * (persisted [[graft.operators.IncrementalCc]] assignment) share
    * this ranking, so the two clustering modes cannot drift on who is
    * kept. */
  def electKeepersFrom(docs: DataFrame, cc: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("quality_score"))
    val labeled = scored.join(cc, scored("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"),
        col("quality_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    labeled.withColumn("keep", row_number().over(w) === 1)
  }

  /** Per-(lang, source) corpus health: raw vs kept volume, duplicate
    * fraction, mean quality, token budget. One shuffle on the group
    * key after a broadcast-sized keeper join per doc. */
  def corpusSummary(docs: DataFrame, keepers: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("quality_score"))
      .join(keepers.select(col("doc_id"), col("keep")), Seq("doc_id"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keepers"),
        round(lit(1.0) - sum(when(col("keep"), 1L).otherwise(0L)) /
          count(lit(1)), 6).as("dup_ratio"),
        // decimal-exact mean (t16/t20 convention): the 6-decimal
        // scores sum exactly, so the one double division is
        // order-free — a plain avg() is summation-order-dependent in
        // its 16th digit, which a round(…, 6) can land right on
        round(sum(col("quality_score").cast("decimal(30,9)"))
          .cast("double") / count(lit(1)), 6).as("avg_quality"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
}

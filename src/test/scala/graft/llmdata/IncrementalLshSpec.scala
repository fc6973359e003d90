package graft.llmdata

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalLshSpec extends SparkSpec {

  private def fixture = {
    val sp = spark
    import sp.implicits._
    // near-dup families + filler so band collisions exist across and
    // within batches
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different content about spark shuffles and joins"),
      (4L, "completely different content about spark shuffles and joins"),
      (5L, "unrelated text mentioning minhash signatures and lsh bands"),
      (6L, "another standalone document with its own vocabulary entirely"),
      (7L, "the quick brown fox jumps over the lazy dog again and again")
    )
    rows.toDF("doc_id", "text")
  }

  test("batched indexing yields exactly the one-shot candidate set") {
    val docs = fixture
    val full = {
      val sigs = docs.select(col("doc_id"),
          graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
            .as("th"))
        .filter(size(col("th")) > 0)
        .select(col("doc_id"),
          DedupFunctions.minhashSignature(col("th"), 8).as("sig"))
      DedupFunctions.lshCandidates(sigs, "doc_id", 4, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val t = s"lsh_idx_${System.nanoTime()}"
    val p1 = IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") < 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") >= 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((p1 ++ p2) === full,
      s"incremental ${p1 ++ p2} != one-shot $full")
    // cross-batch pair (0,7) spans the split and must come from the
    // index probe, not the within-batch self-join
    assert(p2.contains((0L, 7L)))
    // index now holds every band key of the corpus
    val keyCount = IncrementalLsh.bandKeys(docs).count()
    assert(spark.table(t).count() === keyCount)

    // the doc_id-disjoint contract is ENFORCED, not trusted: re-feeding
    // an already-indexed batch is a no-op — no duplicate index rows, no
    // re-emitted pairs (this is also the crash-replay path of
    // StreamingLshJob: append done, marker lost)
    val refed = IncrementalLsh.indexBatch(spark, t,
      docs.filter(col("doc_id") < 4))
    assert(refed.count() === 0L, "re-feed re-emitted pairs")
    assert(spark.table(t).count() === keyCount, "re-feed duplicated index rows")
    // partial overlap: only the genuinely-new id contributes
    val sp2 = spark
    import sp2.implicits._
    val mixed = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (8L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val p3 = IncrementalLsh.indexBatch(spark, t, mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3.forall(_._2 == 8L), s"overlap ids re-paired: $p3")
    assert(p3.contains((0L, 8L)))
    assert(spark.table(t).filter(col("doc_id") === 0L).count() ===
      IncrementalLsh.bandKeys(docs.filter(col("doc_id") === 0L)).count(),
      "overlapping id re-indexed")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("compact bin-packs per-batch files, keeps bucket layout and candidates") {
    val docs = fixture
    val t = s"lsh_idx_cmp_${System.nanoTime()}"
    // one doc per batch → one small file set per append
    (0 until 6).foreach { i =>
      IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") === i))
    }
    val before = spark.table(t).inputFiles.length
    val rows = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    IncrementalLsh.compact(spark, t)
    val after = spark.table(t).inputFiles.length
    assert(after < before, s"no compaction: $before -> $after files")
    assert(after <= 16, s"more files than buckets: $after")
    assert(spark.table(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet === rows,
      "compaction changed the index contents")
    // the probe join still reads the index co-located after the rewrite
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = IncrementalLsh.probeJoin(
        IncrementalLsh.bandKeys(docs.filter(col("doc_id") >= 6)),
        spark.table(t))
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true") ||
        plan.contains("SelectedBucketsCount"), plan.take(3000))
      // r17: count only planner-REQUIRED hash exchanges — the
      // conditional under-split-scan repartition (REPARTITION_BY_NUM,
      // batch side by construction, identity at production splits) is
      // not an index-side shuffle; one would print ENSURE_REQUIREMENTS
      val exchanges =
        "Exchange hashpartitioning\\([^\\n]*ENSURE_REQUIREMENTS".r.findAllIn(
          plan.split("== Initial Plan ==").head).size
      assert(exchanges <= 1, s"index side shuffled after compact: $exchanges")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and indexing continues correctly on the compacted table: doc 7
    // is a near-dup of docs 0/1 indexed pre-compaction
    val p = IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") === 7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((0L, 7L)) && p.contains((1L, 7L)), s"lost history: $p")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("bloom guard: an all-fresh batch skips the index id scan entirely") {
    val docs = fixture
    val t = s"lsh_idx_bloom_${System.nanoTime()}"
    IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") < 4))
    // the sidecar is written inside the index table's directory
    assert(java.nio.file.Files.exists(IncrementalLsh.bloomPath(spark, t)))
    // an all-fresh batch comes back as the SAME DataFrame reference —
    // the definitive no-index-work assert: freshOnly short-circuits on
    // zero bloom hits before any index-side plan is even constructed
    val fresh = docs.filter(col("doc_id") >= 4)
    assert(IncrementalLsh.freshOnly(spark, t, fresh) eq fresh)
    // replayed ids still confirmed against the index and dropped
    val replay = docs.filter(col("doc_id") < 4)
    assert(IncrementalLsh.freshOnly(spark, t, replay).count() === 0L)
    // pre-sidecar indexes (or a lost sidecar) reseed from the id
    // column once, then guard correctly again
    IncrementalLsh.dropCaches(t)
    java.nio.file.Files.delete(IncrementalLsh.bloomPath(spark, t))
    assert(IncrementalLsh.freshOnly(spark, t, replay).count() === 0L)
    assert(java.nio.file.Files.exists(IncrementalLsh.bloomPath(spark, t)),
      "seeding must rewrite the sidecar")
    assert(IncrementalLsh.freshOnly(spark, t, fresh) eq fresh)
    // compact carries the sidecar across the table swap
    IncrementalLsh.compact(spark, t)
    assert(java.nio.file.Files.exists(IncrementalLsh.bloomPath(spark, t)),
      "compact must preserve the bloom sidecar")
    IncrementalLsh.dropCaches(t) // force the file path
    assert(IncrementalLsh.freshOnly(spark, t, fresh) eq fresh)
    assert(IncrementalLsh.freshOnly(spark, t, replay).count() === 0L)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("crashed compact swap self-heals — no lost history, no silent empty index") {
    val docs = fixture
    val t = s"lsh_idx_crash_${System.nanoTime()}"
    IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") < 6))
    val rows = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // simulate the crash window: compacted copy written, main dropped,
    // rename never ran — the pre-fix worst case (index name dangling)
    spark.table(t).repartition(16, col("key"))
      .write.format("parquet").bucketBy(16, "key").sortBy("key")
      .saveAsTable(s"${t}_compacting")
    spark.sql(s"DROP TABLE $t")
    assert(!spark.catalog.tableExists(t))
    // (a) indexBatch on the next micro-batch heals first: history is
    // back, so doc 7 pairs with its pre-crash near-dups 0/1 instead of
    // silently seeding an empty index
    val p = IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") === 7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((0L, 7L)) && p.contains((1L, 7L)),
      s"history lost after crash recovery: $p")
    assert(!spark.catalog.tableExists(s"${t}_compacting"))
    // (b) re-running compact after the same crash also recovers
    spark.table(t).repartition(16, col("key"))
      .write.format("parquet").bucketBy(16, "key").sortBy("key")
      .saveAsTable(s"${t}_compacting")
    spark.sql(s"DROP TABLE $t")
    IncrementalLsh.compact(spark, t)
    assert(spark.catalog.tableExists(t))
    assert(rows.subsetOf(spark.table(t).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet),
      "compact-after-crash lost pre-crash index rows")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("probe join reads the index co-located — no index-side shuffle") {
    val docs = fixture
    val t = s"lsh_idx_plan_${System.nanoTime()}"
    IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") < 6))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the PRODUCTION probe shape (probeJoin — what indexBatch runs):
      // the equi-join is on `key` alone, matching the index's
      // bucketBy(key) layout, with band equality as a post-join
      // filter. Pinning the production method matters: the r10 form
      // of this test replicated the probe with (band, key) in the
      // JOIN keys and found the planner then disables the bucketed
      // scan and re-shuffles BOTH sides — the full-index shuffle the
      // operator exists to avoid, hidden for two rounds because this
      // pin joined on key only while production joined on (band, key)
      val probe = IncrementalLsh.probeJoin(
        IncrementalLsh.bandKeys(docs.filter(col("doc_id") >= 6)),
        spark.table(t))
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true") ||
        plan.contains("SelectedBucketsCount"), plan.take(3000))
      // exactly one hashpartitioning exchange of ANY key shape — the
      // tiny batch side shuffling into the bucket layout; the index
      // side reads in place
      // r17: REQUIRED exchanges only — the batch-side REPARTITION_BY_NUM
      // under-split repair is not an index-side shuffle (see compact pin)
      val exchanges =
        "Exchange hashpartitioning\\([^\\n]*ENSURE_REQUIREMENTS".r.findAllIn(
          plan.split("== Initial Plan ==").head).size
      assert(exchanges <= 1,
        s"index side must not shuffle ($exchanges exchanges):\n${plan.take(3000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("the history probe reads only the batch's buckets, not the whole index") {
    // the read-amplification twin of the co-location pin above: a
    // co-located join that still SCANS every bucket file is O(index)
    // read per micro-batch forever (the same defect class as the r10
    // IncrementalCorpus member search, shaped for a bucketed table).
    // prunedHist's key IN-set must bucket-prune the index scan while
    // changing nothing about the pair set or the exchange count.
    val sp = spark
    import sp.implicits._
    val corpus = (0L until 400L).map(i => (i,
      s"document number $i carries tokens alpha$i beta${i * 7 % 97} " +
        s"gamma${i * 13 % 89} delta${i * 31 % 83} unique enough to shingle"))
      .toDF("doc_id", "text")
    val t = s"lsh_idx_prune_${System.nanoTime()}"
    IncrementalLsh.indexBatch(spark, t, corpus)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batchKeys = IncrementalLsh.bandKeys(
        corpus.filter(col("doc_id") === 0L)).localCheckpoint(true)
      val pruned = IncrementalLsh.probeJoin(batchKeys,
        IncrementalLsh.prunedHist(spark, t, batchKeys))
      val full = IncrementalLsh.probeJoin(batchKeys, spark.table(t))
      // lossless: the IN-set restriction keeps the exact pair set
      val pairSet = (df: org.apache.spark.sql.DataFrame) => df
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
        .toSet
      assert(pairSet(pruned) === pairSet(full),
        "pruned probe changed the candidate set")
      // the scan is bucket-pruned: one doc emits 4 band keys, so at
      // most 4 of the 16 buckets may be read
      val plan = pruned.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
        .getOrElse(fail(s"no bucket pruning in plan:\n${plan.take(3000)}"))
      assert(sel.group(1).toInt <= 4 && sel.group(2).toInt == 16,
        s"expected <=4 of 16 buckets, got ${sel.matched}")
      // and the filter did not cost the co-located layout
      // r17: REQUIRED exchanges only (see the co-location pin above)
      val exchanges =
        "Exchange hashpartitioning\\([^\\n]*ENSURE_REQUIREMENTS".r
          .findAllIn(plan).size
      assert(exchanges <= 1,
        s"prune broke co-location ($exchanges exchanges)")
      // SelectedBucketsCount IS the file-level guarantee: the bucketed
      // read drops pruned buckets' files before any are opened, so
      // ≤4 of 16 buckets means ≤1/4 of the index's files are ever
      // read. (No byte-level arm here on purpose: standalone scans
      // get `Bucketed: false (disabled by query planner)` — pruning
      // only exists in the join — and at toy scale the joined scan's
      // byte counts are dominated by FS buffering and parquet
      // dictionary-filter reads, not by file selection.)

      // the literal-ceiling fallback arm: a batch with more keys than
      // the ceiling must get the UNFILTERED co-located scan (a batch
      // that size amortizes the read; an unbounded IN-list would
      // bloat the plan) — and the pair set is identical either way
      val fallback = IncrementalLsh.probeJoin(batchKeys,
        IncrementalLsh.prunedHist(spark, t, batchKeys, ceiling = 2))
      assert(pairSet(fallback) === pairSet(full),
        "ceiling fallback changed the candidate set")
      assert(!fallback.queryExecution.optimizedPlan.toString
          .contains(" IN ("),
        "above the ceiling the history scan must carry no IN filter")

      // a null-keyed batch row can never match the index: the probe
      // decision's InternalRow fold must SKIP it (not NPE in
      // getUTF8String) and the candidate set must be unchanged
      val withNull = batchKeys.unionByName(batchKeys.limit(1)
        .withColumn("key", lit(null).cast("string")))
        .localCheckpoint(true)
      val prunedNull = IncrementalLsh.probeJoin(withNull,
        IncrementalLsh.prunedHist(spark, t, withNull))
      assert(pairSet(prunedNull) === pairSet(full),
        "a null-keyed batch row changed the candidate set")

      // the probe DECISION is one driver job (r14 ran two: a count()
      // gate then distinct().collect(); the capped-fold shape answers
      // gate and literals in a single pass) — in BOTH arms: the
      // pruned path and the ceiling fallback each fold once.
      def jobsOf(thunk: => Unit): Int = {
        val n = new java.util.concurrent.atomic.AtomicInteger
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            n.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(l)
        try {
          thunk
          var last = -1; var stable = 0
          val deadline = System.nanoTime() + 10L * 1000000000L
          while (stable < 3 && System.nanoTime() < deadline) {
            Thread.sleep(100)
            val now = n.get()
            if (now == last) stable += 1 else { stable = 0; last = now }
          }
          n.get()
        } finally spark.sparkContext.removeSparkListener(l)
      }
      val jPruned = jobsOf(IncrementalLsh.prunedHist(spark, t, batchKeys))
      val jFallback = jobsOf(
        IncrementalLsh.prunedHist(spark, t, batchKeys, ceiling = 2))
      assert(jPruned == 1, s"pruned probe decision ran $jPruned jobs, want 1")
      assert(jFallback == 1,
        s"fallback probe decision ran $jFallback jobs, want 1")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("a pre-r10 index fails loud and migrates losslessly (key-format guard)") {
    val docs = fixture
    val t = s"lsh_idx_fmt_${System.nanoTime()}"
    // build an index, then rewrite it into the PRE-r10 key format
    // (bare band groups) — what a deployment upgraded in place would
    // hold on disk
    IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") < 6))
    val preR10 = spark.table(t)
      .select(col("doc_id"), col("band"),
        regexp_replace(col("key"), "^\\d+:", "").as("key"))
      .collect()
    spark.sql(s"DROP TABLE $t")
    val sp = spark
    import sp.implicits._
    preR10.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      .toDF("doc_id", "band", "key")
      .repartition(16, col("key"))
      .write.format("parquet").bucketBy(16, "key").sortBy("key")
      .saveAsTable(t)
    // NO cache eviction here, deliberately: the qualified-keys verdict
    // for the dropped incarnation is keyed to its catalog createTime,
    // so the recreated table must re-probe on its own — a bare-name
    // cache would carry the stale `true` across the drop/recreate and
    // skip the guard for the JVM's lifetime (the r10 ADVICE finding)
    // probing it with the current format must fail LOUDLY — a silent
    // zero-pair probe would lose every cross-boundary pair forever
    val e = intercept[IllegalStateException](
      IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") >= 6)))
    assert(e.getMessage.contains("migrateKeyFormat"))
    // the one-time migration restores service with zero history loss:
    // doc 7 (new batch) still pairs with docs 0/1 indexed pre-upgrade
    IncrementalLsh.migrateKeyFormat(spark, t)
    val p = IncrementalLsh.indexBatch(spark, t, docs.filter(col("doc_id") >= 6))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((0L, 7L)) && p.contains((1L, 7L)),
      s"migration lost pre-upgrade history: $p")
    // idempotent: re-running the migration is a harmless rewrite
    IncrementalLsh.migrateKeyFormat(spark, t)
    assert(spark.table(t).count() ===
      IncrementalLsh.bandKeys(docs).count())
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}

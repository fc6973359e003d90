package graft.llmdata

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The persisted IVF-PQ index must be a pure lifecycle change: same
  * results as the inline build, queries pruned to probed cell
  * partitions, params surviving the table round-trip, rebuilds
  * overwriting cleanly. */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getInt(3))).toSet

  test("build-once search is bit-identical to inline ivfPqTopK") {
    val t = s"graft_annidx_spec_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16)
    val stored = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val inline = resultSet(Similarity.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16))
    assert(stored === inline)
    assert(stored.nonEmpty)
  }

  test("search scans only probed cell partitions (static pruning)") {
    val t = s"graft_annidx_prune_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16)
    // a single query probes exactly nprobe cells — the scan must carry
    // a partition filter on cell, the "read nprobe/nlist of the index"
    // promise made literal
    val one = emb.filter(col("vec_id") === 5)
    val df = AnnIndex.search(spark, t, one, "vec_id", "embedding",
      k = 3, nprobe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"index scan must prune on the cell partition column:\n${p.take(4000)}")
    // and the pruned scan reads ≤ nprobe of the nlist cell directories
    // (descend through AQE wrappers — executed plans nest query stages)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(t)))
      .map(_.selectedPartitions.partitionCount)
    assert(scanned.nonEmpty && scanned.forall(_ <= 2),
      s"expected ≤ nprobe=2 partitions scanned, got $scanned")
  }

  test("params sidecar round-trips centroids, codebooks, residual flag") {
    val t = s"graft_annidx_params_${System.nanoTime()}"
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val books = Similarity.deriveIvfPqCodebooks(emb, "vec_id", "embedding",
      cents, m = 4, kCodes = 16, residual = true)
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16)
    val (rc, rb, rres) = AnnIndex.loadParams(spark, t)
    assert(rres)
    assert(rc.map(_.toSeq) === cents.map(_.toSeq))
    assert(rb.map(_.map(_.toSeq)) === books.map(_.map(_.toSeq)))
  }

  test("incremental append with the frozen quantizer equals one-shot build") {
    // production growth path: quantizer trained once (on the first
    // half here), corpus arrives in batches. build(half)+append(rest)
    // must index exactly what build(full) indexes under the SAME
    // frozen params — searches are then identical.
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val books = Similarity.deriveIvfPqCodebooks(emb, "vec_id", "embedding",
      cents, m = 4, kCodes = 16, residual = true)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    val tInc = s"graft_annidx_inc_${System.nanoTime()}"
    AnnIndex.build(spark, tInc, half, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16,
      centroids = Some(cents), codebooks = Some(books))
    AnnIndex.append(spark, tInc, rest, "vec_id", "embedding")
    val tFull = s"graft_annidx_full_${System.nanoTime()}"
    AnnIndex.build(spark, tFull, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16,
      centroids = Some(cents), codebooks = Some(books))
    // stored codes identical (order-free)
    def codes(t: String) = spark.table(t).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq)).toSet
    assert(codes(tInc) === codes(tFull))
    // and the search surface agrees
    assert(resultSet(AnnIndex.search(spark, tInc, queries,
        "vec_id", "embedding", k = 3, nprobe = 2)) ===
      resultSet(AnnIndex.search(spark, tFull, queries,
        "vec_id", "embedding", k = 3, nprobe = 2)))
  }

  test("rebuild overwrites; non-residual variant round-trips too") {
    val t = s"graft_annidx_rebuild_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = false)
    val (_, _, res0) = AnnIndex.loadParams(spark, t)
    assert(!res0)
    val raw = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val inlineRaw = resultSet(Similarity.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16, residual = false))
    assert(raw === inlineRaw)
    // rebuild with residual encoding — the stored index must flip whole
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = true)
    val (_, _, res1) = AnnIndex.loadParams(spark, t)
    assert(res1)
    val resid = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val inlineResid = resultSet(Similarity.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16, residual = true))
    assert(resid === inlineResid)
  }

  test("gate e07/e08 steady state is retrieval-only — no rebuild, no rewrite") {
    // r7 exposed that the noop sink roughly doubled e04/e06 times; this
    // pins that the honest cost is OUTPUT EVALUATION, not per-query
    // centroid/PQ work sneaking back inline: after the first (memoized,
    // build-inclusive) invocation, repeat gate runs must leave every
    // index file byte-identical and spend only a retrieval-sized job
    // count (a rebuild's encode+write+params family is ~10 extra jobs).
    val q = graft.SparkEntry.queries
    q("e07_ann_ivfpq")(spark, sf).collect() // warm: builds on first use
    val tables = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_ann_ivfpq_"))
    assert(tables.nonEmpty, "memoized index table missing after warmup")
    def snapshot(): Map[String, (Long, Long)] = tables.flatMap { t =>
      val loc = java.nio.file.Paths.get(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString ->
          (java.nio.file.Files.size(p),
           java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toList
    }.toMap
    val before = snapshot()
    assert(before.nonEmpty)
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
        // async listener bus: poll until the count is stable
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
    val j07 = jobsOf(q("e07_ann_ivfpq")(spark, sf).collect())
    val j08 = jobsOf(q("e08_ann_rerank")(spark, sf).collect())
    assert(snapshot() === before,
      "index files changed during steady-state search — a rebuild sneaked inline")
    // retrieval = params collect + probe collect + result (few AQE
    // stages); generous ceiling still far below build-inclusive runs
    assert(j07 <= 12, s"e07 steady-state ran $j07 jobs — rebuild-sized")
    assert(j08 <= 16, s"e08 steady-state ran $j08 jobs — rebuild-sized")
    info(s"steady-state job counts: e07=$j07 e08=$j08 (build adds ~10)")
  }

  test("trained-quantizer index (e10): recall floor, trained >= seeded, serve path") {
    // the r8 verdict's Next #3: trainPqCodebooks had no production
    // caller — this pins the trained quantizer THROUGH the persisted
    // index lifecycle (train on sample → freeze into params sidecar →
    // serve), with the recall claims that justify training at all
    val sp = spark
    import sp.implicits._
    val dim = 64; val clusters = 4; val per = 60
    val vecs = (0 until clusters * per).map { i =>
      val c = i / per
      val v = Array.tabulate(dim)(d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 37 + d * 13) % 7 - 3) * 0.1f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") % per === 3)
    val truth = Similarity.bruteForceTopK(qs, vecs, "vec_id", "embedding", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val hits = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      hits.sum / hits.size
    }
    def buildAndSearch(trained: Boolean): Double = {
      val t = s"graft_annidx_tq_${trained}_${System.nanoTime()}"
      val (cents, books) =
        if (trained) {
          val c = Similarity.trainCentroids(
            vecs, "vec_id", "embedding", nlist = 8, iters = 5)
          val b = Similarity.trainPqCodebooks(
            Similarity.ivfResiduals(vecs, "vec_id", "embedding", c),
            "vec_id", "rv", m = 4, k = 16, iters = 5)
          (Some(c), Some(b))
        } else (None, None)
      AnnIndex.build(spark, t, vecs, "vec_id", "embedding", nlist = 8,
        m = 4, kCodes = 16, residual = true,
        centroids = cents, codebooks = books)
      recall(AnnIndex.search(spark, t, qs, "vec_id", "embedding",
        k = 5, nprobe = 2))
    }
    val seeded = buildAndSearch(trained = false)
    val trained = buildAndSearch(trained = true)
    info(s"persisted-index recall@5: seeded=$seeded trained=$trained")
    assert(trained >= seeded,
      s"trained-quantizer recall $trained < seeded $seeded")
    assert(trained >= 0.7, s"trained-quantizer recall only $trained")
  }

  test("gate corpus: trained quantizer beats both seeded variants by a margin (e09)") {
    // e09 SURFACES the trained-vs-seeded recall numbers; this pins
    // them as a FLOOR so a codebook/k-means regression fails red
    // instead of quietly shipping a worse quantizer. Same-budget
    // comparison (cells, codes, nprobe) on the driver's own corpus.
    val rec = graft.SparkEntry.queries("e09_ann_recall")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    info(s"gate-corpus recall@3: $rec")
    val trained = rec("ivfpq_trained")
    val seededBest = math.max(rec("ivfpq_residual"), rec("ivfpq_raw"))
    assert(trained >= seededBest + 0.05,
      s"trained recall $trained no longer clears the seeded " +
        s"quantizers ($seededBest) by the 0.05 margin — codebook " +
        "training regressed")
  }

  test("exhaustive-probe equality contract (e04/e09/e10): nprobe=nlist " +
      "and full-depth rerank EQUAL the brute-force oracle") {
    // The rows-only gates are guarded by recall FLOORS (thresholds);
    // this arm makes the underlying machinery an EQUALITY contract at
    // test scale: with every cell probed, IVF-flat — seeded or
    // Lloyd's-trained — scores every candidate by the same rounded
    // exact cosine and the same (cos desc, id asc) tie-break as the
    // brute-force oracle, so the result must be IDENTICAL rows (ids,
    // scores, ranks), not merely high-recall. Likewise the trained
    // persisted IVF-PQ index serving at full retrieval depth feeds an
    // exact rerank: quantization may permute the CANDIDATE order, but
    // with all candidates retrieved the exact pass must reproduce the
    // oracle bit-for-bit. The e09 recall formula over an exhaustive
    // result must then compute exactly 1.0 — equality at n≤10k
    // alongside the scale floors that keep guarding the approximate
    // (nprobe<nlist) configurations.
    val k = 3
    val truth = resultSet(Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k))
    val seeded = resultSet(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", k, nlist = 16, nprobe = 16))
    assert(seeded === truth,
      "seeded IVF-flat with every cell probed diverged from brute force")
    val cents = Similarity.trainCentroids(
      emb, "vec_id", "embedding", nlist = 16, iters = 2)
    val trained = resultSet(Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", k, nlist = 16, nprobe = 16,
      centroids = Some(cents)))
    assert(trained === truth,
      "trained IVF-flat (e04 family) with every cell probed diverged " +
        "from brute force")
    // trained persisted IVF-PQ at full depth + exact rerank (e08/e10)
    val n = emb.count().toInt
    val books = Similarity.trainPqCodebooks(
      Similarity.ivfResiduals(emb, "vec_id", "embedding", cents),
      "vec_id", "rv", m = 4, k = 16, iters = 2)
    val t = s"graft_annidx_exh_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding", nlist = 16,
      m = 4, kCodes = 16, residual = true,
      centroids = Some(cents), codebooks = Some(books))
    val cands = AnnIndex.search(spark, t, queries, "vec_id", "embedding",
      k = n, nprobe = 16)
    val reranked = resultSet(Similarity.rerankTopK(
      queries, emb, cands, "vec_id", "embedding", k))
    assert(reranked === truth,
      "full-depth retrieve + exact rerank through the trained " +
        "persisted index diverged from brute force")
    // and the e09 recall FORMULA over an exhaustive result is exactly
    // 1.0 — the join/agg recall computation itself is verified, so the
    // gate's floors measure retrieval quality, not formula drift
    val truthDf = Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val got = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k, nlist = 16, nprobe = 16)
      .select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1))
    val recall = truthDf.join(got, Seq("query_id", "neighbor_id"), "left")
      .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("r"))
      .head().getDouble(0)
    assert(recall === 1.0,
      s"e09's recall formula computed $recall over an exhaustive " +
        "result — the formula, not retrieval, is wrong")
  }

  test("fused quantizer derivation is bit-identical to the unfused pair") {
    // build's bootstrap path: ONE head collect + driver math must give
    // exactly what ivfCentroids + deriveIvfPqCodebooks's three
    // driver-sequential jobs gave — same floats, not just same recall
    for (residual <- Seq(true, false)) {
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
      val books = Similarity.deriveIvfPqCodebooks(emb, "vec_id",
        "embedding", cents, m = 4, kCodes = 16, residual = residual)
      val (fc, fb) = Similarity.deriveIvfQuantizer(emb, "vec_id",
        "embedding", nlist = 16, m = 4, kCodes = 16, residual = residual)
      assert(fc.map(_.toSeq) === cents.map(_.toSeq),
        s"centroids diverged (residual=$residual)")
      assert(fb.map(_.map(_.toSeq)) === books.map(_.map(_.toSeq)),
        s"codebooks diverged (residual=$residual)")
    }
    // fallback arm: a head made ENTIRELY of centroid duplicates has
    // zero residuals everywhere — seeds must then come from the first
    // kCodes nonzero residuals of the FULL corpus, identically in
    // both derivations
    val sp = spark
    import sp.implicits._
    val dim = 8; val nlist = 4; val kCodes = 4
    val base = (0 until nlist).map(c =>
      Array.tabulate(dim)(d => if (d == c) 1.0f else 0.0f))
    val dup = (0 until nlist + kCodes).map(i => (i.toLong, base(i % nlist).toSeq))
    val tail = (0 until 8).map(i => ((nlist + kCodes + i).toLong,
      Array.tabulate(dim)(d => (i * 7 + d * 3) % 5 * 0.25f + 0.1f).toSeq))
    val corpus = (dup ++ tail).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", nlist)
    val books = Similarity.deriveIvfPqCodebooks(corpus, "vec_id",
      "embedding", cents, m = 2, kCodes = kCodes, residual = true)
    val (fc, fb) = Similarity.deriveIvfQuantizer(corpus, "vec_id",
      "embedding", nlist = nlist, m = 2, kCodes = kCodes, residual = true)
    assert(fc.map(_.toSeq) === cents.map(_.toSeq))
    assert(fb.map(_.map(_.toSeq)) === books.map(_.map(_.toSeq)),
      "fallback arm (zero-residual head) diverged")
  }

  test("rebuild after a compact torn BEFORE drop/recreate starts clean " +
      "on disk — no inherited marker, no inherited stage") {
    // the predecessor's _compacting marker and _compact_stage live
    // BESIDE the table directory and survive DROP TABLE; a same-name
    // rebuild must delete them or its searches either fail loud
    // forever (incomplete stage) or get their fresh cells silently
    // overwritten by the predecessor's staged codes
    val t = s"graft_annidx_slate_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = true)
    val (stage, marker, fs) = AnnIndex.compactPaths(spark, t)

    // arm 1: crash with a COMPLETE stage (worst case: a silent
    // dynamic-partition overwrite of the successor's cells) — stage
    // the residual-encoded copy, then tear before the overwrite
    spark.table(t).repartition(col("cell"))
      .write.format("parquet").partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, AnnIndex.StageComplete),
      true).close()
    fs.create(marker, true).close()
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE ${t}_params")
    // rebuild under the same name with a DIFFERENT quantizer: if the
    // stale stage were replayed, residual codes would overwrite
    // non-residual cells — detectably wrong distances
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = false)
    assert(!fs.exists(marker), "rebuild inherited the predecessor's marker")
    assert(!fs.exists(stage), "rebuild inherited the predecessor's stage")
    val served = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(served === resultSet(Similarity.ivfPqTopK(queries, emb,
        "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2,
        m = 4, kCodes = 16, residual = false)),
      "rebuild after a torn predecessor served predecessor state")

    // arm 2: crash with an INCOMPLETE stage (no sentinel) — without
    // the clean slate every post-rebuild search throws the fail-loud
    // error forever even though the rebuild already repaired the index
    fs.delete(stage, true)
    fs.mkdirs(stage) // torn mid-write: directory exists, no sentinel
    fs.create(marker, true).close()
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE ${t}_params")
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = true)
    assert(!fs.exists(marker) && !fs.exists(stage))
    val healedFree = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2)) // must not throw
    assert(healedFree.nonEmpty)

    // arm 3: the one instant the two sweeps cannot cover — a rebuild
    // crashed AFTER its index write but BEFORE the post-write sweep
    // (live table, NO params sidecar yet, predecessor's complete
    // marker+stage beside it). The heal must REFUSE (a table without
    // params is mid-build by construction; replaying the stage would
    // graft predecessor codes onto the fresh cells) and name the
    // repair — which then works
    spark.table(t).repartition(col("cell"))
      .write.format("parquet").partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, AnnIndex.StageComplete),
      true).close()
    fs.create(marker, true).close()
    spark.sql(s"DROP TABLE ${t}_params") // mid-build: params not yet written
    AnnIndex.dropCaches(spark, t)
    val ex = intercept[IllegalStateException] {
      AnnIndex.search(spark, t, queries, "vec_id", "embedding",
        k = 3, nprobe = 2).collect()
    }
    assert(ex.getMessage.contains("mid-build"),
      s"wrong failure for the mid-build window: ${ex.getMessage}")
    assert(fs.exists(marker) && fs.exists(stage),
      "the refused heal must leave the crash state for build's sweep")
    // the named repair restores service
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = true)
    assert(!fs.exists(marker) && !fs.exists(stage))
    assert(resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2)).nonEmpty)

    // arm 4 (r14): a REBUILD crashed between its index overwrite and
    // its params write — NO marker, NO stage, clean predecessor. The
    // pre-fix ordering left fresh codes beside the PREDECESSOR's
    // sidecar: nothing refused, search silently decoded with the
    // wrong quantizer. build now drops the sidecar BEFORE the index
    // overwrite, so this crash leaves exactly the state below — and
    // it must fail LOUD on the serving path (no marker for the heal
    // guard to see), naming the repair
    spark.sql(s"DROP TABLE ${t}_params")
    AnnIndex.dropCaches(spark, t) // a memoized quantizer would mask it
    val exRebuild = intercept[IllegalStateException] {
      AnnIndex.search(spark, t, queries, "vec_id", "embedding",
        k = 3, nprobe = 2).collect()
    }
    assert(exRebuild.getMessage.contains("Rerun AnnIndex.build"),
      s"wrong failure for the torn-rebuild window: ${exRebuild.getMessage}")
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = true)
    assert(resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2)).nonEmpty)
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE ${t}_params")
    AnnIndex.dropCaches(spark, t)
  }

  test("a torn compact overwrite heals on the next search; no marker, no cost") {
    val t = s"graft_annidx_heal_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16)
    val before = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))

    // replay compact's crash window by hand: stage the compacted
    // copy, write the durable marker (intent: overwrite begins), then
    // TEAR the overwrite — drop one cell partition from the live
    // table, the exact silent-truncation failure the marker exists to
    // catch — and "crash" before the marker is cleared
    val (stage, marker, fs) = AnnIndex.compactPaths(spark, t)
    spark.table(t).repartition(col("cell"))
      .write.format("parquet").partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, AnnIndex.StageComplete),
      true).close() // compact's own completeness proof, not _SUCCESS
    fs.create(marker, true).close()
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location)
    val victim = fs.listStatus(loc)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .head.getPath
    fs.delete(victim, true)
    spark.catalog.refreshTable(t)

    // next query heals: the redo restores the lost cell partition and
    // clears the marker/stage; results match the pre-crash index
    val healed = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(healed === before, "torn overwrite served different results")
    assert(!fs.exists(marker) && !fs.exists(stage),
      "heal did not clear the marker/stage")
    assert(fs.exists(victim), "lost cell partition was not restored")

    // fail-loud arm: a marker with NO complete staged copy cannot come
    // from the compact lifecycle — serving would risk silent
    // truncation, so search must refuse with a rebuild pointer
    fs.create(marker, true).close()
    val ex = intercept[IllegalStateException] {
      AnnIndex.search(spark, t, queries, "vec_id", "embedding",
        k = 3, nprobe = 2).collect()
    }
    assert(ex.getMessage.contains("rerun AnnIndex.build"))
    fs.delete(marker, false)
  }

  test("memoized serve path: drop/recreate is never served stale " +
      "state; a torn compact still heals through the cache") {
    // recoverCompacting's fast path and loadParams are memoized per
    // table name (one fs.exists per search, no catalog RPC, no params
    // read job). The memos are refreshed write-through by build, so a
    // drop-and-recreate UNDER THE SAME NAME — the classic stale-cache
    // trap (the IncrementalLsh r11 lesson) — must serve the new
    // incarnation's quantizer and heal against the new location.
    val t = s"graft_annidx_memo_${System.nanoTime()}"
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = true)
    // warm every memo through a real search
    val first = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(first.nonEmpty)

    // drop and recreate the same name with a DIFFERENT quantizer
    // (non-residual): stale params would produce residual-encoded
    // distances against non-residual codes — detectably wrong
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE ${t}_params")
    AnnIndex.build(spark, t, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = false)
    val (_, _, residualFlag) = AnnIndex.loadParams(spark, t)
    assert(!residualFlag, "rebuild served the predecessor's memoized params")
    val recreated = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val oneShot = resultSet(Similarity.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16, residual = false))
    assert(recreated === oneShot,
      "post-recreate search diverged from the one-shot plan — stale memo")

    // now tear a compact on the RECREATED table and search again: the
    // heal must fire through the memoized probe (exists → fresh
    // re-resolve → redo) and restore the lost cell partition
    val (stage, marker, fs) = AnnIndex.compactPaths(spark, t)
    spark.table(t).repartition(col("cell"))
      .write.format("parquet").partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, AnnIndex.StageComplete),
      true).close()
    fs.create(marker, true).close()
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location)
    val victim = fs.listStatus(loc)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .head.getPath
    fs.delete(victim, true)
    spark.catalog.refreshTable(t)
    val healed = resultSet(AnnIndex.search(spark, t, queries,
      "vec_id", "embedding", k = 3, nprobe = 2))
    assert(healed === recreated, "heal through the memoized path diverged")
    assert(!fs.exists(marker) && !fs.exists(stage) && fs.exists(victim))

    // cache hygiene for per-run tables (the long-lived-driver leak
    // class): dropCaches is the documented eviction hook
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE ${t}_params")
    AnnIndex.dropCaches(spark, t)
  }
}

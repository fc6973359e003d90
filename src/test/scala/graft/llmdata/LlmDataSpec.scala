package graft.llmdata

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LlmDataSpec extends SparkSpec {

  private lazy val docs = {
    val sp = spark
    import sp.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0"),
      (1L, "the quick brown fox jumps over the lazy cat", "en", "src1"),
      (2L, "completely different text about spark engines", "en", "src2"),
      (3L, "the quick brown fox jumps over the lazy dog", "en", "src3"), // dup of 0
      (4L, "zzz", "xx", "src4"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  test("fingerprint equals the reference polynomial") {
    val got = docs.filter(col("doc_id") === 4)
      .select(TextFunctions.fingerprint(col("text"))).collect()(0).getLong(0)
    val expected = "zzz".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    assert(got === expected)
    // identical texts → identical fingerprints
    val fps = docs.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) === fps(3L))
    assert(fps(0L) !== fps(1L))
  }

  test("custom codegen expressions match the built-in formulations") {
    val mismatches = docs.select(
      (TextFunctions.stringHash(col("text")) =!=
        TextFunctions.stringHashBuiltin(col("text"))).as("hash_diff"),
      (DedupFunctions.minhashSignature(
        DedupFunctions.tokenHashes(col("text")), 8) =!=
        DedupFunctions.minhashSignatureBuiltin(
          DedupFunctions.tokenHashes(col("text")), 8)).as("sig_diff"))
      .filter(col("hash_diff") || col("sig_diff"))
    assert(mismatches.count() === 0)
  }

  test("sig_match_count kernel ≡ aggregate(zip_with(...)) builtin") {
    val sp = spark
    import sp.implicits._
    // edges: identical, disjoint, partial, LENGTH MISMATCH (zip_with
    // null-pads — extra positions contribute 0), null element, null
    // array (both sides NULL out)
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L, 3L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L, 4L)),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (null, Seq[java.lang.Long](1L, 2L)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      graft.functions.HashExpressions
        .sigMatchCount(col("a"), col("b")).as("kernel"),
      DedupFunctions.sigMatchCountBuiltin(col("a"), col("b"))
        .as("builtin")).collect()
    out.zip(rows).foreach { case (r, src) =>
      assert(r.get(0) == r.get(1),
        s"sig_match_count diverged on $src: kernel=${r.get(0)} " +
          s"builtin=${r.get(1)}")
    }
    // and over the real pair frame: matching via kernel equals builtin
    val sigs = docs.select(col("doc_id"),
      DedupFunctions.minhashSignature(
        DedupFunctions.tokenHashes(col("text")), 8).as("sig"))
    val a = sigs.toDF("doc_a", "siga")
    val b = sigs.toDF("doc_b", "sigb")
    val pairs = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
    val diff = pairs.filter(
      graft.functions.HashExpressions.sigMatchCount(
        col("siga"), col("sigb")) =!=
        DedupFunctions.sigMatchCountBuiltin(col("siga"), col("sigb")))
    assert(diff.count() === 0)
  }

  test("argmax language classifier separates marker vocabularies") {
    val sp = spark
    import sp.implicits._
    val texts = Seq(
      (1L, "the cat sat on the mat and the dog barked at the moon"),
      (2L, "der hund und die katze sind nicht im haus das ist gut und schoen"),
      (3L, "le chat est dans la maison et le chien est dans les jardins"),
      (4L, "zzz qqq www xxx yyy"))
      .toDF("id", "text")
    val out = texts.select(col("id"),
      TextFunctions.langIdArgmax(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "unknown"))
  }

  test("quality score is bounded and favors stopword-bearing prose") {
    val scores = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(scores(0L) > scores(4L)) // real sentence beats "zzz"
  }

  test("minhash: identical docs share signatures; near-dups collide in LSH") {
    val th = docs.select(col("doc_id"),
      transform(DedupFunctions.bigramShingles(col("text")),
        s => TextFunctions.stringHash(s)).as("th"))
      .filter(size(col("th")) > 0)
    val sigs = th.select(col("doc_id"),
      DedupFunctions.minhashSignature(col("th"), 8).as("sig"))
    val sigMap = sigs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigMap(0L) === sigMap(3L)) // exact dup → identical signature
    val pairs = DedupFunctions.lshCandidates(sigs, "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup always a candidate
    assert(!pairs.contains((0L, 2L)) || sigMap(0L) != sigMap(2L))
  }

  test("simhash: near-dups are close in hamming distance, unrelated far") {
    // codegen kernel ≡ builtin HOF formulation
    val twin = docs.select(
      DedupFunctions.simhash16(DedupFunctions.tokenHashes(col("text")))
        .as("kernel"),
      DedupFunctions.simhash16Builtin(DedupFunctions.tokenHashes(col("text")))
        .as("builtin"))
    assert(twin.filter(col("kernel") =!= col("builtin")).count() === 0)
    val sim = docs.select(col("doc_id"),
      DedupFunctions.simhash16(DedupFunctions.tokenHashes(col("text")))
        .as("sh")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def hamming(a: Int, b: Int) = Integer.bitCount(a ^ b)
    assert(hamming(sim(0L), sim(3L)) === 0)
    assert(hamming(sim(0L), sim(1L)) < hamming(sim(0L), sim(2L)))
  }

  test("simhash64: packed long ≡ band array; exact dup → hamming 0") {
    // codegen kernel ≡ builtin HOF formulation (the oracle-matched twin)
    val twin = docs.select(
      DedupFunctions.simhash64Bands(DedupFunctions.tokenHashes(col("text")))
        .as("kernel"),
      DedupFunctions.simhash64BandsBuiltin(
        DedupFunctions.tokenHashes(col("text"))).as("builtin"))
    assert(twin.filter(col("kernel") =!= col("builtin")).count() === 0)
    val sigs = docs.select(col("doc_id"),
      DedupFunctions.simhash64Bands(DedupFunctions.tokenHashes(col("text")))
        .as("bands"),
      DedupFunctions.simhash64(DedupFunctions.tokenHashes(col("text")))
        .as("packed")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getLong(2))).toMap
    // every band value fits 16 bits, and re-packing the bands yields
    // the packed long (band j = bits [16j, 16j+16))
    sigs.values.foreach { case (bands, packed) =>
      assert(bands.size === 4)
      bands.foreach(bv => assert(bv >= 0 && bv < 65536))
      val repacked = bands.zipWithIndex
        .map { case (bv, j) => bv.toLong << (16 * j) }.sum
      assert(repacked === packed)
    }
    // hamming via per-band bit_count sum == bit_count of the packed xor
    def bandHamming(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    for (i <- sigs.keys; j <- sigs.keys if i < j)
      assert(bandHamming(sigs(i)._1, sigs(j)._1) ===
        java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2))
    // doc 3 is an exact dup of doc 0 → identical fingerprint; the
    // near-dup (1) stays closer than the unrelated doc (2)
    assert(bandHamming(sigs(0L)._1, sigs(3L)._1) === 0)
    assert(bandHamming(sigs(0L)._1, sigs(1L)._1) <
      bandHamming(sigs(0L)._1, sigs(2L)._1))
  }

  test("brute-force cosine top-k finds the duplicate vector first") {
    val sp = spark
    import sp.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", 2)
      .collect()
    assert(top(0).getAs[Long]("neighbor_id") === 1L)
    assert(top(0).getAs[Double]("cos") === 1.0)
    assert(top(1).getAs[Long]("neighbor_id") === 3L)
  }

  test("multimodal: mapPartitions decoder ≡ plan-side expression stub") {
    val sp = spark
    import sp.implicits._
    val viaPartitions = Multimodal.extractFeatures(Multimodal.ingest(docs))
      .toDF().orderBy("doc_id").collect()
    val viaColumns = docs.select(
      col("doc_id"),
      concat(lit("fake/"), col("source")).as("format"),
      length(col("text")).cast("long").as("n_bytes"),
      (lit(100) + ascii(col("text")) % 64).as("width"),
      (lit(100) + ascii(substring(col("text"), 2, 1)) % 64).as("height"),
      lit(3).as("channels"),
      floor(length(col("text")) / lit(100)).cast("int").as("frames"),
      md5(col("text")).as("checksum")).orderBy("doc_id").collect()
    viaPartitions.zip(viaColumns).foreach { case (a, b) =>
      assert(a.getAs[Int]("width") === b.getAs[Int]("width"))
      assert(a.getAs[Int]("height") === b.getAs[Int]("height"))
      assert(a.getAs[Int]("frames") === b.getAs[Int]("frames"))
      assert(a.getAs[String]("checksum") === b.getAs[String]("checksum"))
    }
    // frame sampling plumbing: zero-frame assets emit zero rows...
    val frames = Multimodal.sampleFrames(
      Multimodal.extractFeatures(Multimodal.ingest(docs)).toDF(), 2)
    assert(frames.count() === 0) // all fixture docs are < 100 bytes
    // ...and a 5-frame asset sampled at stride 2 yields frames 0,2,4
    val synth = Seq((9L, 5)).toDF("doc_id", "frames")
    assert(Multimodal.sampleFrames(synth, 2).select("frame_idx")
      .collect().map(_.getInt(0)).toSeq === Seq(0, 2, 4))
    // resize: aspect-preserving fit into maxDim
    val dims = Seq((1L, 160, 120), (2L, 50, 40)).toDF("doc_id", "width", "height")
    val rs = Multimodal.resize(dims, 80).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("resized_width"), r.getAs[Int]("resized_height"))).toMap
    assert(rs(1L) === ((80, 60))) // scaled by 0.5
    assert(rs(2L) === ((50, 40))) // already fits — no upscale
  }

  test("dd02 LSH prefilter: a skewed same-length block stays bounded, near-dups survive") {
    val sp = spark
    import sp.implicits._
    // 200 same-language documents with IDENTICAL length but mutually
    // dissimilar content — exact (lang, n_chars) blocking would compare
    // all 19,900 pairs; band collisions compare only real look-alikes
    val filler = (0 until 200).map { i =>
      (i.toLong, f"w$i%03da w$i%03db w$i%03dc w$i%03dd w$i%03de", "en")
    }
    val nearDups = Seq(
      (900L, "the quick brown fox jumps over the lazy dog tonight", "en"),
      (901L, "the quick brown fox jumps over the lazy dog today", "en"))
    val docs = (filler ++ nearDups).toDF("doc_id", "text", "lang")
    val pairs = DedupFunctions.ngramJaccardLsh(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the genuine near-dup pair is found with high exact Jaccard…
    assert(pairs.contains((900L, 901L)))
    assert(pairs((900L, 901L)) > 0.7)
    // …and the hot block did NOT go quadratic: candidates stay a tiny
    // fraction of the 19.9k same-length pairs
    assert(pairs.size < 100, s"candidate blowup: ${pairs.size} pairs")
  }

  test("IVF trained centroids: recall@k ≥ first-nlist baseline on clustered data") {
    // The failure mode IVF training exists for: data with cluster
    // structure, stored cluster-major — the first-nlist quantizer takes
    // all its centroids from cluster 0 and lumps every other cluster
    // into noise-shaped cells. Lloyd's recovers the true clusters.
    // (On uniform-random vectors, like the synthetic embeddings table,
    // every quantizer is equivalent and training is a no-op by design.)
    val sp = spark
    import sp.implicits._
    val dim = 16; val clusters = 8; val per = 40
    val vecs = (0 until clusters * per).map { i =>
      val c = i / per
      val v = Array.tabulate(dim)(d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 37 + d * 13) % 7 - 3) * 0.1f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % per === 3) // one per cluster
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSets(
      Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5))
    def recall(ivf: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) =>
        ivf.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      hits.sum / hits.size
    }
    val untrained = recall(topSets(Similarity.ivfTopK(
      queries, vecs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2)))
    val trained = Similarity.trainCentroids(
      vecs, "vec_id", "embedding", nlist = 16, iters = 5)
    val withTrained = recall(topSets(Similarity.ivfTopK(
      queries, vecs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2,
      centroids = Some(trained))))
    assert(withTrained >= untrained,
      s"trained recall $withTrained < untrained $untrained")
    // with cells matching true clusters, 2-of-16 probes must be enough
    assert(withTrained >= 0.9, s"trained recall only $withTrained")

    // sample-based training: the cached training frame is the SAMPLE,
    // not the corpus (the 100 TB property — Lloyd's cost is O(cap),
    // assignment stays full-corpus), and a half-corpus sample still
    // recovers the cluster structure
    val sample = Similarity.trainingSample(vecs, "vec_id", 160L)
    val sn = sample.count()
    assert(sn <= 240 && sn >= 80, s"sample not bounded near cap: $sn")
    assert(Similarity.trainingSample(vecs, "vec_id", 1000L).count()
      === vecs.count(), "under-cap corpus must pass through whole")
    // n barely above cap: ceil pushes the hex cutoff to 65536 ("10000",
    // 5 chars) whose lexicographic compare would silently keep ~1/16 —
    // the clamp must pass the corpus through whole instead
    val n = vecs.count()
    assert(Similarity.trainingSample(vecs, "vec_id", n - 1).count() === n,
      "cutoff-overflow clamp must keep ~the whole corpus")
    val sampled = Similarity.trainCentroids(
      vecs, "vec_id", "embedding", nlist = 16, iters = 5, sampleCap = 160L)
    val withSampled = recall(topSets(Similarity.ivfTopK(
      queries, vecs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2,
      centroids = Some(sampled))))
    assert(withSampled >= untrained,
      s"sample-trained recall $withSampled < untrained $untrained")
    // determinism: same cap → bit-identical centroids
    val again = Similarity.trainCentroids(
      vecs, "vec_id", "embedding", nlist = 16, iters = 5, sampleCap = 160L)
    assert(sampled.map(_.toSeq) === again.map(_.toSeq))
  }

  test("PQ: duplicate vector ranks first, codes bounded, encode shuffle-free") {
    val sp = spark
    import sp.implicits._
    // 20 distinct dim-8 vectors; 18 duplicates 3 exactly
    val vecs = (0L until 20L).map { i =>
      val src = if (i == 18L) 3L else i
      (i, Array.tabulate(8)(d => (((src * 7 + d * 3) % 11) + src % 5).toFloat))
    }.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 8)
    assert(books.size === 4 && books.forall(_.size === 8) &&
      books.forall(_.forall(_.length === 2)))
    val encoded = Similarity.pqEncode(vecs, "vec_id", "embedding", books)
    encoded.collect().foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.size === 4 && codes.forall(c => c >= 0 && c < 8))
    }
    // encode is a pure projection — the 100 TB property
    assert(!encoded.queryExecution.executedPlan.toString.contains("Exchange"),
      encoded.queryExecution.executedPlan.toString.take(2000))
    // ADC of an exact duplicate hits the per-subspace minimum in every
    // table → globally minimal distance → rank 1
    val top = Similarity.pqTopK(vecs.filter(col("vec_id") === 18),
      vecs, "vec_id", "embedding", k = 3, m = 4, kCodes = 8).collect()
    assert(top(0).getAs[Long]("neighbor_id") === 3L,
      top.map(r => (r.getLong(1), r.getDouble(2))).mkString(","))
  }

  test("PQ: trained codebooks and residual encoding lift recall on clustered data") {
    // Same failure mode as IVF first-nlist seeding, one level down:
    // seeded codebooks take every entry from cluster 0, so other
    // clusters' subvectors all quantize to far-off codes. Lloyd's per
    // subspace recovers codebook entries shaped like the data; residual
    // encoding (IVFADC) removes the cluster offset entirely, so even
    // cluster-0-seeded codebooks describe every cell's residuals.
    val sp = spark
    import sp.implicits._
    val dim = 16; val clusters = 8; val per = 40
    val vecs = (0 until clusters * per).map { i =>
      val c = i / per
      val v = Array.tabulate(dim)(d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 37 + d * 13) % 7 - 3) * 0.1f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % per === 3)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSets(
      Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      hits.sum / hits.size
    }
    // flat PQ: Lloyd's-trained codebooks ≥ first-k seeded
    val seeded = recall(topSets(Similarity.pqTopK(
      queries, vecs, "vec_id", "embedding", k = 5, m = 4, kCodes = 16)))
    val books = Similarity.trainPqCodebooks(
      vecs, "vec_id", "embedding", m = 4, k = 16, iters = 5)
    val trained = recall(topSets(Similarity.pqTopK(
      queries, vecs, "vec_id", "embedding", k = 5, m = 4, kCodes = 16,
      codebooks = Some(books))))
    assert(trained >= seeded, s"trained PQ recall $trained < seeded $seeded")
    assert(trained >= 0.5, s"trained PQ recall only $trained")
    // determinism: retraining is bit-identical (md5 sample, no RNG)
    val again = Similarity.trainPqCodebooks(
      vecs, "vec_id", "embedding", m = 4, k = 16, iters = 5)
    assert(books.map(_.map(_.toSeq)) === again.map(_.map(_.toSeq)))

    // IVF-PQ: residual (IVFADC) encoding ≥ raw-vector encoding at the
    // same cells/codebook budget — the Jégou §IV variance argument
    val cents = Similarity.trainCentroids(
      vecs, "vec_id", "embedding", nlist = 16, iters = 5)
    val raw = recall(topSets(Similarity.ivfPqTopK(
      queries, vecs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16, centroids = Some(cents), residual = false)))
    val resid = recall(topSets(Similarity.ivfPqTopK(
      queries, vecs, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16, centroids = Some(cents))))
    assert(resid >= raw, s"residual recall $resid < raw $raw")
    assert(resid >= 0.7, s"residual recall only $resid")
  }

  test("two-stage re-rank: exact pass ≥ ADC-only recall from the same index") {
    val sp = spark
    import sp.implicits._
    val dim = 16; val clusters = 8; val per = 40
    val vecs = (0 until clusters * per).map { i =>
      val c = i / per
      val v = Array.tabulate(dim)(d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 37 + d * 13) % 7 - 3) * 0.1f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % per === 3)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSets(
      Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      hits.sum / hits.size
    }
    val cents = Similarity.trainCentroids(
      vecs, "vec_id", "embedding", nlist = 16, iters = 5)
    def ivfpq(k: Int) = Similarity.ivfPqTopK(
      queries, vecs, "vec_id", "embedding", k = k, nlist = 16, nprobe = 2,
      m = 4, kCodes = 16, centroids = Some(cents))
    val adcOnly = recall(topSets(ivfpq(5)))
    // retrieve 4x wider with the index, then exact-re-rank to top 5:
    // quantization error at the ranking top is repaired by true scores
    val reranked = recall(topSets(Similarity.rerankTopK(
      queries, vecs, ivfpq(20), "vec_id", "embedding", 5)))
    assert(reranked >= adcOnly,
      s"re-ranked recall $reranked < ADC-only $adcOnly")
    assert(reranked >= 0.8, s"re-ranked recall only $reranked")
    // output contract matches the exact-search surface
    val df = Similarity.rerankTopK(queries, vecs, ivfpq(20),
      "vec_id", "embedding", 5)
    assert(df.columns.toSeq === Seq("query_id", "neighbor_id", "cos", "rank"))
    // a candidate set covering the whole corpus degrades to exact
    // brute-force — the re-rank stage itself is lossless
    val allCands = queries.select(col("vec_id").as("query_id"))
      .crossJoin(vecs.select(col("vec_id").as("neighbor_id")))
      .filter(col("query_id") =!= col("neighbor_id"))
    val exact = topSets(Similarity.rerankTopK(
      queries, vecs, allCands, "vec_id", "embedding", 5))
    assert(exact === truth)
  }

  test("LSH OR-amplification: multi-table recall ≥ single-table at fixed planes") {
    val sp = spark
    import sp.implicits._
    // clustered corpus with WIDE intra-cluster noise: near-neighbors
    // regularly land on opposite sides of some hyperplane, so a single
    // 8-plane table shatters true neighbor pairs across buckets (the
    // recall cliff); an independent plane family recovers pairs the
    // first one split
    val dim = 16; val clusters = 8; val per = 40
    val vecs = (0 until clusters * per).map { i =>
      val c = i / per
      val v = Array.tabulate(dim)(d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 131 + d * 57) % 97 - 48) * 0.15f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % per === 3)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSets(
      Similarity.bruteForceTopK(queries, vecs, "vec_id", "embedding", 5))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      hits.sum / hits.size
    }
    val one = recall(topSets(Similarity.lshTopK(
      queries, vecs, "vec_id", "embedding", k = 5, planes = 16, tables = 1)))
    val two = recall(topSets(Similarity.lshTopK(
      queries, vecs, "vec_id", "embedding", k = 5, planes = 16, tables = 2)))
    val four = recall(topSets(Similarity.lshTopK(
      queries, vecs, "vec_id", "embedding", k = 5, planes = 16, tables = 4)))
    assert(two >= one, s"2-table recall $two < 1-table $one")
    assert(four >= two, s"4-table recall $four < 2-table $two")
    assert(four > one, s"amplification flat: 1-table $one, 4-table $four")
    // schema is stable across table counts
    val df2 = Similarity.lshTopK(queries, vecs, "vec_id", "embedding",
      k = 5, planes = 8, tables = 2)
    assert(df2.columns.toSeq ===
      Seq("query_id", "bucket", "neighbor_id", "cos", "rank"))
    // the offset kernel matches the built-in HOF formulation per table
    val kernelVsHof = vecs.select(
      (graft.functions.VectorExpressions.lshBucketF(col("embedding"), 8, 8) =!=
        Similarity.lshBucket(col("embedding"), 8, 8)).as("diff"))
      .filter(col("diff"))
    assert(kernelVsHof.count() === 0)
  }

  test("IVF centroid seed works for sparse/offset id domains") {
    val sp = spark
    import sp.implicits._
    // ids start at 5000 and stride by 7 — NO id < nlist exists. The
    // seed must still produce nlist centroids (first rows in id order),
    // not an empty seq that NPEs in cents.head.
    val vecs = (0 until 64).map { i =>
      (5000L + i * 7, Array.tabulate(8)(d => (i * 31 + d) % 11 * 0.1f))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 4)
    assert(cents.size === 4)
    // in id order: cell 0 is the vector with the smallest id
    val first = vecs.orderBy(col("vec_id")).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    assert(cents.head.toSeq === first.toSeq)
    // empty corpus fails fast with a clear message
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfCentroids(vecs.filter(col("vec_id") < 0L),
        "vec_id", "embedding", 4)
    }
    assert(e.getMessage.contains("no rows"))
  }

  test("dd09 semantic dedup drops within-cell near-dups, keeps the smallest id") {
    val sp = spark
    import sp.implicits._
    val emb = Seq(
      (10L, Array(1f, 0f, 0f)),
      (11L, Array(1f, 0f, 0f)),    // identical to 10 → dropped
      (12L, Array(0f, 1f, 0f)),    // orthogonal → survives
      (13L, Array(0.9f, 0.1f, 0f)) // cos vs 10 ≈ 0.994 ≥ τ → dropped
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nlist = 2, tau = 0.95).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(10L -> true, 11L -> false, 12L -> true, 13L -> false))
    // an all-distinct corpus loses nothing
    val distinctEmb = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(distinctEmb, "vec_id", "embedding",
      nlist = 2, tau = 0.95).filter(col("keep")).count()
    assert(kept === 3L)
  }

  test("t15 CMS seam: count-min estimates bound the exact term counts") {
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val exact = terms.groupBy(col("term")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val eps = 0.01
    val bytes = terms
      .select(count_min_sketch(col("term"), lit(eps), lit(0.99), lit(42))
        .as("cms")).head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    exact.foreach { case (term, n) =>
      val est = cms.estimateCount(term)
      assert(est >= n, s"CMS underestimated '$term': $est < $n")
      assert(est <= n + math.ceil(eps * total).toLong,
        s"CMS overestimate for '$term' beyond eps bound: $est vs $n")
    }
  }

  test("t17 hash-embedding kernel matches the builtin HOF formulation") {
    import graft.functions.ShingleExpression.hashBucketCounts
    import graft.functions.HashExpressions
    val dim = 8
    // builtin twin: transform(range) × filter(size) over split tokens
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val builtin = transform(sequence(lit(0), lit(dim - 1)), i =>
      size(filter(toks, t =>
        pmod(TextFunctions.stringHashBuiltin(t), lit(dim.toLong)) ===
          i.cast("long"))).cast("long"))
    val mism = docs.select(
      (hashBucketCounts(col("text"), dim) =!= builtin).as("diff"))
      .filter(col("diff")).count()
    assert(mism === 0L)
    // scalar spot check: "zzz" lands in bucket polyHash("zzz") % 8
    val z = docs.filter(col("doc_id") === 4)
      .select(hashBucketCounts(col("text"), dim)).collect()(0)
      .getSeq[Long](0)
    val bucket = (HashExpressions.polyHashString("zzz") % dim).toInt
    assert(z(bucket) === 1L && z.sum === 1L)
  }

  test("t13 normalization equates case/punct/whitespace variants only") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      "Hello, World!", "hello   world", "HELLO WORLD.",
      "hello worlds").toDF("text")
      .select(TextFunctions.normalizeForDedup(col("text")).as("n"))
    val norms = df.collect().map(_.getString(0))
    assert(norms(0) === "hello world")
    assert(norms.take(3).distinct.length === 1)
    assert(norms(3) === "hello worlds") // not collapsed with the others
  }

  test("e09 recall gate: bounded, rerank repairs its own index's ADC error") {
    // the gate query that SURFACES retrieval quality — these bounds
    // reference the same numbers the driver artifact will carry
    val rows = graft.SparkEntry.queries("e09_ann_recall")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows.keySet === Set("lsh_or2", "ivfpq_residual", "ivfpq_raw",
      "ivfpq_trained", "rerank"))
    rows.foreach { case (m, r) =>
      assert(r >= 0.0 && r <= 1.0, s"$m recall $r out of [0,1]")
    }
    // the exact re-rank reads the SAME persisted index as
    // ivfpq_residual and re-scores true vectors: it can only repair
    // the ADC ranking, never worsen it
    assert(rows("rerank") >= rows("ivfpq_residual"),
      s"rerank ${rows("rerank")} < ADC-only ${rows("ivfpq_residual")}")
    // the driver corpus is ISOTROPIC random data — the hostile case
    // for ANN. The r8 RecallSweep located the knee: ADC-only recall
    // is QUANTIZER-bound (~0.15-0.17 at ANY probed fraction — m=4
    // codes are too coarse to rank isotropic vectors), so the product
    // knobs are cell granularity and rerank depth, not probes. At the
    // pinned operating point (nlist=32, nprobe=4 — ~13% of the corpus
    // read — rerank depth 24) measured rerank recall@3 is 0.88; 0.7
    // is the product floor this index must keep clearing. LSH
    // sign-projections collide near-randomly on isotropic data — the
    // gate's value is surfacing exactly that cliff, so it only gets
    // the [0,1] bound.
    assert(rows("ivfpq_residual") >= 0.1, s"ADC recall ${rows("ivfpq_residual")}")
    assert(rows("ivfpq_raw") >= 0.1, s"raw-PQ recall ${rows("ivfpq_raw")}")
    // the trained quantizer shares the ADC family's quantizer-bound
    // ceiling on isotropic data — same floor as its seeded siblings
    assert(rows("ivfpq_trained") >= 0.1,
      s"trained-PQ recall ${rows("ivfpq_trained")}")
    assert(rows("rerank") >= 0.7, s"rerank recall ${rows("rerank")}")
  }

  test("t12 one-pass reassembly ≡ the anti-join + re-join formulation") {
    // r18 pin: the declared t12 computes n_chunks/kept/clean_text in
    // ONE aggregation (dup-flag left join, unique broadcast key); the
    // pre-r18 shape anti-joined then re-joined a second chunking pass.
    // Fixture forces the edges: a doc whose EVERY chunk repeats (must
    // survive with empty clean_text), a doc with no dup chunks, docs
    // sharing only some chunks, and multi-chunk (>10-word) texts.
    val sp = spark
    import sp.implicits._
    val w = (a: Int, b: Int) => (a to b).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (0L, w(0, 24)),                       // 3 chunks, chunk0 shared
      (1L, w(0, 9) + " " + w(100, 113)),    // chunk0 shared, rest unique
      (2L, w(0, 9)),                        // ALL chunks dup → empty
      (3L, "tiny unique text"),
      (4L, w(200, 230))).toDF("doc_id", "text")
    val chunkWords = 10
    val words = split(col("text"), " ")
    val base = corpus.select(col("doc_id"),
      transform(
        sequence(lit(0),
          ceil(size(words) / lit(chunkWords.toDouble)).cast("int") - 1),
        i => array_join(
          slice(words, i * chunkWords + 1, lit(chunkWords)), " "))
        .as("chunks"))
    val exploded = base.select(col("doc_id"), posexplode(col("chunks")))
      .toDF("doc_id", "chunk_idx", "chunk")
    val dup = exploded.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("chunk"))
    // the pre-r18 formulation, verbatim
    val keptOld = exploded.join(broadcast(dup), Seq("chunk"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_chunks"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
    val old = base.select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"))
      .join(keptOld, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        (col("n_chunks") - coalesce(col("kept_chunks"), lit(0L)))
          .as("removed_chunks"))
    // the declared one-pass shape
    val mark = exploded.join(
      broadcast(dup.withColumn("__dup", lit(1))), Seq("chunk"), "left")
    val now = mark.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("__dup").isNull, 1)).as("kept_chunks"),
        array_join(transform(
          array_sort(collect_list(when(col("__dup").isNull,
            struct(col("chunk_idx"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"))
      .select(col("doc_id"), col("clean_text"), col("kept_chunks"),
        (col("n_chunks") - col("kept_chunks")).as("removed_chunks"))
    val o = old.collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val n = now.collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(o === n)
    // the all-dup doc really exercised the edge
    assert(o(2L)(1) === "" && o(2L)(3) === 1L)
  }
}

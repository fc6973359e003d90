package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline: queries ×
  * corpus with precomputed norms — a broadcast of the (small) query
  * side against a scan of the corpus, no shuffle until the final
  * per-query top-k. The LSH variant (sign-random-projection buckets)
  * is the scale path: candidates come from a bucket equi-join, so the
  * cross product never materializes.
  *
  * All float math is promoted to double and folded sequentially
  * (`aggregate` = left fold) for engine-portable determinism.
  */
object Similarity {

  /** Promote array<float> to array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (assumes non-zero vectors). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), deterministically ranked by
    * (rounded similarity desc, neighbor id asc).
    */
  import graft.functions.VectorExpressions.{dotF, lshBucketF, subF}

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // float arrays stay float; the codegen'd dotF kernel promotes each
    // element to double in fold order — bit-identical to the explicit
    // cast-then-aggregate formulation, ~100× less per-element overhead
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    // r17: under-split-scan repair before the per-row dot kernels
    // (guide §2.5); identity at production split counts
    val c = graft.SparkUtil.parallelScan(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        col("neighbor_id"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Sequential self-dot in the exact fold order of the codegen'd
    * `dotF` kernel, so a driver-side centroid norm is bit-identical to
    * the one Spark would compute. */
  private def selfDot(v: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    acc
  }

  /** Row-local nearest-centroid cell id. Centroids are driver-side
    * constants (nlist is small by construction), so the assignment is
    * a pure projection over the corpus scan — no |corpus|×nlist row
    * expansion, no shuffle (a window argmax would shuffle every
    * expanded row on neighbor_id). Tie-break matches the window form
    * `ORDER BY cos DESC, cell ASC`.
    *
    * r17 (guide §1.2 per-task work): one fused codegen kernel
    * ([[graft.functions.VectorExpressions.nearestCellF]]) instead of
    * `greatest` over nlist (cos, -cell) structs — the struct tree
    * allocated nlist rows + nlist generic-ArrayData dots per input
    * row (measured 6.7 s task CPU for 2 000 rows × 32 cells once the
    * under-split repair spread it over 32 tasks; the fused loop is
    * ~10 ms). Bit-identical: same rounded score, same double
    * ordering, same tie/null fallbacks — pinned against the struct
    * form in CodegenGuardSpec, and e03/e07/e11/dd09 stay
    * oracle-green. */
  def nearestCell(vec: Column, vnorm: Column,
                  centroids: Seq[Array[Float]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    graft.functions.VectorExpressions.nearestCellF(vec, vnorm, centroids)
  }

  /** Deterministic untrained coarse quantizer: the first `nlist`
    * corpus vectors in id order (cell = rank of id). Seeded by
    * orderBy+limit — TakeOrderedAndProject, a per-partition top-k and
    * driver merge, never a full sort — so it works for ANY id domain
    * (sparse, offset, negative), not just ids dense from 0; for a
    * dense 0..n corpus it returns exactly the old `id < nlist` set. */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nlist: Int): Seq[Array[Float]] = {
    val cents = corpus.orderBy(col(idCol).asc).limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray).toSeq
    require(cents.nonEmpty,
      s"IVF centroid seed: corpus has no rows (nlist=$nlist)")
    cents
  }

  /** Semantic dedup — the SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then prune
    * cosine-near pairs ONLY within a cluster, keeping the smallest id.
    * Clustering = the deterministic coarse quantizer ([[ivfCentroids]]
    * first-nlist seed, or caller-supplied e.g. [[trainCentroids]])
    * with the shuffle-free row-local [[nearestCell]] assignment.
    *
    * Scale shape: pair generation is an equi-join on `cell`; nlist
    * grows with the corpus (SemDeDup uses ~100k clusters at web
    * scale) so cells stay small and the within-cell product is
    * bounded — never an all-pairs join.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int, tau: Double,
                    centroids: Option[Seq[Array[Float]]] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(corpus, idCol, vecCol, nlist))
    // r17: under-split-scan repair before the nearestCell kernel
    // (guide §2.5); identity at production split counts
    val assigned = graft.SparkUtil.parallelScan(
        corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv")),
        col("vec_id"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
      .withColumn("cell", nearestCell(col("cv"), col("cn"), cents))
    val a = assigned.toDF("id_a", "va", "na", "cell")
    val b = assigned.toDF("id_b", "vb", "nb", "cell")
    val dups = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(dotF(col("va"), col("vb")) / (col("na") * col("nb")), 6)
        >= tau)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    assigned.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup").isNull.as("keep"))
  }

  /** Deterministic bounded training sample (the t05 md5-prefix
    * threshold device, keyed on the id column): at most ~`cap` rows in
    * expectation, identical across reruns, no RNG. One cheap count
    * sizes the cutoff; corpora already under the cap pass through
    * unfiltered (and unscanned twice — the count is column-pruned).
    */
  private[llmdata] def trainingSample(corpus: DataFrame, idCol: String,
                                      cap: Long): DataFrame = {
    require(cap > 0, "sample cap must be positive")
    val n = corpus.count()
    if (n <= cap) corpus
    else {
      // 16-bit hex prefix = 65536 buckets; lexicographic compare of
      // equal-length lowercase hex == numeric compare. ceil can round
      // the cutoff up to 65536 itself (n barely above cap), whose hex
      // form "10000" is 5 chars and would lexicographically keep only
      // ~1/16 of the corpus — at or past the top bucket there is
      // nothing to filter, so pass through unfiltered.
      val cutoff = math.max(1L,
        math.ceil(cap.toDouble / n * 65536).toLong)
      if (cutoff >= 65536L) corpus
      else corpus.filter(
        substring(md5(col(idCol).cast("string")), 1, 4) < f"$cutoff%04x")
    }
  }

  /** A few Lloyd's iterations (spherical k-means: assignment by
    * cosine, update by per-cell mean), entirely in DataFrame ops:
    * assign = the shuffle-free `nearestCell` projection; update = ONE
    * groupBy(cell) with a per-dimension `sum` column (map-side partial
    * aggregation of nlist×dim doubles — no posexplode row expansion).
    * Deterministic: init = `ivfCentroids`, no RNG anywhere. Empty
    * cells keep their previous centroid.
    *
    * Training runs on a bounded deterministic SAMPLE (`sampleCap`,
    * default 100k vectors — [[trainingSample]]): a quantizer needs the
    * data's shape, not the data; caching a 100 TB corpus to rescan it
    * per iteration would spill and re-read the world 5×, while a
    * bounded sample pins in memory and each iteration costs
    * O(cap·nlist·dim) regardless of corpus size. Assignment of the
    * full corpus stays exactly [[assignCells]] — full, shuffle-free.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int = 16, iters: Int = 5,
                     sampleCap: Long = 100000L): Seq[Array[Float]] = {
    var cents = ivfCentroids(corpus, idCol, vecCol, nlist)
    val dim = cents.head.length
    // every iteration scans this frame — materialize once; the cache
    // holds ≤ ~sampleCap rows by construction, never the corpus
    // r17: deliberately NOT parallelScan'd — each Lloyd's update folds
    // plain DOUBLE dimension sums, so re-partitioning the sample would
    // change the reduction order and drift the trained centroids (a
    // result change in e04/e09/e10). The single-task iteration cost is
    // bounded by sampleCap, not the corpus.
    val c = trainingSample(corpus.select(col(idCol), col(vecCol)), idCol,
        sampleCap)
      .select(col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv")))).cache()
    try {
      for (_ <- 0 until iters) {
        val dimSums = (0 until dim).map(i =>
          sum(col("cv").getItem(i).cast("double")).as(s"s$i"))
        val rows = c.withColumn("cell", nearestCell(col("cv"), col("cn"), cents))
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n"), dimSums: _*)
          .collect() // ≤ nlist rows
        val next = cents.map(_.clone()).toArray
        rows.foreach { r =>
          val cell = r.getAs[Int]("cell")
          val n = r.getAs[Long]("n").toDouble
          next(cell) = Array.tabulate(dim)(i => (r.getAs[Double](s"s$i") / n).toFloat)
        }
        cents = next.toSeq
      }
      cents
    } finally c.unpersist() // also on a failed iteration — no leaked blocks
  }

  /** Corpus → (neighbor_id, cv, cn, cell) assignment plan — a pure
    * projection (asserted shuffle-free in PlanSpec). */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: Seq[Array[Float]]): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
      .withColumn("cell", nearestCell(col("cv"), col("cn"), centroids))

  /** IVF-flat ANN. Corpus vectors are assigned to their nearest
    * centroid row-locally (`nearestCell` — the round-1 crossJoin +
    * window argmax shuffled |corpus|×nlist rows; this shuffles none);
    * queries probe the `nprobe` nearest centroid lists, so the search
    * reads |probe lists|, not |corpus|. Centroids default to the
    * deterministic first-`nlist` quantizer (oracle-matched); pass
    * `trainCentroids(...)` output for data-shaped cells.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
              centroids: Option[Seq[Array[Float]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centroids.getOrElse(ivfCentroids(corpus, idCol, vecCol, nlist))
    val sp = corpus.sparkSession
    import sp.implicits._
    val cent = cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
      .toDF("cell", "centv")
      .withColumn("centn", sqrt(dotF(col("centv"), col("centv"))))
    val assigned = assignCells(corpus, idCol, vecCol, cents)
    // queries probe their nprobe nearest cells (queries are small —
    // the crossJoin expansion is |queries|×nlist against a broadcast)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("centcos").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("centcos",
        round(dotF(col("qv"), col("centv")) / (col("qn") * col("centn")), 6))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-hyperplane component for plane j, dim i:
    * ±1 from a fixed congruence — engine-portable (no RNG). The form
    * is the PRODUCT of two independent linear forms in (j, i) taken
    * mod a large prime: a single small linear form never exceeds the
    * modulus, so its parity collapses to parity(j + i) and every
    * "plane" measures the same projection (2 effective buckets — a
    * disguised half-cross-join at scale). The product overflows the
    * modulus and mixes j and i nonlinearly: 64 planes × 64 dims give
    * 64 distinct sign rows, none a negation of another, ~50/50
    * balance. All math in long (the twin's BIGINT), with EACH FACTOR
    * reduced mod 1000003 before the multiply — identical values
    * ((a%p)·(b%p) mod p ≡ a·b mod p), but the product stays < 2^40
    * for any dim, where the raw form's i²-growing factor silently
    * wraps Long around dim ~100k (and the twin's BIGINT errors —
    * a cross-engine divergence).
    */
  private def planeSign(j: Int, i: Column): Column = {
    val a = (lit(j * 73L) + i.cast("long") * i * 31L + 7L) % 1000003L
    val b = (lit(j * 31L) + i.cast("long") * 911L + 3L) % 1000003L
    when(((a * b) % 1000003L) % 2L === 0L, 1.0).otherwise(-1.0)
  }

  /** Sign-random-projection LSH bucket id from `planes` hyperplanes;
    * `offset` selects the plane family (table t → offset t·planes). */
  def lshBucket(v: Column, planes: Int = 8, offset: Int = 0): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        transform(sequence(lit(0), size(v) - 1),
          i => planeSign(offset + j, i) * get(v, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  // ---- product quantization (IVF-PQ's compression half) --------------

  /** Deterministic PQ codebooks: for each of `m` subspaces, the
    * subvectors of the first `k` corpus vectors in id order — the same
    * oracle-matched seeding device as [[ivfCentroids]] (the teaching/
    * oracle baseline; [[trainPqCodebooks]] is the data-shaped
    * production variant — encode/score below is identical for both).
    * Returns [m][k][dsub]. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int): Seq[Seq[Array[Float]]] =
    sliceBooks(corpus.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray), m)

  /** Lloyd's-trained PQ codebooks: per-subspace k-means (L2, the PQ
    * metric) on the bounded deterministic md5-prefix SAMPLE — the same
    * sample-not-corpus training economics as [[trainCentroids]]
    * (Jégou et al. 2011 §III train the subquantizers exactly this
    * way; a quantizer needs the data's shape, not the data). Init is
    * the [[pqCodebooks]] first-`k` seed, assignment reuses the
    * codegen [[pqCodes]] argmin, update is the per-code subvector
    * mean via one small groupBy per subspace per iteration over the
    * CACHED sample (m·iters tiny jobs, each O(cap·k·dsub)). Empty
    * codes keep their previous entry. Deterministic — no RNG
    * anywhere, so reruns are bit-identical. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int = 4, k: Int = 16, iters: Int = 5,
                       sampleCap: Long = 100000L): Seq[Seq[Array[Float]]] = {
    var books: Seq[Seq[Array[Float]]] =
      pqCodebooks(corpus, idCol, vecCol, m, k)
    val dsub = books.head.head.length
    // r17: not parallelScan'd — double-sum fold order, see trainCentroids
    val c = trainingSample(corpus.select(col(idCol), col(vecCol)), idCol,
        sampleCap)
      .select(col(vecCol).as("v")).cache()
    try {
      for (_ <- 0 until iters) {
        books = (0 until m).map { mi =>
          val sub = slice(col("v"), mi * dsub + 1, dsub)
          // single-subspace argmin: pqCodes with a 1-entry codebook list
          val assigned = c.select(sub.as("sub"))
            .withColumn("code",
              element_at(pqCodes(col("sub"), Seq(books(mi))), 1))
          val dimSums = (0 until dsub).map(i =>
            sum(col("sub").getItem(i).cast("double")).as(s"s$i"))
          val rows = assigned.groupBy(col("code"))
            .agg(count(lit(1)).as("n"), dimSums: _*)
            .collect() // ≤ k rows
          val next = books(mi).map(_.clone()).toArray
          rows.foreach { r =>
            val j = r.getAs[Int]("code")
            val n = r.getAs[Long]("n").toDouble
            var i = 0
            while (i < dsub) {
              next(j)(i) = (r.getAs[Double](s"s$i") / n).toFloat
              i += 1
            }
          }
          next.toSeq
        }
      }
      books
    } finally c.unpersist()
  }

  /** (id, rv) residual frame: rv = v − centroid(cell(v)) — the IVFADC
    * encoding input (Jégou et al. 2011 §IV: residuals have far lower
    * variance than raw vectors, so the same code budget quantizes them
    * more finely). Cell assignment and the float subtraction are both
    * row-local codegen — a pure projection, no shuffle. */
  def ivfResiduals(corpus: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[Array[Float]]): DataFrame =
    corpus.select(col(idCol), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
      .withColumn("cell", nearestCell(col("cv"), col("cn"), centroids))
      .select(col(idCol),
        subF(col("cv"),
          element_at(typedLit(centroids.map(_.toSeq)), col("cell") + 1))
          .as("rv"))

  /** Rounded squared L2 distance of a subvector slice to a codebook
    * entry, via the codegen dot kernel: ‖x‖² − 2·x·c + ‖c‖² (the ADC
    * decomposition — ‖c‖² folds to a driver-side constant). */
  private def pqDist(sub: Column, subSelfDot: Column,
                     c: Array[Float]): Column =
    round(subSelfDot - lit(2.0) * dotF(sub, typedLit(c.toSeq))
      + lit(selfDot(c)), 6)

  /** The codes column: argmin codebook entry per subspace, one fused
    * [[graft.functions.VectorExpressions.pqArgminF]] kernel per
    * subspace (smallest rounded ‖c‖²−2·x·c selector, ties to the
    * smallest code — the row-constant ‖x‖² cancels in the argmin and
    * is dropped; the oracle twins select by the same `dsel`). The
    * previous `greatest(struct(round(dot(slice…))))` k-way tree handed
    * whole-stage codegen a CSE'd shared slice/self-dot local that
    * `Greatest`'s split functions referenced — Janino rejected the
    * class ("project_isNull_N is not an rvalue") and Spark silently
    * interpreted the hot encode path. */
  private def pqCodes(v: Column,
                      codebooks: Seq[Seq[Array[Float]]]): Column = {
    val dsub = codebooks.head.head.length
    array(codebooks.indices.map { mi =>
      graft.functions.VectorExpressions.pqArgminF(v, mi * dsub, codebooks(mi))
    }: _*)
  }

  /** PQ ENCODE — a pure row-local projection (no shuffle, like
    * [[nearestCell]]): each vector becomes `m` small codes
    * (array<int>), the 4-byte-per-subvector compression that lets a
    * 100 TB corpus's ANN scan read codes instead of vectors. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               codebooks: Seq[Seq[Array[Float]]]): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"),
      pqCodes(col(vecCol), codebooks).as("codes"))

  /** A query vector's m×k ADC distance table to the codebooks, as a
    * nested array column (each entry the rounded squared L2 of the
    * subvector slice to a codebook entry). */
  private def pqDistTable(v: Column,
                          books: Seq[Seq[Array[Float]]]): Column = {
    val dsub = books.head.head.length
    array(books.indices.map { mi =>
      val sub = slice(v, mi * dsub + 1, dsub)
      val xx = dotF(sub, sub)
      array(books(mi).map(c => pqDist(sub, xx, c)): _*)
    }: _*)
  }

  /** PQ ANN via asymmetric distance (ADC): the corpus is scanned as
    * codes only; each query precomputes its m×k distance table to the
    * codebooks (driver-literal) and scores a vector as the exact
    * decimal sum of m table lookups. Top-k ascending. The scale shape
    * IVF-PQ serves at 100 TB: candidate scoring reads |codes| bytes,
    * never the vectors — compose with [[assignCells]] cell probing to
    * also bound WHICH codes are read. Codebooks default to the
    * oracle-matched first-`kCodes` seed; pass [[trainPqCodebooks]]
    * output for data-shaped codebooks (better recall on clustered
    * distributions, same plan). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 4,
             kCodes: Int = 16,
             codebooks: Option[Seq[Seq[Array[Float]]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = codebooks.getOrElse(pqCodebooks(corpus, idCol, vecCol, m, kCodes))
    // materialize the codes ONCE (a real system stores them — they ARE
    // the compressed index). Left lazy, the 64-way argmin expression is
    // re-evaluated inside the fused join+window stage per OUTPUT row:
    // measured 12 s vs 0.7 s at sf0.1.
    val encoded = pqEncode(
      graft.SparkUtil.parallelScan(
        corpus.select(col(idCol), col(vecCol)), col(idCol)),
      idCol, vecCol, books).localCheckpoint(true)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val q = q0.select(col("query_id"), pqDistTable(col("qv"), books).as("tab"))
    // 6-dp-rounded lookups summed in decimal: exact, order-free — the
    // cross-engine determinism discipline for the float sum
    val adist = (0 until m).map(mi =>
      element_at(element_at(col("tab"), mi + 1),
        element_at(col("codes"), mi + 1) + 1).cast("decimal(20,6)"))
      .reduce(_ + _).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    broadcast(q).crossJoin(encoded)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }

  /** Two-stage retrieval: exact cosine re-rank of an ANN candidate
    * set. Stage 1 retrieves `k' >> k` candidates with a cheap
    * compressed index (IVF-PQ, LSH — anything emitting
    * (query_id, neighbor_id) pairs); stage 2 reads the TRUE vectors of
    * only those candidates and scores them exactly. This is how
    * production vector search actually answers queries: the index
    * bounds how many full vectors are ever read (|Q|·k' of them, not
    * the corpus), and the exact pass repairs the index's quantization
    * error at the top of the ranking.
    *
    * Scale shape: the candidate set is |Q|·k' rows of two ids —
    * broadcast it; the corpus scan is then a broadcast-semi-probe
    * (no corpus shuffle), and only matching rows carry their vector
    * into the per-query top-k window. */
  def rerankTopK(queries: DataFrame, corpus: DataFrame,
                 candidates: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
    val cand = candidates.select(col("query_id"), col("neighbor_id"))
    val scored = c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF-PQ — the full IVFADC layout (Jégou et al. 2011 §IV): the
    * coarse quantizer bounds WHICH codes are read (queries probe
    * `nprobe` cells), PQ bounds what scoring them costs (m table
    * lookups per candidate, vectors never touched after encode), and
    * — with `residual = true`, the paper's actual encoding — the PQ
    * codes quantize the RESIDUAL v − centroid(cell), whose variance
    * is far lower than the raw vectors', so the same code budget
    * resolves finer distances. The query side then builds one ADC
    * table per PROBED CELL from its own residual q − centroid(cell)
    * (that is what makes the distance asymmetric-correct under
    * residuals); with nprobe cells that is nprobe small driver-side
    * tables per query, still broadcast.
    *
    * Both corpus-side steps — cell assignment, residual, encoding —
    * are one row-local projection over one scan (the repeated
    * nearestCell subtree is deduplicated by codegen subexpression
    * elimination); the probe side is the same broadcast shape as
    * [[ivfTopK]]. At 100 TB this is the ANN configuration that
    * actually ships: O(corpus) bytes become O(corpus·m) code bytes,
    * and each query reads ~nprobe/nlist of them.
    *
    * `codebooks` defaults to the first-`kCodes` seed over the encoded
    * (residual or raw) vectors — oracle-expressible; pass
    * [[trainPqCodebooks]] over [[ivfResiduals]] for the trained
    * production variant. `residual = false` degrades to the simpler
    * raw-vector encoding (the teaching baseline e06 composes). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
                m: Int = 4, kCodes: Int = 16,
                centroids: Option[Seq[Array[Float]]] = None,
                codebooks: Option[Seq[Seq[Array[Float]]]] = None,
                residual: Boolean = true): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(corpus, idCol, vecCol, nlist))
    val books = codebooks.getOrElse(
      deriveIvfPqCodebooks(corpus, idCol, vecCol, cents, m, kCodes, residual))
    // materialized, because cells+codes ARE the stored index (and left
    // lazy the argmin expressions re-evaluate inside the join+window
    // stage). [[AnnIndex]] is the build-once persisted form of exactly
    // this frame — at 100 TB the encode is a batch job, not query work.
    val enc = ivfPqEncode(corpus, idCol, vecCol, cents, books, residual)
      .localCheckpoint(true)
    ivfPqSearch(queries, enc, idCol, vecCol, cents, books, k, nprobe, residual)
  }

  /** Fused driver-side quantizer derivation: centroids AND codebook
    * seeds from ONE `TakeOrderedAndProject` collect of the first
    * `nlist + kCodes` corpus rows, replacing [[ivfCentroids]] +
    * [[deriveIvfPqCodebooks]]'s three driver-sequential jobs (head
    * seed, residual-count gate, codebook-seed re-collect) on
    * [[AnnIndex.build]]'s bootstrap path. Bit-identical by
    * construction: both seeds are "first k rows in id order", the
    * residual math is the exact driver twin of the row-local Spark
    * expressions (`sqrt∘dotF` fold order, Spark's `round(_, 6)` on
    * DOUBLE via the canonical `BigDecimal.valueOf` HALF_UP — the
    * [[graft.functions.FloatPqArgmin]] precedent — and `greatest
    * (struct(cos, -cell))`'s NaN-greatest double ordering via
    * `SQLOrderingUtil.compareDoubles` semantics), and the one
    * non-local arm — fewer than `kCodes` nonzero residuals in the
    * head (duplicated-centroid corpora) — falls back to the
    * distributed full-corpus derivation unchanged.
    * AnnIndexSpec pins equality against the unfused pair on real
    * embeddings for both encodings plus the fallback arm. */
  private[llmdata] def deriveIvfQuantizer(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int, m: Int, kCodes: Int, residual: Boolean)
      : (Seq[Array[Float]], Seq[Seq[Array[Float]]]) = {
    val head = corpus.orderBy(col(idCol).asc).limit(nlist + kCodes)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(head.nonEmpty,
      s"IVF centroid seed: corpus has no rows (nlist=$nlist)")
    val cents = head.take(nlist).toSeq
    val books =
      if (!residual) sliceBooks(head.take(kCodes), m)
      else {
        val centNorms = cents.map(c => math.sqrt(selfDot(c))).toArray
        // the nonzero filter twins Spark's `dotF(rv,rv) > 0`, whose
        // double comparison is NaN-greatest (SQLOrderingUtil): a
        // NaN self-dot PASSES there, while Java's `NaN > 0` is false
        // — so NaN must be kept explicitly or a NaN-bearing head row
        // would flip the seed set between the fused and unfused paths
        val rs = head.iterator
          .map(v => subLocal(v, cents(nearestCellLocal(v, cents, centNorms))))
          .filter { r => val d = selfDot(r); d > 0 || d.isNaN }
          .take(kCodes).toArray
        if (rs.length >= kCodes) sliceBooks(rs, m)
        else pqCodebooks( // rare: head exhausted by zero residuals
          ivfResiduals(corpus, idCol, vecCol, cents)
            .filter(dotF(col("rv"), col("rv")) > 0),
          idCol, "rv", m, kCodes)
      }
    (cents, books)
  }

  /** The single subvector-slicing implementation behind
    * [[pqCodebooks]] (distributed seed collect) and
    * [[deriveIvfQuantizer]] (fused head collect) — one body, so the
    * two derivations cannot drift. */
  private def sliceBooks(seeds: Array[Array[Float]], m: Int)
      : Seq[Seq[Array[Float]]] = {
    require(seeds.nonEmpty, "PQ codebooks: corpus has no rows")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subvectors")
    val dsub = dim / m
    (0 until m).map(mi => seeds.toSeq.map(_.slice(mi * dsub, (mi + 1) * dsub)))
  }

  /** Driver twin of [[graft.functions.VectorExpressions.subF]]:
    * element-wise float IEEE subtraction. */
  private def subLocal(a: Array[Float], b: Array[Float]): Array[Float] = {
    val out = new Array[Float](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) - b(i); i += 1 }
    out
  }

  /** Driver twin of `dotF` (sequential fold, per-element double
    * promotion). */
  private def dotLocal(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Driver twin of Spark's `round(_, 6)` on DOUBLE: NaN/Inf pass
    * through, else canonical `BigDecimal.valueOf` HALF_UP (the
    * [[graft.functions.FloatPqArgmin]] replication, oracle-validated
    * there). */
  private def round6Local(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver twin of [[nearestCell]]: argmax over cells of the struct
    * (round6(cos), -cell) under Spark's double ordering
    * (`SQLOrderingUtil.compareDoubles`: `==` short-circuit so
    * ±0.0 tie, NaN greatest) — iterate ascending, strict-greater
    * replacement keeps the smallest cell on ties. */
  private def nearestCellLocal(v: Array[Float], cents: Seq[Array[Float]],
                               centNorms: Array[Double]): Int = {
    val vn = math.sqrt(dotLocal(v, v))
    def cos(cell: Int): Double =
      round6Local(dotLocal(v, cents(cell)) / (vn * centNorms(cell)))
    var best = 0
    var bestC = cos(0)
    var cell = 1
    while (cell < cents.size) {
      val c = cos(cell)
      val cmp = if (c == bestC) 0 else java.lang.Double.compare(c, bestC)
      if (cmp > 0) { best = cell; bestC = c }
      cell += 1
    }
    best
  }

  /** The IVFADC codebook derivation `ivfPqTopK` defaults to — split
    * out so [[AnnIndex.build]] trains the identical codebooks once and
    * persists them. */
  private[llmdata] def deriveIvfPqCodebooks(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Seq[Array[Float]], m: Int, kCodes: Int,
      residual: Boolean): Seq[Seq[Array[Float]]] = {
    // Residual seeding skips zero residuals: a vector that IS a
    // centroid (guaranteed for the first-nlist coarse seed — each
    // seed lands in its own cell) has residual exactly 0, and a
    // codebook seeded from zero vectors scores every candidate
    // identically (ADC collapses to ||q−c||², ranking degenerates
    // to id order). First-k NONZERO residuals in id order is the
    // deterministic, oracle-expressible repair.
    if (residual) {
      // Bound the seed scan to the first kCodes + nlist ids before
      // computing residuals: a zero residual means v equals one of
      // the nlist centroids, so at most nlist of those head rows are
      // filtered out and the first kCodes nonzero residuals of the
      // whole corpus all sit inside the head. Residuals over the
      // full corpus here would also push the filter predicate below
      // the projection, inlining the nearestCell+subtract subtree
      // twice into a full-corpus scan (measured ~1.3 s of pure
      // codegen+re-eval overhead at sf0.1). Fall back to the
      // unbounded frame only in the duplicated-centroid-vector edge
      // case where fewer than kCodes head rows survive.
      val head = corpus.select(col(idCol), col(vecCol))
        .orderBy(col(idCol).asc).limit(kCodes + cents.size)
        .localCheckpoint(true)
      val bounded = ivfResiduals(head, idCol, vecCol, cents)
        .filter(dotF(col("rv"), col("rv")) > 0)
      val frame =
        if (bounded.count() >= kCodes) bounded
        else ivfResiduals(corpus, idCol, vecCol, cents)
          .filter(dotF(col("rv"), col("rv")) > 0)
      pqCodebooks(frame, idCol, "rv", m, kCodes)
    } else
      pqCodebooks(corpus.select(col(idCol), col(vecCol).as("rv")),
        idCol, "rv", m, kCodes)
  }

  /** Corpus → (neighbor_id, cell, codes): ONE corpus scan — cell +
    * residual + codes, all row-local (no shuffle). This frame IS the
    * IVF-PQ index; callers either materialize it per run
    * (`localCheckpoint` in [[ivfPqTopK]]) or persist it once as a
    * cell-partitioned table ([[AnnIndex.build]]).
    *
    * cell and rv get their OWN projection boundaries: pqCodes
    * references its input ~(m·k) times, and inlining the residual
    * subtree there re-evaluates nearestCell + the subtraction per
    * distance term (the tree also outgrows codegen, so interpreted
    * eval pays it with per-element boxing — measured 5 s vs sub-second
    * on 2k rows at dim 64). CollapseProject keeps the boundaries: the
    * produced columns are expensive and multiply-referenced. */
  private[llmdata] def ivfPqEncode(corpus: DataFrame, idCol: String,
      vecCol: String, cents: Seq[Array[Float]],
      books: Seq[Seq[Array[Float]]], residual: Boolean): DataFrame = {
    val centsLit = typedLit(cents.map(_.toSeq))
    def encVec(v: Column, cell: Column): Column =
      if (residual) subF(v, element_at(centsLit, cell + 1)) else v
    // r17: under-split-scan repair before the assignment/residual/
    // argmin kernels (guide §2.5); identity at production split counts
    graft.SparkUtil.parallelScan(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        col("neighbor_id"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
      .withColumn("cell", nearestCell(col("cv"), col("cn"), cents))
      .select(col("neighbor_id"), col("cell"),
        encVec(col("cv"), col("cell")).as("rv"))
      .select(col("neighbor_id"), col("cell"),
        pqCodes(col("rv"), books).as("codes"))
  }

  /** Query-side probe plan: each query's `nprobe` nearest cells with
    * the query vector carried along (queries are small by contract —
    * the crossJoin expansion is |queries|×nlist against a broadcast
    * centroid table). Shared by the search path and by
    * [[AnnIndex.search]]'s probed-cell partition pruning. */
  private[llmdata] def ivfProbeCells(queries: DataFrame, idCol: String,
      vecCol: String, cents: Seq[Array[Float]], nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = queries.sparkSession
    import sp.implicits._
    val cent = cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
      .toDF("cell", "centv")
      .withColumn("centn", sqrt(dotF(col("centv"), col("centv"))))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("centcos").desc, col("cell").asc)
    q0.crossJoin(broadcast(cent))
      .withColumn("centcos",
        round(dotF(col("qv"), col("centv")) / (col("qn") * col("centn")), 6))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
  }

  /** The IVFADC probe/score half over an already-encoded
    * (neighbor_id, cell, codes) frame — `enc` may be a per-run
    * localCheckpoint ([[ivfPqTopK]]) or a persisted index table scan
    * ([[AnnIndex.search]]); the plan is identical either way:
    * broadcast probes → cell equi-join → m decimal ADC lookups →
    * per-query bounded top-k. */
  private[llmdata] def ivfPqSearch(queries: DataFrame, enc: DataFrame,
      idCol: String, vecCol: String, cents: Seq[Array[Float]],
      books: Seq[Seq[Array[Float]]], k: Int, nprobe: Int,
      residual: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = books.size
    val centsLit = typedLit(cents.map(_.toSeq))
    def encVec(v: Column, cell: Column): Column =
      if (residual) subF(v, element_at(centsLit, cell + 1)) else v
    val probes = ivfProbeCells(queries, idCol, vecCol, cents, nprobe)
      .select(col("query_id"), col("cell"),
        encVec(col("qv"), col("cell")).as("qrv"))
      .select(col("query_id"),
        pqDistTable(col("qrv"), books).as("tab"),
        col("cell"))
    val adist = (0 until m).map(mi =>
      element_at(element_at(col("tab"), mi + 1),
        element_at(col("codes"), mi + 1) + 1).cast("decimal(20,6)"))
      .reduce(_ + _).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    broadcast(probes).join(enc, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }

  /** LSH-bucketed ANN with OR-amplification: `tables` independent
    * hash tables (disjoint plane families via the bucket kernel's
    * offset), candidates = the UNION of per-table bucket joins — a
    * pair collides if it agrees in ANY table, the standard repair for
    * a single table's recall cliffs (collision probability
    * 1 − (1 − p^planes)^tables instead of p^planes). Each join is
    * still a bucket equi-join (broadcast query side, never a cross
    * product); duplicates collapse in one pair-keyed aggregate that
    * also canonicalizes the reported bucket to the smallest colliding
    * one. tables = 1 is exactly the old single-table shape.
    *
    * Scale shape: corpus cost is `tables` bucket projections over one
    * scan (codegen, row-local); candidate volume grows ≤ tables× —
    * the trade the amplification literature makes explicit. Rank by
    * exact cosine, ties to the smallest neighbor id.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8,
              tables: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tables >= 1, "need at least one hash table")
    // ONE corpus scan regardless of table count: the per-table buckets
    // are a row-local array, exploded to (table, bucket) rows — a
    // union of per-table joins would re-scan the corpus L times.
    def withBuckets(df: DataFrame, vec: String): DataFrame =
      df.select(col("*"), posexplode(array(
        (0 until tables).map(t => lshBucketF(col(vec), planes, t * planes)): _*)))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val q = withBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("qn", sqrt(dotF(col("qv"), col("qv")))), "qv")
    val c = withBuckets(
      // r17: under-split-scan repair before the bucket kernels
      graft.SparkUtil.parallelScan(
          corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
          col("neighbor_id"))
        .withColumn("cn", sqrt(dotF(col("cv"), col("cv")))), "cv")
    val collided = broadcast(q).join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .select("query_id", "bucket", "neighbor_id", "cos")
    val scored =
      if (tables == 1) collided
      else collided
        .groupBy(col("query_id"), col("neighbor_id"))
        // cos is identical in every colliding table; min/max only for
        // the aggregate form
        .agg(min(col("bucket")).as("bucket"), max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "neighbor_id", "cos", "rank")
  }
}

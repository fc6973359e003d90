package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all expressed
  * as shuffle-conscious DataFrame plans:
  *
  *  - exact:   hash-groupBy on content digest — one shuffle on the
  *             digest, combiner-friendly.
  *  - MinHash+LSH: signature → band buckets → equi-join. The only
  *             shuffle is on (band, key); no all-pairs comparison ever
  *             materializes, which is the property that survives 100 TB.
  *  - SimHash: 16-bit majority signature; near-dup = small hamming
  *             distance inside blocking groups.
  *  - n-gram Jaccard: word-bigram shingles compared only inside
  *             (lang, length) blocks.
  *
  * All hash arithmetic is the deterministic polynomial from
  * [[TextFunctions.stringHash]] so results are engine-portable.
  */
object DedupFunctions {

  import TextFunctions.HashMod

  /** Distinct tokens, hashed to longs. */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(TextFunctions.tokens(text)),
      w => TextFunctions.stringHash(w))

  /** MinHash signature of k permutations h_i(x) = ((2i+1)x + 17i+3) mod p.
    * Backed by the codegen'd [[graft.functions.MinHashSig]] expression. */
  def minhashSignature(th: Column, k: Int = 8): Column =
    graft.functions.HashExpressions.minHashSig(th, k)

  /** Built-in higher-order formulation — cross-check twin of the
    * custom expression (same values, interpreted evaluation). */
  def minhashSignatureBuiltin(th: Column, k: Int = 8): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(th,
        x => ((lit(2) * i + 1) * x + (lit(17) * i + 3)) % HashMod)))

  /** 16-bit SimHash from token hashes: per-bit majority vote over the
    * token hash's own bits. Backed by the codegen'd
    * [[graft.functions.SimHash16]] one-pass kernel (the unrolled HOF
    * twin below evaluates 16 interpreted aggregate chains per row —
    * it was the dominant cost of dd04/dd10 at sf0.1).
    */
  def simhash16(th: Column): Column =
    graft.functions.HashExpressions.simHash16(th)

  /** Built-in higher-order formulation — cross-check twin of the
    * custom expression (same values, interpreted evaluation). */
  def simhash16Builtin(th: Column): Column =
    (0 until 16).map { b =>
      val vote = aggregate(
        transform(th, x =>
          when(shiftright(x, b).bitwiseAND(1) === 1, 1).otherwise(-1)),
        lit(0), (acc, v) => acc + v)
      when(vote > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** 64-bit SimHash as 4×16-bit band values — the production
    * fingerprint width (Manku et al., WWW'07: 64 bits, 4 bands of 16,
    * hamming ≤ 3). The token hash carries only ~30 bits, so each
    * fingerprint bit b gets its own permutation h_b(x) = ((2b+1)x +
    * 17b+3) mod p of the token hash and votes on h_b's lowest bit;
    * identical integer arithmetic is expressible in any SQL engine.
    * Returned BANDED (array of 4 ints in [0, 65536)) because that is
    * the shape the pigeonhole pair-join consumes directly — and
    * because a packed 64-bit value's sign bit has engine-dependent
    * overflow semantics that the banded form never touches.
    * Backed by the codegen'd [[graft.functions.SimHash64Bands]]: the
    * builtin twin below is 64 interpreted aggregate-over-transform
    * chains per row — measured 17 s for dd11 at sf0.1 vs ~1 s with
    * the one-pass kernel.
    */
  def simhash64Bands(th: Column): Column =
    graft.functions.HashExpressions.simHash64Bands(th)

  /** Built-in higher-order formulation — cross-check twin of the
    * custom expression (same values, interpreted evaluation). */
  def simhash64BandsBuiltin(th: Column): Column =
    array((0 until 4).map { j =>
      (0 until 16).map { k =>
        val b = j * 16 + k
        val vote = aggregate(
          transform(th, x =>
            when(((lit(2L * b + 1) * x + lit(17L * b + 3)) % HashMod)
              .bitwiseAND(1) === 1, 1).otherwise(-1)),
          lit(0), (acc, v) => acc + v)
        when(vote > 0, lit(1 << k)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)

  /** The packed single-long 64-bit fingerprint (band j occupies bits
    * [16j, 16j+16)). JVM long arithmetic wraps, so bit 63 lands in the
    * sign bit harmlessly; hamming(a, b) = bit_count(a ^ b) equals the
    * per-band bit_count sum (FunctionsSpec asserts both). */
  def simhash64(th: Column): Column = {
    val bands = simhash64Bands(th)
    (0 until 4).map(j =>
      element_at(bands, j + 1).cast("long") * lit(1L << (16 * j)))
      .reduce(_ + _)
  }

  /** Word-bigram shingles (distinct). Guarded for <2 tokens: Spark's
    * `sequence(1, 0)` counts DOWN and ANSI element_at throws on
    * out-of-bounds, so short docs get an explicit empty array.
    */
  def bigramShingles(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= 2,
      array_distinct(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard over two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b))

  /** DD2, scale-hardened: exact n-gram Jaccard scored only on
    * LSH-band candidate pairs (MinHash over the same shingle hashes,
    * 4 bands × 2 rows), blocked by language.
    *
    * Why not block on (lang, n_chars): an exact-length block is
    * all-pairs within the block, and real corpora concentrate mass at
    * popular lengths — one hot block goes quadratic at scale. Band
    * collisions grow with the number of actually-similar pairs, not
    * with block population, so dissimilar same-length documents never
    * meet. Exact Jaccard stays the final scorer.
    *
    * Exchange shape (measured, r7): the band self-join and the
    * (doc_a, doc_b) dedup carry ONLY ids — the shingle arrays are
    * re-joined onto the deduped pair list afterwards, two id-keyed
    * hash joins against the signature frame. The alternative (arrays
    * riding the band join, dd03-style) shuffles each document's
    * shingle set once per band plus twice through the pair dedup:
    * 20.9 MB vs 0.5 MB of shuffle at sf0.1 for identical output and
    * equal wall time ([[ngramJaccardLshCarried]], Dd02AblationSpec).
    * At 100 TB the re-joined shape wins outright — exchange payload is
    * the corpus's shingles ≤2× instead of ~6×. Note dd03 itself keeps
    * its signatures in the band join: an 8-int signature is SMALLER
    * than the id+key rows a re-join would add, so the carried shape
    * wins there — the decision is payload-size-dependent, not a rule.
    *
    * Input needs (doc_id, lang, text); output (doc_a, doc_b, jaccard).
    */
  def ngramJaccardLsh(docs: DataFrame): DataFrame = {
    // r17: parallelize the signing kernels over under-split scans
    // (guide §2.5) — identity at production split counts
    val sh = graft.SparkUtil.parallelScan(
        docs.select(col("doc_id"), col("lang"), col("text")), col("doc_id"))
      .select(col("doc_id"), col("lang"),
        graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
          .as("sh"))
      .filter(size(col("sh")) > 0)
    // both derived frames (banded ids, shingle lookup) read this —
    // materialize once. localCheckpoint, not cache(): a cache entry
    // pinned in the CacheManager outlives the returned (lazy) frame
    // and leaks across invocations, while checkpoint blocks are
    // released by the ContextCleaner once the frame is unreferenced.
    val sigs = sh.select(col("doc_id"), col("lang"), col("sh"),
      minhashSignature(col("sh"), 8).as("sig")).localCheckpoint(true)
    val banded = sigs.select(col("doc_id"), col("lang"),
        posexplode(graft.functions.HashExpressions
          .lshBandKeys(col("sig"), 4, 2)))
      .toDF("doc_id", "lang", "band", "key")
    val a = banded.toDF("doc_a", "lang", "band", "key")
    val b = banded.toDF("doc_b", "lang", "band", "key")
    // r18: the deduped pair frame is byte-tiny (two longs per row),
    // so AQE's byte-based coalescing folded it to ONE partition and
    // the exact-Jaccard scoring below ran 1.4 s single-task (guide
    // §2.5's runtime form) — pin the scoring width explicitly; the
    // extra exchange carries ids only, the payload this operator
    // already chose to re-join arrays for
    val pairs = graft.SparkUtil.wideStage(
      a.join(b, Seq("lang", "band", "key"))
        .filter(col("doc_a") < col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
        .select("doc_a", "doc_b"),
      col("doc_a"))
    val shingles = sigs.select(col("doc_id"), col("sh"))
    pairs
      .join(shingles.toDF("doc_a", "sha"), Seq("doc_a"))
      .join(shingles.toDF("doc_b", "shb"), Seq("doc_b"))
      .withColumn("u", size(array_union(col("sha"), col("shb"))))
      .filter(col("u") > 0)
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sha"), col("shb")))
          .cast("double") / col("u"), 6).as("jaccard"))
  }

  /** The dd02 exchange-payload ablation twin: identical candidate
    * semantics and output as [[ngramJaccardLsh]], but the shingle
    * arrays ride THROUGH the band join and the pair dedup instead of
    * being re-joined after — the shape dd02 served through r6. Kept
    * (and equality-pinned in Dd02AblationSpec) as the measured
    * baseline for the exchange-payload decision documented above.
    */
  def ngramJaccardLshCarried(docs: DataFrame): DataFrame = {
    // r17: same under-split repair as ngramJaccardLsh — the ablation
    // twin must pay the same signing cost for the comparison to hold
    val sh = graft.SparkUtil.parallelScan(
        docs.select(col("doc_id"), col("lang"), col("text")), col("doc_id"))
      .select(col("doc_id"), col("lang"),
        graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
          .as("sh"))
      .filter(size(col("sh")) > 0)
    // both sides of the band self-join read this — materialize once
    // instead of re-hashing every document per side (the dd03 pattern).
    // localCheckpoint, not cache(): a cache entry pinned in the
    // CacheManager outlives the returned (lazy) frame and leaks across
    // invocations, while checkpoint blocks are released by the
    // ContextCleaner as soon as the frame is unreferenced.
    val sigs = sh.select(col("doc_id"), col("lang"), col("sh"),
      minhashSignature(col("sh"), 8).as("sig")).localCheckpoint(true)
    val banded = sigs.select(col("doc_id"), col("lang"), col("sh"),
        posexplode(graft.functions.HashExpressions
          .lshBandKeys(col("sig"), 4, 2)))
      .toDF("doc_id", "lang", "sh", "band", "key")
    val a = banded.toDF("doc_a", "lang", "sha", "band", "key")
    val b = banded.toDF("doc_b", "lang", "shb", "band", "key")
    a.join(b, Seq("lang", "band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("u", size(array_union(col("sha"), col("shb"))))
      .filter(col("u") > 0)
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sha"), col("shb")))
          .cast("double") / col("u"), 6).as("jaccard"))
  }

  /** DD3 core: MinHash signatures over bigram shingles + LSH band
    * candidate pairs, signatures carried THROUGH the band join so the
    * estimate needs no re-join back to the signature frame. Input
    * needs (doc_id, text); output (doc_a, doc_b, matching,
    * est_jaccard). Candidates come from a band-bucket equi-join —
    * cost scales with collision count, never |docs|².
    */
  def minhashBandPairs(docs: DataFrame): DataFrame = {
    // r17: redistribute BEFORE the shingle/minhash kernels when the
    // scan is under-split (guide §2.5 — single-row-group inputs scan
    // as one task; at production split counts this is the identity).
    // The kernels are the dominant per-row cost of every consumer
    // (dd03/dd08/dd15/t11/t23/t27), so they must run on all cores.
    val th = graft.SparkUtil.parallelScan(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
          .as("th"))
      .filter(size(col("th")) > 0)
    // localCheckpoint instead of cache(): checkpoint blocks free
    // themselves when the frame is unreferenced; a CacheManager entry
    // would leak across invocations
    val sigs = th.select(col("doc_id"),
      minhashSignature(col("th"), 8).as("sig"))
      .localCheckpoint(true)
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(graft.functions.HashExpressions
          .lshBandKeys(col("sig"), 4, 2)))
      .toDF("doc_id", "sig", "band", "key")
    val a = banded.toDF("doc_a", "siga", "band", "key")
    val b = banded.toDF("doc_b", "sigb", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      // r18: the aggregate(zip_with(...)) chain evaluated INTERPRETED
      // per candidate pair (boxed lambda vars + an intermediate array
      // per pair) — fused into the codegen sig_match_count kernel,
      // bit-identical incl. length-mismatch/null-element edges
      // (LlmDataSpec pin)
      .withColumn("matching",
        graft.functions.HashExpressions
          .sigMatchCount(col("siga"), col("sigb")))
      .select(col("doc_a"), col("doc_b"), col("matching"),
        (col("matching").cast("double") / 8.0).as("est_jaccard"))
  }

  /** Built-in higher-order formulation of the signature match count —
    * cross-check twin of [[graft.functions.HashExpressions.sigMatchCount]]. */
  def sigMatchCountBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  /** LSH candidate pairs: explode signatures into bands of `rows`
    * consecutive values, bucket-join on (band index, band key).
    * Input must have columns (id, sig). Output: (id_a, id_b) distinct,
    * id_a < id_b.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int,
                    rowsPerBand: Int): DataFrame = {
    require(bands > 0 && rowsPerBand > 0, "bands/rowsPerBand must be positive")
    // short-signature guard is intrinsic to the codegen kernel: a
    // signature shorter than bands*rowsPerBand yields an empty key
    // array (posexplode emits no rows), where a builtin get() chain
    // would yield NULLs that concat_ws silently drops, collapsing
    // every short document into one shared bucket (all-pairs blowup)
    val banded = sigs.select(col(idCol), posexplode(
      graft.functions.HashExpressions
        .lshBandKeys(col("sig"), bands, rowsPerBand)))
      .toDF(idCol, "band", "key")
    val a = banded.toDF("id_a", "band", "key")
    val b = banded.toDF("id_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** T11 cluster-representative selection — the LAST step of the
    * dedup pipeline, factored so the batch gate query and the
    * streaming loop ([[graft.streaming.StreamingLshJob]]'s pairs
    * table → clusters → keepers) share one implementation. Every
    * document is labeled with its near-dup cluster (`pairs`'
    * transitive closure via [[graft.operators.ConnectedComponents]])
    * and a keep flag for the highest-quality member (ties to the
    * smallest doc_id); documents in no cluster keep themselves.
    * `pairs` needs (doc_a, doc_b); `docs` needs (doc_id, text). The
    * only per-doc shuffle beyond the closure is the cluster-ranking
    * window. */
  def clusterKeep(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = graft.operators.ConnectedComponents.label(
      pairs, "doc_a", "doc_b")
    // r17: the quality kernel over an under-split scan runs one-task
    // (guide §2.5); redistribute first — identity at production splits
    val scored = graft.SparkUtil.parallelScan(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality_score"))
    val labeled = scored.join(cc, scored("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"),
        col("quality_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    labeled
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality_score"),
        col("keep"))
  }
}

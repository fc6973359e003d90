package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Scale-ratio harness: runs the superlinear-risk query family (the
  * pair-generating dedup/packing shapes whose cost could silently go
  * quadratic) at sf0.01 and sf0.1 and pins the growth of SHUFFLE WRITE
  * BYTES — the scale-faithful signal: wasted quadratic work shows up
  * as shuffle volume long before wall-clock does, and unlike time it
  * is immune to co-tenant stalls on a shared box.
  *
  * What "near-linear" means per query is DECLARED, because it differs:
  *
  *  - "linear" — shuffle must track input rows (≤18× for 10× data;
  *    headroom for constant overheads that don't grow).
  *  - "own-output" / "dd03-pairs" — shuffle must track the COLLISION
  *    SET the query (or its pair-generating stage) emits. An LSH
  *    candidate set is inherently Σ_pairs P(collide|J) — a per-PAIR
  *    false-positive probability, so FP count is quadratic in n with a
  *    small constant on any corpus. On real web-scale corpora baseline
  *    inter-doc Jaccard is ~0.01-0.05 and the constant is ~1e-9
  *    (negligible at any n); this driver-generated corpus draws from a
  *    small template vocabulary, so baseline J is ~0.2 and the FP tail
  *    dominates: measured here, true near-dups grow linearly (24→247
  *    J≥0.9 pairs for 10× docs) while band collisions grow ~107×
  *    (2326→248k pairs — sharpening to r=4 still leaves 71× growth
  *    from the J<0.3 tail, while losing J∈[0.5,0.7) recall that the
  *    downstream est_jaccard≥0.5 consumers need, so the banding stays
  *    at its threshold-matched b=4/r=2). No algorithm shuffles less
  *    than its collision set; the honest invariant — and what this
  *    spec pins — is shuffle ∝ input + collisions, i.e. bytes may grow
  *    WITH the measured collision count but never faster.
  */
class ScaleSpec extends SparkSpec {

  private val family = Seq(
    "dd02_ngram_jaccard" -> "own-output", // output = its candidate set
    "dd03_minhash_lsh" -> "own-output",   // output = its candidate set
    "dd10_simhash_pairs" -> "own-output",
    "t21_span_dedup" -> "linear",
    "dd08_dup_clusters" -> "dd03-pairs",  // CC over dd03's collision set
    "t09_sequence_packing" -> "linear",
    // the salted Zipfian joins and the chunk-explode dedup: their
    // token/bigram/chunk frames are O(total tokens) — growth must stay
    // linear in the corpus or the salting/chunking has regressed
    "t08_unigram_lm" -> "linear",
    "t20_bigram_lm" -> "linear",
    "t10_tfidf_topk" -> "linear",
    "t12_line_dedup" -> "linear")

  private def run(name: String, dir: String): (Long, Long) = {
    // the frame is CONSTRUCTED inside the listener window too: some
    // query fns (dd08's connected components) execute their iterative
    // shuffles eagerly at construction time, and those rounds are
    // exactly the superlinear-risk work this guard exists to see.
    // noop sink, not count(): count() lets Catalyst prune payload
    // columns out of the exchanges, under-reporting exactly the bytes
    // this spec exists to bound (the r7 Bench lesson).
    var df: org.apache.spark.sql.DataFrame = null
    val bytes = shuffleWriteBytesOf {
      df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
    }
    val rows = df.count() // outside the listener window
    sweepPersistentRdds() // free the pair generators' checkpoint blocks
    (bytes, rows)
  }

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  // dd03's collision-set growth, the normalizer for queries whose
  // shuffle rides the shared pair-generating stage
  private lazy val dd03RowsRatio: Double = {
    def rows(d: String) = SparkEntry.queries("dd03_minhash_lsh")(spark, d).count()
    val r = rows(big).toDouble / rows(small).max(1L)
    sweepPersistentRdds()
    r
  }

  for ((name, model) <- family)
    test(s"$name shuffle volume tracks its declared growth model ($model)") {
      val (bSmall, nSmall) = run(name, small)
      val (bBig, nBig) = run(name, big)
      val bytesRatio = bBig.toDouble / bSmall.max(1L)
      val allowed = model match {
        case "linear" => 18.0
        case "own-output" =>
          math.max(18.0, 1.5 * (nBig.toDouble / nSmall.max(1L)))
        case "dd03-pairs" => math.max(18.0, 1.5 * dd03RowsRatio)
      }
      info(f"$name: bytes $bSmall%,d→$bBig%,d (${bytesRatio}%.1f×), " +
        f"rows $nSmall%,d→$nBig%,d, allowed ${allowed}%.1f×")
      assert(bytesRatio <= allowed,
        f"$name shuffle bytes grew $bytesRatio%.1f× for 10× data " +
          f"(allowed ${allowed}%.1f× under '$model') — shuffle is growing " +
          "faster than the work the query emits; check the banding/bucketing")
    }
}

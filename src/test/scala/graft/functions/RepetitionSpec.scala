package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused Gopher repetition battery against hand-derived fixtures:
  * overlap clamping on self-overlapping top grams, range-union
  * coverage (no double counting), count ties breaking to the longer
  * gram, and the degenerate shapes (short docs, empty text, null). */
class RepetitionSpec extends SparkSpec {

  private def k(s: String): Seq[Double] =
    RepetitionExpression.computeRepetition(s).toSeq.map(v =>
      math.rint(v * 1e6) / 1e6)

  test("top fractions: overlap clamp, tie → longer gram") {
    // "a b" occurs 3×, char len 2, total 6 → 3·2/6 = 1.0; the 4-gram
    // "a b a b" ×2 · 4 chars / 6 = 1.33 must CLAMP to 1.0
    assert(k("a b a b a b").take(3) === Seq(1.0, 1.0, 1.0))
    // maxc=2 tie between "aaa b" (4 chars) and "b cc" (3 chars):
    // deterministic winner is the LONGER → 2·4/13
    assert(k("aaa b cc aaa b cc x").head === math.rint(8.0 / 13 * 1e6) / 1e6)
    // 3 words: top3 = the whole doc once → 1.0; no 4-grams → 0.0
    assert(k("a b c").slice(1, 3) === Seq(1.0, 0.0))
  }

  test("dup coverage is a position-range UNION — overlapping dup grams never double count") {
    // "x y z w v" repeats at positions 0 and 5: covered 0..9 of 12
    // single-char words → 10/12; 6-grams are all distinct → 0.0
    val f = k("x y z w v x y z w v u u")
    assert(f(3) === math.rint(10.0 / 12 * 1e6) / 1e6)
    assert(f(4) === 0.0)
    // a fully repeated doc: every range covers everything, exactly 1.0
    assert(k(Seq.fill(14)("r").mkString(" ")) === Seq.fill(9)(1.0))
  }

  test("degenerate shapes: empty text and sub-n docs are all-zero (and keep=true)") {
    assert(k("") === Seq.fill(9)(0.0))
    assert(k("lone") === Seq.fill(9)(0.0))
    // a doc shorter than n contributes 0.0 for that n only
    val f = k("p q r s t")
    assert(f(3) === 0.0) // no 6-grams
    assert(f.head > 0.0 || f.head === 0.0) // 2-grams exist, defined
  }

  test("codegen path ≡ kernel; null text degrades to zeros through the query's coalesce") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "x y z w v x y z w v u u"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val prof = RepetitionExpression.repetitionProfile(
      coalesce(col("text"), lit("")))
    val rows = docs.select(col("doc_id"), prof.as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows(1L) === RepetitionExpression.computeRepetition("a b a b a b").toSeq)
    assert(rows(2L) === RepetitionExpression
      .computeRepetition("x y z w v x y z w v u u").toSeq)
    assert(rows(3L) === Seq.fill(9)(0.0))
  }

  test("thresholds and names stay aligned (the t25 contract)") {
    assert(RepetitionExpression.Names.size === 9)
    assert(RepetitionExpression.Thresholds.size === 9)
    assert(RepetitionExpression.Thresholds === RepetitionExpression.Thresholds.sorted.reverse,
      "Gopher thresholds tighten as n grows")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full Gopher repetition battery (Rae et al. 2021 §A1.1) as ONE
  * fused codegen pass per document: top-{2,3,4}-gram character
  * fractions and duplicated-{5..10}-gram character coverage — nine
  * signals from a single tokenize → count → sweep loop, zero shuffle.
  * t19 carries the cheap two-signal variant (dup-token + top-bigram
  * share-of-occurrences); this is the complete per-character battery
  * a Gopher-style filter actually thresholds on. The reference's
  * quality flags (anomaly/validity heuristics) are the same
  * shape-class: per-row projections that compose with pushdown.
  *
  * Definitions (the DuckDB oracle derives the identical relational
  * formulation — any divergence hash-mismatches corpus-wide):
  *  - tokens = split on single space (the corpus convention shared by
  *    every text kernel here); char weight of a token = its code-point
  *    count; total = sum of token weights; gram char length = sum of
  *    its tokens' weights (== joined length minus the n−1 spaces).
  *  - top-n fraction (n=2..4): occurrences of the most frequent
  *    n-gram × its char length ÷ total, clamped to 1.0 (overlapping
  *    occurrences of a self-overlapping gram can overcount — the
  *    standard count×len formulation, made a true fraction by the
  *    clamp). Count ties break toward the LONGER gram (deterministic,
  *    order-free).
  *  - dup-n fraction (n=5..10): char weight of token positions covered
  *    by at least one n-gram that occurs ≥ 2 times, ÷ total — a union
  *    of position ranges, so never > 1 and never double-counted.
  *  - no grams (doc shorter than n) or total == 0 → 0.0.
  *
  * Line/paragraph-level Gopher rules are deliberately absent: the
  * corpus is single-line by construction (TESTDATA.md), so they would
  * be vacuous truths, not tested behavior.
  *
  * Scale shape: O(Σn · tokens) time with one small hashmap per (doc,
  * n) — a pure projection over the scan, no explode (the exploded
  * relational twin multiplies the row count ×9 and shuffles twice
  * per n), composes with partition pruning and column pruning.
  */
object RepetitionExpression {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** order of the nine fractions in the result array */
  val Names: Seq[String] = Seq(
    "top2_frac", "top3_frac", "top4_frac",
    "dup5_frac", "dup6_frac", "dup7_frac",
    "dup8_frac", "dup9_frac", "dup10_frac")

  /** Gopher's thresholds, same order: a doc is kept when every
    * fraction is ≤ its threshold (Rae et al. 2021, Table A1). */
  val Thresholds: Seq[Double] = Seq(
    0.20, 0.18, 0.16, 0.15, 0.14, 0.13, 0.12, 0.11, 0.10)

  def repetitionProfile(text: Column): Column =
    column(RepetitionProfile(expression(text)))

  /** Shared eval/codegen kernel. */
  def computeRepetition(s: String): Array[Double] = {
    val toks = s.split(" ", -1)
    val L = toks.length
    val wl = new Array[Int](L)
    var total = 0L
    var i = 0
    while (i < L) {
      wl(i) = toks(i).codePointCount(0, toks(i).length)
      total += wl(i)
      i += 1
    }
    val out = new Array[Double](9)
    if (total == 0L) return out
    // prefix sums: gram char length in O(1)
    val pre = new Array[Long](L + 1)
    i = 0
    while (i < L) { pre(i + 1) = pre(i) + wl(i); i += 1 }
    val sb = new java.lang.StringBuilder
    var n = 2
    while (n <= 10) {
      if (L >= n) {
        val m = L - n + 1
        val grams = new Array[String](m)
        val counts = new java.util.HashMap[String, java.lang.Integer](m * 2)
        var st = 0
        while (st < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(st + j))
            j += 1
          }
          val g = sb.toString
          grams(st) = g
          val c = counts.get(g)
          counts.put(g, if (c == null) 1 else c.intValue + 1)
          st += 1
        }
        if (n <= 4) {
          var maxc = 0
          val it = counts.values.iterator()
          while (it.hasNext) {
            val c = it.next().intValue
            if (c > maxc) maxc = c
          }
          var topLen = 0L
          st = 0
          while (st < m) {
            if (counts.get(grams(st)).intValue == maxc) {
              val gl = pre(st + n) - pre(st)
              if (gl > topLen) topLen = gl
            }
            st += 1
          }
          val f = maxc.toDouble * topLen.toDouble / total.toDouble
          out(n - 2) = if (f > 1.0) 1.0 else f
        } else {
          // union of [st, st+n-1] ranges over duplicated grams: starts
          // ascend, so a single covered-until cursor dedups overlaps
          var covered = 0L
          var coverUntil = -1
          st = 0
          while (st < m) {
            if (counts.get(grams(st)).intValue >= 2) {
              var p = math.max(st, coverUntil + 1)
              val to = st + n - 1
              while (p <= to) { covered += wl(p); p += 1 }
              if (to > coverUntil) coverUntil = to
            }
            st += 1
          }
          out(n - 2) = covered.toDouble / total.toDouble
        }
      }
      n += 1
    }
    out
  }
}

case class RepetitionProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "repetition_profile"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RepetitionExpression.computeRepetition(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.RepetitionExpression.computeRepetition($c.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfile =
    copy(child = newChild)
}

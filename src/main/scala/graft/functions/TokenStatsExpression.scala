package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass token statistics (r18, guide §4): one scan over
  * the text computes every whitespace-token metric the text-quality
  * family needs — token count, stopword/marker hits, distinct
  * stopwords, optionally distinct tokens — where the builtin
  * formulation re-ran `split(text, " ")` once per metric (up to ~12×
  * per row in t01) and filtered with interpreted higher-order
  * functions that defeat both codegen and subexpression elimination.
  *
  * Equivalence contract (pinned in TokenStatsSpec): every field is
  * bit-identical to its builtin twin —
  *  - n_tokens      == size(split(text, " "))
  *  - stop_hits     == size(filter(split(text," "), w -> w.isin(en)))
  *  - de_hits/fr_hits — same for the de/fr marker lists
  *  - stop_distinct == size(array_intersect(array_distinct(toks), en))
  *  - clean_chars   == length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))
  *    (every allowed char is single-byte ASCII, so the byte scan counts
  *    exactly the code points the negated-class replace keeps; measured
  *    r18: Spark's RegExpReplace path cost ~0.8 ms/row on this corpus —
  *    ~30× the raw java.util.regex cost — and dominated t01's task CPU)
  *  - n_distinct    == size(array_distinct(split(text, " ")))
  * The scan splits on the raw UTF-8 BYTE 0x20: a space can never be a
  * continuation byte of a multi-byte sequence, so byte-splitting is
  * exactly `split(text, " ")` (Java's single-char fast path, limit -1,
  * trailing empties kept), and token identity is UTF8String BYTE
  * equality — the same equality `array_distinct`/`isin` use — never a
  * lossy String decode.
  */
object TokenStatsExpression {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Struct column of fused token statistics. `withDistinct` adds the
    * n_distinct field (a per-row hash set — only paid where a distinct
    * ratio is actually consumed). */
  def tokenStats(text: Column, withDistinct: Boolean): Column =
    column(TokenStats(expression(text), withDistinct))

  // Marker lists (must stay in sync with TextFunctions.Stopwords /
  // TextFunctions.LanguageMarkers — cross-pinned in TokenStatsSpec).
  private[graft] val EnWords =
    Seq("the", "a", "of", "and", "to", "in")
  private[graft] val DeWords =
    Seq("der", "die", "das", "und", "nicht", "ist")
  private[graft] val FrWords =
    Seq("le", "la", "les", "et", "dans", "est")

  /** token -> packed code: bit0 en, bit1 de, bit2 fr; bits 8+ carry
    * (en word index + 1) for the distinct-stopword bitmask. The three
    * lists are disjoint, so one lookup decides all of them. */
  private val Marks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    EnWords.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(1 | ((i + 1) << 8)))
    }
    DeWords.foreach(w => m.put(UTF8String.fromString(w), Integer.valueOf(2)))
    FrWords.foreach(w => m.put(UTF8String.fromString(w), Integer.valueOf(4)))
    m
  }

  /** Shared by interpreted eval and generated code. One pass over the
    * bytes; token slices are zero-copy views into the input buffer. */
  def compute(s: UTF8String, withDistinct: Boolean): InternalRow = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var nTokens = 0
    var stop = 0
    var de = 0
    var fr = 0
    var enMask = 0
    var clean = 0
    val seen =
      if (withDistinct) new java.util.HashSet[UTF8String](64) else null
    var start = 0
    var i = 0
    while (i <= n) {
      val b = if (i == n) 0x20 else s.getByte(i).toInt & 0xff
      if (b == 0x20) {
        if (i < n) clean += 1 // the space itself is an allowed char
        val tok = UTF8String.fromAddress(base, off + start, i - start)
        nTokens += 1
        if (seen != null) { seen.add(tok); () }
        val c = Marks.get(tok)
        if (c != null) {
          val v = c.intValue()
          if ((v & 1) != 0) { stop += 1; enMask |= 1 << ((v >>> 8) - 1) }
          else if ((v & 2) != 0) de += 1
          else fr += 1
        }
        start = i + 1
      } else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
                 (b >= '0' && b <= '9')) {
        clean += 1
      }
      i += 1
    }
    val sd = Integer.bitCount(enMask)
    if (withDistinct)
      new GenericInternalRow(
        Array[Any](nTokens, stop, de, fr, sd, clean, seen.size))
    else
      new GenericInternalRow(Array[Any](nTokens, stop, de, fr, sd, clean))
  }

  /** NULL text → every field -1, mirroring the builtin twins under
    * the session's legacy sizeOfNull semantics (`size(split(NULL))`
    * is -1, not NULL) so every downstream ratio reproduces the
    * builtin arithmetic bit-for-bit on null inputs too. */
  private val NullRowLite: InternalRow =
    new GenericInternalRow(Array[Any](-1, -1, -1, -1, -1, -1))
  private val NullRowFull: InternalRow =
    new GenericInternalRow(Array[Any](-1, -1, -1, -1, -1, -1, -1))
  def nullRow(withDistinct: Boolean): InternalRow =
    if (withDistinct) NullRowFull else NullRowLite
}

/** See [[TokenStatsExpression]]. Plain case class (no array fields),
  * so canonicalization is structural and whole-stage codegen's
  * subexpression elimination collapses the N per-metric instances a
  * projection builds into ONE kernel call per row. */
case class TokenStats(child: Expression, withDistinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = {
    val base = Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("stop_hits", IntegerType, nullable = false),
      StructField("de_hits", IntegerType, nullable = false),
      StructField("fr_hits", IntegerType, nullable = false),
      StructField("stop_distinct", IntegerType, nullable = false),
      StructField("clean_chars", IntegerType, nullable = false))
    StructType(
      if (withDistinct)
        base :+ StructField("n_distinct", IntegerType, nullable = false)
      else base)
  }

  override def prettyName: String = "token_stats"

  // never null: NULL text maps to the all-(-1) sentinel row (legacy
  // sizeOfNull semantics — see TokenStatsExpression.nullRow)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TokenStatsExpression.nullRow(withDistinct)
    else TokenStatsExpression.compute(v.asInstanceOf[UTF8String], withDistinct)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        InternalRow ${ev.value} = ${childGen.isNull} ?
          graft.functions.TokenStatsExpression.nullRow($withDistinct) :
          graft.functions.TokenStatsExpression.compute(
            ${childGen.value}, $withDistinct);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

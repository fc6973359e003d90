package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → word-bigram shingle → polynomial hash → distinct
  * in one codegen loop over the text. Replaces a four-operator chain
  * of interpreted higher-order functions on the dedup hot path while
  * computing exactly `distinct(polyHash(tok[i] + " " + tok[i+1]))` —
  * the same multiset the DuckDB oracle derives with
  * list_distinct/list_transform (first-occurrence order).
  */
object ShingleExpression {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def bigramShingleHashes(text: Column): Column =
    column(BigramShingleHashes(expression(text)))

  /** Distinct polynomial hashes of word n-gram shingles — the general
    * form of [[bigramShingleHashes]] for contamination-style checks
    * that need longer, rarer shingles. */
  def ngramShingleHashes(text: Column, n: Int): Column =
    column(NGramShingleHashes(expression(text), n))

  /** Feature-hashing bucket counts (shared by interpreted eval and
    * generated code): empty tokens are skipped, every other token
    * increments bucket `polyHash(token) % dim` (the hash is already
    * in [0, 1e9+7), so the mod is non-negative). */
  def computeBuckets(s: String, dim: Int): Array[Long] = {
    val toks = s.split(" ", -1)
    val out = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        out((HashExpressions.polyHashString(toks(i)) % dim).toInt) += 1
      i += 1
    }
    out
  }

  /** Feature-hashing embedding column (see [[HashBucketCounts]]). */
  def hashBucketCounts(text: Column, dim: Int): Column =
    column(HashBucketCounts(expression(text), dim))

  /** n-gram variant of [[compute]]: distinct
    * `polyHash(tok[i] + " " + … + " " + tok[i+n-1])` in first-occurrence
    * order, matching the DuckDB list_distinct/list_transform twin. */
  def computeN(s: String, n: Int): Array[Long] = {
    val toks = s.split(" ", -1)
    if (toks.length < n) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(HashExpressions.polyHashString(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** NON-distinct word bigrams as space-joined strings, in order —
    * the doc-gram frame of LM-style scoring (t19/t20), where every
    * occurrence counts. One fused loop; the transform/sequence/
    * element_at HOF formulation it replaces is interpreted per
    * element. */
  def bigramStrings(text: Column): Column =
    column(BigramStrings(expression(text)))

  /** Shared eval/codegen kernel for [[BigramStrings]]. */
  def computeBigramStrings(s: String): Array[Any] = {
    val toks = s.split(" ", -1)
    if (toks.length < 2) return Array.empty[Any]
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    out
  }

  /** Shared by interpreted eval and the generated code. Hashing folds
    * Unicode code points (via [[HashExpressions.polyHashString]]) so
    * non-BMP text matches the builtin/DuckDB formulations. */
  def compute(s: String): Array[Long] = {
    val toks = s.split(" ", -1)
    if (toks.length < 2) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < toks.length - 1) {
      seen.add(HashExpressions.polyHashString(toks(i) + " " + toks(i + 1)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

case class BigramStrings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bigram_strings"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleExpression.computeBigramStrings(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleExpression.computeBigramStrings($c.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BigramStrings =
    copy(child = newChild)
}

case class BigramShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleExpression.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleExpression.compute($c.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BigramShingleHashes =
    copy(child = newChild)
}

/** Feature-hashing embedding ("hashing trick"): token → bucket
  * `polyHash(token) % dim`, per-bucket occurrence counts — a
  * deterministic text→vector projection that feeds the similarity
  * operators without an external model. One fused loop per row
  * (tokenize → hash → count), no HOF chain, no shuffle.
  */
case class HashBucketCounts(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, "embedding dim must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_bucket_counts"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleExpression.computeBuckets(
      input.asInstanceOf[UTF8String].toString, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleExpression.computeBuckets($c.toString(), $dim));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HashBucketCounts =
    copy(child = newChild)
}

case class NGramShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleExpression.computeN(input.asInstanceOf[UTF8String].toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleExpression.computeN($c.toString(), $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NGramShingleHashes =
    copy(child = newChild)
}

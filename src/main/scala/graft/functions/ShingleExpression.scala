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

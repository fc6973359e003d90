package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave — the sort key behind multi-column
  * data clustering (`OPTIMIZE ... ZORDER BY` in lakehouse engines):
  * sorting rows by the interleaved bits of two dimensions makes
  * parquet row-group/file min-max statistics selective for BOTH
  * columns, where a lexicographic sort is only selective for its
  * leading column.
  *
  * Contract: dimensions are read as their low 32 bits and must be
  * non-negative for the curve to preserve locality (ids, epoch
  * days/hours, bucket numbers); map signed domains with an offset
  * first.
  */
object ZOrderExpression {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Z-order key of two dimensions (casts to long internally). */
  def zOrder2(a: Column, b: Column): Column =
    column(ZOrderLong(expression(a.cast("long")), expression(b.cast("long"))))

  /** Interleave the low 32 bits of `a` (even, higher) and `b` (odd):
    * out bit 2i+1 = a bit i, out bit 2i = b bit i. Shared by the
    * interpreted eval and the generated code. */
  def interleave2(a: Long, b: Long): Long = {
    var out = 0L
    var bit = 31
    while (bit >= 0) {
      out = (out << 1) | ((a >>> bit) & 1L)
      out = (out << 1) | ((b >>> bit) & 1L)
      bit -= 1
    }
    out
  }
}

case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // children must already be LongType — the zOrder2 wrapper and the
  // SQL registration insert the casts
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpression.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderExpression.interleave2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderLong =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen vector kernels for the similarity operators. The built-in
  * `zip_with` + `aggregate` formulation is evaluated interpreted per
  * element; these fold float arrays in a tight JVM loop, promoting
  * each element to double exactly like the explicit-cast formulation
  * (and the DuckDB oracle), with identical left-to-right order — so
  * results are bit-identical.
  */
object VectorExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Sequential-fold dot product of two float arrays, in double. */
  def dotF(a: Column, b: Column): Column =
    column(FloatDotProduct(expression(a), expression(b)))

  /** Sign-random-projection LSH bucket over `planes` deterministic
    * pseudo-hyperplanes: plane j, dim i has sign +1 iff
    * ((j*73 + i*i*31 + 7) % 1000003) % 2 == 0.
    */
  def lshBucketF(v: Column, planes: Int): Column =
    column(FloatLshBucket(expression(v), planes))
}

case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  // NULL on length mismatch or null elements (below) — nullable even
  // when both children are non-nullable arrays
  override def nullable: Boolean = true

  /** Matches the builtin `aggregate(zip_with(...))` twin exactly:
    * mismatched lengths (zip_with pads with NULL) and null elements
    * both yield NULL, not a garbage partial sum. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

case class FloatLshBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "float_lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0
    var j = 0
    while (j < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val sign = if (((j * 73 + i * i * 31 + 7) % 1000003) % 2 == 0) 1.0 else -1.0
        proj += sign * v.getFloat(i).toDouble
        i += 1
      }
      if (proj > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val proj = ctx.freshName("proj")
      val sign = ctx.freshName("sign")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $c.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < $planes; $j++) {
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $sign = ((($j * 73 + $i * $i * 31 + 7) % 1000003) % 2 == 0) ? 1.0 : -1.0;
         |    $proj += $sign * ((double) $c.getFloat($i));
         |  }
         |  if ($proj > 0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatLshBucket =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot hash paths of the dedup
  * family. Spark evaluates higher-order functions (`transform`,
  * `aggregate`) interpreted, per element, with boxed lambda variables —
  * profiling showed MinHash signatures over 5k docs spending ~24 s
  * there. These expressions compile to tight JVM loops inside
  * WholeStageCodegen (~100× less per-element overhead) while computing
  * EXACTLY the same function as the built-in formulation (and the
  * DuckDB oracle): a left-fold polynomial hash mod 1e9+7 and k affine
  * min-hash permutations.
  */
object HashExpressions {
  val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. Folds Unicode CODE
    * POINTS (not UTF-16 units) so non-BMP characters hash identically
    * to the builtin split+ascii formulation and the DuckDB oracle.
    */
  def polyHashString(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Shared eval/codegen kernel for [[LshBandKeys]]: slice a MinHash
    * signature into `bands` keys of `rows` consecutive values joined by
    * '_' — byte-identical to the builtin
    * `concat_ws("_", get(sig, j*rows+r).cast("string") ...)` chain it
    * replaces (Long.toString == cast-to-string for longs). Signatures
    * shorter than bands*rows yield an EMPTY array: the builtin's get()
    * would produce nulls that concat_ws silently drops, collapsing
    * every short doc into one shared bucket — an all-pairs blowup the
    * callers guard against with a size filter; the kernel makes the
    * guard intrinsic (posexplode of an empty array emits no rows).
    */
  def bandKeysFromSig(arr: ArrayData, bands: Int, rows: Int): ArrayData = {
    if (arr.numElements() < bands * rows)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      val sb = new java.lang.StringBuilder
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('_')
        sb.append(arr.getLong(j * rows + r))
        r += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Shared eval/codegen kernel for [[SimHash64Bands]]: one pass over
    * the token hashes updating all 64 majority-vote counters (bit b
    * votes on the lowest bit of permutation h_b(x) = ((2b+1)x + 17b+3)
    * mod 1e9+7), then packs them into 4×16-bit band values. EXACTLY
    * the builtin HOF formulation's function — which evaluates 64
    * interpreted aggregate-over-transform chains per row (measured
    * ~6× the whole dd11 query cost at sf0.1); this is one tight loop.
    */
  def simhash64BandsKernel(arr: ArrayData): ArrayData = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var b = 0
      while (b < 64) {
        val h = ((2L * b + 1) * x + (17L * b + 3)) % Mod
        if ((h & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    val bands = new Array[Any](4)
    var k = 0
    while (k < 4) {
      var v = 0
      var t = 0
      while (t < 16) {
        if (votes(k * 16 + t) > 0) v |= (1 << t)
        t += 1
      }
      bands(k) = v
      k += 1
    }
    new GenericArrayData(bands)
  }

  /** Shared eval/codegen kernel for [[SimHash16]]: 16-bit majority
    * vote where bit b votes on bit b of each token hash directly (the
    * teaching variant — no per-bit permutation; the token hash's low
    * 16 bits carry the signal). One pass, 16 counters. */
  def simhash16Kernel(arr: ArrayData): Int = {
    val votes = new Array[Int](16)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var b = 0
      while (b < 16) {
        if (((x >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var v = 0
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) v |= (1 << b)
      b += 1
    }
    v
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Polynomial string hash: fold(acc*31 + charCode) mod 1e9+7. */
  def polyHash(c: Column): Column = column(PolyHash(expression(c)))

  /** MinHash signature: array<long> token hashes → array<long> of k
    * mins of h_i(x) = ((2i+1)x + 17i+3) mod 1e9+7. */
  def minHashSig(c: Column, k: Int): Column =
    column(MinHashSig(expression(c), k))

  /** LSH band keys: array<long> signature → array<string> of `bands`
    * keys ('_'-joined groups of `rows` values). */
  def lshBandKeys(c: Column, bands: Int, rows: Int): Column =
    column(LshBandKeys(expression(c), bands, rows))

  /** 64-bit SimHash as 4×16-bit band values: array<long> token hashes
    * → array<int>(4). */
  def simHash64Bands(c: Column): Column =
    column(SimHash64Bands(expression(c)))

  /** Count of positions where two long-array signatures agree —
    * the codegen twin of
    * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)),
    *  0, _+_)` (r18: that chain ran INTERPRETED per candidate pair in
    * minhashBandPairs, the shared core of dd03/dd08/dd15/t11/t23/t27).
    * Matches the builtin exactly: positions past the shorter array
    * (zip_with null-pads) and null elements contribute 0; a NULL
    * array yields NULL. */
  def sigMatchCount(a: Column, b: Column): Column =
    column(SigMatchCount(expression(a), expression(b)))

  /** Shared by interpreted eval and generated code. */
  def sigMatchKernel(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }

  /** 16-bit SimHash: array<long> token hashes → int. */
  def simHash16(c: Column): Column =
    column(SimHash16(expression(c)))
}

case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    HashExpressions.polyHashString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.HashExpressions.polyHashString($c.toString());
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var i = 0
      while (i < k) {
        val h = ((2L * i + 1) * x + (17L * i + 3)) % HashExpressions.Mod
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $c.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = ((2L * $i + 1) * $x + (17L * $i + 3)) % ${HashExpressions.Mod}L;
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash banding — see
  * [[HashExpressions.simhash64BandsKernel]]. */
case class SimHash64Bands(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash64_bands"

  override def nullSafeEval(input: Any): Any =
    HashExpressions.simhash64BandsKernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.HashExpressions.simhash64BandsKernel($c);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash64Bands =
    copy(child = newChild)
}

/** Codegen'd 16-bit SimHash — see [[HashExpressions.simhash16Kernel]]. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    HashExpressions.simhash16Kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.HashExpressions.simhash16Kernel($c);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Codegen'd LSH banding. The builtin formulation —
  * `transform(sequence(0, bands-1), j => concat_ws("_", get(...)))` —
  * is a higher-order function, which Spark evaluates INTERPRETED per
  * element with boxed lambda variables; this stays inside
  * WholeStageCodegen as one static call per row.
  */
case class LshBandKeys(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(input: Any): Any =
    HashExpressions.bandKeysFromSig(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.HashExpressions.bandKeysFromSig(
         |  $c, $bands, $rows);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

/** See [[HashExpressions.sigMatchCount]]. */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    HashExpressions.sigMatchKernel(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.HashExpressions.sigMatchKernel($a, $b);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

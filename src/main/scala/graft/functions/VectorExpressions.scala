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
    * pseudo-hyperplanes: plane jj = offset + j, dim i has sign +1 iff
    * (((jj*73 + i*i*31 + 7) % p) * ((jj*31 + i*911 + 3) % p) % p) % 2
    * == 0 with p = 1000003 (the PRODUCT of two linear forms — a
    * single small form stays under the modulus, its parity
    * degenerates to parity(jj + i), and every plane measures the same
    * projection; each factor is pre-reduced mod p so the product
    * stays < 2^40 at ANY dim instead of wrapping Long around
    * dim ~100k). `offset` selects
    * an independent plane family — hash table t of an OR-amplified
    * multi-table index uses offset = t·planes.
    */
  def lshBucketF(v: Column, planes: Int, offset: Int = 0): Column =
    column(FloatLshBucket(expression(v), planes, offset))

  /** max |x_i| of a float array, in double (0.0 for an empty array). */
  def maxAbsF(v: Column): Column = column(FloatMaxAbs(expression(v)))

  /** Element-wise float subtraction a − b (float IEEE arithmetic —
    * identical to computing the exact difference in double and
    * rounding to REAL, which is what the DuckDB twin does). NULL on
    * length mismatch. The residual kernel for IVFADC encoding. */
  def subF(a: Column, b: Column): Column =
    column(FloatSubtractArrays(expression(a), expression(b)))

  /** Symmetric int8 quantization: q_i = round(x_i * 127 / maxAbs),
    * half away from zero (matching DuckDB/C++ round, NOT Math.round's
    * half-toward-positive); all zeros when maxAbs == 0. */
  def quantizeInt8(v: Column, maxAbs: Column): Column =
    column(FloatQuantizeInt8(expression(v), expression(maxAbs)))

  /** Exact self dot product of an int8 array as long — integer math,
    * so no cross-engine float reduction-order concerns at all. */
  def int8SelfDot(q: Column): Column = column(Int8SelfDot(expression(q)))

  /** Fused PQ-subspace argmin: the codebook entry index j minimizing
    * (round(‖c_j‖² − 2·x·c_j, 6), j) over the dsub-wide subvector of
    * `v` starting at `offset` (0-based). One kernel replaces the
    * `greatest(struct(round(…dot(slice…)…)))` k-way expression tree:
    * that tree hands whole-stage codegen a common subexpression (the
    * shared slice / self-dot) that becomes a local in `apply()` while
    * `Greatest`'s split functions still reference it — Janino rejects
    * the generated class ("project_isNull_N is not an rvalue") and
    * Spark silently interprets. The fused kernel has no shared
    * subtrees, no per-subspace array copy, and one tight double loop.
    * The row-constant ‖x‖² term of the ADC decomposition cancels in
    * the argmin and is dropped; the oracle twins select codes with the
    * same ‖c‖²−2·x·c expression (LlmQueries e06/ivfPqAdcCtes `dsel`).
    * Rounding replicates Spark's `round(_, 6)` on DOUBLE exactly
    * (BigDecimal.valueOf → HALF_UP; NaN/Inf passed through). */
  def pqArgminF(v: Column, offset: Int, codebook: Seq[Array[Float]]): Column =
    column(FloatPqArgmin(expression(v), offset,
      codebook.map(_.clone()).toArray,
      codebook.map { c =>
        var acc = 0.0; var i = 0
        while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
        acc
      }.toArray))

  /** Fused nearest-centroid cell id (r17, guide §1.2 per-task work):
    * argmax over cells of (round(dot(v,cent)/(vnorm·‖cent‖), 6), −cell)
    * — the IVF coarse assignment. One kernel replaces the
    * `greatest(struct(round(dotF(v, lit(cent)))…))` nlist-way
    * expression tree, the same repair [[pqArgminF]] applied to the PQ
    * subspace argmin: the struct form allocates nlist InternalRows and
    * nlist literal-array dots per input row through generic ArrayData
    * accessors (measured 6.7 s task CPU for 2 000 rows × 32 cells at
    * dim 64 once spread over 32 tasks — per-task JIT never warms the
    * giant generated method), while the fused loop is
    * O(nlist·dim) primitive float math. Bit-identical by construction:
    * the score is rounded with Spark's exact `round(_, 6)` replication
    * (BigDecimal HALF_UP, NaN/Inf pass through — the [[FloatPqArgmin]]
    * discipline), compared under Spark's double ordering (`==`
    * short-circuit so ±0.0 tie, NaN greatest), ties keep the smallest
    * cell, a null score (length mismatch / null element, dotF's
    * discipline) loses to any non-null, and all-null falls back to
    * cell 0 — exactly `greatest`'s negcell tie-break. Null INPUTS
    * (vec or vnorm) also yielded cell 0 in the struct form (every
    * score null), reproduced by the coalesce. Equivalence vs the
    * struct form is pinned in CodegenGuardSpec. */
  def nearestCellF(vec: Column, vnorm: Column,
                   centroids: Seq[Array[Float]]): Column = {
    val cents = centroids.map(_.clone()).toArray
    val norms = centroids.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(acc)
    }.toArray
    val k = column(FloatNearestCell(expression(vec), expression(vnorm),
      cents, norms))
    org.apache.spark.sql.functions.coalesce(k,
      org.apache.spark.sql.functions.lit(0))
  }
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

case class FloatLshBucket(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "float_lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0
    var j = 0
    while (j < planes) {
      val jj = offset + j
      var proj = 0.0
      var i = 0
      while (i < n) {
        val sign = if (((jj * 73L + i.toLong * i * 31L + 7L) % 1000003L) *
          ((jj * 31L + i * 911L + 3L) % 1000003L) % 1000003L % 2L == 0L)
          1.0 else -1.0
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
      val jj = ctx.freshName("jj")
      val proj = ctx.freshName("proj")
      val sign = ctx.freshName("sign")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $c.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < $planes; $j++) {
         |  int $jj = $offset + $j;
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $sign = (((($jj * 73L + ((long) $i) * $i * 31L + 7L) % 1000003L) * (($jj * 31L + $i * 911L + 3L) % 1000003L)) % 1000003L % 2L == 0L) ? 1.0 : -1.0;
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

case class FloatMaxAbs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_max_abs"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = Math.abs(v.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val a = ctx.freshName("a")
      s"""
         |int $n = $c.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = Math.abs((double) $c.getFloat($i));
         |  if ($a > $m) $m = $a;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatMaxAbs =
    copy(child = newChild)
}

object FloatQuantizeInt8 {
  /** Shared eval/codegen kernel. Rounds HALF AWAY FROM ZERO —
    * `Math.round` would round -2.5 up to -2 where DuckDB's std::round
    * gives -3; floor(|t|+0.5)*sign(t) matches the C++ semantics. */
  def quantize(v: ArrayData, maxAbs: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    if (maxAbs != 0.0) {
      var i = 0
      while (i < n) {
        val t = v.getFloat(i).toDouble * 127.0 / maxAbs
        out(i) = (Math.floor(Math.abs(t) + 0.5) * Math.signum(t)).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class FloatQuantizeInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "float_quantize_int8"

  override def nullSafeEval(v: Any, m: Any): Any =
    FloatQuantizeInt8.quantize(v.asInstanceOf[ArrayData],
      m.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"""
         |${ev.value} = graft.functions.FloatQuantizeInt8.quantize($v, $m);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatQuantizeInt8 =
    copy(left = newLeft, right = newRight)
}

object FloatSubtractArrays {
  /** Shared eval/codegen kernel: float-arithmetic element-wise a − b.
    * Each float subtraction is correctly rounded (IEEE), which equals
    * exact-in-double subtraction of two floats then CAST AS REAL —
    * the cross-engine contract with the DuckDB oracle. Returns null
    * on length mismatch (mirrors the dotF discipline). */
  def subtract(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = a.getFloat(i) - b.getFloat(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class FloatSubtractArrays(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "float_sub_arrays"
  // null on length mismatch even for non-nullable children
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    FloatSubtractArrays.subtract(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.FloatSubtractArrays.subtract($a, $b);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSubtractArrays =
    copy(left = newLeft, right = newRight)
}

object FloatPqArgmin {
  /** Shared eval/codegen kernel — see [[VectorExpressions.pqArgminF]].
    * Returns null (Integer) when the subvector window exceeds the
    * array or touches a null element, mirroring dotF's discipline. */
  def argmin(v: ArrayData, offset: Int, books: Array[Array[Float]],
             cc: Array[Double]): Integer = {
    val k = books.length
    val dsub = books(0).length
    if (offset + dsub > v.numElements()) return null
    var i = 0
    while (i < dsub) {
      if (v.isNullAt(offset + i)) return null
      i += 1
    }
    var best = 0
    var bestD = 0.0
    var j = 0
    while (j < k) {
      val c = books(j)
      var dot = 0.0
      i = 0
      while (i < dsub) {
        dot += v.getFloat(offset + i).toDouble * c(i).toDouble
        i += 1
      }
      val raw = cc(j) - 2.0 * dot
      // replicate Spark's round(double, 6): NaN/Inf pass through,
      // else BigDecimal.valueOf (Double.toString canonical) HALF_UP
      val d =
        if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // a NaN bestD is replaceable by any finite d: `d < NaN` is
      // always false, so without the third clause a NaN j=0 distance
      // would win over every finite centroid — while the SQL oracle's
      // ORDER BY sorts NaN last (bestD != bestD ⇔ bestD is NaN)
      if (j == 0 || d < bestD || (bestD != bestD && d == d)) {
        bestD = d; best = j
      }
      j += 1
    }
    Integer.valueOf(best)
  }
}

case class FloatPqArgmin(child: Expression, offset: Int,
                         codebook: Array[Array[Float]],
                         selfDots: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "float_pq_argmin"
  // null when the subspace window runs past the array (dotF's
  // length-mismatch discipline) — nullable even for non-null children
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FloatPqArgmin.argmin(input.asInstanceOf[ArrayData], offset, codebook,
      selfDots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val booksRef = ctx.addReferenceObj("pqBooks", codebook, "float[][]")
      val ccRef = ctx.addReferenceObj("pqSelfDots", selfDots, "double[]")
      val r = ctx.freshName("r")
      s"""
         |Integer $r = graft.functions.FloatPqArgmin.argmin($c, $offset, $booksRef, $ccRef);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatPqArgmin =
    copy(child = newChild)

  // r18 (ADVICE r17): case-class equality on Array fields is
  // reference-based, so two semantically identical kernels (the
  // factory clones its codebook per call) never compare equal —
  // canonicalization can't dedup them and subexpression elimination /
  // exchange reuse silently give up. Content-based equality restores
  // what the old typedLit-literal form had. No false positives: deep
  // content equality implies identical eval.
  override def equals(o: Any): Boolean = o match {
    case f: FloatPqArgmin =>
      child == f.child && offset == f.offset &&
        java.util.Arrays.deepEquals(
          codebook.asInstanceOf[Array[AnyRef]],
          f.codebook.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(selfDots, f.selfDots)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(offset),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        codebook.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(selfDots)))
}

object FloatNearestCell {
  /** Shared eval/codegen kernel — see [[VectorExpressions.nearestCellF]]
    * for the exact-equivalence argument vs the greatest-of-structs
    * form. `norms` are the centroids' precomputed L2 norms (the same
    * sequential double fold as `sqrt(dotF(c, c))`). */
  def nearest(v: ArrayData, vnorm: Double, cents: Array[Array[Float]],
              norms: Array[Double]): Int = {
    val n = v.numElements()
    var best = 0
    var bestC = 0.0
    var haveBest = false
    var cell = 0
    while (cell < cents.length) {
      val c = cents(cell)
      var isNull = n != c.length
      var dot = 0.0
      var i = 0
      while (!isNull && i < n) {
        if (v.isNullAt(i)) isNull = true
        else { dot += v.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      }
      val div = vnorm * norms(cell)
      // non-ANSI Spark division-by-zero yields NULL (the engine's
      // pinned session semantics — ansi.enabled=false everywhere), so
      // a zero divisor must null the score, never produce NaN/Inf
      if (div == 0.0) isNull = true
      if (!isNull) {
        val raw = dot / div
        // Spark's round(double, 6): NaN/Inf pass, else BigDecimal
        // HALF_UP (canonical Double.toString form)
        val s =
          if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
          else java.math.BigDecimal.valueOf(raw)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (!haveBest) { best = cell; bestC = s; haveBest = true }
        else {
          // SQLOrderingUtil.compareDoubles: == short-circuit (±0.0
          // tie), else Double.compare (NaN greatest); strict-greater
          // replacement keeps the smallest cell on ties
          val cmp = if (s == bestC) 0 else java.lang.Double.compare(s, bestC)
          if (cmp > 0) { best = cell; bestC = s }
        }
      }
      cell += 1
    }
    best // all-null scores ⇒ 0, the struct form's negcell fallback
  }
}

case class FloatNearestCell(left: Expression, right: Expression,
                            centroids: Array[Array[Float]],
                            norms: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "float_nearest_cell"
  // non-null for non-null inputs (all-null scores fall back to cell 0
  // inside the kernel); null inputs propagate and the column factory's
  // coalesce maps them to 0, matching the struct form
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(v: Any, vn: Any): Any =
    FloatNearestCell.nearest(v.asInstanceOf[ArrayData],
      vn.asInstanceOf[Double], centroids, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, vn) => {
      val centsRef = ctx.addReferenceObj("nearCents", centroids, "float[][]")
      val normsRef = ctx.addReferenceObj("nearNorms", norms, "double[]")
      s"""
         |${ev.value} = graft.functions.FloatNearestCell.nearest($v, $vn, $centsRef, $normsRef);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatNearestCell =
    copy(left = newLeft, right = newRight)

  // content-based equality — see FloatPqArgmin's note (ADVICE r17)
  override def equals(o: Any): Boolean = o match {
    case f: FloatNearestCell =>
      left == f.left && right == f.right &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          f.centroids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(norms, f.norms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centroids.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(norms)))
}

case class Int8SelfDot(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int8_self_dot"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = q.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = q.getByte(i).toLong
      acc += b * b
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      s"""
         |int $n = $c.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $b = (long) $c.getByte($i);
         |  $acc += $b * $b;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8SelfDot =
    copy(child = newChild)
}

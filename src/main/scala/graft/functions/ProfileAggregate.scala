package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable per-group state of [[ColumnProfileAgg]]: a value→count map
  * (keys are double bits of the zero-normalized value, so the map
  * costs one primitive-keyed update per row, NaN is canonicalized by
  * doubleToLongBits, and -0.0 folds into 0.0 exactly like the
  * normalized grouping keys behind `countDistinct`) plus a null
  * counter, plus RAW-bit min/max (the map's normalized keys would
  * report +0.0 where the builtin `min`/`max` surface -0.0 when -0.0
  * is the strict extremum — extrema are tracked outside the map with
  * the builtin's own tie rule: first-seen wins on `==`-equal values,
  * exactly `Least`/`Greatest` over SQLOrderingUtil.compareDoubles).
  */
final class ProfileBuffer {
  val counts = new scala.collection.mutable.LongMap[Long](64)
  var nullCount = 0L
  var hasValue = false
  var minV = 0.0d
  var maxV = 0.0d
}

/** One-pass exact column profile: a single TypedImperativeAggregate
  * whose ONE value-count map answers everything the profiling family
  * (a08) needs — null count, exact distinct count, min/max, exact
  * interpolated percentiles, and the decimal-accumulated sum/sum-of-
  * squares. Composed from builtins the same statistics cost three
  * independent heavyweights in one Aggregate:
  *
  *  - `percentile(c, ...)` builds this exact map and throws it away;
  *  - `countDistinct(c)` plans an Expand (row duplication per distinct
  *    aggregate) plus a second aggregation keyed on the values;
  *  - `sum(cast(c AS decimal))` pays a per-ROW Decimal allocation and
  *    scale-aligned add in the codegen hash aggregate (~0.3 s per
  *    aggregate per 600k rows, measured r7 — the dominant cost of the
  *    d16 family).
  *
  * Here the per-row work is ONE primitive hash-map update; every
  * derived statistic is computed at eval over the (distinct values)-
  * sized map — in particular the decimal sums become one
  * `Decimal(v)·count` multiply-add PER DISTINCT VALUE instead of one
  * decimal add per row, which is exact (decimal arithmetic is
  * associative/order-free) and identical to Spark's
  * `sum(cast(x AS decimal(30,6)))`: both round each double to scale 6
  * HALF_UP via the canonical `BigDecimal.valueOf` string
  * representation before summing. Percentile interpolation replicates
  * the builtin's formula (position = p·(N−1) into the cumulative
  * counts of the sorted values, linear interpolation between the
  * bracketing keys); GraftFunctionsSpec pins bit-equality of every
  * output against the builtin composition on real and adversarial
  * data.
  *
  * Scale shape: partial states are (distinct, count) maps — map-side
  * combinable, mergeable by key union, serialized as primitive pairs.
  * State is O(distinct values per column), the same bound the builtin
  * percentile already accepts — and that bound is ENFORCED: the
  * moment a buffer exceeds `maxDistinct` entries (update or merge),
  * the aggregate fails fast with a descriptive error pointing at the
  * approx profile family (a15: approx_count_distinct +
  * percentile_approx) instead of letting a near-unique column at
  * 100 TB OOM an executor mid-merge. The default cap
  * ([[ProfileAggregate.DefaultMaxDistinct]], 64M entries ≈ 1 GiB of
  * serialized partial per column) is far above any column exact
  * profiling is the right tool for; callers that genuinely want a
  * bigger exact map pass their own cap.
  *
  * Overflow note: Spark's decimal(30,6) sum NULLs on overflow in
  * non-ANSI mode; this aggregate's unbounded BigDecimal accumulation
  * cannot overflow. The divergence needs a ≥1e24 column sum — not a
  * realistic profile input; documented rather than emulated.
  */
case class ColumnProfileAgg(
    child: Expression,
    percentages: Seq[Double],
    maxDistinct: Int = ProfileAggregate.DefaultMaxDistinct,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ProfileBuffer]
  with UnaryLike[Expression] {

  // no ImplicitCastInputTypes (AbstractDataType is private[sql]) — the
  // companion's columnProfile helper casts its input to double, and
  // update() would fail loudly on any other type
  require(percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages must be in [0, 1], got ${percentages.mkString(", ")}")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("null_count", LongType, nullable = false),
    StructField("distinct_count", LongType, nullable = false),
    StructField("sum6", DoubleType),      // decimal(30,6)-accumulated
    StructField("sumsq12", DoubleType),   // decimal(38,12)-accumulated x*x
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("pcts", ArrayType(DoubleType))))

  override def createAggregationBuffer(): ProfileBuffer = new ProfileBuffer

  // Spark's double comparison (SQLOrderingUtil.compareDoubles): -0.0
  // == 0.0 compares equal, NaN is greatest; Least/Greatest keep the
  // incumbent on ties, so first-seen wins among ==-equal bit patterns
  @inline private def cmpD(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  private def checkCap(b: ProfileBuffer): Unit =
    if (b.counts.size > maxDistinct)
      throw new IllegalStateException(
        s"column_profile(${child.sql}): exact profile exceeded " +
          s"maxDistinct=$maxDistinct distinct values. Exact distinct/" +
          "percentile state is O(distinct) per column per group and " +
          "would exhaust executor memory before finishing at scale — " +
          "profile high-cardinality columns through the approx family " +
          "instead (a15_profile_approx: approx_count_distinct + " +
          "percentile_approx), or pass an explicit larger cap via " +
          "ProfileAggregate.columnProfile(col, percentages, maxDistinct).")

  override def update(b: ProfileBuffer, input: InternalRow): ProfileBuffer = {
    val v = child.eval(input)
    if (v == null) b.nullCount += 1
    else {
      val d0 = v.asInstanceOf[Double]
      // raw-bit extrema (builtin min/max surface -0.0; the map below
      // can't — its keys are zero-normalized)
      if (!b.hasValue) { b.hasValue = true; b.minV = d0; b.maxV = d0 }
      else {
        if (cmpD(d0, b.minV) < 0) b.minV = d0
        if (cmpD(d0, b.maxV) > 0) b.maxV = d0
      }
      // normalize -0.0 → 0.0 the way grouping keys are normalized
      // (NormalizeFloatingNumbers), so distinct_count matches
      // countDistinct; doubleToLongBits already canonicalizes NaN
      val d = if (d0 == 0.0d) 0.0d else d0
      val bits = java.lang.Double.doubleToLongBits(d)
      b.counts(bits) = b.counts.getOrElse(bits, 0L) + 1L
      if (b.counts.size > maxDistinct) checkCap(b)
    }
    b
  }

  override def merge(a: ProfileBuffer, other: ProfileBuffer): ProfileBuffer = {
    a.nullCount += other.nullCount
    if (other.hasValue) {
      if (!a.hasValue) { a.hasValue = true; a.minV = other.minV; a.maxV = other.maxV }
      else {
        if (cmpD(other.minV, a.minV) < 0) a.minV = other.minV
        if (cmpD(other.maxV, a.maxV) > 0) a.maxV = other.maxV
      }
    }
    other.counts.foreachEntry { (bits, c) =>
      a.counts(bits) = a.counts.getOrElse(bits, 0L) + c
    }
    checkCap(a)
    a
  }

  override def eval(b: ProfileBuffer): Any = {
    if (b.counts.isEmpty)
      return InternalRow(b.nullCount, 0L, null, null, null, null, null)
    // one sort of the distinct values serves min/max/percentiles
    val entries = b.counts.toArray
    java.util.Arrays.sort(entries, Ordering.by[(Long, Long), Double] {
      case (bits, _) => java.lang.Double.longBitsToDouble(bits)
    })
    val k = entries.length
    val values = new Array[Double](k)
    val cum = new Array[Long](k)
    var total = 0L
    var sum6 = JBigDecimal.ZERO
    var sumsq12 = JBigDecimal.ZERO
    // the builtin twins this replicates cast NaN/Infinity to NULL under
    // the non-ANSI config (so sums silently EXCLUDE them, and become
    // NULL when no finite value exists) while min/max/percentiles
    // still see the raw doubles — mirror that split instead of letting
    // BigDecimal.valueOf throw NumberFormatException on "NaN"
    var finiteSum = 0L
    var finiteSq = 0L
    var i = 0
    while (i < k) {
      val v = java.lang.Double.longBitsToDouble(entries(i)._1)
      val c = entries(i)._2
      values(i) = v
      total += c
      cum(i) = total
      val cnt = JBigDecimal.valueOf(c)
      // BigDecimal.valueOf = canonical Double.toString representation,
      // matching Spark's Decimal.set(double) rounding base exactly
      if (java.lang.Double.isFinite(v)) {
        finiteSum += c
        sum6 = sum6.add(
          JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
            .multiply(cnt))
      }
      val sq = v * v
      if (java.lang.Double.isFinite(sq)) {
        finiteSq += c
        sumsq12 = sumsq12.add(
          JBigDecimal.valueOf(sq).setScale(12, RoundingMode.HALF_UP)
            .multiply(cnt))
      }
      i += 1
    }
    // builtin percentile semantics: position p·(N−1) into cumulative
    // counts; first index with cum ≥ rank+1 brackets the key; linear
    // interpolation between the bracketing keys
    def keyAtRank(rank: Long): Double = {
      var lo = 0
      var hi = k - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) < rank + 1) lo = mid + 1 else hi = mid
      }
      values(lo)
    }
    val pcts = percentages.map { p =>
      val position = p * (total - 1)
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerKey = keyAtRank(lower)
      if (higher == lower) lowerKey
      else {
        val higherKey = keyAtRank(higher)
        if (higherKey == lowerKey) lowerKey
        else (higher - position) * lowerKey + (position - lower) * higherKey
      }
    }
    InternalRow(b.nullCount, k.toLong,
      if (finiteSum > 0) sum6.doubleValue else null,
      if (finiteSq > 0) sumsq12.doubleValue else null,
      b.minV, b.maxV,
      new GenericArrayData(pcts.toArray))
  }

  override def serialize(b: ProfileBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(40 + b.counts.size * 16)
    val out = new DataOutputStream(bos)
    out.writeLong(b.nullCount)
    out.writeBoolean(b.hasValue)
    out.writeLong(java.lang.Double.doubleToRawLongBits(b.minV))
    out.writeLong(java.lang.Double.doubleToRawLongBits(b.maxV))
    out.writeInt(b.counts.size)
    b.counts.foreachEntry { (bits, c) => out.writeLong(bits); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ProfileBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new ProfileBuffer
    b.nullCount = in.readLong()
    b.hasValue = in.readBoolean()
    b.minV = java.lang.Double.longBitsToDouble(in.readLong())
    b.maxV = java.lang.Double.longBitsToDouble(in.readLong())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      b.counts(in.readLong()) = in.readLong()
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ColumnProfileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ColumnProfileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ColumnProfileAgg =
    copy(child = newChild)
  override def prettyName: String = "column_profile"
}

object ProfileAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Default distinct-value cap per buffer: 64M entries ≈ 1 GiB of
    * serialized partial state per column per group — the loud-failure
    * line between "exact profiling is viable" and "use a15's sketches".
    */
  val DefaultMaxDistinct: Int = 64 * 1024 * 1024

  /** struct(null_count, distinct_count, sum6, sumsq12, min, max, pcts)
    * of a double column, one map per group. Fails fast (naming the
    * a15 approx seam) if a column exceeds `maxDistinct` distinct
    * values rather than OOMing an executor mid-merge. */
  def columnProfile(c: Column, percentages: Seq[Double],
      maxDistinct: Int = DefaultMaxDistinct): Column =
    column(ColumnProfileAgg(expression(c.cast("double")), percentages,
      maxDistinct).toAggregateExpression())
}

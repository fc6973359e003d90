package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mutable per-group state of [[ColumnMomentsAgg]]: a BOUNDED
  * value→count staging map plus the decimal accumulators it flushes
  * into. The map amortizes decimal arithmetic over duplicates (one
  * `Decimal(v)·count` multiply-add per DISTINCT value, the same trick
  * as [[ProfileBuffer]]); whenever it reaches `flushCap` entries it is
  * folded into the BigDecimal sums and cleared, so state is O(flushCap)
  * — constant — no matter how many distinct values the column has.
  * Decimal addition is exact and associative, so any flush schedule
  * yields bit-identical sums.
  */
final class MomentsBuffer {
  val counts = new scala.collection.mutable.LongMap[Long](64)
  var nullCount = 0L
  var finiteSumCnt = 0L // values contributing to sum6
  var finiteSqCnt = 0L  // values whose square contributes to sumsq12
  var sum6: JBigDecimal = JBigDecimal.ZERO
  var sumsq12: JBigDecimal = JBigDecimal.ZERO
}

/** Null counts + decimal-exact sum/sum-of-squares of a double column
  * in CONSTANT state — the drift family's aggregate (d16 needs only
  * per-window null rates, means, and stddevs, i.e. these three
  * numbers; it never needs the O(distinct) percentile/distinct map
  * [[ColumnProfileAgg]] carries, so routing it through the full
  * profile contradicted that class's own "unbounded distinct → use
  * the approx family" guidance).
  *
  * Semantics are the sum-path of [[ColumnProfileAgg]] verbatim —
  * each value rounded to scale 6 (its square to scale 12) HALF_UP via
  * the canonical `BigDecimal.valueOf` double representation, then
  * decimal-summed; NaN/±∞ are excluded exactly like the builtin
  * `sum(cast(x AS decimal))` under non-ANSI (cast → NULL), and the
  * sums are NULL when no finite value contributed. Bit-equality with
  * both the profile aggregate and the builtin composition is pinned
  * in MomentsAggregateSpec.
  *
  * Scale shape: per-row work is one primitive map update (amortizing
  * the decimal arithmetic over duplicate values — for low-cardinality
  * columns like l_quantity/l_discount the expensive ops run once per
  * distinct value, not once per row); the staging map flushes into
  * two BigDecimal accumulators at `flushCap` entries, and partials
  * serialize AFTER flushing, so what ships over the exchange is a
  * fixed ~100 bytes (two decimals + three longs) per column per
  * group regardless of input cardinality.
  */
case class ColumnMomentsAgg(
    child: Expression,
    flushCap: Int = ColumnMomentsAgg.DefaultFlushCap,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuffer]
  with UnaryLike[Expression] {

  require(flushCap > 0, s"flushCap must be positive, got $flushCap")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("null_count", LongType, nullable = false),
    StructField("sum6", DoubleType),      // decimal(30,6)-accumulated
    StructField("sumsq12", DoubleType)))  // decimal(38,12)-accumulated x*x

  override def createAggregationBuffer(): MomentsBuffer = new MomentsBuffer

  /** Fold the staging map into the decimal accumulators and clear it. */
  private def flush(b: MomentsBuffer): Unit = {
    if (b.counts.nonEmpty) {
      b.counts.foreachEntry { (bits, c) =>
        val v = java.lang.Double.longBitsToDouble(bits)
        val cnt = JBigDecimal.valueOf(c)
        if (java.lang.Double.isFinite(v)) {
          b.finiteSumCnt += c
          b.sum6 = b.sum6.add(
            JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
              .multiply(cnt))
        }
        val sq = v * v
        if (java.lang.Double.isFinite(sq)) {
          b.finiteSqCnt += c
          b.sumsq12 = b.sumsq12.add(
            JBigDecimal.valueOf(sq).setScale(12, RoundingMode.HALF_UP)
              .multiply(cnt))
        }
      }
      b.counts.clear()
    }
  }

  override def update(b: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val v = child.eval(input)
    if (v == null) b.nullCount += 1
    else {
      val d0 = v.asInstanceOf[Double]
      // -0.0 and 0.0 contribute identically to every output — fold
      // them (and canonical-NaN via doubleToLongBits) onto one key
      val d = if (d0 == 0.0d) 0.0d else d0
      val bits = java.lang.Double.doubleToLongBits(d)
      b.counts(bits) = b.counts.getOrElse(bits, 0L) + 1L
      if (b.counts.size >= flushCap) flush(b)
    }
    b
  }

  override def merge(a: MomentsBuffer, other: MomentsBuffer): MomentsBuffer = {
    a.nullCount += other.nullCount
    a.finiteSumCnt += other.finiteSumCnt
    a.finiteSqCnt += other.finiteSqCnt
    a.sum6 = a.sum6.add(other.sum6)
    a.sumsq12 = a.sumsq12.add(other.sumsq12)
    other.counts.foreachEntry { (bits, c) =>
      a.counts(bits) = a.counts.getOrElse(bits, 0L) + c
      if (a.counts.size >= flushCap) flush(a)
    }
    a
  }

  override def eval(b: MomentsBuffer): Any = {
    flush(b)
    InternalRow(b.nullCount,
      if (b.finiteSumCnt > 0) b.sum6.doubleValue else null,
      if (b.finiteSqCnt > 0) b.sumsq12.doubleValue else null)
  }

  private def writeDecimal(out: DataOutputStream, d: JBigDecimal): Unit = {
    val unscaled = d.unscaledValue.toByteArray
    out.writeInt(d.scale)
    out.writeInt(unscaled.length)
    out.write(unscaled)
  }

  private def readDecimal(in: DataInputStream): JBigDecimal = {
    val scale = in.readInt()
    val bytes = new Array[Byte](in.readInt())
    in.readFully(bytes)
    new JBigDecimal(new BigInteger(bytes), scale)
  }

  override def serialize(b: MomentsBuffer): Array[Byte] = {
    flush(b) // partials ship as O(1) bytes: three longs + two decimals
    val bos = new ByteArrayOutputStream(96)
    val out = new DataOutputStream(bos)
    out.writeLong(b.nullCount)
    out.writeLong(b.finiteSumCnt)
    out.writeLong(b.finiteSqCnt)
    writeDecimal(out, b.sum6)
    writeDecimal(out, b.sumsq12)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MomentsBuffer
    b.nullCount = in.readLong()
    b.finiteSumCnt = in.readLong()
    b.finiteSqCnt = in.readLong()
    b.sum6 = readDecimal(in)
    b.sumsq12 = readDecimal(in)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ColumnMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ColumnMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ColumnMomentsAgg =
    copy(child = newChild)
  override def prettyName: String = "column_moments"
}

object ColumnMomentsAgg {
  /** 64Ki staging entries ≈ 1 MiB — large enough that low-cardinality
    * columns flush once, small enough that state is trivially bounded. */
  val DefaultFlushCap: Int = 64 * 1024
}

object MomentsAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** struct(null_count, sum6, sumsq12) of a double column in constant
    * state — the profile aggregate's sum path without its O(distinct)
    * map. */
  def columnMoments(c: Column): Column =
    column(ColumnMomentsAgg(expression(c.cast("double")))
      .toAggregateExpression())
}

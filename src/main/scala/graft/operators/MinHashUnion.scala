package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator that unions MinHash signatures: the signature of a
  * UNION of sets is the elementwise minimum of the sets' signatures,
  * so a group's near-dup sketch folds associatively — partial
  * aggregation (map-side combine) works, state is k longs per group,
  * and two groups' Jaccard is estimable from their folded signatures
  * alone. This is the group-level companion to the per-document
  * MinHash in graft.llmdata.DedupFunctions.
  */
class MinHashUnion(k: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      var i = 0
      val n = math.min(k, sig.length)
      while (i < n) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

package graft.dq

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

final case class ColumnProfile(column: String, rowCount: Long,
                               nullCount: Long, distinctCount: Long,
                               mean: Option[Double], stddev: Option[Double],
                               min: Option[Double], max: Option[Double],
                               p25: Option[Double], p50: Option[Double],
                               p75: Option[Double], p95: Option[Double]) {
  def nullRate: Double = if (rowCount == 0) 0.0 else nullCount.toDouble / rowCount
}

/** A8: statistical column profiling. The reference issues 3-4 Spark
  * jobs per column (dq_utils.py:322-366); here every numeric column's
  * full profile — counts, moments, extrema, and all four percentiles —
  * is computed in ONE aggregation job over all columns, which is the
  * difference between O(1) and O(columns) table scans at 100 TB.
  */
object Profiler {

  /** `approx = true` swaps the two unbounded-state aggregates for
    * sketches (the exact↔approx seam, same pattern as a13): exact
    * `percentile` buffers every value of a group in memory and exact
    * COUNT(DISTINCT) expands the shuffle — at 100 TB both are the
    * profiling bottleneck. `percentile_approx` (KLL-style, mergeable,
    * bounded by `accuracy`) and HLL `approx_count_distinct` keep the
    * single-pass profile streaming-sized. The reference profiles with
    * approx_percentile too (dq/dq_utils.py:322-366); the exact default
    * here exists for oracle-parity checks.
    */
  def profile(df: DataFrame, numericCols: Seq[String],
              otherCols: Seq[String] = Nil,
              approx: Boolean = false,
              accuracy: Int = 10000): Seq[ColumnProfile] = {
    def distinctAgg(c: String) =
      if (approx) approx_count_distinct(col(c)).as(s"${c}__distinct")
      else countDistinct(col(c)).as(s"${c}__distinct")
    def pctsAgg(c: String) =
      if (approx)
        percentile_approx(col(c).cast("double"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(accuracy))
          .as(s"${c}__pcts")
      else expr(s"percentile($c, array(0.25D, 0.5D, 0.75D, 0.95D))")
        .as(s"${c}__pcts")
    val aggs = Seq(count(lit(1)).as("__total")) ++
      numericCols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          distinctAgg(c),
          avg(col(c)).as(s"${c}__mean"),
          stddev_samp(col(c)).as(s"${c}__stddev"),
          min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"),
          pctsAgg(c))
      } ++
      otherCols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          distinctAgg(c))
      }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def get(n: String): Option[Double] = {
      val i = row.fieldIndex(n)
      if (row.isNullAt(i)) None else Some(row.getAs[Number](i).doubleValue())
    }
    val total = row.getAs[Long]("__total")
    val numeric = numericCols.map { c =>
      val pcts = {
        val i = row.fieldIndex(s"${c}__pcts")
        if (row.isNullAt(i)) Seq.fill(4)(None: Option[Double])
        else row.getSeq[Double](i).map(Option(_))
      }
      ColumnProfile(c, total, row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"),
        get(s"${c}__mean"), get(s"${c}__stddev"),
        get(s"${c}__min"), get(s"${c}__max"),
        pcts(0), pcts(1), pcts(2), pcts(3))
    }
    val others = otherCols.map { c =>
      ColumnProfile(c, total, row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"),
        None, None, None, None, None, None, None, None)
    }
    numeric ++ others
  }
}

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

  def profile(df: DataFrame, numericCols: Seq[String],
              otherCols: Seq[String] = Nil): Seq[ColumnProfile] = {
    val aggs = Seq(count(lit(1)).as("__total")) ++
      numericCols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"),
          avg(col(c)).as(s"${c}__mean"),
          stddev_samp(col(c)).as(s"${c}__stddev"),
          min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"),
          expr(s"percentile($c, array(0.25D, 0.5D, 0.75D, 0.95D))")
            .as(s"${c}__pcts"))
      } ++
      otherCols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"))
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

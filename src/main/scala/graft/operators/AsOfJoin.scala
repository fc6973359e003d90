package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join: for each left row, the single right row with
  * the greatest right-ts <= left-ts within the same key — the
  * operator behind point-in-time lookups (latest rate, latest config,
  * latest snapshot).
  *
  * Built by COMPOSING built-ins (SURVEY §7 preference (a)): tag both
  * sides, union, and carry the latest right values forward with
  * last_value(ignoreNulls) over (key ORDER BY ts, rightness) — ONE
  * shuffle on the key, no custom SparkPlan needed. Right rows sort
  * before left rows at equal ts, so ties resolve inclusively (<=),
  * matching DuckDB's ASOF JOIN semantics used as the oracle.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto left rows */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_right", lit(0))
      .select((leftCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
        Seq(col("__ts"), col("__is_right"), col(key).as("__key"))): _*)
      .unionByName(right
        .withColumn("__ts", col(rightTs))
        .withColumn("__is_right", lit(1))
        .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(c => col(c).as(s"__r_$c")) ++
          Seq(col("__ts"), col("__is_right"), col(key).as("__key"))): _*))

    // right rows first at equal ts → inclusive (<=) semantics
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"__r_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_right") === 0)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__r_$c").as(c))): _*)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared conventions that make Spark results bit-identical to the
  * DuckDB oracle:
  *
  *  - Sums over `double` columns are accumulated in `decimal(30,6)`
  *    (exact, order-independent) and only cast back to `double` at the
  *    end. A plain `sum(double)` differs between engines in the last
  *    ulp because float addition is not associative across partitions.
  *  - Ratios/averages are computed as a single double division of two
  *    exact quantities, so both engines perform the identical IEEE-754
  *    operation.
  *  - Integer-ish aggregates stay in long.
  */
trait QueryDsl {
  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal accumulator for a double column. */
  def dec(c: Column): Column = c.cast("decimal(30,6)")

  /** Order-independent exact sum of a double column, surfaced as double. */
  def exactSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Count of rows matching a predicate, as long. */
  def countIf(p: Column): Column = sum(when(p, 1L).otherwise(0L))

  /** event_date as yyyy-MM-dd string (reference keeps dates as STRING). */
  def eventDate(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
}

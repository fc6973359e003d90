package graft.dq

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Native reimplementation of the reference's PyDeequ constraint
  * surface (SURVEY §2.9 D1-D5) as ONE aggregation pass over the
  * DataFrame — the reference issues one Deequ run per check; we fold
  * every constraint into a single job (semantics preserved, job count
  * reduced, which is what survives at 100 TB).
  */
sealed trait Constraint {
  def name: String
  /** Aggregate expressions this constraint needs. */
  def aggs: Seq[Column]
  /** Turn the aggregated row slice into a result. */
  def evaluate(values: Map[String, Any]): CheckResult
}

final case class CheckResult(checkName: String, checkType: String,
                             status: String, metricValue: Double,
                             threshold: Double, details: String) {
  def failed: Boolean = status == "FAILED" || status == "ERROR"
}

object Constraint {
  private def ratio(num: Any, den: Any): Double = {
    val d = den.toString.toDouble
    if (d == 0) 1.0 else num.toString.toDouble / d
  }

  /** D1: isComplete — 100% non-null. */
  final case class Complete(column: String) extends Constraint {
    val name = s"complete_$column"
    def aggs = Seq(
      coalesce(sum(when(col(column).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${name}_nulls"),
      count(lit(1)).as(s"${name}_total"))
    def evaluate(v: Map[String, Any]): CheckResult = {
      val nulls = v(s"${name}_nulls").toString.toLong
      val total = v(s"${name}_total").toString.toLong
      val completeness = if (total == 0) 1.0 else 1.0 - nulls.toDouble / total
      CheckResult(name, "completeness",
        if (nulls == 0) "PASSED" else "FAILED",
        completeness, 1.0, s"$nulls null values in $column")
    }
  }

  /** D2: hasCompleteness(col, >= threshold). */
  final case class Completeness(column: String, threshold: Double)
      extends Constraint {
    val name = s"completeness_$column"
    def aggs = Seq(
      coalesce(sum(when(col(column).isNotNull, 1L).otherwise(0L)), lit(0L)).as(s"${name}_nn"),
      count(lit(1)).as(s"${name}_total"))
    def evaluate(v: Map[String, Any]): CheckResult = {
      val r = ratio(v(s"${name}_nn"), v(s"${name}_total"))
      CheckResult(name, "completeness",
        if (r >= threshold) "PASSED" else "FAILED", r, threshold,
        f"$column non-null ratio $r%.4f")
    }
  }

  /** D3: isContainedIn. */
  final case class ContainedIn(column: String, values: Seq[String])
      extends Constraint {
    val name = s"contained_$column"
    def aggs = Seq(
      coalesce(sum(when(col(column).isin(values: _*) || col(column).isNull,
        1L).otherwise(0L)), lit(0L)).as(s"${name}_in"),
      count(lit(1)).as(s"${name}_total"))
    def evaluate(v: Map[String, Any]): CheckResult = {
      val r = ratio(v(s"${name}_in"), v(s"${name}_total"))
      CheckResult(name, "validity", if (r >= 1.0) "PASSED" else "FAILED",
        r, 1.0, s"$column containment in ${values.mkString("{", ",", "}")}")
    }
  }

  /** D4: bounds — isNonNegative / hasMax. */
  final case class Bounded(column: String, min: Double, max: Double)
      extends Constraint {
    val name = s"bounded_$column"
    def aggs = Seq(
      coalesce(sum(when(col(column) < min || col(column) > max, 1L)
        .otherwise(0L)), lit(0L)).as(s"${name}_out"),
      count(lit(1)).as(s"${name}_total"))
    def evaluate(v: Map[String, Any]): CheckResult = {
      val out = v(s"${name}_out").toString.toLong
      CheckResult(name, "validity", if (out == 0) "PASSED" else "FAILED",
        out.toDouble, 0.0, s"$column outside [$min,$max]: $out rows")
    }
  }

  /** D5: uniqueness ratio over key columns. */
  final case class Unique(columns: Seq[String], threshold: Double = 1.0)
      extends Constraint {
    val name = s"unique_${columns.mkString("_")}"
    def aggs = Seq(
      countDistinct(columns.head, columns.tail: _*).as(s"${name}_distinct"),
      count(lit(1)).as(s"${name}_total"))
    def evaluate(v: Map[String, Any]): CheckResult = {
      val r = ratio(v(s"${name}_distinct"), v(s"${name}_total"))
      CheckResult(name, "uniqueness",
        if (r >= threshold) "PASSED" else "FAILED", r, threshold,
        f"distinct/total = $r%.6f for (${columns.mkString(",")})")
    }
  }
}

object ConstraintEval {
  /** Evaluate all constraints in one aggregation job. A failure to
    * evaluate (missing column, bad cast) yields ERROR results — which
    * block the gate like FAILED (dq_checks.py maps exceptions to
    * ERROR) — instead of crashing the cycle.
    */
  def run(df: DataFrame, constraints: Seq[Constraint]): Seq[CheckResult] = {
    val aggs = constraints.flatMap(_.aggs)
    if (aggs.isEmpty) return Nil
    try {
      val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val values = row.schema.fieldNames.zip(row.toSeq).toMap
      constraints.map(_.evaluate(values))
    } catch {
      case e: Exception =>
        constraints.map(c => CheckResult(c.name, "error", "ERROR",
          0.0, 0.0, s"evaluation failed: ${e.getMessage}"))
    }
  }
}

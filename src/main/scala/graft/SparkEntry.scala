package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * extensions) is surfaced here as a named query over the driver
  * testdata, with a DuckDB-equivalent oracle in [[oracleSql]] where the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracle),
      (GoldQueries.queries, GoldQueries.oracle),
      (MergeQueries.queries, MergeQueries.oracle),
      (StatsQueries.queries, StatsQueries.oracle),
      (DqQueries.queries, DqQueries.oracle),
      (LlmQueries.queries, LlmQueries.oracle),
      (TpchQueries.queries, TpchQueries.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a01_hourly_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

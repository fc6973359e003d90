package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join handling covers most
  * cases at runtime (the reference enables it; so do we), but a hot
  * aggregation key or a skewed join against a non-broadcastable side
  * needs explicit salting — these helpers implement the standard
  * two-phase rewrites while provably preserving results (see
  * SaltedSpec equivalence tests).
  */
object Salted {

  /** Deterministic salt in [0, salts). crc32(NULL) is NULL, and a NULL
    * salt would silently drop big-side rows from the (key, salt)
    * equi-join even when the key matches — coalesce pins null salt
    * sources to bucket 0 so the rewrite stays result-preserving. */
  private def saltOf(saltSource: Column, salts: Int): Column =
    pmod(coalesce(crc32(saltSource.cast("string")), lit(0L)), lit(salts))
      .cast("int")

  /** Two-phase salted sum/count: groupBy(keys, salt) partial combine →
    * groupBy(keys) final merge. A hot key's rows spread over `salts`
    * reducers in phase 1 instead of melting a single task.
    * `saltSource` must be deterministic per row but well-distributed
    * (e.g. another column) — it never affects the result, only the
    * partitioning.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int, saltSource: Column): DataFrame = {
    val partial = df
      .withColumn("__salt", saltOf(saltSource, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Exact two-phase distinct count: groupBy(keys, value) dedup →
    * groupBy(keys) count. The classic rewrite of COUNT(DISTINCT) that
    * spreads a hot key over (key, value) reducers — what Catalyst's
    * expand does, made explicit for composition with salting.
    */
  def distinctCount(df: DataFrame, keys: Seq[String],
                    valueCol: String): DataFrame =
    // COUNT(DISTINCT x) ignores NULLs — filter before the dedup or a
    // (key, NULL) row inflates the count by one
    df.filter(col(valueCol).isNotNull)
      .select((keys.map(col) :+ col(valueCol)): _*).distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"distinct_$valueCol"))

  /** Salted join for a skewed non-broadcastable build side: the big
    * (skewed) side gets a random-ish but deterministic salt in
    * [0, salts); the small side is replicated `salts` times. Join key
    * becomes (key, salt) — a hot key's rows land on `salts` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, bigSaltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(bigSaltSource, salts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

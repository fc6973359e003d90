package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (interval) self-join without a cartesian product: pairs
  * of rows sharing a key whose timestamps lie within `windowSeconds`
  * of each other. Naively this is an inequality join — O(n²) per key.
  * Here each row lands in a time bucket of width = window and probes
  * only adjacent buckets, so the join is an EQUI-join on (key, bucket)
  * with a cheap exact filter after — the standard scalable rewrite.
  */
object RangeJoin {

  /** Pairs (id_a < id_b) with same key and |ts_a - ts_b| <= window. */
  def selfPairsWithin(df: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, windowSeconds: Long): DataFrame = {
    val wUs = windowSeconds * 1000000L
    val base = df.select(col(idCol).as("id"), col(keyCol).as("k"),
      unix_micros(col(tsCol)).as("us"))
    val right = base
      .withColumn("bucket", expr(s"us div ${wUs}L"))
      .select(col("id").as("id_b"), col("k"),
        col("us").as("us_b"), col("bucket"))
    // each left row probes its own bucket and both neighbors
    val left = base
      .withColumn("bucket",
        explode(array(expr(s"us div ${wUs}L - 1"), expr(s"us div ${wUs}L"),
          expr(s"us div ${wUs}L + 1"))))
      .select(col("id").as("id_a"), col("k"),
        col("us").as("us_a"), col("bucket"))
    left.join(right, Seq("k", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_a") - col("us_b")) <= wUs)
      .select(col("id_a"), col("id_b"), col("k"),
        abs(col("us_a") - col("us_b")).as("gap_us"))
      .distinct()
  }
}

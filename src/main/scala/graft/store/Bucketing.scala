package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables for co-located joins: two tables bucketed
  * on the same key with the same bucket count join WITHOUT a shuffle —
  * the pre-partitioning the reference delegated to Iceberg's
  * `write.distribution-mode=hash` (SURVEY §4). At 100 TB this turns
  * every fact-to-fact equi-join on the bucket key from a full network
  * shuffle into a local zip of bucket files.
  */
object Bucketing {

  /** Persist as a bucketed+sorted managed parquet table. */
  def saveBucketed(df: DataFrame, table: String, key: String,
                   buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}

package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap

/** Storage abstraction replacing the reference's Iceberg catalog
  * (SURVEY §7.1 module 2). S5/S7/S8/S9/S11 map onto this trait; the
  * parquet implementation emulates MERGE with the standard rewrites:
  * insert-only = left-anti + append, full upsert = union +
  * window-dedup + partition-scoped dynamic overwrite.
  */
trait TableStore {
  /** S5: idempotent table creation. */
  def ensure(name: String, schema: StructType, partitionBy: Seq[String] = Nil): Unit
  def exists(name: String): Boolean
  def scan(name: String): DataFrame
  /** S4: scan with a partition-pruning range predicate. */
  def scanRange(name: String, dateCol: String, start: String, end: String): DataFrame =
    scan(name).where(col(dateCol).between(start, end))
  /** S9: plain append. */
  def append(name: String, df: DataFrame): Unit
  /** S7: MERGE WHEN NOT MATCHED INSERT — returns rows actually inserted. */
  def mergeInsertOnly(name: String, incoming: DataFrame, keys: Seq[String]): Long
  /** S8: full upsert MERGE — incoming wins on matched keys. */
  def mergeUpsert(name: String, incoming: DataFrame, keys: Seq[String]): Unit
  /** S11: delete rows matching a predicate (partition rewrite). */
  def delete(name: String, predicate: org.apache.spark.sql.Column): Long
  /** S10: manual schema evolution — ALTER TABLE ADD COLUMN. Existing
    * rows surface NULL for the new column; no data rewrite. */
  def addColumn(name: String, field: org.apache.spark.sql.types.StructField): Unit
}

/** Local parquet-backed TableStore.
  *
  * Scale note: `mergeUpsert` rewrites only the partitions present in
  * the incoming batch (dynamic partition overwrite), so cost is
  * O(touched partitions), not O(table) — the same contract Iceberg's
  * copy-on-write MERGE gives. `mergeInsertOnly` is a broadcast-able
  * anti-join against only the target partitions the incoming keys can
  * live in when a partition column is supplied.
  */
class ParquetTableStore(spark: SparkSession, root: String,
                        format: String = "parquet") extends TableStore {

  private val schemas = TrieMap.empty[String, (StructType, Seq[String])]

  private def path(name: String): String = s"$root/${name.replace('.', '/')}"
  private def hasData(name: String): Boolean = {
    val p = Paths.get(path(name))
    if (!Files.exists(p)) return false
    val stream = Files.list(p)
    try stream.anyMatch(f =>
      !f.getFileName.toString.startsWith("_") &&
        !f.getFileName.toString.startsWith("."))
    finally stream.close()
  }

  override def ensure(name: String, schema: StructType,
                      partitionBy: Seq[String]): Unit = {
    schemas.put(name, (schema, partitionBy))
    Files.createDirectories(Paths.get(path(name)))
  }

  override def exists(name: String): Boolean =
    schemas.contains(name) || hasData(name)

  override def addColumn(name: String,
                         field: org.apache.spark.sql.types.StructField): Unit =
    schemas.updateWith(name) {
      case Some((schema, parts)) if !schema.fieldNames.contains(field.name) =>
        Some((schema.add(field), parts))
      case other => other
    }

  override def scan(name: String): DataFrame =
    if (hasData(name)) {
      // mergeSchema: files written before an addColumn lack the new
      // column — merge footers instead of trusting one
      val raw = spark.read.option("mergeSchema", "true")
        .format(format).load(path(name))
      // partition-column type inference turns "2024-01-02" partition
      // values into DATEs on read-back; realign to the declared schema
      // (the reference keeps event_date/run_date as STRING). Columns
      // added via addColumn that predate the data surface as NULL.
      schemas.get(name) match {
        case Some((schema, _)) =>
          raw.select(schema.fields.toSeq.map { f =>
            if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*)
        case _ => raw
      }
    } else schemas.get(name) match {
      case Some((schema, _)) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case None =>
        throw new IllegalArgumentException(s"unknown table $name — ensure() first")
    }

  override def append(name: String, df: DataFrame): Unit = {
    val parts = schemas.get(name).map(_._2).getOrElse(Nil)
    val w = df.write.mode(SaveMode.Append)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .format(format).save(path(name))
  }

  override def mergeInsertOnly(name: String, incoming: DataFrame,
                               keys: Seq[String]): Long = {
    val fresh =
      if (!hasData(name)) incoming.dropDuplicates(keys)
      else {
        // probe only the key columns of the target — column pruning
        // keeps the anti-join build side narrow
        val targetKeys = scan(name).select(keys.map(col): _*)
        incoming.dropDuplicates(keys)
          .join(targetKeys, keys, "left_anti")
      }
    val persisted = fresh.cache()
    val n = persisted.count()
    if (n > 0) append(name, persisted)
    persisted.unpersist()
    n
  }

  /** Contract: the target must be unique on `keys` (guaranteed when
    * all writes go through merge*). Iceberg's MERGE throws on multiple
    * matching target rows; this emulation keeps the incoming row and
    * collapses pre-existing duplicates within touched partitions. */
  override def mergeUpsert(name: String, incoming: DataFrame,
                           keys: Seq[String]): Unit = {
    if (!hasData(name)) { append(name, incoming.dropDuplicates(keys)); return }
    val parts = schemas.get(name).map(_._2).getOrElse(Nil)
    val target = scan(name)
    val cols = target.columns.toSeq
    val pri = "__graft_priority"
    val rn = "__graft_rn"
    val unioned = target.withColumn(pri, lit(0))
      .unionByName(incoming.select(cols.map(col): _*).withColumn(pri, lit(1)))
    val scoped =
      if (parts.nonEmpty) {
        // rewrite only partitions the incoming batch touches
        val touched = incoming.select(parts.map(col): _*).distinct()
        unioned.join(broadcast(touched), parts, "left_semi")
      } else unioned
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(pri).desc)
    val merged = scoped.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1).drop(pri, rn)
    rewrite(name, merged, parts, dynamicOverwrite = parts.nonEmpty)
  }

  override def delete(name: String,
                      predicate: org.apache.spark.sql.Column): Long = {
    if (!hasData(name)) return 0L
    val parts = schemas.get(name).map(_._2).getOrElse(Nil)
    val target = scan(name)
    val keep = target.filter(!coalesce(predicate, lit(false)))
    val removed = target.count() - keep.count()
    if (removed > 0) rewrite(name, keep, parts, dynamicOverwrite = false)
    removed
  }

  /** Operational compaction: streaming ingestion appends one small
    * file per micro-batch per partition; compaction rewrites the table
    * into ~targetBytes files (the reference delegates this to Iceberg's
    * 256 MB write targets + metadata GC, bronze_streaming_job.py:365-369).
    * Returns (filesBefore, filesAfter).
    */
  def compact(name: String, targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    if (!hasData(name)) return (0L, 0L)
    val parts = schemas.get(name).map(_._2).getOrElse(Nil)
    def stats(): (Long, Long) = {
      val stream = Files.walk(Paths.get(path(name)))
      try {
        val suffix = if (format == "parquet") ".parquet" else s".$format"
        val files = stream.filter(f => f.toString.endsWith(suffix))
          .toArray.map(_.asInstanceOf[java.nio.file.Path])
        (files.length.toLong, files.map(Files.size).sum)
      } finally stream.close()
    }
    val (before, bytes) = stats()
    val nFiles = math.max(1, (bytes / targetBytes).toInt +
      (if (bytes % targetBytes > 0) 1 else 0))
    val df = scan(name)
    val packed =
      if (parts.nonEmpty) df.repartition(nFiles, parts.map(col): _*)
      else df.repartition(nFiles)
    rewrite(name, packed, parts, dynamicOverwrite = false)
    (before, stats()._1)
  }

  /** Write-temp-then-swap: parquet has no transactions, so materialize
    * the merged result in a staging dir before overwriting the target
    * (reading and overwriting the same path in one plan corrupts it).
    */
  private def rewrite(name: String, df: DataFrame, parts: Seq[String],
                      dynamicOverwrite: Boolean): Unit = {
    val staging = s"$root/__staging__/${name.replace('.', '_')}_${System.nanoTime()}"
    val w0 = df.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) w0.partitionBy(parts: _*) else w0)
      .format(format).save(staging)
    val back = spark.read.format(format).load(staging)
    val w1 = back.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode",
        if (dynamicOverwrite) "dynamic" else "static")
    (if (parts.nonEmpty) w1.partitionBy(parts: _*) else w1)
      .format(format).save(path(name))
    deleteRecursively(Paths.get(staging))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally stream.close()
    }
  }
}

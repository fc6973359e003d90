package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * Column pruning + predicate pushdown reach the parquet scan because we
  * hand Catalyst the raw `spark.read.parquet` relation and express
  * everything else declaratively.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** r17 (optimization guide §5, keep the driver lean): schema memo
    * for the testdata tables. Without it every `spark.read.parquet`
    * re-infers the schema from parquet footers on the DRIVER — ~10-40
    * ms per table per query, and a query like s12 registers all ten
    * tables per invocation (~0.4 s of pure driver latency, measured).
    * This caches METADATA only (never rows, never results): the key
    * carries the file tree's (size, mtime) fingerprint plus the one
    * session conf that changes inference (`nanosAsLong`), so a
    * regenerated testdata file or a differently-configured session
    * can never be served a stale schema. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, String), org.apache.spark.sql.types.StructType]

  private def fingerprint(path: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def one(p: java.nio.file.Path): String =
      s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    val p = Paths.get(path)
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala.filterNot(_.getFileName.toString.startsWith("_"))
          .map(one).toSeq.sorted.mkString("|")
        finally s.close()
      } else one(p)
    } catch { // unreadable path: unique key = no caching, load fails as before
      case _: Throwable => s"nofp:${System.nanoTime()}" }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val conf = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val key = (path, fingerprint(path), conf)
    val schema = schemaCache.getOrElseUpdate(key,
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")

  /** Normalize measure columns the engine's arithmetic (and every
    * oracle twin) assumes are DOUBLE back to double when a testdata
    * regeneration ships them under a different numeric width — the
    * remaining plausible drift flips after r6's events.ts: money
    * columns as decimal(15,2), integral quantities as int32/int64.
    * Both conversions are value-exact (a 15-digit 2-decimal value
    * casts to the same double the driver would have written; ints are
    * exact in double far past these domains), so query outputs are
    * bit-identical across encodings — TypeDriftSpec pins that. The
    * cast wrapper only appears under drift: on today's double files
    * the columns pass through untouched and predicate pushdown on
    * them is unaffected (under drift, losing pushdown on the drifted
    * column is the price of not breaking every consumer — the same
    * trade the events.ts seam makes).
    */
  private def normalizeDoubles(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    cols.foldLeft(df) { (d, c) =>
      if (!d.schema.fieldNames.contains(c)) d
      else d.schema(c).dataType match {
        case DoubleType => d
        case _: DecimalType | IntegerType | LongType | FloatType =>
          d.withColumn(c, col(c).cast("double"))
        case _ => d
      }
    }
  }

  private val lineitemMeasures =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeDoubles(load(s, d, "lineitem"), lineitemMeasures)
  /** The driver has shipped `events.ts` under three parquet encodings so
    * far: TIMESTAMP(NANOS) (Spark 4 reads it as a long under
    * spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench/test
    * sessions), TIMESTAMP_NTZ (isAdjustedToUTC=false), and plain
    * TIMESTAMP. Normalize ALL of them to a session-TZ TIMESTAMP here —
    * the session TZ is pinned UTC everywhere, so the NTZ→LTZ cast is a
    * pure re-tag with identical micros — so every downstream consumer
    * (`unix_micros`, `hour`, comparisons) sees one stable type no matter
    * how the driver happened to encode the file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = normalizeDoubles(load(s, d, "events"), Seq("value"))
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Time-range scan over events with the predicate applied to the RAW
    * nanos column — a filter on the converted timestamp wraps the
    * column in `timestamp_micros(ts div 1000)` and never reaches the
    * parquet reader (PushedFilters shows only IsNotNull). Filtering the
    * long first pushes both bounds into the scan, enabling row-group
    * pruning; bounds are µs-aligned so semantics are identical.
    */
  def eventsRange(s: SparkSession, d: String,
                  startDate: String, endDateExclusive: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // ts filters below run on the RAW column (pushdown); the value
    // width seam composes after them without touching the predicate
    val raw = normalizeDoubles(load(s, d, "events"), Seq("value"))
    def ns(x: String): Long =
      java.time.Instant.parse(x + "T00:00:00Z").getEpochSecond * 1000000000L
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.filter(col("ts") >= ns(startDate) && col("ts") < ns(endDateExclusive))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (raw.schema("ts").dataType ==
               org.apache.spark.sql.types.TimestampNTZType)
      // filter the RAW NTZ column (both bounds reach PushedFilters),
      // THEN normalize to session-TZ TIMESTAMP like `events` does
      raw.filter(col("ts") >= lit(startDate).cast("timestamp_ntz") &&
                 col("ts") < lit(endDateExclusive).cast("timestamp_ntz"))
        .withColumn("ts", col("ts").cast("timestamp"))
    else
      raw.filter(col("ts") >= lit(startDate).cast("timestamp") &&
                 col("ts") < lit(endDateExclusive).cast("timestamp"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")

  /** The vector kernels (FloatDotProduct & friends) are type-strict on
    * array<float>. Today the driver writes `embedding` as
    * list<float>; if a regeneration ever ships list<double> (the same
    * encoding-drift class that broke events.ts in r6), normalize at
    * the seam instead of crashing every vector query. The float cast
    * costs one narrowing per element on read and keeps the engine's
    * float semantics identical across encodings.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val raw = load(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => raw
    }
  }

  /** Register all tables as temp views for SQL-expressed queries
    * (events gets its ts converted to a proper timestamp).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case "embeddings" =>
        embeddings(spark, dir).createOrReplaceTempView("embeddings")
      case "lineitem" =>
        lineitem(spark, dir).createOrReplaceTempView("lineitem")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
}

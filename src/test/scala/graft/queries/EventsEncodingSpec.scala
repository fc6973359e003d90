package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** The driver regenerates `/root/testdata` between rounds and has
  * already shipped `events.ts` under different parquet encodings:
  * TIMESTAMP(NANOS) (read as a long under nanosAsLong), then
  * TIMESTAMP_NTZ. The r6 regression (w04/j06 throwing
  * DATATYPE_MISMATCH on `unix_micros(ntz)`) happened because the
  * loader seam normalized one encoding but passed the other through
  * raw. This spec pins the seam: every events-consuming query in the
  * registry must return IDENTICAL results no matter which encoding the
  * parquet arrives in. Fixture dirs are built here in the test — the
  * spec never depends on which encoding the current testdata happens
  * to use.
  */
class EventsEncodingSpec extends SparkSpec {

  /** Every registry query that reads the events table (directly via
    * Tables.events/eventsRange or through registerAll's temp view).
    * Keep in sync when adding events queries — the "list is accurate"
    * test below fails on stale entries.
    */
  private val eventsConsumers = Seq(
    "a01_hourly_stats", "a02_a03_risk_scores", "a04_a06_daily_summary",
    "a05_risk_summary", "a07_duplicate_census", "a12_gate_status",
    "a13_approx_distinct", "a14_pivot", "a16_rollup",
    "d01_dq_constraints", "d07_accuracy_recompute", "d11_consistency_check",
    "d13_drift_detection", "d14_gate_aggregation", "d15_anomaly_hours",
    "j01_left_join_nullfill", "j05_asof_join", "j06_range_join",
    "o01_topk",
    "p01_from_json", "p02_json_extract", "p04_surrogate_key",
    "p06_time_derive", "p09_region_enrich", "p12_flags",
    "s04_scan_prune", "s11_delete_candidates", "s12_sql_tempview",
    "w01_peak_hour", "w02_window_dedup", "w03_hourly_trend",
    "w04_sessionization", "w05_gap_fill")

  private val sfDir = "/root/testdata/sf0.001"

  /** A fixture dir = symlinks to every sf0.001 table except events,
    * plus events re-encoded as requested. `encode` must keep the
    * column set/order identical — only ts's physical type changes.
    */
  private def fixtureDir(name: String,
                         encode: org.apache.spark.sql.DataFrame =>
                           org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Paths.get(tmpDir(s"events-enc-$name"))
    Tables.names.filter(_ != "events").foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    }
    // start from the seam-normalized frame so fixture content is
    // independent of the current testdata encoding
    encode(Tables.events(spark, sfDir))
      .write.parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private lazy val ltzDir = fixtureDir("ltz", identity)
  private lazy val ntzDir = fixtureDir("ntz",
    _.withColumn("ts", col("ts").cast("timestamp_ntz")))
  // a real TIMESTAMP(NANOS) column reads as LongType (nanos) under
  // spark.sql.legacy.parquet.nanosAsLong; a plain INT64 nanos column
  // produces the same observed schema, which is all the seam sees
  private lazy val nanosDir = fixtureDir("nanos",
    _.withColumn("ts", unix_micros(col("ts")) * 1000L))

  test("fixture encodings land as three distinct physical types") {
    assert(spark.read.parquet(s"$ltzDir/events.parquet")
      .schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$nanosDir/events.parquet")
      .schema("ts").dataType == LongType)
  }

  test("Tables.events normalizes every encoding to TIMESTAMP with equal micros") {
    for (d <- Seq(ltzDir, ntzDir, nanosDir)) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType,
        s"seam must yield TimestampType for $d")
    }
    // micros equality across encodings (session TZ pinned UTC)
    val sums = Seq(ltzDir, ntzDir, nanosDir).map { d =>
      Tables.events(spark, d).agg(sum(unix_micros(col("ts")))).head().getLong(0)
    }
    assert(sums.distinct.size == 1, s"micros drift across encodings: $sums")
  }

  /** Queries that materialize their silver stage AT CONSTRUCTION
    * (r17: a04_a06's localCheckpoint) — the returned plan's leaf is a
    * LogicalRDD, so relation-leaf provenance can't see the events
    * scan. Their dependency is proven BEHAVIORALLY below: a fixture
    * with different events content must change the result — strictly
    * stronger than plan sniffing (a plan leaf proves the scan exists,
    * not that the output depends on it). */
  private val materializedAtConstruction = Set("a04_a06_daily_summary")

  private lazy val halfDir = fixtureDir("half",
    _.filter(col("event_id") % 2 === 0))

  test("consumer list is accurate: each listed query actually reads events") {
    // lazy plan construction only — catches stale entries; a *missing*
    // consumer is caught by the cross-encoding run below going stale
    val qs = SparkEntry.queries
    for (name <- eventsConsumers if !materializedAtConstruction(name)) {
      val plan = qs(name)(spark, ltzDir).queryExecution.analyzed
      // plan toString is truncated for wide plans — read the scan
      // relations' actual file-index root paths instead
      // s12's temp view is resolved by analysis time, so its parquet
      // relation shows up in collectLeaves like every direct read —
      // no special case
      val reads = plan.collectLeaves().exists {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("events.parquet"))
            case _ => false
          }
        case _ => false
      }
      assert(reads, s"$name no longer reads events — remove it from the list")
    }
    for (name <- eventsConsumers if materializedAtConstruction(name)) {
      def rows(d: String): Seq[String] =
        qs(name)(spark, d).collect().map(_.toString).sorted.toSeq
      assert(rows(ltzDir) != rows(halfDir),
        s"$name returned identical results on full vs half events — " +
          "it no longer depends on the events table; remove it from " +
          "the list (or from materializedAtConstruction)")
    }
  }

  test("every events-consuming query is encoding-invariant") {
    val qs = SparkEntry.queries
    def run(name: String, d: String): Seq[String] =
      qs(name)(spark, d).collect().map(_.toString).sorted.toSeq
    val failures = eventsConsumers.flatMap { name =>
      val base = run(name, ltzDir)
      Seq("ntz" -> ntzDir, "nanos" -> nanosDir).flatMap { case (enc, d) =>
        val got = try run(name, d) catch {
          case e: Throwable => Seq(s"<THREW: ${e.getMessage.take(120)}>")
        }
        if (got == base) None
        else Some(s"$name[$enc]: ${got.take(2)} != ${base.take(2)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (dd12's bucketed LSH index) land outside the repo
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${System.nanoTime()}")
      // reference semantics: Spark 3 non-ANSI — malformed field values
      // cast to NULL instead of throwing (bad-typed JSON fields must
      // degrade gracefully, not kill the streaming job)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged
    // with session initialization
    spark.range(100000).selectExpr("sum(id)").collect()
    // optional comma-separated subset for local iteration; the driver
    // sets nothing and always times the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // median of `iters` timed runs per query: a single run on a shared
    // 32-core box is GC/scheduler noise at sub-second durations (the
    // r3 "d11 4.7× regression" was exactly this phantom) — the median
    // is stable to ~15% across re-runs
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val wall0 = System.nanoTime()
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val times = (0 until iters).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
            finally {
              spark.catalog.clearCache()
              // operators that materialize intermediates via
              // localCheckpoint (CC rounds, LSH signatures, PQ codes)
              // leave their blocks behind until GC + ContextCleaner
              // get around to them; across 100+ queries × iters the
              // block manager fills and every later query pays the
              // memory pressure — the r5 lockstep drift. The query's
              // result is consumed, so sweeping is safe here.
              spark.sparkContext.getPersistentRDDs.values
                .foreach(_.unpersist(blocking = false))
            }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val median =
          if (times.contains(-1.0)) -1.0
          else times.sorted.apply(times.size / 2)
        name -> median
      }
    // 4-decimal values keep the single JSON line compact (~2 KB for
    // ~100 queries) so a bounded tail capture still parses it whole
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // value = one-suite-pass cost (sum of per-query medians), the
    // round-over-round comparable number; wall = actual elapsed
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val wall = (System.nanoTime() - wall0) / 1e9
    spark.stop()
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","iters":$iters,"wall":${fmt(wall)},"queries":$qs,"sf":"$sfDir"}"""
    // the stdout line is tail-captured by the driver and has been
    // truncated two rounds running (r4/r5: parsed null, a third of the
    // per-query timings lost) — also write it to a durable file so the
    // full map survives regardless of capture-buffer limits
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => () } // stdout below still carries it
    // printed after spark.stop() so the JSON is the last stdout line
    println(json)
  }
}

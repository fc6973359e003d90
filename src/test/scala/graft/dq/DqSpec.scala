package graft.dq

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DqSpec extends SparkSpec {

  private def df = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("e1", "edit", 10, "2024-01-02 13:00:00", "2024-01-02 13:00:30"),
      ("e2", "new", -3, "2024-01-02 13:05:00", "2024-01-02 13:05:20"),
      ("e3", null, 7, "2024-01-02 13:06:00", "2024-01-02 13:16:00"),
      ("e3", "bogus", 200, "2024-01-02 13:07:00", "2024-01-02 13:07:10"))
      .toDF("event_id", "event_type", "score", "event_ts", "processed_ts")
      .withColumn("event_ts", to_timestamp(col("event_ts")))
      .withColumn("processed_ts", to_timestamp(col("processed_ts")))
  }

  test("D1-D5 constraints evaluate in one pass with exact statuses") {
    val results = ConstraintEval.run(df, Seq(
      Constraint.Complete("event_id"),
      Constraint.Complete("event_type"),
      Constraint.Completeness("event_type", 0.5),
      Constraint.ContainedIn("event_type", Seq("edit", "new")),
      Constraint.Bounded("score", 0, 100),
      Constraint.Unique(Seq("event_id"))))
    val byName = results.map(r => r.checkName -> r).toMap
    assert(byName("complete_event_id").status === "PASSED")
    assert(byName("complete_event_type").status === "FAILED")
    assert(byName("completeness_event_type").status === "PASSED") // 3/4 >= 0.5
    assert(byName("contained_event_type").status === "FAILED")    // "bogus"
    assert(byName("bounded_score").status === "FAILED")           // -3, 200
    assert(byName("unique_event_id").status === "FAILED")         // e3 twice
    assert(byName("unique_event_id").metricValue === 0.75)
  }

  test("evaluation errors become blocking ERROR results, not crashes") {
    val results = ConstraintEval.run(df, Seq(
      Constraint.Complete("no_such_column")))
    assert(results.length === 1)
    assert(results(0).status === "ERROR")
    assert(results(0).failed) // blocks the gate like FAILED
  }

  test("D6 timeliness is WARNING (non-blocking), never FAILED") {
    // e3 is 600s late → p95 over threshold
    val r = Checks.timeliness(df, "processed_ts", "event_ts", 180.0)
    assert(r.status === "WARNING")
    assert(!r.failed)
    val ok = Checks.timeliness(df.filter(col("event_id") =!= "e3"),
      "processed_ts", "event_ts", 180.0)
    assert(ok.status === "PASSED")
  }

  test("D7 accuracy recompute ratio vs threshold") {
    val acc = Checks.accuracy(df, "score_sign",
      col("score") > 0, col("score") > 0, 0.99)
    assert(acc.status === "PASSED")
    val bad = Checks.accuracy(df, "broken",
      col("score") > 0, col("score") < 0, 0.99)
    assert(bad.status === "FAILED")
  }

  test("D10 consistency invariant counts violations") {
    val r = Checks.consistency(df, "score_bounded",
      col("score") >= 0 && col("score") <= 100)
    assert(r.status === "FAILED")
    assert(r.metricValue === 2.0)
  }

  test("D13 drift thresholds") {
    assert(Checks.drift(105.0, 100.0, "m").status === "PASSED")
    assert(Checks.drift(115.0, 100.0, "m").status === "WARNING")
    assert(Checks.drift(125.0, 100.0, "m").details.contains("alert=true"))
  }

  test("A8 profiler computes full column profile in one job") {
    val p = Profiler.profile(df, Seq("score"), Seq("event_type"))
    val score = p.find(_.column == "score").get
    assert(score.rowCount === 4)
    assert(score.nullCount === 0)
    assert(score.distinctCount === 4)
    assert(score.mean.get === (10 - 3 + 7 + 200) / 4.0)
    assert(score.min.get === -3.0)
    assert(score.max.get === 200.0)
    assert(score.p50.get === 8.5)
    val et = p.find(_.column == "event_type").get
    assert(et.nullCount === 1)
    assert(et.mean.isEmpty)
  }

  test("A15 approx profile stays within sketch error bounds of exact") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = Profiler.profile(li, cols)
    val approx = Profiler.profile(li, cols, approx = true, accuracy = 10000)
    cols.foreach { c =>
      val e = exact.find(_.column == c).get
      val a = approx.find(_.column == c).get
      // counts/moments/extrema are identical — only the two sketch
      // aggregates differ
      assert(a.rowCount === e.rowCount)
      assert(a.mean.get === e.mean.get)
      assert(a.min.get === e.min.get && a.max.get === e.max.get)
      // HLL: default rsd is 5%; allow 2 sigma
      assert(math.abs(a.distinctCount - e.distinctCount) <=
        math.max(5L, (e.distinctCount * 0.10).toLong),
        s"$c approx distinct ${a.distinctCount} vs exact ${e.distinctCount}")
      // percentile_approx at accuracy 10000: within 1% of the value
      // range of the exact interpolated percentile
      val range = e.max.get - e.min.get
      Seq((a.p25, e.p25), (a.p50, e.p50), (a.p75, e.p75), (a.p95, e.p95))
        .foreach { case (ap, ep) =>
          assert(math.abs(ap.get - ep.get) <= 0.01 * range,
            s"$c approx ${ap.get} vs exact ${ep.get}")
        }
    }
  }

  test("A13/A15 approx seams: the gate queries' sketches are " +
      "deterministic and carry their own in-job exact bound") {
    // The two rows-only gates (no DuckDB oracle — sketch internals
    // differ across engines by construction) are pinned here instead:
    // a13 computes the EXACT count distinct in the same job beside the
    // HLL sketch, so its within_10pct column is an in-job oracle —
    // every row must hold. And both sketches are deterministic (HLL++
    // and percentile_approx have no RNG), so two evaluations must be
    // IDENTICAL — the strongest contract an approximate aggregate can
    // make at test scale.
    val sf = "/root/testdata/sf0.001"
    val a13 = graft.SparkEntry.queries("a13_approx_distinct")(spark, sf)
    val rows1 = a13.collect().map(_.toSeq).toSet
    assert(rows1.nonEmpty)
    val badRows = a13.filter(!col("within_10pct")).count()
    assert(badRows === 0,
      s"$badRows a13 rows have approx_count_distinct off by >10% of " +
        "the in-job exact count")
    val rows2 = graft.SparkEntry.queries("a13_approx_distinct")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(rows1 === rows2, "a13's HLL sketch is not deterministic")
    val a15a = graft.SparkEntry.queries("a15_profile_approx")(spark, sf)
      .collect().map(_.toSeq).toSet
    val a15b = graft.SparkEntry.queries("a15_profile_approx")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a15a.nonEmpty)
    assert(a15a === a15b,
      "a15's percentile/HLL sketches are not deterministic")
  }
}

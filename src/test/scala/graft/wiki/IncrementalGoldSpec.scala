package graft.wiki

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.store.ParquetTableStore

class IncrementalGoldSpec extends SparkSpec {

  private lazy val silver = SilverTransform(
    BronzeTransform(FixtureData.kafkaDf(spark), Clock.fixed("2024-01-02 15:00:00")),
    Clock.fixed("2024-01-02 15:05:00")).cache()

  private val clock = Clock.fixed("2024-01-02 16:00:00")

  test("incremental refresh over batches equals the full A1 recompute") {
    val root = Files.createTempDirectory("incgold").toString
    val store = new ParquetTableStore(spark, root)
    // three disjoint batches partitioned by event_id hash — arbitrary
    // split, together exactly the full silver set
    (0 until 3).foreach { b =>
      val batch = silver.filter(pmod(xxhash64(col("event_id")), lit(3)) === b)
      IncrementalGold.refresh(store, batch, clock)
    }
    val got = store.scan("gold.hourly_stats")
    val want = GoldTransforms.hourlyStats(silver, clock)
    assert(got.count() === want.count())
    // every column matches the one-shot batch aggregate, including the
    // HLL distinct estimates (exact at fixture cardinalities) and the
    // derived ratios
    val cols = want.columns.filterNot(_ == "gold_processed_at")
    val joined = want.select(cols.map(c => col(c).as(s"w_$c")): _*)
      .join(got,
        col("w_stat_date") === col("stat_date") &&
          col("w_stat_hour") === col("stat_hour") &&
          col("w_domain") === col("domain") && col("w_region") === col("region"))
    assert(joined.count() === want.count(), "join lost groups")
    cols.foreach { c =>
      val bad = joined.filter(!(col(s"w_$c") <=> col(c))).count()
      assert(bad === 0L, s"column $c diverges in $bad groups")
    }
  }

  test("refresh touches only the batch's dates; other state is untouched") {
    val root = Files.createTempDirectory("incgold2").toString
    val store = new ParquetTableStore(spark, root)
    IncrementalGold.refresh(store, silver, clock)
    val before = store.scan("gold.hourly_stats_state")
      .select("stat_date").distinct().collect().map(_.getString(0)).sorted
    // a second-day batch: same rows shifted to a new date label
    val day2 = silver
      .withColumn("event_date", lit("2024-09-09"))
    IncrementalGold.refresh(store, day2, clock)
    val after = store.scan("gold.hourly_stats_state")
    // day-1 state rows are byte-identical (not re-merged): total_events
    // for day 1 unchanged, day 2 present
    val d1 = after.filter(col("stat_date").isin(before.toSeq: _*))
      .agg(sum("total_events")).collect()(0).getLong(0)
    val d2 = after.filter(col("stat_date") === "2024-09-09")
      .agg(sum("total_events")).collect()(0).getLong(0)
    assert(d1 === silver.count())
    assert(d2 === silver.count())
    // folding the same batch twice double-counts — the documented
    // exactly-once contract (feed fresh rows only)
    IncrementalGold.refresh(store, day2, clock)
    val d2twice = store.scan("gold.hourly_stats_state")
      .filter(col("stat_date") === "2024-09-09")
      .agg(sum("total_events")).collect()(0).getLong(0)
    assert(d2twice === 2 * silver.count())

    // ...and rebuildDates REPAIRS the double-fold from silver truth:
    // idempotent, exact, other dates untouched
    IncrementalGold.rebuildDates(store, day2, clock)
    IncrementalGold.rebuildDates(store, day2, clock) // idempotent
    val repaired = store.scan("gold.hourly_stats")
      .filter(col("stat_date") === "2024-09-09")
      .agg(sum("total_events")).collect()(0).getLong(0)
    assert(repaired === silver.count())
    val d1after = store.scan("gold.hourly_stats")
      .filter(col("stat_date") =!= "2024-09-09")
      .agg(sum("total_events")).collect()(0).getLong(0)
    assert(d1after === silver.count(), "untouched dates must survive repair")
    // a group that vanished from silver does not survive the rebuild
    val day2Half = day2.filter(col("domain") =!= "en.wikipedia.org")
    IncrementalGold.rebuildDates(store, day2Half, clock)
    val ghost = store.scan("gold.hourly_stats")
      .filter(col("stat_date") === "2024-09-09" &&
        col("domain") === "en.wikipedia.org").count()
    assert(ghost === 0L)
  }
}

package graft.wiki

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SilverTransformSpec extends SparkSpec {

  private lazy val bronze =
    BronzeTransform(FixtureData.kafkaDf(spark), Clock.fixed("2024-01-02 15:00:00"))
  private lazy val silver =
    SilverTransform(bronze, Clock.fixed("2024-01-02 15:05:00")).cache()

  test("region/language enrichment (P9)") {
    val en = silver.filter(col("event_id") === "test-event-001").collect()(0)
    assert(en.getAs[String]("region") === "americas")
    assert(en.getAs[String]("language") === "en")
    val ja = silver.filter(col("event_id") === "test-event-003").collect()(0)
    assert(ja.getAs[String]("region") === "asia_pacific")
    assert(ja.getAs[String]("language") === "ja")
    // de.wikipedia.org IS in the map
    val de = silver.filter(col("domain") === "de.wikipedia.org").collect()(0)
    assert(de.getAs[String]("region") === "europe")
  }

  test("anonymous IPv4 detection (P11)") {
    val anon = silver.filter(col("event_id") === "test-event-003").collect()(0)
    assert(anon.getAs[Boolean]("is_anonymous"))
    assert(anon.getAs[String]("user_normalized") === "192.168.1.1")
    val reg = silver.filter(col("event_id") === "test-event-001").collect()(0)
    assert(!reg.getAs[Boolean]("is_anonymous"))
  }

  test("anomaly flags (P12): -19000 is a large deletion") {
    val del = silver.filter(col("event_id") === "test-event-003").collect()(0)
    assert(del.getAs[Int]("length_delta") === -19000)
    assert(del.getAs[Boolean]("is_large_deletion"))
    assert(!del.getAs[Boolean]("is_large_addition"))
  }

  test("valid-only filter (P13) drops the no-domain event") {
    // 5 bronze rows, 1 has null domain → 4 silver rows
    assert(silver.count() === 4)
    assert(silver.filter(col("domain").isNull).count() === 0)
  }

  test("control-character stripping in user_normalized (P10)") {
    val sp = spark
    import sp.implicits._
    val dirty = bronze
      .withColumn("user", concat(lit("Bad"), lit("\u0001"), lit("User")))
    val cleaned = SilverTransform(dirty, Clock.fixed("2024-01-02 15:05:00"))
    assert(cleaned.select("user_normalized").distinct()
      .as[String].collect().toSet === Set("BadUser"))
  }
}

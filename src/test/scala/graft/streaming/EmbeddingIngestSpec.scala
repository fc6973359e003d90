package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.llmdata.{AnnIndex, Similarity}

/** The ingest→index→serve loop for vectors: an ANN index bootstrapped
  * with [[AnnIndex.build]] and grown through a STREAM of micro-batch
  * appends must hold exactly what a one-shot build over the full
  * corpus holds (under the same frozen quantizer) — the AnnIndexSpec
  * equivalence, driven through foreachBatch. */
class EmbeddingIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stream-appended index equals one-shot build; replays skipped") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)

    // production split: quantizer trained once on the bootstrap slice,
    // frozen for every later append (and for the one-shot twin, so the
    // comparison isolates the LIFECYCLE, not quantizer drift)
    val boot = emb.filter(col("vec_id") % 3 === 0)
    val cents = Similarity.trainCentroids(boot, "vec_id", "embedding", 16)
    val books = Similarity.trainPqCodebooks(boot, "vec_id", "embedding",
      m = 4, k = 16)

    val tStream = s"graft_annidx_stream_${System.nanoTime()}"
    AnnIndex.build(spark, tStream, boot, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = false,
      centroids = Some(cents), codebooks = Some(books))

    // the rest of the corpus arrives in two micro-batches
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = rest.splitAt(rest.size / 2)

    val input = MemoryStream[(Long, Array[Float])]
    val job = new EmbeddingIngest(tStream, tmpDir("annck"),
      trigger = Trigger.ProcessingTime(0))
    val q = job.start(input.toDF().toDF("vec_id", "embedding"))
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val tFull = s"graft_annidx_oneshot_${System.nanoTime()}"
    AnnIndex.build(spark, tFull, emb, "vec_id", "embedding",
      nlist = 16, m = 4, kCodes = 16, residual = false,
      centroids = Some(cents), codebooks = Some(books))

    // stored codes identical (order-free) …
    def codes(t: String) = spark.table(t).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq)).toSet
    assert(codes(tStream) === codes(tFull))

    // … and the search surface agrees
    def results(t: String) = AnnIndex.search(spark, t, queries,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(results(tStream) === results(tFull))

    // foreachBatch at-least-once: a replayed batch id must be a no-op
    // (an append is not idempotent — the marker is the gate)
    val n = spark.table(tStream).count()
    assert(job.lastIndexed >= 1L)
    job.indexOnce(b1.toDF("vec_id", "embedding"), job.lastIndexed)
    assert(spark.table(tStream).count() === n, "replayed batch re-appended")

    // streaming into a non-existent index refuses loudly (the frozen
    // quantizer must come from a deliberate bootstrap build)
    val bad = new EmbeddingIngest(s"graft_no_such_idx_${System.nanoTime()}",
      tmpDir("annck2"), trigger = Trigger.ProcessingTime(0))
    val err = intercept[IllegalArgumentException] {
      bad.indexOnce(b1.toDF("vec_id", "embedding"), 0L)
    }
    assert(err.getMessage.contains("AnnIndex.build"))

    spark.sql(s"DROP TABLE IF EXISTS $tStream")
    spark.sql(s"DROP TABLE IF EXISTS ${tStream}_params")
    spark.sql(s"DROP TABLE IF EXISTS $tFull")
    spark.sql(s"DROP TABLE IF EXISTS ${tFull}_params")
  }

  test("index file count stays bounded across appends (compaction cadence)") {
    val sp = spark
    import sp.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    val boot = emb.filter(col("vec_id") % 5 === 0)
    val cents = Similarity.trainCentroids(boot, "vec_id", "embedding", 8)
    val books = Similarity.trainPqCodebooks(boot, "vec_id", "embedding",
      m = 4, k = 16)
    val t = s"graft_annidx_compact_${System.nanoTime()}"
    AnnIndex.build(spark, t, boot, "vec_id", "embedding",
      nlist = 8, m = 4, kCodes = 16, residual = false,
      centroids = Some(cents), codebooks = Some(books))
    // threshold 0: compact whenever files exceed the occupied-cell
    // floor at all — the tightest cadence; the bound below is then
    // cells + one batch's fan-out, NOT the per-append accumulation
    // per-batch probing (maintainEvery = 1): this spec pins the bound
    // the trigger enforces WHEN evaluated; the production default
    // amortizes the probe across batches
    val job = new EmbeddingIngest(t, tmpDir("anncck"), compactAbove = 0,
      maintainEvery = 1)
    val rest = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    var maxExcess = 0
    rest.grouped(math.max(1, rest.size / 6)).zipWithIndex.foreach {
      case (b, i) =>
        job.indexOnce(b.toDF("vec_id", "embedding"), i.toLong)
        val cells = AnnIndex.occupiedCells(spark, t)
        maxExcess = math.max(maxExcess,
          spark.table(t).inputFiles.length - cells)
    }
    // each append touches ≤ 8 cells with ≤ a few write tasks each;
    // the cadence must keep excess-over-floor to one batch's fan-out
    assert(maxExcess <= 32, s"file excess over cell floor hit $maxExcess")
    // and nothing was lost: every streamed id is searchable
    assert(spark.table(t).count() === emb.count())
    val res = AnnIndex.search(spark, t,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 2)
    assert(res.count() > 0)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}_params")
  }

  test("empty batches neither probe nor advance the maintenance cadence") {
    // MaintenanceCadence's contract is "every `every`-th NON-EMPTY
    // batch": an empty batch appends no files, so counting it would
    // silently stretch the effective cadence under sparse traffic —
    // and the probe itself is the O(index files) cost the cadence
    // exists to amortize. Pinned with every=2 and compactAbove=0 so a
    // miscounted empty batch is OBSERVABLE: it would be the 2nd due()
    // call and fire a compaction (files > cell floor here), shrinking
    // the file count; a correct ingest leaves the files untouched and
    // compacts on the 2nd NON-empty batch instead.
    val sp = spark
    import sp.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    val boot = emb.filter(col("vec_id") % 5 === 0)
    val cents = Similarity.trainCentroids(boot, "vec_id", "embedding", 8)
    val books = Similarity.trainPqCodebooks(boot, "vec_id", "embedding",
      m = 4, k = 16)
    val t = s"graft_annidx_cadence_${System.nanoTime()}"
    AnnIndex.build(spark, t, boot, "vec_id", "embedding",
      nlist = 8, m = 4, kCodes = 16, residual = false,
      centroids = Some(cents), codebooks = Some(books))
    val job = new EmbeddingIngest(t, tmpDir("anncad"), compactAbove = 0,
      maintainEvery = 2)
    val rest = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b0, b2) = rest.splitAt(rest.size / 2)
    val empty = b0.toDF("vec_id", "embedding").limit(0)

    // batch 0 (non-empty, 8-task fan-out): due() #1 → no probe yet
    job.indexOnce(b0.toDF("vec_id", "embedding").repartition(8), 0L)
    val cells = AnnIndex.occupiedCells(spark, t)
    val filesAfterB0 = spark.table(t).inputFiles.length
    assert(filesAfterB0 > cells,
      s"precondition: the trigger must be armed (files $filesAfterB0 ≤ cell floor $cells)")

    // batch 1 (EMPTY): must not consult due() at all — a miscount
    // would fire the armed compaction right here
    job.indexOnce(empty, 1L)
    assert(spark.table(t).inputFiles.length === filesAfterB0,
      "an empty batch advanced the cadence and fired a compaction")

    // batch 2 (non-empty): the true 2nd non-empty batch probes,
    // trigger fires, the index compacts down toward the cell floor
    job.indexOnce(b2.toDF("vec_id", "embedding").repartition(8), 2L)
    val filesAfterB2 = spark.table(t).inputFiles.length
    assert(filesAfterB2 < filesAfterB0,
      s"the 2nd non-empty batch must compact (files $filesAfterB2 after " +
        s"append+compact vs $filesAfterB0 before)")
    assert(spark.table(t).count() === emb.count(), "no rows lost")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}_params")
  }
}

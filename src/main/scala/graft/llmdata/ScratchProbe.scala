package graft.llmdata
// TEMPORARY r17 measurement scratch - deleted before commit.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new graft.CpuTimeListener
    spark.sparkContext.addSparkListener(cpu)
    def time(label: String)(thunk: => Unit): Unit = {
      thunk
      val c0 = cpu.taskCpuNanos.get(); val t0 = System.nanoTime()
      thunk
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c = (cpu.taskCpuNanos.get() - c0) / 1e9
      println(f"[scratch] $label%-34s wall=$wall%7.3f cpu=$c%7.3f")
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    println("[scratch] docs=" + docs.count() + " avglen=" +
      docs.select(avg(length(col("text")))).head().getDouble(0))
    val p = graft.SparkUtil.parallelScan(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .localCheckpoint(true)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("baseline select len") { noop(p.select(length(col("text")))) }
    time("tokenCount") { noop(p.select(TextFunctions.tokenCount(col("text")))) }
    time("stopwordRatio") { noop(p.select(TextFunctions.stopwordRatio(col("text")))) }
    time("meanWordLength") { noop(p.select(TextFunctions.meanWordLength(col("text")))) }
    time("qualityScore") { noop(p.select(TextFunctions.qualityScore(col("text")))) }
    time("tokenCount+quality (enr)") { noop(p.select(
      TextFunctions.tokenCount(col("text")), TextFunctions.qualityScore(col("text")))) }
    spark.stop()
  }
}

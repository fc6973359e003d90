package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline: queries ×
  * corpus with precomputed norms — a broadcast of the (small) query
  * side against a scan of the corpus, no shuffle until the final
  * per-query top-k. The LSH variant (sign-random-projection buckets)
  * is the scale path: candidates come from a bucket equi-join, so the
  * cross product never materializes.
  *
  * All float math is promoted to double and folded sequentially
  * (`aggregate` = left fold) for engine-portable determinism.
  */
object Similarity {

  /** Promote array<float> to array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (assumes non-zero vectors). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), deterministically ranked by
    * (rounded similarity desc, neighbor id asc).
    */
  import graft.functions.VectorExpressions.{dotF, lshBucketF}

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // float arrays stay float; the codegen'd dotF kernel promotes each
    // element to double in fold order — bit-identical to the explicit
    // cast-then-aggregate formulation, ~100× less per-element overhead
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF-flat ANN with a deterministic coarse quantizer: the first
    * `nlist` corpus vectors serve as centroids (a k-means-free stand-in
    * with identical plumbing — swap in trained centroids at will).
    * Every corpus vector is assigned to its nearest centroid (one
    * small-broadcast pass); queries probe the `nprobe` nearest
    * centroid lists, so the scan is |probe lists|, not |corpus|.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16,
              nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).cast("int").as("cell"), col(vecCol).as("centv"))
      .withColumn("centn", sqrt(dotF(col("centv"), col("centv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
    // assign each corpus vector to its nearest centroid
    val assignW = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("centcos").desc, col("cell").asc)
    val assigned = c.crossJoin(broadcast(cent))
      .withColumn("centcos",
        round(dotF(col("cv"), col("centv")) / (col("cn") * col("centn")), 6))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cell"))
    // queries probe their nprobe nearest cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("centcos").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("centcos",
        round(dotF(col("qv"), col("centv")) / (col("qn") * col("centn")), 6))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-hyperplane component for plane j, dim i:
    * ±1 from a fixed congruence — engine-portable (no RNG).
    */
  private def planeSign(j: Int, i: Column): Column =
    when(((lit(j * 73) + i * i * 31 + 7) % 1000003) % 2 === 0, 1.0)
      .otherwise(-1.0)

  /** Sign-random-projection LSH bucket id from `planes` hyperplanes. */
  def lshBucket(v: Column, planes: Int = 8): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        transform(sequence(lit(0), size(v) - 1),
          i => planeSign(j, i) * get(v, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share a bucket; rank by cosine.
    * Recall < 1.0 by construction; the join is on the bucket id.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
      .withColumn("bucket", lshBucketF(col("qv"), planes))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(dotF(col("cv"), col("cv"))))
      .withColumn("bucket", lshBucketF(col("cv"), planes))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "neighbor_id", "cos", "rank")
  }
}

package graft.functions

import graft.SparkSpec
import graft.llmdata.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** An expression whose generated Java cannot compile (unknown
  * identifier) but whose interpreted eval works — the control that
  * proves the NO_FALLBACK guard actually trips on codegen compile
  * failures instead of silently interpreting. */
case class BrokenCodegen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "broken_codegen"
  override def nullSafeEval(input: Any): Any = 0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = deliberately_undefined_symbol;")
  override protected def withNewChildInternal(newChild: Expression): BrokenCodegen =
    copy(child = newChild)
}

/** Round-8 verdict Next #2: a silent whole-stage-codegen compile
  * failure (181 `ERROR CodeGenerator` traces per test run from the
  * trained-PQ encode shape) produced zero red tests — Spark's default
  * `spark.sql.codegen.fallback=true` swallows the Janino error and
  * interprets row-at-a-time, the exact overhead class the codegen
  * kernels exist to kill. This suite pins the contract loudly: the
  * similarity/dedup kernel family must execute with fallback DISABLED
  * (a compile failure becomes a thrown error, i.e. a red test), and
  * the control test proves the guard is live by showing a
  * deliberately-broken expression does throw under the same config. */
class CodegenGuardSpec extends SparkSpec {

  /** Run `body` with codegen fallback disabled in BOTH tiers:
    * whole-stage (spark.sql.codegen.fallback) and object-factory
    * projections (spark.sql.codegen.factoryMode). */
  private def withNoFallback[T](body: => T): T = {
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  /** Clustered embedding corpus in the shape of the trained-PQ spec
    * (the exact shape whose codes projection failed Janino in r8). */
  private def clusteredVecs(dim: Int, clusters: Int, per: Int) = {
    val sp = spark
    import sp.implicits._
    (0 until clusters * per).map { i =>
      val c = i / per
      Array.tabulate(dim)(d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 37 + d * 13) % 7 - 3) * 0.1f)
    }.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  /** The control test compiles a deliberately broken class; try to
    * silence the CodeGenerator logger around it. Under sbt the
    * LoggerContext plumbing doesn't always take, so the greppable
    * full-suite invariant is: every `ERROR CodeGenerator` line must be
    * followed by the control's `deliberately_undefined_symbol` marker
    * — any OTHER codegen compile error is a regression (and a red
    * test, via the NO_FALLBACK suites below). */
  private def withCodegenLoggerOff[T](body: => T): T = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.LoggerConfig
    val name = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
    // resolve the LoggerContext through Spark's OWN classloader —
    // under sbt, Configurator.setLevel from test code lands in a
    // different context and silences nothing
    val sparkCl = classOf[org.apache.spark.sql.SparkSession].getClassLoader
    val ctx = org.apache.logging.log4j.LogManager
      .getContext(sparkCl, false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    def setLevel(l: Level): Unit = {
      val lc = cfg.getLoggerConfig(name)
      if (lc.getName == name) lc.setLevel(l)
      else cfg.addLogger(name, new LoggerConfig(name, l, true))
      ctx.updateLoggers()
    }
    setLevel(Level.OFF)
    try body finally setLevel(Level.ERROR)
  }

  test("control: a broken expression THROWS under NO_FALLBACK (guard is live)") {
    withCodegenLoggerOff {
    val sp = spark
    import sp.implicits._
    // a fresh Dataset per phase: queryExecution is cached on the
    // Dataset, so a plan materialized under default conf would keep
    // its fallback behavior inside withNoFallback. spark.range, not a
    // local Seq — ConvertToLocalRelation folds projections over
    // LocalRelation on the driver and codegen never runs at all.
    def df = spark.range(8)
      .select(column(BrokenCodegen(expression(col("id")))).as("y"))
    // sanity: with default fallback the broken codegen silently interprets
    assert(df.collect().forall(_.getInt(0) == 0))
    withNoFallback {
      val e = intercept[Throwable] { df.collect() }
      def mentionsCompile(t: Throwable): Boolean =
        t != null && (t.getMessage != null &&
          (t.getMessage.contains("ompil") || t.getMessage.contains("Janino")) ||
          mentionsCompile(t.getCause))
      assert(mentionsCompile(e), s"expected a compile error, got $e")
    }
    }
  }

  test("trained-PQ pipeline compiles clean under NO_FALLBACK (r8 regression)") {
    withNoFallback {
      val vecs = clusteredVecs(dim = 16, clusters = 4, per = 30)
      val books = Similarity.trainPqCodebooks(
        vecs, "vec_id", "embedding", m = 4, k = 16, iters = 2)
      assert(books.size == 4 && books.head.size == 16)
      val queries = vecs.filter(col("vec_id") % 10 === 3)
      val top = Similarity.pqTopK(queries, vecs, "vec_id", "embedding",
        k = 3, m = 4, kCodes = 16, codebooks = Some(books))
      assert(top.count() > 0)
    }
  }

  test("IVF/IVF-PQ kernels compile clean under NO_FALLBACK") {
    withNoFallback {
      val vecs = clusteredVecs(dim = 16, clusters = 4, per = 30)
      val queries = vecs.filter(col("vec_id") % 10 === 3)
      val cents = Similarity.trainCentroids(
        vecs, "vec_id", "embedding", nlist = 4, iters = 2)
      assert(Similarity.ivfTopK(queries, vecs, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 2, centroids = Some(cents)).count() > 0)
      assert(Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding",
        k = 3, nlist = 4, nprobe = 2, m = 4, kCodes = 8,
        centroids = Some(cents)).count() > 0)
    }
  }

  test("vector/dedup codegen kernels compile clean under NO_FALLBACK") {
    val sp = spark
    import sp.implicits._
    withNoFallback {
      val vecs = clusteredVecs(dim = 16, clusters = 2, per = 20)
      val kernels = vecs.select(
        col("embedding"),
        VectorExpressions.dotF(col("embedding"), col("embedding")).as("dd"),
        VectorExpressions.lshBucketF(col("embedding"), planes = 8).as("b"),
        VectorExpressions.maxAbsF(col("embedding")).as("ma"),
        VectorExpressions.pqArgminF(col("embedding"), 0,
          Seq(Array(1f, 2f, 3f, 4f), Array(4f, 3f, 2f, 1f))).as("code"))
        .withColumn("q", VectorExpressions.quantizeInt8(col("embedding"), col("ma")))
        .withColumn("qq", VectorExpressions.int8SelfDot(col("q")))
      assert(kernels.agg(sum(col("qq"))).collect().head.getLong(0) > 0)
      val docs = Seq((1L, "the cat sat on the mat the cat sat"),
        (2L, "a wholly different text with no repeats at all"))
        .toDF("doc_id", "text")
      val rep = docs.select(col("doc_id"),
        RepetitionExpression.repetitionProfile(col("text")).as("r"))
      assert(rep.count() == 2)
    }
  }

  test("representative gate queries execute end-to-end under NO_FALLBACK") {
    // one query per expression family that codegen could silently drop:
    // the shingle/minhash kernels (dd02/dd03), the BPE served plan
    // (t24), the fused repetition battery (t25), the one-pass profile
    // aggregate (a08), the PQ encode/serve plans (e06/e07), the
    // transactional store lifecycle (s14), stateful sessionization
    // (w04), and the envelope parse (p01). Evaluated through the noop
    // sink so every projection actually compiles and runs.
    val names = Seq("dd02_ngram_jaccard", "dd03_minhash_lsh",
      "t24_bpe_roundtrip", "t25_gopher_repetition", "a08_profile_stats",
      "e06_ann_pq", "e07_ann_ivfpq", "s14_tx_store",
      "w04_sessionization", "p01_from_json")
    withNoFallback {
      for (n <- names) {
        val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        df.write.mode("overwrite").format("noop").save()
      }
    }
  }

  test("FloatPqArgmin is bit-identical to the round()-expression argmin twin") {
    val sp = spark
    import sp.implicits._
    val dsub = 4
    val rnd = new scala.util.Random(42)
    // duplicated entries pin the tie-break (equal dsel -> smallest j);
    // near-identical entries probe the rounding boundary
    val base = Seq.fill(6)(Array.fill(dsub)((rnd.nextInt(41) - 20) * 0.1f))
    val books: Seq[Array[Float]] =
      base ++ Seq(base(0).clone(), base(2).clone(),
        base(1).map(x => x + 5e-7f), base(3).map(x => x - 5e-7f))
    val cc = books.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      acc
    }
    val vecs = (0 until 400).map { i =>
      (i.toLong, Array.fill(dsub)((rnd.nextInt(81) - 40) * 0.05f).toSeq)
    }.toDF("id", "v")
    // the twin: exactly the pre-r9 expression shape (argmax of
    // (-round(cc - 2 x.c, 6), -j) via greatest) — interpreted fallback
    // is fine here, bit-equality is what's being pinned
    def twin(v: Column): Column = {
      val scored = books.zipWithIndex.map { case (c, j) =>
        val dsel = round(lit(cc(j)) -
          lit(2.0) * VectorExpressions.dotF(v, typedLit(c.toSeq)), 6)
        struct((dsel * -1).as("nd"), lit(-j).as("nj"))
      }
      (greatest(scored: _*).getField("nj") * -1).cast("int")
    }
    val got = vecs.select(col("id"),
      VectorExpressions.pqArgminF(col("v"), 0, books).as("kernel"),
      twin(col("v")).as("twin"))
    val diff = got.filter(col("kernel") =!= col("twin")).collect()
    assert(diff.isEmpty, s"kernel/twin argmin diverge: ${diff.take(5).mkString(", ")}")
    // tie-break reached: duplicated entries must never win over their
    // earlier twin
    val codes = got.select("kernel").as[Int].collect().toSet
    assert(!codes.contains(6) && !codes.contains(7),
      s"duplicate codebook entries won an argmin (ties broken wrong): $codes")
  }

  test("FloatPqArgmin orders NaN last, like the SQL oracle's ORDER BY") {
    // a NaN distance (NaN/Inf codebook or embedding values) must lose
    // to every finite distance: DuckDB's ORDER BY dsel ASC sorts NaN
    // last, and the kernel's `d < bestD` alone would let a NaN j=0
    // stick forever (`finite < NaN` is false)
    val sp = spark
    import sp.implicits._
    val books: Seq[Array[Float]] = Seq(
      Array(Float.NaN, 0f),   // j=0: NaN distance to everything
      Array(10f, 10f),        // j=1: finite, far
      Array(1f, 1f),          // j=2: finite, the true argmin
      Array(Float.PositiveInfinity, 0f)) // j=3: +Inf distance
    val got = Seq((0L, Seq(1.1f, 0.9f))).toDF("id", "v")
      .select(VectorExpressions.pqArgminF(col("v"), 0, books).as("code"))
      .head().getInt(0)
    assert(got === 2, s"NaN/Inf centroid won the argmin (code $got)")
    // an all-NaN distance row (NaN in the QUERY subvector) keeps the
    // first code — no finite candidate exists to prefer
    val allNaN = Seq((0L, Seq(Float.NaN, 1f))).toDF("id", "v")
      .select(VectorExpressions.pqArgminF(col("v"), 0, books).as("code"))
      .head().getInt(0)
    assert(allNaN === 0)
  }

  test("FloatNearestCell is bit-identical to the greatest-of-structs twin") {
    val sp = spark
    import sp.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    def selfDot(c: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      acc
    }
    // duplicated centroids pin the tie-break (equal cos -> smallest
    // cell); near-identical ones probe the round-6 boundary; a zero
    // centroid forces a zero divisor — NULL score under non-ANSI
    // Spark division (NOT NaN), which must lose to every non-null
    // cell in both forms
    val base = Seq.fill(10)(Array.fill(dim)((rnd.nextInt(41) - 20) * 0.1f))
    val cents: Seq[Array[Float]] =
      base ++ Seq(base(1).clone(), base(4).clone(),
        base(2).map(x => x + 5e-7f), Array.fill(dim)(0f))
    val vecs = ((0 until 500).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextInt(81) - 40) * 0.05f).toSeq)
    } ++ Seq(
      (9000L, base(4).toSeq),              // exact tie with cents(4)/cents(11)
      (9001L, Seq.fill(dim)(0f))           // zero vector: NaN vs every cell
    )).toDF("id", "v")
    // the twin: exactly the pre-r17 expression shape (greatest over
    // (round(cos, 6), -cell) structs) — interpreted eval is fine here,
    // bit-equality is what's being pinned
    def twin(vec: Column, vnorm: Column): Column = {
      val scored = cents.zipWithIndex.map { case (cv, cell) =>
        val cn = math.sqrt(selfDot(cv))
        struct(
          round(VectorExpressions.dotF(vec, typedLit(cv.toSeq)) /
            (vnorm * lit(cn)), 6).as("c"),
          lit(-cell).as("negcell"))
      }
      greatest(scored: _*).getField("negcell") * -1
    }
    val withN = vecs.withColumn("vn",
      sqrt(VectorExpressions.dotF(col("v"), col("v"))))
    val got = withN.select(col("id"),
      VectorExpressions.nearestCellF(col("v"), col("vn"), cents).as("kernel"),
      twin(col("v"), col("vn")).cast("int").as("twin"))
    val diff = got.filter(col("kernel") =!= col("twin")).collect()
    assert(diff.isEmpty,
      s"kernel/twin nearest-cell diverge: ${diff.take(5).mkString(", ")}")
    // tie-break reached: the duplicated centroids (cells 10, 11) must
    // never win over their earlier twins (cells 1, 4)
    val cells = got.select("kernel").as[Int].collect().toSet
    assert(!cells.contains(10) && !cells.contains(11),
      s"duplicate centroids won the argmax (ties broken wrong): $cells")

    // r18 (ADVICE r17): NULL INPUTS pinned, not just documented — a
    // null vec and a null vnorm must both land on cell 0 in BOTH
    // forms (the struct twin's every score goes null, greatest keeps
    // the negcell-0 struct; the kernel propagates null and the
    // factory's coalesce maps it to 0)
    val nullVec = Seq((9002L, Option.empty[Seq[Float]]))
      .toDF("id", "v")
      .withColumn("vn", sqrt(VectorExpressions.dotF(col("v"), col("v"))))
    val nullNorm = vecs.limit(3)
      .withColumn("vn", lit(null).cast("double"))
    for ((frame, what) <- Seq((nullVec, "null vec"), (nullNorm, "null vnorm"))) {
      val rows = frame.select(
        VectorExpressions.nearestCellF(col("v"), col("vn"), cents).as("kernel"),
        twin(col("v"), col("vn")).cast("int").as("twin")).collect()
      assert(rows.nonEmpty, s"$what fixture empty")
      rows.foreach { r =>
        assert(!r.isNullAt(0) && r.getInt(0) == 0,
          s"$what must coalesce to cell 0 in the kernel, got $r")
        assert(!r.isNullAt(1) && r.getInt(1) == 0,
          s"$what must yield cell 0 in the struct twin, got $r")
      }
    }
  }

  test("array-field kernels compare equal across factory clones (canonicalization)") {
    // r18 (ADVICE r17): the factories clone their centroid/codebook
    // arrays per call, and case-class equality on Array fields is
    // reference-based — without the content-based equals override two
    // identical kernels never canonicalize equal, defeating
    // subexpression elimination and exchange/cache reuse
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val vRef = BoundReference(0, ArrayType(FloatType), nullable = true)
    val nRef = BoundReference(1, DoubleType, nullable = true)
    def cents() = Array(Array(1f, 2f), Array(3f, 4f)) // fresh clones
    val norms = Array(math.sqrt(5.0), math.sqrt(25.0))
    val a = FloatNearestCell(vRef, nRef, cents(), norms.clone())
    val b = FloatNearestCell(vRef, nRef, cents(), norms.clone())
    assert(a == b, "nearestCellF clones must compare equal")
    assert(a.hashCode == b.hashCode)
    assert(a.canonicalized.semanticEquals(b.canonicalized))
    val pa = FloatPqArgmin(vRef, 2, cents(), norms.clone())
    val pb = FloatPqArgmin(vRef, 2, cents(), norms.clone())
    assert(pa == pb, "pqArgminF clones must compare equal")
    assert(pa.hashCode == pb.hashCode)
    val different =
      FloatNearestCell(vRef, nRef, Array(Array(9f, 9f)), Array(1.0))
    assert(a != different, "different centroids must not compare equal")
  }
}

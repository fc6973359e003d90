package graft.functions

import graft.SparkSpec
import graft.llmdata.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-equivalence pins for the fused [[TokenStats]] kernel (r18):
  * every struct field must equal its builtin-formulation twin on a
  * fixture that covers the split-semantics edges (empty string, runs
  * of spaces, leading/trailing spaces, NULL, non-ASCII, all three
  * marker languages, heavy repetition) — the exact rows where a
  * hand-rolled tokenizer classically diverges from
  * `split(text, " ")` with limit -1. */
class TokenStatsSpec extends SparkSpec {

  private val fixture: Seq[String] = Seq(
    "",
    " ",
    "   ",
    "a",
    "a b c",
    "a  b",          // empty token between double spaces
    " a b",          // leading empty token
    "a b ",          // trailing empty token kept (limit -1)
    "the quick the quick the",
    "the a of and to in",
    "der die das und nicht ist",
    "le la les et dans est",
    "the und le THE Und lE",    // case must NOT match
    "héllo wörld the naïve",
    "日本語 テスト the",
    "😀 the 😀 of 😀",            // non-BMP
    "a-b the, of. and;",         // punctuation sticks to tokens
    Seq.fill(200)("the of a word word").mkString(" "),
    null)

  private def df = {
    val sp = spark
    import sp.implicits._
    fixture.toDF("text")
  }

  private val en = TextFunctions.Stopwords
  private val de = TextFunctions.LanguageMarkers(1)._2
  private val fr = TextFunctions.LanguageMarkers(2)._2

  /** Collect a two-column frame (builtin, fused) and require exact
    * row-wise equality, nulls included. */
  private def pinEqual(builtin: Column, fused: Column, what: String): Unit = {
    val rows = df.select(builtin.as("b"), fused.as("f")).collect()
    rows.zip(fixture).foreach { case (r, src) =>
      assert(r.get(0) == r.get(1),
        s"$what diverged on ${Option(src).map(_.take(40))}: " +
          s"builtin=${r.get(0)} fused=${r.get(1)}")
    }
  }

  private def stLite = TextFunctions.tokenStats(col("text"))
  private def stFull = TextFunctions.tokenStats(col("text"), withDistinct = true)
  private def toks = split(col("text"), " ")

  test("word lists mirror TextFunctions (the kernel's cross-pin)") {
    assert(TokenStatsExpression.EnWords == TextFunctions.Stopwords)
    assert(TokenStatsExpression.DeWords ==
      TextFunctions.LanguageMarkers.find(_._1 == "de").get._2)
    assert(TokenStatsExpression.FrWords ==
      TextFunctions.LanguageMarkers.find(_._1 == "fr").get._2)
  }

  test("n_tokens == size(split(text, ' '))") {
    pinEqual(size(toks), stLite.getField("n_tokens"), "n_tokens")
  }

  test("stop/de/fr hits == size(filter(toks, isin(list)))") {
    def hits(list: Seq[String]) =
      size(filter(toks, w => w.isin(list: _*)))
    pinEqual(hits(en), stLite.getField("stop_hits"), "stop_hits")
    pinEqual(hits(de), stLite.getField("de_hits"), "de_hits")
    pinEqual(hits(fr), stLite.getField("fr_hits"), "fr_hits")
  }

  test("stop_distinct == size(array_intersect(array_distinct, stopArr))") {
    val stopArr = array(en.map(lit): _*)
    pinEqual(size(array_intersect(array_distinct(toks), stopArr)),
      stLite.getField("stop_distinct"), "stop_distinct")
  }

  test("n_distinct == size(array_distinct(toks))") {
    pinEqual(size(array_distinct(toks)),
      stFull.getField("n_distinct"), "n_distinct")
  }

  test("clean_chars == length(regexp_replace(text, neg-class, ''))") {
    // the builtin yields NULL on NULL text where the kernel field is
    // the -1 sentinel — the sentinel is only ever consumed through
    // symbolRatioFrom, whose length(text) factor re-nulls it (pinned
    // below); the field pin therefore compares non-null rows
    pinEqual(
      when(col("text").isNotNull,
        length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))),
      when(col("text").isNotNull, stLite.getField("clean_chars")),
      "clean_chars")
    pinEqual(TextFunctions.symbolRatioBuiltin(col("text")),
      TextFunctions.symbolRatio(col("text")), "symbolRatio")
  }

  test("derived metrics bit-identical to the pre-r18 formulations") {
    // the exact builtin trees t01/t02/t22 shipped before the kernel
    def bStop = size(filter(toks, w => w.isin(en: _*))).cast("double") /
      size(toks)
    def bMwl = (length(col("text")) - (size(toks) - 1)).cast("double") /
      size(toks)
    def bSat = least(size(toks).cast("double") / 100.0, lit(1.0))
    val bQuality = round(least(lit(1.0),
      lit(0.3) * least(bStop * 10.0, lit(1.0)) +
        lit(0.4) * least(bMwl / 8.0, lit(1.0)) +
        lit(0.3) * bSat), 6)
    def bMarker(ms: Seq[String]) =
      size(filter(toks, w => w.isin(ms: _*))).cast("double") / size(toks)
    val bScored = TextFunctions.LanguageMarkers.map { case (l, ms) =>
      (l, bMarker(ms))
    }
    val bBest = bScored.map(_._2).reduce((a, b) => greatest(a, b))
    val bArgmax = bScored.foldLeft(
      when(bBest <= 0.02, lit("unknown"))) {
      case (acc, (lang, sc)) => acc.when(sc === bBest, lit(lang))
    }.otherwise(lit("unknown"))

    pinEqual(bStop, TextFunctions.stopwordRatio(col("text")), "stopwordRatio")
    pinEqual(bMwl, TextFunctions.meanWordLength(col("text")), "meanWordLength")
    pinEqual(size(array_distinct(toks)).cast("double") / size(toks),
      TextFunctions.distinctTokenRatio(col("text")), "distinctTokenRatio")
    pinEqual(bQuality, TextFunctions.qualityScore(col("text")), "qualityScore")
    pinEqual(bArgmax, TextFunctions.langIdArgmax(col("text")), "langIdArgmax")
    pinEqual(when(bStop > 0.03, lit("en")).otherwise(lit("unknown")),
      TextFunctions.langIdHeuristic(col("text")), "langIdHeuristic")
    pinEqual(round(least(bStop * 10.0, lit(1.0)), 6),
      TextFunctions.langIdConfidence(col("text")), "langIdConfidence")
  }

  test("kernel executes under NO_FALLBACK codegen (guard family)") {
    val conf = spark.conf
    val oldFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = df.select(stFull.as("st"))
        .agg(sum(col("st.n_tokens"))).collect()(0).getLong(0)
      assert(n > 0)
    } finally {
      oldFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      oldFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }
}

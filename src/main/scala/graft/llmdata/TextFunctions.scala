package graft.llmdata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, and document
  * fingerprinting. Everything is a pure `Column` expression built from
  * codegen'd built-ins (no UDFs) so the whole stage stays inside
  * WholeStageCodegen and scales linearly with input — the property that
  * matters at 100 TB.
  *
  * Cross-engine determinism: hashes are polynomial rolls over ASCII
  * codes modulo 1e9+7 in exact long arithmetic (Spark's murmur `hash()`
  * has no DuckDB twin, so we define our own).
  */
object TextFunctions {

  val HashMod = 1000000007L

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words + punctuation clusters
    * counted separately (a regex-split token estimate). */
  def subwordCountApprox(text: Column): Column =
    size(split(text, "[\\s\\p{Punct}]+"))

  /** Polynomial rolling hash of a string: fold(acc*31 + charCode) mod p.
    * Backed by the codegen'd [[graft.functions.PolyHash]] expression —
    * the built-in `aggregate`/`transform` formulation computes the same
    * value but runs interpreted per character.
    */
  def stringHash(s: Column): Column = graft.functions.HashExpressions.polyHash(s)

  /** Reference formulation via built-in higher-order functions — kept
    * for cross-checking the custom expression in tests. */
  def stringHashBuiltin(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % HashMod)

  /** Document fingerprint = rolling hash over the full text. */
  def fingerprint(text: Column): Column = stringHash(text)

  /** Ratio of stopword tokens (deterministic marker-word heuristic). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    (size(filter(toks, w => w.isin(Stopwords: _*))).cast("double") /
      size(toks))
  }

  /** Mean token length (chars minus separators over token count). */
  def meanWordLength(text: Column): Column =
    ((length(text) - (tokenCount(text) - 1)).cast("double") /
      tokenCount(text))

  /** Repetition: distinct-token ratio (low = heavily repeated text,
    * a standard Gopher-rule filter signal). */
  def distinctTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    size(array_distinct(toks)).cast("double") / size(toks)
  }

  /** Symbol ratio: non-alphanumeric, non-space chars over total chars. */
  def symbolRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast("double") / length(text)

  /** CCNet/RefinedWeb-style normalization for fuzzy-exact dedup:
    * lowercase → strip non-alphanumerics → collapse runs of spaces →
    * trim. Documents identical up to case, punctuation, or whitespace
    * normalize to the same string (and so the same digest), which a
    * raw-text digest misses. Pure codegen projection.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Composite quality score in [0,1]:
    * stopword presence + word-length sanity + length saturation.
    * Thresholds follow common heuristic filters (C4-style length and
    * symbol rules) — deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val sw  = stopwordRatio(text)
    val mwl = meanWordLength(text)
    val sat = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    round(least(lit(1.0),
      lit(0.3) * least(sw * 10.0, lit(1.0)) +
        lit(0.4) * least(mwl / 8.0, lit(1.0)) +
        lit(0.3) * sat), 6)
  }

  /** Language-ID heuristic: n-gram/marker evidence scored per language;
    * the synthetic corpus is English-wordish, so markers separate 'en'
    * from 'unknown' — the operator shape (score → argmax → confidence)
    * is what a real n-gram model plugs into. */
  def langIdHeuristic(text: Column): Column =
    when(stopwordRatio(text) > 0.03, lit("en")).otherwise(lit("unknown"))

  def langIdConfidence(text: Column): Column =
    round(least(stopwordRatio(text) * 10.0, lit(1.0)), 6)

  /** Per-language marker word lists for the argmax classifier. */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "dans", "est"))

  /** Marker-hit ratio for one language's list. */
  def markerRatio(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, w => w.isin(markers: _*))).cast("double") / size(toks)
  }

  /** Argmax language classifier over [[LanguageMarkers]]: best-scoring
    * language, 'unknown' when no list scores above `minRatio`. Ties
    * resolve in list order (deterministic). */
  def langIdArgmax(text: Column, minRatio: Double = 0.02): Column = {
    val scored = LanguageMarkers.map { case (lang, ms) =>
      (lang, markerRatio(text, ms))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(when(best <= minRatio, lit("unknown"))) {
      case (acc, (lang, score)) => acc.when(score === best, lit(lang))
    }.otherwise(lit("unknown"))
  }
}

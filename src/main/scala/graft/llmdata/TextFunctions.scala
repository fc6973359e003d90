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

  /** Fused single-pass token statistics (r18, guide §4) — one codegen
    * kernel per row replaces the per-metric `split(text," ")` re-runs
    * and interpreted higher-order filters below. Identical instances
    * inside one projection collapse to a single evaluation via
    * whole-stage codegen subexpression elimination (the expression is
    * a plain case class, so canonicalization is structural). Every
    * field is bit-identical to its builtin twin — pinned in
    * TokenStatsSpec. `withDistinct` adds the n_distinct field; the
    * per-row hash set is only paid where a distinct ratio is consumed. */
  def tokenStats(text: Column, withDistinct: Boolean = false): Column =
    graft.functions.TokenStatsExpression.tokenStats(text, withDistinct)

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

  def stopwordRatio(text: Column): Column =
    stopwordRatioFrom(tokenStats(text))

  /** [[stopwordRatio]] off an existing [[tokenStats]] struct. */
  def stopwordRatioFrom(st: Column): Column =
    st.getField("stop_hits").cast("double") / st.getField("n_tokens")

  /** Mean token length (chars minus separators over token count). */
  def meanWordLength(text: Column): Column =
    meanWordLengthFrom(text, tokenStats(text))

  /** [[meanWordLength]] off an existing [[tokenStats]] struct. */
  def meanWordLengthFrom(text: Column, st: Column): Column = {
    val nt = st.getField("n_tokens")
    (length(text) - (nt - 1)).cast("double") / nt
  }

  /** Repetition: distinct-token ratio (low = heavily repeated text,
    * a standard Gopher-rule filter signal). */
  def distinctTokenRatio(text: Column): Column = {
    val st = tokenStats(text, withDistinct = true)
    st.getField("n_distinct").cast("double") / st.getField("n_tokens")
  }

  /** Symbol ratio: non-alphanumeric, non-space chars over total chars.
    * r18: the kept-char count comes from the fused [[tokenStats]]
    * kernel's clean_chars field — Spark's RegExpReplace path measured
    * ~0.8 ms/row on this corpus (~30× raw java.util.regex; it
    * dominated t01's task CPU). `length(text)` stays in the tree so
    * NULL propagation is identical to the builtin form. */
  def symbolRatio(text: Column): Column =
    symbolRatioFrom(text, tokenStats(text))

  /** [[symbolRatio]] off an existing [[tokenStats]] struct. */
  def symbolRatioFrom(text: Column, st: Column): Column =
    (length(text) - st.getField("clean_chars"))
      .cast("double") / length(text)

  /** Builtin twin of [[symbolRatio]] — kept as the cross-check in
    * TokenStatsSpec. */
  def symbolRatioBuiltin(text: Column): Column =
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
  def qualityScore(text: Column): Column =
    qualityScoreFrom(text, tokenStats(text))

  /** [[qualityScore]] off an existing [[tokenStats]] struct (so a
    * projection computing several metrics shares ONE kernel pass). */
  def qualityScoreFrom(text: Column, st: Column): Column = {
    val sw  = stopwordRatioFrom(st)
    val mwl = meanWordLengthFrom(text, st)
    val sat = least(st.getField("n_tokens").cast("double") / 100.0, lit(1.0))
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

  /** Marker-hit ratio for one language's list (generic builtin form —
    * the fused [[tokenStats]] fields cover the three built-in lists;
    * kept for arbitrary lists and as the cross-check twin in tests). */
  def markerRatio(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, w => w.isin(markers: _*))).cast("double") / size(toks)
  }

  /** Argmax language classifier over [[LanguageMarkers]]: best-scoring
    * language, 'unknown' when no list scores above `minRatio`. Ties
    * resolve in list order (deterministic). Scores come from the fused
    * [[tokenStats]] kernel (its en/de/fr hit fields mirror
    * [[LanguageMarkers]] — cross-pinned in TokenStatsSpec). */
  def langIdArgmax(text: Column, minRatio: Double = 0.02): Column = {
    val st = tokenStats(text)
    val nt = st.getField("n_tokens")
    val scored = Seq(
      "en" -> (st.getField("stop_hits").cast("double") / nt),
      "de" -> (st.getField("de_hits").cast("double") / nt),
      "fr" -> (st.getField("fr_hits").cast("double") / nt))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(when(best <= minRatio, lit("unknown"))) {
      case (acc, (lang, score)) => acc.when(score === best, lit(lang))
    }.otherwise(lit("unknown"))
  }
}

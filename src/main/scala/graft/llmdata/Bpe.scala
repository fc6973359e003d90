package graft.llmdata

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col

/** Byte-pair encoding — a REAL trained subword tokenizer, not the
  * regex approximation (t03's whitespace/BPE-ish counts remain the
  * cheap path; this is the exact one a token-budgeted training
  * pipeline uses to cost its corpus).
  *
  * Spark-first shape (reference algorithm: Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"):
  *
  *  - TRAIN: one distributed word-frequency aggregation, capped to the
  *    `dictCap` most frequent words (deterministic tie-break) — the
  *    standard scalable formulation: at web scale the top ~1M word
  *    forms carry almost the whole token mass, so the merge loop runs
  *    driver-side over a bounded dict (the same bounded-driver-work
  *    contract as `Similarity.trainCentroids`), never over the corpus.
  *  - ENCODE: partition-local `mapPartitions` with a per-partition
  *    word→tokens memo — Zipf makes the memo hit rate extreme, the
  *    merge walk runs only for unseen word forms, and no shuffle ever
  *    happens. Cost is O(corpus tokens), embarrassingly parallel.
  *
  * Determinism: merges break count ties lexicographically, so the same
  * corpus yields the same model on any cluster layout; encoding is a
  * pure function of (model, word).
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): keeps "est" in "widest"
    * distinct from "est" in "estimate", and makes decode a plain
    * concat-then-split. */
  val EndOfWord = "</w>"

  final case class BpeModel(merges: Seq[(String, String)],
                            vocab: Set[String]) {
    /** rank map for the encoder: earlier merge = lower rank = applied
      * first, exactly the training order */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  private[llmdata] def preTokenize(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Train on the `dictCap` most frequent word forms of
    * `docs(textCol)`. `vocabSize` counts base symbols + merges;
    * training stops early when no pair occurs at least `minCount`
    * times (merging hapax pairs memorizes noise). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            dictCap: Int = 1 << 20, minCount: Long = 2L): BpeModel = {
    val words = docs
      .select(F.explode(F.split(F.lower(col(textCol)), "\\s+")).as("w"))
      .filter(F.length(col("w")) > 0)
      .groupBy("w").agg(F.count(F.lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(dictCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainLocal(words, vocabSize, minCount)
  }

  /** The driver-side merge loop over the bounded (word, count) dict —
    * separated for direct unit testing against hand-derived merges. */
  private[llmdata] def trainLocal(words: Seq[(String, Long)],
                                  vocabSize: Int,
                                  minCount: Long): BpeModel = {
    // each word as its symbol sequence (chars + end marker)
    var seqs: Array[(Array[String], Long)] = words.map { case (w, c) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, c)
    }.toArray
    val baseVocab = scala.collection.mutable.Set[String](EndOfWord)
    seqs.foreach { case (syms, _) => syms.foreach(baseVocab += _) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (baseVocab.size + merges.size < vocabSize) {
      // count adjacent pairs, weighted by word frequency
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) return BpeModel(merges.toSeq, snapshotVocab(baseVocab, merges.toSeq))
      // deterministic best: max count, then lexicographic pair
      val (best, bestCount) = pairCounts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      if (bestCount < minCount)
        return BpeModel(merges.toSeq, snapshotVocab(baseVocab, merges.toSeq))
      merges += best
      val fused = best._1 + best._2
      seqs = seqs.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += fused; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toArray, c)
      }
    }
    BpeModel(merges.toSeq, snapshotVocab(baseVocab, merges.toSeq))
  }

  private def snapshotVocab(base: scala.collection.mutable.Set[String],
                            merges: Seq[(String, String)]): Set[String] =
    base.toSet ++ merges.map { case (a, b) => a + b }

  /** Encode ONE word (pure; exposed for the spec): repeatedly apply
    * the LOWEST-RANK applicable merge — the exact inverse of training
    * order, the standard BPE encode. */
  private[llmdata] def encodeWord(model: BpeModel, word: String): Array[String] = {
    var syms = (word.map(_.toString) :+ EndOfWord).toArray
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        model.ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        val out = new Array[String](syms.length - 1)
        Array.copy(syms, 0, out, 0, bestAt)
        out(bestAt) = syms(bestAt) + syms(bestAt + 1)
        Array.copy(syms, bestAt + 2, out, bestAt + 1,
          syms.length - bestAt - 2)
        syms = out
      }
    }
    syms
  }

  /** Partition-local corpus encoding: adds `bpe_tokens` (the subword
    * array) and `n_bpe_tokens`. No shuffle; a per-partition memo
    * answers repeated word forms (Zipf → near-total hit rate). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val m = bc.value
        val memo = scala.collection.mutable.Map.empty[String, Array[String]]
        rows.map { case (id, text) =>
          val toks = preTokenize(if (text == null) "" else text)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(m, w)))
          (id, toks, toks.length)
        }
      }
      .toDF(idCol, "bpe_tokens", "n_bpe_tokens")
  }

  /** Decode is concat-then-split on the end marker — the round-trip
    * proof that no merge ever loses characters. */
  private[llmdata] def decode(tokens: Seq[String]): String =
    tokens.mkString("").split(java.util.regex.Pattern.quote(EndOfWord), -1)
      .filter(_.nonEmpty).mkString(" ")
}

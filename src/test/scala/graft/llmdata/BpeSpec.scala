package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The trained subword tokenizer against the literature's own
  * worked example (Sennrich et al. 2016 §3.2 uses the
  * low/lower/newest/widest dictionary): the merge sequence is
  * hand-derivable, so the trainer is checked against exact expected
  * merges, and the encoder against the classic "lowest" → low + est
  * segmentation that makes BPE famous. */
class BpeSpec extends SparkSpec {

  private val classicDict = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  // hand-derived (see counts in the test bodies):
  //  1. (e,s)   9 = newest 6 + widest 3  (ties (s,t),(t,</w>) lose lex)
  //  2. (es,t)  9
  //  3. (est,</w>) 9
  //  4. (l,o)   7 = low 5 + lower 2      (tie (o,w) loses lex)
  //  5. (lo,w)  7
  private val classicMerges = Seq(
    ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w"))

  test("training reproduces the literature's merge sequence exactly") {
    // base symbols: l o w e r n s t i d + </w> = 11; +5 merges = 16
    val model = Bpe.trainLocal(classicDict, vocabSize = 16, minCount = 2L)
    assert(model.merges === classicMerges)
    assert(model.vocab.contains("est" + Bpe.EndOfWord))
    assert(model.vocab.contains("low"))
    // determinism: same dict, same model
    assert(Bpe.trainLocal(classicDict, 16, 2L).merges === classicMerges)
  }

  test("encode segments an UNSEEN word with trained subwords; round-trips losslessly") {
    val model = Bpe.trainLocal(classicDict, vocabSize = 16, minCount = 2L)
    // the classic result: "lowest" was never in the dictionary, but
    // its pieces were
    assert(Bpe.encodeWord(model, "lowest").toSeq ===
      Seq("low", "est" + Bpe.EndOfWord))
    assert(Bpe.encodeWord(model, "lower").toSeq ===
      Seq("low", "e", "r", Bpe.EndOfWord))
    // unknown characters degrade to singletons, never crash or drop
    assert(Bpe.decode(Bpe.encodeWord(model, "xyzzy").toSeq) === "xyzzy")
    // corpus-level round trip: decode(encode(text)) == pre-tokenized text
    for (text <- Seq("the lowest of the low", "newest widest lowest",
                     "Mixed CASE and   spacing")) {
      val toks = Bpe.preTokenize(text).flatMap(w => Bpe.encodeWord(model, w))
      assert(Bpe.decode(toks.toSeq) === Bpe.preTokenize(text).mkString(" "))
    }
  }

  test("train stops at minCount (no hapax memorization) and at vocabSize") {
    val m1 = Bpe.trainLocal(Seq(("ab", 1L), ("cd", 1L)), 100, minCount = 2L)
    assert(m1.merges.isEmpty, "pairs below minCount must not merge")
    val m2 = Bpe.trainLocal(classicDict, vocabSize = 13, minCount = 2L)
    assert(m2.merges.size === 2, s"vocab budget 13 = 11 base + 2 merges")
  }

  test("dictCap truncates to the MOST FREQUENT word forms (deterministic tie-break)") {
    val sp = spark
    import sp.implicits._
    // "newest" (6) and "low" (5) survive a cap of 2; "widest"/"lower"
    // fall out — so no merge may contain 'i' or 'r'
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", vocabSize = 16, dictCap = 2)
    assert(m.merges.nonEmpty)
    assert(!m.merges.exists { case (a, b) => (a + b).contains("i") },
      "widest must be outside the capped dictionary")
    assert(!m.merges.exists { case (a, b) => (a + b).contains("r") },
      "lower must be outside the capped dictionary")
    // encoding UNSEEN capped-out words still round-trips losslessly
    assert(Bpe.decode(Bpe.encodeWord(m, "widest").toSeq) === "widest")
  }

  test("Spark train == local train on the word counts; encode is shuffle-free") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", vocabSize = 16)
    assert(model.merges === classicMerges,
      "the distributed word count must feed the same merge loop")
    val enc = Bpe.encode(docs, "doc_id", "text", model)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      "encoding must stay partition-local")
    val byId = enc.collect().map(r => r.getLong(0) ->
      (r.getSeq[String](1), r.getInt(2))).toMap
    assert(byId(2L)._1.take(2) === Seq("n", "e"))  // newest → n e w est</w>
    assert(byId(2L)._2 === 6 * 4)
    assert(byId(1L)._1.count(_ == "low") === 7) // every low/lower starts "low"
    // token counts are consistent with the arrays
    assert(enc.filter(size(col("bpe_tokens")) =!= col("n_bpe_tokens")).count() === 0)
  }
}

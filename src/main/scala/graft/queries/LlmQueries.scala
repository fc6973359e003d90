package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llmdata._

/** Training-data pipeline operators (BASELINE.json north star): text
  * analysis, the dedup family, and embedding similarity search — each
  * as a Spark-first plan with a DuckDB oracle. Hash/fold arithmetic is
  * the deterministic polynomial from [[TextFunctions]] so both engines
  * agree bit-for-bit.
  */
object LlmQueries extends QueryDsl {

  /** r17: documents scan with the under-split repair applied (guide
    * §2.5 — single-row-group inputs scan as one task, starving the
    * CPU-heavy text kernels; identity at production split counts).
    * Deliberately NOT used by the exchange-free-pinned projections
    * (t04/t17/t22/t24/t25/t26, dd01, t13, t15): their kernels are
    * cheap and the zero-shuffle pins ARE the 100 TB design. */
  private def pdocs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkUtil.parallelScan(Tables.documents(s, d), col("doc_id"))


  // ---- shared DuckDB expression builders ----

  /** Polynomial string hash (left fold, mod 1e9+7) in DuckDB. */
  private def duckHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % 1000000007)"

  /** Sequential-fold dot product in DuckDB (matches Spark aggregate). */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), k -> $a[k] * $b[k])), " +
      s"(x, y) -> x + y)"

  private val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")

  /** Build-once-per-process memo for the persisted IVF-PQ index
    * (keyed by sf dir): the first e07/e08 invocation encodes the
    * corpus into a cell-partitioned AnnIndex table; every later
    * invocation — including bench iterations 2..n, which is the point
    * — measures RETRIEVAL against the stored codes, the way the index
    * is actually operated (VERDICT r5 Next #1). nanoTime-suffixed name
    * for the same reason as dd12's: warehouse dirs can outlive the
    * in-memory catalog across driver processes. */
  private val annIndexMemo =
    new scala.collection.concurrent.TrieMap[(String, Boolean), String]()

  /** t27's per-sf seed: a CLOSED LogTableStore root already holding
    * the batch-0 corpus fold. See the t27 entry for the contract. */
  private val corpusSeedMemo =
    new scala.collection.concurrent.TrieMap[String, String]()

  /** e09's branch-construction pool: five independent retrieval
    * branches overlap their eager probed-cell collects (guide §2.6).
    * Fixed at the branch count, daemon threads, JVM-shared — see the
    * e09 body for the no-session-global-mutation invariant. */
  private lazy val e09BranchPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(5,
        (r: Runnable) => {
          val t = new Thread(r, "graft-e09-branch")
          t.setDaemon(true)
          t
        }))

  /** Hardlink clone of a store root into a fresh temp dir:
    * directories recreated, every regular file `Files.createLink`'d —
    * O(files) metadata, zero data bytes moved (the r12 copyTree byte-
    * copied the whole root per bench iteration, ~0.9 s of pure
    * measurement overhead). Valid twice over: manifests keep
    * table-root-RELATIVE paths, so a cloned root is a working store;
    * and LogTableStore never mutates file CONTENT in place — commits
    * and segments are new inodes linked/moved into position, and the
    * one REPLACE_EXISTING move (the Bloom sidecar) swaps the
    * directory ENTRY, leaving the shared inode untouched — so a fold
    * into the clone can never write through to the seed
    * (IncrementalCorpusSpec's hardlink-clone test pins the seed
    * byte-identical across clone+fold).
    * Per-file copy fallback for filesystems that refuse links. */
  private[graft] def linkTree(src: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val from = Paths.get(src)
    val to = Files.createTempDirectory("graft-corpgate")
    val walk = Files.walk(from)
    try walk.forEach { p =>
      val dst = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) { Files.createDirectories(dst); () }
      else
        try { Files.createLink(dst, p); () }
        catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING); ()
        }
    } finally walk.close()
    to.toString
  }

  /** Best-effort recursive delete of a scratch root ([[linkTree]]'s
    * counterpart; deleting a link only drops the clone's directory
    * entry — the seed keeps its own). Best-effort on purpose: the root is a temp dir, so
    * a leaked file costs disk, never correctness — which is why the
    * catch is NonFatal, not just IOException: `Files.walk`'s stream
    * surfaces traversal faults as UncheckedIOException (a
    * RuntimeException), and this helper runs in finally blocks where
    * an escaping cleanup error would discard a computed result or
    * mask the real exception. */
  private def deleteTree(root: String): Unit = {
    import java.nio.file.{Files, Paths}
    try {
      val walk = Files.walk(Paths.get(root))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
  private def annIvfPqIndex(s: org.apache.spark.sql.SparkSession,
                            d: String, residual: Boolean = true): String =
    annIndexMemo.getOrElseUpdate((d, residual), {
      val t = s"graft_ann_ivfpq_${System.nanoTime()}"
      // nlist=32 (~sqrt-corpus cells): the r8 RecallSweep measured the
      // recall knee — finer cells double rerank recall at FIXED probed
      // fraction (depth-12 rerank@3: 0.48 at 16 cells → 0.73 at 32;
      // ADC-only recall is quantizer-bound at ~0.15-0.17 regardless of
      // nprobe, so cells/depth are the knobs that matter, not probes)
      AnnIndex.build(s, t, Tables.embeddings(s, d), "vec_id", "embedding",
        nlist = 32, m = 4, kCodes = 16, residual = residual)
      t
    })

  /** Trained-quantizer sibling of [[annIvfPqIndex]] (r8 verdict Next
    * #3): Lloyd's-trained coarse centroids AND per-subspace
    * Lloyd's-trained PQ codebooks over the IVF residuals (Jégou et
    * al. 2011 §III train the subquantizers on the data's shape;
    * training runs on the bounded deterministic sample, then the
    * quantizer is FROZEN into the persisted index — serve never
    * retrains). Same cell-partitioned serve path as e07; only the
    * quantizer state differs. */
  private def annIvfPqTrainedIndex(s: org.apache.spark.sql.SparkSession,
                                   d: String): String =
    annIndexMemo.getOrElseUpdate((d + "#pqtrained", true), {
      val t = s"graft_ann_ivfpq_trained_${System.nanoTime()}"
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(
        emb, "vec_id", "embedding", nlist = 32, iters = 2)
      val books = Similarity.trainPqCodebooks(
        Similarity.ivfResiduals(emb, "vec_id", "embedding", cents),
        "vec_id", "rv", m = 4, k = 16, iters = 2)
      AnnIndex.build(s, t, emb, "vec_id", "embedding", nlist = 32, m = 4,
        kCodes = 16, residual = true, centroids = Some(cents),
        codebooks = Some(books))
      t
    })

  /** Shared IVF-PQ ADC pipeline CTEs (through the `adc` per-candidate
    * distance rollup) — e07 ranks it directly, e08 widens to 4k
    * candidates and exact-re-ranks them. One source of truth so the
    * two oracles cannot drift. */
  private def ivfPqAdcCtes: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM v),
       |icent AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell, e AS centv, nrm AS centn
       |  FROM n WHERE vec_id < 32),
       |assigned AS (
       |  SELECT neighbor_id, cell FROM (
       |    SELECT c.vec_id AS neighbor_id, t.cell,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ROUND(${duckDot("c.e", "t.centv")} / (c.nrm * t.centn), 6) DESC,
       |                 t.cell) AS rn
       |    FROM n c CROSS JOIN icent t)
       |  WHERE rn = 1),
       |resid AS (
       |  SELECT a.neighbor_id AS vec_id,
       |    list_transform(range(1, len(c.e) + 1),
       |      i -> CAST(CAST(c.e[i] - t.centv[i] AS REAL) AS DOUBLE)) AS rv
       |  FROM assigned a
       |  JOIN n c ON c.vec_id = a.neighbor_id
       |  JOIN icent t ON t.cell = a.cell),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, t.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(${duckDot("q.e", "t.centv")} / (q.nrm * t.centn), 6) DESC,
       |                 t.cell) AS rn
       |    FROM n q CROSS JOIN icent t WHERE q.vec_id < 20)
       |  WHERE rn <= 4),
       |seeds AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j, rv
       |  FROM resid WHERE ${duckDot("rv", "rv")} > 0
       |  ORDER BY vec_id LIMIT 16),
       |cent AS (
       |  SELECT CAST(m AS INTEGER) AS m, j,
       |    list_slice(rv, CAST(m AS INTEGER)*16 + 1, CAST(m AS INTEGER)*16 + 16) AS cvec
       |  FROM seeds, UNNEST(range(0, 4)) AS t(m)),
       |centn AS (
       |  SELECT m, j, cvec, ${duckDot("cvec", "cvec")} AS cc FROM cent),
       |subs AS (
       |  SELECT vec_id, CAST(m AS INTEGER) AS m,
       |    list_slice(rv, CAST(m AS INTEGER)*16 + 1, CAST(m AS INTEGER)*16 + 16) AS sub
       |  FROM resid, UNNEST(range(0, 4)) AS t(m)),
       |subn AS (
       |  SELECT vec_id, m, sub, ${duckDot("sub", "sub")} AS xx FROM subs),
       |dists AS (
       |  SELECT s.vec_id, s.m, c.j,
       |    ROUND(s.xx - 2 * ${duckDot("s.sub", "c.cvec")} + c.cc, 6) AS d,
       |    ROUND(c.cc - 2 * ${duckDot("s.sub", "c.cvec")}, 6) AS dsel
       |  FROM subn s JOIN centn c ON s.m = c.m),
       |codes AS (
       |  SELECT vec_id AS neighbor_id, m, j AS code FROM (
       |    SELECT vec_id, m, j,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dsel, j) AS rn
       |    FROM dists) WHERE rn = 1),
       |qres AS (
       |  SELECT p.query_id, p.cell,
       |    list_transform(range(1, len(q.e) + 1),
       |      i -> CAST(CAST(q.e[i] - t.centv[i] AS REAL) AS DOUBLE)) AS qr
       |  FROM probes p
       |  JOIN n q ON q.vec_id = p.query_id
       |  JOIN icent t ON t.cell = p.cell),
       |qsubs AS (
       |  SELECT query_id, cell, CAST(m AS INTEGER) AS m,
       |    list_slice(qr, CAST(m AS INTEGER)*16 + 1, CAST(m AS INTEGER)*16 + 16) AS sub
       |  FROM qres, UNNEST(range(0, 4)) AS t(m)),
       |qsubn AS (
       |  SELECT query_id, cell, m, sub, ${duckDot("sub", "sub")} AS xx FROM qsubs),
       |qdists AS (
       |  SELECT s.query_id, s.cell, s.m, c.j,
       |    ROUND(s.xx - 2 * ${duckDot("s.sub", "c.cvec")} + c.cc, 6) AS d
       |  FROM qsubn s JOIN centn c ON s.m = c.m),
       |cand AS (
       |  SELECT p.query_id, p.cell, a.neighbor_id
       |  FROM probes p JOIN assigned a ON p.cell = a.cell
       |  WHERE p.query_id <> a.neighbor_id),
       |adc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(SUM(CAST(d.d AS DECIMAL(20,6))) AS DOUBLE) AS adist
       |  FROM cand c
       |  JOIN codes co ON co.neighbor_id = c.neighbor_id
       |  JOIN qdists d ON d.query_id = c.query_id AND d.cell = c.cell
       |    AND d.m = co.m AND d.j = co.code
       |  GROUP BY c.query_id, c.neighbor_id)""".stripMargin

  val queries: Map[String, Q] = Map(
    // T1: tokenization + quality scoring (length/punct/stopword).
    // r18: every token metric reads ONE fused tokenStats kernel pass
    // (guide §4) — the builtin formulation re-split the text ~12× per
    // row; values bit-identical (TokenStatsSpec).
    "t01_text_stats" -> ((s, d) => {
      val t = col("text")
      val st = TextFunctions.tokenStats(t, withDistinct = true)
      val nt = st.getField("n_tokens")
      pdocs(s, d).select(
        col("doc_id"),
        nt.as("n_tokens"),
        TextFunctions.subwordCountApprox(t).as("n_subwords"),
        round(TextFunctions.stopwordRatioFrom(st), 6).as("stopword_ratio"),
        round(TextFunctions.meanWordLengthFrom(t, st), 6).as("mean_word_len"),
        round(st.getField("n_distinct").cast("double") / nt, 6)
          .as("distinct_token_ratio"),
        round(TextFunctions.symbolRatioFrom(t, st), 6).as("symbol_ratio"),
        TextFunctions.qualityScoreFrom(t, st).as("quality_score"))
    }),

    // T2: language-ID heuristic (marker evidence → label + confidence).
    "t02_langid" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextFunctions.langIdHeuristic(t).as("predicted_lang"),
        TextFunctions.langIdConfidence(t).as("confidence"),
        TextFunctions.langIdArgmax(t).as("argmax_lang"))
    }),

    // T3: document fingerprint (rolling hash).
    "t03_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"))
    }),

    // T4: PII scrubbing — regex masking of emails/IPv4s with per-doc
    // redaction counts. The corpus is synthetic-clean, so a
    // deterministic PII suffix is appended first (both engines build
    // the identical string); the operator under test is the masking.
    // Pure per-row projection: no shuffle, codegen regex.
    "t04_pii_scrub" -> ((s, d) => {
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com ip 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")).as("raw"))
        .select(
          col("doc_id"),
          regexp_count(col("raw"), lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(col("raw"), lit(ipRe)).cast("long").as("n_ips"),
          md5(regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
            ipRe, "<IP>")).as("clean_digest"))
    }),

    // T5: deterministic stratified sampling — per-source rates via an
    // md5-prefix threshold (hex-string compare, engine-portable, no
    // RNG). Sampling is a pure filter fused into one aggregation;
    // repeated runs select the same rows, so downstream joins against
    // a sample are reproducible.
    "t05_stratified_sample" -> ((s, d) => {
      val bucket = substring(md5(col("text")), 1, 2)
      val rate = when(col("source").isin("src0", "src1"), lit("80")) // 50%
        .otherwise(lit("1a")) // ~10%
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("total_docs"),
          countIf(bucket < rate).as("sampled_docs"))
    }),

    // T6: train/val/test split assignment from the same md5-prefix
    // device (80/10/10) — a content-hash split is stable under corpus
    // re-partitioning and dedup, unlike row-number splits.
    "t06_train_split" -> ((s, d) => {
      val bucket = substring(md5(col("text")), 1, 2)
      val splitCol = when(bucket < "cc", "train")
        .when(bucket < "e6", "val").otherwise("test")
      Tables.documents(s, d)
        .groupBy(col("lang"), splitCol.as("split"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // T9: sequence packing — chunk documents into ≤64-token windows,
    // then pack chunks into 256-token training sequences with a
    // deterministic running total (bin = exclusive-cumsum div seq_len;
    // the cheap oracle-able stand-in for greedy bin packing). The
    // cumsum window is bounded: it partitions by (source, pack_group)
    // where pack_group = floor(doc_id / 100) — a contiguous doc-id
    // range — so a corpus with one dominant source can NEVER serialize
    // a single window task; each partition holds ≤100 documents' worth
    // of chunks regardless of corpus size. Bins reset per pack group
    // (documented semantics: packing is range-local, which real
    // pipelines want anyway — a training shard is written per group).
    // One shuffle: the bounded ordering window.
    "t09_sequence_packing" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val chunkLen = 64
      val seqLen = 256
      val groupDocs = 100 // docs per pack group — the window bound
      val chunks = pdocs(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).as("doc_tokens"))
        .filter(col("doc_tokens") > 0)
        .select(col("doc_id"), col("source"), col("doc_tokens"),
          posexplode(sequence(lit(0),
            floor((col("doc_tokens") - 1) / chunkLen).cast("int"))))
        .toDF("doc_id", "source", "doc_tokens", "chunk_idx", "__dup")
        .withColumn("pack_group",
          floor(col("doc_id") / groupDocs).cast("long"))
        .withColumn("chunk_tokens",
          least(lit(chunkLen), col("doc_tokens") - col("chunk_idx") * chunkLen))
      val w = Window.partitionBy(col("source"), col("pack_group"))
        .orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
      chunks
        .withColumn("bin",
          floor(coalesce(sum(col("chunk_tokens")).over(w), lit(0L)) / seqLen)
            .cast("long"))
        .groupBy(col("source"), col("pack_group"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("chunk_tokens")).cast("long").as("n_tokens"))
    }),

    // T10: TF-IDF top terms per document — keyword extraction for
    // corpus curation. tf = one explode + groupBy(doc, term); document
    // frequency = a second aggregation of the SAME doc-term frame (no
    // corpus rescan); idf joins back on term SALTED (the vocabulary is
    // far smaller than the corpus but not broadcastable at scale, and
    // term frequency is Zipfian — the same hot-key exposure as t08's
    // token join, spread over 8 (term, salt) buckets keyed by doc_id);
    // the corpus-size scalar is a broadcast one-row frame.
    // Top-3 via rank-filter → WindowGroupLimit bounded heap. idf is
    // rounded to 9 dp in both engines before the product so libm
    // last-ulp differences cannot move the 6-dp result or the ranking.
    "t10_tfidf_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = pdocs(s, d)
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term"))
        .agg(count(lit(1)).cast("double").as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)
      graft.operators.Salted
        .saltedJoin(tf, dfreq, "term", salts = 8,
          bigSaltSource = col("doc_id"))
        .crossJoin(broadcast(n))
        .withColumn("idf", round(log(col("n_docs") / col("df")), 9))
        .withColumn("tfidf",
          round(col("tf").cast("double") * col("idf"), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("tfidf"),
          col("rank"))
    }),

    // T8: unigram-LM quality scoring — train token frequencies over
    // the corpus in one aggregation, then score each document by mean
    // negative log-likelihood (the classic LM-based quality filter).
    // Two shuffles total: the frequency groupBy and the token join.
    // The token join is SALTED (Salted.saltedJoin, salts=8): natural
    // language is Zipfian, so the hottest token ("the") owns a double-
    // digit share of all occurrence rows — an unsalted shuffle join
    // melts one reducer at scale. Salting spreads each token over 8
    // (tok, salt) buckets keyed by doc_id and replicates the (small,
    // aggregated) vocabulary side 8×; result-identical (SaltedSpec).
    // Per-token NLL terms are rounded then decimal-summed so the
    // cross-engine reduction order cannot change the result.
    "t08_unigram_lm" -> ((s, d) => {
      val docs = pdocs(s, d)
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val tot = freq.agg(sum(col("tf")).cast("double").as("n_total"))
      graft.operators.Salted
        .saltedJoin(toks, freq, "tok", salts = 8,
          bigSaltSource = col("doc_id"))
        .crossJoin(broadcast(tot))
        .withColumn("nll",
          round(-log(col("tf").cast("double") / col("n_total")), 9)
            .cast("decimal(30,9)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round((sum(col("nll")).cast("double") / count(lit(1))), 6)
            .as("mean_nll"))
    }),

    // T20: bigram-LM quality scoring — t08's unigram NLL upgraded to
    // conditional bigram probabilities (mean −log c(prev,cur)/c(prev)
    // over each document's bigram occurrences, MLE — every scored
    // bigram exists in the counts by construction, so no smoothing
    // seam is needed for the gate). Shuffles: the two count groupBys
    // and the salted count joins (bigram frequency is Zipfian like
    // t08's tokens). NLL terms are rounded then decimal-summed so
    // reduction order cannot move the result.
    "t20_bigram_lm" -> ((s, d) => {
      val docs = pdocs(s, d)
      // bigrams as space-joined STRINGS via the fused codegen kernel
      // (tokens are space-split, so the join key cannot alias); the
      // interpreted transform/element_at HOF was the dominant cost,
      // and array<struct> in the lambda was worse still
      val pairs = graft.functions.ShingleExpression.bigramStrings(col("text"))
      // three consumers (c2, c1, the scoring join) — materialize the
      // doc-gram frame once instead of re-splitting every text 3x
      // (the minhashBandPairs pattern; checkpoint blocks free with the
      // frame, a cache entry would leak)
      val grams = graft.SparkUtil.swapCheckpoint("llm.t20.grams", docs
        .select(col("doc_id"), explode(pairs).as("__k"))
        .withColumn("prev", substring_index(col("__k"), " ", 1))
        .localCheckpoint(true))
      val c2 = grams.groupBy(col("__k")).agg(count(lit(1)).as("c2"))
      val c1 = grams.groupBy(col("prev")).agg(count(lit(1)).as("c1"))
      // fold the context counts into the bigram counts FIRST - both
      // are vocabulary-sized, so the doc-scale side pays exactly ONE
      // (salted) join instead of two
      val probs = c2
        .withColumn("prev", substring_index(col("__k"), " ", 1))
        .join(c1, Seq("prev"))
        .select(col("__k"), col("c2"), col("c1"))
      graft.operators.Salted
        .saltedJoin(grams.drop("prev"), probs, "__k", salts = 8,
          bigSaltSource = col("doc_id"))
        .withColumn("nll",
          round(-log(col("c2").cast("double") / col("c1")), 9)
            .cast("decimal(30,9)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round((sum(col("nll")).cast("double") / count(lit(1))), 6)
            .as("mean_nll"))
    }),

    // T7: weighted data mixing as a PURE FILTER — the quota for each
    // source is converted to a content-hash cutoff (the t05 threshold
    // device): quota/n_docs of the hash space, applied as
    // `stringHash(text) < cutoff`. No per-source ranking window ever
    // touches document rows — the only per-doc work is a broadcast
    // join against the tiny per-source cutoff frame and one final
    // aggregation, so a source with 90% of a 100 TB corpus costs the
    // same per-row work as any other. Selection is deterministic
    // (reruns pick identical documents) and hits the quota in
    // expectation (hash-uniform); the r3 exact-rank variant picked
    // exactly quota rows but serialized each source through one
    // window task — the documented swap, now shipped.
    "t07_data_mixing" -> ((s, d) => {
      val docs = pdocs(s, d)
      val w = when(col("source").isin("src0", "src1"), 3.0).otherwise(1.0)
      val srcStats = docs.groupBy(col("source"))
        .agg(count(lit(1)).cast("double").as("n_docs"))
        .withColumn("w", w)
      val tot = srcStats.agg(sum(col("w")).as("tot_w"))
      val cut = srcStats.crossJoin(broadcast(tot))
        .select(col("source"),
          floor((floor(lit(200) * col("w") / col("tot_w")).cast("double")
            / col("n_docs")) * TextFunctions.HashMod)
            .cast("long").as("cutoff"))
      docs
        .withColumn("h", TextFunctions.stringHash(col("text")))
        .join(broadcast(cut), Seq("source"))
        .filter(col("h") < col("cutoff"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("picked_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("picked_tokens"))
    }),

    // T21: cross-document span dedup census (the MassiveText recipe,
    // Rae et al. 2021 §A1.2): every distinct 8-token window of every
    // document is hashed by the fused shingle kernel (tokenize →
    // window → hash → distinct in one codegen loop — never n separate
    // HOF passes); a window appearing in ≥2 documents is "duplicated",
    // and each document reports its duplicated-window fraction plus
    // the keep verdict at the 30% threshold. Differs from t12: t12
    // removes non-overlapping C4 chunks, this flags documents by
    // OVERLAPPING stride-1 span overlap — the boilerplate/mirror-site
    // detector. Scale shape: the span frame is O(total tokens) rows of
    // (8-byte hash, doc_id) — the algorithm's irreducible cost; the
    // window count and the per-doc rollup reuse ONE hash-partitioned
    // shuffle (count-over-h window), text never shuffles, and there is
    // no all-pairs comparison anywhere.
    "t21_span_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = pdocs(s, d)
      val spans = docs.select(col("doc_id"), explode(
        graft.functions.ShingleExpression.ngramShingleHashes(col("text"), 8))
        .as("h"))
      // spans are DISTINCT per doc, so the per-hash row count IS the
      // number of documents containing the window
      val w = Window.partitionBy(col("h"))
      val perDoc = spans
        .withColumn("nd", count(lit(1)).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          countIf(col("nd") >= 2).as("dup_spans"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_spans"), lit(0L)).as("dup_spans"))
        .withColumn("dup_frac", when(col("n_spans") > 0,
          round(col("dup_spans").cast("double") / col("n_spans"), 6))
          .otherwise(lit(0.0)))
        .withColumn("keep", col("dup_frac") <= 0.3)
    }),

    // T22: the Gopher document-level rule set (Rae et al. 2021 §A1.1)
    // beyond t19's repetition rules: word-count bounds, mean-word-length
    // bounds, minimum distinct-stopword evidence, and a symbol-ratio
    // cap, each surfaced as its own boolean plus the conjunctive keep.
    // Scale shape: a pure projection over one scan — every rule is a
    // codegen'd expression on the token array, there is no shuffle, no
    // join, no window, and the filter composes with any downstream
    // predicate pushdown. At 100 TB this is the cheapest possible
    // operator class (map-only, one pass).
    // r18: n_words / mean_word_len / stopword_hits all read ONE fused
    // tokenStats pass (guide §4): stop_distinct ==
    // size(array_intersect(array_distinct(toks), stopArr)) by
    // construction (pinned in TokenStatsSpec).
    "t22_gopher_rules" -> ((s, d) => {
      val t = col("text")
      val st = TextFunctions.tokenStats(t)
      Tables.documents(s, d)
        .select(col("doc_id"),
          st.getField("n_tokens").as("n_words"),
          round(TextFunctions.meanWordLengthFrom(t, st), 6)
            .as("mean_word_len"),
          st.getField("stop_distinct").as("stopword_hits"),
          round(TextFunctions.symbolRatioFrom(t, st), 6).as("symbol_ratio"))
        .withColumn("ok_word_count",
          col("n_words") >= 50 && col("n_words") <= 100000)
        .withColumn("ok_mean_len",
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
        .withColumn("ok_stopwords", col("stopword_hits") >= 2)
        .withColumn("ok_symbols", col("symbol_ratio") <= 0.1)
        .withColumn("keep", col("ok_word_count") && col("ok_mean_len") &&
          col("ok_stopwords") && col("ok_symbols"))
    }),

    // T25: the COMPLETE Gopher repetition battery (Rae et al. 2021
    // §A1.1, Table A1): top-{2,3,4}-gram character fractions and
    // duplicated-{5..10}-gram character coverage — nine signals from
    // ONE fused codegen pass per document (see RepetitionExpression
    // for the exact definitions the DuckDB oracle mirrors
    // relationally). t19 keeps the cheap two-signal variant; this is
    // the battery a Gopher-style filter actually thresholds on. Pure
    // projection: zero shuffle, composes with pushdown — the oracle's
    // exploded twin pays 9× row expansion and two shuffles per n.
    "t25_gopher_repetition" -> ((s, d) => {
      import graft.functions.RepetitionExpression.{Names, Thresholds}
      val prof = graft.functions.RepetitionExpression
        .repetitionProfile(coalesce(col("text"), lit("")))
      Tables.documents(s, d)
        .select(col("doc_id") +: Names.zipWithIndex.map { case (nm, i) =>
          round(element_at(prof, i + 1), 6).as(nm)
        }: _*)
        .withColumn("keep", Names.zip(Thresholds)
          .map { case (nm, t) => col(nm) <= t }.reduce(_ && _))
    }),

    // T19: repetition-based quality filter (the Gopher rules family,
    // Rae et al. 2021 §A1.1): documents dominated by repeated content
    // are boilerplate/spam and get filtered before training. Two
    // signals: duplicate-token fraction (1 − distinct/total — a pure
    // per-row projection, zero shuffle) and top-bigram fraction (share
    // of all bigram occurrences owned by the most frequent bigram —
    // explode → count(doc, gram) → max/sum per doc: two shuffles, both
    // doc-keyed and map-side combinable, never an O(n²) per-row scan,
    // so a 10k-token document costs O(n) not O(n²)). Gopher's 0.18
    // top-2-gram threshold flags; the fractions ship so callers tune.
    "t19_repetition_filter" -> ((s, d) => {
      val docs = pdocs(s, d)
      // r18: token count + distinct count from one fused kernel pass
      val st = TextFunctions.tokenStats(col("text"), withDistinct = true)
      val bigrams =
        graft.functions.ShingleExpression.bigramStrings(col("text"))
      val base = docs.select(col("doc_id"),
        st.getField("n_tokens").as("n_tokens"),
        st.getField("n_distinct").as("n_distinct"))
      val gramTop = docs
        .select(col("doc_id"), explode(bigrams).as("gram"))
        .groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_gram"),
          sum(col("c")).as("total_grams"))
      base.join(gramTop, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          round(lit(1.0) - col("n_distinct").cast("double") /
            col("n_tokens"), 6).as("dup_token_frac"),
          coalesce(round(col("top_gram").cast("double") /
            col("total_grams"), 6), lit(0.0)).as("top_bigram_frac"),
          coalesce(round(col("top_gram").cast("double") /
            col("total_grams"), 6) > 0.18, lit(false))
            .as("repetitive"))
    }),

    // DD7: benchmark-contamination check — corpus documents sharing a
    // distinct word-5-gram with any benchmark document (here: the
    // deterministic doc_id % 10 == 0 slice). The join key is the
    // 5-gram hash; the benchmark side is ~1% of the corpus, so at
    // scale it broadcast-joins and the corpus side never shuffles.
    "dd07_contamination" -> ((s, d) => {
      // fused codegen kernel (tokenize → 5-gram → hash → distinct in
      // one JVM loop) — the interpreted transform/concat_ws chain was
      // the whole query's cost; each side filters BEFORE shingling so
      // every document is shingled exactly once across the branches
      def gramsOf(docs: org.apache.spark.sql.DataFrame) =
        docs.select(col("doc_id"), explode(
          graft.functions.ShingleExpression.ngramShingleHashes(col("text"), 5))
          .as("gh"))
      val all = pdocs(s, d)
      val bench = gramsOf(all.filter(col("doc_id") % 10 === 0))
        .toDF("bench_id", "gh")
      val corpus = gramsOf(all.filter(col("doc_id") % 10 =!= 0))
      corpus.join(broadcast(bench), Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_benchmark_docs"),
          countDistinct(col("gh")).as("n_shared_grams"))
    }),

    // DD14: contamination FRACTION (the GPT-3 appendix-C refinement of
    // dd07's boolean): for each (corpus doc, benchmark doc) pair that
    // shares at least one distinct word-5-gram, report shared-gram
    // count over the benchmark doc's total distinct grams, with the
    // contaminated verdict at the 50% threshold. Scale shape: the
    // benchmark suite is tiny vs the corpus, so its gram frame AND its
    // per-doc totals broadcast; the only shuffle is the (doc, bench)
    // rollup of actual gram collisions — never corpus-wide. The pair
    // set is bounded by real collisions; production decontamination
    // filters on overlap_frac downstream.
    "dd14_contamination_frac" -> ((s, d) => {
      def gramsOf(docs: org.apache.spark.sql.DataFrame) =
        docs.select(col("doc_id"), explode(
          graft.functions.ShingleExpression.ngramShingleHashes(col("text"), 5))
          .as("gh"))
      val all = pdocs(s, d)
      val bench = gramsOf(all.filter(col("doc_id") % 10 === 0))
        .toDF("bench_id", "gh")
      // gram hashes are distinct per doc, so count(*) is the distinct
      // gram count on both the totals and the shared rollup
      val benchTotals = bench.groupBy(col("bench_id"))
        .agg(count(lit(1)).as("bench_grams"))
      val corpus = gramsOf(all.filter(col("doc_id") % 10 =!= 0))
      corpus.join(broadcast(bench), Seq("gh"))
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(benchTotals), Seq("bench_id"))
        .withColumn("overlap_frac", round(
          col("n_shared").cast("double") / col("bench_grams"), 6))
        .withColumn("contaminated", col("overlap_frac") >= 0.5)
        .select(col("doc_id"), col("bench_id"), col("n_shared"),
          col("bench_grams"), col("overlap_frac"), col("contaminated"))
    }),

    // DD1: exact dedup — content-digest groupBy, keep min doc_id.
    "dd01_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keeper_doc_id"),
          count(lit(1)).as("dup_count"))
    }),

    // DD2: exact n-gram Jaccard, LSH-band prefiltered (candidates from
    // MinHash band collisions within a language, never from exact-
    // length blocks that go quadratic on skewed corpora).
    "dd02_ngram_jaccard" -> ((s, d) =>
      DedupFunctions.ngramJaccardLsh(Tables.documents(s, d))),

    // DD3: MinHash + LSH banding — candidates from a bucket equi-join,
    // never an all-pairs comparison.
    "dd03_minhash_lsh" -> ((s, d) =>
      DedupFunctions.minhashBandPairs(Tables.documents(s, d))),

    // DD8: duplicate CLUSTERS — the step after pair generation: the
    // transitive closure of the near-dup pairs (est_jaccard ≥ 0.5),
    // every member labeled with its cluster (= min doc_id) and the
    // cluster size, so a pipeline can keep exactly one representative
    // per cluster. Alternating large-star/small-star CC: O(log n)
    // bounded-shuffle rounds, safe for any cluster diameter.
    "dd08_dup_clusters" -> ((s, d) => {
      val pairs = DedupFunctions.minhashBandPairs(Tables.documents(s, d))
        .filter(col("matching") >= 4)
      val cc = graft.operators.ConnectedComponents.label(
        pairs, "doc_a", "doc_b")
      cc.select(col("id").as("doc_id"), col("component").as("cluster_id"),
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))).as("cluster_size"))
    }),

    // DD4: SimHash signature + coarse bucket (the blocking key a
    // hamming-join would use).
    "dd04_simhash" -> ((s, d) => {
      pdocs(s, d).select(
        col("doc_id"), col("lang"),
        DedupFunctions.simhash16(
          DedupFunctions.tokenHashes(col("text"))).as("simhash"))
        .withColumn("bucket", shiftright(col("simhash"), 8))
    }),

    // DD10: SimHash near-dup PAIRS via pigeonhole banding — the step
    // dd04 stops short of: split the 16-bit fingerprint into 2 bands
    // of 8 bits; any pair within hamming distance 1 MUST agree on at
    // least one whole band (pigeonhole), so candidates come from an
    // equi-join on (lang, band, band_value) — never an all-pairs scan
    // — and the exact bit_count(xor) filter runs only on collisions.
    // The classic web-dedup layout (Manku et al., WWW'07: 64-bit
    // fingerprints, 4 bands of 16, hamming ≤ 3 — same plan, wider
    // bands). Band width is THE selectivity lever: bands must be wide
    // enough that the value space dwarfs the corpus, or buckets go
    // quadratic — 4-bit bands (16 values) were measured 8× slower
    // than 8-bit here.
    "dd10_simhash_pairs" -> ((s, d) => {
      val sigs = pdocs(s, d).select(
        col("doc_id"), col("lang"),
        DedupFunctions.simhash16(
          DedupFunctions.tokenHashes(col("text"))).as("simhash"))
      val banded = sigs.select(col("doc_id"), col("lang"), col("simhash"),
          posexplode(array((0 until 2).map(b0 =>
            shiftright(col("simhash"), b0 * 8).bitwiseAND(255)): _*)))
        .toDF("doc_id", "lang", "simhash", "band", "bv")
      val a = banded.toDF("id_a", "lang", "sim_a", "band", "bv")
      val b = banded.toDF("id_b", "lang", "sim_b", "band", "bv")
      a.join(b, Seq("lang", "band", "bv"))
        .filter(col("id_a") < col("id_b"))
        // first-matching-band emission instead of a distinct: band 1
        // emits a pair only if band 0 DIFFERS, so every pair surfaces
        // exactly once and the candidate set never re-shuffles
        .filter(col("band") === 0 ||
          col("sim_a").bitwiseAND(255) =!= col("sim_b").bitwiseAND(255))
        .select(col("lang"), col("id_a"), col("id_b"),
          col("sim_a"), col("sim_b"))
        .withColumn("hamming",
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
        .filter(col("hamming") <= 1)
    }),

    // DD11: the PRODUCTION SimHash pair-join — 64-bit fingerprints,
    // 4 bands of 16 bits, hamming ≤ 3 (Manku et al., WWW'07), beside
    // dd10's 16-bit teaching version. Same plan, wider bands: any pair
    // within hamming 3 of a 4-band split must agree on ≥1 whole band
    // (pigeonhole), candidates come from the (lang, band, value)
    // equi-join, first-matching-band emission keeps each pair
    // exactly-once with no distinct re-shuffle, and the exact hamming
    // runs only on collisions. 16-bit bands give a 65536-value space —
    // ≫ any per-language partition's row count at this SF, and the
    // band count (not width) is what a 100 TB corpus would re-tune.
    "dd11_simhash64_pairs" -> ((s, d) => {
      val sigs = pdocs(s, d).select(
        col("doc_id"), col("lang"),
        DedupFunctions.simhash64Bands(
          DedupFunctions.tokenHashes(col("text"))).as("bands"))
      val banded = sigs.select(col("doc_id"), col("lang"), col("bands"),
          posexplode(col("bands")))
        .toDF("doc_id", "lang", "bands", "band", "bv")
      val a = banded.toDF("id_a", "lang", "ba", "band", "bv")
      val b = banded.toDF("id_b", "lang", "bb", "band", "bv")
      def differUpTo(n: Int): org.apache.spark.sql.Column =
        (0 until n).map(i =>
          element_at(col("ba"), i + 1) =!= element_at(col("bb"), i + 1))
          .reduce(_ && _)
      a.join(b, Seq("lang", "band", "bv"))
        .filter(col("id_a") < col("id_b"))
        // first-matching-band: band j emits only if bands 0..j-1 differ
        .filter(when(col("band") === 0, lit(true))
          .when(col("band") === 1, differUpTo(1))
          .when(col("band") === 2, differUpTo(2))
          .otherwise(differUpTo(3)))
        .withColumn("hamming",
          (0 until 4).map(i => bit_count(element_at(col("ba"), i + 1)
            .bitwiseXOR(element_at(col("bb"), i + 1)))).reduce(_ + _))
        .filter(col("hamming") <= 3)
        .select(col("lang"), col("id_a"), col("id_b"), col("hamming"))
    }),

    // DD12: INCREMENTAL LSH indexing — the production form of dd03:
    // the corpus arrives in batches, each batch is signed once, probed
    // against the persistent bucketed (band, key) index of everything
    // before it, and appended — O(batch + collisions) per run, the
    // index never re-signed or shuffled. The gate feeds the documents
    // table through in two parity batches and must surface EXACTLY the
    // pair set the one-shot band join yields (the oracle below is that
    // one-shot set) — the equivalence that makes incremental dedup
    // trustworthy.
    "dd12_incremental_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val t = s"graft_lsh_gate_${System.nanoTime()}"
      val p1 = graft.llmdata.IncrementalLsh.indexBatch(
        s, t, docs.filter(col("doc_id") % 2 === 0))
      val p2 = graft.llmdata.IncrementalLsh.indexBatch(
        s, t, docs.filter(col("doc_id") % 2 =!= 0))
      // per-run scratch index: drop its JVM-global cache entries (the
      // pair frames are already materialized, so nothing downstream
      // needs the caches — the store gates' close() pattern)
      graft.llmdata.IncrementalLsh.dropCaches(t)
      // a pair surfaces in exactly one batch (both-even/both-odd →
      // within its batch; mixed → batch 2's history probe); distinct
      // guards the contract anyway
      p1.union(p2).distinct().toDF("doc_a", "doc_b")
    }),

    // DD15: INCREMENTAL connected components — dd08's closure as a
    // pipeline maintains it: the (id → root) assignment persists in
    // the transactional store and each batch of new near-dup pairs
    // folds in by contracting edges to their endpoints' CURRENT roots
    // and closing over that root graph (O(batch) nodes however big
    // the state), then key-merging only the rows whose root changed.
    // The gate feeds the thresholded pair set in two hash-split
    // batches — cross-batch merges land on batch 2 — and must surface
    // EXACTLY the one-shot closure (dd08's recursive-CTE oracle,
    // shared verbatim).
    "dd15_incremental_cc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = DedupFunctions.minhashBandPairs(Tables.documents(s, d))
        .filter(col("matching") >= 4)
        .localCheckpoint(true)
      try {
        val store = new graft.store.LogTableStore(s,
          java.nio.file.Files.createTempDirectory("graft-ccgate").toString)
        graft.operators.IncrementalCc.ensure(store, "gate.cc")
        val h = pmod(hash(col("doc_a"), col("doc_b")), lit(2))
        graft.operators.IncrementalCc.update(store, "gate.cc",
          pairs.filter(h === 0), "doc_a", "doc_b")
        graft.operators.IncrementalCc.update(store, "gate.cc",
          pairs.filter(h === 1), "doc_a", "doc_b")
        val out = graft.operators.IncrementalCc.assignments(store, "gate.cc")
          .select(col("id").as("doc_id"), col("component").as("cluster_id"))
          .withColumn("cluster_size",
            count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        store.close() // scratch root: drop its JVM-global cache entries
        out
      } finally graft.SparkUtil.releaseCheckpoint(pairs)
    }),

    // E1: brute-force cosine top-k (correctness baseline for ANN).
    "e01_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5)
    }),

    // E2: LSH-bucketed ANN (sign-random-projection), OR-amplified over
    // 2 independent hash tables — a pair is a candidate if it collides
    // in EITHER table, the standard repair for single-table recall
    // cliffs. Still bucket equi-joins only; the scale path.
    "e02_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 3,
        planes = 8, tables = 2)
    }),

    // DD6: group-level MinHash union — the signature of a union of
    // sets is the elementwise min of signatures (typed Aggregator with
    // map-side partial aggregation; k longs of state per group).
    "dd06_minhash_union" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val docs = pdocs(s, d)
      val sigs = docs.select(col("doc_id"), col("lang"),
          graft.functions.ShingleExpression.bigramShingleHashes(col("text"))
            .as("th"))
        .filter(size(col("th")) > 0)
        .select(col("lang"),
          DedupFunctions.minhashSignature(col("th"), 8).as("sig"))
      val mhu = udaf(new graft.operators.MinHashUnion(8))
      sigs.groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"), mhu(col("sig")).as("sig"))
        // canonical string form: array-valued outputs don't survive the
        // driver's sort-rows-then-hash compare
        .select(col("lang"), col("docs"),
          concat_ws("_", col("sig")).as("lang_sig"))
    }),

    // DD5: embedding-cosine near-dup — candidate pairs from LSH
    // buckets, keep-lowest-id dedup decision above a similarity
    // threshold (0.35 is demonstrative: the synthetic corpus tops out
    // at cos≈0.51; a real near-dup corpus uses ≈0.95).
    "dd05_embedding_neardup" -> ((s, d) => {
      import graft.functions.VectorExpressions.{dotF, lshBucketF}
      val v = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("n", sqrt(dotF(col("v"), col("v"))))
        .withColumn("bucket", lshBucketF(col("v"), 8))
      val a = v.toDF("keep_id", "va", "na", "bucket")
      val b = v.toDF("dup_id", "vb", "nb", "bucket")
      a.join(b, Seq("bucket"))
        .filter(col("keep_id") < col("dup_id"))
        .withColumn("cos",
          round(dotF(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .filter(col("cos") >= 0.35)
        .select(col("keep_id"), col("dup_id"), col("cos"))
    }),

    // E3: IVF-flat ANN — deterministic coarse quantizer (first nlist
    // vectors as centroids), corpus assigned to nearest cell, queries
    // probe nprobe cells. The scale path when buckets must follow the
    // data distribution rather than random projections.
    "e03_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 2)
    }),

    // E4: IVF with Lloyd's-trained centroids (rows-only gate: k-means
    // has no tractable SQL twin; recall vs e01 is asserted in
    // LlmDataSpec). Same shuffle-free assignment as e03.
    "e04_ann_ivf_trained" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(
        emb, "vec_id", "embedding", nlist = 16, iters = 2)
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 2, centroids = Some(cents))
    }),

    // E6: product-quantization ANN (the compression half of IVF-PQ,
    // Jégou et al. 2011) — corpus vectors become m=4 small codes
    // (row-local projection, no shuffle); queries score candidates by
    // asymmetric distance: m table lookups per vector instead of a
    // d-dim dot product, so the 100 TB scan reads codes, not vectors.
    // Codebooks here are the deterministic first-k seeding (the e03
    // device) so the whole pipeline is oracle-checkable; swap in
    // per-subspace Lloyd's for data-shaped codebooks.
    "e06_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 3, m = 4, kCodes = 16)
    }),

    // E7: IVF-PQ (IVFADC) — e03's coarse cells bound WHICH codes each
    // query reads (nprobe/nlist of the corpus), e06's PQ codes bound
    // what scoring costs (m table lookups, vectors never read after
    // the one encode scan), and the codes quantize the RESIDUAL
    // v − centroid(cell) (Jégou et al. 2011 §IV — lower variance, so
    // the same code budget resolves finer distances). The production
    // ANN layout at 100 TB — served from the BUILD-ONCE persisted
    // index (AnnIndex): the first invocation per corpus builds the
    // cell-partitioned codes table; queries read only probed cells'
    // files (static partition pruning) and never retrain. Results are
    // bit-identical to the inline ivfPqTopK (AnnIndexSpec), so the
    // oracle twin is unchanged.
    "e07_ann_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      AnnIndex.search(s, annIvfPqIndex(s, d),
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nprobe = 4)
    }),

    // E8: two-stage retrieval — the IVF-PQ index retrieves 8k
    // candidates per query (ADC over codes, vectors untouched), then
    // ONLY those candidates' true vectors are read and re-ranked by
    // exact cosine. The production answer path: the index bounds how
    // many full vectors a query ever touches, the exact pass repairs
    // quantization error at the top of the ranking. Retrieval hits
    // the same persisted AnnIndex table as e07. Depth 24 = the r8
    // RecallSweep knee: 12→24 lifts rerank recall@3 0.73→0.88 on this
    // corpus (24→48 buys only +0.05 for 2× the exact re-scores).
    "e08_ann_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 20)
      val cands = AnnIndex.search(s, annIvfPqIndex(s, d),
        queries, "vec_id", "embedding", k = 24, nprobe = 4)
      Similarity.rerankTopK(queries, emb, cands, "vec_id", "embedding", 3)
    }),

    // E10: trained-quantizer IVF-PQ serving (rows-only gate: k-means
    // and per-subspace Lloyd's have no tractable SQL twin; the recall
    // floor — and trained ≥ seeded through the SAME persisted-index
    // path — is pinned in AnnIndexSpec). e07's serve plan exactly:
    // probed-cell partition pruning over the build-once codes table;
    // the only difference is the frozen quantizer was trained on the
    // data instead of seeded from it.
    "e10_ann_pq_trained" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      AnnIndex.search(s, annIvfPqTrainedIndex(s, d),
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nprobe = 4)
    }),

    // E11: the INCREMENTAL index lifecycle as a gate query (the dd12/
    // dd15/s16/t27 pattern, for the vector index): bootstrap-build on
    // batch 0, append batch 1 with the FROZEN quantizer, compact on
    // the maintenance cadence, then serve — every step the streaming
    // EmbeddingIngest runs, exercised end-to-end per invocation.
    // Oracle: e07's IVF-PQ ADC SQL twin VERBATIM. That works because
    // batch 0 is an id-PREFIX of the corpus and every quantizer seed
    // row lives in the prefix (coarse seeds are vec_id < nlist=32,
    // codebook seeds are the first 16 nonzero residuals within the
    // first 48 ids — see deriveIvfPqCodebooks), so the quantizer
    // frozen over batch 0 IS the full-corpus seeded quantizer; with
    // identical frozen params, build+append indexes exactly what the
    // one-shot build indexes (the AnnIndexSpec equivalence), compact
    // is content-preserving by construction, and the served ranking
    // is e07's — incremental ≡ one-shot, checked by DuckDB, not just
    // by a spec. Scale shape: batch-0 encode + O(batch-1) append +
    // one O(index) compact; the search reads only probed cells.
    // The per-invocation table is scratch: the result is materialized
    // (|Q|·k rows), then table, sidecar, and JVM memos are dropped.
    "e11_ann_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cut = emb.agg((max(col("vec_id")) / 2).cast("long"))
        .head().getLong(0)
      val t = s"graft_ann_inc_${System.nanoTime()}"
      try {
        AnnIndex.build(s, t, emb.filter(col("vec_id") <= cut),
          "vec_id", "embedding", nlist = 32, m = 4, kCodes = 16,
          residual = true)
        AnnIndex.append(s, t, emb.filter(col("vec_id") > cut),
          "vec_id", "embedding")
        AnnIndex.compact(s, t)
        graft.SparkUtil.swapCheckpoint("llm.e11.out",
          AnnIndex.search(s, t, emb.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 3, nprobe = 4)
            .localCheckpoint(true))
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $t")
        s.sql(s"DROP TABLE IF EXISTS ${t}_params")
        AnnIndex.dropCaches(s, t)
      }
    }),

    // E9: ANN recall@k as a VISIBLE artifact (rows-only gate: the
    // per-method results are each oracle-pinned exactly — e01, e02,
    // e07, e08 — so this row derives from already-verified outputs;
    // its value is making retrieval QUALITY a driver-surfaced number
    // instead of a spec-internal assertion). recall@k = mean over
    // queries of |method top-k ∩ exact top-k| / k, for the
    // OR-amplified LSH table, IVF-PQ with residual encoding (served
    // from the persisted AnnIndex), the raw-encoding IVF-PQ ablation,
    // and the retrieve-then-rerank production path. Scale shape: each
    // method is its own gate query's plan; the recall join is
    // |Q|·k rows against |Q|·k rows.
    "e09_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 20)
      val k = 3
      val truth = graft.SparkUtil.swapCheckpoint("llm.e09.truth",
        Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", k)
          .select(col("query_id"), col("neighbor_id"))
          // four reuses; exact top-k is the costly part. Registered so
          // the NEXT invocation frees these blocks (VERDICT r17 #4).
          .localCheckpoint(true))
      def recallOf(name: String, got: org.apache.spark.sql.DataFrame) =
        truth.join(
            got.select(col("query_id"), col("neighbor_id"))
              .withColumn("hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0))) /
            count(lit(1))).as("r"))
          .select(lit(name).as("method"), lit(k).as("k"),
            round(col("r"), 4).as("recall"))
      // the index names resolve (and memo-build) sequentially — the
      // memo's getOrElseUpdate is not atomic, so concurrent misses on
      // one key would double-build
      val idx = annIvfPqIndex(s, d)
      val idxRaw = annIvfPqIndex(s, d, residual = false)
      val idxTrained = annIvfPqTrainedIndex(s, d)
      // r17 (guide §2.6, overlap independent jobs): the five method
      // branches are independent, but each AnnIndex.search runs an
      // EAGER probed-cell collect at construction — sequential on the
      // driver, each a small job leaving 31 cores idle. Construct the
      // branches concurrently; the plans, per-branch results, and the
      // union order below are unchanged (futures only overlap the
      // probe collects), so the output is bit-identical.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      // r18 (ADVICE r17): a DEDICATED bounded pool instead of
      // ExecutionContext.Implicits.global — the global pool is shared
      // JVM-wide and sized to the core count, so Spark collects
      // blocking inside it without `blocking{}` markers serialize on
      // low-core boxes (and starve unrelated users of the pool).
      // INVARIANT the concurrency relies on (note for editors of the
      // callees): lshTopK / rerankTopK / AnnIndex.search must not
      // mutate session-global state — no temp views, no conf.set —
      // or these branches become a silent cross-thread race.
      implicit val branchPool: scala.concurrent.ExecutionContext =
        e09BranchPool
      val fLsh = Future(Similarity.lshTopK(queries, emb, "vec_id",
        "embedding", k, planes = 8, tables = 2))
      val fIvfpq = Future(AnnIndex.search(s, idx, queries, "vec_id",
        "embedding", k = k, nprobe = 4))
      // the raw-encoding ablation reads its OWN persisted index too
      // (build-once like the residual one) — the gate measures
      // retrieval quality, not repeated index builds
      val fIvfpqRaw = Future(AnnIndex.search(s, idxRaw, queries,
        "vec_id", "embedding", k = k, nprobe = 4))
      val fRerank = Future(Similarity.rerankTopK(queries, emb,
        AnnIndex.search(s, idx, queries, "vec_id", "embedding",
          k = 24, nprobe = 4),
        "vec_id", "embedding", k))
      // the trained-quantizer index (e10) joins the artifact so the
      // value of training — vs the seeded quantizer at the same
      // cells/codes budget — is a driver-surfaced number
      val fIvfpqTrained = Future(AnnIndex.search(s, idxTrained,
        queries, "vec_id", "embedding", k = k, nprobe = 4))
      def ready(f: Future[org.apache.spark.sql.DataFrame]) =
        Await.result(f, Duration.Inf)
      val lsh = ready(fLsh)
      val ivfpq = ready(fIvfpq)
      val ivfpqRaw = ready(fIvfpqRaw)
      val rerank = ready(fRerank)
      val ivfpqTrained = ready(fIvfpqTrained)
      recallOf("lsh_or2", lsh)
        .union(recallOf("ivfpq_residual", ivfpq))
        .union(recallOf("ivfpq_raw", ivfpqRaw))
        .union(recallOf("ivfpq_trained", ivfpqTrained))
        .union(recallOf("rerank", rerank))
    }),

    // T11: cluster representative selection — the LAST step of the
    // dedup pipeline: every document labeled with its near-dup cluster
    // (dd08's transitive closure) and a keep flag for the
    // highest-quality member (ties to the smallest doc_id), so
    // filtering `keep` yields the deduplicated corpus in one pass.
    // Docs in no cluster keep themselves. The only per-doc shuffle
    // beyond dd08 is the cluster-ranking window.
    "t11_cluster_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = DedupFunctions.minhashBandPairs(docs)
        .filter(col("matching") >= 4)
      DedupFunctions.clusterKeep(docs, pairs)
    }),

    // T23: the gold corpus summary the LlmOrchestrator publishes each
    // batch cycle — t11's cluster/keeper election rolled up per
    // (lang, source) slice: raw vs kept volume, duplicate fraction,
    // mean quality, token budget. Exercises the ORCHESTRATOR's own
    // electKeepers/corpusSummary path (pipeline.LlmOrchestrator), so
    // the cycle's published table is oracle-checked, not just
    // spec-checked. One group-by shuffle beyond t11's window.
    "t23_corpus_summary" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val t = col("text")
      // r17: token/quality kernels over an under-split scan run
      // one-task (guide §2.5) — redistribute first; identity at
      // production split counts
      // materialized ONCE (r17, guide §5): enr feeds BOTH the keeper
      // election and the summary rollup — left lazy, the token/quality
      // kernels re-run per consumer (t27 already checkpoints this
      // exact frame for the same reason)
      val enr = graft.SparkUtil.swapCheckpoint("llm.t23.enr",
        graft.SparkUtil.parallelScan(
          docs.select(col("doc_id"), col("lang"), col("source"),
            col("text")), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"),
        TextFunctions.tokenStats(t).getField("n_tokens").as("n_tokens"),
        TextFunctions.qualityScore(t).as("quality_score"))
        .localCheckpoint(true))
      val pairs = DedupFunctions.minhashBandPairs(docs)
        .filter(col("matching") >= 4)
      val keepers = graft.pipeline.LlmOrchestrator.electKeepers(enr, pairs)
      graft.pipeline.LlmOrchestrator.corpusSummary(
        enr, keepers.select(col("doc_id"), col("keep")))
    }),

    // T27: t23's summary maintained INCREMENTALLY — the corpus folds
    // through the persisted cluster/keeper/summary state in two
    // doc-hash batches (a pair arrives with its later endpoint, the
    // IncrementalLsh delivery order), then the state publishes.
    // Oracle: t23's recursive-CTE SQL, shared verbatim — incremental ≡
    // one-shot is the operator's entire contract (the dd08/dd15
    // pattern, for the whole corpus-gold surface: contraction, keeper
    // demotion, decimal-exact summary arithmetic all under test).
    //
    // The batch-0 fold is memoized per sf as a CLOSED store root
    // (corpusSeedMemo): the first invocation pays the honest lifecycle
    // (ensure + fold) building it, and EVERY invocation then hardlink-
    // clones the seed and folds batch 1 into the clone — so bench
    // iterations 2..n time the production STEADY STATE (one batch
    // folding into existing persisted state, plus publish), not table
    // creation or a byte copy of the state (the annIndexMemo
    // contract, shaped for a store root; manifest paths are
    // root-relative, so a cloned root is a valid store).
    // The folds are deterministic and every iteration ends in the
    // same two-batch state, so the output — and the oracle hash — is
    // identical with or without the memo.
    "t27_incremental_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val t = col("text")
      // r17: same under-split repair as t23 (guide §2.5)
      val enr = graft.SparkUtil.parallelScan(
          docs.select(col("doc_id"), col("lang"), col("source"),
            col("text")), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"),
          TextFunctions.tokenStats(t).getField("n_tokens").as("n_tokens"),
          TextFunctions.qualityScore(t).as("quality_score"))
        .localCheckpoint(true)
      try {
        val pairs = DedupFunctions.minhashBandPairs(docs)
          .filter(col("matching") >= 4)
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint(true)
        try {
          val batchOf = (c: org.apache.spark.sql.Column) =>
            pmod(hash(c), lit(2))
          val pairBatch =
            greatest(batchOf(col("doc_a")), batchOf(col("doc_b")))
          val seed = corpusSeedMemo.getOrElseUpdate(d, {
            val root = java.nio.file.Files
              .createTempDirectory("graft-corpseed").toString
            val st = new graft.store.LogTableStore(s, root)
            graft.llmdata.IncrementalCorpus.applyBatch(st,
              enr.filter(batchOf(col("doc_id")) === 0),
              pairs.filter(pairBatch === 0))
            st.close()
            root
          })
          // The per-invocation clone is scratch: close the store (drop
          // its JVM-global cache entries) AND delete the root in a
          // finally — bench iterations otherwise accrete a store
          // clone on disk plus cache entries for the JVM's lifetime.
          // Deleting the root kills lazy scans over it, so the publish
          // output is materialized (eager localCheckpoint — tiny:
          // one row per (lang, source)) before the cleanup runs.
          val copied = linkTree(seed)
          val store = new graft.store.LogTableStore(s, copied)
          try {
            graft.llmdata.IncrementalCorpus.applyBatch(store,
              enr.filter(batchOf(col("doc_id")) === 1),
              pairs.filter(pairBatch === 1))
            graft.llmdata.IncrementalCorpus.publish(store)
              .localCheckpoint(true)
          } finally {
            store.close()
            deleteTree(copied)
          }
        } finally graft.SparkUtil.releaseCheckpoint(pairs)
      } finally graft.SparkUtil.releaseCheckpoint(enr)
    }),

    // T24: a REAL trained BPE subword tokenizer (Sennrich 2016) — one
    // distributed word-count feeds a bounded driver-side merge loop
    // (the trainCentroids contract), then partition-local memoized
    // encoding with zero shuffle. The oracle checks the LOSSLESS
    // property end to end: decode(encode(text)) must equal the
    // whitespace-normalized lowercased text, which DuckDB derives
    // independently — a tokenizer that drops, duplicates, or invents
    // characters anywhere in the corpus hash-mismatches. Exact
    // segmentation (the literature's low/lower/newest/widest merge
    // sequence, "lowest" → low + est</w>) is pinned in BpeSpec.
    "t24_bpe_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = Bpe.train(docs, "text", vocabSize = 200)
      Bpe.encode(docs, "doc_id", "text", model)
        .select(col("doc_id"),
          array_join(
            filter(
              split(array_join(col("bpe_tokens"), ""), Bpe.EndOfWord),
              x => length(x) > 0),
            " ").as("decoded"))
    }),

    // E5: symmetric int8 embedding quantization — the serving-side
    // memory reduction before large-scale ANN (4× smaller vectors,
    // integer dot products). Pure per-row projection, zero shuffle,
    // all three kernels codegen'd; the self dot product is exact
    // integer math, so the quantized-similarity seam has NO float
    // reduction-order caveats at all.
    "e05_quantize_int8" -> ((s, d) => {
      import graft.functions.VectorExpressions._
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          maxAbsF(col("embedding")).as("max_abs"))
        .select(col("vec_id"), col("max_abs"),
          quantizeInt8(col("embedding"), col("max_abs")).as("qa"))
        .withColumn("selfdot_q", int8SelfDot(col("qa")))
        // the gate serializes the int8 array (comparators hash scalar
        // cells); the array itself is the real API (int8SelfDot above
        // consumes it)
        .select(col("vec_id"), col("max_abs"),
          array_join(col("qa").cast("array<string>"), ",").as("q"),
          col("selfdot_q"))
    }),

    // MM1: multimodal metadata/decode-stub as plan-side expressions
    // (the mapPartitions decoder in graft.llmdata.Multimodal is the
    // drop-in real-codec seam; ScalaTest asserts equivalence).
    "mm01_multimodal_meta" -> ((s, d) => {
      val t = col("text")
      Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("fake/"), col("source")).as("format"),
        length(t).cast("long").as("n_bytes"),
        (lit(100) + ascii(t) % 64).as("width"),
        (lit(100) + ascii(substring(t, 2, 1)) % 64).as("height"),
        lit(3).as("channels"),
        floor(length(t) / lit(100)).cast("int").as("frames"),
        md5(t).as("checksum"))
    }),

    // MM2: video frame sampling — the expression-side twin of
    // Multimodal.sampleFrames: every stride-th frame index per media
    // row (sequence + explode, rows ∝ sampled frames, zero shuffle).
    // At scale the explode feeds the partition-local decode stub —
    // frames never concentrate on one executor because the row is the
    // unit of work.
    "mm02_frame_sample" -> ((s, d) => {
      val frames = floor(length(col("text")) / lit(100)).cast("int")
      Tables.documents(s, d)
        .select(col("doc_id"), frames.as("frames"))
        .filter(col("frames") > 0)
        .select(col("doc_id"), col("frames"),
          explode(sequence(lit(0), col("frames") - 1, lit(4)))
            .as("frame_idx"))
    }),

    // T12: cross-document span dedup — the C4/CCNet "remove any line
    // that repeats across the corpus" pass. This corpus has no
    // newlines, so the dedup unit is a fixed 10-word chunk; any chunk
    // appearing in >= 2 distinct documents is removed from EVERY
    // document and the survivors reassemble in order (docs that lose
    // all chunks stay, empty). Shuffles: the chunk-frequency
    // aggregation (map-side combined; distinct-doc counting keyed by
    // the chunk, so hot chunks reduce early) and the per-doc
    // reassembly. The dup side of the anti-join is tiny by
    // construction (only chunks seen in >= 2 docs) → broadcast at any
    // scale; key it by xxhash64(chunk) when chunk bytes dominate the
    // exchange.
    "t12_line_dedup" -> ((s, d) => {
      val chunkWords = 10
      val words = split(col("text"), " ")
      val base = pdocs(s, d).select(col("doc_id"),
        transform(
          sequence(lit(0),
            ceil(size(words) / lit(chunkWords.toDouble)).cast("int") - 1),
          i => array_join(
            slice(words, i * chunkWords + 1, lit(chunkWords)), " ")).as("chunks"))
      val exploded = base
        .select(col("doc_id"), posexplode(col("chunks")))
        .toDF("doc_id", "chunk_idx", "chunk")
      val dup = exploded.groupBy(col("chunk"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("chunk"))
      // r18: ONE pass — the pre-r18 shape anti-joined then re-joined a
      // SECOND chunking scan of the corpus back on doc_id to recover
      // n_chunks (two full chunk-kernel passes + one extra shuffle).
      // dup's key is unique (groupBy output), so a left join with a
      // dup flag cannot multiply rows, and every document owns >= 1
      // chunk (ceil(size/10) >= 1; split never yields an empty array),
      // so grouping `exploded` alone sees every doc_id: n_chunks,
      // kept_chunks and the ordered clean_text all come from a single
      // aggregation (collect_list skips the null structs of dup
      // chunks). Equivalence pinned in LlmDataSpec.
      val mark = exploded.join(
        broadcast(dup.withColumn("__dup", lit(1))), Seq("chunk"), "left")
      mark.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("__dup").isNull, 1)).as("kept_chunks"),
          array_join(transform(
            array_sort(collect_list(when(col("__dup").isNull,
              struct(col("chunk_idx"), col("chunk"))))),
            x => x.getField("chunk")), " ").as("clean_text"))
        .select(col("doc_id"),
          col("clean_text"),
          col("kept_chunks"),
          (col("n_chunks") - col("kept_chunks")).as("removed_chunks"))
    }),

    // DD9: semantic dedup (the SemDeDup recipe, Abbas et al. 2023):
    // cluster the embedding space, then prune cosine-near pairs ONLY
    // within a cluster, keeping the smallest id. Here the clustering
    // is e03's deterministic coarse quantizer (first-nlist centroids,
    // shuffle-free row-local assignment) so a SQL oracle exists; the
    // trained-centroid variant just passes `trainCentroids` output.
    // Scale shape: pair generation is an equi-join on `cell` — at
    // 100 TB nlist grows with the corpus (SemDeDup uses ~100k
    // clusters) so cells stay small and the within-cell product is
    // bounded; never an all-pairs join. The demonstrative threshold
    // 0.35 matches dd05 (this synthetic corpus tops out at cos≈0.51;
    // a real run uses ≈0.95+).
    "dd09_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDedup(
        Tables.embeddings(s, d), "vec_id", "embedding",
        nlist = 8, tau = 0.35)),

    // T13: normalized ("fuzzy-exact") dedup — the CCNet/RefinedWeb
    // pass that catches documents identical up to case, punctuation
    // and whitespace, which dd01's raw digest misses. Normalization is
    // a pure codegen projection (lower → strip non-alnum → collapse
    // spaces → trim); the keep decision is a min-over-window keyed by
    // the normalized digest — ONE shuffle on the digest, group sizes
    // are duplicate multiplicities (small), and only (doc_id, 16-byte
    // digest) rides the exchange, never the text.
    "t13_normalized_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("norm_hash"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(TextFunctions.normalizeForDedup(col("text"))).as("norm_hash"))
        .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
    }),

    // T14: deterministic per-group fixed-size sampling — the
    // distributed twin of per-source reservoir sampling: every row
    // gets a pseudorandom-but-stable priority (md5 of its id + salt)
    // and the k smallest priorities per source win. row_number + rank
    // filter compiles to WindowGroupLimit, i.e. each task keeps a
    // local top-k heap before the single per-group shuffle — the
    // bottom-k-sample plan, never a full per-group sort of the corpus.
    // Unlike t05's rate sampling, the output size is EXACTLY k per
    // group regardless of group skew.
    "t14_group_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 5
      val pri = md5(concat(col("doc_id").cast("string"), lit(":t14")))
      val w = Window.partitionBy(col("source"))
        .orderBy(pri.asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= k)
    }),

    // T15: corpus heavy hitters — top-20 terms by total occurrences
    // with document frequency. One shuffle (map-side-combined term
    // counts; the single countDistinct plans as a partial distinct,
    // no Expand) and a TakeOrderedAndProject for the top-k — the
    // vocabulary, not the corpus, rides the final ordering. The
    // approx twin (count-min sketch over the same terms, bounded
    // overestimate) is asserted in LlmDataSpec — the CMS seam for
    // when even the vocabulary aggregation must stay sub-linear.
    "t15_top_terms" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("term_count"),
          countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("term_count").desc, col("term").asc)
        .limit(20)
    }),

    // T16: quality-decile bucketing — the curriculum/filter step that
    // follows quality scoring: every document ranked into a decile of
    // its language's quality distribution (ntile), so "keep the top-k
    // deciles" or "mix 3:1 high:low" becomes a plain filter. One
    // shuffle partitioned by lang; ordering is per-language, never a
    // global sort. Deterministic tie-break on doc_id.
    "t16_quality_buckets" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality_score").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality_score"))
        .withColumn("decile", ntile(10).over(w))
        .withColumn("keep_top_half", col("decile") <= 5)
    }),

    // T18: quality percentile analytics — percent_rank + cume_dist
    // per language (the continuous form of t16's deciles, for
    // threshold-free "keep the top X%" filters). Same single
    // per-language window shuffle as t16.
    "t18_quality_percentiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality_score").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality_score"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
    }),

    // T17: feature-hashing embedding (the hashing trick) — a
    // deterministic text→vector projection: token → bucket
    // polyHash % dim, per-bucket counts. Generates the embedding
    // column the similarity family (e01-e05) consumes WITHOUT an
    // external model; integer counts, so the oracle comparison is
    // exact. Pure fused-codegen projection, zero shuffle; the string
    // form is for the driver's row-hash compare (arrays don't survive
    // it), consumers take the array column directly.
    "t17_hash_embedding" -> ((s, d) => {
      val dim = 8
      val emb = graft.functions.ShingleExpression
        .hashBucketCounts(col("text"), dim)
      Tables.documents(s, d).select(col("doc_id"),
        concat_ws("_", emb).as("embedding_sig"),
        aggregate(emb, lit(0L), (a, x) => a + x).as("n_tokens"))
    }),

    // T26: fastText-style hashed LINEAR quality classifier — the
    // CCNet/LLaMA corpus-filter shape: hashing-trick bag-of-words
    // (t17's buckets, 64-dim) scored by a linear model. The weights
    // are a deterministic function of the bucket index (a seeded
    // model stand-in both engines derive independently), and they are
    // INTEGERS: the decision w·x > 0 is computed in exact int64 on
    // both sides — no FP associativity anywhere near the keep flag —
    // and the reported logit is one exact-operand double division
    // (the d16 convention). Pure projection, zero shuffle; at 100 TB
    // a classifier filter costs one scan, as it must.
    "t26_hash_classifier" -> ((s, d) => {
      val dim = 64
      val weights = (0 until dim).map(j =>
        (j.toLong * 2654435761L) % 1000003L - 500000L)
      val wLit = array(weights.map(lit): _*)
      val emb = graft.functions.ShingleExpression
        .hashBucketCounts(col("text"), dim)
      Tables.documents(s, d)
        .select(col("doc_id"),
          aggregate(emb, lit(0L), (a, x) => a + x).as("n_tokens"),
          aggregate(zip_with(emb, wLit, (c, w) => c * w), lit(0L),
            (a, x) => a + x).as("__dot"))
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") > 0,
            round(col("__dot").cast("double") * 4.0 /
              (lit(1000003.0) * col("n_tokens")), 6))
            .otherwise(lit(0.0)).as("quality_logit"),
          (col("__dot") > 0).as("keep"))
    })
  )

  /** dd03's pair derivation, thresholded, then the transitive
    * closure as a recursive min-label reach (small per-cluster row
    * counts make the quadratic reach fine for the oracle). Shared by
    * dd08 (one-shot) and dd15 (incremental) so the two gates can
    * never diverge on what the closure must be. */
  private lazy val ccClosureOracle: String = {
      val shingleHash = "list_transform(" +
        "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
        s", sh -> ${duckHash("sh")})"
      // same pair derivation as dd03, thresholded, then the transitive
      // closure as a recursive min-label reach (small per-cluster
      // row counts make the quadratic reach fine for the oracle)
      s"""WITH RECURSIVE th AS (
         |  SELECT doc_id, $shingleHash AS h FROM documents),
         |sigs AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 8), i ->
         |      list_min(list_transform(h, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
         |  FROM th WHERE len(h) > 0),
         |banded AS (
         |  SELECT doc_id, j,
         |    CAST(sig[2*j + 1] AS VARCHAR) || '_' || CAST(sig[2*j + 2] AS VARCHAR) AS key
         |  FROM sigs, (SELECT UNNEST(range(0, 4)) AS j)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id),
         |e0 AS (
         |  SELECT p.doc_a AS u, p.doc_b AS v
         |  FROM cand p
         |  JOIN sigs sa ON sa.doc_id = p.doc_a
         |  JOIN sigs sb ON sb.doc_id = p.doc_b
         |  WHERE list_sum(list_transform(range(1, 9),
         |    k -> CASE WHEN sa.sig[k] = sb.sig[k] THEN 1 ELSE 0 END)) >= 4),
         |edges AS (
         |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
         |reach(id, lbl) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
         |cc AS (
         |  SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, cluster_id,
         |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
         |FROM cc""".stripMargin
    
  }

  /** t23's full summary derivation (recursive-CTE closure + keeper
    * election + per-(lang, source) rollup). Shared by t23 (one-shot)
    * and t27 (incremental corpus fold) so the two gates can never
    * diverge on what the summary must be — the ccClosureOracle
    * pattern. */
  private lazy val corpusSummaryOracle: String = {
      val shingleHash = "list_transform(" +
        "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
        s", sh -> ${duckHash("sh")})"
      s"""WITH RECURSIVE th AS (
         |  SELECT doc_id, $shingleHash AS h FROM documents),
         |sigs AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 8), i ->
         |      list_min(list_transform(h, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
         |  FROM th WHERE len(h) > 0),
         |banded AS (
         |  SELECT doc_id, j,
         |    CAST(sig[2*j + 1] AS VARCHAR) || '_' || CAST(sig[2*j + 2] AS VARCHAR) AS key
         |  FROM sigs, (SELECT UNNEST(range(0, 4)) AS j)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id),
         |e0 AS (
         |  SELECT p.doc_a AS u, p.doc_b AS v
         |  FROM cand p
         |  JOIN sigs sa ON sa.doc_id = p.doc_a
         |  JOIN sigs sb ON sb.doc_id = p.doc_b
         |  WHERE list_sum(list_transform(range(1, 9),
         |    k -> CASE WHEN sa.sig[k] = sb.sig[k] THEN 1 ELSE 0 END)) >= 4),
         |edges AS (
         |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
         |reach(id, lbl) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
         |cc AS (
         |  SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
         |q AS (
         |  SELECT doc_id,
         |    ROUND(LEAST(1.0, 0.3 * LEAST(sw * 10.0, 1.0)
         |      + 0.4 * LEAST(mwl / 8.0, 1.0) + 0.3 * sat), 6) AS quality_score
         |  FROM (
         |    SELECT doc_id,
         |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
         |        / len(string_split(text, ' ')) AS sw,
         |      CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |        / len(string_split(text, ' ')) AS mwl,
         |      LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) AS sat
         |    FROM documents)),
         |kept AS (
         |  SELECT d.doc_id, d.lang, d.source,
         |    len(string_split(d.text, ' ')) AS n_tokens,
         |    q.quality_score,
         |    ROW_NUMBER() OVER (PARTITION BY COALESCE(cc.cluster_id, d.doc_id)
         |      ORDER BY q.quality_score DESC, d.doc_id) = 1 AS keep
         |  FROM documents d
         |  JOIN q ON q.doc_id = d.doc_id
         |  LEFT JOIN cc ON cc.doc_id = d.doc_id)
         |SELECT lang, source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keepers,
         |  ROUND(1.0 - CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*), 6) AS dup_ratio,
         |  ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(30,9))) AS DOUBLE)
         |    / COUNT(*), 6) AS avg_quality,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM kept
         |GROUP BY lang, source""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // t24's oracle checks the LOSSLESS property: the trained
    // tokenizer's decode(encode(text)) must equal the
    // whitespace-normalized lowercased text, which DuckDB derives
    // without knowing anything about the learned merges. Any merge
    // that drops, duplicates, or invents characters anywhere in the
    // corpus hash-mismatches here; exact segmentation is pinned
    // against the literature's worked example in BpeSpec.
    "t24_bpe_roundtrip" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  array_to_string(
        |    list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '\s+'),
        |                x -> len(x) > 0),
        |    ' ') AS decoded
        |FROM documents""".stripMargin,

    // t25's oracle is the RELATIONAL twin of the fused kernel: grams
    // via list slicing, counts via group-by, top fraction via the
    // max-count join (ties → longest gram), dup coverage via the
    // DISTINCT position union — definitions in RepetitionExpression.
    "t25_gopher_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws FROM documents),
        |tok AS (
        |  SELECT doc_id, i AS pos, length(ws[i]) AS wl
        |  FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)),
        |tot AS (
        |  SELECT doc_id, CAST(SUM(wl) AS BIGINT) AS total FROM tok GROUP BY doc_id),
        |ns AS (SELECT UNNEST([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS n),
        |grams AS (
        |  SELECT doc_id, n, i AS start, array_to_string(ws[i:i + n - 1], ' ') AS g
        |  FROM w CROSS JOIN ns, UNNEST(range(1, len(ws) - n + 2)) AS t(i)),
        |cnt AS (
        |  SELECT doc_id, n, g, COUNT(*) AS c, length(g) - (n - 1) AS gl
        |  FROM grams GROUP BY doc_id, n, g),
        |mx AS (
        |  SELECT doc_id, n, MAX(c) AS maxc FROM cnt WHERE n <= 4 GROUP BY doc_id, n),
        |topf AS (
        |  SELECT c.doc_id, c.n,
        |    LEAST(CAST(1.0 AS DOUBLE),
        |      CAST(m.maxc AS DOUBLE) * MAX(c.gl) / MAX(tt.total)) AS frac
        |  FROM cnt c
        |  JOIN mx m ON c.doc_id = m.doc_id AND c.n = m.n AND c.c = m.maxc
        |  JOIN tot tt ON tt.doc_id = c.doc_id AND tt.total > 0
        |  GROUP BY c.doc_id, c.n, m.maxc),
        |dup AS (
        |  SELECT g.doc_id, g.n, g.start
        |  FROM grams g JOIN cnt c ON g.doc_id = c.doc_id AND g.n = c.n AND g.g = c.g
        |  WHERE g.n >= 5 AND c.c >= 2),
        |cov AS (
        |  SELECT DISTINCT d.doc_id, d.n, d.start + o AS pos
        |  FROM dup d, UNNEST(range(0, d.n)) AS t(o)),
        |dupf AS (
        |  SELECT c.doc_id, c.n, CAST(SUM(t.wl) AS DOUBLE) / MAX(tt.total) AS frac
        |  FROM cov c
        |  JOIN tok t ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  JOIN tot tt ON tt.doc_id = c.doc_id AND tt.total > 0
        |  GROUP BY c.doc_id, c.n),
        |fr AS (SELECT * FROM topf UNION ALL SELECT * FROM dupf),
        |piv AS (
        |  SELECT d.doc_id,
        |    COALESCE(round(MAX(CASE WHEN f.n = 2 THEN f.frac END), 6), 0.0) AS top2_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 3 THEN f.frac END), 6), 0.0) AS top3_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 4 THEN f.frac END), 6), 0.0) AS top4_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 5 THEN f.frac END), 6), 0.0) AS dup5_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 6 THEN f.frac END), 6), 0.0) AS dup6_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 7 THEN f.frac END), 6), 0.0) AS dup7_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 8 THEN f.frac END), 6), 0.0) AS dup8_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 9 THEN f.frac END), 6), 0.0) AS dup9_frac,
        |    COALESCE(round(MAX(CASE WHEN f.n = 10 THEN f.frac END), 6), 0.0) AS dup10_frac
        |  FROM documents d LEFT JOIN fr f ON d.doc_id = f.doc_id
        |  GROUP BY d.doc_id)
        |SELECT *,
        |  top2_frac <= 0.20 AND top3_frac <= 0.18 AND top4_frac <= 0.16
        |  AND dup5_frac <= 0.15 AND dup6_frac <= 0.14 AND dup7_frac <= 0.13
        |  AND dup8_frac <= 0.12 AND dup9_frac <= 0.11 AND dup10_frac <= 0.10 AS keep
        |FROM piv""".stripMargin,

    "t12_line_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |chunks AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
        |  FROM base, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)),
        |dup AS (
        |  SELECT chunk FROM chunks GROUP BY chunk
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_chunks,
        |    string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
        |  FROM chunks WHERE chunk NOT IN (SELECT chunk FROM dup)
        |  GROUP BY doc_id)
        |SELECT b.doc_id,
        |  COALESCE(a.clean_text, '') AS clean_text,
        |  COALESCE(a.kept_chunks, 0) AS kept_chunks,
        |  CAST(CAST(ceil(len(b.w) / 10.0) AS BIGINT)
        |    - COALESCE(a.kept_chunks, 0) AS BIGINT) AS removed_chunks
        |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t04_pii_scrub" -> {
      val raw = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '$ipRe')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'),
         |    '$ipRe', '<IP>', 'g')) AS clean_digest
         |FROM (SELECT doc_id, $raw AS raw FROM documents)""".stripMargin
    },

    "t05_stratified_sample" ->
      """SELECT source, COUNT(*) AS total_docs,
        |  CAST(SUM(CASE WHEN substr(md5(text), 1, 2) <
        |    (CASE WHEN source IN ('src0', 'src1') THEN '80' ELSE '1a' END)
        |  THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs
        |FROM documents GROUP BY source""".stripMargin,

    "t06_train_split" ->
      """SELECT lang,
        |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "t09_sequence_packing" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS doc_tokens
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |chunks AS (
        |  SELECT doc_id, source, doc_tokens,
        |    UNNEST(range(0, CAST(floor((doc_tokens - 1) / 64) AS INTEGER) + 1))
        |      AS chunk_idx
        |  FROM base),
        |sized AS (
        |  SELECT doc_id, source, chunk_idx,
        |    CAST(floor(doc_id / 100) AS BIGINT) AS pack_group,
        |    LEAST(64, doc_tokens - chunk_idx * 64) AS chunk_tokens
        |  FROM chunks),
        |binned AS (
        |  SELECT source, pack_group, chunk_tokens,
        |    CAST(floor(COALESCE(SUM(chunk_tokens) OVER (
        |      PARTITION BY source, pack_group ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256)
        |      AS BIGINT) AS bin
        |  FROM sized)
        |SELECT source, pack_group, bin, COUNT(*) AS n_chunks,
        |  CAST(SUM(chunk_tokens) AS BIGINT) AS n_tokens
        |FROM binned GROUP BY source, pack_group, bin""".stripMargin,

    "t10_tfidf_topk" ->
      """WITH dt AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM dt GROUP BY doc_id, term),
        |dfreq AS (
        |  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf,
        |    ROUND(CAST(t.tf AS DOUBLE)
        |      * ROUND(ln(n.n_docs / f.df), 9), 6) AS tfidf
        |  FROM tf t JOIN dfreq f ON t.term = f.term, n)
        |SELECT doc_id, term, tf, tfidf, CAST(rn AS INTEGER) AS rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |WHERE rn <= 3""".stripMargin,

    "t08_unigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (
        |  SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
        |tot AS (
        |  SELECT CAST(SUM(tf) AS DOUBLE) AS n_total FROM freq)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |  ROUND(CAST(SUM(CAST(ROUND(-ln(CAST(f.tf AS DOUBLE) /
        |    (SELECT n_total FROM tot)), 9) AS DECIMAL(30,9))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_nll
        |FROM toks t JOIN freq f ON t.tok = f.tok
        |GROUP BY t.doc_id""".stripMargin,

    "t20_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev,
        |    unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS cur
        |  FROM toks WHERE len(t) >= 2),
        |c2 AS (
        |  SELECT prev, cur, COUNT(*) AS c2 FROM grams GROUP BY prev, cur),
        |c1 AS (
        |  SELECT prev, COUNT(*) AS c1 FROM grams GROUP BY prev)
        |SELECT g.doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(CAST(SUM(CAST(ROUND(-ln(CAST(b.c2 AS DOUBLE) / u.c1), 9)
        |    AS DECIMAL(30,9))) AS DOUBLE) / COUNT(*), 6) AS mean_nll
        |FROM grams g
        |JOIN c2 b ON g.prev = b.prev AND g.cur = b.cur
        |JOIN c1 u ON g.prev = u.prev
        |GROUP BY g.doc_id""".stripMargin,

    "t07_data_mixing" ->
      s"""WITH srcstats AS (
         |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    CASE WHEN source IN ('src0', 'src1') THEN 3.0 ELSE 1.0 END AS w
         |  FROM documents GROUP BY source),
         |cut AS (
         |  SELECT source,
         |    CAST(floor((CAST(CAST(floor(200 * w /
         |        (SELECT SUM(w) FROM srcstats)) AS BIGINT) AS DOUBLE)
         |      / n_docs) * 1000000007) AS BIGINT) AS cutoff
         |  FROM srcstats)
         |SELECT d.source, COUNT(*) AS picked_docs,
         |  CAST(SUM(CAST(len(string_split(d.text, ' ')) AS BIGINT)) AS BIGINT)
         |    AS picked_tokens
         |FROM documents d JOIN cut c ON d.source = c.source
         |WHERE ${duckHash("d.text")} < c.cutoff
         |GROUP BY d.source""".stripMargin,

    "t21_span_dedup" -> {
      val gram = (0 until 8).map(j => if (j == 0) "t[i]" else s"t[i+$j]")
        .mkString(" || ' ' || ")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, ${duckHash("gram")} AS h FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(
         |      range(1, len(t) - 6), i -> $gram))) AS gram
         |    FROM toks WHERE len(t) >= 8) x),
         |f AS (
         |  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS nd FROM g),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |    CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dup_spans
         |  FROM f GROUP BY doc_id),
         |frac AS (
         |  SELECT d.doc_id,
         |    COALESCE(a.n_spans, 0) AS n_spans,
         |    COALESCE(a.dup_spans, 0) AS dup_spans,
         |    CASE WHEN COALESCE(a.n_spans, 0) > 0
         |      THEN ROUND(CAST(a.dup_spans AS DOUBLE) / a.n_spans, 6)
         |      ELSE 0.0 END AS dup_frac
         |  FROM documents d LEFT JOIN agg a USING (doc_id))
         |SELECT doc_id, n_spans, dup_spans, dup_frac,
         |  dup_frac <= 0.3 AS keep
         |FROM frac""".stripMargin
    },

    "t22_gopher_rules" ->
      s"""WITH m AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS INTEGER) AS n_words,
         |    ROUND(CAST(length(text) - (len(toks) - 1) AS DOUBLE)
         |      / len(toks), 6) AS mean_word_len,
         |    CAST(len(list_intersect(list_distinct(toks), [$stopList]))
         |      AS INTEGER) AS stopword_hits,
         |    ROUND(CAST(length(text) - length(regexp_replace(text,
         |      '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 6)
         |      AS symbol_ratio
         |  FROM m)
         |SELECT doc_id, n_words, mean_word_len, stopword_hits, symbol_ratio,
         |  n_words >= 50 AND n_words <= 100000 AS ok_word_count,
         |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS ok_mean_len,
         |  stopword_hits >= 2 AS ok_stopwords,
         |  symbol_ratio <= 0.1 AS ok_symbols,
         |  (n_words >= 50 AND n_words <= 100000)
         |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         |    AND stopword_hits >= 2 AND symbol_ratio <= 0.1 AS keep
         |FROM r""".stripMargin,

    "t19_repetition_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
        |    CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct
        |  FROM toks),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
        |  FROM toks WHERE len(t) >= 2),
        |gc AS (
        |  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram),
        |gt AS (
        |  SELECT doc_id, MAX(c) AS top_gram, CAST(SUM(c) AS BIGINT) AS total_grams
        |  FROM gc GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens,
        |  ROUND(CAST(1.0 AS DOUBLE) - CAST(b.n_distinct AS DOUBLE) / b.n_tokens, 6)
        |    AS dup_token_frac,
        |  COALESCE(ROUND(CAST(g.top_gram AS DOUBLE) / g.total_grams, 6),
        |    CAST(0.0 AS DOUBLE)) AS top_bigram_frac,
        |  COALESCE(ROUND(CAST(g.top_gram AS DOUBLE) / g.total_grams, 6) > 0.18,
        |    FALSE) AS repetitive
        |FROM base b LEFT JOIN gt g ON b.doc_id = g.doc_id""".stripMargin,

    "dd07_contamination" -> {
      val gram = "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || " +
        "t[i+3] || ' ' || t[i+4]"
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, ${duckHash("gram")} AS gh FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(
         |      range(1, len(t) - 3), i -> $gram))) AS gram
         |    FROM toks WHERE len(t) >= 5) x)
         |SELECT c.doc_id,
         |  COUNT(DISTINCT b.doc_id) AS n_benchmark_docs,
         |  COUNT(DISTINCT c.gh) AS n_shared_grams
         |FROM g c JOIN g b ON c.gh = b.gh
         |WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
         |GROUP BY c.doc_id""".stripMargin
    },

    "dd14_contamination_frac" -> {
      val gram = "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || " +
        "t[i+3] || ' ' || t[i+4]"
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, ${duckHash("gram")} AS gh FROM (
         |    SELECT doc_id, unnest(list_distinct(list_transform(
         |      range(1, len(t) - 3), i -> $gram))) AS gram
         |    FROM toks WHERE len(t) >= 5) x),
         |b AS (SELECT doc_id AS bench_id, gh FROM g WHERE doc_id % 10 = 0),
         |bt AS (
         |  SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS bench_grams
         |  FROM b GROUP BY bench_id),
         |p AS (
         |  SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM g c JOIN b ON c.gh = b.gh
         |  WHERE c.doc_id % 10 <> 0
         |  GROUP BY c.doc_id, b.bench_id)
         |SELECT p.doc_id, p.bench_id, p.n_shared, bt.bench_grams,
         |  ROUND(CAST(p.n_shared AS DOUBLE) / bt.bench_grams, 6)
         |    AS overlap_frac,
         |  ROUND(CAST(p.n_shared AS DOUBLE) / bt.bench_grams, 6) >= 0.5
         |    AS contaminated
         |FROM p JOIN bt USING (bench_id)""".stripMargin
    },

    "t01_text_stats" ->
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |    string_split(text, ' ') AS toks,
         |    CAST(len(string_split_regex(text, '[[:space:][:punct:]]+')) AS INTEGER) AS n_subwords,
         |    length(text) AS n_chars_txt
         |  FROM documents),
         |r AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS INTEGER) AS n_tokens,
         |    n_subwords,
         |    CAST(len(list_filter(toks, w -> w IN ($stopList))) AS DOUBLE) / len(toks) AS sw,
         |    CAST(n_chars_txt - (len(toks) - 1) AS DOUBLE) / len(toks) AS mwl,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dtr,
         |    CAST(n_chars_txt - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / n_chars_txt AS sym,
         |    LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS sat
         |  FROM m)
         |SELECT doc_id, n_tokens, n_subwords,
         |  ROUND(sw, 6) AS stopword_ratio,
         |  ROUND(mwl, 6) AS mean_word_len,
         |  ROUND(dtr, 6) AS distinct_token_ratio,
         |  ROUND(sym, 6) AS symbol_ratio,
         |  ROUND(LEAST(1.0, 0.3 * LEAST(sw * 10.0, 1.0)
         |    + 0.4 * LEAST(mwl / 8.0, 1.0) + 0.3 * sat), 6) AS quality_score
         |FROM r""".stripMargin,

    "t02_langid" -> {
      def ratio(markers: Seq[String]): String = {
        val list = markers.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($list))) AS DOUBLE) / len(string_split(text, ' '))"
      }
      val Seq(en, de, fr) = TextFunctions.LanguageMarkers.map(m => ratio(m._2))
      s"""SELECT doc_id, lang,
         |  CASE WHEN sw > 0.03 THEN 'en' ELSE 'unknown' END AS predicted_lang,
         |  ROUND(LEAST(sw * 10.0, 1.0), 6) AS confidence,
         |  CASE WHEN best <= 0.02 THEN 'unknown'
         |       WHEN s_en = best THEN 'en'
         |       WHEN s_de = best THEN 'de'
         |       WHEN s_fr = best THEN 'fr'
         |       ELSE 'unknown' END AS argmax_lang
         |FROM (
         |  SELECT doc_id, lang, sw, s_en, s_de, s_fr,
         |    GREATEST(GREATEST(s_en, s_de), s_fr) AS best
         |  FROM (
         |    SELECT doc_id, lang,
         |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
         |        / len(string_split(text, ' ')) AS sw,
         |      $en AS s_en,
         |      $de AS s_de,
         |      $fr AS s_fr
         |    FROM documents))""".stripMargin
    },

    "t03_fingerprint" ->
      s"""SELECT doc_id, ${duckHash("text")} AS fingerprint
         |FROM documents""".stripMargin,

    "dd01_exact_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
        |  COUNT(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,

    "dd02_ngram_jaccard" ->
      {
        val shingleHash = "list_transform(" +
          "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
          "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
          s", sh -> ${duckHash("sh")})"
        s"""WITH sh AS (
          |  SELECT doc_id, lang, $shingleHash AS s FROM documents),
          |sigs AS (
          |  SELECT doc_id, lang, s,
          |    list_transform(range(0, 8), i ->
          |      list_min(list_transform(s, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
          |  FROM sh WHERE len(s) > 0),
          |banded AS (
          |  SELECT doc_id, lang, j,
          |    CAST(sig[2*j + 1] AS VARCHAR) || '_' || CAST(sig[2*j + 2] AS VARCHAR) AS key
          |  FROM sigs, (SELECT UNNEST(range(0, 4)) AS j)),
          |pairs AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM banded a JOIN banded b
          |    ON a.lang = b.lang AND a.j = b.j AND a.key = b.key
          |      AND a.doc_id < b.doc_id)
          |SELECT p.doc_a, p.doc_b,
          |  ROUND(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
          |    / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
          |FROM pairs p
          |JOIN sigs sa ON sa.doc_id = p.doc_a
          |JOIN sigs sb ON sb.doc_id = p.doc_b
          |WHERE len(list_distinct(list_concat(sa.s, sb.s))) > 0""".stripMargin
      },

    "dd03_minhash_lsh" -> {
      val shingleHash = "list_transform(" +
        "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
        s", sh -> ${duckHash("sh")})"
      s"""WITH th AS (
         |  SELECT doc_id, $shingleHash AS h FROM documents),
         |sigs AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 8), i ->
         |      list_min(list_transform(h, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
         |  FROM th WHERE len(h) > 0),
         |banded AS (
         |  SELECT doc_id, j,
         |    CAST(sig[2*j + 1] AS VARCHAR) || '_' || CAST(sig[2*j + 2] AS VARCHAR) AS key
         |  FROM sigs, (SELECT UNNEST(range(0, 4)) AS j)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(list_sum(list_transform(range(1, 9),
         |    k -> CASE WHEN sa.sig[k] = sb.sig[k] THEN 1 ELSE 0 END)) AS INTEGER) AS matching,
         |  CAST(list_sum(list_transform(range(1, 9),
         |    k -> CASE WHEN sa.sig[k] = sb.sig[k] THEN 1 ELSE 0 END)) AS DOUBLE) / 8.0 AS est_jaccard
         |FROM pairs p
         |JOIN sigs sa ON sa.doc_id = p.doc_a
         |JOIN sigs sb ON sb.doc_id = p.doc_b""".stripMargin
    },

    "dd12_incremental_lsh" -> {
      val shingleHash = "list_transform(" +
        "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
        s", sh -> ${duckHash("sh")})"
      s"""WITH th AS (
         |  SELECT doc_id, $shingleHash AS h FROM documents),
         |sigs AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 8), i ->
         |      list_min(list_transform(h, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
         |  FROM th WHERE len(h) > 0),
         |banded AS (
         |  SELECT doc_id, j,
         |    CAST(sig[2*j + 1] AS VARCHAR) || '_' || CAST(sig[2*j + 2] AS VARCHAR) AS key
         |  FROM sigs, (SELECT UNNEST(range(0, 4)) AS j))
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM banded a JOIN banded b
         |  ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin
    },

    "dd08_dup_clusters" -> ccClosureOracle,

    // the incremental fold must land on the SAME closure — one oracle
    // string, two gate queries, zero drift
    "dd15_incremental_cc" -> ccClosureOracle,

    "dd04_simhash" -> {
      val tokHash = "list_transform(list_distinct(string_split(text, ' ')), " +
        s"w -> ${duckHash("w")})"
      s"""SELECT doc_id, lang, simhash, simhash >> 8 AS bucket
         |FROM (
         |  SELECT doc_id, lang,
         |    CAST(list_sum(list_transform(range(0, 16), b ->
         |      CASE WHEN COALESCE(list_sum(list_transform($tokHash,
         |        x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
         |      THEN 1 << b ELSE 0 END)) AS INTEGER) AS simhash
         |  FROM documents)""".stripMargin
    },

    "dd10_simhash_pairs" -> {
      val tokHash = "list_transform(list_distinct(string_split(text, ' ')), " +
        s"w -> ${duckHash("w")})"
      s"""WITH sigs AS (
         |  SELECT doc_id, lang,
         |    CAST(list_sum(list_transform(range(0, 16), b ->
         |      CASE WHEN COALESCE(list_sum(list_transform($tokHash,
         |        x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
         |      THEN 1 << b ELSE 0 END)) AS INTEGER) AS simhash
         |  FROM documents),
         |banded AS (
         |  SELECT doc_id, lang, simhash, CAST(b AS INTEGER) AS band,
         |    (simhash >> (CAST(b AS INTEGER) * 8)) & 255 AS bv
         |  FROM sigs, UNNEST(range(0, 2)) AS t(b)),
         |cand AS (
         |  SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS sim_a, b.simhash AS sim_b
         |  FROM banded a JOIN banded b
         |    ON a.lang = b.lang AND a.band = b.band AND a.bv = b.bv
         |   AND a.doc_id < b.doc_id
         |  WHERE a.band = 0 OR (a.simhash & 255) <> (b.simhash & 255))
         |SELECT lang, id_a, id_b, sim_a, sim_b,
         |  CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
         |FROM cand
         |WHERE bit_count(xor(sim_a, sim_b)) <= 1""".stripMargin
    },

    "dd11_simhash64_pairs" -> {
      val tokHash = "list_transform(list_distinct(string_split(text, ' ')), " +
        s"w -> ${duckHash("w")})"
      s"""WITH th AS (
         |  SELECT doc_id, lang, $tokHash AS h FROM documents),
         |sigs AS (
         |  SELECT doc_id, lang,
         |    list_transform(range(0, 4), j ->
         |      CAST(list_sum(list_transform(range(0, 16), k ->
         |        CASE WHEN COALESCE(list_sum(list_transform(h, x ->
         |          CASE WHEN (((2*(j*16+k)+1)*x + 17*(j*16+k)+3)
         |                     % 1000000007) & 1 = 1
         |          THEN 1 ELSE -1 END)), 0) > 0
         |        THEN 1 << k ELSE 0 END)) AS INTEGER)) AS bands
         |  FROM th),
         |banded AS (
         |  SELECT doc_id, lang, bands, CAST(j AS INTEGER) AS band,
         |    bands[CAST(j AS INTEGER) + 1] AS bv
         |  FROM sigs, UNNEST(range(0, 4)) AS t(j)),
         |cand AS (
         |  SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.bands AS ba, b.bands AS bb
         |  FROM banded a JOIN banded b
         |    ON a.lang = b.lang AND a.band = b.band AND a.bv = b.bv
         |   AND a.doc_id < b.doc_id
         |  WHERE CASE WHEN a.band = 0 THEN TRUE
         |    WHEN a.band = 1 THEN a.bands[1] <> b.bands[1]
         |    WHEN a.band = 2 THEN a.bands[1] <> b.bands[1]
         |                     AND a.bands[2] <> b.bands[2]
         |    ELSE a.bands[1] <> b.bands[1] AND a.bands[2] <> b.bands[2]
         |     AND a.bands[3] <> b.bands[3] END)
         |SELECT lang, id_a, id_b,
         |  CAST(bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
         |     + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4]))
         |    AS INTEGER) AS hamming
         |FROM cand
         |WHERE bit_count(xor(ba[1], bb[1])) + bit_count(xor(ba[2], bb[2]))
         |    + bit_count(xor(ba[3], bb[3])) + bit_count(xor(ba[4], bb[4])) <= 3
         |""".stripMargin
    },

    "e01_cosine_topk" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM v),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ROUND(${duckDot("q.e", "c.e")} / (q.nrm * c.nrm), 6) AS cos
         |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20)
         |SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rn
         |  FROM scored)
         |WHERE rn <= 5""".stripMargin,

    // OR-amplified twin: table t uses plane family offset t·8; a pair
    // collides if it agrees in either table; the reported bucket is
    // the smallest colliding one (the Spark side's canonicalization).
    "e02_ann_lsh" -> {
      def bucket(offset: Int) =
        "CAST(list_sum(list_transform(range(0, 8), j -> " +
          "CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(range(0, len(e)), i -> " +
          s"(CASE WHEN ((((j+$offset)*73 + i*i*31 + 7) % 1000003) * (((j+$offset)*31 + i*911 + 3) % 1000003) % 1000003) % 2 = 0 " +
          "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) * e[i+1])), " +
          "(x, y) -> x + y) > 0 THEN 1 << j ELSE 0 END)) AS INTEGER)"
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm,
         |    ${bucket(0)} AS b0, ${bucket(8)} AS b1
         |  FROM v),
         |collided AS (
         |  SELECT q.vec_id AS query_id, q.b0 AS bucket, c.vec_id AS neighbor_id,
         |    ROUND(${duckDot("q.e", "c.e")} / (q.nrm * c.nrm), 6) AS cos
         |  FROM n q JOIN n c ON q.b0 = c.b0 AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20
         |  UNION ALL
         |  SELECT q.vec_id AS query_id, q.b1 AS bucket, c.vec_id AS neighbor_id,
         |    ROUND(${duckDot("q.e", "c.e")} / (q.nrm * c.nrm), 6) AS cos
         |  FROM n q JOIN n c ON q.b1 = c.b1 AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20),
         |scored AS (
         |  SELECT query_id, neighbor_id, MIN(bucket) AS bucket, MAX(cos) AS cos
         |  FROM collided GROUP BY query_id, neighbor_id)
         |SELECT query_id, bucket, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rn
         |  FROM scored)
         |WHERE rn <= 3""".stripMargin
    },

    "t11_cluster_keep" -> {
      val shingleHash = "list_transform(" +
        "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
        s", sh -> ${duckHash("sh")})"
      s"""WITH RECURSIVE th AS (
         |  SELECT doc_id, $shingleHash AS h FROM documents),
         |sigs AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 8), i ->
         |      list_min(list_transform(h, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
         |  FROM th WHERE len(h) > 0),
         |banded AS (
         |  SELECT doc_id, j,
         |    CAST(sig[2*j + 1] AS VARCHAR) || '_' || CAST(sig[2*j + 2] AS VARCHAR) AS key
         |  FROM sigs, (SELECT UNNEST(range(0, 4)) AS j)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM banded a JOIN banded b
         |    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id),
         |e0 AS (
         |  SELECT p.doc_a AS u, p.doc_b AS v
         |  FROM cand p
         |  JOIN sigs sa ON sa.doc_id = p.doc_a
         |  JOIN sigs sb ON sb.doc_id = p.doc_b
         |  WHERE list_sum(list_transform(range(1, 9),
         |    k -> CASE WHEN sa.sig[k] = sb.sig[k] THEN 1 ELSE 0 END)) >= 4),
         |edges AS (
         |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
         |reach(id, lbl) AS (
         |  SELECT u, u FROM edges
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
         |cc AS (
         |  SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
         |q AS (
         |  SELECT doc_id,
         |    ROUND(LEAST(1.0, 0.3 * LEAST(sw * 10.0, 1.0)
         |      + 0.4 * LEAST(mwl / 8.0, 1.0) + 0.3 * sat), 6) AS quality_score
         |  FROM (
         |    SELECT doc_id,
         |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
         |        / len(string_split(text, ' ')) AS sw,
         |      CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |        / len(string_split(text, ' ')) AS mwl,
         |      LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) AS sat
         |    FROM documents))
         |SELECT d.doc_id,
         |  COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
         |  q.quality_score,
         |  ROW_NUMBER() OVER (PARTITION BY COALESCE(cc.cluster_id, d.doc_id)
         |    ORDER BY q.quality_score DESC, d.doc_id) = 1 AS keep
         |FROM documents d
         |JOIN q ON q.doc_id = d.doc_id
         |LEFT JOIN cc ON cc.doc_id = d.doc_id""".stripMargin
    },

    "t23_corpus_summary" -> corpusSummaryOracle,

    // t27 folds the same corpus incrementally (two doc-hash batches
    // through the persisted cluster/summary state) — SAME oracle
    // string as t23, shared verbatim so the one-shot and incremental
    // gates can never diverge on what the summary must be (the
    // dd08/dd15 pattern).
    "t27_incremental_corpus" -> corpusSummaryOracle,
    "e05_quantize_int8" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, e,
        |    COALESCE(list_max(list_transform(e, x -> abs(x))), 0.0) AS max_abs
        |  FROM v),
        |q AS (
        |  SELECT vec_id, max_abs,
        |    list_transform(e, x -> CAST(CASE WHEN max_abs = 0 THEN 0
        |      ELSE ROUND(x * 127.0 / max_abs) END AS TINYINT)) AS q
        |  FROM m)
        |SELECT vec_id, max_abs,
        |  array_to_string(q, ',') AS q,
        |  CAST(COALESCE(list_sum(list_transform(q,
        |    x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))), 0) AS BIGINT) AS selfdot_q
        |FROM q""".stripMargin,

    "dd06_minhash_union" -> {
      val shingleHash = "list_transform(" +
        "list_distinct(list_transform(range(1, len(string_split(text, ' '))), " +
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))" +
        s", sh -> ${duckHash("sh")})"
      s"""WITH th AS (
         |  SELECT doc_id, lang, $shingleHash AS h FROM documents),
         |sigs AS (
         |  SELECT lang,
         |    list_transform(range(0, 8), i ->
         |      list_min(list_transform(h, x -> ((2*i + 1) * x + (17*i + 3)) % 1000000007))) AS sig
         |  FROM th WHERE len(h) > 0)
         |SELECT lang, COUNT(*) AS docs,
         |  array_to_string(list_transform(range(1, 9), k ->
         |    list_min(list_transform(list(sig), s -> s[k]))), '_') AS lang_sig
         |FROM sigs GROUP BY lang""".stripMargin
    },

    "dd05_embedding_neardup" -> {
      val bucket = "CAST(list_sum(list_transform(range(0, 8), j -> " +
        "CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list_transform(range(0, len(e)), i -> " +
        "(CASE WHEN (((j*73 + i*i*31 + 7) % 1000003) * ((j*31 + i*911 + 3) % 1000003) % 1000003) % 2 = 0 " +
        "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) * e[i+1])), " +
        "(x, y) -> x + y) > 0 THEN 1 << j ELSE 0 END)) AS INTEGER)"
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm,
         |    $bucket AS bucket
         |  FROM v)
         |SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
         |  ROUND(${duckDot("a.e", "b.e")} / (a.nrm * b.nrm), 6) AS cos
         |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ROUND(${duckDot("a.e", "b.e")} / (a.nrm * b.nrm), 6) >= 0.35""".stripMargin
    },

    "e03_ann_ivf" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM v),
         |cent AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, e AS centv, nrm AS centn
         |  FROM n WHERE vec_id < 16),
         |assigned AS (
         |  SELECT neighbor_id, cv, cn, cell FROM (
         |    SELECT c.vec_id AS neighbor_id, c.e AS cv, c.nrm AS cn, t.cell,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY ROUND(${duckDot("c.e", "t.centv")} / (c.nrm * t.centn), 6) DESC,
         |                 t.cell) AS rn
         |    FROM n c CROSS JOIN cent t)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, qn, cell FROM (
         |    SELECT q.vec_id AS query_id, q.e AS qv, q.nrm AS qn, t.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckDot("q.e", "t.centv")} / (q.nrm * t.centn), 6) DESC,
         |                 t.cell) AS rn
         |    FROM n q CROSS JOIN cent t WHERE q.vec_id < 20)
         |  WHERE rn <= 2),
         |scored AS (
         |  SELECT p.query_id, a.neighbor_id,
         |    ROUND(${duckDot("p.qv", "a.cv")} / (p.qn * a.cn), 6) AS cos
         |  FROM probes p JOIN assigned a
         |    ON p.cell = a.cell AND p.query_id <> a.neighbor_id)
         |SELECT query_id, neighbor_id, cos, CAST(rn AS INTEGER) AS rank
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS rn
         |  FROM scored)
         |WHERE rn <= 3""".stripMargin,

    "e06_ann_pq" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |cent AS (
         |  SELECT CAST(m AS INTEGER) AS m, CAST(vec_id AS INTEGER) AS j,
         |    list_slice(e, CAST(m AS INTEGER)*16 + 1, CAST(m AS INTEGER)*16 + 16) AS cvec
         |  FROM v, UNNEST(range(0, 4)) AS t(m) WHERE vec_id < 16),
         |centn AS (
         |  SELECT m, j, cvec, ${duckDot("cvec", "cvec")} AS cc FROM cent),
         |subs AS (
         |  SELECT vec_id, CAST(m AS INTEGER) AS m,
         |    list_slice(e, CAST(m AS INTEGER)*16 + 1, CAST(m AS INTEGER)*16 + 16) AS sub
         |  FROM v, UNNEST(range(0, 4)) AS t(m)),
         |subn AS (
         |  SELECT vec_id, m, sub, ${duckDot("sub", "sub")} AS xx FROM subs),
         |dists AS (
         |  SELECT s.vec_id, s.m, c.j,
         |    ROUND(s.xx - 2 * ${duckDot("s.sub", "c.cvec")} + c.cc, 6) AS d,
         |    ROUND(c.cc - 2 * ${duckDot("s.sub", "c.cvec")}, 6) AS dsel
         |  FROM subn s JOIN centn c ON s.m = c.m),
         |codes AS (
         |  SELECT vec_id AS neighbor_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dsel, j) AS rn
         |    FROM dists) WHERE rn = 1),
         |adc AS (
         |  SELECT d.vec_id AS query_id, co.neighbor_id,
         |    CAST(SUM(CAST(d.d AS DECIMAL(20,6))) AS DOUBLE) AS adist
         |  FROM dists d JOIN codes co ON d.m = co.m AND d.j = co.code
         |  WHERE d.vec_id < 20 AND d.vec_id <> co.neighbor_id
         |  GROUP BY d.vec_id, co.neighbor_id)
         |SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rank
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS rn
         |  FROM adc)
         |WHERE rn <= 3""".stripMargin,

    // Residual (IVFADC) twin: PQ codes quantize rv = v − centroid(cell),
    // and each query builds one distance table per PROBED cell from its
    // own residual. The float discipline: the residual is rounded to
    // REAL (Spark subtracts in float) then promoted back to DOUBLE for
    // every dot product (Spark's dotF promotes per element).
    "e07_ann_ivfpq" -> (ivfPqAdcCtes +
      """
        |SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY adist, neighbor_id) AS rn
        |  FROM adc)
        |WHERE rn <= 3""".stripMargin),

    // e11's lifecycle (bootstrap build → frozen-quantizer append →
    // compact → serve) must land exactly where the one-shot build
    // lands — so its oracle IS e07's, shared verbatim (see the e11
    // entry for why the prefix split freezes the identical quantizer)
    "e11_ann_incremental" -> (ivfPqAdcCtes +
      """
        |SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rank
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY adist, neighbor_id) AS rn
        |  FROM adc)
        |WHERE rn <= 3""".stripMargin),

    "e08_ann_rerank" -> (ivfPqAdcCtes + s""",
        |candtop AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
        |    FROM adc)
        |  WHERE rn <= 24)
        |SELECT query_id, neighbor_id, cos, CAST(rn2 AS INTEGER) AS rank
        |FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |    ROUND(${duckDot("q.e", "nb.e")} / (q.nrm * nb.nrm), 6) AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY c.query_id
        |      ORDER BY ROUND(${duckDot("q.e", "nb.e")} / (q.nrm * nb.nrm), 6) DESC,
        |               c.neighbor_id) AS rn2
        |  FROM candtop c
        |  JOIN n q ON q.vec_id = c.query_id
        |  JOIN n nb ON nb.vec_id = c.neighbor_id)
        |WHERE rn2 <= 3""".stripMargin),

    "mm01_multimodal_meta" ->
      """SELECT doc_id,
        |  'fake/' || source AS format,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  100 + ascii(text) % 64 AS width,
        |  100 + ascii(substr(text, 2, 1)) % 64 AS height,
        |  3 AS channels,
        |  CAST(floor(length(text) / 100.0) AS INTEGER) AS frames,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin,

    "mm02_frame_sample" ->
      """SELECT doc_id, frames, CAST(f AS INTEGER) AS frame_idx
        |FROM (
        |  SELECT doc_id, CAST(floor(length(text) / 100) AS INTEGER) AS frames
        |  FROM documents), UNNEST(range(0, frames, 4)) AS t(f)
        |WHERE frames > 0""".stripMargin,

    "dd09_semantic_dedup" ->
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, e, sqrt(${duckDot("e", "e")}) AS nrm FROM v),
         |cent AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
         |    e AS centv, nrm AS centn
         |  FROM (SELECT * FROM n ORDER BY vec_id LIMIT 8)),
         |assigned AS (
         |  SELECT vec_id, cv, cn, cell FROM (
         |    SELECT c.vec_id, c.e AS cv, c.nrm AS cn, t.cell,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY ROUND(${duckDot("c.e", "t.centv")} / (c.nrm * t.centn), 6) DESC,
         |                 t.cell) AS rn
         |    FROM n c CROSS JOIN cent t)
         |  WHERE rn = 1),
         |dups AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ROUND(${duckDot("a.cv", "b.cv")} / (a.cn * b.cn), 6) >= 0.35)
         |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
         |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id""".stripMargin,

    "t13_normalized_dedup" ->
      """SELECT doc_id, norm_hash,
        |  doc_id = MIN(doc_id) OVER (PARTITION BY norm_hash) AS keep
        |FROM (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash
        |  FROM documents)""".stripMargin,

    "t14_group_sample" ->
      """SELECT doc_id, source, CAST(rn AS INTEGER) AS sample_rank
        |FROM (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':t14'), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5""".stripMargin,

    "t15_top_terms" ->
      """SELECT term, CAST(COUNT(*) AS BIGINT) AS term_count,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |FROM (
        |  SELECT doc_id, t.term
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(term))
        |WHERE len(term) > 0
        |GROUP BY term
        |ORDER BY term_count DESC, term ASC
        |LIMIT 20""".stripMargin,

    "t16_quality_buckets" ->
      s"""WITH m AS (
         |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks,
         |    length(text) AS n_chars_txt
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, w -> w IN ($stopList))) AS DOUBLE) / len(toks) AS sw,
         |    CAST(n_chars_txt - (len(toks) - 1) AS DOUBLE) / len(toks) AS mwl,
         |    LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS sat
         |  FROM m),
         |scored AS (
         |  SELECT doc_id, lang,
         |    ROUND(LEAST(1.0, 0.3 * LEAST(sw * 10.0, 1.0)
         |      + 0.4 * LEAST(mwl / 8.0, 1.0) + 0.3 * sat), 6) AS quality_score
         |  FROM r)
         |SELECT doc_id, lang, quality_score,
         |  CAST(NTILE(10) OVER (PARTITION BY lang
         |    ORDER BY quality_score DESC, doc_id ASC) AS INTEGER) AS decile,
         |  (NTILE(10) OVER (PARTITION BY lang
         |    ORDER BY quality_score DESC, doc_id ASC)) <= 5 AS keep_top_half
         |FROM scored""".stripMargin,

    "t18_quality_percentiles" ->
      s"""WITH m AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         |    length(text) AS n_chars_txt
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(toks, w -> w IN ($stopList))) AS DOUBLE) / len(toks) AS sw,
         |    CAST(n_chars_txt - (len(toks) - 1) AS DOUBLE) / len(toks) AS mwl,
         |    LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS sat
         |  FROM m),
         |scored AS (
         |  SELECT doc_id, lang,
         |    ROUND(LEAST(1.0, 0.3 * LEAST(sw * 10.0, 1.0)
         |      + 0.4 * LEAST(mwl / 8.0, 1.0) + 0.3 * sat), 6) AS quality_score
         |  FROM r)
         |SELECT doc_id, lang, quality_score,
         |  ROUND(PERCENT_RANK() OVER (PARTITION BY lang
         |    ORDER BY quality_score ASC, doc_id ASC), 6) AS pct_rank,
         |  ROUND(CUME_DIST() OVER (PARTITION BY lang
         |    ORDER BY quality_score ASC, doc_id ASC), 6) AS cume
         |FROM scored""".stripMargin,

    "t17_hash_embedding" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
         |  FROM documents)
         |SELECT doc_id,
         |  array_to_string(list_transform(range(0, 8), i ->
         |    CAST(len(list_filter(tk, t -> (${duckHash("t")}) % 8 = i)) AS VARCHAR)),
         |    '_') AS embedding_sig,
         |  CAST(len(tk) AS BIGINT) AS n_tokens
         |FROM toks""".stripMargin,

    // t26: the bucket counts and the integer dot product are derived
    // independently (token → polyHash % 64 → per-bucket counts →
    // Σ c_j·w_j in exact BIGINT); only the final logit division is
    // FP, with exact operands on both sides.
    "t26_hash_classifier" ->
      s"""WITH tok AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
         |    FROM documents)
         |  WHERE len(w) > 0),
         |b AS (
         |  SELECT doc_id, (${duckHash("w")}) % 64 AS j FROM tok),
         |agg AS (
         |  SELECT doc_id, j, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM b GROUP BY doc_id, j),
         |d0 AS (
         |  SELECT doc_id,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(c * ((j * 2654435761) % 1000003 - 500000)) AS BIGINT) AS dot
         |  FROM agg GROUP BY doc_id)
         |SELECT doc.doc_id,
         |  CAST(COALESCE(d0.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CASE WHEN COALESCE(d0.n_tokens, 0) > 0
         |    THEN round(CAST(d0.dot AS DOUBLE) * 4.0 / (1000003.0 * d0.n_tokens), 6)
         |    ELSE 0.0 END AS quality_logit,
         |  COALESCE(d0.dot, 0) > 0 AS keep
         |FROM documents doc LEFT JOIN d0 ON doc.doc_id = d0.doc_id""".stripMargin
  )
}

package graft

import org.apache.spark.sql.functions._

/** `SparkUtil.withPinnedSession`'s two contract clauses, plus the
  * end-to-end scenarios they exist for. Both were real defects:
  *
  *  - the r13 concurrency soak caught the STALE RELATION CACHE class
  *    live (a compact swap through another session left the memoized
  *    pinned session's cached file listing pointing at deleted files;
  *    an insertInto through the stale relation writes to a dropped
  *    incarnation's location) — the refresh used to be a per-call-site
  *    convention, now the helper refreshes the declared tables itself;
  *  - the r13 advisor flagged the CROSS-DATABASE class (the pinned
  *    session sits at currentDatabase=default forever, so a bare name
  *    from a caller running under `USE db` writes into `default` and
  *    the caller's follow-up DROP/RENAME destroys the real table) —
  *    now the helper hands the body caller-qualified names.
  */
class PinnedSessionSpec extends SparkSpec {

  private val db = "graft_pin_db"

  private def withDb[A](body: => A): A = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"USE $db")
    try body finally spark.sql("USE default")
  }

  test("contract 1: declared tables are served fresh listings after " +
      "a drop/recreate through another session") {
    val t = s"pin_fresh_${System.nanoTime()}"
    spark.range(5).toDF("id").write.saveAsTable(t)
    val c1 = SparkUtil.withPinnedSession(spark, Map.empty, Seq(t))(
      (s, names) => s.table(names.head).count())
    assert(c1 === 5)
    // swap the table's files out from under the (memoized, now warm)
    // pinned session — the exact shape of an LSH/ANN compact swap
    spark.sql(s"DROP TABLE $t")
    spark.range(7).toDF("id").write.saveAsTable(t)
    // without the entry refresh this either fails on deleted files or
    // serves the stale listing; the contract says: fresh, every call
    val c2 = SparkUtil.withPinnedSession(spark, Map.empty, Seq(t))(
      (s, names) => s.table(names.head).count())
    assert(c2 === 7, "pinned session served a stale relation")
    spark.sql(s"DROP TABLE $t")
  }

  test("contract 2: bare names resolve against the CALLER's current " +
      "database, and writes land there") {
    val t = s"pin_xdb_${System.nanoTime()}"
    // same bare name in BOTH databases, different contents — a
    // misresolved read or write picks the wrong one loudly
    spark.range(9).toDF("id").write.saveAsTable(s"default.$t")
    withDb {
      spark.range(3).toDF("id").write.saveAsTable(t)
      val (qname, cnt) = SparkUtil.withPinnedSession(
        spark, Map.empty, Seq(t)) { (s, names) =>
        (names.head, s.table(names.head).count())
      }
      assert(qname === s"$db.$t")
      assert(cnt === 3,
        "pinned body read default.* for a bare name meant under USE db")
      // a write through the qualified name must hit the caller's db
      SparkUtil.withPinnedSession(spark, Map.empty, Seq(t)) {
        (s, names) =>
          s.range(3, 5).toDF("id").write.mode("append")
            .insertInto(names.head)
      }
      assert(spark.table(t).count() === 5)
    }
    assert(spark.table(s"default.$t").count() === 9,
      "the pinned write leaked into default")
    spark.sql(s"DROP TABLE default.$t")
    spark.sql(s"DROP TABLE $db.$t")
  }

  test("IncrementalLsh.compact under a non-default current database " +
      "keeps the index (no default.* stage, no lost swap)") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark shuffles and joins"),
      (3L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    withDb {
      val t = s"lsh_xdb_${System.nanoTime()}"
      // two appends so compact has files to fold
      llmdata.IncrementalLsh.indexBatch(spark, t,
        docs.filter(col("doc_id") < 2))
      llmdata.IncrementalLsh.indexBatch(spark, t,
        docs.filter(col("doc_id") >= 2))
      val rowsBefore = spark.table(t).count()
      assert(rowsBefore > 0)
      // pre-contract: the stage saveAsTable ran in the pinned
      // session's default db, the caller's RENAME then failed and the
      // DROP had already destroyed the real index
      llmdata.IncrementalLsh.compact(spark, t)
      assert(spark.catalog.tableExists(s"$db.$t"),
        "compact lost the index under USE db")
      assert(spark.table(t).count() === rowsBefore)
      assert(!spark.catalog.tableExists(s"default.$t") &&
        !spark.catalog.tableExists(s"default.${t}_compacting"),
        "compact staged into the default database")
      // the compacted index still serves probes: a new near-dup of
      // doc 0 must pair with the indexed family
      val probe = Seq(
        (9L, "the quick brown fox jumps over the lazy dog again and again"))
        .toDF("doc_id", "text")
      val pairs = llmdata.IncrementalLsh.indexBatch(spark, t, probe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 9L)),
        s"compacted cross-db index lost its probe path: $pairs")
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("AnnIndex build/append/compact/search under a non-default " +
      "current database matches the one-shot build") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    def results(t: String) =
      llmdata.AnnIndex.search(spark, t, queries, "vec_id", "embedding",
          k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSet
    withDb {
      val t = s"ann_xdb_${System.nanoTime()}"
      val tFull = s"ann_xdb_full_${System.nanoTime()}"
      val half = emb.filter(col("vec_id") % 2 === 0)
      val rest = emb.filter(col("vec_id") % 2 =!= 0)
      // one frozen quantizer for BOTH indexes — the lifecycle under
      // test is the catalog/session plumbing, not param derivation
      val cents = llmdata.Similarity.trainCentroids(
        emb, "vec_id", "embedding", nlist = 16, iters = 1)
      val books = llmdata.Similarity.trainPqCodebooks(
        llmdata.Similarity.ivfResiduals(emb, "vec_id", "embedding", cents),
        "vec_id", "rv", m = 4, k = 16, iters = 1)
      llmdata.AnnIndex.build(spark, t, half, "vec_id", "embedding",
        nlist = 16, m = 4, kCodes = 16,
        centroids = Some(cents), codebooks = Some(books))
      llmdata.AnnIndex.append(spark, t, rest, "vec_id", "embedding")
      // compact's per-cell dynamic overwrite runs through the pinned
      // session — pre-contract its insertInto resolved the bare name
      // in default (wrong db, wrong location)
      llmdata.AnnIndex.compact(spark, t)
      llmdata.AnnIndex.build(spark, tFull, emb, "vec_id", "embedding",
        nlist = 16, m = 4, kCodes = 16,
        centroids = Some(cents), codebooks = Some(books))
      assert(results(t) === results(tFull))
      assert(results(t).nonEmpty)
      assert(!spark.catalog.tableExists(s"default.$t"),
        "ANN lifecycle leaked a table into default")
      spark.sql(s"DROP TABLE $t"); spark.sql(s"DROP TABLE ${t}_params")
      spark.sql(s"DROP TABLE $tFull")
      spark.sql(s"DROP TABLE ${tFull}_params")
    }
  }

  test("contract 3: names that need backtick quoting survive " +
      "qualification (parse -> re-parse round trip)") {
    // parseTableIdentifier STRIPS the caller's backticks; bare
    // re-concatenation would hand refreshTable/s.table an unparseable
    // (or different) name. Quoting must come back for any non-plain
    // identifier part. The built-in SessionCatalog's validateName only
    // admits [a-zA-Z0-9_], so the reachable shape HERE is a
    // digit-leading name (lexes as number+identifier when bare);
    // spaces/dashes are the same class through permissive catalogs.
    val t = s"7pin_${System.nanoTime()}"
    val quoted = s"`$t`"
    spark.range(4).toDF("id").write.saveAsTable(quoted)
    try {
      val (qname, cnt) = SparkUtil.withPinnedSession(
        spark, Map.empty, Seq(quoted)) { (s, names) =>
        (names.head, s.table(names.head).count())
      }
      assert(qname === s"default.`$t`")
      assert(cnt === 4)
      // plain identifiers keep the unquoted db.table form (memo-key
      // and log readability — and every existing call site's shape)
      assert(SparkUtil.qualifiedName(spark, "plain_name")
        === "default.plain_name")
    } finally spark.sql(s"DROP TABLE IF EXISTS $quoted")
  }
}

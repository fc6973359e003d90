package graft.llmdata

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Build-once persisted IVF-PQ (IVFADC) index — the operational form
  * of [[Similarity.ivfPqTopK]]. The inline form re-derives centroids,
  * trains codebooks, and re-encodes the whole corpus on EVERY call;
  * at 100 TB the encode is a batch job you run once (and refresh on
  * ingest cadence), while queries should touch only the compressed
  * codes of the cells they probe. This object splits the two:
  *
  *  - [[build]]: one corpus scan → (neighbor_id, cell, codes),
  *    persisted as a parquet table PARTITIONED BY cell, plus a tiny
  *    `<table>_params` sidecar table holding the centroids, the PQ
  *    codebooks, and the residual flag (the quantizer state —
  *    the analogue of `IncrementalLsh`'s persisted band index, and of
  *    a FAISS index file's header).
  *  - [[search]]: loads the params (≤ nlist + m·k tiny rows), computes
  *    each query's probed cells QUERY-SIDE ONLY (a |Q|×nlist broadcast
  *    expansion — no corpus work), statically prunes the index scan to
  *    those cell partitions, and runs the identical
  *    [[Similarity.ivfPqSearch]] plan over the stored codes.
  *
  * Scale shape: the index table stores O(corpus · m) code bytes, the
  * partition layout makes "read nprobe/nlist of the corpus" literal
  * file pruning (the probed-cell id list is collected driver-side —
  * bounded by nlist, never by |corpus|), and the quantizer never
  * retrains at query time. Search results are bit-identical to the
  * inline `ivfPqTopK` (AnnIndexSpec proves it): encode is
  * deterministic and codes are exact ints, so the persisted round-trip
  * introduces no float drift.
  *
  * Reference anchor: the reference has no vector path at all; this is
  * the Jégou et al. 2011 §IV layout (same citation as
  * [[Similarity.ivfPqTopK]]) given a table-backed lifecycle.
  */
object AnnIndex {

  private def paramsTable(table: String) = s"${table}_params"

  /** Memo key for [[paramsCache]]/[[pathCache]]/[[healLocks]]: the
    * catalog-qualified lowercase identifier, NOT the raw name string —
    * two same-bare-name tables in different current databases must
    * never share a memoized quantizer, location, or heal lock.
    * Resolution is parse + session-state currentDatabase, both
    * in-memory — the fast paths stay RPC-free. */
  private def memoKey(spark: SparkSession, table: String): String = {
    val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val db = id.database.getOrElse(
      spark.sessionState.catalog.getCurrentDatabase)
    s"$db.${id.table}".toLowerCase(java.util.Locale.ROOT)
  }

  private val paramsSchema = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Encode the corpus once and persist index + quantizer params.
    * Overwrites any previous build of `table` (the rebuild/refresh
    * path). Centroids/codebooks default to the same deterministic
    * derivations as [[Similarity.ivfPqTopK]] — pass
    * [[Similarity.trainCentroids]] / [[Similarity.trainPqCodebooks]]
    * output for the data-shaped production variant; search is
    * identical either way.
    *
    * The encoded frame is repartitioned by cell before the write so
    * each task writes only its own cells (one file set per cell, not
    * one per task×cell). That shuffle moves the CODES (m ints + two
    * scalars per vector), never the vectors — at 100 TB it is ~1% of
    * corpus bytes, paid once per build.
    */
  def build(spark: SparkSession, table: String, corpus: DataFrame,
            idCol: String, vecCol: String, nlist: Int = 16, m: Int = 4,
            kCodes: Int = 16, residual: Boolean = true,
            centroids: Option[Seq[Array[Float]]] = None,
            codebooks: Option[Seq[Seq[Array[Float]]]] = None): Unit = {
    // bootstrap path (no caller-supplied quantizer): ONE head collect
    // derives centroids + codebook seeds driver-side — bit-identical
    // to the ivfCentroids/deriveIvfPqCodebooks pair but three fewer
    // driver-sequential jobs (Similarity.deriveIvfQuantizer)
    val (cents, books) = (centroids, codebooks) match {
      case (None, None) =>
        Similarity.deriveIvfQuantizer(corpus, idCol, vecCol, nlist, m,
          kCodes, residual)
      case _ =>
        val cs = centroids.getOrElse(
          Similarity.ivfCentroids(corpus, idCol, vecCol, nlist))
        (cs, codebooks.getOrElse(Similarity.deriveIvfPqCodebooks(
          corpus, idCol, vecCol, cs, m, kCodes, residual)))
    }
    // clean slate FIRST when a same-name incarnation exists: a crashed
    // predecessor's compact marker/stage live beside the table
    // directory and survive DROP TABLE; left in place until the end of
    // build, a crash anywhere inside build would hand the next
    // search/append a marker + complete stage and recoverCompacting
    // would replay the PREDECESSOR's staged codes over the fresh cells
    // (possibly under a different quantizer). Deleting before any
    // write bounds that to the one arm below.
    //
    // The whole mutation section holds the table's heal lock: in-JVM
    // searches (loadParams) and heals serialize against the rebuild
    // instead of interleaving with its drop→overwrite→rewrite→evict
    // steps — a search admitted mid-rebuild could memoize the
    // predecessor quantizer against the fresh codes. Blocking them
    // until the rebuild completes is the correct behavior; CROSS-
    // process racers are covered by the fail-loud ordering below.
    //
    // SERVE-DURING-REBUILD IS DELIBERATELY NOT OFFERED (the documented
    // contract, weighed in r15): the FAISS-style double buffer — build
    // into a versioned params/codes pair, flip a pointer — would let
    // searches serve the predecessor until the flip, but it threads a
    // version through every crash invariant this file argues (the
    // marker/stage paths, the params-less mid-build guard,
    // recoverCompacting's refusal rule, the memo eviction points),
    // each of which currently holds precisely because ONE table name
    // means one incarnation. A deployment that needs zero-downtime
    // rebuilds gets it at the layer above with no new invariants:
    // build under a NEW table name, then swap names in the caller
    // (the LSH compact swap pattern) — same-name rebuild blocks, by
    // contract.
    healLock(memoKey(spark, table)).synchronized {
    if (spark.catalog.tableExists(table)) {
      val (stage0, marker0, fs0) = compactPaths(spark, table, refresh = true)
      fs0.delete(marker0, false)
      fs0.delete(stage0, true)
    }
    // the params sidecar is dropped BEFORE the index overwrite, not
    // just rewritten after it: on a REBUILD, a crash between the two
    // writes would otherwise leave fresh codes beside the PREDECESSOR
    // quantizer's sidecar — no marker, no missing table, nothing to
    // refuse — and search would decode the new codes with the old
    // centroids/codebooks, silently wrong. With the drop first, every
    // crash inside the rebuild window leaves a params-less index, the
    // exact state the recoverCompacting/search guard fails LOUD on
    // (rerun build repairs it).
    if (spark.catalog.tableExists(paramsTable(table))) {
      spark.sql(s"DROP TABLE ${paramsTable(table)}")
      paramsCache.remove(memoKey(spark, table))
    }
    Similarity.ivfPqEncode(corpus, idCol, vecCol, cents, books, residual)
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy("cell").saveAsTable(table)
    // …and again IMMEDIATELY after the index write, for the
    // first-build-after-DROP case where no table existed to resolve
    // the paths from: the leftovers sit beside the location this
    // write just created. Doing it before the params job keeps the
    // unprotected window to the index write itself. A crash BEFORE
    // the write completes leaves no table for a heal to corrupt
    // (recoverCompacting no-ops on a missing table); a crash AFTER
    // it but before this sweep leaves a live table beside the
    // predecessor's marker/stage — that instant is covered by
    // recoverCompacting's params-sidecar guard (a table without
    // params is mid-build by construction — the pre-overwrite params
    // drop above makes that true for REBUILDS too, not just first
    // builds — so it refuses the heal and names the repair). Either
    // way: rerun build.
    val (stage, marker, fs) = compactPaths(spark, table, refresh = true)
    fs.delete(marker, false)
    fs.delete(stage, true)
    val rows =
      Row("meta", if (residual) 1 else 0, 0, Seq.empty[Float]) +:
      (cents.zipWithIndex.map { case (v, i) =>
        Row("cent", i, 0, v.toSeq)
      } ++
      books.zipWithIndex.flatMap { case (book, mi) =>
        book.zipWithIndex.map { case (c, j) => Row("book", mi, j, c.toSeq) }
      })
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), paramsSchema)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(paramsTable(table))
    // write-through refresh: a rebuild (or drop-and-recreate under
    // the same name) must never be served its predecessor's memoized
    // quantizer (the location memo was refreshed at the clean-slate
    // delete above)
    paramsCache.remove(memoKey(spark, table))
    }
    ()
  }

  /** Memoized quantizer params per [[memoKey]]. The quantizer is
    * FROZEN for the index lifecycle — that is [[append]]'s entire
    * correctness argument — and only [[build]] writes the sidecar, so
    * the memo is evicted exactly there (and via [[dropCaches]]).
    * Without it every search/append paid a small params-table read
    * job on the serving path. */
  private val paramsCache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[Array[Float]], Seq[Seq[Array[Float]]], Boolean)]

  /** (centroids, codebooks, residual) from the params sidecar — a
    * bounded collect (nlist + m·k + 1 rows), memoized per table
    * (see [[paramsCache]]). Under the table's heal lock: a bare
    * getOrElseUpdate could read the OLD sidecar, lose the CPU to a
    * COMPLETE same-JVM rebuild (drop → overwrite → rewrite → evict),
    * then install the predecessor quantizer into the freshly-evicted
    * slot — every later search decodes new codes with old
    * centroids, the exact silent-wrong-neighbor state build's
    * drop-before-overwrite ordering exists to kill, reintroduced by
    * the memo. The lock serializes the load against [[build]]'s
    * mutation section and the heals (which already hold it);
    * reentrant from recoverCompacting's own locked scope. */
  private[llmdata] def loadParams(spark: SparkSession, table: String)
      : (Seq[Array[Float]], Seq[Seq[Array[Float]]], Boolean) = {
    val key = memoKey(spark, table)
    healLock(key).synchronized {
      paramsCache.getOrElseUpdate(key, loadParamsUncached(spark, table))
    }
  }

  private def loadParamsUncached(spark: SparkSession, table: String)
      : (Seq[Array[Float]], Seq[Seq[Array[Float]]], Boolean) = {
    // one catalog existence probe per memo MISS (not per search) buys
    // the named repair: a params-less index is a torn build/REBUILD —
    // build drops the sidecar before its index overwrite precisely so
    // every crash in that window parks here instead of silently
    // decoding fresh codes with the predecessor's quantizer
    if (!spark.catalog.tableExists(paramsTable(table)))
      throw new IllegalStateException(
        s"ANN index $table has no params sidecar " +
          s"(${paramsTable(table)}) — a build or rebuild is mid-flight " +
          "or crashed between its sidecar drop and rewrite. " +
          "Rerun AnnIndex.build.")
    val rows = spark.table(paramsTable(table)).collect()
    def vec(r: Row): Array[Float] = r.getSeq[Float](3).toArray
    val residual = rows.find(_.getString(0) == "meta")
      .exists(_.getInt(1) == 1)
    val cents = rows.filter(_.getString(0) == "cent")
      .sortBy(_.getInt(1)).map(vec).toSeq
    val books = rows.filter(_.getString(0) == "book")
      .groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_.getInt(2)).map(vec).toSeq }
    require(cents.nonEmpty && books.nonEmpty,
      s"ANN index params table ${paramsTable(table)} is empty or missing")
    (cents, books, residual)
  }

  /** Incrementally index a batch of NEW vectors: encode them with the
    * STORED quantizer (centroids + codebooks are frozen at build time
    * — retraining per batch would silently shift every previously
    * stored code's meaning) and append the codes to the cell
    * partitions they land in. This is how a production vector index
    * grows between rebuilds: O(batch) encode + append per ingest
    * cycle, with a periodic [[build]] re-run when the data
    * distribution drifts far enough from the trained quantizer
    * (the FAISS add-vs-train split, and the `IncrementalLsh`
    * append-only contract applied to vectors).
    *
    * Batches are expected id-disjoint from the indexed corpus (feed
    * from an exactly-once deduped source); an id indexed twice would
    * surface twice in candidate lists. Unlike the LSH index there is
    * no in-batch pair emission, so a replayed append's damage is
    * duplicate candidates, not corrupted output — rerank/top-k
    * dedups by neighbor_id rank deterministically. */
  def append(spark: SparkSession, table: String, batch: DataFrame,
             idCol: String, vecCol: String): Unit = {
    recoverCompacting(spark, table) // heal a torn compact overwrite
    val (cents, books, residual) = loadParams(spark, table)
    Similarity.ivfPqEncode(batch, idCol, vecCol, cents, books, residual)
      .repartition(col("cell"))
      .write.mode(SaveMode.Append).format("parquet")
      .partitionBy("cell").saveAsTable(table)
  }

  private type CompactPaths = (org.apache.hadoop.fs.Path,
    org.apache.hadoop.fs.Path, org.apache.hadoop.fs.FileSystem)

  /** Memoized [[compactPaths]] per [[memoKey]]. The table's storage
    * location is immutable for the index lifecycle (only [[build]]
    * creates the table, and it refreshes this entry write-through),
    * but resolving it costs a catalog metadata lookup — a metastore
    * RPC in a shared-catalog deployment — which [[recoverCompacting]]
    * was paying on EVERY search/append just to reach a cheap
    * `fs.exists`. The cache keeps the no-crash fast path at one
    * filesystem probe. Staleness is defensively bounded rather than
    * trusted: whenever the cached marker path EXISTS (the rare
    * heal/fail-loud arm), the paths are re-resolved fresh before any
    * action, so a stale entry can at worst cost one extra resolution,
    * never a wrong heal (the marker itself is only ever created by
    * [[compact]], which also refreshes the entry). Entries for
    * dropped per-run indexes are removed via [[dropCaches]] — the
    * IncrementalLsh cache-lifecycle contract. */
  private val pathCache =
    scala.collection.concurrent.TrieMap.empty[String, CompactPaths]

  /** The table's storage location plus the two fixed sibling paths a
    * [[compact]] run uses: the staged compacted copy and the durable
    * in-progress marker that makes its overwrite crash-healable.
    * Served from [[pathCache]]; `refresh = true` forces a fresh
    * catalog resolution and writes it through (what [[build]] and
    * [[compact]] do, so a drop-and-recreate under the same name can
    * never be served its predecessor's paths). */
  private[graft] def compactPaths(spark: SparkSession, table: String,
                                    refresh: Boolean = false)
      : CompactPaths = {
    def resolve: CompactPaths = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
      val stage = new org.apache.hadoop.fs.Path(
        loc.getParent, loc.getName + "_compact_stage")
      val marker = new org.apache.hadoop.fs.Path(
        loc.getParent, loc.getName + "_compacting")
      (stage, marker, loc.getFileSystem(spark.sessionState.newHadoopConf()))
    }
    val key = memoKey(spark, table)
    if (refresh) { val p = resolve; pathCache.put(key, p); p }
    else pathCache.getOrElseUpdate(key, resolve)
  }

  /** Drop this JVM's memoized state for `table` (paths, params). For
    * long-lived drivers that create nanoTime-named per-run indexes —
    * without eviction the memos accrete one entry per run forever
    * (the IncrementalLsh.dropCaches contract). Never required for
    * correctness: [[build]] refreshes write-through, and the heal
    * path re-resolves before acting. */
  def dropCaches(spark: SparkSession, table: String): Unit = {
    val key = memoKey(spark, table)
    pathCache.remove(key)
    paramsCache.remove(key)
    ()
  }

  /** Per-table monitor serializing every marker-bracketed overwrite in
    * this JVM — [[compact]]'s own window AND [[recoverCompacting]]'s
    * redo. Without it a [[search]] (which heals on read) racing a live
    * compact would observe the in-progress marker and launch a
    * DUPLICATE dynamic-partition overwrite concurrently with the
    * writer's — two uncoordinated overwrites of the same partitions.
    * The lock closes that for the single-process deployment this
    * engine targets (one driver owns reads, appends, and
    * maintenance); in a multi-process layout, readers in other JVMs
    * must not share the warehouse with a live compact — the same
    * single-maintenance-writer contract the store backends carry. */
  private val healLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def healLock(key: String): Object =
    healLocks.getOrElseUpdate(key, new Object)

  /** Replay the staged compacted copy over the live table, one
    * dynamic-partition overwrite per occupied cell. The DYNAMIC
    * overwrite mode is pinned in the memoized ISOLATED session
    * ([[graft.SparkUtil.withPinnedSession]]: own SQL conf, shared
    * SparkContext/catalog, one allocation per context — the
    * IncrementalLsh.withBucketedScan discipline), not in a flip of
    * the caller's session-global conf around the rewrite: a flip
    * there would switch overwrite semantics under any INSERT
    * OVERWRITE the caller's session plans concurrently, and two
    * tables' compacts or heals racing the save/restore (the heal
    * lock is per TABLE) could leave the conf permanently dynamic.
    * The relation-cache refresh and the cross-database name
    * resolution are the helper's CONTRACT (it refreshes the declared
    * table on entry and hands back its caller-qualified name); the
    * caller's session only refreshes its own relation cache
    * afterwards. */
  private def overwriteFromStage(spark: SparkSession, table: String,
                                 stage: org.apache.hadoop.fs.Path): Unit = {
    graft.SparkUtil.withPinnedSession(spark,
      Map("spark.sql.sources.partitionOverwriteMode" -> "dynamic"),
      Seq(table)) { (s, names) =>
      val t = names.head
      s.read.format("parquet").load(stage.toString)
        .select(s.table(t).columns.toIndexedSeq.map(col): _*) // insertInto is positional
        .write.mode(SaveMode.Overwrite).insertInto(t)
    }
    spark.catalog.refreshTable(table)
  }

  /** Our own stage-completeness sentinel, written by [[compact]] after
    * the stage write returns — NOT Hadoop's `_SUCCESS`, which a
    * deployment can disable (`mapreduce.fileoutputcommitter
    * .marksuccessfuljobs=false` is common on object stores); relying
    * on it would turn every genuine crash-heal there into a false
    * fail-loud demanding an O(corpus) rebuild. */
  private[graft] val StageComplete = "_GRAFT_STAGE_COMPLETE"

  /** Heal a [[compact]] whose dynamic-partition overwrite was torn by
    * a crash. The marker is written only AFTER the staged copy is
    * complete (own [[StageComplete]] sentinel present), so a surviving
    * marker means the stage holds every occupied cell as of stage time
    * and the redo — the same idempotent per-cell overwrite — restores
    * them all; a marker without a complete stage cannot arise from
    * this lifecycle, so it fails loud (external damage: rerun
    * [[build]]) rather than let [[search]] serve a silently truncated
    * index. [[append]], [[search]], and [[compact]] all begin here, so
    * the heal happens on the next batch/query, not on an operator's
    * schedule. Returns true when a redo ran. */
  def recoverCompacting(spark: SparkSession, table: String): Boolean = {
    // fast path — the overwhelmingly common no-crash case: one
    // filesystem exists() against the memoized marker path, no
    // catalog RPC, no lock. A cache MISS still consults the catalog
    // once (and seeds the memo); a cache hit for a since-dropped
    // table answers false exactly as the tableExists probe would
    // (the marker can only exist while its compact's table does).
    val key = memoKey(spark, table)
    val (marker0, fs0) = pathCache.get(key) match {
      case Some((_, m, f)) => (m, f)
      case None =>
        if (!spark.catalog.tableExists(table)) return false
        val (_, m, f) = compactPaths(spark, table)
        (m, f)
    }
    if (!fs0.exists(marker0)) return false
    // rare arm (a marker is visible): re-resolve FRESH before acting,
    // so a stale memo can never direct a heal at the wrong location —
    // staleness costs one extra resolution here, never correctness
    if (!spark.catalog.tableExists(table)) {
      dropCaches(spark, table); return false
    }
    val (stage, marker, fs) = compactPaths(spark, table, refresh = true)
    if (!fs.exists(marker)) false // the leftover belonged to a dead path
    else healLock(key).synchronized {
      // transition: a stage staged by the pre-sentinel code proves
      // completeness with Hadoop's _SUCCESS only — still healable
      def complete = fs.exists(
        new org.apache.hadoop.fs.Path(stage, StageComplete)) ||
        fs.exists(new org.apache.hadoop.fs.Path(stage, "_SUCCESS"))
      if (!fs.exists(marker)) false // another caller healed while we waited
      // an index table WITHOUT its params sidecar is mid-build by
      // construction (build writes params last), so a marker beside
      // it belongs to the torn build's PREDECESSOR — the one window
      // build's two clean-slate sweeps cannot cover (a crash between
      // the first-build-after-DROP index write and its sweep).
      // Replaying that stage would graft predecessor codes (possibly
      // under a different quantizer) onto the fresh cells; refuse and
      // name the repair instead
      else if (!spark.catalog.tableExists(paramsTable(table)))
        throw new IllegalStateException(
          s"ANN index $table has a compaction marker ($marker) but no " +
            s"params sidecar (${paramsTable(table)}) — the table is " +
            "mid-build and the marker/stage are its predecessor's; " +
            "healing would replay stale codes. Rerun AnnIndex.build.")
      else if (complete) {
        overwriteFromStage(spark, table, stage)
        fs.delete(marker, false)
        fs.delete(stage, true)
        true
      } else throw new IllegalStateException(
        s"ANN index $table has a compaction marker ($marker) but no " +
          s"complete staged copy ($stage) — the index may have lost cell " +
          "partitions; rerun AnnIndex.build to restore it")
    }
  }

  /** Cell-layout-preserving compaction of the index table. Every
    * [[append]] adds one file set per cell partition it touches; at
    * streaming cadence the probed-cell reads degrade into hundreds of
    * tiny files per cell. This rewrites the table to ~one file per
    * occupied cell, keeping the `partitionBy("cell")` layout
    * [[search]]'s partition pruning relies on. The params sidecar is
    * its own table and is untouched.
    *
    * Unlike [[IncrementalLsh.compact]]'s drop-and-rename swap (fine
    * for its UNPARTITIONED bucketed table), a partitioned catalog
    * table cannot be renamed safely — the catalog keeps per-PARTITION
    * locations that the rename does not rewrite, leaving scans
    * chasing the old path. So: stage the compacted copy under a plain
    * stage DIRECTORY beside the table (no catalog entry), then
    * dynamic-partition-OVERWRITE it back into the original table —
    * each occupied cell partition is replaced by its single compacted
    * file, the catalog is never touched.
    *
    * The overwrite is not atomic, so it is bracketed by a durable
    * `<table>_compacting` marker written only after the stage is
    * complete: a crash before the marker leaves the table untouched
    * (the stage is garbage the next run clears); a crash during or
    * after the overwrite leaves the marker, and the next [[append]] /
    * [[search]] / [[compact]] redoes the overwrite from the surviving
    * stage via [[recoverCompacting]] — the IncrementalLsh
    * recoverCompacting contract, shaped for a partitioned table. Run
    * from the single maintenance writer (EmbeddingIngest's
    * foreachBatch cadence qualifies); cost is O(index) per run,
    * appends stay O(batch). */
  def compact(spark: SparkSession, table: String): Unit = {
    require(spark.catalog.tableExists(table),
      s"no ANN index table $table to compact")
    recoverCompacting(spark, table) // finish a torn predecessor first
    // fresh resolution (write-through): the marker this run creates
    // must land beside the table's CURRENT location — compact is the
    // only marker writer, so this also keeps the memo exact for every
    // fast-path probe that follows. One RPC per compact is noise
    // against its O(index) rewrite.
    val (stage, marker, fs) = compactPaths(spark, table, refresh = true)
    // orphan from a pre-marker crash: garbage — cleared BEFORE the
    // empty-table return so a truncated/never-recompacted index cannot
    // strand a full stale copy of itself beside the table forever
    fs.delete(stage, true)
    // emptiness from catalog partition metadata, not a scan job: a
    // cell partition exists iff a write put rows in it (parquet never
    // creates empty partition dirs, dynamic overwrite never leaves
    // them), so zero partitions ⇔ zero rows for this lifecycle
    if (occupiedCells(spark, table) == 0) return // nothing to lay out
    spark.table(table).repartition(col("cell"))
      .write.format("parquet").partitionBy("cell")
      .mode(SaveMode.Overwrite).save(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, StageComplete), true)
      .close() // own completeness proof — see StageComplete
    healLock(memoKey(spark, table)).synchronized {
      // the marker window: a concurrent search's heal-on-read must
      // either run before the marker exists (no-op) or after this
      // block (marker gone) — never a duplicate overwrite mid-window
      fs.create(marker, true).close() // durable intent: overwrite begins
      overwriteFromStage(spark, table, stage)
      fs.delete(marker, false)
      fs.delete(stage, true)
    }
    ()
  }

  /** Occupied-cell count from catalog partition metadata — the
    * maintenance trigger's floor: post-compaction file count ≈
    * occupied cells, so a cadence that fires on
    * `files > occupiedCells + threshold` self-resets at any index
    * size (a bare file-count trigger stops resetting once the cell
    * count alone exceeds it). */
  def occupiedCells(spark: SparkSession, table: String): Int =
    spark.sql(s"SHOW PARTITIONS $table").count().toInt

  /** Top-k IVFADC search against the persisted index. The probed-cell
    * set is computed from the QUERY side alone and collected (≤ nlist
    * distinct values — bounded by the quantizer, not the data), then
    * pushed as a static `IN` filter on the partition column so the
    * scan reads only probed cells' files — the literal "each query
    * reads nprobe/nlist of the index" promise, visible as
    * PartitionFilters in the plan (pinned in PlanSpec). */
  def search(spark: SparkSession, table: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int,
             nprobe: Int = 2): DataFrame = {
    recoverCompacting(spark, table) // never serve a torn overwrite
    val (cents, books, residual) = loadParams(spark, table)
    val probed = Similarity.ivfProbeCells(queries, idCol, vecCol, cents,
        nprobe)
      .select("cell").distinct().collect().map(_.getInt(0)).sorted
    val enc = spark.table(table)
      .filter(col("cell").isin(probed.toIndexedSeq.map(Int.box): _*))
    Similarity.ivfPqSearch(queries, enc, idCol, vecCol, cents, books, k,
      nprobe, residual)
  }
}

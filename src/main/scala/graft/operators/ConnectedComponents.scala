package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the "assign
  * every document to its duplicate cluster" step a dedup pipeline runs
  * after near-dup pair generation (MinHash LSH / SimHash / embedding
  * candidates all emit pairs; picking one representative per cluster
  * needs the transitive closure of those pairs).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * scale-safe choice:
  *  - each round is ONE groupBy shuffle keyed on node id (map-side
  *    combinable min aggregate), never an all-pairs join;
  *  - converges in O(log n) rounds regardless of component diameter
  *    (naive min-label propagation needs O(diameter) rounds — a 1M-doc
  *    duplicate chain would need 1M rounds);
  *  - per-round state is the edge set itself, localCheckpoint'd so the
  *    iterative plan never grows (no exponential lineage).
  *
  * Invariant: the edge set is kept canonical (u < v, no self-loops,
  * distinct). On convergence the edges form stars (root = component
  * minimum, one edge per non-root member), which IS the label
  * assignment.
  */
object ConnectedComponents {

  /** Labels every node of the (undirected) edge list with its
    * component id = the smallest node id in the component. Nodes with
    * only self-loop edges become singleton components. Output:
    * (id, component). Throws if not converged within `maxIters`
    * (the algorithm provably converges in O(log n) rounds; 25 covers
    * any realistic graph).
    *
    * Hybrid execution: when the canonical edge set is at most
    * `driverThreshold` pairs, the closure runs as a single driver-side
    * union-find (one collect of 16 bytes/edge — 16 MB at the default
    * million-pair cap) instead of 3-5 iterative rounds of 4 shuffles
    * each. Near-dup pair sets are orders of magnitude smaller than the
    * corpus (they're the OUTPUT of LSH banding), so in practice batch
    * dedup takes this path; a genuinely huge graph — billions of pairs
    * at the 100 TB scale — exceeds the cap and runs the distributed
    * star-contraction loop unchanged. Same hybrid cutover GraphFrames
    * and production CC implementations apply.
    */
  import graft.SparkUtil.releaseCheckpoint

  def label(edges0: DataFrame, aCol: String, bCol: String,
            maxIters: Int = 25,
            driverThreshold: Long = 1L << 20): DataFrame = {
    // materialize the input ONCE: the node universe and the working
    // edge set both derive from it, and recomputing an expensive
    // upstream lineage (LSH pair generation feeds this in dd08) twice
    // would double the dominant cost
    val base = edges0.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)

    // every input endpoint gets a label, even if all its edges are
    // self-loops (dropped from the working set below)
    val nodes = base.select(col("a").as("id"))
      .union(base.select(col("b").as("id"))).distinct()

    // convergence signature (count + order-independent hash) rides the
    // checkpoint materialization as observed metrics — no extra action
    // per round. Observed-metric delivery can fail under heavy listener
    // load, so a direct aggregate is the deterministic fallback.
    def sigAgg = Seq(
      count(lit(1)).as("n"),
      coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L)).as("h"))
    def sigOf(e: DataFrame): (Long, Long) = {
      val r = e.agg(sigAgg.head, sigAgg(1)).head()
      (r.getLong(0), r.getLong(1))
    }
    var nRound = 0
    def materialize(e: DataFrame): (DataFrame, (Long, Long)) = {
      nRound += 1
      val obs = org.apache.spark.sql.Observation(s"graft_cc_$nRound")
      val m = e.observe(obs, sigAgg.head, sigAgg(1)).localCheckpoint(true)
      val s =
        try (obs.get("n").asInstanceOf[Long], obs.get("h").asInstanceOf[Long])
        catch { case scala.util.control.NonFatal(_) => sigOf(m) }
      (m, s)
    }

    var (edges, last) = materialize(base.select(
        least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct())

    // the driver union-find is Long-keyed; any other id type (string
    // digests, decimals) falls through to the type-generic distributed
    // loop (least/greatest/min work on any orderable type) instead of
    // throwing ClassCastException on collect
    val longIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && last._1 > 0L && last._1 <= driverThreshold) {
      val labels = driverUnionFind(edges)
      // edges was collected above; its checkpoint blocks are dead now
      releaseCheckpoint(edges)
      return nodes.join(labels, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
    }

    var converged = last._1 == 0L
    var it = 0
    while (!converged && it < maxIters) {
      // ---- large-star: for each node x, m = min(N(x) ∪ {x});
      //      link every LARGER neighbor to m. (m ≤ x < n keeps edges
      //      canonical with no extra least/greatest.)
      val dir = edges.select(col("u").as("x"), col("v").as("n"))
        .union(edges.select(col("v").as("x"), col("u").as("n")))
      val mins = dir.groupBy("x")
        .agg(min(col("n")).as("mn"))
        .select(col("x"), least(col("mn"), col("x")).as("m"))
      val ls = dir.join(mins, "x").where(col("n") > col("x"))
        .select(col("m").as("u"), col("n").as("v"))
        .filter(col("u") =!= col("v")).distinct()

      // ---- small-star: for each node x (grouping its SMALLER
      //      neighbors, i.e. the canonical u's of edges ending at x),
      //      m = min of them; link x and every other small neighbor
      //      to m. Emitted edges are (m, y) with m < y — canonical.
      val smins = ls.groupBy(col("v").as("x")).agg(min(col("u")).as("m"))
      val ssSelf = smins.select(col("m").as("u"), col("x").as("v"))
      val ssNbr = ls.join(smins, ls("v") === smins("x"))
        .where(col("u") =!= col("m"))
        .select(col("m").as("u"), ls("u").as("v"))
      val (next, s) = materialize(ssSelf.union(ssNbr).distinct())
      converged = s == last
      last = s
      // `next` is eagerly checkpointed with truncated lineage, so the
      // previous round's blocks can be freed immediately — without this
      // an R-round run holds R edge-set copies in the block manager
      releaseCheckpoint(edges)
      edges = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds")

    // converged star edges (root, member) + roots + isolated nodes
    val labels = edges.select(col("v").as("id"), col("u").as("component"))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Driver-side closure for bounded edge sets: union-find with
    * union-by-min (the root of a set is always its smallest id, so the
    * final find IS the component label) and path halving — near-linear
    * in |edges|, one Spark action end to end. */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val parent = new java.util.HashMap[Long, java.lang.Long]()
    def ensure(x: Long): Unit =
      if (!parent.containsKey(x)) parent.put(x, x)
    def find(x0: Long): Long = {
      var x = x0
      while (parent.get(x).longValue != x) {
        parent.put(x, parent.get(parent.get(x).longValue)) // path halving
        x = parent.get(x).longValue
      }
      x
    }
    edges.select(col("u"), col("v")).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      ensure(a); ensure(b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    parent.keySet().forEach(k => rows += ((k, find(k))))
    import spark.implicits._
    rows.toSeq.toDF("id", "component")
  }
}

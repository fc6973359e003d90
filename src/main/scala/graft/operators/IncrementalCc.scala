package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.store.TableStore

/** Incremental connected-components maintenance — the production form
  * of [[ConnectedComponents]] the same way `IncrementalLsh` is the
  * production form of the one-shot band join. Batch dedup recomputes
  * the transitive closure of ALL near-dup pairs every cycle; at
  * 100 TB the pair archive dwarfs any day's new pairs, so a pipeline
  * maintains the assignment instead: the (id → root) state persists
  * in a [[TableStore]] and each batch of new edges folds in with
  *
  *  1. one lookup of the batch ENDPOINTS' current roots (small side
  *     broadcast against the state scan — the state itself is never
  *     shuffled),
  *  2. connected components over the CONTRACTED root graph — at most
  *     one node per touched component, so the closure runs on a graph
  *     of batch size regardless of how big the state is (this is
  *     union-find's "union by root" step expressed relationally),
  *  3. a keyed MERGE of only the rows whose root changed: the batch's
  *     endpoints plus the members of components that merged (the
  *     store's zone-pruned copy-on-write bounds the physical rewrite
  *     to files actually holding those rows).
  *
  * Root convention matches [[ConnectedComponents.label]]: a component
  * is labeled by its smallest member id, so merging components keeps
  * the convention (the minimum of component minima IS the merged
  * component's minimum) and the final state is bit-identical to the
  * one-shot closure over the union of all batches — the equivalence
  * IncrementalCcSpec proves and gate query dd15 pins against dd08's
  * recursive-CTE oracle. Folding is idempotent: replaying a batch
  * contracts every edge to a self-loop and merges nothing.
  *
  * Maintenance: each fold's COW upsert stages a small file set, so a
  * long-running deployment compacts the assignment table on its own
  * cadence (`store.compact(table)` — both backends expose it); like
  * any table-format maintenance it is a throughput knob, never a
  * correctness one.
  */
object IncrementalCc {

  val StateSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("root", LongType, nullable = false)))

  def ensure(store: TableStore, table: String): Unit =
    store.ensure(table, StateSchema)

  /** Current assignment — (id, component), the
    * [[ConnectedComponents.label]] output shape. */
  def assignments(store: TableStore, table: String): DataFrame =
    store.scan(table).select(col("id"), col("root").as("component"))

  /** Fold one batch of undirected edges into the persisted
    * assignment. Self-loops register their endpoint as a singleton;
    * null endpoints are dropped. */
  def update(store: TableStore, table: String, edges: DataFrame,
             aCol: String, bCol: String): Unit = {
    val e = edges.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .localCheckpoint(true)
    try {
      if (e.isEmpty) return
      val state = store.scan(table)
      if (state.isEmpty) {
        // first fold of a fresh deployment: nothing to contract
        // against — the closure of the batch IS the state
        store.mergeUpsert(table,
          ConnectedComponents.label(e, "a", "b")
            .select(col("id"), col("component").as("root")),
          Seq("id"))
        return
      }
      // 1. endpoints' current roots (unseen endpoint roots itself).
      // The endpoint set is O(batch); the join against the state scan
      // broadcasts it — the state is read, never shuffled.
      val nodes = e.select(col("a").as("id"))
        .union(e.select(col("b").as("id"))).distinct()
      val withRoots = nodes.join(state, Seq("id"), "left")
        .select(col("id"), coalesce(col("root"), col("id")).as("root"))
        .localCheckpoint(true) // reused three times below
      try {
        // 2. contract each edge to its endpoints' roots; closure over
        // the root graph only (≤ one node per touched component)
        val contracted = e
          .join(withRoots.select(col("id").as("a"), col("root").as("ra")),
            Seq("a"))
          .join(withRoots.select(col("id").as("b"), col("root").as("rb")),
            Seq("b"))
          .select(col("ra"), col("rb"))
          .filter(col("ra") =!= col("rb"))
        val remap = ConnectedComponents.label(contracted, "ra", "rb")
          .select(col("id").as("old_root"), col("component").as("new_root"))
          .filter(col("old_root") =!= col("new_root"))
          .localCheckpoint(true) // O(touched roots); broadcast below
        try {
          // 3. rows whose root changes: every state member of a merged
          // component, plus the batch's endpoints (insert-or-update)
          val changedMembers = state
            .join(broadcast(remap), state("root") === remap("old_root"))
            .select(state("id"), remap("new_root").as("root"))
          val endpointRows = withRoots
            .join(broadcast(remap),
              withRoots("root") === remap("old_root"), "left")
            .select(withRoots("id"),
              coalesce(remap("new_root"), withRoots("root")).as("root"))
          store.mergeUpsert(table,
            endpointRows.unionByName(changedMembers).dropDuplicates("id"),
            Seq("id"))
        } finally graft.SparkUtil.releaseCheckpoint(remap)
      } finally graft.SparkUtil.releaseCheckpoint(withRoots)
    } finally graft.SparkUtil.releaseCheckpoint(e)
  }
}

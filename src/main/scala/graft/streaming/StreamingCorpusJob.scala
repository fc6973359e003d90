package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llmdata.{IncrementalCorpus, IncrementalLsh}
import graft.store.TableStore

/** Continuous corpus gold: each document micro-batch is signed and
  * probed against the persistent LSH index ([[IncrementalLsh]]), its
  * fresh docs enriched, and both folded into the incremental cluster /
  * keeper / summary state ([[IncrementalCorpus.applyBatch]]) — so the
  * published corpus summary is as fresh as the trigger interval, where
  * the batch cycle ([[graft.pipeline.LlmOrchestrator]]) recomputes it
  * per cycle from the full pair log.
  *
  * Delivery guarantee: foreachBatch is at-least-once, and the additive
  * summary state is not replay-idempotent — but the
  * [[IncrementalLsh.freshOnly]] gate means a REPLAYED batch (marker
  * stale after a crash) contributes zero fresh docs and zero pairs,
  * so the failure mode is a MISSED fold for the part of the batch
  * whose keys had already been appended, never a double fold. A crash
  * between [[IncrementalCorpus.applyBatch]]'s two state merges leaves
  * a partial fold the same way. Both heal through
  * [[IncrementalCorpus.rebuild]] from docs + pair-log truth — run it
  * from the batch cycle, exactly like the wiki gold repair
  * ([[graft.wiki.IncrementalGold.rebuildAllDates]] from
  * [[StreamingGoldJob]]'s doc). Single writer of the state tables
  * assumed, as everywhere in the store.
  *
  * Scale shape per trigger: O(batch) signing + co-located index probe
  * (collisions), then O(batch + collisions + touched-cluster
  * membership) for the fold — the corpus is never rescanned.
  */
class StreamingCorpusJob(store: TableStore, indexTable: String,
                         checkpoint: String,
                         trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                         k: Int = 8, bands: Int = 4, rowsPerBand: Int = 2,
                         clusterTable: String = "docs.cluster_state",
                         stateTable: String = "gold.corpus_state",
                         buckets: Int = 16, compactAbove: Int = 256,
                         maintainEvery: Int = 8,
                         corpusBuckets: Int = IncrementalCorpus.DefaultBuckets) {

  private val marker = new BatchMarker(checkpoint)
  private val maintenance = new MaintenanceCadence(maintainEvery)

  private[streaming] def lastFolded: Long = marker.lastCompleted

  private[streaming] def foldOnce(batch: DataFrame, batchId: Long): Unit =
    if (marker.isReplay(batchId)) {
      println(s"[corpus] batch $batchId already folded — replay skipped")
    } else {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        // fresh-only BEFORE the index append: replays and multi-feed
        // overlap contribute nothing downstream
        val fresh = IncrementalLsh
          .freshOnly(spark, indexTable, batch).localCheckpoint(true)
        val pairs = IncrementalLsh.indexBatch(spark, indexTable, fresh,
            k, bands, rowsPerBand, buckets)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
          .localCheckpoint(true)
        val enriched = DocumentIngest.enrich(fresh).select(
          col("doc_id"), col("lang"), col("source"), col("n_tokens"),
          col("quality_score"))
        // corpusBuckets sizes the cluster state's id-bucket modulus —
        // binding only on the fold that CREATES the (empty) state;
        // an existing non-empty state keeps its persisted count
        IncrementalCorpus.applyBatch(store, enriched, pairs,
          clusterTable, stateTable, corpusBuckets)
        graft.SparkUtil.releaseCheckpoint(fresh)
        graft.SparkUtil.releaseCheckpoint(pairs)
        // both growing states get maintenance on the job's own
        // cadence (the StreamingCcJob pattern): the bucketed LSH
        // index compacts to one file per occupied bucket; the
        // cluster state re-clusters by cluster_id so applyBatch's
        // two scanRange prunes (endpoint lookup on doc_id, member
        // search on cluster_id — cluster_id ≈ doc_id, so one sort
        // tightens both zones) and the COW's matched-file search
        // stay selective as folds accrete small files. The state
        // trigger counts SMALL files so it self-resets at any size;
        // both probes are driver metadata listings, amortized
        if (maintenance.due()) {
          if (spark.table(indexTable).inputFiles.length >
              buckets + compactAbove)
            IncrementalLsh.compact(spark, indexTable, buckets)
          if (store.smallFileCount(clusterTable,
              128L * 1024 * 1024) > compactAbove)
            store.compact(clusterTable, 128L * 1024 * 1024,
              Seq("cluster_id"))
        }
      }
      marker.commit(batchId)
    }

  /** `docStream` needs (doc_id long, text string, lang string,
    * source string, ingest_ts timestamp). */
  def start(docStream: DataFrame): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldOnce(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

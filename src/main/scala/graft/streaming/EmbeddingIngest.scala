package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.llmdata.AnnIndex

/** Streaming growth path for the persisted ANN index — the vector
  * sibling of [[StreamingLshJob]], closing ingest→index→serve: new
  * embeddings arrive on a stream and each micro-batch is encoded with
  * the index's FROZEN quantizer ([[AnnIndex.append]]) and appended to
  * the cell partitions it lands in. The FAISS production loop — train
  * once, add forever, periodic [[AnnIndex.build]] re-run when the data
  * distribution drifts — driven by Structured Streaming.
  *
  * The index (and its quantizer sidecar) MUST exist before the stream
  * starts ([[AnnIndex.build]] on the bootstrap corpus): training the
  * quantizer on whatever the first micro-batch happens to contain
  * would freeze a distribution-blind quantizer forever, silently.
  * Refusing loudly beats that.
  *
  * Replay safety (foreachBatch is at-least-once): a code append is NOT
  * idempotent (unlike the LSH index's freshOnly guard, there is no id
  * replay filter — codes carry no uniqueness), so the durable
  * [[BatchMarker]] is the replay gate here, committed only after the
  * append lands. The residual exposure — a crash between append
  * job-commit and marker commit replays one batch — duplicates that
  * batch's codes, whose damage is duplicate candidate rows, not
  * corrupted scores ([[AnnIndex.append]]'s documented contract);
  * re-running [[AnnIndex.build]] heals it. Same tail-risk class as
  * every non-atomic table append here; an atomic table format closes
  * it (see TableStore's activation note).
  *
  * Scale shape: per trigger the work is O(batch · m) encode + an
  * append that shuffles only code bytes — the corpus is never
  * re-scanned and the quantizer never retrains. Searches between
  * triggers see the index grow monotonically.
  */
class EmbeddingIngest(indexTable: String, checkpoint: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      trigger: Trigger = Trigger.ProcessingTime("3 minutes"),
                      compactAbove: Int = 256,
                      maintainEvery: Int = 8) {

  private val marker = new BatchMarker(checkpoint)
  private val maintenance = new MaintenanceCadence(maintainEvery)

  private[streaming] def lastIndexed: Long = marker.lastCompleted

  /** Append one micro-batch unless its id is a known replay. */
  private[streaming] def indexOnce(batch: DataFrame, batchId: Long): Unit =
    if (marker.isReplay(batchId)) {
      println(s"[ann] batch $batchId already indexed — replay skipped")
    } else {
      val nonEmpty = !batch.isEmpty
      if (nonEmpty) {
        val spark = batch.sparkSession
        require(spark.catalog.tableExists(indexTable),
          s"ANN index '$indexTable' does not exist — run AnnIndex.build " +
            "on the bootstrap corpus before streaming appends into it")
        AnnIndex.append(spark, indexTable, batch, idCol, vecCol)
      }
      marker.commit(batchId)
      // index maintenance on the job's own cadence (the
      // StreamingLshJob pattern): each append adds a file set per
      // touched cell. The trigger floor is the occupied-cell count
      // — post-compaction files ≈ cells, so `cells + compactAbove`
      // self-resets at any index size where a bare file-count
      // threshold would stop resetting once cells alone exceed it.
      // Runs AFTER the marker commit: the compact is a large crash
      // window (a full index rewrite), and a crash inside it must
      // not replay the batch — unlike the LSH jobs' bloom-guarded
      // indexBatch, a code append is NOT idempotent, so dying
      // between append and marker would re-append the whole batch.
      // The trigger PROBE itself (inputFiles listing + SHOW
      // PARTITIONS) is O(index files) driver metadata work, so it
      // runs on the amortized MaintenanceCadence, not every trigger.
      // Gated on nonEmpty FIRST: MaintenanceCadence's contract is
      // "every `every`-th NON-EMPTY batch" (an empty batch appends no
      // files, so counting it would silently stretch the effective
      // cadence under sparse traffic), and due() advances the counter
      // as a side effect, so it must not even be consulted here.
      val sp = batch.sparkSession
      if (nonEmpty && maintenance.due() &&
          sp.catalog.tableExists(indexTable) &&
          sp.table(indexTable).inputFiles.length >
            AnnIndex.occupiedCells(sp, indexTable) + compactAbove)
        AnnIndex.compact(sp, indexTable)
    }

  /** `vecStream` needs (`idCol` long, `vecCol` array<float>). */
  def start(vecStream: DataFrame): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        indexOnce(batch, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}

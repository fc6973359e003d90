package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Durable last-completed-batchId marker for foreachBatch sinks whose
  * work is NOT replay-idempotent (additive gold folds, append-only
  * index/pair logs). foreachBatch is at-least-once: a crash between a
  * completed batch body and the checkpoint commit replays the batch
  * id on restart. Batch ids are deterministic, so "id ≤ marker" ⇒
  * replay ⇒ skip. Commit the marker ATOMICALLY (tmp + rename) after
  * the batch's last write; the residual double-apply window is the
  * instant between that write and the rename — repairable state
  * should pair this with a periodic exact rebuild (see
  * IncrementalGold.rebuildDates).
  */
final class BatchMarker(dir: String, name: String = "graft_last_folded_batch") {

  private val path = Paths.get(dir, name)

  def lastCompleted: Long =
    if (Files.exists(path))
      new String(Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else -1L

  def isReplay(batchId: Long): Boolean = batchId <= lastCompleted

  def commit(batchId: Long): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(s".batch.${System.nanoTime()}.tmp")
    Files.write(tmp, batchId.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

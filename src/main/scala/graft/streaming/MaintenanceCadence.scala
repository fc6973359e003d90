package graft.streaming

/** Amortizes a maintenance-trigger PROBE across micro-batches.
  *
  * Every streaming job here gates its compaction on a trigger signal
  * (live file count vs a floor, small-file count) whose evaluation is
  * driver-side metadata work — a full `inputFiles` listing and/or a
  * `SHOW PARTITIONS` scan that grows with the table. Paying that on
  * EVERY trigger is O(index files) per few minutes forever; since a
  * compaction deferred by a few batches only defers a throughput
  * optimization (never correctness — the triggers self-reset at any
  * table size), the jobs probe only every `every`-th non-empty batch.
  *
  * `every = 1` restores per-batch probing (what the file-count-bound
  * specs use); the production default in the jobs is 8, i.e. metadata
  * cost amortized 8× while the accretion between probes stays bounded
  * by `every` batches' fan-out.
  *
  * Counting only NON-empty batches means a stream that goes idle with
  * the trigger armed defers its compaction until the next non-empty
  * batch — for an unbounded TIME, but a bounded DEBT: at most
  * `every − 1` batches' fan-out of small files (an empty batch
  * appends nothing, so the debt cannot grow while idle). Counting
  * empty batches instead would bound the time but silently stretch
  * the effective cadence under sparse traffic, paying the O(files)
  * probe for triggers that added no files.
  */
private[graft] final class MaintenanceCadence(every: Int) {
  require(every >= 1, s"maintenance cadence must be >= 1, got $every")
  private var sinceProbe = 0

  /** True on every `every`-th call — the caller evaluates its trigger
    * (and possibly compacts) only then. Not thread-safe; foreachBatch
    * serializes batches, which is also what makes the caller a legal
    * single maintenance writer. */
  def due(): Boolean = {
    sinceProbe += 1
    if (sinceProbe >= every) { sinceProbe = 0; true } else false
  }
}

package graft.model

/** The exactly-once replay guard shared by the transactional append
  * paths of the persistent serving stores (LexIndex, VectorIndex,
  * ShingleStore): each store records the id of the last committed batch
  * in its stats/meta commit row, and a maintainer restart replays the
  * in-flight batch through the same append call.
  *
  * The contract is STRICTLY INCREASING application: a streaming engine's
  * checkpoint replays only the batch that was in flight at the crash
  * (exactly the last committed id, when the crash landed after the
  * commit), never an earlier one — so an id BELOW the high-water mark is
  * a sequencing violation (a retried batch arriving after a later batch
  * already committed), and silently skipping it would LOSE that batch's
  * rows without any error. Gaps above the mark are permitted (a caller
  * may legitimately skip ids — e.g. batches filtered to zero rows that
  * it chose not to apply).
  */
object BatchLedger {

  /** Classify `batchId` against the store's committed `lastBatch`
    * high-water mark: `true` → exact replay of the last committed batch,
    * the caller must no-op; `false` → fresh batch, apply it; throws on
    * an id below the mark (out-of-order application — the caller's
    * sequencing is broken and proceeding would silently drop the batch).
    * Negative ids on either side mean "unattributed" and never match.
    */
  def isReplay(lastBatch: Long, batchId: Long, store: String): Boolean =
    if (batchId < 0 || lastBatch < 0) false
    else if (batchId == lastBatch) true
    else if (batchId > lastBatch) false
    else throw new IllegalStateException(
      s"out-of-order append to $store: batch $batchId arrived after batch " +
        s"$lastBatch committed — batch ids must be applied in strictly " +
        "increasing order; only an exact replay of the last committed " +
        "batch is a no-op, and an older id here means its rows were " +
        "never applied (refusing to silently drop them)")
}

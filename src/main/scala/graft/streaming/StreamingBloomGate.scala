package graft.streaming

import graft.ops.{Bloom, Layouts}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The incremental EXACT-dedup admission gate AS A STREAM — the third
  * family on the [[IncrementalIngest]] shell (near-dup text:
  * [[StreamingDedup]]; vectors: [[StreamingSimilarity]]): each
  * micro-batch is judged against the HISTORICAL Bloom bitmap (the
  * corpus' at-rest index plus every previously committed batch's
  * increment — [[graft.ops.Bloom.readBloomIndex]]), its novel rows are
  * admitted to `admittedOut`, and its own bitmap is appended so later
  * batches dedup against it. The batch gate itself is
  * [[graft.ops.Bloom.bloomGate]]'s arithmetic unchanged — deterministic
  * md5-derived probe positions, no false negatives, declared false
  * positives — so the stream's admission set is oracle-checkable
  * bit-for-bit.
  *
  * Exactly-once story, inherited from the other two loops with one
  * STRICTER twist: the batch OWNS `_increments/ingest_batch=<id>`
  * inside the index and `ingest_batch=<id>` under `admittedOut`
  * ([[graft.ops.Layouts.incrementDir]] /
  * [[graft.ops.Layouts.ownedBatchDir]], both overwritten wholesale),
  * and the history read keeps only increments with `ingest_batch <
  * id` — not merely "all but its own", because unlike the ANN/near-dup
  * increments (history-independent encodes) the gate's OUTPUT depends
  * on the history it judged against: batch ids are monotone, so the
  * `<` rule reconstructs exactly the history the batch's first attempt
  * saw even when the replay runs after later batches committed, and
  * replays converge to identical on-disk state (spec-pinned).
  * The batch's WHOLE bitmap is appended, not just its admitted rows'
  * (identical final OR — a dropped row's bits are already set in the
  * history that dropped it — and one branch less to replay).
  *
  * Cost shape per batch: one KB-sized row read per committed batch
  * ever (never corpus rows), one scan-speed membership filter, one
  * map-side-reducing bitmap fold of the batch.
  * [[graft.ops.Bloom.compactBloomIndex]] folds the increment rows into
  * the next single-row base when the listing tax bites.
  */
object StreamingBloomGate {

  /** One micro-batch step, exposed for direct (non-stream) testing of
    * the replay semantics. Re-invoking with the same `batchId` and
    * rows converges to identical on-disk state.
    */
  def ingestBatch(b: DataFrame, batchId: Long, indexPath: String,
      textCol: String, admittedOut: String): Unit =
    ingestBatchFenced(b, batchId, indexPath, textCol, admittedOut, () => ())

  /** [[ingestBatch]] with a hook between the writes and the post-write
    * fence — the seam that lets a spec pin the check-then-act window
    * deterministically (a compaction acquiring its marker while this
    * batch was computing), mirroring
    * [[StreamingSimilarity.ingestBatchResolved]]'s stale-layout seam.
    */
  private[graft] def ingestBatchFenced(b: DataFrame, batchId: Long,
      indexPath: String, textCol: String, admittedOut: String,
      beforeFence: () => Unit): Unit = {
    val spark = b.sparkSession
    // refuse while a compaction folds the index (the replay makes the
    // post-fold retry safe), BEFORE any read or write
    Layouts.assertNotQuiesced(spark, indexPath, "bloomGateStream")
    val (m, k, words) =
      Bloom.readBloomIndex(spark, indexPath, historyBefore = Some(batchId))
    b.where(!Bloom.bloomMember(col(textCol), m, k, words))
      .write.mode("overwrite")
      .parquet(Layouts.ownedBatchDir(admittedOut, batchId))
    Bloom.writeBitmapRow(spark, Bloom.bitmapOf(b, textCol, m, k), m, k,
      Layouts.incrementDir(indexPath, batchId))
    // post-write quiesce fence (r20 ADVICE, medium — the
    // StreamingSimilarity.ingestBatchResolved pattern): the marker
    // check above is check-then-act for a batch already past it, so a
    // compactBloomIndex can acquire, pass assertNoInflightIncrements,
    // fold and release while this batch is still computing — its
    // bitmap increment then lands in a folded-away src whose caller
    // already swapped to dst, and the bits are permanently absent from
    // the live index. Failing AFTER the write is safe and convergent:
    // the checkpoint has not committed, so the batch replays against
    // the post-fold index (and its orphaned increment in the dead src
    // is never read again).
    beforeFence()
    Layouts.assertNotQuiesced(spark, indexPath, "bloomGateStream (post-write)")
  }

  /** The stream: micro-batches of rows with `textCol` (plus whatever
    * `cols` should ride into `admittedOut`) gated against the history
    * at `indexPath` ([[graft.ops.Bloom.writeBloomIndex]] first). The
    * returned writer is not started — the caller holds the query (the
    * [[StreamingConverter.writer]] contract); restart with the same
    * `checkpoint` resumes from the last committed batch.
    */
  def bloomGateStream(batches: DataFrame, indexPath: String,
      checkpoint: String, cols: Seq[String], textCol: String,
      admittedOut: String,
      availableNow: Boolean = true): DataStreamWriter[Row] = {
    require(batches.isStreaming,
      "bloomGateStream takes a STREAMING frame; the batch face is " +
        "Bloom.bloomGate")
    IncrementalIngest.ownedBatchWriter(batches, cols, checkpoint,
      availableNow) { (b, batchId) =>
      ingestBatch(b, batchId, indexPath, textCol, admittedOut)
    }
  }
}

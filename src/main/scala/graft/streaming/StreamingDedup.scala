package graft.streaming

import graft.ops.{Dedup, Layouts}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The daily-ingest near-dup loop AS A STREAM: each micro-batch of
  * (id, text) documents is deduplicated against the corpus HISTORY —
  * the at-rest signature index ([[graft.ops.Dedup.writeNearDupIndex]])
  * plus every batch ingested before it — and then becomes history
  * itself. This is [[graft.ops.Dedup.incrementalNearDup]] (q131) with
  * the batching, ordering and restart bookkeeping that a continuous
  * ingest needs, instead of a caller-driven daily job.
  *
  * Scale shape per micro-batch, unchanged from the batch face: the
  * increment's signatures are computed fresh (it is small), the
  * stored index streams through the broadcast-or-shuffle candidate
  * join picked by the signature-row budget, and only candidate-
  * matched documents are ever shingled for the exact-Jaccard verify.
  *
  * Exactly-once story — every per-batch write is IDEMPOTENT, so a
  * crash-replay converges to the first attempt's state with plain
  * parquet and no transactional table format:
  *   - VERDICTS overwrite the batch's own `ingest_batch=<id>`
  *     subdirectory of `verdictsOut` (read the whole directory; the
  *     partition column names the batch).
  *   - INDEX signatures land in the batch's own
  *     `_increments/ingest_batch=<id>` directory of the index layout
  *     ([[graft.ops.Dedup.appendNearDupIndexIncrement]]), overwritten
  *     wholesale on replay. The dedup step reads base + committed
  *     increments EXCLUDING the batch's own directory
  *     ([[graft.ops.Dedup.nearDupIndexWithIncrements]]), so a replayed
  *     batch sees exactly the history its first attempt saw: no
  *     self-matches, and no same-batch near-dup twins classifying
  *     against each other (the r16 plain-append design had both
  *     edges — closed in r18 by this per-batch layout).
  *   - CORPUS text lands in the batch's own
  *     `_increments/ingest_batch=<id>` directory of the corpus store,
  *     same discipline. The verify step reads base + increments
  *     (excluding own — candidates can never reference the current
  *     batch anyway, since its index rows are excluded).
  * Underscore-prefixed increment directories are invisible to plain
  * reads of either layout; batch-face consumers of a streamed index
  * either read through [[graft.ops.Dedup.nearDupIndexWithIncrements]]
  * or run [[graft.ops.Dedup.compactNearDupIndex]], which folds the
  * increments into the next base generation (quiesce the stream
  * first, as with any LSM compaction).
  *
  * The returned writer is not started — the caller holds the
  * [[org.apache.spark.sql.streaming.StreamingQuery]] (the
  * [[StreamingConverter.writer]] contract). Restart with the same
  * `checkpoint` resumes from the last committed batch.
  */
object StreamingDedup {

  /** One micro-batch step, exposed for direct (non-stream) testing of
    * the replay semantics: dedup `b` against base + committed
    * increments excluding `batchId`'s own, write the verdicts
    * idempotently, then land the batch's signatures and text as
    * increments the batch owns. Re-invoking with the same `batchId`
    * and rows converges to identical on-disk state.
    */
  def ingestBatch(
      b: DataFrame,
      batchId: Long,
      corpusPath: String,
      indexPath: String,
      verdictsOut: String,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int,
      bands: Int,
      shingleWidth: Int,
      maxBroadcastSigRows: Long): Unit = {
    val spark = b.sparkSession
    // fail BEFORE the dedup work while a compaction holds the index's
    // quiesce marker (the append faces refuse too — this check just
    // moves the curated failure ahead of the candidate join): the
    // checkpoint replays the batch after the fold
    Layouts.assertNotQuiesced(spark, indexPath, "incrementalNearDupStream")
    // fail before any write if the caller's banding disagrees with the
    // layout (the appendNearDupIndex discipline): a mismatched dedup
    // pass would silently change which pairs can ever collide
    Dedup.validateIndexMeta(spark, indexPath, numHashes, bands,
      shingleWidth, "incrementalNearDupStream")
    val history = Dedup.nearDupIndexWithIncrements(spark, indexPath,
      excludeBatchId = Some(batchId))
    val corpus = Layouts.withIncrements(spark,
      spark.read.parquet(corpusPath), corpusPath, Seq(idCol, textCol),
      excludeBatchId = Some(batchId))
    val verdicts = Dedup.incrementalNearDupAgainst(history, corpus, b,
      idCol, textCol, threshold, numHashes, bands, shingleWidth,
      maxBroadcastSigRows)
    // idempotent: the batch owns its verdict partition directory
    verdicts.write.mode("overwrite")
      .parquet(Layouts.ownedBatchDir(verdictsOut, batchId))
    // the batch becomes history: signatures and text into increment
    // directories the batch owns (overwritten wholesale on replay)
    Dedup.appendNearDupIndexIncrement(b, idCol, textCol, indexPath,
      batchId, numHashes, bands, shingleWidth)
    b.write.mode("overwrite")
      .parquet(Layouts.incrementDir(corpusPath, batchId))
  }

  def incrementalNearDupStream(
      batches: DataFrame,
      corpusPath: String,
      indexPath: String,
      verdictsOut: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleWidth: Int = 3,
      maxBroadcastSigRows: Long = 4L << 20,
      availableNow: Boolean = true): DataStreamWriter[Row] = {
    require(batches.isStreaming,
      "incrementalNearDupStream takes a STREAMING frame; the batch face " +
        "is Dedup.incrementalNearDup")
    // the batch is consumed repeatedly (count, candidate join, verify,
    // both increment writes): the shared shell materializes it once
    IncrementalIngest.ownedBatchWriter(batches, Seq(idCol, textCol),
      checkpoint, availableNow) { (b, batchId) =>
      ingestBatch(b, batchId, corpusPath, indexPath, verdictsOut,
        idCol, textCol, threshold, numHashes, bands, shingleWidth,
        maxBroadcastSigRows)
    }
  }
}

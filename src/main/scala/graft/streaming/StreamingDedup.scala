package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The daily-ingest near-dup loop AS A STREAM: each micro-batch of
  * (id, text) documents is deduplicated against the corpus HISTORY —
  * the at-rest signature index ([[graft.ops.Dedup.writeNearDupIndex]])
  * plus every batch ingested before it — and then becomes history
  * itself: its signatures append to the index
  * ([[graft.ops.Dedup.appendNearDupIndex]], file-additive, corpus
  * never re-read) and its text appends to the corpus store. This is
  * [[graft.ops.Dedup.incrementalNearDup]] (q131) with the batching,
  * ordering and restart bookkeeping that a continuous ingest needs,
  * instead of a caller-driven daily job.
  *
  * Scale shape per micro-batch, unchanged from the batch face: the
  * increment's signatures are computed fresh (it is small), the
  * stored index streams through the broadcast-or-shuffle candidate
  * join picked by the signature-row budget, and only candidate-
  * matched documents are ever shingled for the exact-Jaccard verify.
  *
  * Exactly-once story (plain-parquet sinks have no multi-sink
  * transaction, so each write gets the strongest guarantee its layout
  * allows):
  *   - VERDICTS are idempotent: each batch overwrites its own
  *     `ingest_batch=<id>` subdirectory of `verdictsOut`, so a
  *     replayed batch rewrites the same rows (read the whole
  *     directory; the partition column names the batch).
  *   - INDEX and CORPUS appends are at-least-once: a crash between
  *     the append and the checkpoint commit replays them. Duplicate
  *     signature/text rows are DEDUP-SAFE by construction — every
  *     reader of the index dedups candidates and every verdict is a
  *     min()-aggregate — so replays cost space, not correctness, and
  *     the next [[graft.ops.Dedup.compactNearDupIndex]] rewrite drops
  *     nothing it shouldn't. One replay edge is visible: a batch
  *     whose OWN signatures already landed before the crash re-matches
  *     against itself — self-matches (dup_of = id) are filtered here,
  *     and two same-batch near-dup twins may classify against each
  *     other on replay where the first attempt called both unique.
  *     A production deployment that cannot accept that edge puts the
  *     index on a transactional table format (Delta/Iceberg) whose
  *     atomic append removes the window; the operator logic is
  *     unchanged.
  *
  * The returned writer is not started — the caller holds the
  * [[org.apache.spark.sql.streaming.StreamingQuery]] (the
  * [[StreamingConverter.writer]] contract). Restart with the same
  * `checkpoint` resumes from the last committed batch.
  */
object StreamingDedup {

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
    val w = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // the batch is consumed repeatedly (count, candidate join,
        // verify, both appends): one bounded materialization
        val b = batch.select(col(idCol), col(textCol))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val corpus = spark.read.parquet(corpusPath)
          val verdicts = Dedup.incrementalNearDup(spark, indexPath, corpus,
              b, idCol, textCol, threshold, numHashes, bands, shingleWidth,
              maxBroadcastSigRows)
            // replay guard: a batch whose signatures already landed
            // (crash after append, before checkpoint commit) would
            // match itself — a self-verdict is never meaningful
            .where(col("dup_of") =!= col(idCol))
          // idempotent: the batch owns its partition directory
          verdicts.write.mode("overwrite")
            .parquet(s"$verdictsOut/ingest_batch=$batchId")
          // the batch becomes history: signatures into the index
          // (validated against the stored banding), text into the
          // corpus store — both file-additive, both dedup-safe under
          // replay (see object scaladoc)
          Dedup.appendNearDupIndex(b, idCol, textCol, indexPath,
            numHashes, bands, shingleWidth)
          b.write.mode("append").parquet(corpusPath)
        } finally b.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
    if (availableNow) w.trigger(Trigger.AvailableNow()) else w
  }
}

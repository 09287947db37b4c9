package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.storage.StorageLevel

/** The shared foreachBatch shell of the owned-increment ingest loops
  * ([[StreamingDedup]] near-dup text, [[StreamingSimilarity]] vectors,
  * [[StreamingBloomGate]] exact-dedup admission — the next family
  * should NOT grow a fourth copy): project the
  * micro-batch to the columns the step consumes, persist it once (every
  * step reads its batch several times — counts, candidate joins,
  * encode + drift), run the family's idempotent per-batch step, and
  * unpersist on any exit. The step owns the idempotence story
  * (per-batch `_increments/ingest_batch=<id>` directories overwritten
  * wholesale); this shell owns the bounded-materialization and
  * checkpoint/trigger plumbing both families previously duplicated.
  */
private[streaming] object IncrementalIngest {

  def ownedBatchWriter(batches: DataFrame, cols: Seq[String],
      checkpoint: String, availableNow: Boolean)(
      step: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val w = batches.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.select(cols.map(col): _*)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try step(b, batchId)
        finally b.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
    if (availableNow) w.trigger(Trigger.AvailableNow()) else w
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing — the pre-training batching step: documents are
  * concatenated in a deterministic order and chunked into fixed
  * token-budget training sequences (concat-and-chunk, the GPT-style
  * packing scheme; docs may straddle a chunk boundary).
  *
  * The core is a GLOBAL running prefix sum, which is exactly the
  * operation Spark's naive form gets wrong at scale:
  * `Window.orderBy(...)` with no partition spec moves the ENTIRE
  * dataset into one partition (`Exchange SinglePartition`) — the
  * classic single-task collapse. This implementation computes the same
  * result with a two-phase distributed prefix sum:
  *
  *   1. `repartitionByRange(orderCol)` — rows land in sorted,
  *      non-overlapping ranges (one range exchange, the same cost a
  *      global sort would pay anyway) — and the result is PERSISTED:
  *      range boundaries come from a per-execution sampling job, so
  *      two separate actions over an unpersisted frame could place
  *      rows in different partitions and silently corrupt every
  *      offset near a shifted boundary. Persisting materializes ONE
  *      partitioning that both phases below share (and a lost cached
  *      partition recomputes through the already-built
  *      RangePartitioner, whose boundaries are fixed at first
  *      execution — it never re-samples);
  *   2. partition-LOCAL running sums via a single `mapPartitions`
  *      pass over the cached, within-partition-sorted rows — by
  *      construction no exchange at all (a
  *      `Window.partitionBy(spark_partition_id())` here would NOT be
  *      local: Catalyst cannot prove pid-clustering and inserts a
  *      full hash exchange on the pid);
  *   3. per-partition totals — numPartitions rows — collect to the
  *      driver (bounded like the IVF codebook collect), turn into
  *      exclusive prefix offsets, broadcast-join them back.
  *
  * The intermediate stays cached until the returned frame's consumer
  * is done with it (unpersisting eagerly would re-trigger the
  * boundary-resampling hazard the persist exists to prevent). Use
  * [[Packing.contiguousWithCleanup]] in a long-lived session and call
  * the returned cleanup once the result is consumed; the plain
  * [[Packing.contiguous]] leaves the cache to
  * `spark.catalog.clearCache()`.
  */
object Packing {

  /** Assign each document a training sequence: `seq_id` =
    * `floor(start_off / budget)` where `start_off` is the token offset
    * of the document in the concatenated stream (exclusive prefix sum
    * of `tokensCol` in ascending `orderCol` order).
    *
    * The shared-partitioning intermediate stays cached (see object
    * scaladoc); prefer [[contiguousWithCleanup]] when the caller can
    * signal consumption.
    *
    * @param budget tokens per packed training sequence
    * @return input row + (start_off, seq_id), ordered arbitrarily
    */
  def contiguous(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long): DataFrame =
    contiguousWithCleanup(df, orderCol, tokensCol, budget)._1

  /** [[contiguous]] plus an unpersist handle for the internal
    * range-partitioned cache: call the returned thunk AFTER the
    * result's consuming action completes (calling it earlier is safe
    * for correctness — the RangePartitioner's boundaries are fixed at
    * first execution — but forfeits the cache's recompute protection).
    * Idempotent, non-blocking.
    */
  def contiguousWithCleanup(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long): (DataFrame, () => Unit) = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val tokType = df.schema(tokensCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType).contains(tokType),
      s"tokensCol must be integral (token counts), got $tokType")
    val spark = df.sparkSession
    // materialize the partition id as a column so it survives the
    // cache; one shared partitioning for BOTH phases (see scaladoc)
    val ranged = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded driver collect: one row per partition, like the IVF
    // codebook — never scales with the data. Null token counts sum as
    // 0 (the semantics a Window `sum` had — it skips nulls; an
    // all-null partition must yield offset 0, not an NPE).
    val totals = ranged.groupBy("__pid")
      .agg(sum(coalesce(col(tokensCol).cast("long"), lit(0L))).as("__total"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix: offset(pid) = sum of totals of pids < pid
    val exclusive = {
      var acc = 0L
      totals.map { case (pid, tot) => val o = pid -> acc; acc += tot; o }
    }
    val offDf = spark.createDataFrame(exclusive.toSeq)
      .toDF("__pid", "__off")
    // partition-local running sum: one sequential pass per cached,
    // sorted partition — genuinely exchange-free (asserted in OpsSpec)
    val tokIdx = ranged.schema.fieldIndex(tokensCol)
    val outSchema = ranged.schema.add("__run", LongType, nullable = false)
    val local = ranged.mapPartitions { rows =>
      var acc = 0L
      rows.map { r =>
        // null token count contributes 0, matching the totals agg
        // above and the null-skipping Window sum this replaced
        val v = r.get(tokIdx)
        if (v != null) acc += v.asInstanceOf[Number].longValue()
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
    val out = local
      .join(broadcast(offDf), Seq("__pid"))
      // a null token count occupies zero tokens: subtract 0, not null
      // (null would poison start_off/seq_id for that row only)
      .withColumn("start_off",
        col("__off") + col("__run") - coalesce(col(tokensCol).cast("long"), lit(0L)))
      .withColumn("seq_id", floor(col("start_off") / budget))
      .drop("__pid", "__run", "__off")
    (out, () => { ranged.unpersist(blocking = false); () })
  }

  /** Overlapping fixed-size character windows — context-window
    * chunking for embedding/retrieval pipelines: windows start every
    * `stride` chars; a document no longer than `window` yields exactly
    * one chunk; otherwise `ceil((len - window)/stride) + 1` windows,
    * enough that the last one reaches the document's end (it may
    * overlap its predecessor by more than `window - stride`).
    *
    * Char-based on purpose: `substring` is 1-based and
    * character-counted identically in Spark and ANSI SQL, so chunk
    * boundaries are engine-exact (a token-based chunker composes this
    * with [[graft.functions.TextStats.tokenCount]]-style splitting).
    *
    * Scale shape: one narrow `transform` + `posexplode` projection —
    * zero exchanges; output size is len/stride rows per doc and only
    * the consumer shuffles them.
    *
    * @return (idCol, win_id, chunk), win_id counting from 0
    */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    require(stride <= window, "stride > window would skip text")
    val len = length(col(textCol)).cast("long")
    val nwin = when(len <= window, lit(1L))
      .otherwise(ceil((len - window).cast("double") / stride).cast("long") + 1L)
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0L), nwin - 1),
          i => col(textCol).substr((i * stride + 1).cast("int"), lit(window)))))
      .toDF(idCol, "win_id", "chunk")
      .withColumn("win_id", col("win_id").cast("long"))
  }
}

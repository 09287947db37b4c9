package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *      global sort would pay anyway);
  *   2. partition-LOCAL running sums via a window partitioned by the
  *      materialized partition id (no cross-partition traffic);
  *   3. per-partition totals — numPartitions rows — collect to the
  *      driver (bounded like the IVF codebook collect), turn into
  *      exclusive prefix offsets, broadcast-join them back.
  *
  * The result is identical for ANY range boundaries (prefix sums
  * depend on the global order, not the partitioning), so sampling
  * nondeterminism in repartitionByRange cannot change the output.
  */
object Packing {

  /** Assign each document a training sequence: `seq_id` =
    * `floor(start_off / budget)` where `start_off` is the token offset
    * of the document in the concatenated stream (exclusive prefix sum
    * of `tokensCol` in ascending `orderCol` order).
    *
    * @param budget tokens per packed training sequence
    * @return input row + (start_off, seq_id), ordered arbitrarily
    */
  def contiguous(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val tokType = df.schema(tokensCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType).contains(tokType),
      s"tokensCol must be integral (token counts), got $tokType")
    val spark = df.sparkSession
    // materialize the partition id as a column: window specs reject
    // nondeterministic expressions, a projected column is fine
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__run", sum(col(tokensCol)).over(w))
    // bounded driver collect: one row per partition, like the IVF
    // codebook — never scales with the data. Computed as a plain
    // partial-aggregated sum over `ranged` (NOT max(__run)) so this
    // pass never evaluates the window; the source is still scanned
    // twice — at packing scale persist `df` upstream if that matters.
    val totals = ranged.groupBy("__pid")
      .agg(sum(col(tokensCol)).as("__total"))
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
    local
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("start_off", col("__off") + col("__run") - col(tokensCol))
      .withColumn("seq_id", floor(col("start_off") / budget))
      .drop("__pid", "__run", "__off")
  }
}

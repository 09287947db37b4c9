package graft.convert

import graft.core.{ArchiveEntry, ArchiveSchema, ConvertOptions, IncludeType}
import graft.functions.GraftFunctions
import graft.walk.ArchiveWalker
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's entire fixed pipeline, re-expressed as one
  * declarative Spark plan (reference trace: SURVEY.md §3.1):
  *
  * {{{
  * paths -> repartition -> flatMap(recursive walk)        // narrow
  *       -> filter(text/binary, size range)               // narrow
  *       -> [dropDuplicates(hash)]                        // 1 shuffle
  *       -> write.parquet                                 // task-per-partition
  * }}}
  *
  * Scale notes (designed for a 1000-executor cluster, tested local):
  *   - one task per input archive (morsel parallelism — the unit of
  *     work the reference uses too, converter/base.rs:45-65); inputs
  *     stream through decompressors, an archive is never materialized;
  *   - zero shuffles without `unique`; exactly one hash-partitioned
  *     exchange with it — Spark's spillable HashAggregate replaces the
  *     reference's unbounded in-memory HashSet (src/sink.rs:59-73);
  *   - filters are evaluated before the shuffle/write, so filtered
  *     content never crosses the wire. Unlike the reference (which
  *     builds full batches, then filters columnar — src/batch.rs:133-155)
  *     Catalyst pipelines the predicate into the same stage as the walk;
  *   - writer properties mirror the reference's tuned Parquet sink
  *     (src/sink.rs:23-55): bloom filters on source/path/hash,
  *     dictionary on source/path only (content dictionary would bloat
  *     on large binaries).
  */
object ArchiveConverter {

  final case class ConversionStats(rows: Long, bytes: Long, files: Long)

  /** The walked, unfiltered entry Dataset — the engine's logical source. */
  def entries(spark: SparkSession, inputs: Seq[String], opts: ConvertOptions): Dataset[ArchiveEntry] = {
    import spark.implicits._
    require(inputs.nonEmpty, "no inputs")
    val par = opts.parallelism.getOrElse(spark.sparkContext.defaultParallelism)
    val width = math.max(1, math.min(inputs.size, math.max(par, 1)))
    spark.createDataset(inputs)
      .repartition(width)
      .flatMap(p => ArchiveWalker.walkPath(p, opts))
  }

  /** Entries with the reference's F1/F2 predicates applied
    * (half-open size range `min <= size < max`, src/batch.rs:182-197;
    * UTF-8 text/binary content filter, src/batch.rs:162-180).
    */
  def filteredEntries(spark: SparkSession, inputs: Seq[String], opts: ConvertOptions): DataFrame = {
    var df = entries(spark, inputs, opts).toDF()
    opts.include match {
      case IncludeType.All    =>
      case IncludeType.Text   => df = df.filter(GraftFunctions.is_utf8(col("content")))
      case IncludeType.Binary => df = df.filter(!GraftFunctions.is_utf8(col("content")))
    }
    (opts.minSize, opts.maxSize) match {
      case (None, None) =>
      case (mn, mx)     =>
        val lo = mn.getOrElse(0L)
        val hi = mx.getOrElse(Long.MaxValue)
        df = df.filter(col("size") >= lo && col("size") < hi)
    }
    if (opts.unique) df = df.dropDuplicates("hash")
    df
  }

  /** Full conversion: walk, filter, dedup, write Parquet. Fails on an
    * empty result like the reference (src/main.rs:129-132).
    */
  def convert(spark: SparkSession, inputs: Seq[String], out: String, opts: ConvertOptions): ConversionStats = {
    val df = filteredEntries(spark, inputs, opts)
    df.write
      .mode("overwrite")
      .option("compression", opts.compression)
      // reference sink tuning (src/sink.rs:29-48)
      .option("parquet.bloom.filter.enabled", "false")
      .option("parquet.bloom.filter.enabled#source", "true")
      .option("parquet.bloom.filter.enabled#path", "true")
      .option("parquet.bloom.filter.enabled#hash", "true")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.enable.dictionary#source", "true")
      .option("parquet.enable.dictionary#path", "true")
      .parquet(out)

    // metadata-only count from parquet footers — no second pass
    val written = spark.read.parquet(out)
    val rows = written.count()
    require(rows > 0, s"No rows written to $out") // F4 empty-output guard
    val bytes = written.agg(sum(length(col("content")))).head.getLong(0)
    val files = written.select("source").distinct().count()
    ConversionStats(rows, bytes, files)
  }

  /** Read a previous conversion output with the canonical schema. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.schema(ArchiveSchema.schema).parquet(path)
    df
  }
}

package graft

import graft.core.ConvertOptions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual converter-stage profile over the generated bench corpus:
  * walk-only (decompress+hash, no write) vs full convert per codec —
  * isolates whether the walk or the Parquet sink bounds throughput.
  * Run: sbt "Test/runMain graft.ConvertProfile [corpusDir] [reps]"
  */
object ConvertProfile {
  def main(args: Array[String]): Unit = {
    val corpusDir = if (args.nonEmpty) args(0) else "/tmp/graft_bench_corpus"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inputs = new java.io.File(corpusDir).listFiles()
      .filter(_.getName.endsWith(".tar.gz")).map(_.getAbsolutePath).toSeq
    require(inputs.nonEmpty, s"no corpus at $corpusDir — run graft.Bench once")

    def time(label: String)(body: => Unit): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"[profile] $label rep$i t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    // warmup
    graft.convert.ArchiveConverter.convert(
      spark, inputs.take(1), "/tmp/graft_profile_warm", ConvertOptions())

    time("walk_only") {
      val n = graft.convert.ArchiveConverter.entries(spark, inputs, ConvertOptions())
        .toDF().agg(sum(col("size"))).collect()(0).getLong(0)
      require(n > 0)
    }
    spark.sparkContext.hadoopConfiguration.set("parquet.compression.codec.zstd.level", "1")
    // interleave codecs across rounds so host-noise bursts hit all fairly
    (1 to reps).foreach { i =>
      Seq("zstd", "snappy", "uncompressed").foreach { codec =>
        val t0 = System.nanoTime()
        graft.convert.ArchiveConverter.convert(
          spark, inputs, "/tmp/graft_profile_out", ConvertOptions(compression = codec))
        println(f"[profile] convert_$codec rep$i t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}

package graft

import graft.convert.ArchiveConverter
import graft.core.ConvertOptions
import org.apache.spark.sql.SparkSession

/** Times the full Spark convert pipeline over the bench corpus.
  * Run: sbt "Test/runMain graft.ConvertSparkProbe <corpusDir> <out>"
  */
object ConvertSparkProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    val out = args(1)
    val inputs = dir.listFiles().filter(_.getName.endsWith(".tar.gz")).map(_.getAbsolutePath).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage A: walk + encode only (no write)
    val tA = System.nanoTime()
    val n = ArchiveConverter.entries(spark, inputs, ConvertOptions()).toDF()
      .selectExpr("sum(length(content))").head().getLong(0)
    val secsA = (System.nanoTime() - tA) / 1e9
    println(f"[csprobe] walk+encode bytes=$n secs=$secsA%.2f mbps=${n / 1e6 / secsA}%.1f")

    val df = ArchiveConverter.entries(spark, inputs, ConvertOptions()).toDF()
    def timed(tag: String)(f: => Unit): Unit = {
      val t = System.nanoTime()
      f
      println(f"[csprobe] $tag secs=${(System.nanoTime() - t) / 1e9}%.2f")
    }
    if (false) timed("write-noop") {
      df.write.mode("overwrite").format("noop").save()
    }
    if (false) timed("write-orc") {
      df.write.mode("overwrite").orc(out + "_orc")
    }
    if (false) timed("write-zstd") {
      df.write.mode("overwrite").option("compression", "zstd").parquet(out + "_zstd")
    }
    if (false) timed("write-unc2") {
      df.write.mode("overwrite").option("compression", "none").parquet(out + "_unc2")
    }
    if (false) timed("write-plain") {
      df.write.mode("overwrite").parquet(out + "_plain")
    }
    if (false) timed("write-uncompressed") {
      df.write.mode("overwrite").option("compression", "none").parquet(out + "_unc")
    }
    if (false) timed("write-nobloom") {
      df.write.mode("overwrite")
        .option("compression", "snappy")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.enable.dictionary#source", "true")
        .option("parquet.enable.dictionary#path", "true")
        .option("parquet.page.size", (1024 * 1024).toString)
        .option("parquet.page.row.count.limit", "2000")
        .parquet(out + "_nb")
    }
    timed("zstd-nobloom") {
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.bloom.filter.enabled", "false")
        .parquet(out + "_znb")
    }
    if (false) timed("zstd-bloom-ndv") {
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.bloom.filter.enabled", "false")
        .option("parquet.bloom.filter.enabled#source", "true")
        .option("parquet.bloom.filter.enabled#path", "true")
        .option("parquet.bloom.filter.enabled#hash", "true")
        .option("parquet.bloom.filter.expected.ndv#source", "100000")
        .option("parquet.bloom.filter.expected.ndv#path", "1000000")
        .option("parquet.bloom.filter.expected.ndv#hash", "1000000")
        .parquet(out + "_zndv")
    }
    if (false) timed("zstd-bare") {
      df.write.mode("overwrite").option("compression", "zstd").parquet(out + "_z0")
    }
    timed("zstd-bloom") {
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.bloom.filter.enabled", "false")
        .option("parquet.bloom.filter.enabled#source", "true")
        .option("parquet.bloom.filter.enabled#path", "true")
        .option("parquet.bloom.filter.enabled#hash", "true")
        .parquet(out + "_z1")
    }
    timed("zstd-dict") {
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.enable.dictionary#source", "true")
        .option("parquet.enable.dictionary#path", "true")
        .parquet(out + "_z2")
    }
    timed("zstd-pages") {
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.page.size", (1024 * 1024).toString)
        .option("parquet.page.row.count.limit", "2000")
        .parquet(out + "_z3")
    }
    val t0 = System.nanoTime()
    val stats = ArchiveConverter.convert(spark, inputs, out, ConvertOptions())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[csprobe] full $stats secs=$secs%.2f mbps=${stats.bytesRead / 1e6 / secs}%.1f")
    spark.stop()
  }
}

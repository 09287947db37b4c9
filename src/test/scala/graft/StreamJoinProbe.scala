package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch duration breakdown for the q46 stream-stream join.
  * Run: sbt "Test/runMain graft.StreamJoinProbe [sfDir] [partitions]"
  */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "32"
    val checksum = if (args.length > 2) args(2) else "true"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", checksum)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stageDir = java.nio.file.Files.createTempDirectory("graft_probe_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    def src = spark.readStream.schema(schema).parquet(stageDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val views = src.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      .withWatermark("vts", "2 hours")
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
      .withWatermark("pts", "2 hours")
    val joined = views.join(purchases,
      col("user_id") === col("p_user") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
    val t0 = System.nanoTime()
    val q = joined.writeStream.format("memory").queryName("probe_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    println(f"[probe] total=${(System.nanoTime() - t0) / 1e9}%.2f s parts=$parts rows=${spark.table("probe_sink").count()}")
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach(so =>
        println(s"[probe]   state: rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
          s"commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs} mem=${so.memoryUsedBytes}"))
    }
    spark.stop()
  }
}

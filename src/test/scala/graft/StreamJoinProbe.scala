package graft

import org.apache.spark.sql.SparkSession

/** Per-batch duration breakdown for the q46 stream-stream join — the
  * pipeline comes from [[graft.streaming.StreamJoins]], the exact code
  * the query ships, so tuning data cannot drift from the product.
  * Run: sbt "Test/runMain graft.StreamJoinProbe [sfDir] [partitions]"
  */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageDir = java.nio.file.Files.createTempDirectory("graft_probe_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val joined = graft.streaming.StreamJoins.viewPurchaseJoin(spark, stageDir.toString)
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
    java.nio.file.Files.deleteIfExists(stageDir.resolve("events.parquet"))
    java.nio.file.Files.deleteIfExists(stageDir)
    spark.stop()
  }
}

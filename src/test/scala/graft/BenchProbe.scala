package graft

import org.apache.spark.sql.SparkSession

/** Manual perf probe: time one named query repeatedly, print the plan.
  * Run: sbt "Test/runMain graft.BenchProbe <queryName> <sfDir> [reps]"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name rep$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

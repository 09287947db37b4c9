package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does localCheckpoint preserve outputPartitioning in
  * this Spark build, so a groupBy on the same key skips its Exchange?
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"g${i % 50}")).toDF("id", "gh")
    for ((name, ck) <- Seq(
        "stock" -> df.repartition(4, col("gh")).localCheckpoint(true),
        "shim " -> org.apache.spark.sql.graft.CheckpointShims
          .localCheckpointPartitioned(df.repartition(4, col("gh"))),
        "shimC" -> org.apache.spark.sql.graft.CheckpointShims
          .localCheckpointPartitioned(df.repartition(col("gh"))))) {
      println(s"== $name: rdd partitions ${ck.rdd.getNumPartitions}")
      ck.queryExecution.optimizedPlan match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          println("   LogicalRDD.outputPartitioning = " + l.outputPartitioning)
        case other => println("   not a LogicalRDD: " + other.getClass)
      }
      val agg = ck.groupBy("gh").count()
      println("   exchanges in agg plan: " +
        agg.queryExecution.executedPlan.toString.split("\n").count(_.contains("Exchange")))
      println("   agg result rows: " + agg.count())
      val jdf = ck.join(ck.groupBy("gh").count().where(col("count") > 1), Seq("gh"))
      println("   join plan:\n" + jdf.queryExecution.executedPlan.toString
        .split("\n").filter(l => l.contains("Exchange") || l.contains("Join"))
        .mkString("\n"))
      println("   join count: " + jdf.count())
    }
    spark.stop()
  }
}

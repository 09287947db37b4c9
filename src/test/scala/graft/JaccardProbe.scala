package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for the prefix-filtered Jaccard join,
  * built from the operator's OWN stage helper ([[Dedup.prefixRows]])
  * so the probe cannot drift from the shipped pipeline.
  * Run: sbt "Test/runMain graft.JaccardProbe [sfDir]"
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println(s"[probe] docs=${df.count()}")
    val t = 0.7
    for ((label, gram) <- Seq(
        "char5" -> Dedup.charGrams(col("text"), 5),
        "word3" -> array_sort(Dedup.shingles(col("text"), 3)))) {
      val gramSets = df.select(col("doc_id").as("__id"), gram.as("__sh"))
      timed(s"$label avg set size") {
        gramSets.select(avg(size(col("__sh")))).show()
      }
      for (freqOrder <- Seq(false, true)) {
        val pfx = Dedup.prefixRows(gramSets, t, freqOrder)
        timed(s"$label freq=$freqOrder prefix rows") { println(pfx.count()) }
        timed(s"$label freq=$freqOrder hottest prefix grams") {
          pfx.groupBy("__g").count().orderBy(desc("count")).show(5, false)
        }
        timed(s"$label freq=$freqOrder candidate pairs (pre-dedup)") {
          val a = pfx.select(col("__id").as("id_a"), col("__g"))
          val b = pfx.select(col("__id").as("id_b"), col("__g"))
          println(a.join(b, Seq("__g")).where(col("id_a") < col("id_b")).count())
        }
      }
    }
    spark.stop()
  }
}

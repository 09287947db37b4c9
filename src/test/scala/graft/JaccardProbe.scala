package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for the prefix-filtered Jaccard join.
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
    val gramSets = df.select(col("doc_id").as("__id"), Dedup.charGrams(col("text"), 5).as("__sh"))
    timed("gramSets count + avg set size") {
      gramSets.select(count(lit(1)), avg(size(col("__sh")))).show()
    }
    val t = 0.7
    val prefLen = (size(col("__sh")) - ceil(lit(t) * size(col("__sh"))).cast("int") + 1)
    // lexicographic prefix
    val pfxLex = gramSets.select(col("__id"), explode(slice(col("__sh"), lit(1), prefLen)).as("__g"))
    timed("lex prefix rows") { println(pfxLex.count()) }
    timed("lex hottest prefix grams") {
      pfxLex.groupBy("__g").count().orderBy(desc("count")).show(10, false)
    }
    timed("lex candidate pairs (pre-dedup)") {
      val a = pfxLex.select(col("__id").as("id_a"), col("__g"))
      val b = pfxLex.select(col("__id").as("id_b"), col("__g"))
      println(a.join(b, Seq("__g")).where(col("id_a") < col("id_b")).count())
    }
    // frequency-ordered prefix
    val exploded = gramSets.select(col("__id"), explode(col("__sh")).as("__g"))
    val freq = exploded.groupBy("__g").agg(count(lit(1)).as("__df"))
    val ordered = exploded.join(freq, "__g")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__df"), col("__g")))).as("__fs"))
      .select(col("__id"), expr("transform(__fs, x -> x.__g)").as("__sh"))
    val pfxFreq = ordered.select(col("__id"), explode(slice(col("__sh"), lit(1), prefLen)).as("__g"))
    timed("freq prefix rows") { println(pfxFreq.count()) }
    timed("freq hottest prefix grams (df)") {
      pfxFreq.groupBy("__g").count().orderBy(desc("count")).show(10, false)
    }
    timed("freq candidate pairs (pre-dedup)") {
      val a = pfxFreq.select(col("__id").as("id_a"), col("__g"))
      val b = pfxFreq.select(col("__id").as("id_b"), col("__g"))
      println(a.join(b, Seq("__g")).where(col("id_a") < col("id_b")).count())
    }
    spark.stop()
  }
}

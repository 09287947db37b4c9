package graft

import graft.convert.ArchiveConverter
import graft.core.ConvertOptions
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end smoke driver (not a ScalaTest suite): converts a
  * real on-disk archive through the full Spark pipeline and exercises
  * the custom-expression surface both as Columns and via SQL
  * registration. Run: sbt "Test/runMain graft.SmokeMain <archive> <out>"
  */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val Array(input, out) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stats = ArchiveConverter.convert(spark, Seq(input), out, ConvertOptions(unique = true))
    println(s"[smoke] stats=$stats")

    val df = ArchiveConverter.read(spark, out)
    df.select(col("source"), col("path"), col("size"), hex(col("hash")).as("sha"),
        GraftFunctions.is_utf8(col("content")).as("utf8"),
        GraftFunctions.format_kind(col("content")).as("kind"))
      .show(50, truncate = 60)

    GraftFunctions.register(spark)
    df.createOrReplaceTempView("entries")
    spark.sql(
      """SELECT path, is_utf8(content) AS utf8, format_kind(content) AS kind,
        |       simhash64(cast(content AS string)) AS sh
        |FROM entries ORDER BY path""".stripMargin).show(50, truncate = 60)

    spark.stop()
  }
}

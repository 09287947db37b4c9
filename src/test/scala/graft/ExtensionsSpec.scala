package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide integration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` has the engine's SQL
  * functions available with no per-session registration call.
  * (Suites run sequentially in the forked test JVM, so stopping any
  * lingering session here cannot race another suite.)
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions injects the SQL surface") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("ExtensionsSpec")
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT is_utf8(cast('hi' as binary)) AS u,
          |       simhash64('the quick brown fox') AS sh,
          |       format_kind(cast('MZ....' as binary)) AS fk""".stripMargin).head()
      assert(row.getBoolean(0))
      // SQL path and Column-function path resolve to the same expression
      val expected = spark.range(1)
        .select(graft.functions.GraftFunctions.simhash64(lit("the quick brown fox")))
        .head().getLong(0)
      assert(row.getLong(1) == expected)
      assert(row.getString(2) == "executable")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

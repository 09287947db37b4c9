package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must reach a RESOLVED logical plan against
  * the real test tables. A query that throws at analysis otherwise
  * silently vanishes from the driver's correctness check — which is
  * exactly what happened for two rounds when the on-disk events.ts
  * layout drifted and nine batch consumers started failing analysis.
  * One named test per registry entry keeps "cannot even plan" a red
  * test, not an omission. (Stream-backed entries execute their
  * bounded availableNow run as part of construction; that is the
  * cost of proving they still stand up against the current layout.)
  */
class QueryRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("QueryRegistrySpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name analyzes against sf0.001") {
      val analyzed = fn(spark, sfDir).queryExecution.analyzed
      assert(analyzed.resolved, s"$name produced an unresolved plan")
    }
  }

  test("every oracle refers to a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without a query: $missing")
  }
}

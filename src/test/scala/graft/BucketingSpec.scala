package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-located-join story for curated/converted outputs: two
  * tables bucketed on the join key sort-merge-join with ZERO exchanges
  * — the write-time bucketing replaces the per-query shuffle. This is
  * the storage layout a 100 TB deployment uses for fact-fact joins
  * (e.g. repeated joins of converter output against a hash->label
  * table): pay the partitioning once at write, never per query.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  private lazy val spark: SparkSession = {
    warehouse = java.nio.file.Files.createTempDirectory("graft_bucketing_wh")
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse.toUri.toString)
      // force the SMJ path: the point is the absence of the exchange,
      // not broadcastability of a toy table
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("BucketingSpec")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("bucketed+sorted tables join with no exchange and no sort") {
    import spark.implicits._
    val n = 1000
    val facts = (0 until n).map(i => (i.toLong % 100, s"f$i")).toDF("key", "payload")
    val dims = (0 until 100).map(i => (i.toLong, s"label$i")).toDF("key", "label")
    facts.write.mode("overwrite")
      .bucketBy(8, "key").sortBy("key").saveAsTable("b_facts")
    dims.write.mode("overwrite")
      .bucketBy(8, "key").sortBy("key").saveAsTable("b_dims")

    val joined = spark.table("b_facts").join(spark.table("b_dims"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketing must eliminate the shuffle:\n$plan")
    assert(joined.count() == n)

    // control: the same join on unbucketed parquet shuffles both sides
    val unb = facts.join(dims, "key")
    assert(unb.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}

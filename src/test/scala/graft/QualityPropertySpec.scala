package graft

import graft.ops.Quality
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the repetition metrics: on random documents —
  * including empty texts, runs of separators, single-token docs, and
  * high-repetition word soup — the distributed two-chain aggregation
  * must equal a direct per-document Scala computation. Fixed seed =>
  * deterministic.
  */
class QualityPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("QualityPropertySpec")
    .getOrCreate()

  private val sepGen: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", " \t ")
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    vocabSize <- Gen.chooseNum(1, 6) // tiny vocab => heavy repetition
    ws <- Gen.listOfN(n, Gen.chooseNum(0, vocabSize - 1).map(i => s"w$i"))
    seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    lead <- Gen.oneOf("", " ", "\t")
    trail <- Gen.oneOf("", " ", "\n")
  } yield lead + (if (ws.isEmpty) "" else ws.head + ws.tail.zip(seps).map { case (w, s) => s + w }.mkString) + trail

  private def expected(text: String): (Option[Long], Option[Long], Option[Double], Option[Double], Option[Double]) = {
    val ws = text.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq
    if (ws.isEmpty) (None, None, None, None, None)
    else {
      val n = ws.size.toLong
      val distinct = ws.distinct.size.toLong
      val topW = ws.groupBy(identity).values.map(_.size).max.toDouble
      val bigrams = ws.zip(ws.tail).map { case (a, b) => s"$a $b" }
      val topB =
        if (bigrams.isEmpty) None
        else Some(bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size)
      def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (Some(n), Some(distinct), Some(r6(1.0 - distinct.toDouble / n)),
        Some(r6(topW / n)), topB.map(r6))
    }
  }

  test("repetition metrics equal the direct per-document computation") {
    val prop = Prop.forAll(Gen.listOfN(12, docGen)) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Quality.repetition(df, "doc_id", "text")
        .collect()
        .map { r =>
          def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
          r.getLong(0) -> ((optL(1), optL(2), optD(3), optD(4), optD(5)))
        }
        .toMap
      docs.zipWithIndex.forall { case (t, i) => got(i.toLong) == expected(t) }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40).withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}

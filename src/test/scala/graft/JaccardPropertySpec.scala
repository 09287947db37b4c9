package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the prefix-filtered Jaccard join: on RANDOM
  * corpora drawn from deliberately tiny vocabularies (the adversarial
  * case for prefix filtering — every gram is shared by many docs), the
  * filtered result must equal the all-pairs computation exactly, for
  * both gram orders and both gram units. This exercises the
  * completeness proof (the smallest shared gram must fall in both
  * prefixes), not just the arithmetic. Fixed seed => deterministic.
  */
class JaccardPropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("JaccardPropertySpec")
    .getOrCreate()

  private val vocabGen: Gen[Seq[String]] =
    Gen.chooseNum(4, 12).map(n => (0 until n).map(i => s"w$i"))

  private case class Corpus(texts: Seq[String], threshold: Double, char: Boolean)

  private val corpusGen: Gen[Corpus] = for {
    vocab <- vocabGen
    nDocs <- Gen.chooseNum(5, 25)
    texts <- Gen.listOfN(nDocs, for {
      len <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    t <- Gen.oneOf(0.3, 0.5, 0.7, 0.9)
    ch <- Gen.oneOf(true, false)
  } yield Corpus(texts, t, ch)

  test("prefix-filtered pairs == all-pairs on shared-vocabulary corpora") {
    val prop = Prop.forAll(corpusGen) { c =>
      import spark.implicits._
      val df = c.texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val gram =
        if (c.char) Dedup.charGrams(col("text"), 3)
        else Dedup.shingles(col("text"), 2)
      val g = df.select(col("doc_id"), gram.as("sh"))
      val expected = g.as("a").join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          round(Dedup.jaccard(col("a.sh"), col("b.sh")), 6).as("j"))
        .where(col("j") >= c.threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      Seq(true, false).forall { freqOrder =>
        val got = Dedup.jaccardNearDupPairs(df, "doc_id", "text",
            threshold = c.threshold, shingleWidth = 2,
            charN = if (c.char) Some(3) else None, freqOrder = freqOrder)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
        val ok = got == expected
        if (!ok) println(s"MISMATCH t=${c.threshold} char=${c.char} freq=$freqOrder " +
          s"docs=${c.texts.size}\n got=$got\n exp=$expected")
        ok
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withInitialSeed(Seed(43L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}

package graft

import graft.functions.{CdcHelper, GraftFunctions}
import graft.ops.Cdc
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** FastCDC content-defined chunking: helper invariants, the dedup
  * resync property the operator exists for, and the DataFrame surface
  * ([[GraftFunctions.cdc_chunks]] / [[graft.ops.Cdc]]).
  */
class CdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("CdcSpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def bytes(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = CdcHelper.mix64(seed ^ (i.toLong * 0x9E3779B97F4A7C15L)).toByte
      i += 1
    }
    out
  }

  private def chunksOf(data: Array[Byte], mn: Int = 2048, avg: Int = 8192,
      mx: Int = 65536): Seq[(Long, Int, String)] =
    CdcHelper.chunks(data, mn, avg, mx).array.toSeq.map { r =>
      val row = r.asInstanceOf[InternalRow]
      (row.getLong(0), row.getInt(1), row.getUTF8String(2).toString)
    }

  test("coverage, bounds and determinism on random streams") {
    for (n <- Seq(0, 1, 2047, 2048, 2049, 65536, 65537, 262144)) {
      val data = bytes(0xABCDEF0L + n, n)
      val cs = chunksOf(data)
      // chunks tile the input exactly: contiguous, in order, full cover
      assert(cs.map(_._2.toLong).sum == n.toLong, s"n=$n coverage")
      cs.foldLeft(0L) { case (expect, (off, sz, _)) =>
        assert(off == expect, s"n=$n offset")
        assert(sz > 0, s"n=$n empty chunk")
        off + sz
      }
      // every chunk but the last respects min..max; the last only max
      cs.dropRight(1).foreach { case (_, sz, _) =>
        assert(sz >= 2048 && sz <= 65536, s"n=$n size=$sz")
      }
      cs.lastOption.foreach { case (_, sz, _) => assert(sz <= 65536) }
      assert(chunksOf(data) == cs, s"n=$n determinism")
    }
  }

  test("a stream shorter than min is one chunk; degenerate bytes hit max") {
    assert(chunksOf(bytes(7L, 100)).map(_._2) == Seq(100))
    // constant bytes: gear fp never varies, so every cut is the max cap
    val flat = Array.fill[Byte](200000)(0x41)
    val sizes = chunksOf(flat).map(_._2)
    assert(sizes.dropRight(1).forall(_ == 65536))
  }

  test("insertion re-aligns within ~one chunk (the CDC property)") {
    val base = bytes(0x5151L, 131072)
    val shifted = Array[Byte](1, 2, 3) ++ base
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(shifted).map(_._3)
    // all but the first resync chunk of the shifted stream re-appear
    assert(b.toSet.intersect(a.toSet).size >= a.size - 2,
      s"expected near-total hash reuse, got ${b.toSet.intersect(a.toSet).size} of ${a.size}")
  }

  test("q95 fixture: the planted 96 KiB duplicate re-emits 9 chunk hashes") {
    val cs = chunksOf(graft.queries.Inventory.cdcFixtureBytes())
    assert(cs.size == 29)
    assert(cs.map(_._2.toLong).sum == 262144L)
    val dupOccurrences = cs.groupBy(_._3).values.map(_.size - 1).sum
    assert(dupOccurrences == 9, s"got $dupOccurrences duplicate chunk occurrences")
    // spot-pin the independently derived first/boundary rows (full
    // 29-row check is q95's DuckDB oracle)
    assert(cs.head == ((0L, 3169,
      "a50211b0fe237d28aa31e37158bfffed7609b7c775a60b08aaa38a9093230553")))
    assert(cs(19) == ((169647L, 9343,
      "2e708c9cb7b97ffbc2640308852339931d342e37660466ceee0137fb67008dc1")))
  }

  test("chunkTable + dedupStats: planted duplicates shrink distinct bytes") {
    import spark.implicits._
    val shared = bytes(0x77L, 65536)
    val docs = Seq(
      ("a", bytes(0x1L, 40000) ++ shared),
      ("b", bytes(0x2L, 40000) ++ shared),
      ("c", bytes(0x3L, 40000))).toDF("id", "content")
    val chunks = Cdc.chunkTable(docs, "id", "content")
    val total = chunks.count()
    val stats = Cdc.dedupStats(chunks).collect().head
    assert(stats.getAs[Long]("total_chunks") == total)
    assert(stats.getAs[Long]("distinct_chunks") < total,
      "shared 64 KiB region must produce repeated chunk hashes")
    val ratio = stats.getAs[Double]("dedup_ratio")
    assert(ratio > 0.0 && ratio < 1.0, s"ratio=$ratio")
    assert(stats.getAs[Long]("total_bytes") == 3L * 40000 + 2L * 65536)
  }

  test("chunksStream: part seams never move a cut (boundary invariance)") {
    val data = bytes(0xCA11L, 700001)
    val whole = chunksOf(data)
    // several unaligned part sizes, incl. smaller than min and one
    // giant part — every split must reproduce the whole-entry cuts
    for (partSize <- Seq(1000, 65536, 100000, 1 << 17 | 13, 700001, 1000000)) {
      val parts = data.grouped(partSize).toSeq
      val streamed = CdcHelper.chunksStream(parts.iterator, 2048, 8192, 65536).toSeq
      assert(streamed == whole, s"partSize=$partSize")
    }
    // degenerate shapes
    assert(CdcHelper.chunksStream(Iterator.empty, 2048, 8192, 65536).isEmpty)
    assert(CdcHelper.chunksStream(Iterator(Array.emptyByteArray), 2048, 8192, 65536).isEmpty)
    // constant bytes: every cut is max-forced exactly at the buffer end
    // sometimes — the size==max confirmation path
    val flat = Array.fill[Byte](262144)(0x41)
    assert(CdcHelper.chunksStream(flat.grouped(65536).iterator, 2048, 8192, 65536).toSeq
      == chunksOf(flat))
    // fuzz: 50 seeded RANDOM split vectors (parts of 1..150000 bytes,
    // incl. empty parts) must all reproduce the whole-stream cuts
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { trial =>
      val splits = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var off = 0
      while (off < data.length) {
        val take = if (rnd.nextInt(10) == 0) 0 else 1 + rnd.nextInt(150000)
        val end = math.min(off + take, data.length)
        splits += java.util.Arrays.copyOfRange(data, off, end)
        off = end
      }
      assert(CdcHelper.chunksStream(splits.iterator, 2048, 8192, 65536).toSeq == whole,
        s"trial=$trial parts=${splits.map(_.length).mkString(",")}")
    }
  }

  test("chunkTableOverParts: chunked-walk parts chunk as the whole entry") {
    import spark.implicits._
    // an entry split at an artificial 100 KB seam (the maxEntryBytes
    // shape) + a small single-part entry; shuffled part order to prove
    // the sorted-group reassembly
    val big = bytes(0xB16L, 350003)
    val partsDf = (big.grouped(100000).zipWithIndex.map { case (p, i) =>
      ("big", i.toLong, p)
    }.toSeq.reverse :+ (("small", 0L, bytes(0x5AL, 5000))))
      .toDF("entry", "content_part", "content")
    val got = Cdc.chunkTableOverParts(partsDf, "entry", "content_part", "content")
      .orderBy(col("entry"), col("offset"))
      .as[(String, Long, Int, String)].collect().toSeq
    val want = chunksOf(big).map { case (o, s2, h) => ("big", o, s2, h) } ++
      chunksOf(bytes(0x5AL, 5000)).map { case (o, s2, h) => ("small", o, s2, h) }
    assert(got == want)
  }

  test("chunked walk -> chunkTableOverParts: CDC invariant to maxEntryBytes") {
    import graft.core.ConvertOptions
    import graft.convert.ArchiveConverter
    import java.io.{File, FileOutputStream}
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    // a tar.gz with one 300 KB member — walked with a 100 KB cap it
    // splits into 3 content_part rows at artificial seams
    val payload = bytes(0xFEEDL, 300000)
    val f = File.createTempFile("cdcwalk", ".tar.gz")
    f.deleteOnExit()
    val tar = new TarArchiveOutputStream(new GZIPOutputStream(new FileOutputStream(f)))
    val e = new TarArchiveEntry("big.bin")
    e.setSize(payload.length.toLong)
    tar.putArchiveEntry(e); tar.write(payload); tar.closeArchiveEntry(); tar.close()
    val parts = ArchiveConverter.chunkedEntries(spark, Seq(f.getAbsolutePath),
      ConvertOptions(maxEntryBytes = 100000L)).toDF()
    assert(parts.count() == 3, "expected the entry split into 3 parts")
    val got = Cdc.chunkTableOverParts(parts, "path", "content_part", "content")
      .orderBy(col("offset"))
      .select(col("offset"), col("size"), col("sha256"))
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got == chunksOf(payload),
      "cut points must not move at the 100 KB part seams")
  }

  test("null content yields null; bad sizes fail at analysis") {
    import spark.implicits._
    val df = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("content")
    val out = df.select(GraftFunctions.cdc_chunks(col("content")).as("c")).collect()
    assert(out.head.isNullAt(0))
    intercept[AnalysisException] {
      Seq(Tuple1(Array[Byte](1))).toDF("content")
        .select(GraftFunctions.cdc_chunks(col("content"), avg = 1000)).collect()
    }
    intercept[AnalysisException] {
      Seq(Tuple1(Array[Byte](1))).toDF("content")
        .select(GraftFunctions.cdc_chunks(col("content"), min = 8192, avg = 8192)).collect()
    }
  }
}

package graft.queries

import graft.convert.ArchiveConverter
import graft.core.{ConvertOptions, IncludeType}
import graft.functions.{GraftFunctions, TextStats}
import graft.ops.{Dedup, MultiModal, Packing, Quality, Sampling, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import scala.collection.immutable.ListMap

/** The declared query inventory (SURVEY.md §2.9 Q1–Q16 plus the
  * training-data-pipeline operators): every capability of the engine as
  * a named DataFrame query over the driver test tables, each with an
  * ANSI-SQL oracle where SQL can express it.
  *
  * Oracle-parity rules used throughout (Spark vs DuckDB):
  *   - money aggregates go through DECIMAL(18,2) (the source doubles
  *     are 2-decimal values, so the cast is exact and engine-agnostic;
  *     decimal sums are exact) and are cast back to DOUBLE at the end —
  *     bit-identical on both engines, no fp-summation-order drift;
  *   - every aggregate / computed column is explicitly aliased and
  *     integer-typed columns are cast to BIGINT on both sides
  *     (DuckDB's sum(int) is HUGEINT, row_number is BIGINT);
  *   - every query has a deterministic total ORDER BY;
  *   - ratios/cosines are divisions of identical inputs → identical
  *     doubles; rounded to 6 decimals anyway.
  */
object Inventory {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // the generator has shipped events.ts as both TIMESTAMP(NANOS)
      // and timestamp[us] across rounds — sniff the footer and adapt
      // (see graft.sources.EventsTable)
      graft.sources.EventsTable.read(spark, s"$dir/$name.parquet")
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Exact engine-agnostic money representation (see scaladoc). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Run a bounded streaming query with a small state-partition count.
    * The number of state partitions is fixed at stream start from
    * `spark.sql.shuffle.partitions`, and every state store pays a
    * per-store fixed commit cost per micro-batch (~1 s measured on the
    * HDFS-backed provider; a stream-stream join keeps FOUR stores per
    * partition, so 32 partitions = 128 store commits per batch for KBs
    * of state). Bounded parity queries size to their state — a real
    * deployment sizes partitions to state volume, not core count.
    */
  private def withStreamPartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Stage one table file into a fresh ingest directory (the file
    * stream source requires a directory) and clean it up afterwards —
    * repeated bench runs must not accumulate table copies in /tmp. The
    * body must finish streaming before returning; memory-sink reads
    * after that no longer touch the source files.
    */
  private def withStagedTable[T](d: String, table: String)(f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_src_$table")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/$table.parquet"),
      dir.resolve(s"$table.parquet"))
    try f(dir.toString)
    finally {
      java.nio.file.Files.deleteIfExists(dir.resolve(s"$table.parquet"))
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  private val oneDec: Column = lit(1).cast(DecimalType(18, 2))

  // -------------------------------------------------------------------
  // Q1–Q15: relational surface
  // -------------------------------------------------------------------

  private def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .where(col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private def q03(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  private def q04(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  private def q05(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("with").as("side"), col("c_custkey"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("without").as("side"), col("c_custkey"))
    withOrders.unionAll(withoutOrders).orderBy(col("side"), col("c_custkey"))
  }

  private def q06(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private def q08(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private def q09(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(10)

  private def q10(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val a = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val b = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    a.except(b).select(lit("except").as("op"), col("c_custkey"))
      .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("c_custkey")))
      .orderBy(col("op"), col("c_custkey"))
  }

  private def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique_texts"))
      .orderBy(col("lang"))

  private def q12(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        date_trunc("month", col("o_orderdate")).cast("date").as("omonth"),
        round(col("o_totalprice"), 0).as("price_round"),
        round(sqrt(col("o_totalprice")), 6).as("price_sqrt"))
      .orderBy(col("o_orderkey"))

  private def q13(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("total_k"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  private val OnesQuery: Array[Double] = Array.fill(64)(1.0)

  private def q14(s: SparkSession, d: String): DataFrame =
    Similarity.cosineTopK(t(s, d, "embeddings"), "vec_id", "embedding", OnesQuery, 10)

  private def q15(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("ws"), col("event_type"))

  // -------------------------------------------------------------------
  // Q16: the converter end-to-end (non-SQL — rows-only check; full
  // semantics are covered by WalkerSpec against reference test vectors)
  // -------------------------------------------------------------------

  /** The q16 fixture's expected WALK OUTPUT, as spec literals:
    * (nested path, decompressed bytes). Oracle sizes/digests — q16's
    * VALUES and q74's per-chunk VALUES — are computed from these
    * definitions directly, never from engine output.
    */
  private[queries] val FixtureLeaves: Seq[(String, Array[Byte])] = Seq(
    "a.txt" -> ("graft converter end-to-end fixture line\n" * 20).getBytes("UTF-8"),
    "inner.zip/b/c.txt" -> "nested zip member content\n".getBytes("UTF-8"),
    "inner.zip/d.bin" -> Array.tabulate[Byte](512)(i => (i * 7 % 256).toByte),
    "e.txt.zst" -> ("zstd transparent decompression fixture\n" * 10).getBytes("UTF-8"),
    "f.txt.xz" -> ("xz transparent decompression fixture\n" * 10).getBytes("UTF-8"),
    "g.txt.bz2" -> ("bzip2 transparent decompression fixture\n" * 10).getBytes("UTF-8"),
    "inner2.tar.zst/h.txt" -> ("zstd-compressed nested tar member\n" * 5).getBytes("UTF-8"))

  /** Deterministic nested fixture: tar.gz[ a.txt, inner.zip[ b/c.txt, d.bin ] ]. */
  private[queries] def buildFixture(): String = {
    import java.io._
    import java.util.zip._
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val leaves = FixtureLeaves.toMap
    val textA = leaves("a.txt")
    val textC = leaves("inner.zip/b/c.txt")
    val binD = leaves("inner.zip/d.bin")
    // S6 transparent-decompression members: a merely-compressed
    // non-archive entry must be emitted DECOMPRESSED (reference
    // entry.rs:70-80), with size/hash of the decompressed bytes — one
    // member per codec beyond the gzip already covering the outer
    // layer, plus a zstd-compressed NESTED TAR for recursion through a
    // non-gzip codec.
    val textE = leaves("e.txt.zst")
    val textF = leaves("f.txt.xz")
    val textG = leaves("g.txt.bz2")
    val textH = leaves("inner2.tar.zst/h.txt")
    def zstd(b: Array[Byte]): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(buf)
      z.write(b); z.close(); buf.toByteArray
    }
    def xz(b: Array[Byte]): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      val x = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(buf)
      x.write(b); x.close(); buf.toByteArray
    }
    def bz2(b: Array[Byte]): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(buf)
      z.write(b); z.close(); buf.toByteArray
    }

    val zipBuf = new ByteArrayOutputStream()
    val zo = new ZipOutputStream(zipBuf)
    def zput(name: String, bytes: Array[Byte]): Unit = {
      val e = new ZipEntry(name)
      // fixed timestamp => byte-stable fixture across runs
      e.setTime(1000000000000L)
      zo.putNextEntry(e); zo.write(bytes); zo.closeEntry()
    }
    zput("b/c.txt", textC); zput("d.bin", binD); zo.close()

    def tarOf(entries: (String, Array[Byte])*): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      val to = new TarArchiveOutputStream(buf)
      entries.foreach { case (name, bytes) =>
        val e = new TarArchiveEntry(name)
        e.setSize(bytes.length.toLong); e.setModTime(1000000000000L)
        to.putArchiveEntry(e); to.write(bytes); to.closeArchiveEntry()
      }
      to.close(); buf.toByteArray
    }

    val tarBuf = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(tarBuf)
    gz.write(tarOf(
      "a.txt" -> textA,
      "inner.zip" -> zipBuf.toByteArray,
      "e.txt.zst" -> zstd(textE),
      "f.txt.xz" -> xz(textF),
      "g.txt.bz2" -> bz2(textG),
      "inner2.tar.zst" -> zstd(tarOf("h.txt" -> textH))))
    gz.close()

    // fixed path, rewritten per invocation — repeated bench/verify runs
    // must not accumulate fixture dirs in /tmp (same rule as q41)
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q16_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.tar.gz")
    val fos = new FileOutputStream(f)
    fos.write(tarBuf.toByteArray); fos.close()
    f.getAbsolutePath
  }

  private def q16(s: SparkSession, d: String): DataFrame = {
    val path = buildFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** The walker's SQL face: `LATERAL VIEW explode_archive(blob)` over
    * the same nested fixture as q16, checked against the same
    * spec-determined VALUES oracle — the Generator path (SURVEY §2.2)
    * through the correctness gate.
    */
  private def q42(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(buildFixture()))
    import s.implicits._
    Seq(Tuple1(bytes)).toDF("blob").createOrReplaceTempView("graft_q42_blobs")
    s.sql(
      """SELECT a.path, a.size, lower(hex(a.hash)) AS sha256
        |FROM graft_q42_blobs LATERAL VIEW explode_archive(blob) a
        |ORDER BY a.path""".stripMargin)
  }

  /** q58 fixture members — spec constants shared by the fixture builder
    * AND the VALUES oracle (the oracle's sizes/digests are computed from
    * these definitions directly with `MessageDigest`, never from engine
    * output). Names declare the expected filter outcome; the binary
    * members cover the UTF-8 rejection classes the reference's validator
    * distinguishes (src/batch.rs:162-180): stray continuation byte,
    * overlong encoding, multibyte sequence truncated at EOF.
    */
  private val Q58Members: Seq[(String, Array[Byte])] = Seq(
    "keep_ascii.txt" ->
      ("the quick brown fox jumps over the lazy dog\n" * 8).getBytes("UTF-8"),
    // size-0 entries are dropped by the WALK itself, before any filter —
    // reference parity (tarfile.rs:24-26), asserted here via drop_ name
    "drop_empty_by_walk.txt" -> Array.emptyByteArray,
    "keep_multibyte.txt" ->
      ("héllo wörld — ünïcode € ✓\n" * 4).getBytes("UTF-8"),
    "drop_stray_continuation.bin" ->
      ("ascii prefix ".getBytes("UTF-8") ++ Array(0x80.toByte) ++ " suffix".getBytes("UTF-8")),
    "drop_overlong.bin" ->
      (Array(0xC0.toByte, 0x80.toByte) ++ "overlong nul encoding".getBytes("UTF-8")),
    "drop_truncated.bin" ->
      ("truncated euro sign: ".getBytes("UTF-8") ++ Array(0xE2.toByte, 0x82.toByte)))

  private def buildQ58Fixture(): String = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val buf = new ByteArrayOutputStream()
    val to = new TarArchiveOutputStream(new GZIPOutputStream(buf))
    Q58Members.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong); e.setModTime(1000000000000L)
      to.putArchiveEntry(e); to.write(bytes); to.closeArchiveEntry()
    }
    to.close()
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q58_fixture")
    dir.mkdirs()
    val f = new File(dir, "mixed.tar.gz")
    val fos = new FileOutputStream(f); fos.write(buf.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** F2 through the oracle gate: the converter's `include=text` UTF-8
    * filter (reference src/batch.rs:162-180) over the mixed fixture —
    * only the valid-UTF-8 members survive, checked against a
    * spec-determined VALUES oracle like q16.
    */
  private def q58(s: SparkSession, d: String): DataFrame = {
    // deliberately a file: URL, not a path: S2's URL source streams
    // through the same sniff/decompress/walk chain, so this row set is
    // identical to the path spelling — oracle coverage for the URL
    // face (the http:// variant is WalkerSpec's real-server test)
    val path = "file://" + buildQ58Fixture()
    ArchiveConverter.filteredEntries(s, Seq(path),
        ConvertOptions(include = IncludeType.Text))
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** F1 half-open size-range filter through the oracle: the q16
    * fixture converted with `100 <= size < 500` keeps exactly the
    * four mid-sized members — the spec-filtered subset of the q16
    * VALUES (a.txt 800 and d.bin 512 fall above, c.txt 26 below;
    * sizes are DECOMPRESSED sizes, so the filter runs after the
    * transparent-decompression stage, reference batch.rs:182-197).
    */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val path = buildFixture()
    ArchiveConverter.filteredEntries(s, Seq(path),
        ConvertOptions(minSize = Some(100L), maxSize = Some(500L)))
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** q59 blob — exercises `extract_strings`' three spec behaviors
    * (reference crates/extract-strings/src/ascii.rs:5-130): a run of
    * exactly minLength emits; runs shorter than minLength are NOT
    * discarded but accumulate across non-text bytes until the pending
    * buffer reaches minLength (boundary carry — "abcdefghi"+"jk" emits
    * as one 11-char string); end-of-stream flushes a pending buffer of
    * >= minLength ("no"+"final trailing run!"). Expected strings are
    * derived BY HAND from the spec and inlined in the oracle.
    */
  private val Q59Blob: Array[Byte] =
    Array[Byte](0, 0) ++ "ABCDEFGHIJ".getBytes("UTF-8") ++ Array(0x01.toByte) ++
      "abcdefghi".getBytes("UTF-8") ++ Array(0xFF.toByte) ++ "jk".getBytes("UTF-8") ++
      Array[Byte](0) ++ "no".getBytes("UTF-8") ++ Array(0x02.toByte) ++
      "final trailing run!".getBytes("UTF-8")

  /** P3 through the oracle gate: ASCII-string extraction over the
    * crafted blob (the converter applies the same function to
    * executable entries, ArchiveWalker P3 path).
    */
  private def q59(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Seq(Tuple1(Q59Blob)).toDF("blob")
      .select(posexplode(GraftFunctions.extract_strings(col("blob"), 10)))
      .select(col("pos").cast("long").as("idx"), col("col").as("s"))
      .orderBy(col("idx"))
  }

  // -------------------------------------------------------------------
  // Q17+: training-data pipeline operators
  // -------------------------------------------------------------------

  private def q17(s: SparkSession, d: String): DataFrame =
    Dedup.exactWinners(t(s, d, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  private def q18(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupPairs(t(s, d, "documents"), "doc_id", "text", threshold = 0.8)
      .orderBy(col("id_a"), col("id_b"))

  private def q19(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(TextStats.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextStats.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextStats.avgTokenLen(col("text")), 6).as("avg_tok_len"),
        TextStats.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  private def q20(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("lang"), TextStats.tokenCount(col("text")).cast("long").as("tc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tc")).as("total_tokens"),
        min(col("tc")).as("min_tokens"),
        max(col("tc")).as("max_tokens"),
        round(sum(col("tc")).cast("double") / count(lit(1)), 6).as("avg_tokens"))
      .orderBy(col("lang"))

  private def q21(s: SparkSession, d: String): DataFrame =
    // maxHamming=3 with 5-chunk PAIR banding (C(5,2)=10 keys) is
    // pigeonhole-complete: <=3 flipped bits touch <=3 of the 5 chunks,
    // so >=2 chunks survive intact and their pair key collides — the
    // result equals the all-pairs Hamming filter the oracle computes
    Dedup.simhashNearDup(t(s, d, "documents"), "doc_id", "text", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  private def q22(s: SparkSession, d: String): DataFrame = {
    // the winnowing fingerprint *set* per document: count + min/max of
    // distinct selected gram hashes (the set of per-window minima) —
    // md5-based gram hashes make this exactly reproducible in SQL
    val fp = GraftFunctions.fingerprint(col("text"))
    t(s, d, "documents")
      .select(col("doc_id"),
        coalesce(size(array_distinct(fp)).cast("long"), lit(0L)).as("n_fp"),
        array_min(fp).as("fp_min"),
        array_max(fp).as("fp_max"))
      .orderBy(col("doc_id"))
  }

  private def q23(s: SparkSession, d: String): DataFrame =
    // h=8 / probe<=2 scans ~37/256 ≈ 14% of buckets — good recall at
    // this corpus size while still pruning 86% of the scan
    Similarity.annLshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
      OnesQuery, k = 10, dim = 64, h = 8, probeHamming = 2)

  private def q24(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(TextStats.langGuess(col("text")).as("guess"))
      .groupBy(col("guess")).agg(count(lit(1)).as("n"))
      .orderBy(col("guess"))

  private def q25(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingNearDupPairsExact(t(s, d, "embeddings"), "vec_id", "embedding",
      threshold = 0.45)
      .orderBy(col("id_a"), col("id_b"))

  private def q26(s: SparkSession, d: String): DataFrame = {
    // multimodal plumbing: documents' text bytes stand in for opaque
    // media blobs; decode(stub) -> typed meta struct -> feature vector,
    // aggregated per fake format. The stub codec is deliberately
    // SQL-expressible (and the corpus is ASCII, so byte==char), making
    // the whole mapPartitions pipeline oracle-checkable. Cross-row
    // double sums go through 6-dp DECIMAL (order-insensitive, exact).
    val media = t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
    val decoded = MultiModal.imageFeatures(
      MultiModal.withImageMeta(media, "bytes"), "bytes")
    decoded
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(element_at(col("features"), 1), 6).cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 6).as("avg_c0"),
        round(sum(col("meta.width").cast("long")).cast("double") / count(lit(1)), 6)
          .as("avg_width"))
      .orderBy(col("format"))
  }

  private def q27(s: SparkSession, d: String): DataFrame = {
    // Structured Streaming parity: the same tumbling-window aggregation
    // as q15, computed BY THE STREAMING ENGINE (file source ->
    // availableNow trigger -> complete-mode memory sink) and checked
    // against the batch DuckDB oracle. Schema is footer-derived (file
    // stream sources don't infer) and ts layout-adaptive.
    val name = "graft_q27_sink"
    withStagedTable(d, "events") { stageDir =>
      val stream = graft.sources.EventsTable.readStream(s, stageDir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      withStreamPartitions(s, 8) {
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
    }
    s.table(name).orderBy(col("ws"), col("event_type"))
  }

  /** As-of join via [[graft.ops.AsOf]]: for each 'click' event, the
    * user's most recent 'purchase' at-or-before the click. Ties at one
    * (user, ts) resolve to the max value through the window tiebreak —
    * same result as DuckDB's ASOF JOIN against a max-per-ts right side,
    * with no pre-aggregation exchange (one shuffle total).
    */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    graft.ops.AsOf.join(clicks, purchases, "user_id", "ts",
        valueCols = Seq("pv"), tiebreak = "pv")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts").as("pts"), col("pv"))
      .orderBy(col("event_id"))
  }

  /** Session windows (gap-based): events of a user belong to one
    * session while consecutive gaps stay under 4 hours; window end =
    * last event + gap. Oracle: gaps-and-islands SQL.
    */
  private def q29(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("session_window.start").as("ss"), col("session_window.end").as("se"),
        col("user_id"), col("n"), col("total_value"))
      .orderBy(col("user_id"), col("ss"))

  /** Full grouping-sets coverage: CUBE over (mktsegment, priority)
    * (q08 covers ROLLUP).
    */
  private def q30(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** The LSH-banded (scale-path) embedding near-dup variant of q25:
    * candidates = pairs colliding in >=1 of 8 8-bit sign-LSH tables,
    * verified by exact cosine. Oracle recomputes the same codes from
    * the inlined ±1 planes, so the result (candidates ∩ cos>=t) is
    * exact on both engines.
    */
  private def q31(s: SparkSession, d: String): DataFrame =
    Similarity.embeddingNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
      threshold = 0.45, dim = 64, tables = 8, bitsPerTable = 8)
      .orderBy(col("id_a"), col("id_b"))

  /** Interval/range join (§2.8): clicks landing inside the 1-hour
    * window after a same-user purchase. The window side is broadcast
    * (it is the filtered, projected small side); the range predicate
    * then evaluates stream-side with no shuffle at all. At 100 TB with
    * two large sides the plan becomes bin-bucketing: floor(ts to 1h)
    * equi-keys on both sides (+1 neighbor bin), shuffle on
    * (user, bin), residual range filter — same declarative shape, one
    * added `explode(bins)`.
    */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val windows = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    clicks.join(broadcast(windows),
        col("user_id") === col("p_user") &&
          col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select(col("click_id"), col("purchase_id"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Connected components over the near-dup pair graph: each doc in a
    * pair gets the min doc_id reachable through pairs — the canonical
    * survivor of its dup cluster. The iterative label-propagation
    * DataFrame loop ([[Dedup.components]]) is checked against a
    * recursive-CTE transitive closure in the oracle.
    */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.nearDupPairs(t(s, d, "documents"), "doc_id", "text", threshold = 0.8)
    Dedup.components(pairs).orderBy(col("id"))
  }

  /** Skewed aggregation via salting ([[graft.ops.Skew]]): events have
    * only 5 event_type keys — at 32 shuffle partitions an unsalted
    * final phase leaves 27 reducers idle. The salted plan splits each
    * hot key across 16 reducers and merges exactly (counts + DECIMAL
    * sums are associative). Result is identical to the plain GROUP BY,
    * which is the oracle.
    */
  private def q34(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.saltedCountSum(t(s, d, "events"), "event_type",
        dec(col("value")), salts = 16)
      .select(col("event_type"), col("n"),
        col("total").cast("double").as("total_value"))
      .orderBy(col("event_type"))

  /** Window frame coverage beyond q06/q07: lag/lead offsets and a
    * RANGE frame (trailing 30-day revenue per customer, keyed on an
    * epoch-day ordering column — peers at the same day share the
    * frame, exactly DuckDB's RANGE semantics).
    */
  private def q35(s: SparkSession, d: String): DataFrame = {
    val w1 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wr = Window.partitionBy(col("o_custkey"))
      .orderBy(datediff(col("o_orderdate"), to_date(lit("1970-01-01"))))
      .rangeBetween(-30, 0)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w1).as("prev_price"),
        lead(col("o_orderdate"), 1).over(w1).as("next_date"),
        sum(dec(col("o_totalprice"))).over(wr).cast("double").as("trailing_30d"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Typed-Aggregator top-k per group ([[graft.ops.TopKByScore]], the
    * §2.8 UDAF surface): top-3 documents per language by token count.
    * Unlike the q06 window shape, the map-side partial keeps only k
    * pairs per group per partition — the shuffle never carries the
    * full group.
    */
  private def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "documents")
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"),
        GraftFunctions.token_count(col("text")).cast("double").as("score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(graft.ops.TopKByScore(3).toColumn.name("top"))
      .toDF("lang", "top")
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col._2").as("doc_id"), col("col._1").as("score"))
      .orderBy(col("lang"), col("rank"))
  }

  /** IVF ANN ([[Similarity.ivfTopK]]): nearest-centroid cell
    * assignment over a 16-entry codebook, probe the 4 cells nearest
    * the query, exact re-rank inside. The oracle recomputes the
    * assignment and probe from the same deterministic codebook (the 16
    * smallest-id vectors).
    */
  private def q37(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
      OnesQuery, k = 10, nlist = 16, nprobe = 4)

  /** Streaming stateful dedup (§2.8's one reference-motivated stateful
    * op, D1 as a stream): file source -> md5(text) ->
    * `dropDuplicates` backed by the state store -> append-mode memory
    * sink under an availableNow trigger. Which row survives is
    * engine-arbitrary, so the checked output is the surviving hash SET
    * (= batch DISTINCT, the oracle).
    */
  private def q38(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val name = "graft_q38_sink"
    withStagedTable(d, "documents") { stageDir =>
      val stream = s.readStream.schema(schema).parquet(stageDir)
        .select(md5(col("text").cast("binary")).as("h"))
        .dropDuplicates("h")
      withStreamPartitions(s, 8) {
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
    }
    s.table(name).select(col("h")).orderBy(col("h"))
  }

  /** Custom-state sessionization ([[graft.streaming.StatefulSessions]],
    * the §2.8 `flatMapGroupsWithState` surface): same sessions as the
    * native `session_window` (q29) — and the same gaps-and-islands
    * oracle — computed by explicit per-group state code.
    */
  private def q39(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = t(s, d, "events")
      .select(col("user_id").cast("long"), unix_micros(col("ts")), col("value"))
      .as[(Long, Long, Double)]
    graft.streaming.StatefulSessions.sessionize(ev, gapMicros = 4L * 3600 * 1000000)
      .select(timestamp_micros(col("ssu")).as("ss"), timestamp_micros(col("seu")).as("se"),
        col("user_id"), col("n"), col("total_value"))
      .orderBy(col("user_id"), col("ss"))
  }

  /** Exact (sort-based) percentiles per group — the order-statistics
    * aggregation surface. Spark's `percentile` and DuckDB's
    * `quantile_cont` both compute the type-7 interpolated quantile on
    * the fully sorted group.
    */
  private def q40(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** Sliding (hopping) windows — 2-hour windows every hour, so each
    * event lands in exactly two windows (q15/q27 cover tumbling).
    */
  private def q43(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("ws"), col("event_type"))

  /** Bucketed storage + co-located join: both sides written
    * `bucketBy(custkey)` into the session catalog, then joined and
    * aggregated. Write-time bucketing replaces the per-query join
    * shuffle (the exchange-free SMJ plan is asserted in BucketingSpec;
    * at 100 TB this is the layout for repeated fact-fact joins — pay
    * the partitioning once at write, never per query).
    */
  private def q41(s: SparkSession, d: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS graft_q41_orders")
    s.sql("DROP TABLE IF EXISTS graft_q41_customer")
    // ONE fixed warehouse path, overwritten per invocation: DROP TABLE
    // on path-based tables does not delete data, so a fresh temp dir
    // per run would leak full bucketed copies of orders+customer into
    // /tmp on every bench warm+timed pass. mode(overwrite) below
    // replaces the data in place — at most one copy ever exists.
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_q41_wh"
    t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").option("path", s"$wh/orders")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("graft_q41_orders")
    t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").option("path", s"$wh/customer")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("graft_q41_customer")
    s.table("graft_q41_orders")
      .join(s.table("graft_q41_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** n-gram Jaccard near-dup (brief's fourth dedup mode): exact
    * word-3-gram Jaccard with the provably-complete prefix filter —
    * the deterministic sibling of q18's MinHash+LSH (same similarity,
    * no hashing, no false-negative probability). The oracle computes
    * ALL pairs, so it checks the prefix filter's completeness, not
    * just the similarity arithmetic.
    */
  private def q44(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardNearDupPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.7, shingleWidth = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Pivot (columnar cross-tab) — `groupBy().pivot()` with an explicit
    * value list, so the plan is a single two-phase aggregation (no
    * value-discovery pre-pass, no second shuffle; at scale always pass
    * the value list).
    */
  private def q45(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(sum(dec(col("o_totalprice"))).cast("double"))
      .orderBy(col("o_orderstatus"))

  /** Stream-stream inner join with event-time range — for each 'view',
    * the same user's 'purchase's within the following hour, computed BY
    * THE STREAMING ENGINE (two file-source streams, per-side
    * watermarks, availableNow). Watermarks bound the join state: each
    * side buffers only rows newer than (watermark - range), so state
    * is O(rate x window), not O(stream). Inner-join output is exactly
    * the batch join, which is what the oracle computes.
    */
  private def q46(s: SparkSession, d: String): DataFrame = {
    val name = "graft_q46_sink"
    withStagedTable(d, "events") { stageDir =>
      val joined = graft.streaming.StreamJoins.viewPurchaseJoin(s, stageDir)
      withStreamPartitions(s, 8) {
        val q = joined.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
    }
    s.table(name).orderBy(col("user_id"), col("view_id"), col("purchase_id"))
  }

  /** Approximate sketches — the single-pass, mergeable, bounded-memory
    * scale path for distinct counts (HLL++) and quantiles (KLL-style
    * approx_percentile): at 100 TB these replace the shuffle-heavy
    * exact forms when a few percent error is acceptable. The oracle
    * pins the EXACT values and asserts the sketches land inside their
    * published error envelopes (HLL rsd 5% -> 15% is >3 sigma;
    * approx_percentile accuracy 1000 -> well under 5% here), so the
    * check is deterministic for a fixed dataset.
    */
  private def q47(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("__hll"),
        expr("percentile(l_extendedprice, 0.5)").as("__p50"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("__ap50"))
      .select(col("l_returnflag"),
        col("exact_orders").cast("long").as("exact_orders"),
        (abs(col("__hll") - col("exact_orders")) <= col("exact_orders") * lit(0.15))
          .as("hll_within_15pct"),
        (abs(col("__ap50") - col("__p50")) <= col("__p50") * lit(0.05))
          .as("p50_within_5pct"))
      .orderBy(col("l_returnflag"))

  /** Full outer join with nulls on BOTH sides (q03/q04 cover inner,
    * q05 semi/anti): per-customer order totals full-outer joined to
    * the BUILDING-segment customer list — customers without orders
    * null the left side, non-BUILDING buyers null the right.
    */
  private def q48(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("spend"))
    val b = t(s, d, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    a.join(b, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy(col("custkey"))
  }

  /** Set ops with multiplicity (q10 covers the DISTINCT forms):
    * `intersectAll` keeps min(countA, countB) copies, `exceptAll`
    * keeps countA - countB — bag semantics, folded to (key, copies)
    * for a deterministic result.
    */
  private def q49(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "lineitem").where(col("l_quantity") < 10).select(col("l_orderkey"))
    val b = t(s, d, "lineitem").where(col("l_discount") > 0.05).select(col("l_orderkey"))
    val ia = a.intersectAll(b).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("copies")).withColumn("op", lit("intersect_all"))
    val ea = a.exceptAll(b).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("copies")).withColumn("op", lit("except_all"))
    ia.unionByName(ea)
      .select(col("op"), col("l_orderkey"), col("copies"))
      .orderBy(col("op"), col("l_orderkey"))
  }

  /** Frame sampling (brief's multimodal frame-sample op): each "video"
    * blob explodes into 4 evenly-spaced 256-byte frames inside its
    * partition — narrow, content never shuffles; only (id, idx, len,
    * hash) projections leave the stage. The stub frame arithmetic is
    * byte-slice arithmetic, so the oracle recomputes every frame hash
    * with `substring` (ASCII corpus: byte == char).
    */
  private def q50(s: SparkSession, d: String): DataFrame = {
    val media = t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
    MultiModal.sampleFrames(media, "bytes", n = 4, frameBytes = 256)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("flen"),
        md5(col("frame")).as("fhash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Array higher-order functions (§2.8 scalar families beyond q12's
    * string/date/math): `transform`, `filter`, `aggregate` (sequential
    * fold — same evaluation order as DuckDB's list_sum), `zip_with`,
    * `reverse`, `array_max` in one projection. Everything is codegen'd
    * per-row work with no shuffle beyond the final presentation sort.
    */
  private def q51(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .withColumn("e", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"),
        expr("cast(size(filter(e, x -> x > 0)) as bigint)").as("n_pos"),
        expr("round(aggregate(e, cast(0.0 as double), (acc, x) -> acc + x * x), 6)")
          .as("sum_sq"),
        expr("round(array_max(e), 6)").as("max_e"),
        expr("round(aggregate(zip_with(e, reverse(e), (x, y) -> x * y), " +
          "cast(0.0 as double), (acc, z) -> acc + z), 6)").as("rev_dot"))
      .orderBy(col("vec_id"))

  /** BPE-ish tokenization (brief: token counting beyond whitespace):
    * a GPT-2-style pretokenizer approximated with an RE2-safe
    * alternation (letter runs | digit runs | punctuation runs) so both
    * engines' regex dialects agree; reported against the whitespace
    * token count per language.
    */
  private def q52(s: SparkSession, d: String): DataFrame = {
    // explicit whitespace class: Java's \s includes \x0B, RE2's does
    // not — spelling the class out keeps both regex dialects identical
    val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f]+"
    t(s, d, "documents")
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
          .cast("long").as("bpe"),
        size(split(trim(col("text")), "[ \\t\\n\\r\\f]+")).cast("long").as("ws"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("ws")).as("ws_tokens"),
        round(sum(col("bpe")).cast("double") / sum(col("ws")), 6).as("fertility"))
      .orderBy(col("lang"))
  }

  /** The SQL entry path (`spark.sql` over registered views) — TPC-H
    * Q3 shape written once in ANSI SQL and executed verbatim by BOTH
    * engines, proving dialect-level parity, not just DataFrame parity.
    */
  private val q53Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  private def q53(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q53Sql)
  }

  /** Correlated scalar subquery + EXISTS (§2.8 joins: Catalyst
    * decorrelates both into aggregating/semi joins — `.explain` shows
    * no nested execution). Verbatim SQL on both engines.
    */
  private val q54Sql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
      |    AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  private def q54(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q54Sql)
  }

  /** Distribution window functions (ntile / percent_rank / cume_dist —
    * q06/q07/q35 cover ranking, frames, offsets). The window order is
    * made total with the key tiebreak, so every rank is deterministic.
    */
  private val q55Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  private def q55(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(q55Sql)
  }

  /** Explicit GROUPING SETS with `grouping()` indicator columns (q08
    * covers rollup, q30 cube — this is the general form, planned as a
    * single Expand + two-phase aggregate like both of those).
    */
  private val q56Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin

  private def q56(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(q56Sql)
  }

  /** Decontamination (cross-corpus near-dup removal): treat sources
    * src0/src1 as the held-out benchmark and drop their near-dups from
    * the rest of the corpus. The oracle recomputes contamination with
    * an ALL-pairs train x ref Jaccard join, so it checks the LSH
    * candidate generation's recall, not just the verify arithmetic.
    */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val ref = docs.where(col("source").isin("src0", "src1"))
    val train = docs.where(!col("source").isin("src0", "src1"))
    Dedup.decontaminate(train, ref, "doc_id", "text", threshold = 0.8)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing (Packing op): concat-and-chunk doc offsets. */
  private def q64(s: SparkSession, d: String): DataFrame =
    Packing.contiguous(t(s, d, "documents"), "doc_id", "n_chars", budget = 4096)
      .select(col("doc_id"), col("start_off"), col("seq_id"))
      .orderBy(col("doc_id"))

  /** Recursive CTE (§2.8 SQL surface; Spark 4.x WITH RECURSIVE):
    * walk each region's nations in key order via a lead()-derived
    * successor relation, accumulating the path — a linear-recursion
    * traversal with a window-built non-recursive CTE feeding the
    * recursive member. Verbatim SQL on both engines (q53 rule: the
    * SAME text runs on Spark and DuckDB; `||`, lead(), CAST agree).
    * Depth is bounded by the largest region (5), rows by the nation
    * table (25) — recursion state stays trivially broadcastable at
    * any corpus scale (the recursion is over dimension data, never
    * facts).
    */
  private val q63Sql: String =
    """WITH RECURSIVE succ AS (
      |  SELECT n_regionkey AS rk, n_nationkey AS nk, n_name AS name,
      |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
      |                                 ORDER BY n_nationkey) AS next_nk,
      |         row_number() OVER (PARTITION BY n_regionkey
      |                            ORDER BY n_nationkey) AS rn
      |  FROM nation
      |), chain AS (
      |  SELECT rk, nk, next_nk, 1 AS depth, name AS path
      |  FROM succ WHERE rn = 1
      |  UNION ALL
      |  SELECT s.rk, s.nk, s.next_nk, c.depth + 1, c.path || '>' || s.name
      |  FROM chain c JOIN succ s ON s.rk = c.rk AND s.nk = c.next_nk
      |)
      |SELECT rk AS regionkey, CAST(depth AS BIGINT) AS levels, path
      |FROM chain WHERE next_nk IS NULL
      |ORDER BY regionkey""".stripMargin

  private def q63(s: SparkSession, d: String): DataFrame = {
    t(s, d, "nation").createOrReplaceTempView("nation")
    s.sql(q63Sql)
  }

  /** Map-typed columns + map higher-order functions (§2.8 scalar
    * families, the map siblings of q51's array HOFs): per-document
    * token histogram as a real MapType column (`map_from_entries`),
    * filtered with `map_filter`, re-flattened with `map_entries`.
    * The oracle states the same semantics relationally (GROUP BY +
    * HAVING) — the map round-trip must be lossless.
    */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("tok"))
    tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("tok"), col("n")))))
        .as("hist"))
      .select(col("doc_id"),
        explode(map_entries(map_filter(col("hist"), (_, v) => v >= 5))).as("e"))
      .select(col("doc_id"), col("e.key").as("tok"), col("e.value").cast("long").as("n"))
      .orderBy(col("doc_id"), col("tok"))
  }

  /** UNPIVOT (§2.8 reshaping, the inverse of q45's pivot): wide
    * per-flag measure columns melted to (flag, measure, value) rows
    * via the DataFrame `unpivot` API (Spark 3.4+). Money through
    * DECIMAL per the oracle-parity rules.
    */
  private def q66(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).cast("double").as("qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("price"),
        sum(dec(col("l_discount"))).cast("double").as("disc"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("qty"), col("price"), col("disc")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy(col("l_returnflag"), col("measure"))

  /** Correlated LATERAL subquery join (§2.8 joins — the per-row
    * top-N-per-group idiom; Catalyst plans the correlated LIMIT
    * without nested execution). Verbatim SQL on both engines — the
    * comma-LATERAL form is the dialect intersection (Spark's bare
    * `JOIN LATERAL` and DuckDB's required `ON true` differ).
    */
  private val q67Sql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey <= 100
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  private def q67(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q67Sql)
  }

  /** Mergeable HLL sketches (§2.8 approx aggregation beyond q47's
    * one-shot approx_count_distinct): per-group sketches built with
    * `hll_sketch_agg`, merged ACROSS groups with `hll_union_agg`, and
    * estimated — the pre-aggregation pattern that makes distinct
    * counts roll up across days/partitions at 100 TB without
    * re-scanning raw data. Sketch construction and union depend only
    * on register maxima, so the estimate is deterministic and input-
    * order-independent; the oracle checks the q47-style error
    * envelope (default lgConfigK=12 → rsd ~1.6%, enveloped at 5%)
    * as booleans against exact distincts.
    */
  private def q68(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql("""
      WITH per AS (
        SELECT o_orderstatus AS status, hll_sketch_agg(o_custkey) AS sk,
               count(DISTINCT o_custkey) AS exact_d
        FROM orders GROUP BY o_orderstatus),
      rows AS (
        SELECT status, hll_sketch_estimate(sk) AS est, exact_d FROM per
        UNION ALL
        SELECT 'ALL', hll_sketch_estimate(hll_union_agg(sk)),
               (SELECT count(DISTINCT o_custkey) FROM orders) FROM per)
      SELECT status, CAST(exact_d AS BIGINT) AS exact_d,
             abs(est - exact_d) <= exact_d * 0.05 AS within_5pct
      FROM rows ORDER BY status""")
  }

  /** Cross-document line-level dedup ([[Quality.stripBoilerplate]] —
    * C4-style boilerplate removal). Every document gets a shared nav
    * header and license footer injected; the op must strip exactly
    * those (document frequency 5000 >> minDocs=10) and return each
    * original text byte-identical — original lines repeat across far
    * fewer than 10 docs (the corpus's dup clusters are pairs/triples),
    * so nothing else crosses the threshold. The oracle restates the
    * whole pipeline relationally (explode with positions, document-
    * frequency HAVING, ordered string_agg reassembly).
    */
  private def q69(s: SparkSession, d: String): DataFrame = {
    val injected = t(s, d, "documents").select(col("doc_id"),
      concat_ws("\n", lit("NAV MENU"), col("text"),
        lit("COPYRIGHT 2024 EXAMPLE CORP")).as("text2"))
    Quality.stripBoilerplate(injected, "doc_id", "text2", minDocs = 10)
      .orderBy(col("doc_id"))
  }

  /** Deterministic fractional upsampling ([[Sampling.upsample]]) —
    * the data-mixing dual of q61: en documents get 2.3 epochs (2
    * copies each, a stable id-keyed 30% get 3), zh 0.5 (a stable 50%
    * appear once), everything else 1. denom=100 for the q61 reason.
    */
  private def q70(s: SparkSession, d: String): DataFrame =
    Sampling.upsample(t(s, d, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", epochs = Map("en" -> 2.3, "zh" -> 0.5),
        defaultEpochs = 1.0, denom = 100)
      .orderBy(col("doc_id"), col("epoch"))

  /** Context-window chunking ([[Packing.slidingWindows]]): 200-char
    * windows every 150 chars — the embedding-pipeline chunker. */
  private def q71(s: SparkSession, d: String): DataFrame =
    Packing.slidingWindows(t(s, d, "documents"), "doc_id", "text",
        window = 200, stride = 150)
      .orderBy(col("doc_id"), col("win_id"))

  /** The DataSource V2 face (`spark.read.format("archive")`,
    * [[graft.sources.ArchiveDataSource]]) over the same nested
    * fixture, against the same spec-determined VALUES oracle as
    * q16/q42 — the fourth face of the walk core through the gate.
    * The projection here keeps `hash` but not `content`, so the scan
    * also exercises the pruned-walk path (digests computed, nothing
    * buffered) under the hash check.
    */
  private def q73(s: SparkSession, d: String): DataFrame =
    s.read.format("archive").load(buildFixture())
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))

  /** The chunked walk (oversize-entry survival, SURVEY §7 "2 GB JVM
    * array cap" risk) through the oracle gate: the q16 fixture walked
    * with a 300-byte cap splits every longer member into content_part
    * rows; the oracle VALUES are computed from the SAME spec member
    * definitions ([[FixtureLeaves]]) by slicing each into 300-byte
    * chunks and digesting independently.
    */
  private def q74(s: SparkSession, d: String): DataFrame =
    ArchiveConverter.chunkedEntries(s, Seq(buildFixture()),
        ConvertOptions(maxEntryBytes = 300L)).toDF()
      .select(col("path"), col("content_part"), col("size"),
        lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"), col("content_part"))

  /** Verified-winner near-dup dedup
    * ([[Dedup.nearDupWinnersVerified]]): survivors of the exact
    * Jaccard >= 0.8 graph — each doc whose min reachable id through
    * verified pairs is itself. Unlike the bucket-exact
    * `nearDupWinners` (band-hash-dependent, rows-only checkable at
    * best), this survivor set is engine-independent: the oracle
    * recomputes it from q33's transitive closure with a final
    * loser anti-join.
    */
  private def q75(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupWinnersVerified(t(s, d, "documents"), "doc_id", "text", threshold = 0.8)
      .select(col("doc_id")).orderBy(col("doc_id"))

  /** Deterministic epoch shuffle ([[Sampling.deterministicShuffle]]):
    * the reproducible global permutation, checked as an exact
    * POSITION assignment (the driver compares rows order-insensitively,
    * so the permutation is materialized as `row_number` over the
    * shuffle order — the oracle recomputes the same md5 ordering).
    * The windowed position here is the ORACLE FACE; the operator
    * itself is a plain range-exchange sort with no global window.
    */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val shuffled = Sampling.deterministicShuffle(t(s, d, "documents"), "doc_id", seed = 42L)
    shuffled.select(
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
        md5(concat_ws(":", lit(42L), col("doc_id"))), col("doc_id"))).as("pos"),
      col("doc_id"))
      .orderBy(col("pos"))
  }

  /** SemDeDup ([[Similarity.semDedup]], arXiv:2303.09540): semantic
    * dedup = IVF-cell clustering (the q37 deterministic codebook, so
    * the oracle can reproduce the assignment) → within-cell exact
    * cosine pairs at the q25/q31 threshold → one min-id survivor per
    * connected duplicate group. Output = (vec_id, cell) of survivors;
    * the oracle chains q37's assignment CTE, q31's pair arithmetic
    * (within cells only) and q75's closure + loser anti-join.
    */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val cb = Similarity.ivfCodebook(emb, "vec_id", "embedding", nlist = 16)
    Similarity.semDedup(emb, "vec_id", "embedding", cb, threshold = 0.45)
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id"))
  }

  /** LM perplexity filter ([[Quality.lmCrossEntropy]], CCNet Wenzek
    * et al. 2020 §3.3): per-language bigram LM trained on the
    * `src0` slice (the "curated reference" stand-in for CCNet's
    * Wikipedia), every document scored by cross-entropy under it —
    * src0 docs exercise the fully-seen path, the other sources the
    * unseen-gram add-one backoff. Score rounded to 6 dp (ln ulp
    * variance across libms; see the operator scaladoc).
    */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Quality.lmCrossEntropy(docs.where(col("source") === "src0"), docs,
      "doc_id", "text", "lang")
      .orderBy(col("doc_id"))
  }

  /** DSIR importance resampling ([[Sampling.dsirResample]], Xie et
    * al. NeurIPS 2023): 200 docs selected from the full corpus
    * ∝ exp(importance weight) toward the `src0` target slice (the
    * q78 pairing: same curated-reference stand-in). buckets=1024
    * keeps bucket collisions active at the test vocabulary size;
    * the md5-derived Gumbel keys make the sample engine-exact.
    */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Sampling.dsirResample(docs.where(col("source") === "src0"), docs,
      "doc_id", "text", k = 200, buckets = 1024, seed = 7L)
      .orderBy(col("doc_id"))
  }

  /** Exact shared-substring pairs ([[Dedup.sharedSubstringPairs]],
    * Lee et al. 2021): documents sharing a verbatim 24-char
    * normalized run, df-capped at 64 docs per gram. Catches the long
    * quote / copied passage case whole-document Jaccard (q18/q44)
    * dilutes away.
    */
  private def q80(s: SparkSession, d: String): DataFrame =
    Dedup.sharedSubstringPairs(t(s, d, "documents"), "doc_id", "text",
      k = 24, maxDf = 64)
      .orderBy(col("id_a"), col("id_b"))

  /** Deterministic WARC fixture (ISO 28500): warcinfo + response +
    * gzip-bodied response + request records; the oracle VALUES carry
    * sizes/digests of the SPEC bodies (the gzip one decompressed),
    * computed independently of the engine — q16's rule.
    */
  private[queries] def buildWarcFixture(): String = {
    import java.io._
    val b0 = "software: graft-spark\r\n".getBytes("UTF-8")
    val b1 = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello warc body\n"
      .getBytes("UTF-8")
    val b2 = ("compressed warc payload\n" * 4).getBytes("UTF-8")
    val b3 = "GET /q HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes("UTF-8")
    val gz2 = {
      val buf = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(buf)
      g.write(b2); g.close(); buf.toByteArray
    }
    val out = new ByteArrayOutputStream()
    def rec(hdrs: Seq[(String, String)], body: Array[Byte]): Unit = {
      val sb = new StringBuilder("WARC/1.0\r\n")
      hdrs.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${body.length}\r\n\r\n")
      out.write(sb.toString.getBytes("UTF-8"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("UTF-8"))
    }
    rec(Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> "<urn:uuid:0001>"), b0)
    rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://example.com/a"), b1)
    rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "http://example.com/b.gz"), gz2)
    rec(Seq("WARC-Type" -> "request", "WARC-Target-URI" -> "http://example.com/q"), b3)
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q81_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.warc")
    val fos = new FileOutputStream(f)
    fos.write(out.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** WARC source (ISO 28500, the CommonCrawl container): the q16
    * converter chain over [[buildWarcFixture]] — records walk like
    * tar entries, the gzip record body lands decompressed.
    */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val path = buildWarcFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** Deterministic WARC fixture for the HTTP pipeline (q101): response
    * records exercising every [[graft.functions.HttpHelper]] decode
    * path — plain, chunked transfer framing (with a chunk extension
    * and a trailer), gzip / deflate / zstd content codings, gzip UNDER
    * chunked, an undecodable coding (`br` — payload must pass through
    * encoded), a malformed status line, a truncated header block — and
    * a request record (non-response pass-through). The oracle VALUES
    * carry sizes/digests of the SPEC payload strings, computed
    * independently of the engine — q16's rule.
    */
  private[graft] def buildHttpWarcFixture(): String = {
    import java.io._
    val crlf = "\r\n"
    def resp(hdrs: String, body: Array[Byte]): Array[Byte] =
      (hdrs + crlf + crlf).getBytes("ISO-8859-1") ++ body
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val buf = new Array[Byte](b.length + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def zstd(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bo)
      z.write(b); z.close(); bo.toByteArray
    }
    def chunk(b: Array[Byte], at: Int): Array[Byte] = {
      // two chunks (the second with an extension), a trailer field
      val bo = new ByteArrayOutputStream()
      val (c1, c2) = b.splitAt(math.min(at, b.length))
      bo.write(f"${c1.length}%x$crlf".getBytes("ISO-8859-1"))
      bo.write(c1); bo.write(crlf.getBytes("ISO-8859-1"))
      if (c2.nonEmpty) {
        bo.write(f"${c2.length}%x;ext=1$crlf".getBytes("ISO-8859-1"))
        bo.write(c2); bo.write(crlf.getBytes("ISO-8859-1"))
      }
      bo.write(s"0${crlf}X-Trailer: t$crlf$crlf".getBytes("ISO-8859-1"))
      bo.toByteArray
    }
    def u(s: String): Array[Byte] = s.getBytes("UTF-8")
    val bodies: Seq[(String, String, Array[Byte])] = Seq(
      ("response", "http://t/plain", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html; charset=UTF-8",
        u("hello http payload\n"))),
      ("response", "http://t/chunked", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain${crlf}Transfer-Encoding: chunked",
        chunk(u("chunked transfer body ABCDEFGHIJ\n"), 17))),
      ("response", "http://t/gzip", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}Content-Encoding: gzip",
        gz(u("gzip encoded body 0123456789\n" * 3)))),
      ("response", "http://t/gzip-chunked", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}Content-Encoding: gzip${crlf}Transfer-Encoding: chunked",
        chunk(gz(u("gzip under chunked\n" * 4)), 20))),
      ("response", "http://t/deflate", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}Content-Encoding: deflate",
        zlib(u("deflate encoded body\n" * 2)))),
      ("response", "http://t/zstd", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}Content-Encoding: zstd",
        zstd(u("zstd encoded body\n" * 5)))),
      ("response", "http://t/brotli", resp(
        s"HTTP/1.1 200 OK${crlf}Content-Type: text/html${crlf}Content-Encoding: br",
        u("BROTLI-OPAQUE-BYTES"))),
      ("response", "http://t/badstatus", resp(
        s"HTTP/banana${crlf}Content-Type: x/y", u("odd body\n"))),
      ("request", "http://t/req", u(s"GET /q HTTP/1.1${crlf}Host: t$crlf$crlf")),
      ("response", "http://t/trunc",
        "HTTP/1.1 204 No Content\r\nContent-Type: text/empty".getBytes("ISO-8859-1")))
    val out = new ByteArrayOutputStream()
    bodies.foreach { case (typ, uri, body) =>
      val sb = new StringBuilder("WARC/1.0\r\n")
      sb.append(s"WARC-Type: $typ\r\n")
      sb.append(s"WARC-Target-URI: $uri\r\n")
      sb.append(s"Content-Length: ${body.length}\r\n\r\n")
      out.write(sb.toString.getBytes("ISO-8859-1"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q101_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.warc")
    val fos = new FileOutputStream(f)
    fos.write(out.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** WARC → HTTP payload pipeline ([[GraftFunctions.http_payload]]):
    * the converter chain over [[buildHttpWarcFixture]], then the
    * response-message projection — status, Content-Type, and the
    * entity payload with chunked framing and gzip/deflate/zstd
    * content codings reversed (the step between the WARC walker's
    * raw-emission contract and [[Quality.htmlToText]]). One narrow
    * codegen'd projection over the walk — no exchange beyond the
    * q16 chain's own.
    */
  private def q101(s: SparkSession, d: String): DataFrame = {
    val path = buildHttpWarcFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), GraftFunctions.http_payload(col("content")).as("h"))
      .select(col("path"),
        col("h.status").cast("bigint").as("status"),
        col("h.content_type").as("content_type"),
        length(col("h.payload")).cast("bigint").as("payload_size"),
        sha2(col("h.payload"), 256).as("payload_sha256"))
      .orderBy(col("path"))
  }

  /** The `--http-payload` converter MODE (vs q101's bare expression):
    * [[ArchiveConverter.filteredEntries]] with
    * `ConvertOptions(httpPayload = true)` over the same fixture —
    * content becomes the decoded payload and `size`/`hash` are
    * RECOMPUTED over it (the mode's contract), so the oracle checks
    * the converter's projection, not just the expression. The VALUES
    * reuse q101's independently-computed spec digests: the recomputed
    * hex sha-256 must equal the spec payload digest exactly.
    */
  private def q103(s: SparkSession, d: String): DataFrame = {
    val path = buildHttpWarcFixture()
    ArchiveConverter.filteredEntries(s, Seq(path),
        ConvertOptions(httpPayload = true))
      .select(col("path"), col("size"),
        lower(hex(col("hash"))).as("payload_sha256"),
        col("http_status").cast("bigint").as("status"),
        col("http_content_type").as("content_type"))
      .orderBy(col("path"))
  }

  /** Charset decoding under BOM / Content-Type hints
    * ([[GraftFunctions.charset_decode]]): the step between
    * `http_payload` and `htmlToText` for the large non-UTF-8 fraction
    * of real crawl data. The case table (bytes as hex + hint) is the
    * OPERATOR'S DEFINITION, shared verbatim by both sides; the
    * expected md5/length literals in the oracle are computed by an
    * independent implementation (Python codecs) — the q16 rule.
    * Covers ISO-8859-1, windows-1252 (the 0x80-0x9F quirk range),
    * UTF-8/UTF-16LE/UTF-16BE BOMs (BOM beats a lying header),
    * malformed UTF-8 → U+FFFD, unknown charset fallback, bare-name
    * and quoted-parameter hints, Shift_JIS, and a NULL hint.
    */
  private def q104(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cases: Seq[(String, String, Option[String])] = Seq(
      ("c01_latin1", "636166E9206DFC6E6368656E", Some("text/html; charset=ISO-8859-1")),
      ("c02_win1252", "9371756F74656494208520646173682097", Some("text/html; charset=windows-1252")),
      ("c03_bom_utf8", "EFBBBF626F6D2077696E7320C3A9", Some("text/plain; charset=iso-8859-1")),
      ("c04_bom_utf16le", "FFFE7500740066003100360020007400650078007400", Some("")),
      ("c05_bad_utf8", "6F6B20C328", Some("")),
      ("c06_unknown_cs", "706C61696E207574663820C3A9", Some("text/html; charset=klingon-8")),
      ("c07_bare_hint", "636166E9", Some("iso-8859-1")),
      ("c08_sjis", "93FA967B8CEA836583588367", Some("text/html; charset=\"Shift_JIS\"")),
      ("c09_bom_utf16be", "FEFF0062006500200074006500780074", Some("text/html")),
      ("c10_no_hint", "6E6F2068696E7420C3BC", None),
      // WHATWG step-3 meta prescan: markup declares what the missing
      // header didn't; the transport header still beats meta (c13 —
      // the E9 byte proves which charset actually decoded)
      ("c11_meta", "3C6D65746120636861727365743D2269736F2D383835392D31223E636166E9",
        Some("text/html")),
      ("c12_meta_httpequiv",
        "3C6D65746120687474702D65717569763D22436F6E74656E742D547970652220636F6E74656E743D22746578742F68746D6C3B20636861727365743D77696E646F77732D31323532223E97",
        None),
      ("c13_header_beats_meta", "636166E9203C6D65746120636861727365743D227574662D38223E",
        Some("text/html; charset=iso-8859-1")))
    cases.toDF("case_id", "hex", "hint")
      .select(col("case_id"),
        GraftFunctions.charset_decode(unhex(col("hex")), col("hint")).as("txt"))
      .select(col("case_id"), md5(col("txt").cast("binary")).as("text_md5"),
        length(col("txt")).cast("bigint").as("n_chars"))
      .orderBy(col("case_id"))
  }

  /** Deterministic Unix ar fixture (System V/GNU dialect, the ar(5)
    * spec): a symbol-table member, a GNU `//` long-name table, a
    * short-named text member (odd size — exercises the 2-byte data
    * alignment), a long-named member resolved through the table, a
    * gzip member (emitted decompressed), and a nested tar member
    * (expands in place with ar-member lineage). Byte-stable across
    * runs: fixed header fields, fixed bodies.
    */
  private[queries] def buildArFixture(): String = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val out = new ByteArrayOutputStream()
    out.write("!<arch>\n".getBytes("US-ASCII"))
    def header(name: String, size: Long): Unit = {
      val sb = new StringBuilder
      sb.append(name.padTo(16, ' '))
      sb.append("0".padTo(12, ' ')).append("0".padTo(6, ' '))
        .append("0".padTo(6, ' ')).append("100644".padTo(8, ' '))
      sb.append(size.toString.padTo(10, ' ')).append("`\n")
      out.write(sb.toString.getBytes("US-ASCII"))
    }
    def member(storedName: String, data: Array[Byte]): Unit = {
      header(storedName, data.length.toLong)
      out.write(data)
      if (data.length % 2 == 1) out.write('\n')
    }
    member("/", Array[Byte](0, 0, 0, 0)) // empty symtab: consumed, never emitted
    val longName = "training-shards/shard-000001.txt"
    member("//", (longName + "/\n").getBytes("US-ASCII"))
    member("readme.txt/", "ar member readme\n".getBytes("UTF-8"))
    member("/0", "long name payload\n".getBytes("UTF-8"))
    val gzBuf = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(gzBuf)
    gz.write("deterministic gzip payload in ar\n".getBytes("UTF-8")); gz.close()
    member("data.bin.gz/", gzBuf.toByteArray)
    val tarBuf = new ByteArrayOutputStream()
    val to = new TarArchiveOutputStream(tarBuf)
    Seq("docs/a.txt" -> "alpha doc\n", "docs/b.txt" -> "bravo doc\n").foreach {
      case (n, body) =>
        val e = new TarArchiveEntry(n)
        val b = body.getBytes("UTF-8")
        e.setSize(b.length.toLong); e.setModTime(1000000000000L)
        to.putArchiveEntry(e); to.write(b); to.closeArchiveEntry()
    }
    to.close()
    member("inner.tar/", tarBuf.toByteArray)
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q87_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.a")
    val fos = new FileOutputStream(f)
    fos.write(out.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** Unix ar source (the `.a` / `.deb` container, ar(5) spec): the
    * q16 converter chain over [[buildArFixture]] — GNU long names
    * resolve, structural members (symtab, name table) are consumed
    * not emitted, a gzip member lands decompressed, and a nested tar
    * expands with ar-member lineage.
    */
  private def q87(s: SparkSession, d: String): DataFrame = {
    val path = buildArFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** Deterministic cpio newc fixture (POSIX pax `070701` dialect —
    * the initramfs / RPM-payload layout): a directory record
    * (skipped), an odd-size text member (exercises the 4-byte data
    * alignment), a gzip member (emitted decompressed), and a nested
    * tar member (expands in place with cpio-member lineage).
    * Byte-stable across runs: fixed header fields, fixed bodies.
    */
  private[queries] def buildCpioFixture(): String = {
    import java.io._
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q89_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.cpio")
    val fos = new FileOutputStream(f)
    fos.write(cpioFixtureBytes()); fos.close()
    f.getAbsolutePath
  }

  /** The q89 fixture's raw cpio bytes — shared with [[buildRpmFixture]]
    * (the RPM wraps exactly this payload, so q90's expected members
    * are q89's VALUES verbatim).
    */
  private def cpioFixtureBytes(): Array[Byte] = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val out = new ByteArrayOutputStream()
    var ino = 1
    def record(name: String, data: Array[Byte], mode: Int): Unit = {
      val nameBytes = name.getBytes("UTF-8")
      val nameSize = nameBytes.length + 1
      val sb = new StringBuilder("070701")
      def hex(v: Long): Unit = sb.append(f"$v%08x")
      hex(ino.toLong); ino += 1
      hex(mode.toLong); hex(0); hex(0); hex(1); hex(0)
      hex(data.length.toLong); hex(0); hex(0); hex(0); hex(0)
      hex(nameSize.toLong); hex(0)
      out.write(sb.toString.getBytes("US-ASCII"))
      out.write(nameBytes); out.write(0)
      var n = (110 + nameSize) % 4
      while (n % 4 != 0) { out.write(0); n += 1 }
      out.write(data)
      var m = data.length % 4
      while (m % 4 != 0) { out.write(0); m += 1 }
    }
    record("etc", Array.emptyByteArray, 0x41ED)
    record("etc/motd.txt", "cpio member motd\n".getBytes("UTF-8"), 0x81A4)
    val gzBuf = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(gzBuf)
    gz.write("deterministic gzip payload in cpio\n".getBytes("UTF-8")); gz.close()
    record("usr/share/data.bin.gz", gzBuf.toByteArray, 0x81A4)
    val tarBuf = new ByteArrayOutputStream()
    val to = new TarArchiveOutputStream(tarBuf)
    Seq("docs/a.txt" -> "alpha doc\n", "docs/b.txt" -> "bravo doc\n").foreach {
      case (n, body) =>
        val e = new TarArchiveEntry(n)
        val b = body.getBytes("UTF-8")
        e.setSize(b.length.toLong); e.setModTime(1000000000000L)
        to.putArchiveEntry(e); to.write(b); to.closeArchiveEntry()
    }
    to.close()
    record("inner.tar", tarBuf.toByteArray, 0x81A4)
    record("TRAILER!!!", Array.emptyByteArray, 0)
    out.toByteArray
  }

  /** Deterministic RPM fixture (rpm.org file-format spec): 96-byte
    * lead, signature header (one INT32 index entry, store 8-aligned),
    * main header (same shape, unpadded), then the gzipped
    * [[cpioFixtureBytes]] payload — so the walked members (and the
    * oracle VALUES) are exactly q89's, proving the rpm framing is
    * consumed transparently.
    */
  private[queries] def buildRpmFixture(): String = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0xed.toByte, 0xab.toByte, 0xee.toByte, 0xdb.toByte, 3, 0, 0, 0, 0, 1))
    val name = "graft-fixture-1.0-1".getBytes("US-ASCII")
    out.write(name); out.write(new Array[Byte](66 - name.length))
    out.write(Array[Byte](0, 1, 0, 5))
    out.write(new Array[Byte](16))
    def header(store: Array[Byte], align8: Boolean): Unit = {
      def be32(v: Int): Unit =
        out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      out.write(Array[Byte](0x8e.toByte, 0xad.toByte, 0xe8.toByte, 1, 0, 0, 0, 0))
      be32(1); be32(store.length)
      be32(1000); be32(4); be32(0); be32(1)
      out.write(store)
      if (align8) out.write(new Array[Byte]((8 - store.length % 8) % 8))
    }
    header(Array[Byte](0, 0, 0, 42), align8 = true)
    header(Array[Byte](0, 0, 1, 7), align8 = false)
    val gzBuf = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(gzBuf)
    gz.write(cpioFixtureBytes()); gz.close()
    out.write(gzBuf.toByteArray)
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q90_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.rpm")
    val fos = new FileOutputStream(f)
    fos.write(out.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** Deterministic 7z fixture (7-zip.org file-format spec, written
    * with commons-compress `SevenZOutputFile`, LZMA2-coded): a
    * directory entry (skipped), an odd-size text member, a gzip
    * member (emitted decompressed), and a nested tar member (expands
    * with 7z-member lineage). The walked ROWS are byte-stable across
    * runs (fixed member bodies) even though the container's own
    * compressed bytes need not be.
    */
  private[queries] def buildSevenZFixture(): String = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZOutputFile}
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q91_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.7z")
    // SevenZOutputFile opens "rw" without truncating: a stale longer
    // file would leave trailing garbage past the new end header
    if (f.exists()) f.delete()
    val out = new SevenZOutputFile(f)
    def add(name: String, data: Array[Byte], isDir: Boolean = false): Unit = {
      val e = new SevenZArchiveEntry()
      e.setName(name); e.setDirectory(isDir)
      out.putArchiveEntry(e)
      if (!isDir) out.write(data)
      out.closeArchiveEntry()
    }
    add("notes", Array.emptyByteArray, isDir = true)
    add("notes/readme.txt", "7z member readme\n".getBytes("UTF-8"))
    val gzBuf = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(gzBuf)
    gz.write("deterministic gzip payload in 7z\n".getBytes("UTF-8")); gz.close()
    add("data.bin.gz", gzBuf.toByteArray)
    val tarBuf = new ByteArrayOutputStream()
    val to = new TarArchiveOutputStream(tarBuf)
    Seq("docs/a.txt" -> "alpha doc\n", "docs/b.txt" -> "bravo doc\n").foreach {
      case (n, body) =>
        val e = new TarArchiveEntry(n)
        val b = body.getBytes("UTF-8")
        e.setSize(b.length.toLong); e.setModTime(1000000000000L)
        to.putArchiveEntry(e); to.write(b); to.closeArchiveEntry()
    }
    to.close()
    add("inner.tar", tarBuf.toByteArray)
    out.close()
    f.getAbsolutePath
  }

  /** 7z source (the sixth container family; 7-zip.org spec): the q16
    * converter chain over [[buildSevenZFixture]] — the end-header
    * metadata forces the walker's seekable spool (the documented
    * streaming deviation), directory entries are skipped, a gzip
    * member lands decompressed, and a nested tar expands with
    * 7z-member lineage.
    */
  private def q91(s: SparkSession, d: String): DataFrame = {
    val path = buildSevenZFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** Deterministic codec-matrix fixture: one tar whose members are
    * the SAME 21-byte payload under every stage-1 codec the sniff
    * recognizes — gzip, zstd, bzip2, xz, lz4-frame, snappy-framed —
    * plus the plain bytes. Every member must emit decompressed with
    * the identical size and sha256; only the paths differ.
    */
  private[queries] def buildCodecMatrixFixture(): String = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val payload = "codec matrix payload\n".getBytes("UTF-8")
    def gz(d: Array[Byte]) = {
      val b = new ByteArrayOutputStream(); val o = new GZIPOutputStream(b)
      o.write(d); o.close(); b.toByteArray
    }
    def zstd(d: Array[Byte]) = {
      val b = new ByteArrayOutputStream()
      val o = new com.github.luben.zstd.ZstdOutputStream(b)
      o.write(d); o.close(); b.toByteArray
    }
    def bz2(d: Array[Byte]) = {
      val b = new ByteArrayOutputStream()
      val o = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(b)
      o.write(d); o.close(); b.toByteArray
    }
    def xz(d: Array[Byte]) = {
      val b = new ByteArrayOutputStream()
      val o = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(b)
      o.write(d); o.close(); b.toByteArray
    }
    def lz4(d: Array[Byte]) = {
      val b = new ByteArrayOutputStream()
      val o = new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream(b)
      o.write(d); o.close(); b.toByteArray
    }
    def sz(d: Array[Byte]) = {
      val b = new ByteArrayOutputStream()
      val o = new org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorOutputStream(b)
      o.write(d); o.close(); b.toByteArray
    }
    val members = Seq(
      "payload.bz2" -> bz2(payload),
      "payload.gz" -> gz(payload),
      "payload.lz4" -> lz4(payload),
      "payload.sz" -> sz(payload),
      "payload.txt" -> payload,
      "payload.xz" -> xz(payload),
      "payload.zst" -> zstd(payload))
    val tarBuf = new ByteArrayOutputStream()
    val to = new TarArchiveOutputStream(tarBuf)
    members.foreach { case (n, b) =>
      val e = new TarArchiveEntry(n)
      e.setSize(b.length.toLong); e.setModTime(1000000000000L)
      to.putArchiveEntry(e); to.write(b); to.closeArchiveEntry()
    }
    to.close()
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q92_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.tar")
    val fos = new FileOutputStream(f)
    fos.write(tarBuf.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** Codec matrix (stage-1 sniff coverage: the reference's four
    * codecs + the lz4-frame and snappy-framed extensions): the q16
    * converter chain over [[buildCodecMatrixFixture]] — all seven
    * members must land with the SAME decompressed size and sha256,
    * proving every codec decodes transparently in-walk.
    */
  private def q92(s: SparkSession, d: String): DataFrame = {
    val path = buildCodecMatrixFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** Unicode-bearing prefixes for q93, spelled in \u escapes so the
    * composed-vs-decomposed distinction survives any editor. Each row
    * concatenates these ahead of the (ASCII) document text, so the
    * normalizers do real work on EVERY row, not just on a constant:
    * nfc must compose the decomposed e+acute / ring / umlaut and
    * recompose the jamo; strip must drop every stacked combining
    * mark entirely.
    */
  private[queries] val NfcPrefix = "Cafe\u0301 A\u030angstro\u0308m \u1112\u1161\u11ab "
  private[queries] val StripPrefix = "Cafe\u0301 \u1eb7 e\u0301\u0302 \ud55c "

  /** Unicode normalization surface ([[GraftFunctions.nfc_normalize]] /
    * [[GraftFunctions.strip_accents]]): the pre-dedup canonicalization
    * pass — composed and decomposed spellings of the same text must
    * hash identically after NFC, and accent-folded text after
    * strip_accents. Output is md5 of the normalized strings (compact,
    * and any codepoint divergence from the oracle's utf8proc is a
    * hash mismatch). Codegen'd projections, zero exchanges.
    */
  private def q93(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        md5(GraftFunctions.nfc_normalize(concat(lit(NfcPrefix), col("text")))).as("nfc_md5"),
        md5(GraftFunctions.strip_accents(concat(lit(StripPrefix), col("text")))).as("strip_md5"))
      .orderBy(col("doc_id"))

  /** RPM source (the fifth container family; rpm.org file-format
    * spec): the q16 converter chain over [[buildRpmFixture]] — lead
    * and both index headers consumed as framing, the gzipped cpio
    * payload expands with NO artificial payload path segment, so the
    * member rows equal q89's exactly (same oracle VALUES).
    */
  private def q90(s: SparkSession, d: String): DataFrame = {
    val path = buildRpmFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** Deterministic Debian package fixture (deb(5) layout): the common
    * ar dialect (plain member names, no GNU terminators — the dialect
    * dpkg actually writes), `debian-binary`, a gzipped control tarball
    * and an xz data tarball whose members use dpkg's `./`-anchored
    * paths. Byte-stable: fixed bodies, fixed mtimes.
    */
  private[queries] def buildDebFixture(): String = {
    import java.io._
    import java.util.zip.GZIPOutputStream
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.xz.XZCompressorOutputStream
    def tarOf(dirs: Seq[String], members: Seq[(String, Array[Byte])]): Array[Byte] = {
      val buf = new ByteArrayOutputStream()
      val to = new TarArchiveOutputStream(buf)
      dirs.foreach { d =>
        val e = new TarArchiveEntry(d)
        e.setModTime(1000000000000L)
        to.putArchiveEntry(e); to.closeArchiveEntry()
      }
      members.foreach { case (n, b) =>
        val e = new TarArchiveEntry(n)
        e.setSize(b.length.toLong); e.setModTime(1000000000000L)
        to.putArchiveEntry(e); to.write(b); to.closeArchiveEntry()
      }
      to.close(); buf.toByteArray
    }
    val out = new ByteArrayOutputStream()
    out.write("!<arch>\n".getBytes("US-ASCII"))
    def member(name: String, data: Array[Byte]): Unit = {
      val sb = new StringBuilder
      sb.append(name.padTo(16, ' '))
      sb.append("0".padTo(12, ' ')).append("0".padTo(6, ' '))
        .append("0".padTo(6, ' ')).append("100644".padTo(8, ' '))
      sb.append(data.length.toString.padTo(10, ' ')).append("`\n")
      out.write(sb.toString.getBytes("US-ASCII"))
      out.write(data)
      if (data.length % 2 == 1) out.write('\n')
    }
    member("debian-binary", "2.0\n".getBytes("US-ASCII"))
    val control = ("Package: graft-fixture\nVersion: 1.0-1\nArchitecture: all\n" +
      "Maintainer: Graft <graft@example.org>\nDescription: deterministic fixture\n")
      .getBytes("UTF-8")
    val md5sums =
      "0123456789abcdef0123456789abcdef  usr/share/doc/graft/readme.txt\n".getBytes("UTF-8")
    val gzBuf = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(gzBuf)
    gz.write(tarOf(Seq("./"), Seq("./control" -> control, "./md5sums" -> md5sums)))
    gz.close()
    member("control.tar.gz", gzBuf.toByteArray)
    val conf = "option = value\n".getBytes("UTF-8")
    val readme = "deb data member readme\n".getBytes("UTF-8")
    val xzBuf = new ByteArrayOutputStream()
    val xz = new XZCompressorOutputStream(xzBuf)
    xz.write(tarOf(Seq("./", "./etc/", "./usr/", "./usr/share/", "./usr/share/doc/",
      "./usr/share/doc/graft/"),
      Seq("./etc/graft.conf" -> conf, "./usr/share/doc/graft/readme.txt" -> readme)))
    xz.close()
    member("data.tar.xz", xzBuf.toByteArray)
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q94_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.deb")
    // write-then-atomic-rename: a concurrent JVM running q94 reads
    // either the old or the new COMPLETE fixture, never a truncation
    val tmp = File.createTempFile("fixture", ".deb.part", dir)
    val fos = new FileOutputStream(tmp)
    try fos.write(out.toByteArray) finally fos.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    f.getAbsolutePath
  }

  /** Debian package source (the seventh container family, deb(5)):
    * the q16 converter chain over [[buildDebFixture]]. Nothing in the
    * walker special-cases deb — the family works by COMPOSITION:
    * ar dispatch → per-member sniff → gzip/xz transparent decode →
    * tar expansion, each stage an already-proven operator, which is
    * exactly the recursive-dispatch design claim (SURVEY §2.2 W1).
    */
  private def q94(s: SparkSession, d: String): DataFrame = {
    val path = buildDebFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** q95 fixture stream: 256 KiB of splitmix64-derived bytes with the
    * 96 KiB region [32768, 131072) duplicated at [163840, 262144) —
    * the CDC resync property makes the chunker re-emit identical
    * chunk hashes inside the copy even though it starts mid-chunk.
    */
  /** The independently-derived FastCDC rows over [[cdcFixtureBytes]]
    * — the shared oracle of q95 (whole-stream chunking) and q100 (the
    * same stream arriving as six 50000-byte parts): seam invariance
    * means both queries must land on EXACTLY these rows.
    */
  private val CdcChunkOracle: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), CAST(3169 AS BIGINT), 'a50211b0fe237d28aa31e37158bfffed7609b7c775a60b08aaa38a9093230553'),
      |  (CAST(3169 AS BIGINT), CAST(9764 AS BIGINT), '7565ad4b3af97a42313a548f5bd432d5149f2067811daa16ae8438c5a430fef3'),
      |  (CAST(12933 AS BIGINT), CAST(8956 AS BIGINT), 'e04b7ea04cb5defabb7c0f3b6d3ffa7e5ba38917591e2a382c36829717c78623'),
      |  (CAST(21889 AS BIGINT), CAST(9059 AS BIGINT), 'fd15b34625a07d2fe137e0d27a3094c591053ae25f236ce7d23ec1d8e78b646f'),
      |  (CAST(30948 AS BIGINT), CAST(7627 AS BIGINT), 'c5e3fbd6979e26a01acc09153e637b68d994980460ae29e98f5620c364890dd0'),
      |  (CAST(38575 AS BIGINT), CAST(9343 AS BIGINT), '2e708c9cb7b97ffbc2640308852339931d342e37660466ceee0137fb67008dc1'),
      |  (CAST(47918 AS BIGINT), CAST(10944 AS BIGINT), '6e805faefb1052197ca9b3e329b9c7264c500bb06ac36a2c311ae1c63d5e96fe'),
      |  (CAST(58862 AS BIGINT), CAST(9807 AS BIGINT), 'ccddeb924b264680728ee5a6640ca753a42735e8aa2adba3fa847144e1b61d14'),
      |  (CAST(68669 AS BIGINT), CAST(9039 AS BIGINT), 'eeb3d4a60d4a48899d78cfc35c998f53067ee48f8d616f6507ae67ec1e023116'),
      |  (CAST(77708 AS BIGINT), CAST(9430 AS BIGINT), '6dc21a0607564ba93bc27806af0387754339edae88b571d43453012f5aa89123'),
      |  (CAST(87138 AS BIGINT), CAST(9097 AS BIGINT), '69c438d17d02226bc44a688e9f671f321608d65294153523cacab9311d3ff85c'),
      |  (CAST(96235 AS BIGINT), CAST(6128 AS BIGINT), '5f583cff1acd2f6464307f4b765be9fd3fc578b6b553f81099c355a476a903d2'),
      |  (CAST(102363 AS BIGINT), CAST(8267 AS BIGINT), 'e910d5e38dad670abae78784b830f8b99fa5484448402a0e8612721d538c0cc8'),
      |  (CAST(110630 AS BIGINT), CAST(10790 AS BIGINT), '2916794353d85790e116a733ab49b8fa271d3793409b4664808fbfb590fffd85'),
      |  (CAST(121420 AS BIGINT), CAST(9772 AS BIGINT), '682e5938cc42146587c0dc7c4bea0fa631a49fe19c86c562c38a0c7216f61ede'),
      |  (CAST(131192 AS BIGINT), CAST(9250 AS BIGINT), '2337beb7e659a8674a01258caeb90d0791e306512229157e37047b9a07734272'),
      |  (CAST(140442 AS BIGINT), CAST(11023 AS BIGINT), 'd504b12cb502c742cbce41f196162f6c3628e38feb68a3941ec8e50b182674d2'),
      |  (CAST(151465 AS BIGINT), CAST(11586 AS BIGINT), 'fc208f157478e865296026461b26074f9791045984b4ba79aa1fdf1d59d31b5f'),
      |  (CAST(163051 AS BIGINT), CAST(6596 AS BIGINT), 'e0050bdec60380f4393e5e0556cb1c87a3da454cd867fc011b2e6ba7cf618d6c'),
      |  (CAST(169647 AS BIGINT), CAST(9343 AS BIGINT), '2e708c9cb7b97ffbc2640308852339931d342e37660466ceee0137fb67008dc1'),
      |  (CAST(178990 AS BIGINT), CAST(10944 AS BIGINT), '6e805faefb1052197ca9b3e329b9c7264c500bb06ac36a2c311ae1c63d5e96fe'),
      |  (CAST(189934 AS BIGINT), CAST(9807 AS BIGINT), 'ccddeb924b264680728ee5a6640ca753a42735e8aa2adba3fa847144e1b61d14'),
      |  (CAST(199741 AS BIGINT), CAST(9039 AS BIGINT), 'eeb3d4a60d4a48899d78cfc35c998f53067ee48f8d616f6507ae67ec1e023116'),
      |  (CAST(208780 AS BIGINT), CAST(9430 AS BIGINT), '6dc21a0607564ba93bc27806af0387754339edae88b571d43453012f5aa89123'),
      |  (CAST(218210 AS BIGINT), CAST(9097 AS BIGINT), '69c438d17d02226bc44a688e9f671f321608d65294153523cacab9311d3ff85c'),
      |  (CAST(227307 AS BIGINT), CAST(6128 AS BIGINT), '5f583cff1acd2f6464307f4b765be9fd3fc578b6b553f81099c355a476a903d2'),
      |  (CAST(233435 AS BIGINT), CAST(8267 AS BIGINT), 'e910d5e38dad670abae78784b830f8b99fa5484448402a0e8612721d538c0cc8'),
      |  (CAST(241702 AS BIGINT), CAST(10790 AS BIGINT), '2916794353d85790e116a733ab49b8fa271d3793409b4664808fbfb590fffd85'),
      |  (CAST(252492 AS BIGINT), CAST(9652 AS BIGINT), 'c44fc6530c12e29ad9b7e3c16a95eb2859f912c1feac36ee54b5322354ffcf5f'))
      |  AS t(chunk_offset, size, sha256)
      |ORDER BY chunk_offset""".stripMargin

  private[graft] def cdcFixtureBytes(): Array[Byte] = {
    val n = 262144
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = graft.functions.CdcHelper.mix64(
        0x51AB3C9DE0F17245L ^ (i.toLong * 0x9E3779B97F4A7C15L)).toByte
      i += 1
    }
    System.arraycopy(out, 32768, out, 163840, 98304)
    out
  }

  /** FastCDC content-defined chunking
    * ([[GraftFunctions.cdc_chunks]] / [[graft.ops.Cdc]]): the
    * byte-level dedup primitive — chunk boundaries depend only on
    * local content, so the fixture's duplicated 96 KiB tail re-emits
    * the original region's chunk hashes (9 of the 29 chunks below are
    * exact repeats). Oracle rows are derived from an independent
    * implementation of the published algorithm (q16's rule — DuckDB
    * cannot roll a gear hash).
    */
  private def q95(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = Seq(Tuple1(cdcFixtureBytes())).toDF("content")
    df.select(explode(GraftFunctions.cdc_chunks(col("content"))).as("c"))
      // "offset" is a DuckDB reserved word — chunk_offset on both sides
      .select(col("c.offset").as("chunk_offset"),
        col("c.size").cast("bigint").as("size"), col("c.sha256").as("sha256"))
      .orderBy(col("chunk_offset"))
  }

  /** CDC over chunked-walk part rows
    * ([[graft.ops.Cdc.chunkTableOverParts]] /
    * [[graft.functions.CdcHelper.chunksStream]]): the q95 fixture
    * arriving as six 50000-byte `content_part` rows — every seam lands
    * mid-chunk — must reproduce EXACTLY the whole-stream rows of the
    * shared independent oracle, proving cut points are invariant to
    * where `maxEntryBytes` split the entry. One entry-keyed exchange +
    * sorted-group streaming, state bounded by max + one part.
    */
  private def q100(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val parts = cdcFixtureBytes().grouped(50000).zipWithIndex
      .map { case (p, i) => ("fx", i.toLong, p) }.toSeq
    val df = parts.toDF("entry", "content_part", "content")
    graft.ops.Cdc.chunkTableOverParts(df, "entry", "content_part", "content")
      .select(col("offset").as("chunk_offset"),
        col("size").cast("bigint").as("size"), col("sha256"))
      .orderBy(col("chunk_offset"))
  }

  /** URL decomposition + eTLD+1
    * ([[GraftFunctions.url_parts]] / [[GraftFunctions.registered_domain]]):
    * the web-corpus keying primitive (per-domain quota caps, URL-keyed
    * dedup). URLs are synthesized deterministically from doc_id/source
    * ON BOTH SIDES (mixed-case scheme+host, optional userinfo, port,
    * query, fragment, and multi-label ccSLD suffixes), so the oracle
    * compares a full parse, not a fixed literal. Narrow codegen'd
    * projections, zero exchanges.
    */
  private def q96(s: SparkSession, d: String): DataFrame = {
    // github.io exercises a PRIVATE-section PSL rule through the
    // oracle gate: wwwN.srcM.github.io must keep three labels
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("com.au"), lit("github.io")),
      (col("doc_id") % 5 + 1).cast("int"))
    val url = concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("http")),
      lit("://"),
      when(col("doc_id") % 5 === 0, lit("user:pw@")).otherwise(lit("")),
      lit("WWW"), (col("doc_id") % 7).cast("string"),
      lit("."), col("source"), lit("."), tld,
      when(col("doc_id") % 4 === 0, lit(":8443")).otherwise(lit("")),
      lit("/p/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0,
        concat(lit("?utm_source=x&id="), col("doc_id").cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0, lit("#s2")).otherwise(lit("")))
    val p = GraftFunctions.url_parts(url)
    t(s, d, "documents").select(col("doc_id"),
      p.getField("scheme").as("scheme"),
      p.getField("host").as("host"),
      p.getField("port").cast("bigint").as("port"),
      p.getField("path").as("path"),
      p.getField("query").as("qstring"),
      p.getField("fragment").as("fragment"),
      GraftFunctions.registered_domain(p.getField("host")).as("reg_domain"))
      .orderBy(col("doc_id"))
  }

  /** HTML → text extraction ([[Quality.htmlToText]]): HTML pages are
    * synthesized deterministically from doc_id/text ON BOTH SIDES
    * (title, style block, script block carrying a raw `<`, headings,
    * entities, a comment, a self-closing tag), then extracted — so the
    * oracle exercises comment/script/style elision, tag stripping,
    * entity decoding and whitespace collapse on every row. Codegen'd
    * built-ins only, zero exchanges.
    */
  /** The synthesized HTML page both q97 and q98 extract from (and the
    * q97/q98 oracles re-synthesize in SQL — keep in sync with
    * [[HtmlSyntheticSql]]).
    */
  private def syntheticHtml: Column = {
    val did = col("doc_id").cast("string")
    concat(
      lit("<html><head><title>T"), did,
      lit("</title><style type=\"text/css\">p{color:red}</style></head>"),
      lit("<body><script>var x = 1 < 2;</script><h1>Doc "), did,
      lit("</h1><p>"), col("text"),
      lit(" &amp;x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      // hardening surface (r10 verdict #4): quoted attribute values
      // containing '>', numeric character references (dec + hex), a
      // double-encoded reference that must decode exactly once, and a
      // malformed reference that must pass through verbatim
      lit(" <a href=\"x>y\" title='z>w'>L</a> caf&#233; &#xE9; &amp;#65; &apos;a&apos; &#xZZ;</p>"),
      // r12 hardening: WHATWG named references beyond the classic six
      // (incl. the longest table name), a double-encoded NAMED ref
      // (decode-once), an unknown name (verbatim), and a sloppy
      // unpaired-quote tag that only the `<[^>]+>` cleanup pass strips
      // (placed after the last quoted attribute so the quote-aware
      // pass cannot pair its apostrophe with an earlier quote)
      lit("<p>caf&eacute; A&hellip;B &mdash; &copy;7 x&CounterClockwiseContourIntegral;y &amp;eacute; &notareal; <i title=don't>it</i></p><!-- note --><br/></body></html>"))
  }

  private def q97(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), Quality.htmlToText(syntheticHtml).as("extracted"))
      .withColumn("n_extracted", length(col("extracted")).cast("bigint"))
      .orderBy(col("doc_id"))

  /** End-to-end corpus-cleaning pipeline (the production composition
    * every training-data run executes): HTML → text
    * ([[Quality.htmlToText]]) → NFC canonicalization
    * ([[GraftFunctions.nfc_normalize]], with q93's decomposed-unicode
    * prefix so the normalizer does real work on every row) → length
    * gate → exact-dedup winner election ([[Dedup.exactWinners]]) →
    * deterministic md5-keyed 30% sample (q61's oracle-shared rule).
    * One shuffle total (the dedup hash agg + semi-join; AQE broadcasts
    * the winner side) — everything else narrow. The oracle re-runs all
    * five stages in SQL, so STAGE COMPOSITION is what is checked, not
    * any one operator.
    */
  private def q98(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .select(col("doc_id"), Quality.htmlToText(syntheticHtml).as("extracted"))
      .withColumn("clean",
        GraftFunctions.nfc_normalize(concat(lit(NfcPrefix), col("extracted"))))
      .where(length(col("clean")) >= 120)
    Dedup.exactWinners(base, "doc_id", "clean")
      .where(GraftFunctions.md5_long62(
        concat(lit("s:"), col("doc_id").cast("string"))) % 10 < 3)
      .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
        length(col("clean")).cast("bigint").as("n_clean"))
      .orderBy(col("doc_id"))
  }

  /** URL-canonicalization-keyed exact dedup
    * ([[GraftFunctions.url_normalize]]): pairs of URL spellings that
    * crawl data uses interchangeably — mixed-case scheme/host, FQDN
    * trailing dot, unicode vs punycode host (IDN fold), explicit
    * default port, percent-encoded unreserved chars, lowercase vs
    * uppercase reserved triplets, empty-vs-absent path and query,
    * userinfo, fragments — are synthesized deterministically from
    * doc_id (variant = doc_id parity, logical key = doc_id/2) and must
    * collapse to ONE canonical key. The oracle constructs the expected
    * canonical string DIRECTLY from the synthesis parameters (punycode
    * constant interpolated from the same `java.net.IDN.toASCII` call
    * the engine makes) and runs the same min-id winner election — any
    * normalization drift splits a group and breaks rows, winners and
    * counts at once. Narrow codegen'd projection + one hash agg.
    */
  private def q99(s: SparkSession, d: String): DataFrame = {
    val k = floor(col("doc_id") / 2).cast("long")
    val v1 = col("doc_id") % 2 === 1
    val scheme = when(k % 5 === 0, when(v1, lit("HTTPS")).otherwise(lit("https")))
      .otherwise(when(v1, lit("HTTP")).otherwise(lit("http")))
    val host = when(k % 3 === 0,
        when(v1, lit("EXAMPLE.COM.")).otherwise(lit("example.com")))
      .when(k % 3 === 1,
        when(v1, lit("MÜNCHEN.de")).otherwise(lit("xn--mnchen-3ya.de")))
      .otherwise(when(v1, lit("SHOP.Example.Co.UK")).otherwise(lit("shop.example.co.uk")))
    val port = when((k % 4 === 0) && v1,
        when(k % 5 === 0, lit(":443")).otherwise(lit(":80")))
      .when(k % 4 === 2, lit(":8080"))
      .otherwise(lit(""))
    val path = when(k % 7 === 0, when(v1, lit("/")).otherwise(lit("")))
      .otherwise(concat(lit("/p/"), k.cast("string"),
        when(v1, lit("/%61%7Eb%2fq")).otherwise(lit("/a~b%2Fq"))))
    val query = when(k % 2 === 0,
        concat(lit("?id="), k.cast("string"),
          when(v1, lit("&t=%63%20d")).otherwise(lit("&t=c%20d"))))
      .otherwise(when(v1, lit("?")).otherwise(lit("")))
    val frag = when(v1, concat(lit("#sec"), k.cast("string"))).otherwise(lit(""))
    val raw = concat(scheme, lit("://"),
      when(v1, lit("user@")).otherwise(lit("")), host, port, path, query, frag)
    t(s, d, "documents")
      .select(col("doc_id"), GraftFunctions.url_normalize(raw).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("url_norm"), col("n_variants"))
      .orderBy(col("doc_id"))
  }

  /** Opt-in query-parameter sorting
    * ([[GraftFunctions.url_normalize]]`(url, sortQuery = true)`, the
    * crawler convention treating `?a=1&b=2` ≡ `?b=2&a=1`): pairs of
    * URL spellings differing ONLY in parameter order (duplicate keys
    * included, so full-token sort — not stable-by-key — is what is
    * checked) plus a fragment and mixed-case host on the odd variant
    * must collapse to ONE canonical key. The oracle constructs the
    * expected canonical string directly from the synthesis parameters
    * and runs the same min-id winner election (q99's pattern). Narrow
    * codegen'd projection + one hash agg.
    */
  private def q102(s: SparkSession, d: String): DataFrame = {
    val k = floor(col("doc_id") / 2).cast("long")
    val v1 = col("doc_id") % 2 === 1
    val host = when(v1, concat(lit("H"), (k % 10).cast("string"), lit(".Example.COM")))
      .otherwise(concat(lit("h"), (k % 10).cast("string"), lit(".example.com")))
    val query = when(v1, lit("?b=2&a=1&a=0")).otherwise(lit("?a=1&a=0&b=2"))
    val raw = concat(lit("http://"), host, lit("/p/"), k.cast("string"), query,
      when(v1, lit("#frag")).otherwise(lit("")))
    t(s, d, "documents")
      .select(col("doc_id"),
        GraftFunctions.url_normalize(raw, sortQuery = true).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("url_norm"), col("n_variants"))
      .orderBy(col("doc_id"))
  }

  /** cpio source (the initramfs / RPM-payload container, POSIX pax
    * spec): the q16 converter chain over [[buildCpioFixture]] —
    * directory records are skipped, a gzip member lands decompressed,
    * and a nested tar expands with cpio-member lineage.
    */
  private def q89(s: SparkSession, d: String): DataFrame = {
    val path = buildCpioFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), col("size"), lower(hex(col("hash"))).as("sha256"))
      .orderBy(col("path"))
  }

  /** Per-domain quota cap ([[Sampling.domainCap]], the FineWeb
    * no-site-dominates rule): at most 10 docs per source, elected by
    * smallest md5(42:id) — a bounded typed-aggregation election plus
    * id-keyed semi-join, never a domain-keyed full-row window.
    */
  private def q82(s: SparkSession, d: String): DataFrame =
    Sampling.domainCap(t(s, d, "documents"), "source", "doc_id",
      quota = 10, seed = 42L)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  /** BM25 query terms for q83 — drawn from the testdata vocabulary so
    * tf/df vary across documents at every scale factor.
    */
  private[queries] val Bm25Terms = Seq("spark", "join", "window", "hash", "customer")

  /** Okapi BM25 scoring ([[Quality.bm25]]): every document scored
    * against a fixed 5-term query; corpus stats are one broadcast
    * row, tf/dl are narrow array projections.
    */
  private def q83(s: SparkSession, d: String): DataFrame =
    Quality.bm25(t(s, d, "documents"), "doc_id", "text", Bm25Terms)
      .orderBy(col("doc_id"))

  /** Gopher rule-pack filter ([[Quality.gopherFilter]]): per-rule
    * boolean flags + composite keep for every document — all narrow
    * array projections, zero exchanges.
    */
  private def q84(s: SparkSession, d: String): DataFrame =
    Quality.gopherFilter(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Corpus-wide frequent trigrams ([[Quality.topNgrams]]): gram-keyed
    * partial agg + bounded top-k, lexicographic tiebreak.
    */
  private def q85(s: SparkSession, d: String): DataFrame =
    Quality.topNgrams(t(s, d, "documents"), "text", n = 3, k = 20)

  /** Character-entropy quality signal
    * ([[graft.functions.GraftFunctions.char_entropy]]): per-document
    * Shannon entropy (nats) of the code-point distribution — the
    * reference-free junk detector (near-0 = degenerate repetition,
    * high = random/compressed noise; both tails are cut in web-corpus
    * cleaning). One codegen'd projection, zero exchanges, scan speed
    * at any corpus size; the codepoint-ordered accumulation inside the
    * expression makes the double oracle-reproducible before the 6-dp
    * round (q78's ln rule).
    */
  private def q86(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        round(GraftFunctions.char_entropy(col("text")), 6).as("entropy"))
      .orderBy(col("doc_id"))

  /** Incremental Bloom dedup gate ([[graft.ops.Bloom.bloomGate]]):
    * incoming = re-keyed copies of corpus texts (must ALL drop — the
    * no-false-negative guarantee) + genuinely-new odd docs (kept
    * modulo the declared md5-deterministic false positives). The
    * corpus reduces to one 2^20-bit bitmap (map-side partial OR — the
    * only corpus-side exchange is one 128 KiB word array per
    * partition); the incoming side filters at scan speed against the
    * bitmap literal, zero exchanges.
    */
  private def q88(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0).select(col("text"))
    val incoming = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionAll(docs.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")))
    graft.ops.Bloom.bloomGate(corpus, incoming, "text")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** q62 fixture texts — inline literals (the synthetic documents
    * table contains no PII-shaped spans, so like q59 the query is
    * self-contained); chosen to exercise greedy-domain backtracking
    * (trailing dot after a TLD), multiple matches per row, parens and
    * separators inside phone spans, digit runs too short to redact,
    * and the email→IP→phone scrub order on a mixed row.
    */
  private val Q62Texts: Seq[(Long, String)] = Seq(
    1L -> "contact Jane Doe at jane.doe+spam@example.org or j.d@sub.example.co.uk.",
    2L -> "server 192.168.0.1 responded; fallback 10.0.0.255 timed out",
    3L -> "call +1 415 555 0132 or (020) 7946-0958 after hours",
    4L -> "no pii here, just text with 3 small numbers like 42",
    5L -> "mixed: bob@corp.io from 172.16.254.3 dialed 555-867-5309 twice")

  /** PII scrub (TextStats.scrubPii) — email/IPv4/phone redaction. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Q62Texts.toDF("id", "text")
      .select(col("id"), TextStats.scrubPii(col("text")).as("scrubbed"))
      .orderBy(col("id"))
  }

  /** Gopher-family repetition metrics per document (Quality op). */
  private def q60(s: SparkSession, d: String): DataFrame =
    Quality.repetition(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Deterministic per-language mixture sampling (Sampling op).
    * denom=100 so the strata rates discriminate even at the smallest
    * test SF (500 dense doc_ids) — with the default 10000 every id
    * would sit below every threshold and the filter would be a no-op.
    */
  private def q61(s: SparkSession, d: String): DataFrame =
    Sampling.stratified(t(s, d, "documents"), "lang", "doc_id",
        rates = Map("en" -> 0.5, "zh" -> 0.25), defaultRate = 0.1, denom = 100)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** q105 classification knobs + the spec pieces its oracle derives
    * from: the content block is `text` + a small inline link, so after
    * cleanup its length is `length(text) + MainContentSuffix.length`
    * and its link chars are `MainContentLinkText.length` — the oracle
    * computes the expected classification from THIS arithmetic while
    * the engine parses the actual HTML generically (q16-rule
    * independent-path check).
    */
  private val MainContentMinLen = 150
  private val MainContentMaxLinkDensity = 0.2
  private val MainContentLinkText = "details here"
  private val MainContentSuffix = " see " + MainContentLinkText + " now"

  /** The q105 page: realistic chrome around one content paragraph.
    * Blocks after cleanup — title `T{id}` (short), `3 + doc_id % 5`
    * nav `<li>`s that are 100% link text (density 1.0), a short
    * `<h1>`, the content `<p>` (the doc text + one inline link), and a
    * link-heavy footer whose cleaned length is 128 with 36 link chars
    * (density 0.28125 > 0.2 — boilerplate by DENSITY at adequate
    * length, exercising the rule the short blocks don't). Empty-markup
    * segments (`<nav><ul>`, `</ul></nav>` leftovers) must vanish.
    */
  private def mainContentHtml: Column = {
    val did = col("doc_id").cast("string")
    val navItems = array_join(
      transform(sequence(lit(1L), lit(3L) + col("doc_id") % 5),
        i => concat(lit("<li><a href=\"/p"), i.cast("string"),
          lit("\">nav item "), i.cast("string"), lit("</a></li>"))), "")
    val footer = "copyright <a href=\"/l\">example corp</a> all rights reserved "
    concat(
      lit("<html><head><title>T"), did,
      lit("</title><style>body{margin:0}</style></head><body>" +
        "<script>if (1 < 2) { track(); }</script><nav><ul>"),
      navItems,
      lit("</ul></nav><h1>Doc "), did,
      lit("</h1><p>"), col("text"),
      lit(" see <a href=\"/more\">" + MainContentLinkText + "</a> now</p><footer>" +
        footer * 3 + "</footer></body></html>"))
  }

  /** Main-content extraction ([[Quality.mainContent]] — jusText-style
    * block length + link density classification) over a synthesized
    * chrome-heavy page. The oracle derives every output from the
    * synthesis spec (block count `7 + doc_id % 5`, content iff the
    * text block passes the length gate), never parsing HTML — so the
    * engine's generic block split, per-block link accounting and
    * classification are checked against an independent computation.
    */
  private def q105(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        Quality.mainContent(mainContentHtml, MainContentMinLen,
          MainContentMaxLinkDensity).as("mc"))
      .select(col("doc_id"),
        col("mc.n_blocks").as("n_blocks"),
        col("mc.n_content").as("n_content"),
        col("mc.content_len").as("content_len"),
        md5(col("mc.content_text")).as("content_md5"))
      .orderBy(col("doc_id"))

  /** [[graft.ops.FreqItems]] sketch size for q106: smaller than the
    * key cardinality at every SF (76 at sf0.001, 764 at sf0.1), so the
    * sketch genuinely approximates; exactly 3 keys sit above the n/k
    * guarantee threshold at every SF.
    */
  private val FreqItemsK = 16

  /** Misra–Gries heavy hitters over a zipf-like key. The key
    * `m DIV l_orderkey` (m = max key) of a ~uniform positive integer
    * is the classic power-law synthesis: P(v) ≈ 1/(v(v+1)), so item 1
    * carries ~50% of the stream, item 2 ~17%, item 3 ~8% — the domain
    * -frequency shape of a real crawl. Output follows q68's sketch
    * rule: the rows are the EXACT heavy hitters (count·k > n, from a
    * real groupBy) and the sketch contributes its two order-
    * independent guarantees as booleans — present-in-sketch and
    * underestimate-within-n/k — which the oracle states as TRUE.
    * Estimates themselves are merge-order-dependent and never emitted.
    */
  private def q106(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = t(s, d, "lineitem").where(col("l_orderkey") > 0)
    val keys = li
      .crossJoin(broadcast(li.agg(max(col("l_orderkey")).as("m"))))
      .select(concat(lit("pg"), expr("CAST(m DIV l_orderkey AS STRING)")).as("tok"))
    // n derives from the grouped counts, not a second raw-keys pass —
    // the two identical groupBy subtrees collapse into one shuffle via
    // exchange reuse, so the exact side scans lineitem once
    val grouped = keys.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val n = grouped.agg(sum(col("exact_cnt")).as("n"))
    val sk = keys.as[String]
      .select(graft.ops.FreqItems(FreqItemsK).toColumn.name("sk"))
    val est = element_at(col("sk"), col("tok"))
    grouped
      .crossJoin(broadcast(n))
      .where(col("exact_cnt") * FreqItemsK > col("n"))
      .crossJoin(broadcast(sk))
      .select(col("tok"), col("exact_cnt"),
        est.isNotNull.as("in_sketch"),
        (est <= col("exact_cnt") &&
          (col("exact_cnt") - est) * FreqItemsK <= col("n")).as("within_bound"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  private val LinkGraphDamping = 0.85
  private val LinkGraphIters = 3

  /** The q107/q108 oracle's edge derivation: the (dst eTLD+1,
    * normalized URL) rows each document's synthesized page MUST yield
    * per the [[linkGraphEdges]] spec — resolution and sort-query
    * normalization applied by hand, independent of the engine's
    * scanner/resolver (q16 rule).
    */
  private val linkEdgesSql: String =
    """WITH docs AS (
      |  SELECT doc_id, doc_id % 25 AS m, (doc_id * 7 + 1) % 25 AS a
      |  FROM documents),
      |links AS (
      |  -- absolute, mixed case + :443 + unsorted query, normalized
      |  SELECT doc_id, 'site' || CAST(a AS VARCHAR) || '.com' AS dst,
      |         'https://site' || CAST(a AS VARCHAR) || '.com/p/x?a=1&b=2' AS u
      |  FROM docs
      |  UNION ALL -- relative ../s/k: dot segment removed in resolution
      |  SELECT doc_id, 'site' || CAST(m AS VARCHAR) || '.com',
      |         'https://www.site' || CAST(m AS VARCHAR) || '.com/p/s/' ||
      |         CAST(doc_id % 7 AS VARCHAR)
      |  FROM docs
      |  UNION ALL -- query-only ?page=2: base path kept
      |  SELECT doc_id, 'site' || CAST(m AS VARCHAR) || '.com',
      |         'https://www.site' || CAST(m AS VARCHAR) || '.com/p/' ||
      |         CAST(doc_id AS VARCHAR) || '/index.html?page=2'
      |  FROM docs
      |  UNION ALL -- fragment-only #top: normalize drops it (self link)
      |  SELECT doc_id, 'site' || CAST(m AS VARCHAR) || '.com',
      |         'https://www.site' || CAST(m AS VARCHAR) || '.com/p/' ||
      |         CAST(doc_id AS VARCHAR) || '/index.html'
      |  FROM docs
      |  UNION ALL -- unquoted href=/plain/k
      |  SELECT doc_id, 'site' || CAST(m AS VARCHAR) || '.com',
      |         'https://www.site' || CAST(m AS VARCHAR) || '.com/plain/' ||
      |         CAST(doc_id % 3 AS VARCHAR)
      |  FROM docs
      |  UNION ALL -- &amp; decoded, then sort_query orders the tokens
      |  SELECT doc_id, 'site' || CAST(m AS VARCHAR) || '.com',
      |         'https://www.site' || CAST(m AS VARCHAR) || '.com/search?b&q=a'
      |  FROM docs
      |  UNION ALL -- protocol-relative //cdnK.net takes the base scheme
      |  SELECT doc_id, 'cdn' || CAST(doc_id % 5 AS VARCHAR) || '.net',
      |         'https://cdn' || CAST(doc_id % 5 AS VARCHAR) || '.net/lib.js'
      |  FROM docs
      |  UNION ALL -- co.uk target: the PSL rule keeps shopK.co.uk whole
      |  SELECT doc_id, 'shop' || CAST(doc_id % 4 AS VARCHAR) || '.co.uk',
      |         'http://shop' || CAST(doc_id % 4 AS VARCHAR) || '.co.uk/'
      |  FROM docs)""".stripMargin

  /** Chained-CTE restatement of [[graft.ops.Graph.pageRank]]'s fixed
    * power iteration (dangling mass redistributed uniformly), appended
    * after [[linkEdgesSql]]: defines edges/nodes/srcs/frac and r0..rK.
    */
  /** The recurrence CTEs alone (nodes..frac, r0..rK) — the caller
    * supplies its own `edges(src, dst, w)` CTE before this. Shared by
    * the q108 and q117 oracles.
    */
  private def pageRankRecurrenceSql(iters: Int, damping: Double): String = {
    val steps = (0 until iters).map { i =>
      s"""d$i AS (SELECT COALESCE(sum(pr), 0) AS dm FROM r$i
         |        WHERE node NOT IN (SELECT node FROM srcs)),
         |c$i AS (SELECT f.dst AS node, sum(r.pr * f.frac) AS ip
         |        FROM frac f JOIN r$i r ON f.src = r.node GROUP BY f.dst),
         |r${i + 1} AS (SELECT n.node,
         |        (1 - $damping) / nn.n + $damping *
         |        (COALESCE(c$i.ip, 0) + d$i.dm / nn.n) AS pr
         |        FROM nodes n LEFT JOIN c$i ON n.node = c$i.node, nn, d$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |srcs AS (SELECT DISTINCT src AS node FROM edges),
       |outw AS (SELECT src, sum(w) AS tw FROM edges GROUP BY src),
       |frac AS (SELECT e.src, e.dst, e.w / o.tw AS frac
       |         FROM edges e JOIN outw o ON e.src = o.src),
       |r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
       |$steps""".stripMargin
  }

  private def pageRankIterSql(iters: Int, damping: Double): String =
    s"""edges AS (
       |  SELECT 'site' || CAST(d.m AS VARCHAR) || '.com' AS src,
       |         l.dst AS dst, CAST(count(*) AS DOUBLE) AS w
       |  FROM links l JOIN docs d USING (doc_id) GROUP BY 1, 2),
       |${pageRankRecurrenceSql(iters, damping)}""".stripMargin

  /** Shared q107/q108 synthesis + extraction: one page per document
    * whose anchors cover every href class a crawler meets — absolute
    * with mixed case / default port / unsorted query, relative with a
    * dot segment, query-only, fragment-only, an UNQUOTED href, an
    * entity-encoded query (`&amp;`), protocol-relative, a co.uk
    * target (PSL rule), a `mailto:` (must drop), and two decoys inside
    * a comment and a script body (must not extract). The engine runs
    * the real chain — [[GraftFunctions.extract_links]] →
    * [[GraftFunctions.url_resolve]] → `url_normalize(sortQuery)` →
    * `registered_domain` — while the oracle derives every edge
    * directly from the synthesis spec (q16 rule: extraction,
    * resolution and canonicalization are all load-bearing, down to
    * distinct-URL counts).
    */
  private def linkGraphEdges(s: SparkSession, d: String): DataFrame = {
    val ds = (c: Column) => c.cast("string")
    val m = ds(col("doc_id") % 25)
    val a = ds((col("doc_id") * 7 + 1) % 25)
    val base = concat(lit("https://www.site"), m, lit(".com/p/"),
      ds(col("doc_id")), lit("/index.html"))
    val html = concat(
      lit("<html><body><nav><a href=\"HTTPS://SiTe"), a,
      lit(".CoM:443/p/x?b=2&a=1\">f</a>"),
      lit("<a href='../s/"), ds(col("doc_id") % 7), lit("'>r</a>"),
      lit("<a href=\"?page=2\">q</a><a href=\"#top\">t</a>"),
      lit("<a href=/plain/"), ds(col("doc_id") % 3), lit(">u</a>"),
      lit("<a href=\"/search?q=a&amp;b\">e</a>"),
      lit("<a href=\"//cdn"), ds(col("doc_id") % 5), lit(".net/lib.js\">c</a>"),
      lit("</nav><a href=\"http://shop"), ds(col("doc_id") % 4),
      lit(".co.uk/\">s</a>"),
      lit("<a href=\"mailto:x@y.example\">m</a>"),
      lit("<!-- <a href=\"http://never-comment.example/\">x</a> -->"),
      lit("<script>var s='<a href=\"http://never-script.example/\">x</a>';</script>"),
      lit("<p>"), col("text"), lit("</p></body></html>"))
    t(s, d, "documents")
      .select(col("doc_id"), base.as("base"), html.as("html"))
      .select(col("base"),
        explode(GraftFunctions.extract_links(col("html"))).as("href"))
      .select(col("base"),
        GraftFunctions.url_resolve(col("base"), col("href")).as("resolved"))
      .where(col("resolved").isNotNull)
      .select(
        GraftFunctions.registered_domain(
          GraftFunctions.url_parts(col("base")).getField("host")).as("src_domain"),
        GraftFunctions.url_normalize(col("resolved"), sortQuery = true).as("url_norm"))
      .select(col("src_domain"),
        GraftFunctions.registered_domain(
          GraftFunctions.url_parts(col("url_norm")).getField("host")).as("dst_domain"),
        col("url_norm"))
  }

  /** Host-level outlink graph ([[linkGraphEdges]] rolled up): edge
    * multiplicity and distinct-target-URL count per (src eTLD+1,
    * dst eTLD+1) — the CommonCrawl host-graph build as one narrow
    * extraction stage plus ONE hash aggregation.
    */
  private def q107(s: SparkSession, d: String): DataFrame =
    linkGraphEdges(s, d)
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("url_norm")).as("n_urls"))
      .orderBy(col("src_domain"), col("dst_domain"))

  /** Weighted host PageRank ([[graft.ops.Graph.pageRank]], fixed
    * [[LinkGraphIters]] power iterations, damping [[LinkGraphDamping]],
    * dangling mass redistributed uniformly) over the q107 edge set —
    * the crawl-frontier / sampling-weight prior. The cdn/shop targets
    * never link out, so the dangling-node path is load-bearing. The
    * oracle restates the same fixed-iteration recurrence as chained
    * CTEs from the spec-derived edges.
    */
  private def q108(s: SparkSession, d: String): DataFrame = {
    val edges = linkGraphEdges(s, d)
      .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("weight"))
    graft.ops.Graph.pageRank(edges, LinkGraphIters, LinkGraphDamping)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))
  }

  /** robots.txt admission gate ([[GraftFunctions.robots_allowed]],
    * RFC 9309): per document, a synthesized robots file (Disallow
    * section varying with `doc_id%3`, a `$`-anchored Allow carve-out,
    * a `*.gif$` wildcard rule, and a catch-all `*` group present only
    * on EVEN ids) probed six ways. Every verdict is a closed-form
    * function of doc_id, so the oracle states the expected booleans
    * straight from the synthesis spec while the engine runs the real
    * parser: group selection, longest-match, anchors, wildcards and
    * the no-group-permitted fallthrough are each load-bearing.
    */
  private def q109(s: SparkSession, d: String): DataFrame = {
    val ds = (c: Column) => c.cast("string")
    val k = ds(col("doc_id") % 3)
    val robots = concat(
      lit("User-agent: graftbot\nDisallow: /private"), k,
      lit("/\nAllow: /private"), k, lit("/ok$\nDisallow: *.gif$\n"),
      when(col("doc_id") % 2 === 0, lit("\nUser-agent: *\nDisallow: /\n"))
        .otherwise(lit("")))
    val ra = (agent: String, path: Column) =>
      GraftFunctions.robots_allowed(robots, lit(agent), path)
    t(s, d, "documents")
      .select(col("doc_id"),
        ra("graftbot/1.0", concat(lit("/private"), ds(col("doc_id") % 2), lit("/x")))
          .as("a_sect"),
        ra("GraftBot", concat(lit("/private"), k, lit("/ok"))).as("a_allow"),
        ra("graftbot", concat(lit("/private"), k, lit("/ok/deep"))).as("a_deep"),
        ra("graftbot", concat(lit("/img"), ds(col("doc_id") % 5), lit(".gif")))
          .as("a_gif"),
        ra("graftbot", concat(lit("/img"), ds(col("doc_id") % 5), lit(".gifx")))
          .as("a_gifx"),
        ra("otherbot", concat(lit("/anything/"), ds(col("doc_id") % 7)))
          .as("a_star"))
      .orderBy(col("doc_id"))
  }

  /** REAL audio decode ([[MultiModal.AudioCodec]], `javax.sound`):
    * per document a canonical-header PCM WAV is synthesized — even ids
    * 8-bit (WAV's unsigned domain), odd ids 16-bit signed LE, frame
    * count varying with `doc_id%5` — and decoded by the real JDK
    * audio stack: header metadata plus per-channel mean/RMS/peak
    * sample features. Every sample value is spec-determined integer
    * arithmetic, and integer-valued double sums at these sizes are
    * EXACT (< 2^53), so the oracle recomputes mean/RMS/peak from the
    * same arithmetic over `range(n)` — bit-identical, no summation-
    * order caveat. The mapPartitions plumbing is the q26 multimodal
    * shape with the stub swapped for the real codec.
    */
  private def q110(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = t(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 800 + (id % 5).toInt * 80
          val bits = if (id % 2 == 0) 8 else 16
          val samples = Array.tabulate(n) { i =>
            if (bits == 8) ((id + i) % 256).toInt
            else ((id * 31 + i.toLong * 7) % 65536 - 32768).toInt
          }
          (id, MultiModal.wavPcm(1, 8000, bits, samples))
        }
      }.toDF("doc_id", "bytes")
    val decoded = MultiModal.decodedAudioFeatures(
      MultiModal.withDecodedAudioMeta(media, "bytes"), "bytes")
    decoded.select(col("doc_id"),
      col("meta.format").as("format"),
      col("meta.channels").as("channels"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.bits").as("bits"),
      col("meta.frames").as("frames"),
      round(element_at(col("features"), 1), 6).as("mean_c0"),
      round(element_at(col("features"), 2), 6).as("rms_c0"),
      element_at(col("features"), 3).as("peak_c0"))
      .orderBy(col("doc_id"))
  }

  /** sitemap parsing ([[GraftFunctions.extract_sitemap_urls]],
    * sitemaps.org protocol — the crawl-seeding seat next to q109's
    * robots gate): ids divisible by 5 synthesize a 2-entry
    * sitemapindex, the rest a urlset of `2 + doc_id%3` url entries
    * exercising entity-escaped locs, CDATA wrapping, optional
    * lastmod/changefreq, and one malformed priority (→ null, never an
    * error). Every output field is a closed-form function of
    * (doc_id, ord), so the oracle restates the rows straight from the
    * synthesis spec (q16 rule) while the engine runs the real scanner.
    */
  /** The q111/q112 shared sitemap synthesis — one spec, restated by
    * both oracles: ids divisible by 5 get a 2-entry sitemapindex, the
    * rest a urlset of `2 + doc_id%3` url entries (entity-escaped loc
    * at ord 0, CDATA at 1, malformed priority at 3).
    */
  private def sitemapXml(id: Column): Column = {
    val ds = (c: Column) => c.cast("string")
    val host = concat(lit("http://s"), ds(id % 7), lit(".example.com"))
    val lastmod =
      concat(lit("<lastmod>2024-0"), ds(id % 9 + 1), lit("-15</lastmod>"))
    val freq = when(id % 3 === 0, "daily")
      .when(id % 3 === 1, "weekly").otherwise("monthly")
    def prio(i: Int) =
      concat(lit("<priority>0."), ds((id + i) % 10), lit("</priority>"))
    def urlEntry(i: Int): Column = {
      val core = i match {
        case 0 => concat(lit("<url><loc>"), host, lit("/p?a=1&amp;b="),
          ds(id % 4), lit("</loc>"), lastmod, prio(0), lit("</url>"))
        case 1 => concat(lit("<url><loc><![CDATA["), host, lit("/c/"),
          ds(id % 3), lit("]]></loc><changefreq>"), freq,
          lit("</changefreq>"), prio(1), lit("</url>"))
        case 2 => concat(lit("<url><loc>"), host, lit("/p"), ds(id),
          lit("/2</loc>"), lastmod, prio(2), lit("</url>"))
        case _ => concat(lit("<url><loc>"), host, lit("/p"), ds(id),
          lit("/3</loc><priority>high</priority></url>"))
      }
      when(lit(i) < id % 3 + 2, core).otherwise(lit(""))
    }
    val urlset = concat(
      lit("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
      urlEntry(0), urlEntry(1), urlEntry(2), urlEntry(3), lit("</urlset>"))
    val index = concat(lit("<sitemapindex><sitemap><loc>"), host,
      lit("/sm0.xml</loc>"), lastmod, lit("</sitemap><sitemap><loc>"), host,
      lit("/sm1.xml</loc></sitemap></sitemapindex>"))
    when(id % 5 === 0, index).otherwise(urlset)
  }

  private def q111(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val xml = sitemapXml(id)
    t(s, d, "documents")
      .select(id, posexplode(GraftFunctions.extract_sitemap_urls(xml)))
      .select(id, col("pos").cast("long").as("ord"),
        col("col.loc").as("loc"), col("col.kind").as("kind"),
        col("col.lastmod").as("lastmod"),
        col("col.changefreq").as("changefreq"),
        round(col("col.priority"), 1).as("priority"))
      .orderBy(id, col("ord"))
  }

  /** Crawl-frontier admission — the composed seed pipeline the whole
    * crawl stack exists for: sitemap seeds ([[sitemapXml]], the q111
    * spec verbatim) → sitemaps.org default priority 0.5 for entries
    * without one → RFC 9309 robots gate over path+query
    * ([[GraftFunctions.robots_allowed]]; the `/p?*b=2` wildcard rule
    * makes the glob matcher load-bearing, `Allow: /c/0` the
    * longest-match tie) → per-(host, URL) dedup keeping max priority →
    * per-host top-2 election via the bounded [[graft.ops.TopKStrByScore]]
    * aggregator (map-side partials cap every partition at k pairs per
    * host — the frontier shuffles kilobytes, not the distinct-URL
    * set). Every admitted row is closed-form in doc_id, so the oracle
    * restates the pipeline in SQL from the spec (window-ranked — the
    * aggregator must agree with `row_number` exactly).
    */
  private def q112(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val robots = lit(
      "User-agent: graftbot\nDisallow: /c/\nAllow: /c/0\nDisallow: /p?*b=2\n")
    val id = col("doc_id")
    val entries = t(s, d, "documents")
      .select(id, explode(GraftFunctions.extract_sitemap_urls(sitemapXml(id))).as("e"))
      .filter(col("e.kind") === "url")
      .select(col("e.loc").as("loc"),
        coalesce(round(col("e.priority"), 1), lit(0.5)).as("pri"))
    val gated = entries
      .withColumn("p", GraftFunctions.url_parts(col("loc")))
      .withColumn("pathq", concat(col("p.path"),
        when(col("p.query").isNotNull, concat(lit("?"), col("p.query")))
          .otherwise(lit(""))))
      .filter(GraftFunctions.robots_allowed(robots, lit("graftbot"), col("pathq")))
      .select(col("p.host").as("host"), col("loc"), col("pri"))
    gated.groupBy(col("host"), col("loc")).agg(max(col("pri")).as("pri"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .agg(graft.ops.TopKStrByScore(2).toColumn.name("top"))
      .toDF("host", "top")
      .select(col("host"), posexplode(col("top")))
      .select(col("host"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("loc"), col("col._1").as("pri"))
      .orderBy(col("host"), col("rank"))
  }

  /** CDX index keys ([[GraftFunctions.surt_key]] — the Internet
    * Archive / CommonCrawl SURT sort-key convention): per doc two
    * messy spellings (mixed case + `www.` + default port + unsorted
    * uppercase query; a clean https host on a non-default port)
    * collapse to spec-determined keys the oracle states DIRECTLY —
    * scheme drop, www strip, label reversal, port rules, lowercase +
    * query sort are all load-bearing in one literal. The grouped
    * count is the index build: range-sorting by this key is what
    * co-locates a domain's records in a 100 TB CDX.
    */
  private def q113(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val u0 = concat(lit("HTTP://WWW.S"), ds(id % 7), lit(".Example.COM:80/A"),
      ds(id % 11), lit("/B?b="), ds(id % 3), lit("&A=1"))
    val u1 = concat(lit("https://s"), ds(id % 7),
      lit(".example.com:8443/c/"), ds(id % 5))
    t(s, d, "documents")
      .select(id, explode(array(u0, u1)).as("url"))
      .select(GraftFunctions.surt_key(col("url")).as("cdx_key"))
      .groupBy(col("cdx_key")).agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("cdx_key"))
  }

  /** robots.txt sitemap discovery ([[GraftFunctions.robots_sitemaps]]
    * — the sitemaps.org cross-submission directive, the hop between
    * q109's admission gate and q111's sitemap parse): per document a
    * robots file carrying one `Sitemap:` line (plus, on even ids, a
    * lowercase-key second one after a comment), probed through the
    * real parser. Directive order, key case-insensitivity, comment
    * stripping and the empty-value skip are load-bearing; every
    * output row is closed-form in (doc_id, ord).
    */
  private def q114(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val robots = concat(
      lit("User-agent: graftbot\nDisallow: /x\nSitemap: http://s"),
      ds(id % 7), lit(".example.com/sm"), ds(id % 3),
      lit(".xml\n# a comment\nSitemap:\n"),
      when(id % 2 === 0,
        concat(lit("sitemap: http://s"), ds(id % 7),
          lit(".example.com/extra.xml  # trailing\n")))
        .otherwise(lit("")))
    t(s, d, "documents")
      .select(id, posexplode(GraftFunctions.robots_sitemaps(robots)))
      .select(id, col("pos").cast("long").as("ord"), col("col").as("sitemap"))
      .orderBy(id, col("ord"))
  }

  /** Page-head metadata ([[GraftFunctions.html_meta]] — the WAT-record
    * fields next to q107's outlinks): per document a synthesized page
    * with a commented-out decoy title, a script-literal decoy, a
    * whitespace-and-entity-laden real title, an optional description
    * (even ids), an optional entity-escaped canonical link (ids
    * divisible by 3) and a robots-meta noindex (ids divisible by 5) —
    * extracted by the real scanner, every field closed-form in doc_id.
    */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val page = concat(
      lit("<html><head><!-- <title>decoy</title> -->" +
        "<script>var t = \"<title>not me</title>\";</script>" +
        "<title>  Doc &amp; "),
      ds(id), lit(" &mdash; s"), ds(id % 7), lit("  </title>"),
      when(id % 2 === 0,
        concat(lit("<meta name=description content=\"Desc "), ds(id % 4),
          lit(" &eacute;\">"))).otherwise(lit("")),
      when(id % 3 === 0,
        concat(lit("<link rel=\"canonical\" href=\"http://s"), ds(id % 7),
          lit(".example.com/c?a=1&amp;b=2\">"))).otherwise(lit("")),
      when(id % 5 === 0, lit("<meta name=\"robots\" content=\"NOINDEX, nofollow\">"))
        .otherwise(lit("")),
      lit("<title>second ignored</title></head><body>x</body></html>"))
    t(s, d, "documents")
      .select(id, GraftFunctions.html_meta(page).as("m"))
      .select(id, col("m.title").as("title"),
        col("m.description").as("description"),
        col("m.canonical").as("canonical"),
        col("m.noindex").as("noindex"))
      .orderBy(id)
  }

  /** Anchor-text extraction ([[GraftFunctions.extract_anchors]] — the
    * anchor-text-corpus / nofollow-aware-graph face of q107's bare
    * hrefs): per document a page with a script-literal decoy anchor,
    * an entity-laden anchor wrapping nested markup, a rel-token
    * anchor (`nofollow` only on even ids — the token rule is
    * load-bearing against the odd ids' `ext` value), a no-href anchor
    * that must be skipped, and an image-only anchor whose text is
    * null. Every row closed-form in (doc_id, ord).
    */
  private def q116(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val page = concat(
      lit("<script>var a = '<a href=/decoy>x</a>';</script>" +
        "<a href=\"/p?x=&amp;y\">  Link &amp; <b>text</b> "),
      ds(id % 5), lit("  </a><a href=/plain rel=\""),
      when(id % 2 === 0, lit("external nofollow")).otherwise(lit("ext")),
      lit("\">plain "), ds(id % 3),
      lit("</a><a name=anchor>no href</a><a href=\"/empty\"><img src=x></a>"))
    t(s, d, "documents")
      .select(id, posexplode(GraftFunctions.extract_anchors(page)))
      .select(id, col("pos").cast("long").as("ord"),
        col("col.href").as("href"), col("col.text").as("atext"),
        col("col.nofollow").as("nofollow"))
      .orderBy(id, col("ord"))
  }

  /** Nofollow-aware PageRank — q116's anchor semantics feeding q108's
    * engine (the rel governance crawlers actually honor: a nofollow
    * edge must not pass rank): per document three absolute anchors —
    * always-follow, always-nofollow, and a conditional whose rel list
    * is `ugc nofollow` on even ids but plain `ugc` on odd — so the
    * follow-edge set depends on the TOKEN rule, then
    * [[graft.ops.Graph.pageRank]] over the surviving edges. The s-side
    * hosts only emit, the t-side only receive (the dangling path stays
    * load-bearing). Oracle: the follow edges restated from the spec +
    * the shared [[pageRankRecurrenceSql]] recurrence.
    */
  private def q117(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val page = concat(
      lit("<a href=\"http://t"), ds((id * 3 + 1) % 10), lit(".com/x\">f</a>"),
      lit("<a href=\"http://t"), ds(id % 10),
      lit(".com/x\" rel=nofollow>n</a>"),
      lit("<a href=\"http://t"), ds((id + 1) % 10), lit(".com/x\" rel=\""),
      when(id % 2 === 0, lit("ugc nofollow")).otherwise(lit("ugc")),
      lit("\">c</a>"))
    val edges = t(s, d, "documents")
      .select(concat(lit("s"), ds(id % 10), lit(".com")).as("src"),
        explode(GraftFunctions.extract_anchors(page)).as("a"))
      .where(!col("a.nofollow"))
      .select(col("src"),
        GraftFunctions.registered_domain(
          GraftFunctions.url_parts(col("a.href")).getField("host")).as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight"))
    graft.ops.Graph.pageRank(edges, LinkGraphIters, LinkGraphDamping)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))
  }

  /** Unicode-script routing ([[GraftFunctions.script_ratios]] — the
    * alphabet-level first-stage router of a multilingual corpus): per
    * document a mixed-script text with spec-determined letter counts
    * per script (Latin `2 + doc_id%3`, Cyrillic `1 + doc_id%2`, Han
    * `doc_id%2`, one Greek letter, digits/punctuation that must NOT
    * count), decoded by the real code-point scanner. Fractions are
    * divisions of identical integers on both engines — exact.
    */
  private def q118(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val lat = when(id % 3 === 0, "aa").when(id % 3 === 1, "aaa")
      .otherwise("aaaa")
    val cyr = when(id % 2 === 0, "б").otherwise("бб")
    val cjk = when(id % 2 === 0, "").otherwise("中")
    val text = concat(lat, lit(" "), cyr, cjk, lit("ω 123!"))
    t(s, d, "documents")
      .select(id, GraftFunctions.script_ratios(text).as("r"))
      .select(id,
        round(col("r.latin"), 6).as("latin"),
        round(col("r.cyrillic"), 6).as("cyrillic"),
        round(col("r.cjk"), 6).as("cjk"),
        round(col("r.greek"), 6).as("greek"),
        col("r.arabic").as("arabic"),
        col("r.other").as("other"),
        col("r.n_letters").as("n_letters"))
      .orderBy(id)
  }

  /** Crawl-delay politeness ([[GraftFunctions.robots_crawl_delay]] —
    * the per-host fetch-rate input next to q109's admission verdicts):
    * two graftbot groups whose delays must COMBINE (largest wins:
    * `GREATEST(doc_id%5+1, doc_id%3)`), a `*` group present only on
    * even ids (the otherbot probe gets 10.0 there, null elsewhere —
    * the no-delay → null face). All closed-form in doc_id.
    */
  private def q119(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val robots = concat(
      lit("User-agent: graftbot\nCrawl-delay: "), ds(id % 5 + 1),
      lit("\nDisallow: /x\n\nUser-agent: graftbot\nCrawl-delay: "),
      ds(id % 3), lit("\n"),
      when(id % 2 === 0, lit("\nUser-agent: *\nCrawl-delay: 10\n"))
        .otherwise(lit("")))
    t(s, d, "documents")
      .select(id,
        GraftFunctions.robots_crawl_delay(robots, lit("graftbot/1.0"))
          .as("d_graft"),
        GraftFunctions.robots_crawl_delay(robots, lit("otherbot"))
          .as("d_star"))
      .orderBy(id)
  }

  /** WARC → CDX end to end — the whole stack composed: q81's WARC
    * source walks [[buildHttpWarcFixture]], q101's `http_payload`
    * splits and decodes every record body, q113's `surt_key` turns the
    * WARC-Target-URI into the index key. Each record becomes one CDX
    * line (key, status, payload size, payload digest); the oracle
    * restates q101's independently-computed spec digests under
    * hand-derived SURT keys, so the walk, the HTTP decode AND the key
    * canonicalization must all land for the hash to match.
    */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val path = buildHttpWarcFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), GraftFunctions.http_payload(col("content")).as("h"))
      .select(GraftFunctions.surt_key(col("path")).as("cdx_key"),
        col("h.status").cast("bigint").as("status"),
        length(col("h.payload")).cast("bigint").as("n_bytes"),
        sha2(col("h.payload"), 256).as("payload_sha256"))
      .orderBy(col("cdx_key"))
  }

  /** Politeness fetch schedule — q112's admitted frontier meets
    * q119's crawl delay: per host, URLs rank in key order and URL r
    * fetches at `r × delay` seconds (the earliest schedule honoring
    * the host's Crawl-delay). Unlike the q112 top-k election, a fetch
    * schedule genuinely ranks EVERY URL of a host, so the per-host
    * window is the honest shape here — one hash exchange, each host's
    * partition sorted independently (the per-host work a real fetcher
    * shards the same way). Delay is host-determined (`doc_id%10 + 1`)
    * so the real parser and the oracle agree row by row.
    */
  private def q121(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val host = concat(lit("s"), ds(id % 10), lit(".com"))
    val robots = concat(lit("User-agent: graftbot\nCrawl-delay: "),
      ds(id % 10 + 1), lit("\n"))
    val urls = t(s, d, "documents")
      .select(host.as("host"),
        GraftFunctions.robots_crawl_delay(robots, lit("graftbot"))
          .as("delay"),
        explode(array(
          concat(lit("http://"), host, lit("/u"), ds(id), lit("/0")),
          concat(lit("http://"), host, lit("/u"), ds(id), lit("/1"))))
          .as("loc"))
    val w = Window.partitionBy(col("host")).orderBy(col("loc"))
    urls.withColumn("r", row_number().over(w) - 1)
      .select(col("host"), col("loc"),
        (col("r") * col("delay")).cast("double").as("fetch_at"))
      .orderBy(col("host"), col("loc"))
  }

  /** q122 classification knobs + the spec texts its oracle derives
    * from. Each case is the paragraph text of one synthesized page;
    * the page chrome (title, two nav `<li>`s, a short link-heavy
    * footer) is identical across cases, so after block split +
    * cleanup the page yields exactly 5 non-empty blocks of which only
    * the paragraph can classify as content (it has no links; every
    * chrome block fails the 60-char gate). The texts are single-
    * spaced, entity-free and `&<>`-free, so the cleaned content text
    * IS the spec string verbatim — the oracle md5s are computed over
    * `NFC(text)` by an independent implementation (Python codecs +
    * unicodedata), never by the engine (q16's rule). c08 is written
    * DECOMPOSED (`e` + U+0301) so the NFC step is load-bearing.
    */
  private[queries] val WetMinLen = 60
  private[queries] val WetMaxLinkDensity = 0.2
  private[queries] val WetCases: Seq[(String, String)] = Seq(
    ("c01_latin1", "caf\u00e9 m\u00fcnchen stra\u00dfe crawler extracted body text one alpha beta gamma delta"),
    ("c02_win1252", "\u201cquoted\u201d crawl text \u2014 two \u2022 with windows glyphs appended filler words here"),
    ("c03_utf16le", "utf sixteen little endian payload body text three with enough filler words to pass the gate"),
    ("c04_bom_utf8", "bom utf eight text four caf\u00e9 cr\u00e8me br\u00fbl\u00e9e with enough filler words to pass the length gate"),
    ("c05_meta_sjis", "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8 crawl body text five with enough ascii filler words to pass the gate"),
    ("c06_gzip_latin1", "gzip compressed caf\u00e9 body text six with enough filler words to pass the length gate"),
    ("c07_chunked_utf8", "chunked utf eight body text seven with \u00e9 and enough filler words to pass the gate"),
    ("c08_nfc", "cafe\u0301 nfc decomposed text eight with enough filler words to pass the length gate"),
    ("c09_short", "too short"))

  /** Deterministic WARC fixture for the WET pipeline (q122): one
    * response record per [[WetCases]] entry, the paragraph wrapped in
    * identical chrome and the whole page encoded per the case —
    * ISO-8859-1 / windows-1252 / BOM-less UTF-16LE under a header
    * charset, a UTF-8 BOM beating a lying latin-1 header, Shift_JIS
    * declared only by an in-markup `<meta charset>` (the WHATWG
    * prescan path), gzip content-coding and chunked transfer framing
    * over charset-bearing bodies, and a decomposed-Unicode body for
    * the NFC step.
    */
  private[queries] def buildWetWarcFixture(): String = {
    import java.io._
    val crlf = "\r\n"
    def html(text: String, meta: String): String =
      "<html><head><title>W</title>" + meta +
        "</head><body><nav><ul><li><a href=\"/a\">nav one</a></li>" +
        "<li><a href=\"/b\">nav two</a></li></ul></nav><p>" + text +
        "</p><footer>copyright <a href=\"/l\">owner</a> reserved</footer></body></html>"
    def resp(hdrs: String, body: Array[Byte]): Array[Byte] =
      (hdrs + crlf + crlf).getBytes("ISO-8859-1") ++ body
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def chunk(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val (c1, c2) = b.splitAt(b.length / 2)
      Seq(c1, c2).filter(_.nonEmpty).foreach { c =>
        bo.write(f"${c.length}%x$crlf".getBytes("ISO-8859-1"))
        bo.write(c); bo.write(crlf.getBytes("ISO-8859-1"))
      }
      bo.write(s"0$crlf$crlf".getBytes("ISO-8859-1"))
      bo.toByteArray
    }
    val texts = WetCases.toMap
    def ok200(ct: String, extra: String = ""): String =
      s"HTTP/1.1 200 OK${crlf}Content-Type: $ct" +
        (if (extra.isEmpty) "" else crlf + extra)
    val records: Seq[(String, Array[Byte])] = Seq(
      ("c01_latin1", resp(ok200("text/html; charset=ISO-8859-1"),
        html(texts("c01_latin1"), "").getBytes("ISO-8859-1"))),
      ("c02_win1252", resp(ok200("text/html; charset=windows-1252"),
        html(texts("c02_win1252"), "").getBytes("windows-1252"))),
      ("c03_utf16le", resp(ok200("text/html; charset=utf-16le"),
        html(texts("c03_utf16le"), "").getBytes("UTF-16LE"))),
      ("c04_bom_utf8", resp(ok200("text/html; charset=iso-8859-1"),
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          html(texts("c04_bom_utf8"), "").getBytes("UTF-8"))),
      ("c05_meta_sjis", resp(ok200("text/html"),
        html(texts("c05_meta_sjis"), "<meta charset=\"shift_jis\">")
          .getBytes("Shift_JIS"))),
      ("c06_gzip_latin1", resp(
        ok200("text/html; charset=ISO-8859-1", "Content-Encoding: gzip"),
        gz(html(texts("c06_gzip_latin1"), "").getBytes("ISO-8859-1")))),
      ("c07_chunked_utf8", resp(
        ok200("text/html", "Transfer-Encoding: chunked"),
        chunk(html(texts("c07_chunked_utf8"), "").getBytes("UTF-8")))),
      ("c08_nfc", resp(ok200("text/html; charset=utf-8"),
        html(texts("c08_nfc"), "").getBytes("UTF-8"))),
      ("c09_short", resp(ok200("text/html; charset=utf-8"),
        html(texts("c09_short"), "").getBytes("UTF-8"))))
    val out = new ByteArrayOutputStream()
    records.foreach { case (cid, body) =>
      val sb = new StringBuilder("WARC/1.0\r\n")
      sb.append("WARC-Type: response\r\n")
      sb.append(s"WARC-Target-URI: http://w/$cid\r\n")
      sb.append(s"Content-Length: ${body.length}\r\n\r\n")
      out.write(sb.toString.getBytes("ISO-8859-1"))
      out.write(body)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    val dir = new File(System.getProperty("java.io.tmpdir"), "graft_q122_fixture")
    dir.mkdirs()
    val f = new File(dir, "fixture.warc")
    val fos = new FileOutputStream(f)
    fos.write(out.toByteArray); fos.close()
    f.getAbsolutePath
  }

  /** WARC → WET end to end — the advertised text-extraction pipeline
    * under one oracle (the q120 play, text side): q81's WARC source
    * walks [[buildWetWarcFixture]], q101's `http_payload` reverses
    * framing and content codings, q104's `charset_decode` resolves
    * BOM > header > meta-prescan, q105's [[Quality.mainContent]]
    * drops the chrome, q93's `nfc_normalize` canonicalizes. The
    * oracle restates status, block counts, and the md5/length of
    * `NFC(spec text)` computed independently — the walk, the HTTP
    * decode, the charset sniff, the block classification AND the
    * normalization must all land for the hash to match. Everything
    * after the walk is narrow codegen'd scalar work: no exchange
    * beyond the presentation sort (plan-guarded).
    */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val path = buildWetWarcFixture()
    ArchiveConverter.entries(s, Seq(path), ConvertOptions()).toDF()
      .select(col("path"), GraftFunctions.http_payload(col("content")).as("h"))
      .select(col("path"),
        col("h.status").cast("bigint").as("status"),
        Quality.mainContent(
          GraftFunctions.charset_decode(col("h.payload"), col("h.content_type")),
          WetMinLen, WetMaxLinkDensity).as("mc"))
      .select(col("path"), col("status"),
        col("mc.n_blocks").as("n_blocks"),
        col("mc.n_content").as("n_content"),
        GraftFunctions.nfc_normalize(col("mc.content_text")).as("wet"))
      .select(col("path"), col("status"), col("n_blocks"), col("n_content"),
        length(col("wet")).cast("bigint").as("wet_len"),
        md5(col("wet").cast("binary")).as("wet_md5"))
      .orderBy(col("path"))
  }

  /** REAL image decode ([[MultiModal.ImageCodec]], `javax.imageio`) —
    * q110's analytic-exactness rule ported to images, retiring the
    * q26 stub-codec caveat: per document a 24-bit BMP and a palette-
    * indexed GIF are synthesized by HAND-ROLLED builders
    * ([[MultiModal.bmp24]] / [[MultiModal.gifGray]] — spec arithmetic
    * straight to container bytes, no encoder in the loop) and decoded
    * by the real JDK image stack. BMP pixels land as 3 exact R/G/B
    * bands; the GIF raster carries the palette indices themselves
    * through a real LZW decode (the builder's 9-bit clear-code
    * emission keeps indices verbatim). Every sample is spec-determined
    * integer arithmetic and integer-valued double sums at these sizes
    * are exact (< 2^53), so the oracle recomputes mean/std from the
    * same arithmetic over `range(w) x range(h)` — bit-identical
    * through the IEEE division/sqrt on both sides.
    */
  private def q123(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = t(s, d, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bh = 4 + (id % 3).toInt * 2
          val bmp = MultiModal.bmp24(16, bh, (x, y) =>
            (((id + 3 * x + 5 * y) % 256).toInt << 16) |
              (((2 * id + 7 * x + y) % 256).toInt << 8) |
              ((3 * id + x + 11 * y) % 256).toInt)
          val gh = 5 + (id % 4).toInt
          val gif = MultiModal.gifGray(12, gh,
            (x, y) => ((13 * id + 3 * x + 7 * y) % 256).toInt)
          (id, bmp, gif)
        }
      }.toDF("doc_id", "bmp_bytes", "gif_bytes")
    val withMeta = MultiModal.withDecodedImageMeta(
      MultiModal.withDecodedImageMeta(media, "bmp_bytes", "bmp_meta"),
      "gif_bytes", "gif_meta")
    val withFeats = MultiModal.decodedImageFeatures(
      MultiModal.decodedImageFeatures(withMeta, "bmp_bytes", "bmp_f"),
      "gif_bytes", "gif_f")
    withFeats.select(col("doc_id"),
      col("bmp_meta.format").as("bmp_format"),
      col("bmp_meta.width").cast("bigint").as("bmp_w"),
      col("bmp_meta.height").cast("bigint").as("bmp_h"),
      col("bmp_meta.channels").cast("bigint").as("bmp_ch"),
      round(element_at(col("bmp_f"), 1), 6).as("bmp_mean_r"),
      round(element_at(col("bmp_f"), 2), 6).as("bmp_mean_g"),
      round(element_at(col("bmp_f"), 3), 6).as("bmp_mean_b"),
      round(element_at(col("bmp_f"), 4), 6).as("bmp_std_r"),
      round(element_at(col("bmp_f"), 5), 6).as("bmp_std_g"),
      round(element_at(col("bmp_f"), 6), 6).as("bmp_std_b"),
      col("gif_meta.format").as("gif_format"),
      col("gif_meta.width").cast("bigint").as("gif_w"),
      col("gif_meta.height").cast("bigint").as("gif_h"),
      round(element_at(col("gif_f"), 1), 6).as("gif_mean"),
      round(element_at(col("gif_f"), 2), 6).as("gif_std"))
      .orderBy(col("doc_id"))
  }

  /** Connected components over the REAL link graph ([[Dedup.components]]
    * fed by [[linkGraphEdges]] — the clustering path on graph-shaped,
    * not dedup-pair, data): the site-to-site subgraph (CDN/shop hub
    * domains excluded — a hub would glue everything into one giant
    * component and hide the structure) clusters hosts into link
    * neighborhoods. The synthesis makes this subgraph the functional
    * graph of `m -> (7m+1) mod 25`, a permutation whose cycle
    * structure — six 4-cycles and the fixed point site4 — the oracle
    * rediscovers via a recursive-CTE transitive closure (the q33
    * rule). String hosts ride through the integral-id contract as
    * `xxhash64(host)` (the scale path: no global sort to assign dense
    * ids; a 64-bit collision merely merges two hosts and is
    * negligible at any real host count), and the output is re-keyed
    * to the LEXICOGRAPHICALLY smallest member host so the result is
    * hash-independent and oracle-checkable.
    */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val hostEdges = linkGraphEdges(s, d)
      .where(col("src_domain").startsWith("site") &&
        col("dst_domain").startsWith("site"))
      .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
    val nodes = hostEdges.select(col("src").as("host"))
      .unionAll(hostEdges.select(col("dst").as("host")))
      .distinct()
      .select(col("host"), xxhash64(col("host")).as("id"))
    val pairs = hostEdges.select(
      xxhash64(col("src")).as("id_a"), xxhash64(col("dst")).as("id_b"))
    val members = Dedup.components(pairs)
      .join(nodes, "id")
      .select(col("host"), col("cluster"))
    val reps = members.groupBy(col("cluster"))
      .agg(min(col("host")).as("cluster_rep"),
        count(lit(1)).as("cluster_size"))
    members.join(reps, "cluster")
      .select(col("host"), col("cluster_rep"), col("cluster_size"))
      .orderBy(col("host"))
  }

  /** Oracle-checked READ-BACK of the CDX at-rest layout — the
    * retrieval half of the 100 TB index story (BucketingSpec\u2019s layout
    * under the correctness gate): q113\u2019s keys are written
    * `partitionBy(shard)` (shard = the reversed-host run of the key,
    * everything before `)`) + `sortWithinPartitions(cdx_key)`, then a
    * registered-domain range query is answered FROM THE FILES. The
    * oracle restates the expected keys, counts and min doc ids
    * straight from the synthesis spec, so the write, the layout and
    * the read-back must all land; the plan guard asserts the scan
    * touches ONE shard directory with the finer prefix pushed to
    * parquet (`StringStartsWith`).
    */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val u0 = concat(lit("HTTP://WWW.S"), ds(id % 7), lit(".Example.COM:80/A"),
      ds(id % 11), lit("/B?b="), ds(id % 3), lit("&A=1"))
    val u1 = concat(lit("https://s"), ds(id % 7),
      lit(".example.com:8443/c/"), ds(id % 5))
    val rows = t(s, d, "documents")
      .select(id, explode(array(u0, u1)).as("url"))
      .select(col("doc_id"), GraftFunctions.surt_key(col("url")).as("cdx_key"))
      .withColumn("shard", substring_index(col("cdx_key"), ")", 1))
    val out = new java.io.File(
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_q125_layout"),
      java.lang.Integer.toHexString(d.hashCode)).getAbsolutePath
    rows.repartition(col("shard")).sortWithinPartitions(col("cdx_key"))
      .write.partitionBy("shard").mode("overwrite").parquet(out)
    s.read.parquet(out)
      .where(col("shard") === "com,example,s3" &&
        col("cdx_key").startsWith("com,example,s3)/a1"))
      .groupBy(col("cdx_key"))
      .agg(count(lit(1)).cast("long").as("n"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("cdx_key"))
  }

  // -------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_filter_project" -> (q01 _),
    "q02_tpch_q1_agg" -> (q02 _),
    "q03_broadcast_join" -> (q03 _),
    "q04_multi_join" -> (q04 _),
    "q05_semi_anti" -> (q05 _),
    "q06_window_topk" -> (q06 _),
    "q07_window_running" -> (q07 _),
    "q08_rollup" -> (q08 _),
    "q09_topk_limit" -> (q09 _),
    "q10_setops" -> (q10 _),
    "q11_distinct_agg" -> (q11 _),
    "q12_scalar_funcs" -> (q12 _),
    "q13_json" -> (q13 _),
    "q14_cosine_topk" -> (q14 _),
    "q15_time_window" -> (q15 _),
    "q16_converter" -> (q16 _),
    "q17_exact_dedup" -> (q17 _),
    "q18_neardup_lsh" -> (q18 _),
    "q19_quality_score" -> (q19 _),
    "q20_token_stats" -> (q20 _),
    "q21_simhash_neardup" -> (q21 _),
    "q22_fingerprint" -> (q22 _),
    "q23_ann_lsh" -> (q23 _),
    "q24_lang_id" -> (q24 _),
    "q25_embedding_neardup" -> (q25 _),
    "q26_multimodal" -> (q26 _),
    "q27_streaming_window" -> (q27 _),
    "q28_asof_join" -> (q28 _),
    "q29_session_window" -> (q29 _),
    "q30_cube" -> (q30 _),
    "q31_embedding_neardup_lsh" -> (q31 _),
    "q32_range_join" -> (q32 _),
    "q33_components" -> (q33 _),
    "q34_salted_agg" -> (q34 _),
    "q35_window_frames" -> (q35 _),
    "q36_topk_agg" -> (q36 _),
    "q37_ann_ivf" -> (q37 _),
    "q38_streaming_dedup" -> (q38 _),
    "q39_stateful_sessions" -> (q39 _),
    "q40_percentile" -> (q40 _),
    "q41_bucketed_join" -> (q41 _),
    "q42_explode_sql" -> (q42 _),
    "q43_sliding_window" -> (q43 _),
    "q44_jaccard_neardup" -> (q44 _),
    "q45_pivot" -> (q45 _),
    "q46_stream_stream_join" -> (q46 _),
    "q47_approx_sketches" -> (q47 _),
    "q48_outer_join" -> (q48 _),
    "q49_setops_all" -> (q49 _),
    "q50_frame_sample" -> (q50 _),
    "q51_array_hof" -> (q51 _),
    "q52_bpe_tokens" -> (q52 _),
    "q53_sql_tpch_q3" -> (q53 _),
    "q54_subqueries" -> (q54 _),
    "q55_dist_windows" -> (q55 _),
    "q56_grouping_sets" -> (q56 _),
    "q57_decontaminate" -> (q57 _),
    "q58_text_filter" -> (q58 _),
    "q59_extract_strings" -> (q59 _),
    "q60_repetition" -> (q60 _),
    "q61_stratified_sample" -> (q61 _),
    "q62_pii_scrub" -> (q62 _),
    "q63_recursive_cte" -> (q63 _),
    "q64_seq_packing" -> (q64 _),
    "q65_map_hof" -> (q65 _),
    "q66_unpivot" -> (q66 _),
    "q67_lateral_topn" -> (q67 _),
    "q68_hll_sketches" -> (q68 _),
    "q69_line_dedup" -> (q69 _),
    "q70_upsample" -> (q70 _),
    "q71_chunk_windows" -> (q71 _),
    "q72_size_filter" -> (q72 _),
    "q73_dsv2_source" -> (q73 _),
    "q74_chunked_walk" -> (q74 _),
    "q75_neardup_winners" -> (q75 _),
    "q76_epoch_shuffle" -> (q76 _),
    "q77_semdedup" -> (q77 _),
    "q78_lm_score" -> (q78 _),
    "q79_dsir_select" -> (q79 _),
    "q80_substring_pairs" -> (q80 _),
    "q81_warc_source" -> (q81 _),
    "q82_domain_cap" -> (q82 _),
    "q83_bm25_score" -> (q83 _),
    "q84_gopher_filter" -> (q84 _),
    "q85_top_ngrams" -> (q85 _),
    "q86_char_entropy" -> (q86 _),
    "q87_ar_source" -> (q87 _),
    "q88_bloom_gate" -> (q88 _),
    "q89_cpio_source" -> (q89 _),
    "q90_rpm_source" -> (q90 _),
    "q91_sevenz_source" -> (q91 _),
    "q92_codec_matrix" -> (q92 _),
    "q93_normalize" -> (q93 _),
    "q94_deb_source" -> (q94 _),
    "q95_cdc_chunks" -> (q95 _),
    "q96_url_parse" -> (q96 _),
    "q97_html_extract" -> (q97 _),
    "q98_clean_pipeline" -> (q98 _),
    "q99_url_normalize" -> (q99 _),
    "q100_cdc_parts" -> (q100 _),
    "q101_http_payload" -> (q101 _),
    "q102_url_sortquery" -> (q102 _),
    "q103_http_convert" -> (q103 _),
    "q104_charset_decode" -> (q104 _),
    "q105_main_content" -> (q105 _),
    "q106_freq_items" -> (q106 _),
    "q107_link_graph" -> (q107 _),
    "q108_pagerank" -> (q108 _),
    "q109_robots_gate" -> (q109 _),
    "q110_audio_decode" -> (q110 _),
    "q111_sitemap" -> (q111 _),
    "q112_frontier" -> (q112 _),
    "q113_cdx_keys" -> (q113 _),
    "q114_robots_sitemaps" -> (q114 _),
    "q115_html_meta" -> (q115 _),
    "q116_anchor_text" -> (q116 _),
    "q117_nofollow_rank" -> (q117 _),
    "q118_script_mix" -> (q118 _),
    "q119_crawl_delay" -> (q119 _),
    "q120_warc_cdx" -> (q120 _),
    "q121_fetch_schedule" -> (q121 _),
    "q122_warc_wet" -> (q122 _),
    "q123_image_decode" -> (q123 _),
    "q124_site_clusters" -> (q124 _),
    "q125_cdx_scan" -> (q125 _))

  /** DuckDB-runnable oracles — one per query, including the custom-op
    * surfaces: simhash/fingerprint values are md5-derived (the one hash
    * both engines share), the ANN hyperplanes are fixed ±1 constants
    * inlined below, and the converter fixture's expected rows are a
    * spec-determined VALUES literal (sha256 digests derived
    * independently of the engine).
    */
  val oracleSql: Map[String, String] = {
    // shared SQL fragments (DuckDB dialect)
    val toks = "list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
    val money = (c: String) => s"CAST($c AS DECIMAL(18,2))"
    val rev = s"CAST(SUM(${money("l_extendedprice")} * (CAST(1 AS DECIMAL(18,2)) - ${money("l_discount")})) AS DOUBLE)"
    // 62-bit md5 hash shared with HashingHelper.md5lo62 (mod 2^62 ==
    // low-bit mask, stays in DuckDB's UBIGINT domain before the cast)
    val md5h = (e: String) => s"CAST(md5_number_lower($e) % 4611686018427387904 AS BIGINT)"
    // q23/q31's fixed ±1 hyperplanes + query code, inlined as constants
    // (part of the operator definition, not data-derived). The dot
    // chains are explicit left-to-right sums — the exact IEEE add
    // sequence the engine's vec_dot performs.
    def planeDotChain(p: Array[Int]): String =
      "0.0 " + p.zipWithIndex
        .map { case (sgn, j) => (if (sgn > 0) "+" else "-") + s" v[${j + 1}]" }
        .mkString(" ")
    val q23CodeExpr = Similarity.planeSigns(64, 8).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN (${planeDotChain(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", "\n         + ", ")")
    val q23QCode = Similarity.queryCode(OnesQuery, 64, 8)
    // q31: 8 tables x 8 bits = 64 planes; one code expression per table
    val q31Planes = Similarity.planeSigns(64, 64)
    val q31CodeExprs = (0 until 8).map { t =>
      (0 until 8).map { b =>
        s"(CASE WHEN (${planeDotChain(q31Planes(t * 8 + b))}) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("(", " + ", s") AS c$t")
    }
    // spec-determined fixture rows (sizes + independently computed
    // sha256 digests) — oracles BOTH the converter walk (q16) and its
    // LATERAL VIEW explode_archive SQL face (q42)
    val fixtureOracle =
      """SELECT * FROM (VALUES
        |  ('a.txt', CAST(800 AS BIGINT),
        |   '90ce0e91aa6b20a7e755ae3facb82f04410ac992a53fe534e8246a1b7f10a871'),
        |  ('e.txt.zst', CAST(390 AS BIGINT),
        |   'be9a5820be89dcdce4b8df97c01cdf2e98ebc407e957ae930a0396a8122ab2cb'),
        |  ('f.txt.xz', CAST(370 AS BIGINT),
        |   '14df686258199a2d006cb28a8c51120f12385acd67cc2ef99fb0412be003bc6e'),
        |  ('g.txt.bz2', CAST(400 AS BIGINT),
        |   'f2ab80f749efe643b97fe67f91432f8bf7938d4942ed1880fc91e411a2423789'),
        |  ('inner.zip/b/c.txt', CAST(26 AS BIGINT),
        |   '8d9bb0542d7fefd949a9559bd0c68ba0cf3bba93d0d108f6ca2289d789b8a6a5'),
        |  ('inner.zip/d.bin', CAST(512 AS BIGINT),
        |   'c029dfc944a023bec6662861a4e633237ad3e4f4bca787399fdd487ca52af8f5'),
        |  ('inner2.tar.zst/h.txt', CAST(170 AS BIGINT),
        |   '4fd9024cec0e7478e760c58707179f0e6f5680ab92f89cc4d76d730209dd7e1e'))
        |  AS t(path, size, sha256)
        |ORDER BY path""".stripMargin
    // q97/q98 shared page synthesis + extraction chain (keep in sync
    // with Inventory.syntheticHtml and Quality.htmlToText — the regex
    // pattern set is restricted to Java-regex/RE2-identical syntax,
    // incl. the quoted-attribute tag body, and the entity replace
    // chain emulates the engine's single-pass decode-once scan on
    // exactly the references the synthesis inserts: numeric literals
    // first, `&amp;` LAST, so the double-encoded `&amp;#65;` decodes
    // once to `&#65;` on both sides and `&#xZZ;` survives verbatim)
    val htmlSyn =
      """'<html><head><title>T' || CAST(doc_id AS VARCHAR) || '</title><style type="text/css">p{color:red}</style></head>' ||
        |    '<body><script>var x = 1 < 2;</script><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |    ' &amp;x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end' ||
        |    ' <a href="x>y" title=''z>w''>L</a> caf&#233; &#xE9; &amp;#65; &apos;a&apos; &#xZZ;</p>' ||
        |    '<p>caf&eacute; A&hellip;B &mdash; &copy;7 x&CounterClockwiseContourIntegral;y &amp;eacute; &notareal; <i title=don''t>it</i></p><!-- note --><br/></body></html>'""".stripMargin
    // SQL-quoted form of Quality.TagBody (single quotes doubled)
    val tagBodySql = graft.ops.Quality.TagBody.replace("'", "''")
    // quote-aware pass, then the r12 sloppy-tag cleanup `<[^>]+>`
    // (unpaired-quote tags the hardened TagBody must skip)
    val tagStrip = (c: String) =>
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace($c,
         |      '(?s)<!--.*?-->', ' ', 'g'),
         |      '(?is)<script$tagBodySql>.*?</script>', ' ', 'g'),
         |      '(?is)<style$tagBodySql>.*?</style>', ' ', 'g'),
         |      '<$tagBodySql>', ' ', 'g'),
         |      '<[^>]+>', ' ', 'g')""".stripMargin
    val entityWs = (c: String) =>
      s"""trim(regexp_replace(
         |    replace(replace(replace(replace(replace(
         |    replace(replace(replace(replace(replace(replace(replace(replace(replace($c,
         |      '&#233;', 'é'), '&#xE9;', 'é'), '&apos;', ''''),
         |      '&eacute;', 'é'), '&hellip;', '…'), '&mdash;', '—'), '&copy;', '©'),
         |      '&CounterClockwiseContourIntegral;', '∳'),
         |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
         |    '[ \t\n\r]+', ' ', 'g'))""".stripMargin
    // gaps-and-islands sessionization — oracles BOTH the native
    // session_window (q29) and the flatMapGroupsWithState (q39) paths
    val sessionOracle =
      """WITH o AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts >= lag(ts) OVER w + INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT MIN(ts) AS ss, MAX(ts) + INTERVAL 4 HOUR AS se, user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ss""".stripMargin
    ListMap(
      "q01_filter_project" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem WHERE l_quantity < 24
          |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q02_tpch_q1_agg" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(${money("l_quantity")}) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(${money("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
           |  $rev AS sum_disc_price,
           |  CAST(SUM(${money("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
           |  COUNT(*) AS count_order
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q03_broadcast_join" ->
        """SELECT o_orderkey, c_name, o_totalprice, o_orderdate
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
      "q04_multi_join" ->
        s"""SELECT n_name, $rev AS revenue, COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY n_name ORDER BY n_name""".stripMargin,
      "q05_semi_anti" ->
        """SELECT 'with' AS side, c_custkey FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |UNION ALL
          |SELECT 'without' AS side, c_custkey FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |ORDER BY side, c_custkey""".stripMargin,
      "q06_window_topk" ->
        """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
          |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
          |        row_number() OVER (PARTITION BY o_custkey
          |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |      FROM orders) x
          |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
      "q07_window_running" ->
        s"""SELECT o_custkey, o_orderkey, o_orderdate,
           |  CAST(SUM(${money("o_totalprice")}) OVER (
           |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           |    AS running_total
           |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
      "q08_rollup" ->
        s"""SELECT n_name, o_orderpriority,
           |  CAST(SUM(${money("o_totalprice")}) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_orders
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY ROLLUP(n_name, o_orderpriority)
           |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
      "q09_topk_limit" ->
        """SELECT p_partkey, p_name, p_retailprice FROM part
          |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
      "q10_setops" ->
        """SELECT 'except' AS op, c_custkey FROM (
          |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
          |  EXCEPT
          |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') a
          |UNION ALL
          |SELECT 'intersect' AS op, c_custkey FROM (
          |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
          |  INTERSECT
          |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') b
          |ORDER BY op, c_custkey""".stripMargin,
      "q11_distinct_agg" ->
        """SELECT lang, COUNT(*) AS n_docs,
          |  COUNT(DISTINCT source) AS n_sources,
          |  COUNT(DISTINCT md5(text)) AS n_unique_texts
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
      "q12_scalar_funcs" ->
        """SELECT o_orderkey,
          |  substring(o_orderpriority, 1, 1) AS pri_code,
          |  CAST(date_trunc('month', o_orderdate) AS DATE) AS omonth,
          |  round(o_totalprice, 0) AS price_round,
          |  round(sqrt(o_totalprice), 6) AS price_sqrt
          |FROM orders ORDER BY o_orderkey""".stripMargin,
      "q13_json" ->
        """SELECT event_type,
          |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
          |    AS total_k,
          |  COUNT(*) AS n_events
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      "q14_cosine_topk" ->
        """SELECT vec_id,
          |  round(list_sum([x::DOUBLE for x in embedding]) /
          |        (sqrt(64.0) * sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding]))), 6)
          |    AS cos
          |FROM embeddings ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
      "q15_time_window" ->
        """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
          |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
      "q17_exact_dedup" ->
        """SELECT doc_id, lang FROM documents
          |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
          |ORDER BY doc_id""".stripMargin,
      "q18_neardup_lsh" ->
        s"""WITH w AS (SELECT doc_id, $toks AS t FROM documents),
           |s AS (SELECT doc_id,
           |        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |                       for i in range(1, len(t) - 1)]) AS sh
           |      FROM w),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |              CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)
           |          AS jaccard
           |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
           |ORDER BY id_a, id_b""".stripMargin,
      "q19_quality_score" ->
        s"""WITH q AS (
           |  SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_tokens,
           |    CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
           |      / CAST(length(text) AS DOUBLE) AS praw,
           |    $toks AS t,
           |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) AS alnum
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, n_tokens, praw,
           |    CASE WHEN len(t) = 0 THEN 0.0
           |         ELSE CAST(len(list_filter(t, x -> list_contains(
           |                ['the','a','an','of','and','to','in','is','it','for',
           |                 'on','with','as','at','by','or','be','this','that','are'], x)))
           |              AS DOUBLE) / CAST(len(t) AS DOUBLE) END AS sraw,
           |    CASE WHEN len(t) = 0 THEN 0.0 ELSE alnum / CAST(len(t) AS DOUBLE) END AS araw
           |  FROM q)
           |SELECT doc_id, n_tokens,
           |  round(praw, 6) AS punct_ratio,
           |  round(sraw, 6) AS stop_ratio,
           |  round(araw, 6) AS avg_tok_len,
           |  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
           |        + (1.0 - least(praw * 4.0, 1.0)) * 0.3
           |        + least(sraw * 5.0, 1.0) * 0.3, 6) AS quality
           |FROM r ORDER BY doc_id""".stripMargin,
      "q20_token_stats" ->
        """WITH q AS (SELECT lang,
          |    CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS tc
          |  FROM documents)
          |SELECT lang, COUNT(*) AS n_docs,
          |  CAST(SUM(tc) AS BIGINT) AS total_tokens,
          |  CAST(MIN(tc) AS BIGINT) AS min_tokens,
          |  CAST(MAX(tc) AS BIGINT) AS max_tokens,
          |  round(CAST(SUM(tc) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
          |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
      "q27_streaming_window" ->
        """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
          |  COUNT(*) AS n
          |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
      "q25_embedding_neardup" ->
        """WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
          |           FROM embeddings),
          |n AS (SELECT vec_id, v, sqrt(list_sum([x * x for x in v])) AS nrm FROM e),
          |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |        round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
          |              / (a.nrm * b.nrm), 6) AS cos
          |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
          |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.45
          |ORDER BY id_a, id_b""".stripMargin,
      // spec-determined fixture content: sizes and sha256 digests are
      // derived from the fixture definition itself (independently
      // computed), not from engine output
      "q16_converter" -> fixtureOracle,
      "q21_simhash_neardup" ->
        s"""WITH w AS (SELECT doc_id, $toks AS t FROM documents),
           |tok AS (SELECT doc_id, unnest(t) AS tk FROM w),
           |th AS (SELECT doc_id, ${md5h("tk")} AS h FROM tok),
           |v AS (SELECT doc_id, b,
           |        SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
           |      FROM th CROSS JOIN (SELECT unnest(range(0, 62)) AS b) bits
           |      GROUP BY doc_id, b),
           |sh0 AS (SELECT doc_id,
           |          CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b)
           |                        ELSE 0 END) AS BIGINT) AS sim
           |        FROM v GROUP BY doc_id),
           |sh AS (SELECT d.doc_id, coalesce(s.sim, 0) AS sim
           |       FROM documents d LEFT JOIN sh0 s USING (doc_id)),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |        CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
           |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
           |ORDER BY id_a, id_b""".stripMargin,
      "q22_fingerprint" ->
        s"""WITH w AS (SELECT doc_id, array_to_string($toks, ' ') AS s FROM documents),
           |g0 AS (SELECT doc_id, s,
           |         unnest(range(1, greatest(length(s) - 7, 1))) AS i FROM w),
           |g AS (SELECT doc_id, i, ${md5h("s[i:i+8]")} AS gh FROM g0),
           |m AS (SELECT doc_id, i,
           |        MIN(gh) OVER (PARTITION BY doc_id ORDER BY i
           |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
           |        COUNT(*) OVER (PARTITION BY doc_id) AS cnt
           |      FROM g),
           |sel AS (SELECT doc_id, wmin FROM m WHERE i <= greatest(cnt - 3, 1)),
           |agg AS (SELECT doc_id, CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fp,
           |          MIN(wmin) AS fp_min, MAX(wmin) AS fp_max
           |        FROM sel GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp, a.fp_min, a.fp_max
           |FROM documents d LEFT JOIN agg a USING (doc_id)
           |ORDER BY doc_id""".stripMargin,
      // shared-substring pairs: every 24-gram hash of the q22
      // normalization (no winnowing: window=1 keeps all positions),
      // df-capped gram buckets, bucket self-join
      "q80_substring_pairs" ->
        s"""WITH w AS (SELECT doc_id, array_to_string($toks, ' ') AS s FROM documents),
           |g0 AS (SELECT doc_id, s,
           |         unnest(range(1, greatest(length(s) - 22, 1))) AS i FROM w),
           |g AS (SELECT DISTINCT doc_id, ${md5h("s[i:i+23]")} AS gh FROM g0),
           |d AS (SELECT gh, count(*) AS df FROM g GROUP BY 1),
           |ok AS (SELECT gh FROM d WHERE df BETWEEN 2 AND 64),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |        CAST(count(*) AS BIGINT) AS shared_grams
           |      FROM g a JOIN ok USING (gh)
           |      JOIN g b ON b.gh = a.gh AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2)
           |SELECT id_a, id_b, shared_grams FROM p
           |ORDER BY id_a, id_b""".stripMargin,
      // WARC source: spec-body sizes/digests (gzip body decompressed),
      // computed independently of the engine — q16's rule
      "q81_warc_source" ->
        """SELECT * FROM (VALUES
          |  ('http://example.com/a', CAST(61 AS BIGINT),
          |   '2f3babcd61440d11781cee7d50239f8da627c7b3b074b61c18ec7c53901fdf29'),
          |  ('http://example.com/b.gz', CAST(96 AS BIGINT),
          |   '5bdb30d6bbce8e6ab66662add7770735fceb75e80a21f59120d86c143f3f99c4'),
          |  ('http://example.com/q', CAST(38 AS BIGINT),
          |   '21f029f71caca9496095c89a38cc12b103f1e92d5d21dc98f115804cd0f76fc3'),
          |  ('urn:uuid:0001', CAST(23 AS BIGINT),
          |   '751ec4bf1090414242c2120922d78d60406bcdf18c2add84d9dd712b4fbfc235'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin,
      // WARC -> HTTP payload: spec-payload sizes/sha256 digests
      // (chunked framing reversed, gzip/deflate/zstd decoded, br kept
      // encoded, request/trunc edge rows), computed independently of
      // the engine — q16's rule
      "q101_http_payload" ->
        """SELECT * FROM (VALUES
          |  ('http://t/badstatus', CAST(NULL AS BIGINT), 'x/y', CAST(9 AS BIGINT),
          |   'c4a804aab7d55989f3eaaf1e09f1e524a24ec47c352a5caa3ba63c46e1d17aed'),
          |  ('http://t/brotli', CAST(200 AS BIGINT), 'text/html', CAST(19 AS BIGINT),
          |   '328eae1ba9403bf4226450ba9bf2ec39ac03934879e10f0549e30dca00d970d0'),
          |  ('http://t/chunked', CAST(200 AS BIGINT), 'text/plain', CAST(33 AS BIGINT),
          |   'ffae2152cdbac81cfb16a497598f561a84edb3acd4b22531ca75fc46de368f7e'),
          |  ('http://t/deflate', CAST(200 AS BIGINT), 'text/html', CAST(42 AS BIGINT),
          |   '586d7a508d5d281e7afbdad827c294c96f9803715a413a08e2018070b215b9a2'),
          |  ('http://t/gzip', CAST(200 AS BIGINT), 'text/html', CAST(87 AS BIGINT),
          |   'f33351fcef8898a404a4eaa0598fcb8e6df3750e607ba4c3e3df4ff5213d135d'),
          |  ('http://t/gzip-chunked', CAST(200 AS BIGINT), 'text/html', CAST(76 AS BIGINT),
          |   'cfb522aae2e305d686722d495d6464a9d5d4b7383bbe40e57a196d96b30e73d6'),
          |  ('http://t/plain', CAST(200 AS BIGINT), 'text/html; charset=UTF-8', CAST(19 AS BIGINT),
          |   'e1e54bf71542cb04326c1be75988ebcadcd3a8c6cbba44209d68b3ef03399673'),
          |  ('http://t/req', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(28 AS BIGINT),
          |   '7dee6ae752438d978cdb1bbc796fff60f5be3ce1faa90553949639eb86e0c18f'),
          |  ('http://t/trunc', CAST(204 AS BIGINT), 'text/empty', CAST(0 AS BIGINT),
          |   'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'),
          |  ('http://t/zstd', CAST(200 AS BIGINT), 'text/html', CAST(90 AS BIGINT),
          |   'c781b6607968bca0e7baa6d86081fb2da7e66c823e5a49199265c12588e529d2'))
          |  AS t(path, status, content_type, payload_size, payload_sha256)
          |ORDER BY path""".stripMargin,
      // --http-payload converter mode: the same independently-computed
      // spec digests as q101 — the converter's RECOMPUTED hash must
      // land on them exactly
      "q103_http_convert" ->
        """SELECT * FROM (VALUES
          |  ('http://t/badstatus', CAST(9 AS BIGINT),
          |   'c4a804aab7d55989f3eaaf1e09f1e524a24ec47c352a5caa3ba63c46e1d17aed',
          |   CAST(NULL AS BIGINT), 'x/y'),
          |  ('http://t/brotli', CAST(19 AS BIGINT),
          |   '328eae1ba9403bf4226450ba9bf2ec39ac03934879e10f0549e30dca00d970d0',
          |   CAST(200 AS BIGINT), 'text/html'),
          |  ('http://t/chunked', CAST(33 AS BIGINT),
          |   'ffae2152cdbac81cfb16a497598f561a84edb3acd4b22531ca75fc46de368f7e',
          |   CAST(200 AS BIGINT), 'text/plain'),
          |  ('http://t/deflate', CAST(42 AS BIGINT),
          |   '586d7a508d5d281e7afbdad827c294c96f9803715a413a08e2018070b215b9a2',
          |   CAST(200 AS BIGINT), 'text/html'),
          |  ('http://t/gzip', CAST(87 AS BIGINT),
          |   'f33351fcef8898a404a4eaa0598fcb8e6df3750e607ba4c3e3df4ff5213d135d',
          |   CAST(200 AS BIGINT), 'text/html'),
          |  ('http://t/gzip-chunked', CAST(76 AS BIGINT),
          |   'cfb522aae2e305d686722d495d6464a9d5d4b7383bbe40e57a196d96b30e73d6',
          |   CAST(200 AS BIGINT), 'text/html'),
          |  ('http://t/plain', CAST(19 AS BIGINT),
          |   'e1e54bf71542cb04326c1be75988ebcadcd3a8c6cbba44209d68b3ef03399673',
          |   CAST(200 AS BIGINT), 'text/html; charset=UTF-8'),
          |  ('http://t/req', CAST(28 AS BIGINT),
          |   '7dee6ae752438d978cdb1bbc796fff60f5be3ce1faa90553949639eb86e0c18f',
          |   CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)),
          |  ('http://t/trunc', CAST(0 AS BIGINT),
          |   'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855',
          |   CAST(204 AS BIGINT), 'text/empty'),
          |  ('http://t/zstd', CAST(90 AS BIGINT),
          |   'c781b6607968bca0e7baa6d86081fb2da7e66c823e5a49199265c12588e529d2',
          |   CAST(200 AS BIGINT), 'text/html'))
          |  AS t(path, size, payload_sha256, status, content_type)
          |ORDER BY path""".stripMargin,
      // charset decode: expected md5/length of each decoded case,
      // computed by an INDEPENDENT implementation (Python codecs) over
      // the shared case table — q16's rule
      "q104_charset_decode" ->
        """SELECT * FROM (VALUES
          |  ('c01_latin1', '22cfb630e1da4ea27cc0456222465dd5', CAST(12 AS BIGINT)),
          |  ('c02_win1252', '397cb062c97d15bc18329ff5c1510776', CAST(17 AS BIGINT)),
          |  ('c03_bom_utf8', '6396cddad62ed4cd1df3419571efb86d', CAST(10 AS BIGINT)),
          |  ('c04_bom_utf16le', 'bdf89c9c0ad0f5ed6aa134d0ff9f57b8', CAST(10 AS BIGINT)),
          |  ('c05_bad_utf8', 'ac525cea2347e2b88736ebae779ce0b0', CAST(5 AS BIGINT)),
          |  ('c06_unknown_cs', '829fba0739e1936f4bc07b8441b60069', CAST(12 AS BIGINT)),
          |  ('c07_bare_hint', '07117fe4a1ebd544965dc19573183da2', CAST(4 AS BIGINT)),
          |  ('c08_sjis', 'f95716c1bda20a02d24c31e402d795d2', CAST(6 AS BIGINT)),
          |  ('c09_bom_utf16be', '905824030bde0411ad3d686a5aaf2630', CAST(7 AS BIGINT)),
          |  ('c10_no_hint', 'f15c50559ebf770bb32bf3a048051570', CAST(9 AS BIGINT)),
          |  ('c11_meta', 'd598178d8c6663decd0f9cf7c10a34e3', CAST(31 AS BIGINT)),
          |  ('c12_meta_httpequiv', '0adb32cb24b4ececbd13f6c0e436635d', CAST(75 AS BIGINT)),
          |  ('c13_header_beats_meta', '1cf9d3fa166e508ce19aa19b90fc6ca6', CAST(27 AS BIGINT)))
          |  AS t(case_id, text_md5, n_chars)
          |ORDER BY case_id""".stripMargin,
      // q105: every output derived from the page-synthesis spec, not
      // from parsing HTML (q16-rule independent path). Blocks = title
      // + (3 + doc_id%5) nav lis + h1 + content p + footer = 7 +
      // doc_id%5; only the content <p> can classify as content: its
      // cleaned text is text||' see details here now' (length+21,
      // 12 link chars), title/h1/lis fail the 150-char gate (lis are
      // density 1.0 too) and the 128-char footer carries 36 link
      // chars = density 0.28125 > 0.2. Same IEEE double division on
      // both sides; md5('') is the no-content sentinel.
      "q105_main_content" ->
        s"""SELECT doc_id,
           |  CAST(7 + doc_id % 5 AS BIGINT) AS n_blocks,
           |  CAST(CASE WHEN ok THEN 1 ELSE 0 END AS BIGINT) AS n_content,
           |  CAST(CASE WHEN ok THEN length(text) + ${MainContentSuffix.length}
           |       ELSE 0 END AS BIGINT) AS content_len,
           |  CASE WHEN ok THEN md5(text || '$MainContentSuffix')
           |       ELSE md5('') END AS content_md5
           |FROM (SELECT doc_id, text,
           |  length(text) + ${MainContentSuffix.length} >= $MainContentMinLen
           |  AND ${MainContentLinkText.length}.0 /
           |      (length(text) + ${MainContentSuffix.length})
           |      <= $MainContentMaxLinkDensity AS ok
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin,
      // q106: exact heavy hitters (count·k > n) from a real GROUP BY
      // over the same zipf-like key derivation; the sketch guarantees
      // (membership above n/k, underestimate within n/k) are
      // order-independent theorems, stated as TRUE — q68's rule
      "q106_freq_items" ->
        s"""WITH li AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey > 0),
           |m AS (SELECT max(l_orderkey) AS m, count(*) AS n FROM li),
           |keys AS (SELECT 'pg' || CAST(m.m // l_orderkey AS VARCHAR) AS tok
           |         FROM li, m)
           |SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt,
           |       TRUE AS in_sketch, TRUE AS within_bound
           |FROM keys, m GROUP BY tok, m.n
           |HAVING count(*) * $FreqItemsK > m.n
           |ORDER BY exact_cnt DESC, tok""".stripMargin,
      // q107/q108: edges derived from the linkGraphEdges synthesis
      // spec — per doc, the 8 fetchable targets with their resolved +
      // sort-query-normalized URL (the mailto/comment/script anchors
      // contribute nothing by construction)
      "q107_link_graph" ->
        s"""$linkEdgesSql
           |SELECT 'site' || CAST(d.m AS VARCHAR) || '.com' AS src_domain,
           |       l.dst AS dst_domain,
           |       CAST(count(*) AS BIGINT) AS n_links,
           |       CAST(count(DISTINCT l.u) AS BIGINT) AS n_urls
           |FROM links l JOIN docs d USING (doc_id)
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin,
      "q108_pagerank" ->
        s"""$linkEdgesSql,
           |${pageRankIterSql(LinkGraphIters, LinkGraphDamping)}
           |SELECT node, round(pr, 6) AS pr FROM r$LinkGraphIters
           |ORDER BY node""".stripMargin,
      // q124: the site-to-site subgraph closed transitively (the q33
      // rule) — the synthesis makes it the permutation m -> (7m+1)%25,
      // so the clusters are its cycles; rep = lexicographic min member
      "q124_site_clusters" ->
        s"""${linkEdgesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
           |he AS (SELECT DISTINCT
           |         'site' || CAST(d.m AS VARCHAR) || '.com' AS src,
           |         l.dst AS dst
           |       FROM links l JOIN docs d USING (doc_id)
           |       WHERE l.dst LIKE 'site%'),
           |e AS (SELECT src, dst FROM he UNION SELECT dst, src FROM he),
           |reach(id, r) AS (
           |  SELECT src, src FROM e
           |  UNION
           |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
           |comp AS (SELECT id AS host, MIN(r) AS cluster_rep
           |         FROM reach GROUP BY id),
           |sz AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
           |       FROM comp GROUP BY cluster_rep)
           |SELECT host, cluster_rep, cluster_size
           |FROM comp JOIN sz USING (cluster_rep)
           |ORDER BY host""".stripMargin,
      // q109: every verdict is spec-determined — the section probe is
      // denied iff it hits the doc's own Disallow section, the $-
      // anchored Allow admits the exact path and nothing deeper, the
      // *.gif$ wildcard anchors on the extension, and the otherbot
      // probe falls to the catch-all only where the synthesis emits
      // one (even ids)
      "q109_robots_gate" ->
        """SELECT doc_id,
          |  CASE WHEN doc_id % 2 = doc_id % 3 THEN FALSE ELSE TRUE END AS a_sect,
          |  TRUE AS a_allow,
          |  FALSE AS a_deep,
          |  FALSE AS a_gif,
          |  TRUE AS a_gifx,
          |  CASE WHEN doc_id % 2 = 0 THEN FALSE ELSE TRUE END AS a_star
          |FROM documents
          |ORDER BY doc_id""".stripMargin,
      // q110: sample values are spec-determined integers; their sums
      // stay below 2^53 so double aggregation is exact on both
      // engines regardless of order — mean/RMS/peak recompute from
      // the same arithmetic over range(n)
      "q110_audio_decode" ->
        """WITH f AS (
          |  SELECT doc_id, 800 + (doc_id % 5) * 80 AS n,
          |         doc_id % 2 = 0 AS is8
          |  FROM documents),
          |s AS (
          |  SELECT f.doc_id, f.n, f.is8,
          |         CASE WHEN f.is8 THEN CAST((f.doc_id + t.i) % 256 AS DOUBLE)
          |              ELSE CAST((f.doc_id * 31 + t.i * 7) % 65536 - 32768 AS DOUBLE)
          |         END AS v
          |  FROM f, range(1120) t(i) WHERE t.i < f.n)
          |SELECT doc_id, 'wav' AS format,
          |       CAST(1 AS INTEGER) AS channels,
          |       CAST(8000 AS INTEGER) AS sample_rate,
          |       CAST(CASE WHEN is8 THEN 8 ELSE 16 END AS INTEGER) AS bits,
          |       CAST(n AS BIGINT) AS frames,
          |       round(avg(v), 6) AS mean_c0,
          |       round(sqrt(avg(v * v)), 6) AS rms_c0,
          |       max(abs(v)) AS peak_c0
          |FROM s GROUP BY doc_id, n, is8
          |ORDER BY doc_id""".stripMargin,
      // q111: every field is spec-determined from (doc_id, ord) — the
      // urlset face enumerates 2 + doc_id%3 entries (entity-escaped
      // loc at ord 0, CDATA at 1, malformed priority at 3 → null),
      // the index face (doc_id%5=0) two sitemap entries
      "q111_sitemap" ->
        """WITH u AS (
          |  SELECT doc_id, CAST(t.i AS BIGINT) AS ord,
          |         'http://s' || (doc_id % 7) || '.example.com' AS host
          |  FROM documents, range(4) t(i)
          |  WHERE doc_id % 5 <> 0 AND t.i < 2 + doc_id % 3),
          |x AS (
          |  SELECT doc_id, ord,
          |    CASE ord
          |      WHEN 0 THEN host || '/p?a=1&b=' || (doc_id % 4)
          |      WHEN 1 THEN host || '/c/' || (doc_id % 3)
          |      WHEN 2 THEN host || '/p' || doc_id || '/2'
          |      ELSE host || '/p' || doc_id || '/3' END AS loc,
          |    'url' AS kind,
          |    CASE WHEN ord IN (0, 2)
          |         THEN '2024-0' || (doc_id % 9 + 1) || '-15' END AS lastmod,
          |    CASE WHEN ord = 1 THEN
          |      CASE doc_id % 3 WHEN 0 THEN 'daily'
          |           WHEN 1 THEN 'weekly' ELSE 'monthly' END END AS changefreq,
          |    CASE WHEN ord < 3
          |         THEN round(((doc_id + ord) % 10) / 10.0, 1) END AS priority
          |  FROM u
          |  UNION ALL
          |  SELECT doc_id, CAST(t.j AS BIGINT) AS ord,
          |    'http://s' || (doc_id % 7) || '.example.com/sm' || t.j || '.xml',
          |    'sitemap',
          |    CASE WHEN t.j = 0 THEN '2024-0' || (doc_id % 9 + 1) || '-15' END,
          |    CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
          |  FROM documents, range(2) t(j) WHERE doc_id % 5 = 0)
          |SELECT doc_id, ord, loc, kind, lastmod, changefreq, priority
          |FROM x ORDER BY doc_id, ord""".stripMargin,
      // q112: the frontier pipeline restated from the q111 synthesis
      // spec — admission verdicts are closed-form (ord 0 denied iff
      // b=2 hits the /p?*b=2 glob, ord 1 admitted iff the /c/0 Allow
      // outranks /c/, ords 2-3 match no rule), missing priority takes
      // the sitemaps.org default 0.5, dedup keeps max priority, and
      // the per-host top-2 is a window the engine's bounded
      // aggregator must agree with exactly
      "q112_frontier" ->
        """WITH u AS (
          |  SELECT doc_id, CAST(t.i AS BIGINT) AS ord,
          |         's' || (doc_id % 7) || '.example.com' AS host
          |  FROM documents, range(4) t(i)
          |  WHERE doc_id % 5 <> 0 AND t.i < 2 + doc_id % 3),
          |e AS (
          |  SELECT host,
          |    CASE ord
          |      WHEN 0 THEN 'http://' || host || '/p?a=1&b=' || (doc_id % 4)
          |      WHEN 1 THEN 'http://' || host || '/c/' || (doc_id % 3)
          |      WHEN 2 THEN 'http://' || host || '/p' || doc_id || '/2'
          |      ELSE 'http://' || host || '/p' || doc_id || '/3' END AS loc,
          |    CASE WHEN ord < 3
          |         THEN round(((doc_id + ord) % 10) / 10.0, 1)
          |         ELSE 0.5 END AS pri,
          |    CASE WHEN ord = 0 THEN doc_id % 4 <> 2
          |         WHEN ord = 1 THEN doc_id % 3 = 0
          |         ELSE TRUE END AS admitted
          |  FROM u),
          |g AS (
          |  SELECT host, loc, max(pri) AS pri
          |  FROM e WHERE admitted GROUP BY host, loc),
          |r AS (
          |  SELECT host, loc, pri,
          |         row_number() OVER (PARTITION BY host
          |                            ORDER BY pri DESC, loc) AS rank
          |  FROM g)
          |SELECT host, CAST(rank AS BIGINT) AS rank, loc, pri
          |FROM r WHERE rank <= 2 ORDER BY host, rank""".stripMargin,
      // q113: the oracle states each expected SURT key as ONE literal
      // from the synthesis spec — scheme drop, www strip, label
      // reversal, default-port drop / non-default keep, lowercase and
      // query sort must all land for the strings to hash-match
      "q113_cdx_keys" ->
        """WITH u AS (
          |  SELECT 'com,example,s' || (doc_id % 7) || ')/a' ||
          |         (doc_id % 11) || '/b?a=1&b=' || (doc_id % 3) AS cdx_key
          |  FROM documents
          |  UNION ALL
          |  SELECT 'com,example,s' || (doc_id % 7) || ':8443)/c/' ||
          |         (doc_id % 5)
          |  FROM documents)
          |SELECT cdx_key, CAST(count(*) AS BIGINT) AS n
          |FROM u GROUP BY cdx_key ORDER BY cdx_key""".stripMargin,
      // q125: the read-back rows restated from the synthesis spec —
      // shard com,example,s3 (doc_id%7=3), prefix )/a1 admits the
      // a1/ and a10/ paths (doc_id%11 in (1,10)); counts and min doc
      // ids come from the same arithmetic over documents
      "q125_cdx_scan" ->
        """WITH m AS (
          |  SELECT doc_id,
          |         'com,example,s3)/a' || (doc_id % 11) ||
          |         '/b?a=1&b=' || (doc_id % 3) AS cdx_key
          |  FROM documents
          |  WHERE doc_id % 7 = 3 AND doc_id % 11 IN (1, 10))
          |SELECT cdx_key, CAST(count(*) AS BIGINT) AS n,
          |       min(doc_id) AS min_doc
          |FROM m GROUP BY cdx_key ORDER BY cdx_key""".stripMargin,
      // q114: directive order is file order — the per-doc Sitemap line
      // at ord 0, the even-id lowercase-key second line at ord 1; the
      // comment line and the empty-value Sitemap contribute nothing
      "q114_robots_sitemaps" ->
        """WITH x AS (
          |  SELECT doc_id, CAST(0 AS BIGINT) AS ord,
          |         'http://s' || (doc_id % 7) || '.example.com/sm' ||
          |         (doc_id % 3) || '.xml' AS sitemap
          |  FROM documents
          |  UNION ALL
          |  SELECT doc_id, CAST(1 AS BIGINT),
          |         'http://s' || (doc_id % 7) || '.example.com/extra.xml'
          |  FROM documents WHERE doc_id % 2 = 0)
          |SELECT doc_id, ord, sitemap FROM x ORDER BY doc_id, ord""".stripMargin,
      // q115: every field restated from the synthesis spec — the title
      // entity-decodes (&amp; &mdash;) and whitespace-collapses, the
      // decoys in the comment and the script literal must be skipped,
      // the canonical &amp; decodes, noindex only on ids % 5 = 0
      "q115_html_meta" ->
        """SELECT doc_id,
          |  'Doc & ' || doc_id || ' — s' || (doc_id % 7) AS title,
          |  CASE WHEN doc_id % 2 = 0
          |       THEN 'Desc ' || (doc_id % 4) || ' é' END AS description,
          |  CASE WHEN doc_id % 3 = 0
          |       THEN 'http://s' || (doc_id % 7) ||
          |            '.example.com/c?a=1&b=2' END AS canonical,
          |  doc_id % 5 = 0 AS noindex
          |FROM documents ORDER BY doc_id""".stripMargin,
      // q116: rows restated from the synthesis spec — the script decoy
      // and the no-href anchor contribute nothing, the entity/nested-
      // markup anchor collapses to clean text, nofollow fires only on
      // the even ids' token list, the image-only anchor's text is null
      "q116_anchor_text" ->
        """WITH x AS (
          |  SELECT doc_id, CAST(0 AS BIGINT) AS ord, '/p?x=&y' AS href,
          |         'Link & text ' || (doc_id % 5) AS atext,
          |         FALSE AS nofollow
          |  FROM documents
          |  UNION ALL
          |  SELECT doc_id, CAST(1 AS BIGINT), '/plain',
          |         'plain ' || (doc_id % 3), doc_id % 2 = 0
          |  FROM documents
          |  UNION ALL
          |  SELECT doc_id, CAST(2 AS BIGINT), '/empty',
          |         CAST(NULL AS VARCHAR), FALSE
          |  FROM documents)
          |SELECT doc_id, ord, href, atext, nofollow
          |FROM x ORDER BY doc_id, ord""".stripMargin,
      // q117: the follow edges restated from the spec (the nofollow
      // anchor and the even-id conditional must NOT contribute) + the
      // q108-shared fixed-3-iteration recurrence
      "q117_nofollow_rank" ->
        s"""WITH docs AS (
           |  SELECT doc_id, 's' || (doc_id % 10) || '.com' AS src
           |  FROM documents),
           |links AS (
           |  SELECT src, 't' || ((doc_id * 3 + 1) % 10) || '.com' AS dst
           |  FROM docs
           |  UNION ALL
           |  SELECT src, 't' || ((doc_id + 1) % 10) || '.com'
           |  FROM docs WHERE doc_id % 2 = 1),
           |edges AS (
           |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
           |  FROM links GROUP BY 1, 2),
           |${pageRankRecurrenceSql(LinkGraphIters, LinkGraphDamping)}
           |SELECT node, round(pr, 6) AS pr FROM r$LinkGraphIters
           |ORDER BY node""".stripMargin,
      // q118: counts restated from the synthesis spec; fractions are
      // divisions of the same integers, exact on both engines (the
      // digits/punct/whitespace must not reach the letter count)
      "q118_script_mix" ->
        """WITH c AS (
          |  SELECT doc_id,
          |    CAST(2 + doc_id % 3 AS DOUBLE) AS lat,
          |    CAST(1 + doc_id % 2 AS DOUBLE) AS cyr,
          |    CAST(doc_id % 2 AS DOUBLE) AS han,
          |    CAST(4 + doc_id % 3 + 2 * (doc_id % 2) AS DOUBLE) AS tot
          |  FROM documents)
          |SELECT doc_id,
          |  round(lat / tot, 6) AS latin,
          |  round(cyr / tot, 6) AS cyrillic,
          |  round(han / tot, 6) AS cjk,
          |  round(CAST(1 AS DOUBLE) / tot, 6) AS greek,
          |  CAST(0 AS DOUBLE) AS arabic,
          |  CAST(0 AS DOUBLE) AS other,
          |  CAST(tot AS BIGINT) AS n_letters
          |FROM c ORDER BY doc_id""".stripMargin,
      // q119: the two graftbot groups combine with the largest delay
      // winning; the otherbot probe sees the * group only on even ids
      // (null = no delay anywhere); integer-valued doubles are exact
      "q119_crawl_delay" ->
        """SELECT doc_id,
          |  CAST(GREATEST(doc_id % 5 + 1, doc_id % 3) AS DOUBLE) AS d_graft,
          |  CASE WHEN doc_id % 2 = 0 THEN CAST(10 AS DOUBLE) END AS d_star
          |FROM documents ORDER BY doc_id""".stripMargin,
      // q120: q101's spec digests under hand-derived SURT keys
      // (http://t/X -> t)/X: single-label host, scheme dropped, path
      // already lowercase) — walk + HTTP decode + canonicalization
      // all load-bearing in one VALUES literal
      "q120_warc_cdx" ->
        """SELECT * FROM (VALUES
          |  ('t)/badstatus', CAST(NULL AS BIGINT), CAST(9 AS BIGINT),
          |   'c4a804aab7d55989f3eaaf1e09f1e524a24ec47c352a5caa3ba63c46e1d17aed'),
          |  ('t)/brotli', CAST(200 AS BIGINT), CAST(19 AS BIGINT),
          |   '328eae1ba9403bf4226450ba9bf2ec39ac03934879e10f0549e30dca00d970d0'),
          |  ('t)/chunked', CAST(200 AS BIGINT), CAST(33 AS BIGINT),
          |   'ffae2152cdbac81cfb16a497598f561a84edb3acd4b22531ca75fc46de368f7e'),
          |  ('t)/deflate', CAST(200 AS BIGINT), CAST(42 AS BIGINT),
          |   '586d7a508d5d281e7afbdad827c294c96f9803715a413a08e2018070b215b9a2'),
          |  ('t)/gzip', CAST(200 AS BIGINT), CAST(87 AS BIGINT),
          |   'f33351fcef8898a404a4eaa0598fcb8e6df3750e607ba4c3e3df4ff5213d135d'),
          |  ('t)/gzip-chunked', CAST(200 AS BIGINT), CAST(76 AS BIGINT),
          |   'cfb522aae2e305d686722d495d6464a9d5d4b7383bbe40e57a196d96b30e73d6'),
          |  ('t)/plain', CAST(200 AS BIGINT), CAST(19 AS BIGINT),
          |   'e1e54bf71542cb04326c1be75988ebcadcd3a8c6cbba44209d68b3ef03399673'),
          |  ('t)/req', CAST(NULL AS BIGINT), CAST(28 AS BIGINT),
          |   '7dee6ae752438d978cdb1bbc796fff60f5be3ce1faa90553949639eb86e0c18f'),
          |  ('t)/trunc', CAST(204 AS BIGINT), CAST(0 AS BIGINT),
          |   'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'),
          |  ('t)/zstd', CAST(200 AS BIGINT), CAST(90 AS BIGINT),
          |   'c781b6607968bca0e7baa6d86081fb2da7e66c823e5a49199265c12588e529d2'))
          |  AS t(cdx_key, status, n_bytes, payload_sha256)
          |ORDER BY cdx_key""".stripMargin,
      // q121: delay is host-determined so r × delay is closed-form;
      // integer-valued doubles are exact on both engines
      "q121_fetch_schedule" ->
        """WITH u AS (
          |  SELECT 's' || (doc_id % 10) || '.com' AS host,
          |         CAST(doc_id % 10 + 1 AS DOUBLE) AS delay,
          |         'http://s' || (doc_id % 10) || '.com/u' || doc_id ||
          |         '/' || t.i AS loc
          |  FROM documents, range(2) t(i)),
          |r AS (
          |  SELECT host, loc, delay,
          |         row_number() OVER (PARTITION BY host ORDER BY loc) - 1 AS r
          |  FROM u)
          |SELECT host, loc, CAST(r * delay AS DOUBLE) AS fetch_at
          |FROM r ORDER BY host, loc""".stripMargin,
      // q122: the WARC->WET text pipeline under one oracle — status,
      // block counts and md5/length of NFC(spec paragraph text),
      // computed by an INDEPENDENT implementation (Python codecs +
      // unicodedata) over the shared WetCases table; every page has
      // 5 non-empty blocks and exactly the paragraph classifies as
      // content (c09 fails the 60-char gate: empty WET, md5(''))
      "q122_warc_wet" ->
        """SELECT * FROM (VALUES
          |  ('http://w/c01_latin1', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(74 AS BIGINT), '857df3c4ff282c92b4d79d7e772e620b'),
          |  ('http://w/c02_win1252', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(74 AS BIGINT), '662e596e993fdcfa93744e97ccb48f00'),
          |  ('http://w/c03_utf16le', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(91 AS BIGINT), 'c2ec76b69aef0081f2ab2fb51b7afcb1'),
          |  ('http://w/c04_bom_utf8', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(90 AS BIGINT), '1186bdfe6a319f0eed60f5c6bcdfdd0f'),
          |  ('http://w/c05_meta_sjis', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(77 AS BIGINT), '659810c00e0e990d7a4aeaaaec0714f5'),
          |  ('http://w/c06_gzip_latin1', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(83 AS BIGINT), '742fcc2f003921ec362c84f88e3c8e8d'),
          |  ('http://w/c07_chunked_utf8', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(81 AS BIGINT), 'c0850e394f45d8299a960f2fdb193ac3'),
          |  ('http://w/c08_nfc', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(1 AS BIGINT), CAST(79 AS BIGINT), 'b0e59e012001e64a6f5e3f9d6d497ce0'),
          |  ('http://w/c09_short', CAST(200 AS BIGINT), CAST(5 AS BIGINT),
          |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'd41d8cd98f00b204e9800998ecf8427e'))
          |  AS t(path, status, n_blocks, n_content, wet_len, wet_md5)
          |ORDER BY path""".stripMargin,
      // q123: mean/std recomputed from the SAME spec arithmetic over
      // range(w) x range(h) — integer sums are exact, the final
      // division/sqrt is the identical IEEE op on both sides (q110's
      // analytic-exactness rule); metadata restated from the spec
      "q123_image_decode" ->
        """WITH bpx AS (
          |  SELECT doc_id,
          |         CAST((doc_id + 3*x.i + 5*y.i) % 256 AS BIGINT) AS r,
          |         CAST((2*doc_id + 7*x.i + y.i) % 256 AS BIGINT) AS g,
          |         CAST((3*doc_id + x.i + 11*y.i) % 256 AS BIGINT) AS b
          |  FROM documents, range(16) x(i), range(8) y(i)
          |  WHERE y.i < 4 + (doc_id % 3) * 2),
          |bstat AS (
          |  SELECT doc_id, count(*) AS n,
          |         sum(r) AS sr, sum(r*r) AS srr,
          |         sum(g) AS sg, sum(g*g) AS sgg,
          |         sum(b) AS sb, sum(b*b) AS sbb
          |  FROM bpx GROUP BY doc_id),
          |gpx AS (
          |  SELECT doc_id,
          |         CAST((13*doc_id + 3*x.i + 7*y.i) % 256 AS BIGINT) AS v
          |  FROM documents, range(12) x(i), range(8) y(i)
          |  WHERE y.i < 5 + (doc_id % 4)),
          |gstat AS (
          |  SELECT doc_id, count(*) AS n, sum(v) AS sv, sum(v*v) AS svv
          |  FROM gpx GROUP BY doc_id)
          |SELECT b.doc_id,
          |  'bmp' AS bmp_format,
          |  CAST(16 AS BIGINT) AS bmp_w,
          |  CAST(4 + (b.doc_id % 3) * 2 AS BIGINT) AS bmp_h,
          |  CAST(3 AS BIGINT) AS bmp_ch,
          |  round(sr / CAST(b.n AS DOUBLE), 6) AS bmp_mean_r,
          |  round(sg / CAST(b.n AS DOUBLE), 6) AS bmp_mean_g,
          |  round(sb / CAST(b.n AS DOUBLE), 6) AS bmp_mean_b,
          |  round(sqrt(greatest(srr / CAST(b.n AS DOUBLE)
          |    - (sr / CAST(b.n AS DOUBLE)) * (sr / CAST(b.n AS DOUBLE)), 0)), 6)
          |    AS bmp_std_r,
          |  round(sqrt(greatest(sgg / CAST(b.n AS DOUBLE)
          |    - (sg / CAST(b.n AS DOUBLE)) * (sg / CAST(b.n AS DOUBLE)), 0)), 6)
          |    AS bmp_std_g,
          |  round(sqrt(greatest(sbb / CAST(b.n AS DOUBLE)
          |    - (sb / CAST(b.n AS DOUBLE)) * (sb / CAST(b.n AS DOUBLE)), 0)), 6)
          |    AS bmp_std_b,
          |  'gif' AS gif_format,
          |  CAST(12 AS BIGINT) AS gif_w,
          |  CAST(5 + (b.doc_id % 4) AS BIGINT) AS gif_h,
          |  round(sv / CAST(g.n AS DOUBLE), 6) AS gif_mean,
          |  round(sqrt(greatest(svv / CAST(g.n AS DOUBLE)
          |    - (sv / CAST(g.n AS DOUBLE)) * (sv / CAST(g.n AS DOUBLE)), 0)), 6)
          |    AS gif_std
          |FROM bstat b JOIN gstat g USING (doc_id)
          |ORDER BY doc_id""".stripMargin,
      // ar source: spec-member sizes/digests (gzip member decompressed,
      // nested tar expanded), computed independently — q16's rule
      "q87_ar_source" ->
        """SELECT * FROM (VALUES
          |  ('data.bin.gz', CAST(33 AS BIGINT),
          |   'fecb96dd0fe45acee8a8f44f64e60953138573711cc16ef91fc0b6307579dff4'),
          |  ('inner.tar/docs/a.txt', CAST(10 AS BIGINT),
          |   '753a892fa27fce3ea4683c2a27e1f8b651c9e1352d4b0b14382c812019bc6a2a'),
          |  ('inner.tar/docs/b.txt', CAST(10 AS BIGINT),
          |   '73ecc37823096f6ac0b9cddb338a1bfe9b659e74061635e436c69d882dc144ce'),
          |  ('readme.txt', CAST(17 AS BIGINT),
          |   '9e119fbb07d022af2ab53207a88e17695e9e863e4ff4a464f0eb37fd2f0512f5'),
          |  ('training-shards/shard-000001.txt', CAST(18 AS BIGINT),
          |   '445e3b9daabe086ed18195aebdfa29ebbf819775923cbb6c8dcbb8e0212545e3'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin,
      // Bloom gate: a bitmap bit p is set iff SOME corpus position
      // hashes to p, so "all k probe bits set" == "no probe position
      // missing from the corpus position set" — the oracle states the
      // latter (anti-join on md5-derived positions), exactly the
      // engine's bitmap semantics including the declared FP set
      "q88_bloom_gate" -> {
        val m = 1 << 20
        def p(i: Int, rel: String) =
          s"CAST(md5_number_lower('$i:' || $rel.text) % 4611686018427387904 AS BIGINT) % $m"
        s"""WITH corpus AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
           |inc AS (
           |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
           |  UNION ALL
           |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
           |cpos AS (SELECT DISTINCT unnest([${(0 until 4).map(p(_, "corpus")).mkString(", ")}]) AS p
           |         FROM corpus),
           |ipos AS (SELECT doc_id, unnest([${(0 until 4).map(p(_, "inc")).mkString(", ")}]) AS p
           |         FROM inc)
           |SELECT DISTINCT ipos.doc_id FROM ipos LEFT JOIN cpos ON ipos.p = cpos.p
           |WHERE cpos.p IS NULL
           |ORDER BY ipos.doc_id""".stripMargin
      },
      // cpio source: spec-member sizes/digests (directory record
      // skipped, gzip member decompressed, nested tar expanded),
      // computed independently — q16's rule
      "q89_cpio_source" ->
        """SELECT * FROM (VALUES
          |  ('etc/motd.txt', CAST(17 AS BIGINT),
          |   'ea6c3233b65b3d2f9d9d134908d5f783d5d371e7828517e5cffde90a51a9024a'),
          |  ('inner.tar/docs/a.txt', CAST(10 AS BIGINT),
          |   '753a892fa27fce3ea4683c2a27e1f8b651c9e1352d4b0b14382c812019bc6a2a'),
          |  ('inner.tar/docs/b.txt', CAST(10 AS BIGINT),
          |   '73ecc37823096f6ac0b9cddb338a1bfe9b659e74061635e436c69d882dc144ce'),
          |  ('usr/share/data.bin.gz', CAST(35 AS BIGINT),
          |   '64397d7ab7259e4d29f8e2647c2a5ba6d375ebb3cbdb90febdc158005a20a3e6'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin,
      // rpm source: the framing (lead + two index headers) must be
      // consumed transparently, so the walked members are EXACTLY the
      // q89 cpio fixture's — same independently-derived VALUES
      "q90_rpm_source" ->
        """SELECT * FROM (VALUES
          |  ('etc/motd.txt', CAST(17 AS BIGINT),
          |   'ea6c3233b65b3d2f9d9d134908d5f783d5d371e7828517e5cffde90a51a9024a'),
          |  ('inner.tar/docs/a.txt', CAST(10 AS BIGINT),
          |   '753a892fa27fce3ea4683c2a27e1f8b651c9e1352d4b0b14382c812019bc6a2a'),
          |  ('inner.tar/docs/b.txt', CAST(10 AS BIGINT),
          |   '73ecc37823096f6ac0b9cddb338a1bfe9b659e74061635e436c69d882dc144ce'),
          |  ('usr/share/data.bin.gz', CAST(35 AS BIGINT),
          |   '64397d7ab7259e4d29f8e2647c2a5ba6d375ebb3cbdb90febdc158005a20a3e6'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin,
      // 7z source: spec-member sizes/digests (directory entry skipped,
      // gzip member decompressed, nested tar expanded) computed
      // independently of the engine — q16's rule
      "q91_sevenz_source" ->
        """SELECT * FROM (VALUES
          |  ('data.bin.gz', CAST(33 AS BIGINT),
          |   '784c5de712e270a4187f3cba5b16e445a748b4222b23f4c956d931761fce8c63'),
          |  ('inner.tar/docs/a.txt', CAST(10 AS BIGINT),
          |   '753a892fa27fce3ea4683c2a27e1f8b651c9e1352d4b0b14382c812019bc6a2a'),
          |  ('inner.tar/docs/b.txt', CAST(10 AS BIGINT),
          |   '73ecc37823096f6ac0b9cddb338a1bfe9b659e74061635e436c69d882dc144ce'),
          |  ('notes/readme.txt', CAST(17 AS BIGINT),
          |   '0538a722a4a87b685be24dc429d5f9b4ff171e2c2c75390e77a26a59cf372757'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin,
      // codec matrix: all seven members decode to the identical
      // 21-byte payload — size/sha256 computed independently (q16's
      // rule); only the member paths differ
      "q92_codec_matrix" -> {
        val d = "18ecefc60581a79ed08523df6b91d3d4205bc48c07aed4f6196f7802db13575e"
        val exts = Seq("bz2", "gz", "lz4", "sz", "txt", "xz", "zst")
        val rows = exts.map(e => s"  ('payload.$e', CAST(21 AS BIGINT), '$d')")
          .mkString(",\n")
        s"""SELECT * FROM (VALUES
           |$rows)
           |  AS t(path, size, sha256)
           |ORDER BY path""".stripMargin
      },
      // unicode normalization: the SQL interpolates the SAME Scala
      // prefix vals the engine query uses, so the bytes reaching
      // DuckDB's utf8proc and the engine's java.text.Normalizer are
      // identical; md5 of the normalized strings makes any codepoint
      // divergence a hash mismatch
      "q93_normalize" ->
        s"""SELECT doc_id,
           |  md5(nfc_normalize('$NfcPrefix' || text)) AS nfc_md5,
           |  md5(strip_accents('$StripPrefix' || text)) AS strip_md5
           |FROM documents ORDER BY doc_id""".stripMargin,
      // deb source: member sizes/digests computed independently of the
      // engine (q16's rule) — control/data tar members keep dpkg's
      // ./-anchored names under their tarball member's lineage prefix
      "q94_deb_source" ->
        """SELECT * FROM (VALUES
          |  ('control.tar.gz/./control', CAST(129 AS BIGINT),
          |   'ac4466d20fb96c741f49675d80165b4b2a0b4656c78c2ce3fa631d3a9ce0e1bf'),
          |  ('control.tar.gz/./md5sums', CAST(65 AS BIGINT),
          |   '7a6cdeef27efc6908375ef84b73d73c42e59a59979c638e0f6525f59da4de3fd'),
          |  ('data.tar.xz/./etc/graft.conf', CAST(15 AS BIGINT),
          |   '04e990da6aad57cdd8da0fe4d2863da0d24a4ac282b1397b407c6d689b66806c'),
          |  ('data.tar.xz/./usr/share/doc/graft/readme.txt', CAST(23 AS BIGINT),
          |   'edc5499fe0f0eec5e6d2b2657e6525da9f4e22ec84b01127037d3c93e1739351'),
          |  ('debian-binary', CAST(4 AS BIGINT),
          |   'd526eb4e878a23ef26ae190031b4efd2d58ed66789ac049ea3dbaf74c9df7402'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin,
      // cdc chunks: offsets/sizes/digests derived from an INDEPENDENT
      // implementation of the published FastCDC spec (gear table =
      // splitmix64 finalizer over seed 0x6772616674636463, maskS =
      // 2^(bits+2)-1, maskL = 2^(bits-2)-1, min/avg/max =
      // 2048/8192/65536) run over the same splitmix64 fixture bytes —
      // any drift in the engine's gear table, mask policy, min-skip or
      // boundary-off-by-one breaks sizes, offsets AND digests at once.
      // Rows 20-28 repeat rows 6-14's digests: the planted 96 KiB
      // duplicate region re-chunks identically after one resync chunk.
      // SHARED with q100_cdc_parts: seam invariance means the part-wise
      // chunker must land on EXACTLY these rows.
      "q95_cdc_chunks" -> CdcChunkOracle,
      // cdc over chunked-walk parts: the same fixture arriving as six
      // 50000-byte content_part rows (every seam lands mid-chunk) must
      // reproduce the independent whole-stream rows above — any carry
      // or confirmation defect in the streaming chunker moves a cut
      // and breaks offsets, sizes AND digests at once
      "q100_cdc_parts" -> CdcChunkOracle,
      // url parse: the SAME deterministic URL synthesis on both sides,
      // then DuckDB re-implements the parse grammar as one regex and
      // the eTLD+1 election as a CASE over the multi-label subset of
      // the fixture's own five suffixes, DERIVED from the vendored PSL
      // at oracle-build time (q83's constant-interpolation rule): the
      // fixture hosts are wwwN.srcM.<suffix>, srcM never collides with
      // a PSL rule, so the full PSL algorithm reduces to exactly this
      // CASE on the fixture domain — any drift in the Psl loader or
      // matcher for these rules breaks the interpolated subset
      "q96_url_parse" -> {
        // non-interpolated vals so the regex's $ anchor and \? survive
        val rx = """^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"""
        val suffixes = Seq("com", "org", "co.uk", "com.au", "github.io")
          .filter(s => graft.functions.Psl.publicSuffixLabels(("x." + s).split('.')) > 1)
          .sorted.map(x => s"'$x'").mkString(",")
        s"""WITH u AS (
           |  SELECT doc_id,
           |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
           |    (CASE WHEN doc_id % 5 = 0 THEN 'user:pw@' ELSE '' END) ||
           |    'WWW' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.' ||
           |    (['com','org','co.uk','com.au','github.io'])[CAST(doc_id % 5 AS INT) + 1] ||
           |    (CASE WHEN doc_id % 4 = 0 THEN ':8443' ELSE '' END) ||
           |    '/p/' || CAST(doc_id AS VARCHAR) ||
           |    (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&id=' || CAST(doc_id AS VARCHAR) ELSE '' END) ||
           |    (CASE WHEN doc_id % 6 = 0 THEN '#s2' ELSE '' END) AS url
           |  FROM documents),
           |p AS (
           |  SELECT doc_id,
           |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           |    lower(regexp_extract(url, '$rx', 1)) AS host,
           |    CAST(NULLIF(regexp_extract(url, '$rx', 2), '') AS BIGINT) AS port,
           |    regexp_extract(url, '$rx', 3) AS path,
           |    NULLIF(regexp_extract(url, '$rx', 4), '') AS qstring,
           |    NULLIF(regexp_extract(url, '$rx', 5), '') AS fragment
           |  FROM u)
           |SELECT doc_id, scheme, host, port, path, qstring, fragment,
           |  CASE WHEN regexp_matches(host, '^[0-9.]+${"$"}') THEN host
           |       WHEN len(string_split(host, '.')) <= 2 THEN host
           |       WHEN array_to_string(string_split(host, '.')[-2:], '.') IN ($suffixes)
           |         THEN array_to_string(string_split(host, '.')[-3:], '.')
           |       ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS reg_domain
           |FROM p ORDER BY doc_id""".stripMargin
      },
      // html extract: the SAME page synthesis on both sides, the SAME
      // restricted pattern set (Java-regex/RE2-identical: lazy
      // quantifiers, (?is) inline flags, [^>] classes, explicit
      // [ \t\n\r] whitespace), the SAME entity order (&amp; last)
      "q97_html_extract" ->
        s"""WITH h AS (
           |  SELECT doc_id, $htmlSyn AS html
           |  FROM documents),
           |x AS (
           |  SELECT doc_id, ${tagStrip("html")} AS t
           |  FROM h)
           |SELECT doc_id,
           |  ${entityWs("t")} AS extracted,
           |  CAST(length(${entityWs("t")}) AS BIGINT) AS n_extracted
           |FROM x ORDER BY doc_id""".stripMargin,
      // clean pipeline: the five cleaning stages re-run in SQL — what
      // is checked is the COMPOSITION (html extract -> nfc -> length
      // gate -> exact-dedup winner election -> deterministic sample),
      // each stage reusing its own query's proven oracle form
      "q98_clean_pipeline" ->
        s"""WITH h AS (
           |  SELECT doc_id, $htmlSyn AS html
           |  FROM documents),
           |x AS (SELECT doc_id, ${tagStrip("html")} AS t FROM h),
           |c AS (SELECT doc_id,
           |        nfc_normalize('$NfcPrefix' || ${entityWs("t")}) AS clean FROM x),
           |f AS (SELECT doc_id, clean FROM c WHERE length(clean) >= 120),
           |w AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(clean))
           |SELECT f.doc_id, md5(f.clean) AS clean_md5,
           |  CAST(length(f.clean) AS BIGINT) AS n_clean
           |FROM f JOIN w ON f.doc_id = w.doc_id
           |WHERE ${md5h("'s:' || CAST(f.doc_id AS VARCHAR)")} % 10 < 3
           |ORDER BY f.doc_id""".stripMargin,
      // url normalize: the oracle builds the EXPECTED canonical string
      // directly from the synthesis parameters (doc_id//2 is the
      // logical key; both raw spellings of a pair must collapse onto
      // it) — the punycode host constant comes from the same
      // java.net.IDN.toASCII call the engine makes (q83's
      // constant-interpolation rule), then the same min-id winner
      // election runs on both sides
      "q99_url_normalize" -> {
        val puny = java.net.IDN.toASCII("münchen.de")
        s"""WITH u AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
           |n AS (
           |  SELECT doc_id,
           |    (CASE WHEN k % 5 = 0 THEN 'https' ELSE 'http' END) || '://' ||
           |    (CASE WHEN k % 3 = 0 THEN 'example.com'
           |          WHEN k % 3 = 1 THEN '$puny'
           |          ELSE 'shop.example.co.uk' END) ||
           |    (CASE WHEN k % 4 = 2 THEN ':8080' ELSE '' END) ||
           |    (CASE WHEN k % 7 = 0 THEN '/'
           |          ELSE '/p/' || CAST(k AS VARCHAR) || '/a~b%2Fq' END) ||
           |    (CASE WHEN k % 2 = 0
           |          THEN '?id=' || CAST(k AS VARCHAR) || '&t=c%20d'
           |          ELSE '' END) AS url_norm
           |  FROM u)
           |SELECT min(doc_id) AS doc_id, url_norm, count(*) AS n_variants
           |FROM n GROUP BY url_norm ORDER BY doc_id""".stripMargin
      },
      // sort-query normalize: the expected canonical string is built
      // directly from the synthesis parameters (both raw spellings of
      // a pair must collapse onto it), then the same min-id winner
      // election runs on both sides — q99's pattern
      "q102_url_sortquery" ->
        """WITH u AS (SELECT doc_id, doc_id // 2 AS k FROM documents),
          |n AS (
          |  SELECT doc_id,
          |    'http://h' || CAST(k % 10 AS VARCHAR) || '.example.com/p/' ||
          |    CAST(k AS VARCHAR) || '?a=0&a=1&b=2' AS url_norm
          |  FROM u)
          |SELECT min(doc_id) AS doc_id, url_norm, count(*) AS n_variants
          |FROM n GROUP BY url_norm ORDER BY doc_id""".stripMargin,
      "q82_domain_cap" ->
        s"""SELECT doc_id, source FROM (
           |  SELECT doc_id, source,
           |         row_number() OVER (PARTITION BY source ORDER BY
           |           ${md5h("'42:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
           |  FROM documents)
           |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
      "q83_bm25_score" -> {
        // constants interpolated from the SAME Scala doubles the engine
        // uses (Double.toString round-trips, so both engines compute
        // with bit-identical k1 / b / k1+1)
        val k1 = 1.2; val b = 0.75; val k1p1 = k1 + 1.0
        val tfs = Bm25Terms.zipWithIndex.map { case (t2, i) =>
          s"len(list_filter(w, x -> x = '$t2')) AS tf$i"
        }.mkString(",\n  ")
        val dfs = Bm25Terms.indices.map(i =>
          s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i")
          .mkString(",\n  ")
        val contribs = Bm25Terms.indices.map(i =>
          s"""ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5))
             |      * (CAST(tf$i AS DOUBLE) * $k1p1)
             |      / (CAST(tf$i AS DOUBLE) + $k1 * (1.0 - $b + $b * CAST(dl AS DOUBLE) / avgdl))"""
            .stripMargin)
          .mkString("0.0\n      + ", "\n      + ", "")
        s"""WITH tok AS (SELECT doc_id, $toks AS w FROM documents),
           |base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
           |  $tfs
           |  FROM tok),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
           |  $dfs
           |  FROM base)
           |SELECT doc_id, dl,
           |  round($contribs, 6) AS bm25
           |FROM base, st ORDER BY doc_id""".stripMargin
      },
      "q84_gopher_filter" -> {
        // stopword list interpolated from the engine's own constant
        val stops = graft.functions.TextStats.Stopwords
          .map(s2 => s"'$s2'").mkString("[", ", ", "]")
        s"""WITH w AS (SELECT doc_id, text,
           |    list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS t
           |  FROM documents),
           |m AS (SELECT doc_id,
           |    CAST(len(t) AS BIGINT) AS words,
           |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) AS alnum,
           |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) AS alpha,
           |    len(list_intersect(list_distinct(t), $stops)) AS dstops,
           |    (length(text) - length(replace(text, '#', '')))
           |      + (length(text) - length(replace(text, '...', ''))) / 3 AS sym,
           |    CAST(len(list_distinct(t)) AS DOUBLE) AS dwords
           |  FROM w),
           |r AS (SELECT doc_id, words,
           |    (words >= 50 AND words <= 100000) AS r_words,
           |    (words > 0 AND alnum / CAST(words AS DOUBLE) >= 3.0
           |       AND alnum / CAST(words AS DOUBLE) <= 10.0) AS r_mean_len,
           |    (words > 0 AND alpha / CAST(words AS DOUBLE) >= 0.8) AS r_alpha,
           |    (dstops >= 2) AS r_stop,
           |    (words > 0 AND CAST(sym AS DOUBLE) / CAST(words AS DOUBLE) <= 0.1) AS r_symbol,
           |    (words > 0 AND 1.0 - dwords / CAST(words AS DOUBLE) <= 0.3) AS r_dup
           |  FROM m)
           |SELECT doc_id, words, r_words, r_mean_len, r_alpha, r_stop, r_symbol, r_dup,
           |  (r_words AND r_mean_len AND r_alpha AND r_stop AND r_symbol AND r_dup) AS keep
           |FROM r ORDER BY doc_id""".stripMargin
      },
      "q85_top_ngrams" ->
        """WITH w AS (SELECT list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
          |                  x -> x <> '') AS t FROM documents),
          |g AS (SELECT unnest(list_transform(range(1, len(t) - 1),
          |               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS gram
          |      FROM w WHERE len(t) >= 3)
          |SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g
          |GROUP BY gram ORDER BY n DESC, gram LIMIT 20""".stripMargin,
      // char_entropy parity: string_split(text,'') yields code points;
      // list(n ORDER BY ch) pins the fold to UTF-8 binary order (=
      // codepoint order, the engine's TreeMap iteration); list_sum is
      // a sequential left fold (q51's rule) seeded here with `0.0 +`
      // so a single-symbol doc's -0.0 term normalizes to +0.0 exactly
      // as the engine's 0.0-seeded accumulator does
      "q86_char_entropy" ->
        """WITH hist AS (
          |  SELECT doc_id, ch, count(*)::DOUBLE AS n
          |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
          |        FROM documents) c
          |  GROUP BY 1, 2),
          |agg AS (
          |  SELECT doc_id, list(n ORDER BY ch) AS ns, sum(n) AS total
          |  FROM hist GROUP BY 1)
          |SELECT d.doc_id,
          |       round(0.0 + coalesce(list_sum(
          |         list_transform(a.ns, x -> -(x / a.total) * ln(x / a.total))),
          |         0.0), 6) AS entropy
          |FROM documents d LEFT JOIN agg a USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin,
      "q23_ann_lsh" ->
        s"""WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
           |c AS (SELECT vec_id,
           |        list_sum(v) / (sqrt(64.0) * sqrt(list_sum([x * x for x in v]))) AS cos,
           |        $q23CodeExpr AS code
           |      FROM e)
           |SELECT vec_id, round(cos, 6) AS cos FROM c
           |WHERE bit_count(xor(CAST(code AS BIGINT), CAST($q23QCode AS BIGINT))) <= 2
           |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
      "q24_lang_id" ->
        s"""WITH w AS (SELECT doc_id, $toks AS t FROM documents),
           |l AS (SELECT * FROM (VALUES
           |  ('de', ['der','die','das','und','ist','mit','nicht']),
           |  ('en', ['the','and','of','to','is','with','that']),
           |  ('es', ['el','la','los','que','es','con','para']),
           |  ('fr', ['le','les','des','est','avec','pour','dans']),
           |  ('zh', ['de','shi','le','zai','you','wo','ta'])) AS t(lang, m)),
           |s AS (SELECT w.doc_id, l.lang,
           |        len(list_filter(w.t, x -> list_contains(l.m, x))) AS hits
           |      FROM w CROSS JOIN l),
           |g AS (SELECT doc_id, lang AS guess FROM s
           |      QUALIFY row_number() OVER (PARTITION BY doc_id
           |                                 ORDER BY hits DESC, lang) = 1)
           |SELECT guess, CAST(COUNT(*) AS BIGINT) AS n FROM g
           |GROUP BY guess ORDER BY guess""".stripMargin,
      // corpus is ASCII (byte == char), so the byte-level stub codec is
      // reproducible from the text column
      "q26_multimodal" ->
        """WITH m AS (SELECT doc_id,
          |    CASE WHEN substr(text, 1, 4) = 'GIF8' AND length(text) >= 6 THEN 'gif'
          |         WHEN substr(text, 1, 2) = 'BM' AND length(text) >= 14 THEN 'bmp'
          |         WHEN substr(text, 1, 4) = 'RIFF' THEN 'wav' ELSE 'raw' END AS format,
          |    16 + CAST(list_sum(list_transform(range(1, least(length(text), 16) + 1),
          |                       i -> unicode(substr(text, CAST(i AS INT), 1)))) % 241 AS INT) AS width,
          |    list_transform(range(1, length(text) + 1, 3),
          |                   i -> unicode(substr(text, CAST(i AS INT), 1))) AS c0
          |  FROM documents),
          |r AS (SELECT format, width,
          |        CAST(list_sum(c0) AS DOUBLE) / len(c0) AS c0m FROM m)
          |SELECT format, CAST(COUNT(*) AS BIGINT) AS n,
          |  round(CAST(SUM(CAST(round(c0m, 6) AS DECIMAL(18,6))) AS DOUBLE)
          |        / COUNT(*), 6) AS avg_c0,
          |  round(CAST(SUM(width) AS DOUBLE) / COUNT(*), 6) AS avg_width
          |FROM r GROUP BY format ORDER BY format""".stripMargin,
      "q28_asof_join" ->
        """WITH p AS (SELECT user_id, ts, max(value) AS pv FROM events
          |           WHERE event_type = 'purchase' GROUP BY user_id, ts)
          |SELECT c.event_id, c.user_id, c.ts, p.ts AS pts, p.pv
          |FROM (SELECT event_id, user_id, ts FROM events
          |      WHERE event_type = 'click') c
          |ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
          |ORDER BY c.event_id""".stripMargin,
      "q29_session_window" -> sessionOracle,
      "q30_cube" ->
        """SELECT c_mktsegment, o_orderpriority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY CUBE(c_mktsegment, o_orderpriority)
          |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
      "q31_embedding_neardup_lsh" ->
        s"""WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_sum([x * x for x in v])) AS nrm,
           |        ${q31CodeExprs.mkString(",\n        ")}
           |      FROM e),
           |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |        round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
           |              / (a.nrm * b.nrm), 6) AS cos
           |      FROM n a JOIN n b ON a.vec_id < b.vec_id AND (
           |        a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3 OR
           |        a.c4 = b.c4 OR a.c5 = b.c5 OR a.c6 = b.c6 OR a.c7 = b.c7))
           |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.45
           |ORDER BY id_a, id_b""".stripMargin,
      "q32_range_join" ->
        """SELECT c.event_id AS click_id, p.event_id AS purchase_id
          |FROM events c JOIN events p
          |  ON c.user_id = p.user_id
          | AND c.event_type = 'click' AND p.event_type = 'purchase'
          | AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
          |ORDER BY click_id, purchase_id""".stripMargin,
      // transitive closure by recursive CTE = the DataFrame label loop
      "q33_components" ->
        s"""WITH RECURSIVE
           |w AS (SELECT doc_id, $toks AS t FROM documents),
           |sh AS (SELECT doc_id,
           |         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |                        for i in range(1, len(t) - 1)]) AS s
           |       FROM w),
           |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
           |         CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS j
           |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
           |p AS (SELECT id_a, id_b FROM pr WHERE round(j, 6) >= 0.8),
           |e AS (SELECT id_a AS src, id_b AS dst FROM p
           |      UNION SELECT id_b, id_a FROM p),
           |reach(id, r) AS (
           |  SELECT src, src FROM e
           |  UNION
           |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst)
           |SELECT id, MIN(r) AS cluster FROM reach GROUP BY id
           |ORDER BY id""".stripMargin,
      // q33's transitive closure + a loser anti-join: survivors are
      // ids that are their own component minimum (or in no pair)
      "q75_neardup_winners" ->
        s"""WITH RECURSIVE
           |w AS (SELECT doc_id, $toks AS t FROM documents),
           |sh AS (SELECT doc_id,
           |         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |                        for i in range(1, len(t) - 1)]) AS s
           |       FROM w),
           |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
           |         CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS j
           |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
           |p AS (SELECT id_a, id_b FROM pr WHERE round(j, 6) >= 0.8),
           |e AS (SELECT id_a AS src, id_b AS dst FROM p
           |      UNION SELECT id_b, id_a FROM p),
           |reach(id, r) AS (
           |  SELECT src, src FROM e
           |  UNION
           |  SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
           |losers AS (SELECT id FROM reach GROUP BY id HAVING MIN(r) < id)
           |SELECT doc_id FROM documents
           |WHERE doc_id NOT IN (SELECT id FROM losers)
           |ORDER BY doc_id""".stripMargin,
      // same md5-keyed permutation: both engines hash the identical
      // "seed:id" string and agree on the hex digest ordering
      "q76_epoch_shuffle" ->
        """SELECT CAST(row_number() OVER (
          |         ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id)
          |       AS INTEGER) AS pos, doc_id
          |FROM documents ORDER BY pos""".stripMargin,
      // SemDeDup: q37's assignment CTE -> within-cell q25 pair
      // arithmetic -> q75's closure + loser anti-join
      "q77_semdedup" ->
        """WITH RECURSIVE cmeta AS (
          |  SELECT vec_id AS cent_id, embedding AS cvec,
          |    sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding])) AS cnorm
          |  FROM embeddings ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT e.vec_id, e.embedding, c.cent_id,
          |    list_sum(list_transform(generate_series(1, 64),
          |             i -> e.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE))
          |      / (sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in e.embedding])) * c.cnorm)
          |      AS cos_c
          |  FROM embeddings e CROSS JOIN cmeta c
          |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
          |                             ORDER BY cos_c DESC, c.cent_id) = 1),
          |nn AS (SELECT vec_id, cent_id, [x::DOUBLE for x in embedding] AS v,
          |         sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding])) AS nrm
          |       FROM assigned),
          |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          |      FROM nn a JOIN nn b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
          |      WHERE round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
          |                  / (a.nrm * b.nrm), 6) >= 0.45),
          |e2 AS (SELECT id_a AS src, id_b AS dst FROM p
          |       UNION SELECT id_b, id_a FROM p),
          |reach(id, r) AS (
          |  SELECT src, src FROM e2
          |  UNION
          |  SELECT e2.src, reach.r FROM e2 JOIN reach ON reach.id = e2.dst),
          |losers AS (SELECT id FROM reach GROUP BY id HAVING MIN(r) < id)
          |SELECT a.vec_id, a.cent_id AS cell FROM assigned a
          |WHERE a.vec_id NOT IN (SELECT id FROM losers)
          |ORDER BY a.vec_id""".stripMargin,
      // LM perplexity filter: per-lang bigram counts off the src0
      // slice, add-one smoothing, -avg ln rounded 6dp (ln ulp rule)
      "q78_lm_score" ->
        """WITH ws AS (
          |  SELECT doc_id, lang, source,
          |         list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
          |                     x -> x <> '') AS w
          |  FROM documents
          |), pairs AS (
          |  SELECT doc_id, lang, source, p.w1 AS w1, p.w2 AS w2
          |  FROM (SELECT doc_id, lang, source,
          |          unnest(list_transform(range(1, len(w)),
          |                 i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS p
          |        FROM ws)
          |), cu AS (
          |  SELECT lang, tok, count(*) AS c
          |  FROM (SELECT lang, unnest(w) AS tok FROM ws WHERE source = 'src0')
          |  GROUP BY 1, 2
          |), v AS (
          |  SELECT lang, count(*) AS v FROM cu GROUP BY 1
          |), cb AS (
          |  SELECT lang, w1, w2, count(*) AS c
          |  FROM pairs WHERE source = 'src0' GROUP BY 1, 2, 3
          |), m AS (
          |  SELECT p.doc_id, p.lang, count(*) AS bigrams,
          |         round(-avg(ln((coalesce(cb.c, 0) + 1.0)
          |                       / (coalesce(cu.c, 0) + v.v))), 6) AS lm_ce
          |  FROM pairs p
          |  LEFT JOIN cb ON cb.lang = p.lang AND cb.w1 = p.w1 AND cb.w2 = p.w2
          |  LEFT JOIN cu ON cu.lang = p.lang AND cu.tok = p.w1
          |  JOIN v ON v.lang = p.lang
          |  GROUP BY 1, 2
          |)
          |SELECT d.doc_id, d.lang, coalesce(m.bigrams, 0) AS bigrams, m.lm_ce
          |FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id AND m.lang = d.lang
          |ORDER BY d.doc_id""".stripMargin,
      // DSIR: hashed-gram bucket counts (shared md5lo62 % 2^62 % B
      // recipe), add-one log-ratio weights, md5-Gumbel top-k
      "q79_dsir_select" ->
        """WITH tok AS (
          |  SELECT doc_id, source,
          |         list_filter(string_split_regex(
          |             lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ')), ' '),
          |           x -> x <> '') AS w
          |  FROM documents
          |), grams AS (
          |  SELECT doc_id, source, unnest(w) AS g FROM tok
          |  UNION ALL
          |  SELECT doc_id, source,
          |         unnest(list_transform(range(1, len(w)),
          |                i -> w[i] || ' ' || w[i + 1])) AS g
          |  FROM tok
          |), b AS (
          |  SELECT doc_id, source,
          |         CAST((md5_number_lower(g) % 4611686018427387904) % 1024
          |              AS BIGINT) AS bk
          |  FROM grams
          |), tc AS (SELECT bk, count(*) AS c FROM b WHERE source = 'src0' GROUP BY 1),
          |tt AS (SELECT sum(c)::DOUBLE AS t FROM tc),
          |dc AS (SELECT doc_id, bk, count(*) AS c FROM b GROUP BY 1, 2),
          |rc AS (SELECT bk, sum(c) AS c FROM dc GROUP BY 1),
          |rt AS (SELECT sum(c)::DOUBLE AS t FROM rc),
          |lw AS (SELECT rc.bk,
          |         ln((coalesce(tc.c, 0) + 1.0) / (tt.t + 1024))
          |           - ln((rc.c + 1.0) / (rt.t + 1024)) AS w
          |       FROM rc LEFT JOIN tc USING (bk), tt, rt),
          |sc AS (SELECT dc.doc_id, sum(dc.c * lw.w) AS logw
          |       FROM dc JOIN lw USING (bk) GROUP BY 1),
          |sel AS (
          |  SELECT doc_id, logw,
          |    logw - ln(-ln(((md5_number_lower('7:' || CAST(doc_id AS VARCHAR))
          |                    % 4611686018427387904) + 1) / 4611686018427387905))
          |      AS key
          |  FROM sc
          |  ORDER BY key DESC, doc_id LIMIT 200)
          |SELECT doc_id, round(logw, 6) AS log_weight FROM sel
          |ORDER BY doc_id""".stripMargin,
      "q34_salted_agg" ->
        """SELECT event_type, COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      "q35_window_frames" ->
        """SELECT o_custkey, o_orderkey, o_orderdate,
          |  LAG(o_totalprice) OVER w1 AS prev_price,
          |  LEAD(o_orderdate) OVER w1 AS next_date,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          |    PARTITION BY o_custkey ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
          |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
          |    AS trailing_30d
          |FROM orders
          |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
      "q36_topk_agg" ->
        """WITH q AS (SELECT lang, doc_id,
          |    CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS DOUBLE) AS score
          |  FROM documents)
          |SELECT lang,
          |  CAST(row_number() OVER (PARTITION BY lang
          |                          ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |  doc_id, score
          |FROM q QUALIFY rank <= 3
          |ORDER BY lang, rank""".stripMargin,
      // IVF: codebook = the 16 smallest-id vectors; assignment and probe
      // recomputed with the same sequential-fold arithmetic as the engine
      "q37_ann_ivf" ->
        """WITH cmeta AS (
          |  SELECT vec_id AS cent_id, embedding AS cvec,
          |    sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding])) AS cnorm
          |  FROM embeddings ORDER BY vec_id LIMIT 16),
          |assigned AS (
          |  SELECT e.vec_id, e.embedding, c.cent_id,
          |    list_sum(list_transform(generate_series(1, 64),
          |             i -> e.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE))
          |      / (sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in e.embedding])) * c.cnorm)
          |      AS cos_c
          |  FROM embeddings e CROSS JOIN cmeta c
          |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
          |                             ORDER BY cos_c DESC, c.cent_id) = 1),
          |probed AS (
          |  SELECT cent_id FROM cmeta
          |  ORDER BY (list_sum([x::DOUBLE for x in cvec]) / (sqrt(64.0) * cnorm)) DESC,
          |           cent_id
          |  LIMIT 4)
          |SELECT a.vec_id,
          |  round(list_sum([x::DOUBLE for x in a.embedding]) /
          |        (sqrt(64.0) * sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in a.embedding]))), 6)
          |    AS cos
          |FROM assigned a JOIN probed p USING (cent_id)
          |ORDER BY cos DESC, a.vec_id LIMIT 10""".stripMargin,
      "q38_streaming_dedup" ->
        """SELECT DISTINCT md5(text) AS h FROM documents ORDER BY h""".stripMargin,
      "q39_stateful_sessions" -> sessionOracle,
      "q40_percentile" ->
        """SELECT event_type,
          |  round(quantile_cont(value, 0.5), 6) AS p50,
          |  round(quantile_cont(value, 0.9), 6) AS p90,
          |  round(quantile_cont(value, 0.99), 6) AS p99
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      // bucketed storage changes the physical layout, never the result
      "q41_bucketed_join" ->
        """SELECT c_mktsegment,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  COUNT(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q42_explode_sql" -> fixtureOracle,
      "q73_dsv2_source" -> fixtureOracle,
      "q74_chunked_walk" -> {
        // per-chunk VALUES from the same spec member definitions:
        // 300-byte slices, independently digested (q16 rule)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val rows = FixtureLeaves.sortBy(_._1).flatMap { case (p, bytes) =>
          bytes.grouped(300).zipWithIndex.map { case (c, i) =>
            val hex = md.digest(c).map("%02x".format(_)).mkString
            s"('$p', CAST($i AS BIGINT), CAST(${c.length} AS BIGINT), '$hex')"
          }
        }
        s"""SELECT * FROM (VALUES
           |  ${rows.mkString(",\n  ")})
           |  AS t(path, content_part, size, sha256)
           |ORDER BY path, content_part""".stripMargin
      },
      // each event belongs to the two 2h-wide windows whose starts are
      // trunc(ts)-1h and trunc(ts)
      "q43_sliding_window" ->
        """WITH w AS (
          |  SELECT CAST(date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS TIMESTAMP) AS ws,
          |         event_type, value
          |  FROM events CROSS JOIN (VALUES (0), (1)) t(o))
          |SELECT ws, CAST(ws + INTERVAL 2 HOUR AS TIMESTAMP) AS we, event_type,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
          |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
      // the oracle is ALL-pairs Jaccard — it checks the engine's
      // prefix-filter candidate generation for completeness, not just
      // the similarity arithmetic
      "q44_jaccard_neardup" ->
        s"""WITH w AS (SELECT doc_id, $toks AS t FROM documents),
           |s AS (SELECT doc_id,
           |        list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |                       for i in range(1, len(t) - 1)]) AS sh
           |      FROM w),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           |          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)
           |      AS jaccard
           |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.7
           |ORDER BY id_a, id_b""".stripMargin,
      "q45_pivot" ->
        """SELECT o_orderstatus,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS "1-URGENT",
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FILTER (WHERE o_orderpriority = '2-HIGH') AS DOUBLE) AS "2-HIGH",
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FILTER (WHERE o_orderpriority = '3-MEDIUM') AS DOUBLE) AS "3-MEDIUM",
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE) AS "4-NOT SPECIFIED",
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE) AS "5-LOW"
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      // inner stream-stream join output == the batch join
      "q46_stream_stream_join" ->
        """SELECT v.user_id AS user_id, v.event_id AS view_id,
          |  p.event_id AS purchase_id
          |FROM events v JOIN events p ON v.user_id = p.user_id
          | AND v.event_type = 'view' AND p.event_type = 'purchase'
          | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
          |ORDER BY user_id, view_id, purchase_id""".stripMargin,
      // the oracle pins exact values; the sketch columns assert the
      // error envelope (deterministic for a fixed dataset)
      "q47_approx_sketches" ->
        """SELECT l_returnflag,
          |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
          |  TRUE AS hll_within_15pct,
          |  TRUE AS p50_within_5pct
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q48_outer_join" ->
        """WITH a AS (SELECT o_custkey, COUNT(*) AS n_orders,
          |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          |  FROM orders GROUP BY o_custkey),
          |b AS (SELECT c_custkey, c_name FROM customer
          |  WHERE c_mktsegment = 'BUILDING')
          |SELECT coalesce(o_custkey, c_custkey) AS custkey, c_name,
          |  coalesce(n_orders, 0) AS n_orders,
          |  coalesce(spend, 0.0) AS spend
          |FROM a FULL OUTER JOIN b ON o_custkey = c_custkey
          |ORDER BY custkey""".stripMargin,
      "q49_setops_all" ->
        """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_quantity < 10),
          |b AS (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05),
          |ia AS (SELECT 'intersect_all' AS op, l_orderkey, COUNT(*) AS copies
          |  FROM (SELECT l_orderkey FROM a INTERSECT ALL SELECT l_orderkey FROM b)
          |  GROUP BY l_orderkey),
          |ea AS (SELECT 'except_all' AS op, l_orderkey, COUNT(*) AS copies
          |  FROM (SELECT l_orderkey FROM a EXCEPT ALL SELECT l_orderkey FROM b)
          |  GROUP BY l_orderkey)
          |SELECT op, l_orderkey, copies FROM ia
          |UNION ALL SELECT op, l_orderkey, copies FROM ea
          |ORDER BY op, l_orderkey""".stripMargin,
      // recompute every sampled frame with substring arithmetic:
      // start_i = i*(L-256)/3 (integer), frame = bytes[start, start+256)
      "q50_frame_sample" ->
        """WITH f AS (SELECT doc_id, length(text) AS L, text,
          |    unnest(range(0, 4)) AS i FROM documents),
          |s AS (SELECT doc_id, i AS frame_idx,
          |    CAST((i * greatest(L - 256, 0)) // 3 AS INT) AS st, L, text FROM f)
          |SELECT doc_id, frame_idx,
          |  CAST(least(256, L - st) AS BIGINT) AS flen,
          |  md5(substring(text, st + 1, 256)) AS fhash
          |FROM s ORDER BY doc_id, frame_idx""".stripMargin,
      // DuckDB list comprehensions/list_sum evaluate in element order —
      // the same sequential fold as Spark's aggregate()
      "q51_array_hof" ->
        """WITH w AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS e
          |  FROM embeddings)
          |SELECT vec_id,
          |  CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
          |  round(list_sum([x * x for x in e]), 6) AS sum_sq,
          |  round(list_max(e), 6) AS max_e,
          |  round(list_sum([e[i] * e[len(e) + 1 - i]
          |                  for i in range(1, len(e) + 1)]), 6) AS rev_dot
          |FROM w ORDER BY vec_id""".stripMargin,
      "q52_bpe_tokens" ->
        """WITH q AS (SELECT lang,
          |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]+')) AS BIGINT) AS bpe,
          |    CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS ws
          |  FROM documents)
          |SELECT lang, COUNT(*) AS n_docs,
          |  CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
          |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
          |  round(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 6) AS fertility
          |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
      // executed VERBATIM by both engines — the SQL dialect surface
      "q53_sql_tpch_q3" -> q53Sql,
      "q54_subqueries" -> q54Sql,
      "q55_dist_windows" -> q55Sql,
      "q56_grouping_sets" -> q56Sql,
      // ALL-pairs train x ref contamination — checks LSH recall
      "q57_decontaminate" ->
        s"""WITH w AS (SELECT doc_id, source, $toks AS t FROM documents),
           |sh AS (SELECT doc_id, source,
           |         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
           |                        for i in range(1, len(t) - 1)]) AS sh
           |       FROM w),
           |tr AS (SELECT doc_id, sh FROM sh WHERE source NOT IN ('src0','src1')),
           |rf AS (SELECT doc_id, sh FROM sh WHERE source IN ('src0','src1')),
           |bad AS (SELECT DISTINCT tr.doc_id FROM tr JOIN rf ON
           |    CAST(len(list_intersect(tr.sh, rf.sh)) AS DOUBLE) /
           |    CAST(len(list_distinct(list_concat(tr.sh, rf.sh))) AS DOUBLE) >= 0.8)
           |SELECT doc_id, lang, source FROM documents
           |WHERE source NOT IN ('src0','src1')
           |  AND doc_id NOT IN (SELECT doc_id FROM bad)
           |ORDER BY doc_id""".stripMargin,
      // spec-determined VALUES: the survivors are declared by the
      // fixture member names; sizes and sha256 digests are computed
      // from the member definitions with MessageDigest, independent of
      // the walk/filter path under test
      "q58_text_filter" -> {
        val rows = Q58Members.filter(_._1.startsWith("keep_")).map { case (name, bytes) =>
          val hex = java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).map(b => f"$b%02x").mkString
          s"  ('$name', CAST(${bytes.length} AS BIGINT), '$hex')"
        }
        s"SELECT * FROM (VALUES\n${rows.mkString(",\n")})\n" +
          "  AS t(path, size, sha256)\nORDER BY path"
      },
      // hand-derived from the reference spec (min-run emit, short-run
      // carry "abcdefghi"+"jk", EOF flush "no"+"final trailing run!")
      "q59_extract_strings" ->
        """SELECT * FROM (VALUES
          |  (CAST(0 AS BIGINT), 'ABCDEFGHIJ'),
          |  (CAST(1 AS BIGINT), 'abcdefghijk'),
          |  (CAST(2 AS BIGINT), 'nofinal trailing run!'))
          |  AS t(idx, s)
          |ORDER BY idx""".stripMargin,
      // same [ \t\n\r\f]+ whitespace class as the engine (q36/q52
      // convention); range(1, len) is half-open, lists are 1-based
      "q60_repetition" ->
        """WITH ws AS (
          |  SELECT doc_id,
          |         list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
          |                     x -> x <> '') AS w
          |  FROM documents
          |), wc AS (
          |  SELECT doc_id, tok, count(*) AS c
          |  FROM (SELECT doc_id, unnest(w) AS tok FROM ws) GROUP BY 1, 2
          |), wm AS (
          |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS words,
          |         CAST(count(*) AS BIGINT) AS distinct_words,
          |         max(c) AS top_w
          |  FROM wc GROUP BY 1
          |), bc AS (
          |  SELECT doc_id, tok, count(*) AS c
          |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
          |                i -> w[i] || ' ' || w[i + 1])) AS tok
          |        FROM ws) GROUP BY 1, 2
          |), bm AS (
          |  SELECT doc_id, sum(c) AS bigrams, max(c) AS top_b FROM bc GROUP BY 1
          |)
          |SELECT d.doc_id, wm.words, wm.distinct_words,
          |  round(1.0 - wm.distinct_words::DOUBLE / nullif(wm.words, 0), 6)
          |    AS dup_word_frac,
          |  round(wm.top_w::DOUBLE / nullif(wm.words, 0), 6) AS top_word_frac,
          |  round(bm.top_b::DOUBLE / nullif(bm.bigrams, 0), 6) AS top_bigram_frac
          |FROM documents d LEFT JOIN wm USING (doc_id) LEFT JOIN bm USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin,
      "q61_stratified_sample" ->
        """SELECT doc_id, lang, source FROM documents
          |WHERE doc_id % 100 < CASE lang
          |  WHEN 'en' THEN 50 WHEN 'zh' THEN 25 ELSE 10 END
          |ORDER BY doc_id""".stripMargin,
      // the SAME RE2-safe pattern constants the engine uses (referenced,
      // not retyped, so they cannot drift); DuckDB needs the explicit
      // 'g' flag for replace-all, which is Spark's only behavior
      "q62_pii_scrub" -> {
        val values = Q62Texts
          .map { case (id, s) => s"  (CAST($id AS BIGINT), '${s.replace("'", "''")}')" }
          .mkString(",\n")
        s"""SELECT id, regexp_replace(regexp_replace(regexp_replace(text,
           |    '${TextStats.EmailPattern}', '<EMAIL>', 'g'),
           |    '${TextStats.Ipv4Pattern}', '<IP>', 'g'),
           |    '${TextStats.PhonePattern}', '<PHONE>', 'g') AS scrubbed
           |FROM (VALUES
           |$values)
           |  AS t(id, text)
           |ORDER BY id""".stripMargin
      },
      "q63_recursive_cte" -> q63Sql,
      // the oracle states the SEMANTICS (global exclusive prefix sum)
      // in its naive single-stream form; the engine computes the same
      // values with the two-phase distributed prefix sum
      "q64_seq_packing" ->
        """SELECT doc_id,
          |  CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS start_off,
          |  CAST(floor(coalesce(sum(n_chars) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0)
          |    AS BIGINT) AS seq_id
          |FROM documents
          |ORDER BY doc_id""".stripMargin,
      // relational statement of the map round-trip: same tokenizer as
      // the engine (strip non-alnum, lowercase, split), HAVING >= 5
      "q65_map_hof" ->
        """SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
          |FROM (
          |  SELECT doc_id,
          |         unnest(list_filter(
          |           string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
          |           x -> x <> '')) AS tok
          |  FROM documents)
          |GROUP BY doc_id, tok
          |HAVING count(*) >= 5
          |ORDER BY doc_id, tok""".stripMargin,
      "q66_unpivot" ->
        """SELECT l_returnflag, m.measure, m.value FROM (
          |  SELECT l_returnflag,
          |    CAST(sum(l_quantity) AS DOUBLE) AS qty,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
          |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc
          |  FROM lineitem GROUP BY l_returnflag) w,
          |  LATERAL (VALUES ('qty', w.qty), ('price', w.price), ('disc', w.disc))
          |    AS m(measure, value)
          |ORDER BY l_returnflag, m.measure""".stripMargin,
      "q67_lateral_topn" -> q67Sql,
      // exact distincts + the envelope stated as a constant: DuckDB
      // cannot read datasketches binaries, but the CLAIM under test —
      // per-group and MERGED estimates land within the envelope — is a
      // boolean both engines can state (q47 rule)
      "q68_hll_sketches" ->
        """SELECT status, exact_d, TRUE AS within_5pct FROM (
          |  SELECT o_orderstatus AS status,
          |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_d
          |  FROM orders GROUP BY o_orderstatus
          |  UNION ALL
          |  SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT)
          |  FROM orders)
          |ORDER BY status""".stripMargin,
      // same injected boilerplate, relational restatement: positional
      // explode, document-frequency HAVING over non-blank lines,
      // NOT IN anti-join, ordered string_agg reassembly; blank-line
      // immunity via trim() (space-trim in both dialects)
      "q69_line_dedup" ->
        """WITH d2 AS (
          |  SELECT doc_id, 'NAV MENU' || chr(10) || text || chr(10) ||
          |         'COPYRIGHT 2024 EXAMPLE CORP' AS text2
          |  FROM documents
          |), ls AS (
          |  SELECT doc_id, unnest(parts) AS line,
          |         generate_subscripts(parts, 1) AS pos
          |  FROM (SELECT doc_id, string_split(text2, chr(10)) AS parts FROM d2)
          |), bl AS (
          |  SELECT line FROM (
          |    SELECT DISTINCT doc_id, line FROM ls WHERE trim(line) <> '')
          |  GROUP BY line HAVING count(*) >= 10
          |)
          |SELECT d2.doc_id, coalesce(r.text2, '') AS text2
          |FROM d2 LEFT JOIN (
          |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text2
          |  FROM ls WHERE line NOT IN (SELECT line FROM bl)
          |  GROUP BY doc_id) r USING (doc_id)
          |ORDER BY d2.doc_id""".stripMargin,
      // same floor + id-keyed fractional remainder; unnest(range(...))
      // replicates per-row (range(1,1) is empty, so 0-copy rows vanish
      // like the engine's where > 0); e cast to DOUBLE so both engines
      // do the same floating arithmetic before round()
      "q70_upsample" ->
        """SELECT doc_id, lang, unnest(range(1, copies + 1)) AS epoch
          |FROM (
          |  SELECT doc_id, lang,
          |    CAST(floor(e) AS BIGINT) +
          |    CASE WHEN doc_id % 100 < round((e - floor(e)) * 100)
          |         THEN 1 ELSE 0 END AS copies
          |  FROM (SELECT doc_id, lang,
          |    CAST(CASE lang WHEN 'en' THEN 2.3 WHEN 'zh' THEN 0.5
          |         ELSE 1.0 END AS DOUBLE) AS e
          |    FROM documents))
          |ORDER BY doc_id, epoch""".stripMargin,
      // zipped unnest(range) gives (win_id, dynamic substring) pairs;
      // substring is 1-based char-counted in both dialects
      "q71_chunk_windows" ->
        """SELECT doc_id, unnest(range(0, n)) AS win_id,
          |  substring(text, CAST(unnest(range(0, n)) * 150 + 1 AS INT), 200)
          |    AS chunk
          |FROM (SELECT doc_id, text,
          |  CASE WHEN length(text) <= 200 THEN 1
          |       ELSE CAST(ceil((length(text) - 200) / 150.0) AS BIGINT) + 1
          |  END AS n
          |  FROM documents)
          |ORDER BY doc_id, win_id""".stripMargin,
      // the q16 VALUES rows inside the declared half-open range
      "q72_size_filter" ->
        """SELECT * FROM (VALUES
          |  ('e.txt.zst', CAST(390 AS BIGINT),
          |   'be9a5820be89dcdce4b8df97c01cdf2e98ebc407e957ae930a0396a8122ab2cb'),
          |  ('f.txt.xz', CAST(370 AS BIGINT),
          |   '14df686258199a2d006cb28a8c51120f12385acd67cc2ef99fb0412be003bc6e'),
          |  ('g.txt.bz2', CAST(400 AS BIGINT),
          |   'f2ab80f749efe643b97fe67f91432f8bf7938d4942ed1880fc91e411a2423789'),
          |  ('inner2.tar.zst/h.txt', CAST(170 AS BIGINT),
          |   '4fd9024cec0e7478e760c58707179f0e6f5680ab92f89cc4d76d730209dd7e1e'))
          |  AS t(path, size, sha256)
          |ORDER BY path""".stripMargin)
  }
}

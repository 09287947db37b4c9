package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The registered SQL surface: every custom expression must be usable
  * from `spark.sql`, including the `explode_archive` Generator via
  * LATERAL VIEW (SURVEY §2.2 W1 — the SQL face of the walker).
  */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("SqlSurfaceSpec")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("scalar functions evaluate from SQL") {
    import spark.implicits._
    Seq(("ok text", Fixtures.fakeElf(Seq("embedded_string_one"))))
      .toDF("txt", "exe").createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT is_utf8(cast(txt AS binary)) AS u,
        |       format_kind(exe) AS k,
        |       extract_strings(exe, 10) AS strs,
        |       simhash64(txt) AS sh,
        |       size(fingerprint(txt, 3, 2)) AS nfp,
        |       size(minhash_signature(txt, 16, 1)) AS nmh,
        |       char_entropy('ab') AS ent,
        |       url_parts('http://User@WWW.a.co.uk:81/p?q#f').host AS uh,
        |       registered_domain('www.a.co.uk') AS rdom,
        |       url_normalize('HTTP://A.com.:80/%61#f') AS un,
        |       url_normalize('http://a.com/p?b=2&a=1', true) AS uns,
        |       decode_html_entities('caf&#233; &amp;#65; &mdash;') AS de,
        |       http_payload(cast(concat('HTTP/1.1 200 OK\r\nContent-Type: t/x\r\n\r\nBODY') AS binary)) AS hp,
        |       charset_decode(unhex('636166E9'), 'text/html; charset=ISO-8859-1') AS cd,
        |       charset_decode(unhex('C3A9')) AS cd1,
        |       url_resolve('http://a/b/c', '../g?x') AS ur,
        |       robots_allowed('User-agent: *\nDisallow: /p/', 'bot', '/p/x') AS rb,
        |       extract_sitemap_urls('<urlset><url><loc>http://e.com/a</loc></url></urlset>')[0].loc AS sm,
        |       surt_key('http://www.Example.com:80/A?b=2&a=1') AS sk,
        |       robots_sitemaps('Sitemap: http://e.com/s.xml\nUser-agent: *\nDisallow: /')[0] AS rs,
        |       html_meta('<title>T</title><meta name=robots content=noindex>').noindex AS hm,
        |       extract_anchors('<a href=/x rel=nofollow>t</a>')[0].nofollow AS an,
        |       script_ratios('abc где 12').n_letters AS sr,
        |       robots_crawl_delay('User-agent: *\nCrawl-delay: 3', 'bot') AS cd3,
        |       extract_links('<a href="/a">x</a><a href=/b>y</a>') AS lk,
        |       size(cdc_chunks(cast(txt AS binary), 2, 16, 64)) AS nc,
        |       bpe_encode_count('the of and to in') AS bpe,
        |       redact_pii('mail u@ex.org or 8.8.8.8') AS pii,
        |       fix_mojibake(charset_decode(unhex('C383C2A9'), 'iso-8859-1')) AS fm
        |FROM t""".stripMargin).head()
    assert(r.getAs[Boolean]("u"))
    assert(r.getAs[String]("k") == "executable")
    // "ELF" (short run) accumulates into the next run — reference
    // parity, see AsciiStrings scaladoc
    assert(r.getSeq[String](2) == Seq("ELFembedded_string_one"))
    assert(r.getAs[Long]("sh") >= 0L) // 62-bit simhash is never negative
    assert(r.getAs[Int]("nfp") > 0 && r.getAs[Int]("nmh") == 16)
    assert(r.getAs[Double]("ent") == math.log(2.0))
    assert(r.getAs[String]("uh") == "www.a.co.uk")
    assert(r.getAs[String]("rdom") == "a.co.uk")
    assert(r.getAs[Long]("bpe") == 5L)
    assert(r.getAs[org.apache.spark.sql.Row]("pii").getAs[String]("clean") ==
      "mail <EMAIL> or <IP>")
    // C3 83 C2 A9 mis-decoded as latin-1 then repaired: two passes -> é
    assert(r.getAs[String]("fm") == "é")
    assert(r.getAs[String]("un") == "http://a.com/a")
    assert(r.getAs[String]("uns") == "http://a.com/p?a=1&b=2")
    assert(r.getAs[String]("de") == "café &#65; —")
    assert(r.getAs[String]("cd") == "café")
    assert(r.getAs[String]("cd1") == "é")
    assert(r.getAs[String]("ur") == "http://a/g?x")
    assert(!r.getAs[Boolean]("rb"))
    assert(r.getAs[String]("sm") == "http://e.com/a")
    assert(r.getAs[String]("sk") == "com,example)/a?a=1&b=2")
    assert(r.getAs[String]("rs") == "http://e.com/s.xml")
    assert(r.getAs[Boolean]("hm"))
    assert(r.getAs[Boolean]("an"))
    assert(r.getAs[Long]("sr") == 6L)
    assert(r.getAs[Double]("cd3") == 3.0)
    assert(r.getSeq[String](r.fieldIndex("lk")) == Seq("/a", "/b"))
    val hp = r.getAs[org.apache.spark.sql.Row]("hp")
    assert(hp.getAs[Int]("status") == 200)
    assert(hp.getAs[String]("content_type") == "t/x")
    assert(new String(hp.getAs[Array[Byte]]("payload"), "UTF-8") == "BODY")
    assert(r.getAs[Int]("nc") >= 1) // 7-byte payload -> at least one chunk
  }

  test("nfc_normalize / strip_accents: DuckDB-golden semantics (incl. Hangul)") {
    // (input, expected nfc_normalize, expected strip_accents) — the
    // expected strings are DuckDB's own outputs on the same inputs,
    // captured this round (utf8proc STRIPMARK semantics: NFD -> drop
    // Mn/Mc/Me -> NFC recompose). Everything is spelled in \\u
    // escapes: composed-vs-decomposed inputs are the POINT of the
    // test and must survive any editor normalization.
    val cases = Seq(
      ("Cafe\u0301", "Caf\u00e9", "Cafe"), // decomposed e+acute: composes under nfc, strips
      ("Caf\u00e9", "Caf\u00e9", "Cafe"), // composed e-acute
      ("m\u00fchleisen", "m\u00fchleisen", "muhleisen"), // u-umlaut
      ("\u00f8", "\u00f8", "\u00f8"), // o-slash: no decomposition, survives strip
      ("\ufb01n", "\ufb01n", "\ufb01n"), // fi ligature: NFC/NFD keep it (not NFKD)
      ("A\u030angstro\u0308m", "\u00c5ngstr\u00f6m", "Angstrom"), // decomposed ring+umlaut
      ("\u1eb7", "\u1eb7", "a"), // a + breve + dot-below: both marks strip
      ("\u00df", "\u00df", "\u00df"), // sharp-s survives
      ("e\u0301\u0302", "\u00e9\u0302", "e"), // stacked marks all strip
      ("\u1112\u1161\u11ab", "\ud55c", "\ud55c"), // decomposed jamo recompose
      ("\ud55c", "\ud55c", "\ud55c"), // composed Hangul untouched
      ("plain ascii", "plain ascii", "plain ascii")) // ascii fast path
    cases.foreach { case (in, nfcExp, stripExp) =>
      import spark.implicits._
      Seq(Tuple1(in)).toDF("t").createOrReplaceTempView("norm_t")
      val r = spark.sql("SELECT nfc_normalize(t) AS n, strip_accents(t) AS s FROM norm_t").head()
      def esc(s: String) = s.map(c => f"\\u${c.toInt}%04x").mkString
      assert(r.getString(0) == nfcExp, s"nfc of ${esc(in)}: got ${esc(r.getString(0))}")
      assert(r.getString(1) == stripExp, s"strip of ${esc(in)}: got ${esc(r.getString(1))}")
    }
  }

  test("LATERAL VIEW explode_archive walks nested archives from SQL") {
    import spark.implicits._
    val nested = Fixtures.zipArchive(Seq(
      "a.txt" -> "alpha".getBytes("UTF-8"),
      "inner.zip" -> Fixtures.zipArchive(Seq("b/c.txt" -> "beta".getBytes("UTF-8")))))
    Seq(("src1", nested)).toDF("source", "content").createOrReplaceTempView("blobs")
    val rows = spark.sql(
      """SELECT b.source, a.path, a.size, lower(hex(a.hash)) AS sha
        |FROM blobs b LATERAL VIEW explode_archive(b.content) a
        |ORDER BY a.path""".stripMargin).collect()
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a.txt", 5L), ("inner.zip/b/c.txt", 4L)))
    assert(rows.head.getAs[String]("sha") ==
      Fixtures.sha256Hex("alpha".getBytes("UTF-8")))
  }

  test("approx_count_distinct (HLL++) lands within 5% of exact") {
    // sketch surface (§2.8): approximate values are engine-specific so
    // this is a tolerance spec, not a DuckDB-oracle query
    import spark.implicits._
    val df = (1 to 10000).map(i => i % 1000).toDF("k")
    val Array(approx, exact) = df
      .select(approx_count_distinct(org.apache.spark.sql.functions.col("k")),
        countDistinct(org.apache.spark.sql.functions.col("k")))
      .head().toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("md5lo62 matches DuckDB md5_number_lower & mask (oracle-shared hash)") {
    // DuckDB: SELECT md5_number_lower('abc') => 8250560606382298838
    assert(graft.functions.HashingHelper.md5lo62("abc") ==
      (8250560606382298838L & 0x3fffffffffffffffL))
  }

  test("hashed_grams / hashed_linear_z evaluate from SQL (the DSIR + q152 surface)") {
    val w = Array(0.5, -0.25, 0.125, -0.0625)
    val wSql = w.mkString("array(", "D, ", "D)")
    val row = spark.sql(
      s"""SELECT size(hashed_grams('the quick fox', 4)) AS ng,
         |       hashed_linear_z('the quick fox', $wSql, 0.75D) AS z,
         |       hashed_linear_z(NULL, $wSql, 0.75D) AS zn,
         |       hashed_linear_z('', $wSql, 0.75D) AS z0""".stripMargin).head()
    assert(row.getAs[Int]("ng") == 5) // 3 unigrams + 2 bigrams
    // the SQL face must evaluate the exact fused-helper arithmetic the
    // Column face (and the q152 oracle) pin
    val expected = graft.functions.HashingHelper.hashedLinearZ(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick fox"),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(w), 0.75)
    assert(row.getAs[Double]("z") == expected)
    assert(row.isNullAt(row.fieldIndex("zn"))) // null-intolerant
    assert(row.getAs[Double]("z0") == 0.75)    // gramless -> bias
  }
}

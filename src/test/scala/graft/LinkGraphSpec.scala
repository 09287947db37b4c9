package graft

import graft.functions.{HtmlLinkHelper, UrlHelper}
import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The link-graph surface: `extract_links` scanning, `url_resolve`
  * RFC 3986 reference resolution, and weighted PageRank.
  */
class LinkGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("LinkGraphSpec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def links(html: String): Seq[String] = {
    val arr = HtmlLinkHelper.extractLinks(UTF8String.fromString(html))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  // ---- extract_links ------------------------------------------------

  test("extract_links: quoted, single-quoted, unquoted values") {
    assert(links("""<a href="/a">x</a><a href='/b'>y</a><a href=/c>z</a>""") ==
      Seq("/a", "/b", "/c"))
  }

  test("extract_links: case-insensitive tag and attribute, first href wins") {
    assert(links("""<A HREF="/a">x</A><a title="t" Href="/b" href="/dup">y</a>""") ==
      Seq("/a", "/b"))
  }

  test("extract_links: quoted '>' does not end the tag; other attrs skipped") {
    assert(links("""<a title="x>y" href="/a">t</a>""") == Seq("/a"))
    // and a quoted '>' inside ANOTHER tag must not desync the scanner
    assert(links("""<img alt="a>b"><a href="/ok">t</a>""") == Seq("/ok"))
  }

  test("extract_links: comments, script and style bodies are not links") {
    val html = """<!-- <a href="/no1">c</a> -->
      |<script>var s = '<a href="/no2">s</a>';</script>
      |<style>a[href="/no3"] {}</style>
      |<a href="/yes">t</a>""".stripMargin
    assert(links(html) == Seq("/yes"))
  }

  test("extract_links: unterminated script consumes the rest (browser rule)") {
    assert(links("""<a href="/a">x</a><script>var s='<a href="/no">""") ==
      Seq("/a"))
  }

  test("extract_links: entity-decoded values, anchors without href skipped") {
    assert(links("""<a href="/s?a=1&amp;b=2">x</a><a name="n">y</a>""") ==
      Seq("/s?a=1&b=2"))
  }

  test("extract_links: sloppy unpaired quote in another tag does not swallow anchors") {
    // title=don't is an UNQUOTED value containing an apostrophe — the
    // quote must not open a region that eats the following <a>
    assert(links("""<p title=don't><a href="/z">x</a>""") == Seq("/z"))
  }

  test("extract_links: <abbr>/<area> are not anchors; <a/> variants are") {
    assert(links("""<abbr href="/no">x</abbr><area href="/no2"><a href="/y">t</a>""") ==
      Seq("/y"))
    assert(links("""<a/ href="/a">x</a>""") == Seq("/a"))
  }

  test("extract_links: empty array / null passthrough") {
    assert(links("no tags at all") == Seq.empty)
    assert(HtmlLinkHelper.extractLinks(null) == null)
  }

  // ---- url_resolve --------------------------------------------------

  private val Base = "http://a/b/c/d;p?q"
  private def res(ref: String, base: String = Base): String = {
    val r = UrlHelper.resolve(UTF8String.fromString(base), UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  test("url_resolve: RFC 3986 §5.4.1 normal examples") {
    assert(res("g") == "http://a/b/c/g")
    assert(res("./g") == "http://a/b/c/g")
    assert(res("g/") == "http://a/b/c/g/")
    assert(res("/g") == "http://a/g")
    assert(res("//g/h") == "http://g/h")
    assert(res("?y") == "http://a/b/c/d;p?y")
    assert(res("g?y") == "http://a/b/c/g?y")
    assert(res("#s") == "http://a/b/c/d;p?q#s")
    assert(res("g#s") == "http://a/b/c/g#s")
    assert(res(";x") == "http://a/b/c/;x")
    assert(res("") == "http://a/b/c/d;p?q")
    assert(res(".") == "http://a/b/c/")
    assert(res("./") == "http://a/b/c/")
    assert(res("..") == "http://a/b/")
    assert(res("../") == "http://a/b/")
    assert(res("../g") == "http://a/b/g")
    assert(res("../..") == "http://a/")
    assert(res("../../") == "http://a/")
    assert(res("../../g") == "http://a/g")
  }

  test("url_resolve: RFC 3986 §5.4.2 abnormal examples") {
    assert(res("../../../g") == "http://a/g")
    assert(res("../../../../g") == "http://a/g")
    assert(res("/./g") == "http://a/g")
    assert(res("/../g") == "http://a/g")
    assert(res("g.") == "http://a/b/c/g.")
    assert(res(".g") == "http://a/b/c/.g")
    assert(res("g..") == "http://a/b/c/g..")
    assert(res("..g") == "http://a/b/c/..g")
    assert(res("./../g") == "http://a/b/g")
    assert(res("./g/.") == "http://a/b/c/g/")
    assert(res("g/./h") == "http://a/b/c/g/h")
    assert(res("g/../h") == "http://a/b/c/h")
    assert(res("g;x=1/./y") == "http://a/b/c/g;x=1/y")
    assert(res("g;x=1/../y") == "http://a/b/c/y")
    // dot segments are NOT applied inside query or fragment
    assert(res("g?y/./x") == "http://a/b/c/g?y/./x")
    assert(res("g?y/../x") == "http://a/b/c/g?y/../x")
    assert(res("g#s/./x") == "http://a/b/c/g#s/./x")
  }

  test("url_resolve: absolute refs kept (dot-normalized); non-fetchable schemes null") {
    assert(res("HTTPS://Other.example/p?x") == "HTTPS://Other.example/p?x")
    assert(res("mailto:x@y.example") == null)
    assert(res("javascript:void(0)") == null)
    assert(res("data:text/plain,hi") == null)
    // RFC's strict-parser 'http:g' case: not a fetchable shape → null
    assert(res("http:g") == null)
    // §5.2.2 applies remove_dot_segments to absolute references too
    // (r12 ADVICE): the absolute and relative spellings of the same
    // target elect the same link-graph key
    assert(res("http://h/a/../b") == "http://h/b")
    assert(res("http://h/a/./b/../c?d/../e#f") == "http://h/a/c?d/../e#f")
    assert(res("http://h/a/..") == "http://h/")
    // no path at all / query-only absolute refs: nothing to normalize
    assert(res("http://h") == "http://h")
    assert(res("http://h?q") == "http://h?q")
    assert(res("http://h#f") == "http://h#f")
  }

  test("url_resolve: port kept, empty base path, whitespace trim, null base") {
    assert(res("g", "http://h:8080/x/y") == "http://h:8080/x/g")
    assert(res("g", "http://h") == "http://h/g")
    assert(res("  /g  ") == "http://a/g")
    assert(res("g", "not a url") == null)
    assert(UrlHelper.resolve(null, UTF8String.fromString("g")) == null)
    assert(UrlHelper.resolve(UTF8String.fromString(Base), null) == null)
  }

  test("extract_links / url_resolve: markup-soup fuzz never throws (seeded)") {
    val rnd = new java.util.Random(4242)
    val toks = Array("<a href=", "<a", "href", "=", "\"", "'", ">", "</a>",
      "<script>", "</script>", "<style>", "<!--", "-->", "<", "&amp;", "&#",
      ";", "x", " ", "\n", "/", "p", "<p title=don't>", "<img alt=\"a>b\">")
    (0 until 2000).foreach { i =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(60)).foreach(_ => sb.append(toks(rnd.nextInt(toks.length))))
      val soup = sb.toString
      val arr = HtmlLinkHelper.extractLinks(UTF8String.fromString(soup))
      assert(arr != null, s"soup $i")
      // every extracted value resolves without throwing; the result is
      // null or carries the authority shape downstream parsing needs
      (0 until arr.numElements()).foreach { j =>
        val r = UrlHelper.resolve(UTF8String.fromString("https://h.example/a/b?q"),
          arr.getUTF8String(j))
        assert(r == null || r.toString.contains("://"))
      }
    }
    val refToks = Array("http", "https", ":", "//", "/", ".", "..", "?", "#",
      "%", "a", "b", "@", "[", "]", "mailto:", " ", "\t", "%2F", "&")
    (0 until 2000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(12)).foreach(_ => sb.append(refToks(rnd.nextInt(refToks.length))))
      val r = UrlHelper.resolve(UTF8String.fromString("http://h:81/x/y/z?k"),
        UTF8String.fromString(sb.toString))
      assert(r == null || r.toString.contains("://"))
    }
  }

  test("extract_links: generated anchors round-trip exactly (seeded)") {
    val rnd = new java.util.Random(7)
    (0 until 200).foreach { i =>
      val hrefs = (0 until rnd.nextInt(8)).map(k => s"/p/$i/$k?x=$k")
      val html = hrefs.map { h =>
        val quote = rnd.nextInt(3) match {
          case 0 => "\"" + h + "\""
          case 1 => "'" + h + "'"
          case _ => h // unquoted (no spaces in these hrefs)
        }
        s"<p>text ${rnd.nextInt(100)}</p><a rel=nofollow href=$quote>t</a>"
      }.mkString("<!-- <a href=/never>x</a> -->")
      assert(links(html) == hrefs, s"case $i")
    }
  }

  // ---- pageRank -----------------------------------------------------

  private def ranks(edges: Seq[(String, String, Double)], iters: Int): Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst", "weight"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("pageRank: zero iterations is the uniform vector") {
    val r = ranks(Seq(("a", "b", 1.0), ("b", "c", 1.0)), 0)
    assert(r.keySet == Set("a", "b", "c"))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank: dangling mass redistributes; hand-computed 1 iteration") {
    // a -> b, b dangling; N=2, D=0.5 after init
    val r = ranks(Seq(("a", "b", 1.0)), 1)
    assert(math.abs(r("a") - 0.2875) < 1e-12)
    assert(math.abs(r("b") - 0.7125) < 1e-12)
  }

  test("pageRank: weights split votes proportionally; hand-computed") {
    // a -> b (w=3), a -> c (w=1); b, c dangling; N=3, D=2/3 after init
    val r = ranks(Seq(("a", "b", 3.0), ("a", "c", 1.0)), 1)
    assert(math.abs(r("a") - (0.05 + 0.85 * (2.0 / 9))) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * (0.25 + 2.0 / 9))) < 1e-12)
    assert(math.abs(r("c") - (0.05 + 0.85 * (1.0 / 12 + 2.0 / 9))) < 1e-12)
  }

  test("pageRank: rank sums to 1 every iteration count; self-loops fine") {
    val edges = Seq(("a", "b", 2.0), ("b", "a", 1.0), ("a", "a", 1.0),
      ("c", "a", 5.0), ("b", "d", 2.0))
    Seq(1, 3, 5).foreach { k =>
      val total = ranks(edges, k).values.sum
      assert(math.abs(total - 1.0) < 1e-9, s"sum at k=$k was $total")
    }
  }

  test("pageRank: a sink fed by everyone outranks its feeders") {
    val r = ranks(Seq(("a", "z", 1.0), ("b", "z", 1.0), ("c", "z", 1.0)), 3)
    assert(r("z") > r("a") && r("z") > r("b") && r("z") > r("c"))
  }
}

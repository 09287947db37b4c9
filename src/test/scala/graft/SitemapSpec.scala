package graft

import graft.functions.SitemapHelper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** sitemaps.org protocol parsing: urlset/sitemapindex/plain-text
  * faces, entity decode, CDATA, namespace prefixes, malformed input.
  */
class SitemapSpec extends AnyFunSuite {

  private case class E(loc: String, kind: String, lastmod: String,
      changefreq: String, priority: java.lang.Double)

  private def parse(s: String): Seq[E] = {
    val a = SitemapHelper.extract(UTF8String.fromString(s))
      .asInstanceOf[ArrayData]
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 5).asInstanceOf[InternalRow]
      def str(j: Int) = if (r.isNullAt(j)) null else r.getUTF8String(j).toString
      E(str(0), str(1), str(2), str(3),
        if (r.isNullAt(4)) null else Double.box(r.getDouble(4)))
    }
  }

  test("urlset with full metadata; entry order preserved") {
    val got = parse(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>http://example.com/</loc>
        |    <lastmod>2024-01-15</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>http://example.com/b</loc></url>
        |</urlset>""".stripMargin)
    assert(got == Seq(
      E("http://example.com/", "url", "2024-01-15", "daily", 0.8),
      E("http://example.com/b", "url", null, null, null)))
  }

  test("sitemapindex entries are kind=sitemap, no priority read") {
    val got = parse(
      """<sitemapindex>
        |  <sitemap><loc>http://e.com/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
        |  <sitemap><loc>http://e.com/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin)
    assert(got == Seq(
      E("http://e.com/s1.xml", "sitemap", "2024-02-01", null, null),
      E("http://e.com/s2.xml", "sitemap", null, null, null)))
  }

  test("loc entity-decodes (the spec mandates escaping) and CDATA unwraps") {
    val got = parse(
      """<urlset>
        |<url><loc>http://e.com/s?a=1&amp;b=2</loc></url>
        |<url><loc><![CDATA[http://e.com/raw?x=1&y=2]]></loc></url>
        |</urlset>""".stripMargin)
    assert(got.map(_.loc) ==
      Seq("http://e.com/s?a=1&b=2", "http://e.com/raw?x=1&y=2"))
  }

  test("namespace-prefixed elements match by local name") {
    val got = parse(
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:url><sm:loc>http://e.com/ns</sm:loc><sm:priority>0.5</sm:priority></sm:url>
        |</sm:urlset>""".stripMargin)
    assert(got == Seq(E("http://e.com/ns", "url", null, null, 0.5)))
  }

  test("missing loc dropped; malformed priority is null, not an error") {
    val got = parse(
      """<urlset>
        |<url><lastmod>2024-01-01</lastmod></url>
        |<url><loc>http://e.com/x</loc><priority>high</priority></url>
        |</urlset>""".stripMargin)
    assert(got == Seq(E("http://e.com/x", "url", null, null, null)))
  }

  test("truncated sitemap still yields the open entry's fields") {
    val got = parse("<urlset><url><loc>http://e.com/cut</loc><lastmod>2024")
    assert(got.map(_.loc) == Seq("http://e.com/cut"))
    assert(got.head.lastmod == "2024")
  }

  test("plain-text sitemap: URL lines only, trimmed; XML face wins when '<' present") {
    val got = parse(
      "http://e.com/1\n\n  https://e.com/2  \nnot a url\nftp://e.com/3\nHTTP://e.com/4")
    assert(got.map(_.loc) == Seq("http://e.com/1", "https://e.com/2", "HTTP://e.com/4"))
    assert(got.forall(e => e.kind == "url" && e.priority == null))
    // any '<' routes to the XML face — a text line is never extracted
    assert(parse("<html><body>http://e.com/x</body></html>").isEmpty)
  }

  test("urlset/sitemapindex names do not match as url/sitemap entries") {
    // <urlset> itself must not parse as a <url> element (name-end rule)
    assert(parse("<urlset></urlset>").isEmpty)
    assert(parse("<sitemapindex></sitemapindex>").isEmpty)
  }

  test("comments are skipped; null input is null") {
    val got = parse(
      "<urlset><!-- <url><loc>http://e.com/no</loc></url> --><url><loc>http://e.com/yes</loc></url></urlset>")
    assert(got.map(_.loc) == Seq("http://e.com/yes"))
    assert(SitemapHelper.extract(null) == null)
  }

  test("markup-soup fuzz never throws; well-formed subset survives") {
    val rnd = new Random(1109)
    val atoms = Seq("<url>", "</url>", "<loc>", "</loc>", "<sitemap>",
      "</sitemap>", "http://e.com/x", "<![CDATA[", "]]>", "<!--", "-->",
      "&amp;", "<", ">", "\"", "'", "priority", "<priority>", "0.5",
      "\n", " ", "é", "<urlset>", "</urlset>")
    (1 to 2000).foreach { _ =>
      val soup = (1 to rnd.nextInt(40)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      SitemapHelper.extract(UTF8String.fromString(soup)) // must not throw
    }
  }

  test("50k spec cap bounds output; scan stays linear on a one-kind file") {
    val sb = new StringBuilder("<urlset>")
    (1 to 50050).foreach(i => sb.append(s"<url><loc>http://e.com/$i</loc></url>"))
    sb.append("</urlset>")
    val t0 = System.nanoTime()
    val got = parse(sb.toString)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.size == 50000)
    assert(got.head.loc == "http://e.com/1")
    assert(secs < 10.0, s"quadratic rescan? took $secs s")
  }
}

package graft

import graft.functions.HtmlMetaHelper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Page-head metadata extraction: title RCDATA, meta description,
  * canonical link, robots-meta noindex; decoys, sloppy markup, fuzz.
  */
class HtmlMetaSpec extends AnyFunSuite {

  private case class M(title: String, description: String,
      canonical: String, noindex: Boolean)

  private def m(html: String): M = {
    val r = HtmlMetaHelper.meta(UTF8String.fromString(html))
      .asInstanceOf[InternalRow]
    def str(i: Int) = if (r.isNullAt(i)) null else r.getUTF8String(i).toString
    M(str(0), str(1), str(2), r.getBoolean(3))
  }

  test("full head: all four fields; entities decode; whitespace collapses") {
    val got = m(
      """<html><head>
        |<title>
        |  Doc &amp; More &mdash; here </title>
        |<meta name=description content="A &eacute; summary">
        |<link rel="canonical" href="http://e.com/c?a=1&amp;b=2">
        |<meta name="robots" content="NOINDEX, nofollow">
        |</head></html>""".stripMargin)
    assert(got == M("Doc & More — here", "A é summary",
      "http://e.com/c?a=1&b=2", noindex = true))
  }

  test("first title wins; decoys in comments and script are skipped") {
    val got = m(
      """<!-- <title>decoy</title> -->
        |<script>var t = "<title>not me</title>";</script>
        |<style>.t:after { content: "<title>nope</title>"; }</style>
        |<title>Real</title><title>Second</title>""".stripMargin)
    assert(got.title == "Real")
  }

  test("first description/canonical win; rel token list; unquoted attrs") {
    val got = m(
      """<meta name=description content="first">
        |<meta name="description" content="second">
        |<link rel="alternate canonical" href=/c1>
        |<link rel=canonical href=/c2>""".stripMargin)
    assert(got.description == "first")
    assert(got.canonical == "/c1") // rel is a token LIST
  }

  test("noindex is a token, not a substring; absent fields are null") {
    assert(!m("""<meta name=robots content="noindexing">""").noindex)
    assert(m("""<meta name=robots content="a,noindex">""").noindex)
    val empty = m("<p>no head here</p>")
    assert(empty == M(null, null, null, noindex = false))
    // empty title is null, not ""
    assert(m("<title> </title>").title == null)
  }

  test("truncated title runs to input end; meta without content ignored") {
    assert(m("<title>Cut off by the crawler").title == "Cut off by the crawler")
    assert(m("<meta name=description>").description == null)
    assert(HtmlMetaHelper.meta(null) == null)
  }

  test("markup-soup fuzz never throws") {
    val rnd = new Random(115)
    val atoms = Seq("<title>", "</title>", "<meta ", "name=", "content=",
      "\"", "'", "robots", "description", "noindex", "<link ", "rel=",
      "canonical", "href=", ">", "<", "=", "<script>", "</script>",
      "<!--", "-->", "&amp;", " ", "\n", "x")
    (1 to 2000).foreach { _ =>
      val soup = (1 to rnd.nextInt(40)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      HtmlMetaHelper.meta(UTF8String.fromString(soup))
    }
  }
}

package graft

import graft.functions.HtmlAnchorHelper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Anchor extraction with text + rel-nofollow: nested markup, decoys,
  * token semantics, truncation, fuzz.
  */
class AnchorSpec extends AnyFunSuite {

  private case class A(href: String, text: String, nofollow: Boolean)

  private def anchors(html: String): Seq[A] = {
    val a = HtmlAnchorHelper.extractAnchors(UTF8String.fromString(html))
      .asInstanceOf[ArrayData]
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3).asInstanceOf[InternalRow]
      A(r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
        r.getBoolean(2))
    }
  }

  test("text: nested markup stripped, entities decode, whitespace collapses") {
    assert(anchors("""<a href="/p?a=1&amp;b=2">  Link &amp; <b>bold</b>
      | text  </a>""".stripMargin) ==
      Seq(A("/p?a=1&b=2", "Link & bold text", nofollow = false)))
  }

  test("nofollow is a rel token; other rel values don't fire") {
    assert(anchors("""<a href=/x rel="external nofollow">t</a>""").head.nofollow)
    assert(anchors("""<a href=/x rel="nofollowed">t</a>""").head == A("/x", "t", false))
    assert(anchors("""<a href=/x rel=NOFOLLOW>t</a>""").head.nofollow)
  }

  test("no-href anchors skipped; empty text is null; unclosed runs to end") {
    assert(anchors("""<a name=top>jump</a><a href=/y><img src=i></a>""") ==
      Seq(A("/y", null, nofollow = false)))
    assert(anchors("""<a href=/z>tail text""") ==
      Seq(A("/z", "tail text", nofollow = false)))
  }

  test("decoys in script/comments skipped, outside and inside anchor text") {
    val got = anchors(
      """<script>var s = '<a href=/decoy>x</a>';</script>
        |<a href=/real>before<!-- mid comment --><script>var t=1;</script>after</a>""".stripMargin)
    assert(got == Seq(A("/real", "beforeafter", nofollow = false)))
  }

  test("parity with extract_links on the href set; fuzz never throws") {
    val html = """<a href="/a">x</a><p><a href=/b rel=nofollow><i>y</i></a>"""
    val hrefs = anchors(html).map(_.href)
    val bare = {
      val arr = graft.functions.HtmlLinkHelper
        .extractLinks(UTF8String.fromString(html)).asInstanceOf[ArrayData]
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    assert(hrefs == bare)
    val rnd = new Random(116)
    val atoms = Seq("<a ", "href=", "rel=", "nofollow", "\"", "'", "/x",
      ">", "</a>", "<b>", "</b>", "<script>", "</script>", "<!--", "-->",
      "&amp;", "text", " ", "\n", "<", "=")
    (1 to 2000).foreach { _ =>
      val soup = (1 to rnd.nextInt(40)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString
      HtmlAnchorHelper.extractAnchors(UTF8String.fromString(soup))
    }
    assert(HtmlAnchorHelper.extractAnchors(null) == null)
  }
}

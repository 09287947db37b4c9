package graft

import graft.functions.RobotsHelper
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots.txt evaluation: grouping, group selection,
  * longest-match rules, wildcard/anchor patterns, malformed input.
  */
class RobotsSpec extends AnyFunSuite {

  private def ok(robots: String, agent: String, path: String): Boolean =
    RobotsHelper.allowed(UTF8String.fromString(robots),
      UTF8String.fromString(agent), UTF8String.fromString(path))

  private val basic =
    """User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("group selection: exact token beats *; unmatched falls to *") {
    assert(ok(basic, "graftbot", "/public"))
    assert(!ok(basic, "graftbot", "/private/x"))
    assert(!ok(basic, "otherbot", "/public")) // * group: everything denied
  }

  test("longest match wins; Allow wins on equal length") {
    assert(ok(basic, "graftbot", "/private/ok"))     // Allow longer
    assert(ok(basic, "graftbot", "/private/ok/deep"))
    val tie =
      """User-agent: a
        |Disallow: /dir/
        |Allow: /dir*
        |""".stripMargin
    // equal-length patterns (5 octets each): Allow wins the tie
    assert(ok(tie, "a", "/dir/x"))
  }

  test("agent matching is case-insensitive and version-stripped") {
    assert(!ok(basic, "GraftBot/2.1", "/private/x"))
    assert(ok(basic, "GRAFTBOT", "/private/ok"))
    val uc = basic.replace("User-agent: graftbot", "USER-AGENT: GraftBot")
    assert(!ok(uc, "graftbot", "/private/x"))
  }

  test("consecutive user-agent lines share a group; split groups combine") {
    val multi =
      """User-agent: abot
        |User-agent: bbot
        |Disallow: /shared/
        |
        |User-agent: bbot
        |Disallow: /extra/
        |""".stripMargin
    assert(!ok(multi, "abot", "/shared/x"))
    assert(!ok(multi, "bbot", "/shared/x"))
    assert(!ok(multi, "bbot", "/extra/x"))  // both bbot groups combine
    assert(ok(multi, "abot", "/extra/x"))
  }

  test("wildcard * spans octets; $ anchors the end") {
    val r =
      """User-agent: a
        |Disallow: *.gif$
        |Disallow: /tmp*.log
        |Disallow: /exact$
        |""".stripMargin
    assert(!ok(r, "a", "/img/x.gif"))
    assert(ok(r, "a", "/img/x.gifx"))      // $ means end-of-path
    assert(!ok(r, "a", "/tmp/a.log"))
    assert(!ok(r, "a", "/tmpX.log.old"))   // unanchored: prefix+contains
    assert(!ok(r, "a", "/exact"))
    assert(ok(r, "a", "/exact/sub"))       // anchored: exact only
  }

  test("empty Disallow matches nothing; unknown directives ignored") {
    val r =
      """User-agent: a
        |Crawl-delay: 10
        |Disallow:
        |Sitemap: https://h/x.xml
        |Disallow: /blocked
        |""".stripMargin
    assert(ok(r, "a", "/anything"))
    assert(!ok(r, "a", "/blocked/page"))
  }

  test("comments, CRLF, junk lines and missing groups never throw") {
    val r = "User-agent: a # our bot\r\nDisallow: /x # no\r\nnonsense line\r\n:::\r\n"
    assert(!ok(r, "a", "/x/y"))
    assert(ok(r, "a", "/y"))
    assert(ok(r, "unmatched", "/x"))       // no * group -> permitted
    assert(ok("", "a", "/x"))
    assert(RobotsHelper.allowed(null, UTF8String.fromString("a"),
      UTF8String.fromString("/x")))
    // garbage soup: parse + probe must never throw
    val rnd = new java.util.Random(11)
    val toks = Array("User-agent:", "Disallow:", "Allow:", "*", "$", "/",
      "a", "\n", "\r\n", ":", "#c", " ", "%2F", "..")
    (0 until 2000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(30)).foreach(_ => sb.append(toks(rnd.nextInt(toks.length))))
      ok(sb.toString, "graftbot/1.0", "/a/*b$")
      // the whole robots surface must survive the same soup
      RobotsHelper.crawlDelay(UTF8String.fromString(sb.toString),
        UTF8String.fromString("graftbot"))
      RobotsHelper.sitemaps(UTF8String.fromString(sb.toString))
    }
  }

  test("rules before any user-agent line are ignored; empty path probes /") {
    assert(ok("Disallow: /\n", "a", "/x")) // headerless rules: no group
    val r = "User-agent: a\nDisallow: /$\n"
    assert(!RobotsHelper.allowed(UTF8String.fromString(r),
      UTF8String.fromString("a"), UTF8String.fromString("")))
  }

  private def sitemaps(robots: String): Seq[String] = {
    val a = RobotsHelper.sitemaps(
      if (robots == null) null else UTF8String.fromString(robots))
    (0 until a.numElements()).map(i =>
      a.getUTF8String(i).toString)
  }

  test("Sitemap directives: file order, group-independent, case-insensitive key") {
    val r =
      """User-agent: a
        |Disallow: /x
        |Sitemap: http://e.com/a.xml
        |
        |User-agent: b
        |sitemap: http://e.com/b.xml  # trailing comment
        |SITEMAP: http://e.com/c.xml
        |Sitemap:
        |Sitemapx: http://e.com/not.xml
        |""".stripMargin
    assert(sitemaps(r) ==
      Seq("http://e.com/a.xml", "http://e.com/b.xml", "http://e.com/c.xml"))
    // a Sitemap line before any group still counts (group-independent)
    assert(sitemaps("Sitemap: http://e.com/top.xml\nUser-agent: a\nDisallow: /") ==
      Seq("http://e.com/top.xml"))
    assert(sitemaps(null).isEmpty)
    assert(sitemaps("").isEmpty)
  }

  private def delay(robots: String, agent: String): Double =
    RobotsHelper.crawlDelay(
      if (robots == null) null else UTF8String.fromString(robots),
      UTF8String.fromString(agent))

  test("crawl-delay: group-scoped, exact beats *, max wins when combined") {
    val r =
      """User-agent: a
        |Crawl-delay: 2.5
        |Disallow: /x
        |
        |User-agent: a
        |Crawl-delay: 1
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    assert(delay(r, "a/1.0") == 2.5)  // combined a-groups: max(2.5, 1)
    assert(delay(r, "other") == 10.0) // falls to the * group
    // repeated lines in ONE group keep the largest; malformed/negative
    // values are ignored; no delay anywhere -> NaN
    assert(delay("User-agent: a\nCrawl-delay: 1\nCrawl-delay: 3\n", "a") == 3.0)
    assert(delay("User-agent: a\nCrawl-delay: fast\nCrawl-delay: -2\n", "a").isNaN)
    assert(delay("User-agent: a\nDisallow: /\n", "a").isNaN)
    assert(delay(null, "a").isNaN)
    // a group matched exactly but delay-less does NOT fall to *
    val r2 = "User-agent: a\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert(delay(r2, "a").isNaN)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing for crawl seeding — the discovery seat next to
  * [[RobotsHelper]]'s admission gate: robots.txt points at sitemaps,
  * sitemaps enumerate the URLs a host wants crawled. Implements the
  * sitemaps.org protocol (the public spec CommonCrawl/search engines
  * consume): `<urlset><url>` leaf entries with optional
  * lastmod/changefreq/priority, `<sitemapindex><sitemap>` index
  * entries pointing at child sitemaps, and the plain-text variant
  * (one URL per line). A single-pass scanner, not an XML library —
  * real-world sitemaps are full of undeclared entities, truncation
  * and stray markup that strict parsers reject; the crawl-data
  * contract is extract-what-parses, never throw.
  *
  * Spec rules honored: `<loc>` values are entity-escaped XML text —
  * decoded here ([[HtmlEntityHelper]] covers the XML five);
  * CDATA-wrapped values unwrap; element names match case-insensitively
  * with or without a namespace prefix (`sm:loc`); entries missing
  * `<loc>` are dropped; per the spec cap a file yields at most 50,000
  * entries (extras ignored, the parser stays O(input)). Plain-text
  * sitemaps take lines starting `http://`/`https://` (trimmed), no
  * metadata. Malformed priority parses to null, never an error.
  */
object SitemapHelper {

  private val MaxEntries = 50000

  /** Local-name match at tag-open position `i` (just past '<' or
    * '</'): optional `prefix:` skipped, then `word` case-insensitive,
    * then a name-ending char. Returns index past the element name, or
    * -1 on no match.
    */
  private def elemAt(s: String, i: Int, word: String): Int = {
    var k = i
    // skip an XML namespace prefix (letters/digits/._- then ':')
    var p = k
    while (p < s.length && s.charAt(p) != ':' && s.charAt(p) != '>' &&
      s.charAt(p) != '<' && !Character.isWhitespace(s.charAt(p)) &&
      s.charAt(p) != '/') p += 1
    if (p < s.length && s.charAt(p) == ':') k = p + 1
    if (k + word.length > s.length) return -1
    var j = 0
    while (j < word.length) {
      if (Character.toLowerCase(s.charAt(k + j)) != word.charAt(j)) return -1
      j += 1
    }
    val e = k + word.length
    if (e < s.length) {
      val c = s.charAt(e)
      if (!(Character.isWhitespace(c) || c == '>' || c == '/')) return -1
    }
    e
  }

  /** Find the next `<word ...>` open tag whose '<' lies in
    * [from, to); returns index just past its '>' or -1. Skips
    * comments. Bounding by `to` keeps per-entry child lookups O(entry)
    * — an absent optional field must not rescan the rest of the file
    * (50k entries × full-file scans is the quadratic the spec cap is
    * supposed to prevent).
    */
  private def findOpen(s: String, from: Int, to: Int, word: String): Int = {
    var i = from
    while (i >= 0 && i < to) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt >= to || lt + 1 >= s.length) return -1
      if (s.regionMatches(lt + 1, "!--", 0, 3)) {
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) return -1 else end + 3
      } else if (s.charAt(lt + 1) != '/' && elemAt(s, lt + 1, word) >= 0) {
        val gt = s.indexOf('>', lt + 1)
        return if (gt < 0) -1 else gt + 1
      } else i = lt + 1
    }
    -1
  }

  /** Close-tag index (position of '<' of `</word>`) in [from, to), or
    * `to` when never closed there (truncated sitemap: the open entry
    * still yields what it contains).
    */
  private def findClose(s: String, from: Int, to: Int, word: String): Int = {
    var i = from
    while (i < to) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt >= to) return to
      if (lt + 1 < s.length && s.charAt(lt + 1) == '/' &&
        elemAt(s, lt + 2, word) >= 0) return lt
      i = lt + 1
    }
    to
  }

  /** Text content of the first `<word>` child inside [from, to):
    * CDATA unwrapped, entities decoded, trimmed; null when absent.
    */
  private def childText(s: String, from: Int, to: Int, word: String): String = {
    val open = findOpen(s, from, to, word)
    if (open < 0) return null
    val close = findClose(s, open, to, word)
    var raw = s.substring(open, close).trim
    if (raw.startsWith("<![CDATA[")) {
      raw = raw.substring(9)
      val end = raw.indexOf("]]>")
      if (end >= 0) raw = raw.substring(0, end)
      raw = raw.trim
    } else {
      raw = HtmlEntityHelper.decode(UTF8String.fromString(raw)).toString
    }
    if (raw.isEmpty) null else raw
  }

  private def entry(kind: String, loc: String, lastmod: String,
      changefreq: String, priority: String): InternalRow = {
    val pr: Any =
      if (priority == null) null
      else try { java.lang.Double.valueOf(priority.toDouble) }
      catch { case _: NumberFormatException => null }
    InternalRow(
      UTF8String.fromString(loc),
      UTF8String.fromString(kind),
      if (lastmod == null) null else UTF8String.fromString(lastmod),
      if (changefreq == null) null else UTF8String.fromString(changefreq),
      pr)
  }

  /** All sitemap entries in document order — `<url>` children of a
    * urlset as kind `url`, `<sitemap>` children of an index as kind
    * `sitemap`, or plain-text URL lines as kind `url`. Empty array
    * for content with neither; null input → null. Never throws.
    */
  def extract(content: UTF8String): ArrayData = {
    if (content == null) return null
    val s = content.toString
    val out = new java.util.ArrayList[InternalRow]()
    // XML face: scan both element kinds in one pass. Next-match
    // positions are cached per kind (-1 = none remaining) so a pure
    // urlset doesn't rescan the tail for <sitemap> at every entry —
    // total scan work stays O(input) at the spec's 50k-entry cap.
    var sawXml = false
    var i = 0
    val len = s.length
    var nextUrl = findOpen(s, 0, len, "url")
    var nextSm = findOpen(s, 0, len, "sitemap")
    while (i < len && out.size < MaxEntries) {
      if (nextUrl >= 0 && nextUrl < i) nextUrl = findOpen(s, i, len, "url")
      if (nextSm >= 0 && nextSm < i) nextSm = findOpen(s, i, len, "sitemap")
      // sitemapindex's <sitemap> never nests in <url> or vice versa;
      // take whichever comes first
      val (open, word) =
        if (nextUrl < 0 && nextSm < 0) (-1, "")
        else if (nextSm < 0 || (nextUrl >= 0 && nextUrl < nextSm)) (nextUrl, "url")
        else (nextSm, "sitemap")
      if (open < 0) i = len
      else {
        sawXml = true
        val close = findClose(s, open, len, word)
        val loc = childText(s, open, close, "loc")
        if (loc != null) {
          val kind = if (word == "url") "url" else "sitemap"
          out.add(entry(kind, loc,
            childText(s, open, close, "lastmod"),
            childText(s, open, close, "changefreq"),
            if (word == "url") childText(s, open, close, "priority") else null))
        }
        i = math.max(close + 1, open)
      }
    }
    if (!sawXml && s.indexOf('<') < 0) {
      // plain-text sitemap: one URL per line
      var start = 0
      val n = s.length
      while (start < n && out.size < MaxEntries) {
        var end = s.indexOf('\n', start)
        if (end < 0) end = n
        val line = s.substring(start, end).trim
        if (line.regionMatches(true, 0, "http://", 0, 7) ||
          line.regionMatches(true, 0, "https://", 0, 8))
          out.add(entry("url", line, null, null, null))
        start = end + 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `extract_sitemap_urls(content) -> array<struct<loc, kind, lastmod,
  * changefreq, priority>>` — sitemaps.org urlset/sitemapindex/
  * plain-text entries (see [[SitemapHelper.extract]]). `kind` is
  * `url` for leaf entries, `sitemap` for index entries to recurse
  * into. Pair with `url_resolve`/`url_normalize`/`robots_allowed` to
  * seed a crawl frontier.
  */
case class ExtractSitemapUrls(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_sitemap_urls"
  override protected def nullSafeEval(c: Any): Any =
    SitemapHelper.extract(c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SitemapHelper.extract($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractSitemapUrls =
    copy(child = newChild)
}

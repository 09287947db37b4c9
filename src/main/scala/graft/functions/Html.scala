package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hyperlink extraction for web-corpus pipelines: the primitive under
  * outlink/host-graph construction (crawl frontier ranking, PageRank-
  * style host quality weights — the CommonCrawl host-level graph is
  * exactly this operator run at corpus scale). A single-pass scanner
  * rather than a regex so the sloppy-markup cases regexes get wrong
  * stay correct: unquoted `href=/x` values, unpaired quotes elsewhere
  * in the tag, `<a` inside comments or script/style bodies (never
  * links — an `<a href` in a JS string literal must not be extracted,
  * the same rule [[graft.ops.Quality.mainContent]] applies to `<p`).
  */
object HtmlLinkHelper {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Case-insensitive match of `word` at `i`, followed by a character
    * that ends a tag name (whitespace, '>', '/', or EOF) — so
    * `<script` matches but `<scripting` does not.
    */
  private[functions] def tagAt(s: String, i: Int, word: String): Boolean = {
    if (i + word.length > s.length) return false
    var k = 0
    while (k < word.length) {
      val a = Character.toLowerCase(s.charAt(i + k))
      if (a != word.charAt(k)) return false
      k += 1
    }
    val j = i + word.length
    j >= s.length || isWs(s.charAt(j)) || s.charAt(j) == '>' || s.charAt(j) == '/'
  }

  /** Index just past the closing `</word...>`, or the string length
    * when the element is never closed (rest of input skipped — the
    * browser rule for an unterminated script).
    */
  private[functions] def skipRawText(s: String, from: Int, word: String): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && i + 1 < s.length && s.charAt(i + 1) == '/' &&
        tagAt(s, i + 2, word)) {
        val gt = s.indexOf('>', i + 2)
        return if (gt < 0) s.length else gt + 1
      }
      i += 1
    }
    s.length
  }

  /** All `<a href>` values in document order, HTML-entity-decoded
    * ([[HtmlEntityHelper]] — `href="/s?a=1&amp;b=2"` yields
    * `/s?a=1&b=2`), one per anchor tag (the first `href` attribute
    * wins, the HTML duplicate-attribute rule). Comments and
    * script/style bodies are skipped whole. Empty array when the input
    * has no anchors; null input → null. Never throws.
    */
  def extractLinks(html: UTF8String): ArrayData = {
    if (html == null) return null
    val s = html.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = s.length
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) i = n
      else if (s.regionMatches(lt + 1, "!--", 0, 3)) {
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (tagAt(s, lt + 1, "script")) i = skipRawText(s, lt + 1, "script")
      else if (tagAt(s, lt + 1, "style")) i = skipRawText(s, lt + 1, "style")
      else if (tagAt(s, lt + 1, "a")) {
        // attribute scan until the tag's '>' (a '>' inside a quoted
        // value does not end the tag); first href wins
        var j = lt + 2
        var href: String = null
        var open = true
        while (open && j < n) {
          val c = s.charAt(j)
          if (c == '>') { open = false; j += 1 }
          else if (isWs(c) || c == '/') j += 1
          else {
            // attribute name
            val nameStart = j
            while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '=' &&
              s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
            val name = s.substring(nameStart, j)
            while (j < n && isWs(s.charAt(j))) j += 1
            var value: String = null
            if (j < n && s.charAt(j) == '=') {
              j += 1
              while (j < n && isWs(s.charAt(j))) j += 1
              if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                val quote = s.charAt(j)
                val end = s.indexOf(quote, j + 1)
                if (end < 0) { value = s.substring(j + 1); j = n }
                else { value = s.substring(j + 1, end); j = end + 1 }
              } else {
                val valStart = j
                while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
                value = s.substring(valStart, j)
              }
            }
            if (href == null && name.equalsIgnoreCase("href") && value != null)
              href = value
          }
        }
        if (href != null)
          out.add(HtmlEntityHelper.decode(UTF8String.fromString(href)))
        i = j
      } else {
        // any other tag: skip past its '>', honoring quoted values so
        // `<img alt="a>b">` does not end early. A quote only OPENS a
        // value region when it follows '=' (modulo whitespace) — the
        // HTML rule; a bare apostrophe inside an unquoted value
        // (`<p title=don't>`) is value text, not a delimiter (the
        // TagBody sloppy-quote lesson). An unterminated tag consumes
        // the rest (nothing after it can be well-formed).
        var j = lt + 1
        var open = true
        var lastSig = ' ' // last non-whitespace char seen
        while (open && j < n) {
          val c = s.charAt(j)
          if (c == '>') open = false
          else if ((c == '"' || c == '\'') && lastSig == '=') {
            val end = s.indexOf(c, j + 1)
            j = if (end < 0) n - 1 else end
            lastSig = c
          } else if (!isWs(c)) lastSig = c
          j += 1
        }
        i = if (open) n else j
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Anchor extraction with text and rel semantics — the anchor-text
  * corpus seat ([[HtmlLinkHelper.extractLinks]] keeps the bare-href
  * fast path for the link graph): anchor text is a classic ranking /
  * training-data signal (what the web CALLS a page), and `nofollow`
  * decides whether an edge should count in [[graft.ops.Graph.pageRank]]
  * -style weighting. Same scanning discipline as the sibling helpers.
  */
object HtmlAnchorHelper {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** All anchors in document order as
    * `struct<href, text, nofollow>` — href entity-decoded (first
    * attribute occurrence wins), text the anchor's inner text with
    * nested markup stripped, entities decoded and whitespace collapsed
    * (empty → null), nofollow true when the `rel` token list carries
    * it. Anchors without an href are skipped; an unclosed anchor runs
    * to input end. Comments and script/style bodies are skipped whole,
    * inside and outside anchors. Null input → null. Never throws.
    */
  def extractAnchors(html: UTF8String): ArrayData = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) i = n
      else if (s.regionMatches(lt + 1, "!--", 0, 3)) {
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (HtmlLinkHelper.tagAt(s, lt + 1, "script"))
        i = HtmlLinkHelper.skipRawText(s, lt + 1, "script")
      else if (HtmlLinkHelper.tagAt(s, lt + 1, "style"))
        i = HtmlLinkHelper.skipRawText(s, lt + 1, "style")
      else if (HtmlLinkHelper.tagAt(s, lt + 1, "a")) {
        val attrs = new java.util.HashMap[String, String]()
        var j = HtmlMetaHelper.scanAttrs(s, lt + 2, attrs)
        val href = attrs.get("href")
        val rel = attrs.get("rel")
        val nofollow = rel != null &&
          rel.toLowerCase(java.util.Locale.ROOT).split("[\\s,]+")
            .contains("nofollow")
        // inner text to the close tag: nested markup stripped, nested
        // script/style/comments skipped whole
        val text = new java.lang.StringBuilder()
        var open = true
        while (open && j < n) {
          val c = s.charAt(j)
          if (c == '<') {
            if (j + 1 < n && s.charAt(j + 1) == '/' &&
              HtmlLinkHelper.tagAt(s, j + 2, "a")) {
              val gt = s.indexOf('>', j + 2)
              j = if (gt < 0) n else gt + 1
              open = false
            } else if (s.regionMatches(j + 1, "!--", 0, 3)) {
              val end = s.indexOf("-->", j + 4)
              j = if (end < 0) n else end + 3
            } else if (HtmlLinkHelper.tagAt(s, j + 1, "script"))
              j = HtmlLinkHelper.skipRawText(s, j + 1, "script")
            else if (HtmlLinkHelper.tagAt(s, j + 1, "style"))
              j = HtmlLinkHelper.skipRawText(s, j + 1, "style")
            else {
              // nested tag: quote-aware skip, text continues after it
              val gt = {
                var k = j + 1
                var tagOpen = true
                var lastSig = ' '
                while (tagOpen && k < n) {
                  val tc = s.charAt(k)
                  if (tc == '>') tagOpen = false
                  else if ((tc == '"' || tc == '\'') && lastSig == '=') {
                    val end = s.indexOf(tc, k + 1)
                    k = if (end < 0) n - 1 else end
                    lastSig = tc
                  } else if (!isWs(tc)) lastSig = tc
                  k += 1
                }
                if (tagOpen) n else k
              }
              j = gt
            }
          } else { text.append(c); j += 1 }
        }
        if (href != null) {
          val cleanText = HtmlEntityHelper
            .decode(UTF8String.fromString(text.toString)).toString
            .replaceAll("\\s+", " ").trim
          out.add(InternalRow(
            HtmlEntityHelper.decode(UTF8String.fromString(href)),
            if (cleanText.isEmpty) null else UTF8String.fromString(cleanText),
            nofollow))
        }
        i = j
      } else {
        // non-anchor tag: generic quote-aware skip
        var j = lt + 1
        var open = true
        var lastSig = ' '
        while (open && j < n) {
          val c = s.charAt(j)
          if (c == '>') open = false
          else if ((c == '"' || c == '\'') && lastSig == '=') {
            val end = s.indexOf(c, j + 1)
            j = if (end < 0) n - 1 else end
            lastSig = c
          } else if (!isWs(c)) lastSig = c
          j += 1
        }
        i = if (open) n else j
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `extract_anchors(html) -> array<struct<href, text, nofollow>>` —
  * anchors with their text and rel-nofollow verdict (see
  * [[HtmlAnchorHelper.extractAnchors]]). Use `extract_links` when only
  * the href is needed (narrower, cheaper); this face feeds anchor-text
  * corpora and nofollow-aware link-graph weighting.
  */
case class ExtractAnchors(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("nofollow", BooleanType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_anchors"
  override protected def nullSafeEval(html: Any): Any =
    HtmlAnchorHelper.extractAnchors(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlAnchorHelper.extractAnchors($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractAnchors =
    copy(child = newChild)
}

/** Page-metadata extraction — the WAT-record seat of a crawl pipeline
  * (CommonCrawl WAT files carry exactly these head fields next to the
  * outlinks [[HtmlLinkHelper]] extracts): title, meta description,
  * canonical link and the robots-meta noindex verdict, one pass, never
  * throws. Shares [[HtmlLinkHelper]]'s scanning discipline: comments
  * and script/style bodies are skipped whole, attributes parse
  * quote-aware with unquoted values tolerated, first occurrence wins,
  * values entity-decode.
  */
object HtmlMetaHelper {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Attributes of the tag whose name ends at `from` (just past the
    * element name): lowercased names, raw values (null for bare
    * attributes), first occurrence of each name wins. Returns the
    * index just past the tag's '>' (or the input end when
    * unterminated).
    */
  private[functions] def scanAttrs(s: String, from: Int,
      out: java.util.HashMap[String, String]): Int = {
    val n = s.length
    var j = from
    var open = true
    while (open && j < n) {
      val c = s.charAt(j)
      if (c == '>') { open = false; j += 1 }
      else if (isWs(c) || c == '/') j += 1
      else {
        val nameStart = j
        while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '=' &&
          s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
        val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        while (j < n && isWs(s.charAt(j))) j += 1
        var value: String = null
        if (j < n && s.charAt(j) == '=') {
          j += 1
          while (j < n && isWs(s.charAt(j))) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val quote = s.charAt(j)
            val end = s.indexOf(quote, j + 1)
            if (end < 0) { value = s.substring(j + 1); j = n }
            else { value = s.substring(j + 1, end); j = end + 1 }
          } else {
            val valStart = j
            while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
            value = s.substring(valStart, j)
          }
        }
        if (!out.containsKey(name)) out.put(name, value)
      }
    }
    j
  }

  private def decodeClean(v: String): String =
    HtmlEntityHelper.decode(UTF8String.fromString(v)).toString
      .replaceAll("\\s+", " ").trim

  /** `struct<title, description, canonical, noindex>` — first
    * `<title>` text (RCDATA: entity-decoded, whitespace-collapsed),
    * first `<meta name=description content>`, first
    * `<link rel=canonical href>`, and whether any
    * `<meta name=robots>` content carries a `noindex` token. Null
    * fields when absent; noindex defaults false. Never throws.
    */
  def meta(html: UTF8String): InternalRow = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    var title: String = null
    var description: String = null
    var canonical: String = null
    var noindex = false
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) i = n
      else if (s.regionMatches(lt + 1, "!--", 0, 3)) {
        val end = s.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (HtmlLinkHelper.tagAt(s, lt + 1, "script"))
        i = HtmlLinkHelper.skipRawText(s, lt + 1, "script")
      else if (HtmlLinkHelper.tagAt(s, lt + 1, "style"))
        i = HtmlLinkHelper.skipRawText(s, lt + 1, "style")
      else if (HtmlLinkHelper.tagAt(s, lt + 1, "title")) {
        val gt = s.indexOf('>', lt + 1)
        if (gt < 0) i = n
        else {
          // RCDATA runs to the close tag (or input end when truncated)
          var k = gt + 1
          var closeLt = n
          var found = false
          while (!found && k < n) {
            if (s.charAt(k) == '<' && k + 1 < n && s.charAt(k + 1) == '/' &&
              HtmlLinkHelper.tagAt(s, k + 2, "title")) { closeLt = k; found = true }
            else k += 1
          }
          if (title == null) title = decodeClean(s.substring(gt + 1, closeLt))
          val cgt = s.indexOf('>', closeLt)
          i = if (cgt < 0) n else cgt + 1
        }
      } else if (HtmlLinkHelper.tagAt(s, lt + 1, "meta")) {
        val attrs = new java.util.HashMap[String, String]()
        i = scanAttrs(s, lt + 5, attrs)
        val name = attrs.get("name")
        val content = attrs.get("content")
        if (name != null && content != null) {
          if (name.equalsIgnoreCase("description")) {
            if (description == null) description = decodeClean(content)
          } else if (name.equalsIgnoreCase("robots")) {
            val toks = content.toLowerCase(java.util.Locale.ROOT)
              .split("[,\\s]+")
            if (toks.contains("noindex")) noindex = true
          }
        }
      } else if (HtmlLinkHelper.tagAt(s, lt + 1, "link")) {
        val attrs = new java.util.HashMap[String, String]()
        i = scanAttrs(s, lt + 5, attrs)
        val rel = attrs.get("rel")
        val href = attrs.get("href")
        if (rel != null && href != null && canonical == null &&
          rel.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            .contains("canonical"))
          canonical = decodeClean(href)
      } else {
        // other tags: generic quote-aware skip (HtmlLinkHelper rule)
        var j = lt + 1
        var open = true
        var lastSig = ' '
        while (open && j < n) {
          val c = s.charAt(j)
          if (c == '>') open = false
          else if ((c == '"' || c == '\'') && lastSig == '=') {
            val end = s.indexOf(c, j + 1)
            j = if (end < 0) n - 1 else end
            lastSig = c
          } else if (!isWs(c)) lastSig = c
          j += 1
        }
        i = if (open) n else j
      }
    }
    InternalRow(
      if (title == null || title.isEmpty) null else UTF8String.fromString(title),
      if (description == null) null else UTF8String.fromString(description),
      if (canonical == null) null else UTF8String.fromString(canonical),
      noindex)
  }
}

/** `html_meta(html) -> struct<title, description, canonical, noindex>`
  * — page head metadata (see [[HtmlMetaHelper.meta]]): the WAT-record
  * fields next to `extract_links`' outlinks. Null input → null.
  */
case class HtmlMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("noindex", BooleanType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_meta"
  override protected def nullSafeEval(html: Any): Any =
    HtmlMetaHelper.meta(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlMetaHelper.meta($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlMeta =
    copy(child = newChild)
}

/** `extract_links(html) -> array<string>` — `<a href>` values in
  * document order, entity-decoded, comments/script/style skipped (see
  * [[HtmlLinkHelper.extractLinks]]). Pair with `url_resolve` +
  * `url_normalize` + `registered_domain` to build the host-level link
  * graph.
  */
case class ExtractLinks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_links"
  override protected def nullSafeEval(html: Any): Any =
    HtmlLinkHelper.extractLinks(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlLinkHelper.extractLinks($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractLinks =
    copy(child = newChild)
}

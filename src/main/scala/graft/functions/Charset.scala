package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset decoding for crawl payloads backing [[CharsetDecode]] —
  * the step between [[HttpHelper.payload]] and
  * [[graft.ops.Quality.htmlToText]] for the large fraction of real
  * web pages that are NOT UTF-8 (historic CommonCrawl is full of
  * ISO-8859-1 and windows-1252): a `cast(payload as string)` would
  * read those bytes as broken UTF-8 and corrupt every downstream
  * dedup key and quality feature.
  *
  * Detection order (the WHATWG encoding-sniff precedence):
  *   1. a byte-order mark wins outright — UTF-8 (EF BB BF),
  *      UTF-16LE (FF FE), UTF-16BE (FE FF) — and is not emitted;
  *   2. else the `charset=` parameter of the hint (a Content-Type
  *      value like `text/html; charset=ISO-8859-1`, quotes stripped,
  *      case-insensitive), or the whole hint when it IS a bare
  *      charset name (no `/`);
  *   3. else a meta prescan of the first 1024 bytes for an embedded
  *      `charset=` declaration (`<meta charset="x">` or the
  *      http-equiv `content="text/html; charset=x"` form) —
  *      header-less pages declare their encoding in markup, the
  *      common case in real crawls; the scan is ASCII-byte-wise, so
  *      it is safe over any ASCII-superset input;
  *   4. else UTF-8.
  *
  * Never throws (the crawl-data contract): an unknown or unsupported
  * charset name falls back to UTF-8; malformed and unmappable input
  * decodes with U+FFFD replacement, never an exception.
  *
  * Scale shape: a pure per-row scalar inside whole-stage codegen;
  * `Charset.forName` lookups hit a tiny per-JVM cache.
  */
object CharsetHelper {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Per-JVM charset cache: hint strings repeat massively in crawl
    * data (a handful of Content-Type spellings per crawl).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.charset.Charset]()

  private def charsetFor(name: String): java.nio.charset.Charset = {
    val cached = cache.get(name)
    if (cached != null) return cached
    val cs =
      try java.nio.charset.Charset.forName(name)
      catch { case _: Exception => Utf8 }
    if (cache.size < 1024) cache.put(name, cs)
    cs
  }

  /** The charset named by a Content-Type-shaped hint, or null when
    * the hint carries none.
    */
  private def fromHint(hint: String): java.nio.charset.Charset = {
    val lower = hint.trim.toLowerCase(java.util.Locale.ROOT)
    if (lower.isEmpty) return null
    val i = lower.indexOf("charset=")
    if (i >= 0) {
      var j = i + 8
      val sb = new java.lang.StringBuilder(16)
      while (j < lower.length && lower.charAt(j) != ';' && !Character.isWhitespace(lower.charAt(j))) {
        val c = lower.charAt(j)
        if (c != '"' && c != '\'') sb.append(c)
        j += 1
      }
      if (sb.length == 0) null else charsetFor(sb.toString)
    } else if (lower.indexOf('/') < 0) charsetFor(lower) // bare charset name
    else null
  }

  /** WHATWG meta prescan, step 3: find an ASCII `charset=` run in the
    * first 1024 bytes and read the name after it (quotes stripped,
    * terminated by quote/`;`/`>`/whitespace). Byte-wise and
    * case-insensitive — correct over any ASCII-superset encoding,
    * which is every encoding this helper can name.
    */
  private def fromMeta(b: Array[Byte]): java.nio.charset.Charset = {
    val n = math.min(b.length, 1024)
    val pat = "charset="
    var i = 0
    while (i <= n - pat.length) {
      var k = 0
      while (k < pat.length &&
        Character.toLowerCase((b(i + k) & 0xff).toChar) == pat.charAt(k)) k += 1
      if (k == pat.length) {
        var j = i + pat.length
        val sb = new java.lang.StringBuilder(16)
        var stop = false
        while (!stop && j < n && sb.length < 40) {
          val c = (b(j) & 0xff).toChar
          if (c == '"' || c == '\'') { if (sb.length > 0) stop = true }
          else if (c == ';' || c == '>' || c == '/' || Character.isWhitespace(c)) stop = true
          else sb.append(Character.toLowerCase(c))
          j += 1
        }
        if (sb.length > 0) return charsetFor(sb.toString)
      }
      i += 1
    }
    null
  }

  def decode(b: Array[Byte], hint: UTF8String): UTF8String = {
    // BOM wins over any header claim (WHATWG sniff step 1)
    val utf8Bom =
      b.length >= 3 && (b(0) & 0xff) == 0xEF && (b(1) & 0xff) == 0xBB && (b(2) & 0xff) == 0xBF
    val utf16Bom =
      b.length >= 2 && (((b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xFE) ||
        ((b(0) & 0xff) == 0xFE && (b(1) & 0xff) == 0xFF))
    val cs =
      if (utf8Bom) Utf8
      else if (utf16Bom && (b(0) & 0xff) == 0xFF)
        java.nio.charset.StandardCharsets.UTF_16LE
      else if (utf16Bom)
        java.nio.charset.StandardCharsets.UTF_16BE
      else {
        val hinted = if (hint == null) null else fromHint(hint.toString)
        if (hinted != null) hinted
        else {
          val meta = fromMeta(b)
          if (meta == null) Utf8 else meta
        }
      }
    // Skip only a BOM that is actually PRESENT in the bytes: a
    // hint-derived UTF-16 charset with no BOM decodes from offset 0
    // (skipping there would silently drop the first character).
    val bomSkip = if (utf8Bom) 3 else if (utf16Bom) 2 else 0
    // UTF-8 fast path: VALID bytes need no transcode (the dominant
    // crawl case); invalid ones fall through to the replacing decoder
    // so malformed input really does become U+FFFD
    if ((cs eq Utf8) && graft.functions.Utf8.isValid(b, bomSkip))
      return UTF8String.fromBytes(b, bomSkip, b.length - bomSkip)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(b, bomSkip, b.length - bomSkip))
      UTF8String.fromString(out.toString)
    } catch { case _: Exception => UTF8String.fromBytes(b) } // never throw
  }
}

/** `charset_decode(binary[, hint]) -> string` — decode payload bytes
  * under a BOM / Content-Type charset hint (see
  * [[CharsetHelper.decode]]); U+FFFD replacement, never throws. Pair
  * with [[HttpPayload]]:
  * `charset_decode(h.payload, h.content_type)`.
  */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "charset_decode"
  override protected def nullSafeEval(bytes: Any, hint: Any): Any =
    CharsetHelper.decode(bytes.asInstanceOf[Array[Byte]], hint.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.functions.CharsetHelper.decode($b, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharsetDecode =
    copy(left = l, right = r)
}

object CharsetDecode {
  /** Null content_type is the COMMON crawl case (the header is
    * optional) — a null hint must mean "no hint", not a null result,
    * so the public constructors coalesce it to ''.
    */
  def withNullSafeHint(bytes: Expression, hint: Expression): CharsetDecode =
    CharsetDecode(bytes,
      Coalesce(Seq(hint, Literal(UTF8String.fromString(""), StringType))))
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP response-message projection backing [[HttpPayload]] — the
  * downstream half of the WARC walker's raw-emission contract
  * ([[graft.walk.ArchiveWalker]] emits response record bodies
  * headers+payload verbatim; reference: the WARC/HTTP layering of ISO
  * 28500 §6.3 with RFC 9110/9112 message framing). Splits the message
  * at the first blank line, parses the status line and the three
  * framing-relevant headers, reverses `Transfer-Encoding: chunked`
  * framing and the common `Content-Encoding` compressions — the step
  * without which `htmlToText` runs over `HTTP/1.1 200 OK…` header
  * text and a gzip-encoded body never decompresses (the walk-side
  * sniff correctly sees ASCII `HTTP/` and passes the record through
  * raw).
  *
  * Crawl-data contract (the `url_parts` rule): NEVER throw.
  *   - input that does not start with `HTTP/` (requests, warcinfo,
  *     resource records, arbitrary blobs) passes through as
  *     `(null, null, content)` — the projection is total over mixed
  *     record types, so one narrow select handles a whole WARC;
  *   - a malformed status line yields a null status, the headers and
  *     body still parse;
  *   - headers tolerate bare-LF line endings and obsolete line
  *     folding (continuation lines), names case-insensitive;
  *   - missing blank-line terminator (truncated record) → the whole
  *     message is headers, payload is empty;
  *   - `Transfer-Encoding: chunked` is reversed first (RFC 9112 §6.1:
  *     transfer coding is applied last), chunk extensions and
  *     trailers discarded; malformed chunk framing falls back to the
  *     unchunked bytes;
  *   - `Content-Encoding` tokens are then reversed right-to-left:
  *     gzip/x-gzip, deflate (zlib-wrapped per spec, raw-deflate
  *     fallback for the widespread misimplementation), and zstd
  *     (zstd-jni, already on the classpath for the walker's codec
  *     family). An unrecognized coding (`br` — no decoder ships in
  *     this environment — `compress`, anything else) stops the chain
  *     and the payload is returned as decoded so far; any codec
  *     error returns the bytes of the last successful stage;
  *   - decoded output is capped at [[HttpHelper.MaxDecoded]] (256 MiB
  *     per message) — a decompression bomb degrades to its encoded
  *     bytes instead of an executor OOM.
  *
  * Scale shape: a pure per-row scalar inside whole-stage codegen —
  * no shuffle, no state; the per-JVM cost is zero (no tables). The
  * decode allocates only for messages that actually carry a framed
  * or encoded body.
  */
object HttpHelper {

  /** Decoded-payload cap per message: a chunked+gzip bomb degrades to
    * pass-through instead of an executor OOM.
    */
  val MaxDecoded: Int = 256 * 1024 * 1024

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** `(status|null, content_type|null, payload)` for one message; see
    * the object doc for the full contract. Total: any byte array in,
    * never null out, never throws.
    */
  def payload(content: Array[Byte]): InternalRow = {
    if (content.length < 5 || content(0) != 'H' || content(1) != 'T' ||
        content(2) != 'T' || content(3) != 'P' || content(4) != '/')
      return new GenericInternalRow(Array[Any](null, null, content))

    // header/body split: first CRLFCRLF (tolerating bare LF pairs)
    var hdrEnd = content.length
    var bodyStart = content.length
    var i = 0
    var found = false
    while (!found && i < content.length) {
      if (content(i) == '\n') {
        if (i + 2 < content.length && content(i + 1) == '\r' && content(i + 2) == '\n') {
          hdrEnd = i; bodyStart = i + 3; found = true
        } else if (i + 1 < content.length && content(i + 1) == '\n') {
          hdrEnd = i; bodyStart = i + 2; found = true
        }
        // exclude the line's own CR so the last header line (often the
        // status line itself) never carries a trailing '\r'
        if (found && hdrEnd > 0 && content(hdrEnd - 1) == '\r') hdrEnd -= 1
      }
      i += 1
    }
    val headerText = new String(content, 0, hdrEnd, Iso)
    val lines = headerText.split("\r?\n", -1)

    // status line: HTTP/x.y SP 3DIGIT [SP reason]
    var status: Any = null
    if (lines.nonEmpty) {
      val l0 = lines(0)
      val sp = l0.indexOf(' ')
      if (sp > 0) {
        var j = sp + 1
        // sloppy servers emit runs of spaces before the code
        while (j < l0.length && l0.charAt(j) == ' ') j += 1
        var code = 0
        var nd = 0
        while (j < l0.length && nd < 4 && Character.isDigit(l0.charAt(j))) {
          code = code * 10 + (l0.charAt(j) - '0'); j += 1; nd += 1
        }
        val terminated = j >= l0.length || l0.charAt(j) == ' ' || l0.charAt(j) == '\r'
        if (nd == 3 && terminated && code >= 100) status = code
      }
    }

    // the three framing-relevant headers; repeated field lines are
    // one combined comma-separated list (RFC 9110 §5.2), so a second
    // `Content-Encoding:` line appends rather than being dropped;
    // obsolete line folding: continuation lines extend the previous
    // field value (RFC 9112 §5.2)
    var contentType: String = null
    var transferEncoding: String = null
    var contentEncoding: String = null
    var lastName: String = null
    var li = 1
    while (li < lines.length) {
      val line = lines(li)
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (lastName != null) {
          val ext = " " + line.trim
          lastName match {
            case "content-type" => if (contentType != null) contentType += ext
            case "transfer-encoding" => if (transferEncoding != null) transferEncoding += ext
            case "content-encoding" => if (contentEncoding != null) contentEncoding += ext
            case _ => ()
          }
        }
      } else {
        val c = line.indexOf(':')
        if (c > 0) {
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          lastName = name
          name match {
            case "content-type" => if (contentType == null) contentType = value
            case "transfer-encoding" =>
              transferEncoding = if (transferEncoding == null) value else transferEncoding + ", " + value
            case "content-encoding" =>
              contentEncoding = if (contentEncoding == null) value else contentEncoding + ", " + value
            case _ => ()
          }
        } else lastName = null
      }
      li += 1
    }

    var body = java.util.Arrays.copyOfRange(content, math.min(bodyStart, content.length),
      content.length)

    if (transferEncoding != null &&
        tokens(transferEncoding).contains("chunked")) {
      val de = dechunk(body)
      if (de != null) body = de
    }
    if (contentEncoding != null) body = decodeContent(body, contentEncoding)

    new GenericInternalRow(Array[Any](
      status,
      if (contentType == null) null else UTF8String.fromString(contentType),
      body))
  }

  /** Comma-separated header tokens, trimmed + lowercased. */
  private def tokens(v: String): Array[String] =
    v.split(',').map(_.trim.toLowerCase(java.util.Locale.ROOT))

  /** Reverse chunked transfer framing; null on malformed input (the
    * caller keeps the raw bytes). Chunk extensions and trailer fields
    * are discarded per the projection's text-payload purpose.
    */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var p = 0
    while (true) {
      // chunk-size line: hex digits, optional ;extensions, CRLF
      var size = 0L
      var nd = 0
      while (p < b.length && Character.digit(b(p).toChar, 16) >= 0) {
        size = size * 16 + Character.digit(b(p).toChar, 16)
        if (size > MaxDecoded) return null
        p += 1; nd += 1
      }
      if (nd == 0) return null
      while (p < b.length && b(p) != '\n') p += 1 // extensions + CR
      if (p >= b.length) return null
      p += 1 // the LF
      if (size == 0) return out.toByteArray // trailers discarded
      if (p + size > b.length) return null
      out.write(b, p, size.toInt)
      if (out.size() > MaxDecoded) return null
      p += size.toInt
      // chunk-data terminator CRLF (tolerate bare LF)
      if (p < b.length && b(p) == '\r') p += 1
      if (p >= b.length || b(p) != '\n') return null
      p += 1
    }
    null // unreachable
  }

  /** Reverse `Content-Encoding` codings right-to-left; stops at the
    * first unrecognized coding or codec error, returning the bytes as
    * decoded so far. Bounded by [[MaxDecoded]].
    */
  private def decodeContent(body: Array[Byte], encoding: String): Array[Byte] = {
    var cur = body
    val toks = tokens(encoding)
    var t = toks.length - 1
    while (t >= 0) {
      toks(t) match {
        case "" | "identity" => ()
        case "gzip" | "x-gzip" =>
          val d = tryDecode(cur,
            in => new java.util.zip.GZIPInputStream(in, 64 * 1024))
          if (d == null) return cur else cur = d
        case "deflate" =>
          // zlib-wrapped per the spec; raw deflate for the widespread
          // misimplementation (IIS and friends)
          var d = tryDecode(cur,
            in => new java.util.zip.InflaterInputStream(in))
          if (d == null)
            d = tryDecode(cur, in => new java.util.zip.InflaterInputStream(
              in, new java.util.zip.Inflater(true)))
          if (d == null) return cur else cur = d
        case "zstd" =>
          val d = tryDecode(cur, in => new com.github.luben.zstd.ZstdInputStream(in))
          if (d == null) return cur else cur = d
        case _ => return cur // br/compress/unknown: no decoder here
      }
      t -= 1
    }
    cur
  }

  /** Run one codec over `b` with the [[MaxDecoded]] cap; null on any
    * error or overflow.
    */
  private def tryDecode(b: Array[Byte],
      mk: java.io.InputStream => java.io.InputStream): Array[Byte] =
    try {
      val in = mk(new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 16))
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size() > MaxDecoded) return null
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch { case _: Exception => null }
}

/** `http_payload(binary) -> struct<status:int, content_type:string,
  * payload:binary>` — HTTP response-message projection (see
  * [[HttpHelper.payload]]): status line, Content-Type, and the entity
  * payload with chunked framing and gzip/deflate/zstd content codings
  * reversed. Non-HTTP input passes through as `(null, null, input)`;
  * never throws.
  */
case class HttpPayload(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "http_payload"
  override protected def nullSafeEval(content: Any): Any =
    HttpHelper.payload(content.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HttpHelper.payload($c)")
  override protected def withNewChildInternal(newChild: Expression): HttpPayload =
    copy(child = newChild)
}

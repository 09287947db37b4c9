package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL decomposition for web-corpus pipelines (RFC 3986-lite): the
  * primitive under per-domain quota caps ([[graft.ops.Sampling.domainCap]]),
  * URL-keyed exact dedup and crawl-frontier accounting. Hand-rolled
  * rather than `java.net.URI` because real crawl data is full of URLs
  * URI rejects with exceptions — this parser never throws, it returns
  * null for anything without a recognizable `scheme://host` shape and
  * parses the rest permissively.
  */
object UrlHelper {

  /** Suffix data lives in [[Psl]] — a vendored snapshot of the full
    * Mozilla Public Suffix List (exact + wildcard + exception rules,
    * ICANN and private sections), replacing the round-10 inline
    * 36-entry ccSLD shortlist.
    */

  // ASCII-only per RFC 3986 `ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )`
  // — Char.isLetter would admit non-ASCII schemes the grammar (and the
  // q96 oracle regex `[A-Za-z][A-Za-z0-9+.-]*`) rejects
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isSchemeChar(c: Char, first: Boolean): Boolean =
    if (first) isAsciiLetter(c)
    else isAsciiLetter(c) || (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  /** Parse into (scheme, host, port, path, query, fragment) — an
    * InternalRow matching [[UrlParts.dataType]]; null if the value has
    * no `scheme://host` shape. scheme/host are lowercased; userinfo is
    * dropped; port/query/fragment are null when absent; path is the
    * raw (possibly empty) segment between authority and query.
    */
  def parts(url: UTF8String): InternalRow = {
    if (url == null) return null
    val u = url.toString
    val sep = u.indexOf("://")
    if (sep <= 0) return null
    var i = 0
    while (i < sep) {
      if (!isSchemeChar(u.charAt(i), i == 0)) return null
      i += 1
    }
    val scheme = u.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = u.substring(sep + 3)
    var aEnd = rest.length
    var j = 0
    var done = false
    while (j < rest.length && !done) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') { aEnd = j; done = true }
      j += 1
    }
    val auth = rest.substring(0, aEnd)
    val tail = rest.substring(aEnd)
    val at = auth.lastIndexOf('@')
    val hostPort = auth.substring(at + 1)
    var host: String = null
    var port = -1
    // a valid port is 1-5 digits and <= 65535; -1 = not a port (an
    // overlong digit run must NOT throw — the never-throw contract)
    def portOf(s: String): Int =
      if (s.nonEmpty && s.length <= 5 && s.forall(_.isDigit)) {
        val v = s.toInt
        if (v <= 65535) v else -1
      } else -1
    if (hostPort.startsWith("[")) { // IPv6 literal
      val close = hostPort.indexOf(']')
      if (close < 0) return null
      host = hostPort.substring(0, close + 1)
      val after = hostPort.substring(close + 1)
      if (after.startsWith(":")) {
        port = portOf(after.drop(1))
        if (port < 0) return null // malformed authority after the literal
      } else if (after.nonEmpty) return null
    } else {
      val colon = hostPort.lastIndexOf(':')
      val p = if (colon >= 0) portOf(hostPort.substring(colon + 1)) else -1
      if (p >= 0) {
        host = hostPort.substring(0, colon)
        port = p
      } else if (colon >= 0 && colon == hostPort.length - 1) {
        host = hostPort.substring(0, colon) // trailing bare colon
      } else {
        host = hostPort // incl. a non-port digit-run or text after ':'
      }
    }
    if (host.isEmpty) return null
    host = host.toLowerCase(java.util.Locale.ROOT)
    val q = tail.indexOf('?')
    val h = tail.indexOf('#')
    val pathEnd =
      if (q >= 0 && (h < 0 || q < h)) q
      else if (h >= 0) h
      else tail.length
    val path = tail.substring(0, pathEnd)
    val query =
      if (q >= 0 && (h < 0 || q < h))
        tail.substring(q + 1, if (h > q) h else tail.length)
      else null
    val fragment = if (h >= 0) tail.substring(h + 1) else null
    InternalRow(
      UTF8String.fromString(scheme),
      UTF8String.fromString(host),
      if (port >= 0) port else null,
      UTF8String.fromString(path),
      if (query != null) UTF8String.fromString(query) else null,
      if (fragment != null) UTF8String.fromString(fragment) else null)
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: decode triplets
    * whose octet is an unreserved ASCII character, uppercase the hex of
    * every other (reserved or non-ASCII) triplet, copy an invalid `%`
    * (not followed by two hex digits) verbatim — never throw.
    */
  private[graft] def pctNormalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val b = (h << 4) | l
          if (b < 0x80 && isUnreserved(b.toChar)) sb.append(b.toChar)
          else {
            sb.append('%')
            sb.append(Character.toUpperCase(s.charAt(i + 1)))
            sb.append(Character.toUpperCase(s.charAt(i + 2)))
          }
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Default ports stripped by [[normalize]], keyed by scheme. */
  private val DefaultPorts = Map(
    "http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)

  /** URL canonicalization for URL-keyed dedup and frontier accounting —
    * the spellings crawl data uses interchangeably collapse to ONE key:
    *
    *   - scheme and host lowercased (via [[parts]]), userinfo dropped;
    *   - host IDN-folded to punycode (`java.net.IDN.toASCII` — JDK-
    *     shipped public API; fold failure keeps the lowercased host:
    *     never throw), FQDN trailing dot stripped;
    *   - default port stripped (http:80, https:443, ws/wss, ftp:21);
    *   - percent-encoding normalized in path and query
    *     ([[pctNormalize]]: `%7Ex` = `~x`, `%2f` = `%2F`);
    *   - empty path becomes `/`;
    *   - the fragment is DROPPED (never sent to the server — two URLs
    *     differing only there fetch the same resource);
    *   - an empty query (`?` with nothing after) is dropped; a present
    *     query is kept byte-for-byte otherwise (no parameter sorting —
    *     `?a=1&b=2` vs `?b=2&a=1` may be different resources). Opt in
    *     to the crawler convention that treats them as one resource
    *     with `sortQuery = true`: `&`-separated parameters sort by
    *     their full percent-normalized text (duplicates included), so
    *     `?b=2&a=1&a=0` and `?a=1&a=0&b=2` both canonicalize to
    *     `?a=0&a=1&b=2`.
    *
    * Unparseable input (no `scheme://host` shape) returns null, the
    * same contract as [[parts]]. Dot-segment removal (`/a/../b`) is
    * deliberately NOT applied: outside a resolution context it can
    * change which resource a path names on real servers.
    */
  def normalize(url: UTF8String): UTF8String = normalize(url, sortQuery = false)

  def normalize(url: UTF8String, sortQuery: Boolean): UTF8String = {
    val row = parts(url)
    if (row == null) return null
    val scheme = row.getUTF8String(0).toString
    var host = row.getUTF8String(1).toString
    if (host.length > 1 && host.endsWith(".")) host = host.dropRight(1)
    if (!host.startsWith("[")) {
      try {
        val folded = java.net.IDN.toASCII(host)
        host = folded.toLowerCase(java.util.Locale.ROOT)
      } catch { case _: IllegalArgumentException => () }
    }
    val port = if (row.isNullAt(2)) -1 else row.getInt(2)
    val path = pctNormalize(row.getUTF8String(3).toString)
    var query = if (row.isNullAt(4)) null else pctNormalize(row.getUTF8String(4).toString)
    if (sortQuery && query != null && query.indexOf('&') >= 0) {
      val toks = query.split("&", -1)
      java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
      query = String.join("&", toks: _*)
    }
    val sb = new java.lang.StringBuilder(url.numBytes())
    sb.append(scheme).append("://").append(host)
    if (port >= 0 && !DefaultPorts.get(scheme).contains(port))
      sb.append(':').append(port)
    sb.append(if (path.isEmpty) "/" else path)
    if (query != null && query.nonEmpty) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the public
    * Internet Archive / CommonCrawl CDX-index convention): the
    * canonical SORT/PARTITION key for crawl indexes, NOT a fetchable
    * URL ([[normalize]] stays the fetchable canonical form). All URLs
    * of one registered domain share a key prefix, so a crawl index
    * range-partitioned by this key co-locates each domain's records
    * and answers host/domain prefix scans without a shuffle — that is
    * the operator's 100 TB seat.
    *
    * Construction, per the CDX canonicalizer conventions:
    * scheme dropped (http/https collapse), host IDN-folded +
    * lowercased with one leading `www.` label stripped (only when a
    * dot remains — `www.com` is a host, not chrome), labels reversed
    * and comma-joined (`com,example`), a non-default port kept as
    * `:port`, then `)` + percent-normalized path (`/` when empty) +
    * `?` + always-sorted query tokens. Path and query are fully
    * lowercased — the index-matching rule; case-insensitive-server
    * URLs collapse. IPv4 and bracketed IPv6 hosts are kept unreversed
    * (reversing octets would break prefix locality, the archive rule).
    * Fragment dropped. Null for anything unparseable; never throws.
    */
  def surt(url: UTF8String): UTF8String = {
    val row = parts(url)
    if (row == null) return null
    val scheme = row.getUTF8String(0).toString
    var host = row.getUTF8String(1).toString
    if (host.length > 1 && host.endsWith(".")) host = host.dropRight(1)
    if (!host.startsWith("[")) {
      try {
        host = java.net.IDN.toASCII(host).toLowerCase(java.util.Locale.ROOT)
      } catch { case _: IllegalArgumentException => () }
      if (host.startsWith("www.") && host.indexOf('.', 4) >= 0)
        host = host.substring(4)
    }
    val revHost =
      if (host.startsWith("[")) host
      else {
        val labels = host.split("\\.", -1)
        val isIpv4 = labels.length == 4 &&
          labels.forall(l => l.nonEmpty && l.length <= 3 && l.forall(_.isDigit))
        if (isIpv4) host else labels.reverse.mkString(",")
      }
    val port = if (row.isNullAt(2)) -1 else row.getInt(2)
    val path = pctNormalize(row.getUTF8String(3).toString)
      .toLowerCase(java.util.Locale.ROOT)
    var query = if (row.isNullAt(4)) null
      else pctNormalize(row.getUTF8String(4).toString)
        .toLowerCase(java.util.Locale.ROOT)
    if (query != null && query.indexOf('&') >= 0) {
      val toks = query.split("&", -1)
      java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
      query = String.join("&", toks: _*)
    }
    val sb = new java.lang.StringBuilder(url.numBytes())
    sb.append(revHost)
    if (port >= 0 && !DefaultPorts.get(scheme).contains(port))
      sb.append(':').append(port)
    sb.append(')')
    sb.append(if (path.isEmpty) "/" else path)
    if (query != null && query.nonEmpty) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, applied to a path in a
    * resolution context only ([[normalize]] deliberately skips it —
    * see its scaladoc). Iterative over the input, never throws.
    */
  private[graft] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        // pop the last complete segment (back to the previous '/')
        val slash = out.lastIndexOf("/")
        out.setLength(if (slash >= 0) slash else 0)
      } else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (incl. its leading '/') to output
        val from = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', from)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in, 0, next); in = in.substring(next) }
      }
    }
    out.toString
  }

  /** Scheme-prefix length of a reference (`scheme:` per the RFC 3986
    * grammar), or -1 if the reference has none. Used to distinguish
    * absolute references from relative ones without requiring the
    * `://host` shape [[parts]] needs.
    */
  private def schemePrefixLen(s: String): Int = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return if (i > 0) i else -1
      if (!isSchemeChar(c, i == 0)) return -1
      i += 1
    }
    -1
  }

  /** RFC 3986 §5 reference resolution for link extraction: resolve an
    * `<a href>` value against the page URL it appeared on. Covers every
    * reference class real pages use — absolute (`https://h/p`, kept
    * with its path dot-normalized per §5.2.2),
    * network-path (`//h/p`, takes the base scheme),
    * absolute-path (`/p`), relative-path (`../p`, merged per §5.2.3),
    * query-only (`?q`) and fragment-only (`#f`, the base without its
    * fragment plus the new one). Dot segments ARE removed here (§5.2.4
    * mandates it in a resolution context; [[normalize]] outside one
    * skips it, see its scaladoc).
    *
    * Crawl-oriented deviations, both deliberate: a reference with a
    * non-hierarchical scheme (`mailto:`, `javascript:`, `data:`, …)
    * returns null — it is not a fetchable link target, and downstream
    * [[parts]]/[[normalize]] would null it anyway; the base's userinfo
    * is dropped (the [[parts]] contract). Null for a base without the
    * `scheme://host` shape; never throws.
    */
  def resolve(base: UTF8String, ref: UTF8String): UTF8String = {
    if (base == null || ref == null) return null
    val r = ref.toString.trim
    val sp = schemePrefixLen(r)
    if (sp >= 0) {
      // absolute reference: hierarchical → keep, but §5.2.2 applies
      // remove_dot_segments to absolute references too, so
      // `http://h/a/../b` resolves to `http://h/b` and yields the same
      // link-graph key as the equivalent relative form;
      // mailto:/javascript:/data:/… → null (not a fetch target)
      if (!r.regionMatches(sp, "://", 0, 3)) return null
      val authStart = sp + 3
      var pathStart = authStart
      while (pathStart < r.length && {
        val c = r.charAt(pathStart); c != '/' && c != '?' && c != '#'
      }) pathStart += 1
      if (pathStart >= r.length || r.charAt(pathStart) != '/')
        return UTF8String.fromString(r) // no path to dot-normalize
      var pathEnd = pathStart
      while (pathEnd < r.length && {
        val c = r.charAt(pathEnd); c != '?' && c != '#'
      }) pathEnd += 1
      return UTF8String.fromString(
        r.substring(0, pathStart) +
          removeDotSegments(r.substring(pathStart, pathEnd)) +
          r.substring(pathEnd))
    }
    val row = parts(base)
    if (row == null) return null
    val scheme = row.getUTF8String(0).toString
    if (r.startsWith("//")) return UTF8String.fromString(scheme + ":" + r)
    val host = row.getUTF8String(1).toString
    val port = if (row.isNullAt(2)) -1 else row.getInt(2)
    val basePath = row.getUTF8String(3).toString
    val baseQuery = if (row.isNullAt(4)) null else row.getUTF8String(4).toString
    val sb = new java.lang.StringBuilder(base.numBytes() + r.length)
    sb.append(scheme).append("://").append(host)
    if (port >= 0) sb.append(':').append(port)
    // split the reference into path / ?query#fragment halves
    var pEnd = r.length
    var k = 0
    while (k < pEnd) {
      val c = r.charAt(k)
      if (c == '?' || c == '#') pEnd = k
      k += 1
    }
    val rPath = r.substring(0, pEnd)
    val rTail = r.substring(pEnd) // "", "?...", "#...", "?...#..."
    if (rPath.isEmpty) {
      // query-only / fragment-only / empty: keep the base path; keep
      // the base query unless the reference carries its own
      sb.append(basePath)
      if (rTail.startsWith("?")) sb.append(rTail)
      else {
        if (baseQuery != null) sb.append('?').append(baseQuery)
        sb.append(rTail)
      }
    } else {
      val merged =
        if (rPath.charAt(0) == '/') rPath
        else {
          // §5.2.3 merge: base path up to its last '/' (or "/" when the
          // base has an authority and an empty path)
          val slash = basePath.lastIndexOf('/')
          if (slash < 0) "/" + rPath
          else basePath.substring(0, slash + 1) + rPath
        }
      sb.append(removeDotSegments(merged)).append(rTail)
    }
    UTF8String.fromString(sb.toString)
  }

  /** eTLD+1 under the vendored Public Suffix List ([[Psl]]): IP
    * literals pass through, hosts that ARE a public suffix pass
    * through (grouping stays total), everything else keeps public
    * suffix + 1 label. Input is case-canonicalized here (lowercase +
    * FQDN-dot strip) so the grouping key is stable regardless of
    * whether the caller pre-lowercased (r10 ADVICE).
    */
  def registeredDomain(host: UTF8String): UTF8String = {
    if (host == null) return null
    val raw = host.toString.toLowerCase(java.util.Locale.ROOT)
    // canonicalize the FQDN trailing dot FIRST so 'example.com.' and
    // 'example.com' elect the same grouping key
    val hs = if (raw.length > 1 && raw.endsWith(".")) raw.dropRight(1) else raw
    if (hs.startsWith("[") || hs.forall(c => c.isDigit || c == '.'))
      return UTF8String.fromString(hs)
    UTF8String.fromString(Psl.registrableDomain(hs))
  }
}

/** `url_parts(url) -> struct<scheme,host,port,path,query,fragment>` —
  * never-throwing URL decomposition (see [[UrlHelper.parts]]); null
  * for values without a `scheme://host` shape.
  */
case class UrlParts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scheme", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("port", IntegerType, nullable = true),
    StructField("path", StringType, nullable = false),
    StructField("query", StringType, nullable = true),
    StructField("fragment", StringType, nullable = true)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_parts"
  override protected def nullSafeEval(url: Any): Any =
    UrlHelper.parts(url.asInstanceOf[UTF8String])
  // parts() returns null for unparseable input, so the generated code
  // must propagate it into isNull (defineCodeGen would not)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlHelper.parts($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): UrlParts =
    copy(child = newChild)
}

/** `registered_domain(host) -> string` — eTLD+1 election under the
  * vendored Public Suffix List (see [[UrlHelper.registeredDomain]] and
  * [[Psl]]): the key per-domain quota caps and domain-level dedup
  * group on.
  */
/** `url_normalize(url[, sort_query]) -> string` — URL canonicalization
  * for URL-keyed dedup (see [[UrlHelper.normalize]]): case/IDN-folds
  * the authority, strips default ports and fragments, normalizes
  * percent-encoding; with `sort_query = true` (default false) also
  * sorts `&`-separated query parameters, the crawler convention that
  * treats `?a=1&b=2` ≡ `?b=2&a=1`. Null for values without a
  * `scheme://host` shape.
  */
case class UrlNormalize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_normalize"
  override protected def nullSafeEval(url: Any, sortQ: Any): Any =
    UrlHelper.normalize(url.asInstanceOf[UTF8String], sortQ.asInstanceOf[Boolean])
  // normalize() returns null for unparseable input — propagate into
  // isNull (defineCodeGen would not)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s) => s"""
      ${ev.value} = graft.functions.UrlHelper.normalize($c, $s);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlNormalize =
    copy(left = l, right = r)
}

object UrlNormalize {
  def apply(url: Expression): UrlNormalize =
    UrlNormalize(url, org.apache.spark.sql.catalyst.expressions.Literal(false))
}

/** `surt_key(url) -> string` — the SURT crawl-index sort/partition key
  * (see [[UrlHelper.surt]]): `com,example)/path?a=1&b=2`. Range-sort or
  * range-partition a crawl index by this key and each domain's records
  * are contiguous. Null for unparseable input; never throws.
  */
case class SurtKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "surt_key"
  override protected def nullSafeEval(url: Any): Any =
    UrlHelper.surt(url.asInstanceOf[UTF8String])
  // surt() returns null for unparseable input — propagate into isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlHelper.surt($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): SurtKey =
    copy(child = newChild)
}

/** `url_resolve(base, ref) -> string` — RFC 3986 §5 reference
  * resolution (see [[UrlHelper.resolve]]): turns an `<a href>` value
  * into the absolute URL it names on the page `base`. Null for an
  * unparseable base or a non-fetchable reference scheme (`mailto:`,
  * `javascript:`, …); never throws.
  */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_resolve"
  override protected def nullSafeEval(base: Any, ref: Any): Any =
    UrlHelper.resolve(base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  // resolve() returns null for unparseable/non-fetchable input —
  // propagate into isNull (defineCodeGen would not)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = graft.functions.UrlHelper.resolve($b, $r);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlResolve =
    copy(left = l, right = r)
}

case class RegisteredDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "registered_domain"
  override protected def nullSafeEval(host: Any): Any =
    UrlHelper.registeredDomain(host.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlHelper.registeredDomain($c)")
  override protected def withNewChildInternal(newChild: Expression): RegisteredDomain =
    copy(child = newChild)
}

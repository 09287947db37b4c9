package graft

import graft.functions.UrlHelper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** URL decomposition edge cases the q96 oracle fixture cannot reach
  * (garbage, IPv6, IPs, bare colons) — the never-throwing contract.
  */
class UrlSpec extends AnyFunSuite {

  private def p(u: String): Option[(String, String, Option[Int], String, Option[String], Option[String])] =
    Option(UrlHelper.parts(UTF8String.fromString(u))).map { r =>
      val row = r.asInstanceOf[InternalRow]
      (row.getUTF8String(0).toString, row.getUTF8String(1).toString,
        if (row.isNullAt(2)) None else Some(row.getInt(2)),
        row.getUTF8String(3).toString,
        if (row.isNullAt(4)) None else Some(row.getUTF8String(4).toString),
        if (row.isNullAt(5)) None else Some(row.getUTF8String(5).toString))
    }

  private def rd(h: String): String =
    UrlHelper.registeredDomain(UTF8String.fromString(h)).toString

  test("full parse: userinfo dropped, case folded, all parts split") {
    assert(p("HtTpS://User:PW@WWW.Example.CO.UK:8443/a/b?x=1&y=2#frag") ==
      Some(("https", "www.example.co.uk", Some(8443), "/a/b", Some("x=1&y=2"), Some("frag"))))
  }

  test("minimal and partial shapes") {
    assert(p("http://h") == Some(("http", "h", None, "", None, None)))
    assert(p("http://h/") == Some(("http", "h", None, "/", None, None)))
    assert(p("http://h?q") == Some(("http", "h", None, "", Some("q"), None)))
    assert(p("http://h#f") == Some(("http", "h", None, "", None, Some("f"))))
    assert(p("http://h/#f") == Some(("http", "h", None, "/", None, Some("f"))))
    // '?' after '#' belongs to the fragment (RFC 3986 order)
    assert(p("http://h/p#f?notquery") ==
      Some(("http", "h", None, "/p", None, Some("f?notquery"))))
    // empty-but-present query and fragment stay distinct from absent
    assert(p("http://h/p?") == Some(("http", "h", None, "/p", Some(""), None)))
    assert(p("http://h/p#") == Some(("http", "h", None, "/p", None, Some(""))))
  }

  test("ports: numeric split, non-numeric tail stays in host, bare colon dropped") {
    assert(p("http://h:80/x").get._3 == Some(80))
    assert(p("http://h:/x") == Some(("http", "h", None, "/x", None, None)))
    assert(p("http://h:notaport/x").map(_._2) == Some("h:notaport"))
    // a digit run that is not a valid port (overlong or > 65535) must
    // NOT throw — it stays in the host like any non-port tail
    assert(p("http://h:99999999999999/x").map(r => (r._2, r._3)) ==
      Some(("h:99999999999999", None)))
    assert(p("http://h:70000/x").map(r => (r._2, r._3)) == Some(("h:70000", None)))
    assert(p("http://h:65535/x").get._3 == Some(65535))
    // ...but after an IPv6 literal the authority grammar is strict
    assert(p("http://[::1]:99999999999999/") == None)
  }

  test("IPv6 and IPv4 literals") {
    assert(p("http://[2001:db8::1]:8080/x") ==
      Some(("http", "[2001:db8::1]", Some(8080), "/x", None, None)))
    assert(p("http://[2001:db8::1]/x").map(r => (r._2, r._3)) ==
      Some(("[2001:db8::1]", None)))
    assert(p("http://[2001:db8::1") == None) // unterminated literal
    assert(p("http://192.168.0.1/x").map(_._2) == Some("192.168.0.1"))
  }

  test("garbage never throws, returns null") {
    for (u <- Seq("", "no-scheme", "://host", "1http://h", "ht tp://h",
        "http//h", "http://", "http://@", "http://user@", "relative/path?q=1"))
      assert(p(u) == None, u)
  }

  private def nz(u: String): Option[String] =
    Option(UrlHelper.normalize(UTF8String.fromString(u))).map(_.toString)

  test("url_normalize: interchangeable spellings collapse to one key") {
    // case fold + userinfo drop + FQDN dot + default port + unreserved
    // percent-decode + reserved-triplet hex uppercase + empty-query and
    // fragment drop — all at once
    assert(nz("HTTP://User@EXAMPLE.COM.:80/%61%7Eb%2fq?#x") ==
      Some("http://example.com/a~b%2Fq"))
    assert(nz("http://example.com/a~b%2Fq") ==
      Some("http://example.com/a~b%2Fq"))
    // scheme-keyed default ports: stripped only when they match
    assert(nz("https://h:443/") == Some("https://h/"))
    assert(nz("http://h:443/") == Some("http://h:443/"))
    assert(nz("https://h:8443/") == Some("https://h:8443/"))
    // IDN fold: unicode host -> punycode; punycode unchanged
    assert(nz("http://MÜNCHEN.de") == Some("http://xn--mnchen-3ya.de/"))
    assert(nz("http://xn--mnchen-3ya.de/") == Some("http://xn--mnchen-3ya.de/"))
    // empty path becomes '/', present query kept byte-for-byte
    assert(nz("http://h?id=1&t=c%20d") == Some("http://h/?id=1&t=c%20d"))
    // invalid percent triplets copied verbatim, never throw
    assert(nz("http://h/%zz%4") == Some("http://h/%zz%4"))
    // multi-byte UTF-8 octets stay encoded (only unreserved ASCII decodes)
    assert(nz("http://h/%c3%a9") == Some("http://h/%C3%A9"))
    // IPv6 literal: no IDN fold, default-port strip still applies
    assert(nz("http://[2001:DB8::1]:80/x") == Some("http://[2001:db8::1]/x"))
    // unparseable input -> null (same contract as url_parts)
    assert(nz("not a url") == None)
    assert(nz("://host") == None)
  }

  private def nzs(u: String): Option[String] =
    Option(UrlHelper.normalize(UTF8String.fromString(u), sortQuery = true))
      .map(_.toString)

  test("url_normalize sort_query: parameter order collapses, default off") {
    // permuted parameters (duplicate keys included) sort by full token
    assert(nzs("http://h/p?b=2&a=1&a=0") == Some("http://h/p?a=0&a=1&b=2"))
    assert(nzs("http://h/p?a=1&a=0&b=2") == Some("http://h/p?a=0&a=1&b=2"))
    // the default (1-arg) form keeps parameter order byte-for-byte
    assert(nz("http://h/p?b=2&a=1") == Some("http://h/p?b=2&a=1"))
    // sorting happens AFTER percent normalization, so equivalent
    // spellings land in the same sort position
    assert(nzs("http://h/p?t=%63&s=1") == Some("http://h/p?s=1&t=c"))
    // single parameter, empty query, and valueless tokens never throw
    assert(nzs("http://h/p?only=1") == Some("http://h/p?only=1"))
    assert(nzs("http://h/p?") == Some("http://h/p"))
    assert(nzs("http://h/p?b&&a") == Some("http://h/p?&a&b"))
    // idempotent: sorting a sorted query is a no-op
    val once = nzs("http://H/p?z=9&y=8&z=1").get
    assert(nzs(once) == Some(once))
  }

  test("url_normalize is idempotent over fuzzed URL shapes") {
    // canonical output must be a fixed point: normalize(normalize(u))
    // == normalize(u) for every parseable input — a second pass that
    // changes anything means the first didn't canonicalize
    val schemes = Seq("http", "HTTP", "https", "ftp", "svn+ssh", "ws")
    val hosts = Seq("example.com", "EXAMPLE.COM.", "münchen.de",
      "xn--mnchen-3ya.de", "h%41x", "[2001:DB8::1]", "a..b", "h")
    val ports = Seq("", ":80", ":443", ":0", ":8080", ":65535", ":notaport")
    val paths = Seq("", "/", "/a/b", "/%61%7Eb", "/%2f", "/%zz", "/a%4")
    val queries = Seq("", "?", "?q=1", "?t=c%20d", "?%63",
      "?b=2&a=1", "?b=2&a=1&a=0", "?x&&y", "?=v&k=")
    val frags = Seq("", "#f", "#%41")
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val u = schemes(rnd.nextInt(schemes.size)) + "://" +
        (if (rnd.nextBoolean()) "user:pw@" else "") +
        hosts(rnd.nextInt(hosts.size)) + ports(rnd.nextInt(ports.size)) +
        paths(rnd.nextInt(paths.size)) + queries(rnd.nextInt(queries.size)) +
        frags(rnd.nextInt(frags.size))
      nz(u).foreach { n => assert(nz(n) == Some(n), s"not a fixed point: $u -> $n -> ${nz(n)}") }
      // the sort_query variant is a fixed point of BOTH forms: sorting
      // a sorted query changes nothing, and the plain pass must not
      // re-order what sort_query produced
      nzs(u).foreach { n =>
        assert(nzs(n) == Some(n), s"sorted not a fixed point: $u -> $n -> ${nzs(n)}")
        assert(nz(n) == Some(n), s"plain pass moved sorted output: $u -> $n -> ${nz(n)}")
      }
    }
  }

  test("registered_domain: label election under the vendored PSL") {
    assert(rd("www.example.co.uk") == "example.co.uk")
    assert(rd("a.b.c.example.com.au") == "example.com.au")
    assert(rd("www.example.com") == "example.com")
    assert(rd("example.com") == "example.com")
    assert(rd("localhost") == "localhost")
    assert(rd("192.168.0.1") == "192.168.0.1")
    assert(rd("[2001:db8::1]") == "[2001:db8::1]")
    // co.uk itself is a public suffix, not a registrable host — passes
    // through (the grouping key stays total)
    assert(rd("co.uk") == "co.uk")
    // FQDN trailing dot canonicalizes: both spellings elect ONE key
    assert(rd("www.example.com.") == "example.com")
    assert(rd("example.com.") == "example.com")
    assert(rd("192.168.0.1.") == "192.168.0.1")
    // case-canonical regardless of caller pre-lowercasing (r10 ADVICE)
    assert(rd("WWW.Example.CO.UK") == "example.co.uk")
  }

  test("registered_domain: PSL wildcard, exception, private and IDN rules") {
    // wildcard `*.ck`: every <label>.ck is itself a public suffix
    assert(rd("shop.example.ck") == "shop.example.ck")
    assert(rd("www.shop.example.ck") == "shop.example.ck")
    // exception `!www.ck` overrides the wildcard: ps is bare `ck`
    assert(rd("www.ck") == "www.ck")
    assert(rd("foo.www.ck") == "www.ck")
    // nested geo wildcard `*.kawasaki.jp`: <label>.kawasaki.jp is itself
    // a public suffix, so eTLD+1 keeps FOUR labels there...
    assert(rd("ward.kawasaki.jp") == "ward.kawasaki.jp")
    assert(rd("www.ward.kawasaki.jp") == "www.ward.kawasaki.jp")
    // ...except under the exception `!city.kawasaki.jp`
    assert(rd("www.city.kawasaki.jp") == "city.kawasaki.jp")
    // private-section rule `github.io`: pages sites are distinct publishers
    assert(rd("alice.github.io") == "alice.github.io")
    assert(rd("www.alice.github.io") == "alice.github.io")
    assert(rd("blog.blogspot.com") == "blog.blogspot.com")
    // multi-label exact ICANN rule beyond the old shortlist
    assert(rd("example.pvt.k12.ma.us") == "example.pvt.k12.ma.us")
    assert(rd("www.example.pvt.k12.ma.us") == "example.pvt.k12.ma.us")
    // unicode rule indexed under its punycode form (公司.cn = xn--55qx5d.cn)
    assert(rd("foo.xn--55qx5d.cn") == "foo.xn--55qx5d.cn")
    assert(rd("bar.foo.xn--55qx5d.cn") == "foo.xn--55qx5d.cn")
    // bare TLD under the default `*` rule passes through
    assert(rd("com") == "com")
  }

  private def surt(u: String): String = {
    val r = UrlHelper.surt(UTF8String.fromString(u))
    if (r == null) null else r.toString
  }

  test("surt: host reversal, www strip, scheme collapse, sorted lowercased query") {
    assert(surt("http://www.Example.COM/Path?B=2&a=1") ==
      "com,example)/path?a=1&b=2")
    // https collapses to the same key — the CDX matching point
    assert(surt("https://example.com/Path?a=1&b=2") ==
      "com,example)/path?a=1&b=2")
    // default port dropped, non-default kept after the reversed host
    assert(surt("http://example.com:80/x") == "com,example)/x")
    assert(surt("http://example.com:8080/x") == "com,example:8080)/x")
    // deep host: labels fully reversed -> domain prefix locality
    assert(surt("http://a.b.example.co.uk/") == "uk,co,example,b,a)/")
    // empty path -> "/", fragment dropped
    assert(surt("http://example.com?q=1#frag") == "com,example)/?q=1")
  }

  test("surt: www strip only when a dot remains; IPs stay unreversed") {
    assert(surt("http://www.com/x") == "com,www)/x")
    assert(surt("http://www.example.com/x") == "com,example)/x")
    assert(surt("http://192.168.1.10/x") == "192.168.1.10)/x")
    assert(surt("http://[2001:db8::1]:8080/x") == "[2001:db8::1]:8080)/x")
    // 4 dotted labels that are NOT an IPv4 (length > 3) still reverse
    assert(surt("http://1234.5.6.7/x") == "7,6,5,1234)/x")
  }

  test("surt: IDN folds to punycode; unparseable input is null") {
    assert(surt("http://Bücher.example/x") == "example,xn--bcher-kva)/x")
    assert(surt("not a url") == null)
    assert(surt("mailto:a@b.com") == null)
  }

  test("surt keys sort domains contiguously") {
    val keys = Seq(
      "http://b.example.com/z", "http://other.org/a",
      "http://example.com/a", "http://a.example.com/q").map(surt).sorted
    // all example.com hosts share the com,example prefix and group
    assert(keys == Seq("com,example)/a", "com,example,a)/q",
      "com,example,b)/z", "org,other)/a"))
  }
}

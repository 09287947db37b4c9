package graft

import graft.functions.{EntropyHelper, HashingHelper, HttpHelper, Utf8, VecHelper}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Pure-helper unit tests for the custom expression layer (no Spark
  * session — these are the functions generated code calls).
  */
class FunctionsSpec extends AnyFunSuite {

  test("utf8: accepts valid sequences") {
    for (s <- Seq("", "ascii", "héllo", "日本語", "", "a\u0000b", "🌍 emoji"))
      assert(Utf8.isValid(s.getBytes("UTF-8")), s)
  }

  test("utf8: rejects invalid sequences (reference simdutf8 parity)") {
    val bad = Seq(
      Array(0x80.toByte),                          // bare continuation
      Array(0xc0.toByte, 0xaf.toByte),             // overlong 2-byte
      Array(0xe0.toByte, 0x80.toByte, 0x80.toByte),// overlong 3-byte
      Array(0xed.toByte, 0xa0.toByte, 0x80.toByte),// UTF-16 surrogate
      Array(0xf4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte), // > U+10FFFF
      Array(0xf5.toByte),                          // invalid lead
      Array(0xc2.toByte),                          // truncated 2-byte
      Array(0xe1.toByte, 0x80.toByte),             // truncated 3-byte
      "ok".getBytes ++ Array(0xff.toByte))
    bad.foreach(b => assert(!Utf8.isValid(b), b.map(x => f"${x & 0xff}%02x").mkString))
  }

  test("tokenize: lowercase alphanumeric runs") {
    assert(HashingHelper.tokenize("Hello, World! 42x").toSeq == Seq("hello", "world", "42x"))
    assert(HashingHelper.tokenize("").isEmpty)
    assert(HashingHelper.tokenize("!!!").isEmpty)
  }

  test("minhash: deterministic, width-sensitive, similarity-monotone") {
    def sig(s: String) = {
      val a = HashingHelper.minHashSignature(UTF8String.fromString(s), 64, 3)
      (0 until a.numElements()).map(a.getLong)
    }
    val base = "the quick brown fox jumps over the lazy dog and then some more words"
    assert(sig(base) == sig(base)) // deterministic
    val near = base + " tail"
    val far = "entirely unrelated text about database engines and parquet files here"
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sig(base), sig(near)) > agree(sig(base), sig(far)))
    // short text => sentinel signature
    assert(sig("one two").forall(_ == Long.MaxValue))
  }

  test("simhash: identical texts equal; near texts close in hamming") {
    def h(s: String) = HashingHelper.simHash64(UTF8String.fromString(s))
    val base = "the quick brown fox jumps over the lazy dog repeatedly every day"
    assert(h(base) == h(base))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(base), h(base + " extra")) < ham(h(base), h("nothing in common with that sentence at all")))
  }

  test("winnow: deterministic, collapses duplicates, empty under k") {
    def w(s: String) = {
      val a = HashingHelper.winnow(UTF8String.fromString(s), 9, 4)
      (0 until a.numElements()).map(a.getLong)
    }
    val t = "some reasonably long text for fingerprinting purposes"
    assert(w(t) == w(t))
    assert(w(t).nonEmpty)
    assert(w("short").isEmpty) // joined tokens < k
  }

  test("wordShingles: distinct, ordered, under-width empty") {
    def sh(s: String, w: Int) = {
      val a = HashingHelper.wordShingles(UTF8String.fromString(s), w)
      (0 until a.numElements()).map(a.getUTF8String(_).toString)
    }
    assert(sh("a b c d a b c d", 3) == Seq("a b c", "b c d", "c d a", "d a b"))
    assert(sh("a b", 3).isEmpty)
    assert(sh("A! b? C.", 2) == Seq("a b", "b c"))
  }

  test("vec dot: sequential double fold, mixed float/double") {
    val f = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    val d = new GenericArrayData(Array[Any](0.5, 0.25, 2.0))
    // floats read via getFloat, doubles via getDouble
    val fa = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    assert(VecHelper.dot(fa, d, true, false) == 1.0 * 0.5 + 2.0 * 0.25 + 3.0 * 2.0)
    assert(VecHelper.dot(d, d, false, false) == 0.25 + 0.0625 + 4.0)
    // matches a manual left fold exactly
    val xs = Array(0.1, 0.2, 0.3, 0.7)
    val arr = new GenericArrayData(xs.map(_.asInstanceOf[Any]))
    var acc = 0.0
    xs.foreach(x => acc += x * x)
    assert(VecHelper.dot(arr, arr, false, false) == acc)
  }

  test("httpPayload: header split, status line, content-type") {
    def p(s: String) = HttpHelper.payload(s.getBytes("ISO-8859-1"))
    val r = p("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\nServer: x\r\n\r\nhello")
    assert(r.getInt(0) == 200)
    assert(r.getUTF8String(1).toString == "text/html; charset=UTF-8")
    assert(new String(r.getBinary(2), "UTF-8") == "hello")
    // non-HTTP input passes through whole: (null, null, content)
    val req = "GET /q HTTP/1.1\r\nHost: t\r\n\r\n"
    val r2 = p(req)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
    assert(new String(r2.getBinary(2), "ISO-8859-1") == req)
    // malformed status line: null status, body still split off
    val r3 = p("HTTP/banana\r\nContent-Type: a/b\r\n\r\nbody")
    assert(r3.isNullAt(0))
    assert(r3.getUTF8String(1).toString == "a/b")
    assert(new String(r3.getBinary(2), "UTF-8") == "body")
    // truncated message (no blank line): headers parse, empty payload
    val r4 = p("HTTP/1.1 204 No Content\r\nContent-Type: a/b")
    assert(r4.getInt(0) == 204)
    assert(r4.getUTF8String(1).toString == "a/b")
    assert(r4.getBinary(2).length == 0)
    // bare-LF header lines (sloppy servers)
    val r5 = p("HTTP/1.0 301 Moved\nContent-Type: t/x\n\nB")
    assert(r5.getInt(0) == 301 && r5.getUTF8String(1).toString == "t/x")
    assert(new String(r5.getBinary(2), "UTF-8") == "B")
    // obsolete line folding extends the field value
    val r6 = p("HTTP/1.1 200 OK\r\nContent-Type: text/plain;\r\n charset=utf-8\r\n\r\nx")
    assert(r6.getUTF8String(1).toString == "text/plain; charset=utf-8")
    // 2-digit and 4-digit "status" codes are malformed -> null
    assert(p("HTTP/1.1 20 OK\r\n\r\nx").isNullAt(0))
    assert(p("HTTP/1.1 2000 OK\r\n\r\nx").isNullAt(0))
    // sloppy extra spaces before the code still parse; HTTP/2 shape too
    assert(p("HTTP/1.1  502 Bad\r\n\r\nx").getInt(0) == 502)
    assert(p("HTTP/2 200\r\n\r\nx").getInt(0) == 200)
    // empty input and tiny input never throw
    assert(p("").getBinary(2).length == 0)
    assert(new String(p("HT").getBinary(2), "UTF-8") == "HT")
  }

  test("httpPayload: chunked framing + content codings decode") {
    def p(b: Array[Byte]) = HttpHelper.payload(b)
    def msg(hdrs: String, body: Array[Byte]): Array[Byte] =
      (hdrs + "\r\n").getBytes("ISO-8859-1") ++ body
    // chunked: sizes in hex, an extension, discarded trailers
    val chunked = msg(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n",
      "5\r\nhello\r\n6;ext=1\r\n world\r\n0\r\nX-Trailer: t\r\n\r\n".getBytes("ISO-8859-1"))
    assert(new String(p(chunked).getBinary(2), "UTF-8") == "hello world")
    // malformed chunk framing falls back to the raw body bytes
    val badChunk = msg(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n",
      "ZZ\r\noops".getBytes("ISO-8859-1"))
    assert(new String(p(badChunk).getBinary(2), "UTF-8") == "ZZ\r\noops")
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close(); bo.toByteArray
    }
    // gzip content coding
    val gzm = msg("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n", gz("gz body"))
    assert(new String(p(gzm).getBinary(2), "UTF-8") == "gz body")
    // chunked transfer OVER gzip content coding: chunking reversed first
    val gzBytes = gz("both layers")
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(f"${gzBytes.length}%x\r\n".getBytes("ISO-8859-1"))
    frame.write(gzBytes); frame.write("\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
    val both = msg(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
      frame.toByteArray)
    assert(new String(p(both).getBinary(2), "UTF-8") == "both layers")
    // deflate: zlib-wrapped and raw both decode
    def deflate(s: String, raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val dm1 = msg("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n", deflate("zlib body", raw = false))
    assert(new String(p(dm1).getBinary(2), "UTF-8") == "zlib body")
    val dm2 = msg("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n", deflate("raw body", raw = true))
    assert(new String(p(dm2).getBinary(2), "UTF-8") == "raw body")
    // zstd content coding (zstd-jni, the walker's codec family)
    val zo = new java.io.ByteArrayOutputStream()
    val zs = new com.github.luben.zstd.ZstdOutputStream(zo)
    zs.write("zstd body".getBytes("UTF-8")); zs.close()
    val zm = msg("HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n", zo.toByteArray)
    assert(new String(p(zm).getBinary(2), "UTF-8") == "zstd body")
    // unknown coding (br): payload returned as-is, never a throw
    val bm = msg("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n", "OPAQUE".getBytes("UTF-8"))
    assert(new String(p(bm).getBinary(2), "UTF-8") == "OPAQUE")
    // corrupt gzip: falls back to the encoded bytes
    val cm = msg("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n", "notgzip".getBytes("UTF-8"))
    assert(new String(p(cm).getBinary(2), "UTF-8") == "notgzip")
  }

  test("httpPayload: coding round-trip + never-throws fuzz (seeded)") {
    val rnd = new java.util.Random(42)
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close(); bo.toByteArray
    }
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val buf = new Array[Byte](b.length + 64); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def zstd(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bo); z.write(b); z.close(); bo.toByteArray
    }
    def chunk(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      var off = 0
      while (off < b.length) {
        val n = math.min(1 + rnd.nextInt(97), b.length - off)
        bo.write(f"$n%x\r\n".getBytes("ISO-8859-1"))
        bo.write(b, off, n); bo.write("\r\n".getBytes("ISO-8859-1"))
        off += n
      }
      bo.write("0\r\n\r\n".getBytes("ISO-8859-1")); bo.toByteArray
    }
    // round-trip: random binary payloads through every coding stack
    // must decode back bit-exact
    (0 until 200).foreach { i =>
      val payload = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(payload)
      val (hdr, body) = rnd.nextInt(6) match {
        case 0 => ("", payload)
        case 1 => ("Content-Encoding: gzip\r\n", gz(payload))
        case 2 => ("Content-Encoding: deflate\r\n", zlib(payload))
        case 3 => ("Content-Encoding: zstd\r\n", zstd(payload))
        case 4 => ("Transfer-Encoding: chunked\r\n", chunk(payload))
        case _ => ("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
          chunk(gz(payload)))
      }
      val msg = s"HTTP/1.1 200 OK\r\n${hdr}\r\n".getBytes("ISO-8859-1") ++ body
      val r = HttpHelper.payload(msg)
      assert(r.getInt(0) == 200)
      assert(java.util.Arrays.equals(r.getBinary(2), payload), s"round-trip $i")
    }
    // never-throws: arbitrary bytes, and arbitrary garbage behind a
    // real-looking HTTP prefix (the crawl-data contract)
    (0 until 2000).foreach { i =>
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      val b =
        if (i % 3 == 0) junk
        else if (i % 3 == 1) "HTTP/".getBytes("ISO-8859-1") ++ junk
        else ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
          "Content-Encoding: gzip\r\n\r\n").getBytes("ISO-8859-1") ++ junk
      val r = HttpHelper.payload(b)
      assert(r != null && !r.isNullAt(2))
      if (i % 3 == 0 && !(junk.length >= 5 && junk(0) == 'H' && junk(1) == 'T' &&
          junk(2) == 'T' && junk(3) == 'P' && junk(4) == '/'))
        assert(java.util.Arrays.equals(r.getBinary(2), junk)) // pass-through
    }
  }

  test("charsetDecode: BOM precedence, hints, replacement — never throws") {
    import graft.functions.CharsetHelper
    def d(b: Array[Byte], hint: String): String =
      CharsetHelper.decode(b, if (hint == null) null else UTF8String.fromString(hint)).toString
    // header charset decodes the quirk ranges
    assert(d("café".getBytes("ISO-8859-1"), "text/html; charset=ISO-8859-1") == "café")
    assert(d(Array[Byte](0x93.toByte, 'q', 0x94.toByte), "text/html; charset=windows-1252")
      == "“q”")
    // a BOM beats a lying Content-Type header; the BOM is not emitted
    assert(d("﻿bom".getBytes("UTF-8"), "text/plain; charset=iso-8859-1") == "bom")
    assert(d(Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "ab".getBytes("UTF-16LE"), null) == "ab")
    assert(d(Array[Byte](0xFE.toByte, 0xFF.toByte) ++ "ab".getBytes("UTF-16BE"), "x/y") == "ab")
    // malformed UTF-8 really becomes U+FFFD (no raw-byte leak)
    assert(d(Array[Byte]('o', 'k', ' ', 0xC3.toByte, '('), null) == "ok �(")
    // unknown charset name, bare-name hint, quoted parameter, null hint
    assert(d("é".getBytes("UTF-8"), "text/html; charset=klingon-8") == "é")
    assert(d("café".getBytes("ISO-8859-1"), "iso-8859-1") == "café")
    assert(d("日本".getBytes("Shift_JIS"), "text/html; charset=\"Shift_JIS\"") == "日本")
    assert(d("ü".getBytes("UTF-8"), null) == "ü")
    // empty bytes, empty hint: fine
    assert(d(Array.empty[Byte], "") == "")
    // WHATWG step-3 meta prescan: markup declares the encoding when
    // the header doesn't; the header still beats meta when present
    assert(d("<meta charset=\"iso-8859-1\">café".getBytes("ISO-8859-1"), "text/html")
      == "<meta charset=\"iso-8859-1\">café")
    assert(d(("<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">"
      .getBytes("US-ASCII") ++ Array[Byte](0x97.toByte)), null)
      .endsWith("—"))
    assert(d("café <meta charset=\"utf-8\">".getBytes("ISO-8859-1"),
      "text/html; charset=iso-8859-1") == "café <meta charset=\"utf-8\">")
    // the prescan reads only the first 1024 bytes
    val far = (" " * 1100) + "<meta charset=\"iso-8859-1\">"
    assert(d(far.getBytes("US-ASCII") ++ "é".getBytes("UTF-8"), null).endsWith("é"))
  }

  test("bpeEncodeCount: rank-priority merges, unseen chars, cache, empties") {
    import graft.functions.BpeHelper
    def c(s: String): Long = BpeHelper.countTokens(UTF8String.fromString(s))
    // stability: common corpus words merge to ONE token each
    assert(c("the") == 1L)
    assert(c("the of and to in") == 5L)
    // rank priority: counts must be reproducible and match the
    // independent reference (tools/train_bpe.py --cases)
    assert(c("the quick brown fox jumps over the lazy dog") == 23L)
    assert(c("aaaaaa thththth") == 11L)
    // case sensitivity: capitals were never seen in training
    assert(c("THE The the") == 6L)
    // unseen characters stay single symbols (never throw)
    assert(c("zqxj zzzzqqqq") == 12L)
    // whitespace never tokenizes; empty is zero
    assert(c("") == 0L)
    assert(c("   \t\n ") == 0L)
    // repeated calls hit the word cache and stay consistent
    assert(c("the of and to in") == 5L)
    // monotonicity sanity: concatenating pre-tokens adds counts
    assert(c("data pipeline") == c("data") + c("pipeline"))
  }

  test("charsetDecode: hint-derived UTF-16 without a BOM keeps the first char (r12 ADVICE)") {
    import graft.functions.CharsetHelper
    def d(b: Array[Byte], hint: String): String =
      CharsetHelper.decode(b, if (hint == null) null else UTF8String.fromString(hint)).toString
    // no BOM in the bytes: decode from offset 0 — "ab", not "b"
    assert(d("ab".getBytes("UTF-16LE"), "text/html; charset=utf-16le") == "ab")
    assert(d("ab".getBytes("UTF-16BE"), "text/html; charset=utf-16be") == "ab")
    // a real BOM is still consumed when the charset is also hinted
    assert(d(Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "ab".getBytes("UTF-16LE"),
      "text/html; charset=utf-16le") == "ab")
    assert(d(Array[Byte](0xFE.toByte, 0xFF.toByte) ++ "ab".getBytes("UTF-16BE"),
      "text/html; charset=utf-16be") == "ab")
  }

  test("httpPayload: repeated field lines combine per RFC 9110 §5.2 (r12 ADVICE)") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.close(); bo.toByteArray
    }
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(b); d.finish()
      val buf = new Array[Byte](b.length + 64); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    // deflate applied first, then gzip, each on its OWN field line:
    // the two lines are one combined list, so both codings reverse
    val payload = "combined list".getBytes("UTF-8")
    val head = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\nContent-Encoding: gzip\r\n\r\n"
    val msg = head.getBytes("ISO-8859-1") ++ gz(zlib(payload))
    val r = graft.functions.HttpHelper.payload(msg)
    assert(new String(r.getBinary(2), "UTF-8") == "combined list")
    // same for Transfer-Encoding: a second line adding "chunked" still dechunks
    def chunk(b: Array[Byte]): Array[Byte] =
      (f"${b.length}%x\r\n".getBytes("ISO-8859-1")) ++ b ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    val head2 = "HTTP/1.1 200 OK\r\nTransfer-Encoding: identity\r\nTransfer-Encoding: chunked\r\n\r\n"
    val r2 = graft.functions.HttpHelper.payload(head2.getBytes("ISO-8859-1") ++ chunk(payload))
    assert(new String(r2.getBinary(2), "UTF-8") == "combined list")
  }

  test("charEntropy: codepoint histogram, pinned fold order, edge cases") {
    def e(s: String) = EntropyHelper.charEntropy(UTF8String.fromString(s))
    // independently computed (python math.log, codepoint-sorted fold)
    assert(e("abcaab") == 1.0114042647073516)
    assert(e("ab") == 0.6931471805599453) // ln 2
    assert(e("hello world") == 1.9722469794234416)
    // degenerate tails: empty and single-symbol both +0.0 (never -0.0)
    assert(java.lang.Double.doubleToRawLongBits(e("")) == 0L)
    assert(java.lang.Double.doubleToRawLongBits(e("aaaa")) == 0L)
    // surrogate pair counts as ONE character (codepoint-wise split)
    assert(e("😀😀a") == 0.6365141682948128)
    // order invariance of the histogram (fold order is by codepoint,
    // not occurrence): permutations score identically, bit-for-bit
    assert(e("abcaab") == e("baacba"))
  }

  test("script_ratios: script fractions over letters only, codepoint-wise") {
    import org.apache.spark.sql.catalyst.InternalRow
    def r(t: String): (Seq[Double], Long) = {
      val row = graft.functions.ScriptHelper
        .ratios(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .asInstanceOf[InternalRow]
      ((0 until 6).map(row.getDouble), row.getLong(6))
    }
    // 2 latin + 1 cyrillic + 1 han + 1 greek; digits/punct don't count
    val (f, n) = r("ab \u0431\u4e2d\u03c9 12!")
    assert(n == 5L)
    assert(f == Seq(0.4, 0.2, 0.2, 0.0, 0.2, 0.0))
    // hiragana/katakana/hangul fold into cjk; arabic counted
    val (f2, n2) = r("\u3042\u30ab\uac00\u0627")
    assert(n2 == 4L && f2(2) == 0.75 && f2(3) == 0.25)
    // supplementary-plane Han counts once (surrogate pair)
    val (f3, n3) = r(new String(Character.toChars(0x20000)) + "a")
    assert(n3 == 2L && f3(2) == 0.5 && f3(0) == 0.5)
    // all non-letters: zero fractions, zero letters, no NaN
    val (f4, n4) = r("123 !?")
    assert(n4 == 0L && f4.forall(_ == 0.0))
    assert(graft.functions.ScriptHelper.ratios(null) == null)
  }

  test("l2sqSlice: negative start clamps to 0, never reads out of bounds") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val v = new GenericArrayData(Array[Double](1, 2, 3, 4))
    val c = new GenericArrayData(Array[Double](1, 2))
    assert(VecHelper.l2sqSlice(v, c, -4, vFloat = false, cFloat = false) ==
      VecHelper.l2sqSlice(v, c, 0, vFloat = false, cFloat = false))
    // start past the end contributes nothing
    assert(VecHelper.l2sqSlice(v, c, 9, vFloat = false, cFloat = false) == 0.0)
  }

  test("AnnHelper: encode ties to the smaller index; adc mirrors element_at-miss as null") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.AnnHelper
    // m=2, ks=2, dsub=2; second subspace's entries are EQUIDISTANT
    // from the vector slice -> the tie must go to index 0 (the
    // least(struct(d, j)) rule the unrolled form had)
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(2.0, 4.0), Array(4.0, 2.0)))
    val v = new GenericArrayData(Array[Double](0.9, 0.9, 3.0, 3.0))
    val code = AnnHelper.encode(v, vFloat = false, cb)
    assert(code.toIntArray().toSeq == Seq(1, 0))
    // adc: in-range codes sum their lookups in subspace order
    val lut = Array(Array(0.5, 2.5), Array(10.0, 20.0))
    assert(AnnHelper.adc(new GenericArrayData(Array(1, 0)), lut) == 2.5 + 10.0)
    // out-of-range or null code slots -> null (the element_at-miss
    // rule), never an exception or a skipped term
    assert(AnnHelper.adc(new GenericArrayData(Array(1, 5)), lut) == null)
    assert(AnnHelper.adc(new GenericArrayData(Array[Integer](1, null)), lut) == null)
    assert(AnnHelper.adc(new GenericArrayData(Array(1)), lut) == null)
    // by-cell faces: a cell outside the probed set -> null (the
    // CASE-with-no-else rule — unreachable after the isin filter)
    assert(AnnHelper.adcByCell(7L, new GenericArrayData(Array(1, 0)),
      Array(3L), Array(lut)) == null)
    assert(AnnHelper.adcByCell(3L, new GenericArrayData(Array(1, 0)),
      Array(3L), Array(lut)) == 12.5)
    assert(AnnHelper.encodeByCell(9L, v, vFloat = false,
      Array(3L), Array(cb)) == null)
    // minDist = the argmin distances themselves, summed in order
    val md = AnnHelper.minDist(v, vFloat = false, cb)
    val exp = (0.1 * 0.1 + 0.1 * 0.1) + ((3.0 - 2.0) * (3.0 - 2.0) + (3.0 - 4.0) * (3.0 - 4.0))
    assert(math.abs(md - exp) < 1e-12, s"$md vs $exp")
  }

  test("fixMojibake: single/double/CP1252 repair, legacy text untouched") {
    def f(s: String) =
      graft.functions.MojibakeHelper.fix(UTF8String.fromString(s)).toString
    // single-encoded: UTF-8 e-acute read as Latin-1
    assert(f("cafÃ©") == "café")
    // double-encoded repairs twice
    assert(f("ÃÂ©") == "é")
    // CP1252 smart quote: E2 80 9C read as windows-1252
    assert(f("qâ€œx") == "q“x")
    // CP1252 euro + en-dash mojibake of a 3-byte char: E2 82 AC (euro
    // itself read as cp1252) -> repaired back to one euro sign
    assert(f("â‚¬5") == "€5")
    // GENUINE legacy text must pass through: the re-encoding of a bare
    // n-tilde before ASCII is invalid UTF-8
    assert(f("señor") == "señor")
    // pure ASCII, CJK (unmappable chars), and already-repaired text
    // are all fixed points
    assert(f("plain ascii") == "plain ascii")
    assert(f("日本語") == "日本語")
    assert(f(f("cafÃ©")) == f("cafÃ©"))
    // a mojibake string ending mid-sequence is invalid -> untouched
    assert(f("cafÃ") == "cafÃ")
    assert(f("") == "")
    // never-throws + fixed-point fuzz: arbitrary code-point soup (BMP
    // incl. controls/surrogate-adjacent + supplementary) repairs or
    // passes through, and the result is itself a fixed point (<= 3
    // passes exhausts any chain the all-or-nothing rule accepts)
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val n = rnd.nextInt(24)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => sb.append((rnd.nextInt(0x60) + 0x20).toChar)   // ascii
          case 1 => sb.append((rnd.nextInt(0x100)).toChar)         // latin-1 range
          case 2 => sb.append((rnd.nextInt(0x2500) + 0x100).toChar) // BMP letters/punct
          case _ => sb.appendAll(Character.toChars(0x10000 + rnd.nextInt(0x100)))
        }
      }
      val s = sb.toString
      val once = f(s)
      assert(f(once) == once, s"not a fixed point: ${s.map(_.toInt)}")
    }
  }
}

package graft.functions

import graft.core.FormatKind
import graft.io.Sniff
import graft.walk.AsciiStrings
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from generated code (whole-stage codegen
  * emits Java that calls these via the objects' static forwarders).
  */
object Utf8 {
  /** Strict UTF-8 validation (RFC 3629): rejects overlongs, surrogates,
    * and > U+10FFFF — same acceptance set as the reference's simdutf8
    * check (reference: src/batch.rs:157-160).
    */
  def isValid(b: Array[Byte]): Boolean = isValid(b, 0)

  /** [[isValid]] from `from` (the BOM-skip entry of
    * [[CharsetHelper.decode]]'s UTF-8 fast path).
    */
  def isValid(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf
        if (b1 < lo || b1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (b1 < lo || b1 > hi || (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80)
          return false
        i += 4
      } else return false
    }
    true
  }
}

object FormatKindHelper {
  def kindName(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(Sniff.formatKindOfBytes(bytes).name)

  def isFormat(bytes: Array[Byte], kind: UTF8String): Boolean =
    Sniff.formatKindOfBytes(bytes) == FormatKind.fromName(kind.toString)
}

object StringsHelper {
  def extract(bytes: Array[Byte], minLen: Int): ArrayData = {
    val out = AsciiStrings.extract(bytes, minLen)
    new GenericArrayData(out.map(UTF8String.fromString).toArray[Any])
  }
}

/** Language-ID heuristic invoked from generated code: score each
  * candidate language by hits of its characteristic function-word set,
  * argmax with lexicographically-first tie-break (identical semantics
  * to the declarative formulation in [[graft.functions.TextStats]],
  * one tokenization pass instead of one interpreted HOF scan per
  * language).
  */
object LangIdHelper {
  /** (lang, marker set) in lexicographic lang order — standard
    * high-frequency function words (public knowledge).
    */
  val Markers: Array[(String, Set[String])] = Array(
    "de" -> Set("der", "die", "das", "und", "ist", "mit", "nicht"),
    "en" -> Set("the", "and", "of", "to", "is", "with", "that"),
    "es" -> Set("el", "la", "los", "que", "es", "con", "para"),
    "fr" -> Set("le", "les", "des", "est", "avec", "pour", "dans"),
    "zh" -> Set("de", "shi", "le", "zai", "you", "wo", "ta"))

  def guess(text: UTF8String): UTF8String = {
    val toks = HashingHelper.tokenize(text.toString)
    var bestLang = Markers(0)._1
    var bestHits = -1
    var i = 0
    while (i < Markers.length) {
      val (lang, set) = Markers(i)
      var hits = 0
      var j = 0
      while (j < toks.length) {
        if (set.contains(toks(j))) hits += 1
        j += 1
      }
      if (hits > bestHits) { bestHits = hits; bestLang = lang } // strict > => lex-first tie
      i += 1
    }
    UTF8String.fromString(bestLang)
  }
}

/** Vector math helpers invoked from generated code. */
object VecHelper {
  /** Sequential left-to-right dot product in double precision —
    * bit-identical to `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
    * and to an ANSI-SQL ordered-comprehension sum, but a tight native
    * loop instead of an interpreted higher-order-function chain.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Squared L2 distance between `v[start .. start+len)` and the whole
    * of `c` (len = c.numElements) — the product-quantization subspace
    * distance. Same left-to-right double-precision fold discipline as
    * [[dot]], so an ANSI-SQL ordered-comprehension sum over the same
    * slice is bit-identical. Out-of-range slice positions contribute
    * nothing (min-length guard like [[dot]]).
    */
  def l2sqSlice(v: ArrayData, c: ArrayData, start: Int,
      vFloat: Boolean, cFloat: Boolean): Double = {
    val st = math.max(0, start) // negative start must not read OOB
    val n = math.min(c.numElements(), math.max(0, v.numElements() - st))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (vFloat) v.getFloat(st + i).toDouble else v.getDouble(st + i)
      val y = if (cFloat) c.getFloat(i).toDouble else c.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Unicode normalization, invoked from generated code. Matches the
  * published Unicode normalization forms (UAX #15, via the JDK's
  * `java.text.Normalizer`), pinned to DuckDB semantics by golden
  * tests: `nfc_normalize` = NFC; `strip_accents` = NFD decompose →
  * drop mark codepoints (Mn/Mc/Me, utf8proc's STRIPMARK set) → NFC
  * recompose (so Hangul survives intact while stacked diacritics all
  * strip). ASCII fast path: the common corpus case pays one scan and
  * zero allocations.
  */
object NormalizeHelper {
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val d = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/** Mojibake repair, invoked from generated code: undo the classic
  * crawl corruption where UTF-8 bytes were decoded as Latin-1 /
  * Windows-1252 ("cafÃ©" → "café"). WHOLE-STRING repair only — the
  * dominant real case is an entire page decoded under the wrong
  * charset, and the all-or-nothing rule keeps the operator exactly
  * restatable by an oracle (segment-wise heuristics are not).
  *
  * One repair step: map every char back to the byte that would have
  * produced it under Windows-1252 (identity for U+00..U+FF — the
  * Latin-1 view — plus the CP1252 0x80–0x9F table for €‚ƒ„…†‡ˆ‰Š‹ŒŽ
  * ''""•–—˜™š›œžŸ); if every char maps AND the byte string is valid
  * UTF-8 AND the decode actually changes the text, accept it.
  * Repeated up to 3 times (double-encoded mojibake is common).
  * Anything else — genuine Latin-1 text whose re-encoding is not
  * valid UTF-8, pure ASCII, text with unmappable characters — is
  * returned unchanged. Never throws.
  */
object MojibakeHelper {
  // char -> CP1252 byte for the 0x80-0x9F remap range, per the WHATWG
  // windows-1252 table (euro, quotes, dashes, ellipsis, TM, the
  // S/Z/OE-caron/ligature letters...). The five holes
  // 0x81/0x8D/0x8F/0x90/0x9D decode as C1 controls = identity, so
  // they are covered by the <= 0xFF branch.
  private val Cp1252Inverse: Map[Char, Int] = Map(
    0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
    0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
    0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
    0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
    0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
    0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
    0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F
  ).map { case (cp, b) => cp.toChar -> b }

  /** One reverse-decode attempt; null if the string is not repairable. */
  private def fixOnce(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var hasHigh = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val b =
        if (c <= 0xFF) c.toInt
        else Cp1252Inverse.getOrElse(c, -1)
      if (b < 0) return null
      if (b >= 0x80) hasHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!hasHigh) return null // pure ASCII round-trips; nothing to repair
    val u = UTF8String.fromBytes(bytes)
    if (!u.isValid) return null // genuine legacy text, not mojibake
    val out = u.toString
    if (out == s) null else out
  }

  def fix(s: UTF8String): UTF8String = {
    var cur = s.toString
    var changed = false
    var pass = 0
    while (pass < 3) {
      val next = fixOnce(cur)
      if (next == null) pass = 3
      else { cur = next; changed = true; pass += 1 }
    }
    if (changed) UTF8String.fromString(cur) else s
  }
}

/** Shannon character entropy, invoked from generated code. */
object EntropyHelper {
  /** Natural-log Shannon entropy of the code-point distribution of
    * `text`. Oracle-reproducible by construction: the per-character
    * terms `-(n/N)*ln(n/N)` are accumulated in ASCENDING CODE POINT
    * order (= UTF-8 byte order, the binary collation an ANSI engine
    * sorts strings by), starting from +0.0, so the IEEE add sequence
    * matches a `list_sum` over a codepoint-ordered list exactly. Empty
    * or all-same-character text scores 0.0 (the +0.0 seed normalizes
    * the `-(1.0 * 0.0) = -0.0` single-symbol term). Surrogate pairs
    * count as ONE character, matching codepoint-wise SQL splitting.
    */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    val n = s.length
    if (n == 0) return 0.0
    val hist = new java.util.TreeMap[Integer, Long]()
    var total = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      hist.merge(cp, 1L, (a, b) => a + b)
      total += 1
      i += Character.charCount(cp)
    }
    val totalD = total.toDouble
    var acc = 0.0
    val it = hist.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / totalD
      acc += -(p * Math.log(p))
    }
    acc
  }
}

/** MinHash / SimHash / fingerprint primitives.
  *
  * Two hash families, both public algorithms, both deterministic and
  * reproducible cluster-wide:
  *   - MurmurHash3 with fixed seeds for MinHash permutations (fast;
  *     LSH-internal, never surfaced — the near-dup *result* is verified
  *     by exact Jaccard, so the oracle does not need to reproduce it);
  *   - MD5-derived 62-bit hashes ([[md5lo62]]) for SimHash and
  *     winnowing fingerprints, whose *values* are part of the declared
  *     query surface: MD5 is the one hash both this engine and an
  *     ANSI-SQL oracle (DuckDB `md5_number_lower`) evaluate identically,
  *     and the 62-bit mask keeps every value positive in a signed
  *     BIGINT on both sides.
  */
object HashingHelper {

  /** Mask to the low 62 bits — values stay positive as signed longs. */
  final val Mask62 = 0x3fffffffffffffffL

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 62-bit hash of a string: little-endian long of MD5 digest bytes
    * 8..15, masked to 62 bits. Equals DuckDB
    * `md5_number_lower(s) & 4611686018427387903` — the oracle-shared
    * hash for the simhash/fingerprint surfaces.
    */
  def md5lo62(s: CharSequence): Long = {
    val b = s.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    md5lo62Bytes(b, 0, b.length)
  }

  /** [[md5lo62]] over a byte range — the allocation-free form for hot
    * loops that hash many slices of one buffer (the winnowing gram
    * scan hashes EVERY position of a document: the per-gram
    * subSequence → String → UTF-8 byte[] chain was 3 allocations per
    * character of input). Identical digests by construction when the
    * bytes are the UTF-8 encoding of the CharSequence form.
    */
  def md5lo62Bytes(b: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    val v = (d(8) & 0xffL) | ((d(9) & 0xffL) << 8) | ((d(10) & 0xffL) << 16) |
      ((d(11) & 0xffL) << 24) | ((d(12) & 0xffL) << 32) | ((d(13) & 0xffL) << 40) |
      ((d(14) & 0xffL) << 48) | ((d(15) & 0xffL) << 56)
    v & Mask62
  }
  private final val NullChar = '\u0000'

  /** Lowercase ASCII-alphanumeric tokens of a text: maximal runs of
    * [a-zA-Z0-9], lowercased; every other character is a separator.
    * Deliberately identical to the oracle-SQL tokenization
    * `string_split_regex(lower(regexp_replace(text,'[^a-zA-Z0-9]+',' ')),' ')`
    * so every token-derived surface is ANSI-SQL-verifiable.
    */
  def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Distinct `w`-word shingles (space-joined) of a text, one
    * tokenization pass per row. Semantically identical on ASCII input
    * to the SQL formulation
    * `array_distinct(transform(sequence(...), i -> concat_ws(' ', t[i..i+w-1])))`
    * with t = alphanumeric tokens — but O(n) instead of the O(n²)
    * re-evaluation Catalyst's projection collapse produces for the
    * built-in composition.
    */
  def wordShingles(text: UTF8String, w: Int): ArrayData = {
    val toks = tokenize(text.toString)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - w) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** [[md5lo62]] over a UTF8String column value — the oracle-shared
    * hash surfaced as a column function (`md5_long62`).
    */
  def md5Long62(s: UTF8String): Long = md5lo62(s.toString)

  /** Per-occurrence DSIR feature buckets (Xie et al., NeurIPS 2023
    * §3: hashed unigram+bigram counts): [[md5lo62]] of every unigram
    * token and every space-joined bigram, modulo `buckets`. Unigrams
    * come first in document order, then bigrams — consumers count
    * occurrences, so order is cosmetic. Equals the oracle recipe
    * `(md5_number_lower(g) % 2^62) % buckets` over the same grams
    * built from the shared [[tokenize]] tokenization.
    */
  def dsirBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val toks = tokenize(text.toString)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](2 * n - 1)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Long.valueOf(md5lo62(toks(i)) % buckets)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      out(n + i) = java.lang.Long.valueOf(md5lo62(toks(i) + " " + toks(i + 1)) % buckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The hashed-linear classifier's logit in ONE native pass —
    * [[dsirBuckets]] fused with the weight lookup and mean pooling:
    * z = bias + (sum over gram occurrences of w[bucket(gram)]) / N,
    * summed unigrams-then-bigrams in document order (the exact IEEE
    * fold the unfused `aggregate(hashed_grams(...))` form performed —
    * this fusion exists because a lambda HOF in the scoring path
    * knocks the whole projection/filter out of whole-stage codegen,
    * which tripled q98's corpus pass). A gramless text scores `bias`.
    */
  def hashedLinearZ(text: UTF8String, w: ArrayData, bias: Double): Double = {
    val toks = tokenize(text.toString)
    val n = toks.length
    if (n == 0) return bias
    val buckets = w.numElements()
    // backstop for a NON-foldable empty weights array (the foldable
    // case fails at analysis in HashedLinearZ.checkInputDataTypes):
    // a curated message beats a bare `% 0` ArithmeticException
    if (buckets == 0)
      throw new IllegalArgumentException(
        "hashed_linear_z: weights array is empty — no buckets to hash into")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += w.getDouble((md5lo62(toks(i)) % buckets).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      s += w.getDouble((md5lo62(toks(i) + " " + toks(i + 1)) % buckets).toInt)
      i += 1
    }
    // 2L: a pathological near-2GB single-char text has ~1B tokens and
    // 2*n would wrap as Int — the double division is identical either
    // way on every reachable input
    bias + s / (2L * n - 1)
  }

  /** 64-bit hash of a string: two 32-bit murmur passes with distinct
    * seeds. Operates on the CharSequence DIRECTLY — [[charSeqHash]] is
    * bit-identical to `MurmurHash3.stringHash` (spec-pinned), so the
    * minhash shingle loop no longer allocates a String (plus its char
    * copy) per shingle just to hash it.
    */
  def hash64(s: CharSequence): Long = {
    val h1 = charSeqHash(s, 0x9747b28c)
    val h2 = charSeqHash(s, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** `MurmurHash3.stringHash` generalized to any CharSequence — same
    * char-pair packing, same mix/finalize (delegated to the public
    * MurmurHash3 primitives), identical values by construction
    * (FunctionsSpec pins equality over random strings).
    */
  private def charSeqHash(s: CharSequence, seed: Int): Int = {
    import scala.util.hashing.MurmurHash3.{finalizeHash, mix, mixLast}
    var h = seed
    var i = 0
    val n = s.length
    while (i + 1 < n) {
      h = mix(h, (s.charAt(i) << 16) + s.charAt(i + 1))
      i += 2
    }
    if (i < n) h = mixLast(h, s.charAt(i).toInt)
    finalizeHash(h, n)
  }

  /** Deterministic per-row MinHash signature over word w-shingles.
    * h_i(x) = a_i * x + b_i (odd a_i, fixed seed), min over shingles.
    * Empty/short texts yield the max-sentinel signature.
    */
  def minHashSignature(text: UTF8String, numHashes: Int, shingleWidth: Int): ArrayData = {
    val toks = tokenize(text.toString)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val coef = coefficients(numHashes)
    if (toks.length >= shingleWidth) {
      // ONE StringBuilder reused across shingles (setLength(0) keeps
      // the backing array): with hash64 reading the CharSequence
      // directly, the loop is allocation-free per shingle
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - shingleWidth) {
        sb.setLength(0)
        var j = 0
        while (j < shingleWidth) {
          if (j > 0) sb.append(NullChar)
          sb.append(toks(i + j))
          j += 1
        }
        val h = hash64(sb)
        var k = 0
        while (k < numHashes) {
          val v = coef(2 * k) * h + coef(2 * k + 1)
          if (v < sig(k)) sig(k) = v
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig.map(java.lang.Long.valueOf).toArray[Any])
  }

  // (a_i, b_i) pairs from a fixed-seed java.util.Random (algorithm is
  // specified by the JDK javadoc — identical on every JVM)
  private val coefCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def coefficients(numHashes: Int): Array[Long] =
    coefCache.computeIfAbsent(numHashes, n => {
      val rnd = new java.util.Random(42L)
      val arr = new Array[Long](2 * n)
      var i = 0
      while (i < 2 * n) { arr(i) = rnd.nextLong() | 1L; arr(i + 1) = rnd.nextLong(); i += 2 }
      arr
    })

  /** SimHash over unigram tokens: per-occurrence ±1 bit-votes on the
    * 62 bits of [[md5lo62]], bit set iff votes are strictly positive.
    * Value is < 2^62 (always positive as BIGINT) and reproducible by
    * the ANSI-SQL oracle via `md5_number_lower` + per-bit vote sums.
    */
  def simHash64(text: UTF8String): Long = {
    val toks = tokenize(text.toString)
    val votes = new Array[Int](62)
    var i = 0
    while (i < toks.length) {
      val h = md5lo62(toks(i))
      var bit = 0
      while (bit < 62) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 62) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03): k-gram character hashes over the normalized
    * (token-joined) text, minimum per sliding window, consecutive
    * duplicates collapsed by position. Returns the selected hash values
    * in document order. Gram hash is [[md5lo62]], so the *set* of
    * selected values (= the set of per-window minima) is reproducible
    * by the ANSI-SQL oracle with a windowed MIN.
    */
  def winnow(text: UTF8String, k: Int, window: Int): ArrayData = {
    val s = tokenize(text.toString).mkString(" ")
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // tokenize() output is ASCII by construction ([a-z0-9] + the space
    // joins), so the UTF-8 bytes of any substring are exactly the byte
    // range — hash slices of ONE encoded buffer instead of allocating
    // a subSequence + String + byte[] per position (identical digests)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      grams(i) = HashingHelper.md5lo62Bytes(bytes, i, k)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastIdx = -1
    i = 0
    val wins = math.max(grams.length - window + 1, 1)
    while (i < wins) {
      var minIdx = i
      var j = i
      val end = math.min(i + window, grams.length)
      while (j < end) {
        if (grams(j) <= grams(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastIdx) {
        out += java.lang.Long.valueOf(grams(minIdx))
        lastIdx = minIdx
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** One-pass byte-level computation of the [[graft.functions.TextStats]]
  * quality-formula ingredients — value-identical to the composed
  * regex/split/HOF tree it replaces (property-pinned against the
  * composed form in OpsPropertySpec). Every character class involved
  * (`[ \t\n\r\f]`, `[a-zA-Z0-9 ]`, `[a-zA-Z0-9]`) is pure ASCII, so a
  * UTF-8 continuation or lead byte (>= 0x80, negative as a JVM Byte)
  * can never match and byte iteration decides every class test
  * correctly, while code points are counted by skipping continuation
  * bytes. No allocation per row.
  */
object QualityHelper {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** [[graft.functions.TextStats.Stopwords]] packed as little-endian
    * lowercased ASCII ints (all 20 words are <= 4 chars), sorted for
    * binary search. Tokens longer than 4 chars never consult this.
    */
  private val StopPacked: Array[Int] = {
    val packed = graft.functions.TextStats.Stopwords.map { w =>
      require(w.length <= 4, s"stopword '$w' exceeds the 4-byte pack")
      var p = 0
      var i = 0
      while (i < w.length) { p |= (w.charAt(i) & 0xFF) << (8 * i); i += 1 }
      p
    }.toArray
    java.util.Arrays.sort(packed)
    packed
  }

  /** `size(split(trim(text), "[ \t\n\r\f]+"))` in one pass. Spark's
    * `trim` strips 0x20 spaces only, and `split` (limit -1) keeps
    * leading/trailing empty segments, so the count is exactly
    * (# maximal whitespace runs inside the space-trimmed span) + 1 —
    * including `[""]` for the empty string. \x0B is NOT whitespace
    * here (the pinned oracle-dialect class, not Java's \s).
    */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    var runs = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      val ws = isWs(s.getByte(i))
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }

  /** The pre-round [[graft.functions.TextStats.qualityScore]] sum in
    * one pass. The double arithmetic mirrors the composed tree's
    * shape and associativity exactly —
    * `(least(tc/100,1)*0.4 + (1-least(punct*4,1))*0.3) + least(stop*5,1)*0.3`
    * — so the value (and the `round(_, 6)` applied above it) is
    * bit-identical. Division-by-zero branches reproduce the composed
    * tree's null/least folding: an empty text scores the pure
    * token-count term (0.004).
    */
  def rawScore(s: UTF8String): Double = {
    val n = s.numBytes()
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    var wsRuns = 0
    var inWs = false
    var cp = 0 // code points in the whole string
    var keep = 0 // code points matching [a-zA-Z0-9 ]
    var nTok = 0
    var nStop = 0
    var tokLen = 0
    var tokPack = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) cp += 1
      val alnum = isAlnum(b)
      if (alnum || b == ' ') keep += 1
      if (alnum) {
        if (tokLen < 4) {
          val low = if (b >= 'A' && b <= 'Z') b + 32 else b.toInt
          tokPack |= (low & 0xFF) << (8 * tokLen)
        }
        tokLen += 1
      } else if (tokLen > 0) {
        nTok += 1
        if (tokLen <= 4 && java.util.Arrays.binarySearch(StopPacked, tokPack) >= 0) nStop += 1
        tokLen = 0
        tokPack = 0
      }
      if (i >= lo && i < hi) {
        val ws = isWs(b)
        if (ws && !inWs) wsRuns += 1
        inWs = ws
      }
      i += 1
    }
    if (tokLen > 0) {
      nTok += 1
      if (tokLen <= 4 && java.util.Arrays.binarySearch(StopPacked, tokPack) >= 0) nStop += 1
    }
    val tc = wsRuns + 1
    val a = math.min(tc.toDouble / 100.0, 1.0) * 0.4
    val b = if (cp == 0) 0.0
      else (1.0 - math.min((cp - keep).toDouble / cp.toDouble * 4.0, 1.0)) * 0.3
    val c = if (nTok == 0) 0.0
      else math.min(nStop.toDouble / nTok.toDouble * 5.0, 1.0) * 0.3
    a + b + c
  }
}

/** Single-pass HTML character-reference decoder backing
  * [[DecodeHtmlEntities]] (the entity step of
  * [[graft.ops.Quality.htmlToText]]).
  *
  * One left-to-right scan, continuing AFTER each decoded reference, so
  * double-encoded input decodes exactly once (`&amp;#65;` → `&#65;`,
  * never `A`) — the property a replace-chain only gets by ordering
  * `&amp;` last. Decodes the full WHATWG named-reference table
  * (2125 `;`-terminated names from the HTML spec's public
  * entities.json list, vendored at
  * `resources/graft/html_entities.tsv` — PSL-style public-data
  * vendoring; 93 names expand to TWO code points) plus decimal
  * (`&#233;`) and hex (`&#xE9;`) numeric references for any Unicode
  * scalar value (1..0x10FFFF excluding surrogates). A reference
  * REQUIRES its terminating semicolon (the spec's legacy
  * no-semicolon forms are ambiguous in running text). One deliberate
  * deviation: `&nbsp;` decodes to a PLAIN space, not U+00A0, so the
  * downstream whitespace collapse treats it as the separator it
  * visually is (pre-collapse convention, r10). Anything else —
  * unknown names, out-of-range or malformed numerics, a bare `&` —
  * is copied verbatim: never throw on crawl data.
  *
  * The table is a per-JVM static hash map (~2k entries): no
  * broadcast, no shuffle, safe inside whole-stage codegen — the same
  * design as [[Psl]].
  */
object HtmlEntityHelper {

  /** name → replacement, loaded from the vendored WHATWG table.
    * Longest name is 31 chars — [[MaxBody]] bounds the `;` scan.
    */
  private val entities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    val in = getClass.getResourceAsStream("/graft/html_entities.tsv")
    require(in != null, "vendored html_entities.tsv missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().foreach { line =>
        if (line.nonEmpty && !line.startsWith("#")) {
          val tab = line.indexOf('\t')
          val name = line.substring(0, tab)
          val sb = new java.lang.StringBuilder(2)
          line.substring(tab + 1).split(' ')
            .foreach(h => sb.appendCodePoint(Integer.parseInt(h, 16)))
          m.put(name, sb.toString)
        }
      }
    } finally src.close()
    m.put("nbsp", " ") // to plain space: pre-collapse convention
    m
  }

  /** Longest decodable body: 31-char names ([[entities]]), 9-char
    * numerics (`#x10FFFF` + headroom). A `;` farther out means the
    * `&` is bare.
    */
  private val MaxBody = 32

  def decode(s: UTF8String): UTF8String = {
    val in = s.toString
    if (in.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = in.indexOf(';', i + 1)
        if (semi < 0 || semi - i - 1 > MaxBody) { sb.append(c); i += 1 }
        else {
          val body = in.substring(i + 1, semi)
          val repl: String =
            if (body.length > 1 && body.charAt(0) == '#') {
              val cp = numeric(body)
              if (cp >= 0) new String(Character.toChars(cp)) else null
            } else entities.get(body)
          if (repl != null) { sb.append(repl); i = semi + 1 }
          else { sb.append(c); i += 1 }
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Code point of `#123` / `#x7B` / `#X7B`, or -1 when malformed or
    * not a Unicode scalar value.
    */
  private def numeric(body: String): Int = {
    val hexMode = body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
    val digits = body.substring(if (hexMode) 2 else 1)
    if (digits.isEmpty || digits.length > 7) return -1
    var cp = 0
    var i = 0
    while (i < digits.length) {
      val d = Character.digit(digits.charAt(i), if (hexMode) 16 else 10)
      if (d < 0) return -1
      cp = cp * (if (hexMode) 16 else 10) + d
      if (cp > 0x10FFFF) return -1
      i += 1
    }
    if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF)) -1 else cp
  }
}

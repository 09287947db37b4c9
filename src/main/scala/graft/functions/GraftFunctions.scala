package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftShims.{column, expression}

/** Public Column-function surface of the engine. Reference-derived
  * scalars (`is_utf8`, `format_kind`, `extract_strings`, `sha256`) plus
  * the training-data-pipeline primitives (minhash/simhash/fingerprint,
  * vector math). Everything here is either a codegen'd custom
  * Expression or a composition of Spark built-ins — no interpreted
  * Scala UDFs in hot paths.
  */
object GraftFunctions {

  // ---- reference-derived scalar surface (SURVEY.md §2.8) ----

  def is_utf8(c: Column): Column = column(IsUtf8(expression(c)))

  def format_kind(c: Column): Column = column(FormatKindOf(expression(c)))

  def extract_strings(c: Column, minLen: Int): Column =
    column(ExtractStrings(expression(c), expression(lit(minLen))))

  /** 32-byte SHA-256 of a binary column (reference: src/hasher.rs). */
  def sha256(c: Column): Column = unhex(sha2(c, 256))

  def explode_archive(c: Column): Column = column(ExplodeArchive(expression(c)))

  // ---- dedup primitives ----

  def minhash_signature(text: Column, numHashes: Int = 128, shingleWidth: Int = 3): Column =
    column(MinHashSignature(expression(text), expression(lit(numHashes)),
      expression(lit(shingleWidth))))

  def simhash64(text: Column): Column = column(SimHash64(expression(text)))

  def word_shingles(text: Column, w: Int = 3): Column =
    column(WordShingles(expression(text), expression(lit(w))))

  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  def fingerprint(text: Column, k: Int = 9, window: Int = 4): Column =
    column(Fingerprint(expression(text), expression(lit(k)), expression(lit(window))))

  /** FastCDC content-defined chunking of a binary column — see
    * [[CdcHelper]]. Sizes are analysis-time-checked literals.
    */
  def cdc_chunks(content: Column, min: Int = 2048, avg: Int = 8192,
      max: Int = 65536): Column =
    column(CdcChunks(expression(content), expression(lit(min)),
      expression(lit(avg)), expression(lit(max))))

  /** Per-occurrence DSIR hashed unigram+bigram feature buckets. */
  def hashed_grams(text: Column, buckets: Int): Column =
    column(HashedGrams(expression(text), expression(lit(buckets))))

  /** Fused hashed-linear classifier logit over the dsir-bucket
    * features — one codegen'd pass (see [[HashedLinearZ]]).
    */
  def hashed_linear_z(text: Column, weights: Array[Double], bias: Double): Column =
    column(HashedLinearZ(expression(text),
      expression(org.apache.spark.sql.functions.typedLit(weights.toSeq)),
      expression(lit(bias))))

  /** Oracle-shared 62-bit md5 hash (= DuckDB `md5_number_lower % 2^62`). */
  def md5_long62(text: Column): Column = column(Md5Long62(expression(text)))

  /** Natural-log Shannon entropy of the code-point distribution —
    * reference-free quality signal (both tails are junk: ~0 =
    * degenerate repetition, high = random/compressed noise).
    */
  def char_entropy(text: Column): Column = column(CharEntropy(expression(text)))

  /** Never-throwing URL decomposition — see [[UrlHelper.parts]]. */
  def url_parts(url: Column): Column = column(UrlParts(expression(url)))

  /** URL canonicalization for URL-keyed dedup — see
    * [[UrlHelper.normalize]] (case/IDN fold, default-port and fragment
    * strip, percent-encoding normalization).
    */
  def url_normalize(url: Column): Column = column(UrlNormalize(expression(url)))

  /** [[url_normalize]] with opt-in query-parameter sorting — the
    * crawler convention that treats `?a=1&b=2` ≡ `?b=2&a=1` as one
    * resource. Default-off because reordered params MAY name different
    * resources on some servers.
    */
  def url_normalize(url: Column, sortQuery: Boolean): Column =
    column(UrlNormalize(expression(url),
      org.apache.spark.sql.catalyst.expressions.Literal(sortQuery)))

  /** eTLD+1 under the vendored Public Suffix List ([[Psl]]) — the
    * grouping key for per-domain quota caps
    * ([[graft.ops.Sampling.domainCap]]) and domain-level dedup. See
    * [[UrlHelper.registeredDomain]].
    */
  def registered_domain(host: Column): Column =
    column(RegisteredDomain(expression(host)))

  /** RFC 3986 §5 reference resolution — see [[UrlHelper.resolve]]:
    * `<a href>` value + page URL → absolute target URL (null for
    * `mailto:`/`javascript:`/… references). The step between
    * [[extract_links]] and [[url_normalize]] in link-graph builds.
    */
  def url_resolve(base: Column, ref: Column): Column =
    column(UrlResolve(expression(base), expression(ref)))

  /** `<a href>` extraction in document order — see
    * [[HtmlLinkHelper.extractLinks]] (entity-decoded, comments and
    * script/style bodies skipped, unquoted values handled).
    */
  def extract_links(html: Column): Column = column(ExtractLinks(expression(html)))

  /** Unicode-script letter fractions — see [[ScriptHelper.ratios]]:
    * `struct<latin, cyrillic, cjk, arabic, greek, other, n_letters>`.
    * The alphabet-level corpus router next to [[lang_guess]].
    */
  def script_ratios(text: Column): Column =
    column(ScriptRatios(expression(text)))

  /** Anchors with text and rel-nofollow — see
    * [[HtmlAnchorHelper.extractAnchors]]:
    * `array<struct<href, text, nofollow>>`. The anchor-text-corpus /
    * nofollow-aware-link-graph face of [[extract_links]].
    */
  def extract_anchors(html: Column): Column =
    column(ExtractAnchors(expression(html)))

  /** Crawl-delay seconds for an agent — see
    * [[RobotsHelper.crawlDelay]]; null when no selected group carries
    * one. The politeness input to a per-host fetch scheduler.
    */
  def robots_crawl_delay(robots: Column, agent: Column): Column =
    column(RobotsCrawlDelay(expression(robots), expression(agent)))

  /** `Sitemap:` directives of a robots.txt in file order — see
    * [[RobotsHelper.sitemaps]]; null robots (no file) → empty array.
    * Closes the discovery loop: robots → sitemaps → frontier.
    */
  def robots_sitemaps(robots: Column): Column =
    column(RobotsSitemaps.withNullSafeDefault(expression(robots)))

  /** Page head metadata — see [[HtmlMetaHelper.meta]]: first title
    * (entity-decoded, whitespace-collapsed), first meta description,
    * first canonical link, robots-meta noindex verdict. The
    * WAT-record fields next to [[extract_links]]' outlinks.
    */
  def html_meta(html: Column): Column = column(HtmlMeta(expression(html)))

  /** SURT crawl-index sort/partition key — see [[UrlHelper.surt]]:
    * scheme dropped, host reversed comma-joined (`com,example)`),
    * path + always-sorted query lowercased. Range-partitioning a
    * crawl index by this key co-locates each domain's records.
    */
  def surt_key(url: Column): Column = column(SurtKey(expression(url)))

  /** sitemaps.org sitemap parsing — see [[SitemapHelper.extract]]:
    * `array<struct<loc, kind, lastmod, changefreq, priority>>` from a
    * urlset, a sitemapindex (`kind = sitemap` entries to recurse
    * into), or a plain-text URL list. The crawl-seeding seat next to
    * [[robots_allowed]]'s admission gate.
    */
  def extract_sitemap_urls(content: Column): Column =
    column(ExtractSitemapUrls(expression(content)))

  /** RFC 9309 robots.txt fetch-permission check — see
    * [[RobotsHelper.allowed]] (group selection by product token,
    * longest-match `*`/`$` rules, Allow wins ties; null robots =
    * no restrictions). The admission gate between link extraction
    * and the crawl frontier.
    */
  def robots_allowed(robots: Column, agent: Column, path: Column): Column =
    column(RobotsAllowed.withNullSafeDefaults(
      expression(robots), expression(agent), expression(path)))

  /** HTTP response-message projection — see [[HttpHelper.payload]]:
    * `struct<status, content_type, payload>` with chunked framing and
    * gzip/deflate/zstd content codings reversed; non-HTTP input passes
    * through as `(null, null, input)`. The step between the WARC
    * walker's raw record bodies and [[graft.ops.Quality.htmlToText]].
    */
  def http_payload(content: Column): Column = column(HttpPayload(expression(content)))

  /** Charset decode under a BOM / Content-Type hint — see
    * [[CharsetHelper.decode]] (U+FFFD replacement, never throws; a
    * null hint means "no hint", not a null result). The step between
    * [[http_payload]] and [[graft.ops.Quality.htmlToText]] for
    * non-UTF-8 pages.
    */
  def charset_decode(content: Column, hint: Column): Column =
    column(CharsetDecode.withNullSafeHint(expression(content), expression(hint)))

  /** Single-pass HTML character-reference decode — see
    * [[HtmlEntityHelper.decode]] (named + numeric, decode-once).
    */
  def decode_html_entities(text: Column): Column =
    column(DecodeHtmlEntities(expression(text)))

  /** Unicode NFC normalization (UAX #15; = DuckDB `nfc_normalize`). */
  def nfc_normalize(text: Column): Column = column(NfcNormalize(expression(text)))

  /** Real BPE token count under the vendored merges table — see
    * [[BpeHelper]] (rank-priority merge application over q52's
    * pretokens); the numerator of the fertility metric.
    */
  def bpe_encode_count(text: Column): Column = column(BpeEncodeCount(expression(text)))

  /** Diacritic removal, utf8proc STRIPMARK semantics (= DuckDB
    * `strip_accents`): NFD → drop Mn/Mc/Me → NFC recompose.
    */
  def strip_accents(text: Column): Column = column(StripAccents(expression(text)))

  /** PII redaction for corpus preparation — see [[PiiHelper]]:
    * `struct<clean, n_email, n_ip, n_phone, n_key>` (emails / IPv4 /
    * phones / secret-looking keys replaced by typed placeholders,
    * per-category counts kept). The safety-filtering stage between
    * text extraction and tokenization.
    */
  def redact_pii(text: Column): Column = column(RedactPii(expression(text)))

  /** Undo UTF-8-read-as-Latin-1/CP1252 mojibake, whole-string, <=3
    * passes ([[FixMojibake]]); non-mojibake text passes unchanged.
    */
  def fix_mojibake(text: Column): Column = column(FixMojibake(expression(text)))

  // ---- vector math (built-in compositions — fully codegen'd) ----

  /** Dot product of two array<float|double> columns in double precision.
    * Sequential left-fold accumulation => deterministic, reproducible
    * sums (bit-identical to the `aggregate(zip_with(...))` composition
    * and to an ordered ANSI-SQL comprehension sum) — as a codegen'd
    * native expression, not an interpreted HOF chain.
    */
  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))

  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Squared L2 distance between `vec[start .. start+len(cent))` and
    * `cent` — the product-quantization subspace distance
    * ([[VecL2SqSlice]]).
    */
  def vec_l2sq_slice(vec: Column, cent: Column, start: Column): Column =
    column(VecL2SqSlice(expression(vec), expression(cent), expression(start)))

  /** PQ encode / ADC / distortion over driver-constant tables held as
    * codegen REFERENCE OBJECTS (not unrolled literals), so the
    * generated method stays a single call at any m/ks/nprobe — see
    * [[AnnHelper]]. Not SQL-registered: the tables are plan-time
    * constants a SQL surface cannot carry.
    */
  def pq_encode(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(vec), cb))

  def pq_adc(code: Column, lut: Array[Array[Double]]): Column =
    column(PqAdc(expression(code), lut))

  def pq_encode_by_cell(cell: Column, vec: Column, cells: Array[Long],
      cbs: Array[Array[Array[Array[Double]]]]): Column =
    column(PqEncodeByCell(expression(cell), expression(vec), cells, cbs))

  def pq_adc_by_cell(cell: Column, code: Column, cells: Array[Long],
      luts: Array[Array[Array[Double]]]): Column =
    column(PqAdcByCell(expression(cell), expression(code), cells, luts))

  def pq_min_dist(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    column(PqMinDist(expression(vec), cb))

  def cosine_similarity(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  // ---- text analysis (built-in compositions, oracle-expressible) ----

  /** Whitespace token count. Explicit class `[ \t\n\r\f]+` — NOT `\s`,
    * whose membership differs between Java (has \x0B) and RE2/DuckDB
    * (doesn't); see [[graft.functions.TextStats.tokenCount]].
    */
  def token_count(text: Column): Column =
    TextStats.tokenCount(text)

  /** Occurrences of `word` as a whole token in `text` (length-delta trick,
    * identical semantics in ANSI SQL for the oracle).
    */
  def word_occurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    // overlapping-safe for space-delimited words
    (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(needle), " "))) /
      lit(needle.length - 1)
  }

  // ---- SQL registration ----

  /** The SQL-callable custom-expression surface: one builder per
    * function, shared by session-scoped [[register]] and the
    * cluster-wide [[graft.GraftExtensions]] injection path.
    */
  private[graft] val sqlBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "is_utf8" -> (e => IsUtf8(e.head)),
    "format_kind" -> (e => FormatKindOf(e.head)),
    "extract_strings" -> (e => ExtractStrings(e.head, e(1))),
    "minhash_signature" -> (e => MinHashSignature(e.head, e(1), e(2))),
    "simhash64" -> (e => SimHash64(e.head)),
    "fingerprint" -> (e => Fingerprint(e.head, e(1), e(2))),
    "hashed_grams" -> (e => HashedGrams(e.head, e(1))),
    "hashed_linear_z" -> (e => HashedLinearZ(e.head, e(1), e(2))),
    "md5_long62" -> (e => Md5Long62(e.head)),
    "char_entropy" -> (e => CharEntropy(e.head)),
    "decode_html_entities" -> (e => DecodeHtmlEntities(e.head)),
    "nfc_normalize" -> (e => NfcNormalize(e.head)),
    "strip_accents" -> (e => StripAccents(e.head)),
    "url_parts" -> (e => UrlParts(e.head)),
    "url_normalize" -> (e =>
      if (e.length > 1) UrlNormalize(e.head, e(1)) else UrlNormalize(e.head)),
    "http_payload" -> (e => HttpPayload(e.head)),
    "charset_decode" -> (e =>
      if (e.length > 1) CharsetDecode.withNullSafeHint(e.head, e(1))
      else CharsetDecode.withNullSafeHint(e.head,
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(""),
          org.apache.spark.sql.types.StringType))),
    "registered_domain" -> (e => RegisteredDomain(e.head)),
    "url_resolve" -> (e => UrlResolve(e.head, e(1))),
    "extract_links" -> (e => ExtractLinks(e.head)),
    "robots_allowed" -> (e => RobotsAllowed.withNullSafeDefaults(e.head, e(1), e(2))),
    "extract_sitemap_urls" -> (e => ExtractSitemapUrls(e.head)),
    "surt_key" -> (e => SurtKey(e.head)),
    "robots_sitemaps" -> (e => RobotsSitemaps.withNullSafeDefault(e.head)),
    "robots_crawl_delay" -> (e => RobotsCrawlDelay(e.head, e(1))),
    "html_meta" -> (e => HtmlMeta(e.head)),
    "extract_anchors" -> (e => ExtractAnchors(e.head)),
    "script_ratios" -> (e => ScriptRatios(e.head)),
    "cdc_chunks" -> (e => CdcChunks(e.head, e(1), e(2), e(3))),
    "bpe_encode_count" -> (e => BpeEncodeCount(e.head)),
    "redact_pii" -> (e => RedactPii(e.head)),
    "fix_mojibake" -> (e => FixMojibake(e.head)),
    "explode_archive" -> (e => ExplodeArchive(e.head)))

  /** Register the custom expressions for SQL use in an existing session
    * (`SELECT is_utf8(content), ... LATERAL VIEW explode_archive(content)`).
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graft.GraftShims.registerFunction
    sqlBuilders.foreach { case (name, b) => registerFunction(spark, name, b) }
  }
}

package graft.queries

import graft.convert.ArchiveConverter
import graft.core.{ConvertOptions, IncludeType}
import graft.functions.{GraftFunctions, TextStats}
import graft.ops.{Dedup, MultiModal, Packing, Quality, Sampling, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import scala.collection.immutable.ListMap

/** Text quality and sampling: quality scores, token/fertility stats,
  * language id, repetition, boilerplate, BM25, LM cross-entropy,
  * entropy, Gopher rules, sampling/packing/shuffling, normalization,
  * URL and HTML text faces, heavy hitters.
  *
  * One trait of the [[Inventory]] registry split (r12 verdict #7):
  * the single `queries` ListMap + `oracleSql` map in [[Inventory]]
  * remain the registry face; the linear trait chain preserves the
  * original member initialization order.
  */
private[queries] trait InventoryQuality extends InventorySimilarity {


  private[queries] def q19(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(TextStats.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextStats.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextStats.avgTokenLen(col("text")), 6).as("avg_tok_len"),
        TextStats.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))


  private[queries] def q20(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("lang"), TextStats.tokenCount(col("text")).cast("long").as("tc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tc")).as("total_tokens"),
        min(col("tc")).as("min_tokens"),
        max(col("tc")).as("max_tokens"),
        round(sum(col("tc")).cast("double") / count(lit(1)), 6).as("avg_tokens"))
      .orderBy(col("lang"))


  private[queries] def q24(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(TextStats.langGuess(col("text")).as("guess"))
      .groupBy(col("guess")).agg(count(lit(1)).as("n"))
      .orderBy(col("guess"))


  /** BPE-ish tokenization (brief: token counting beyond whitespace):
    * a GPT-2-style pretokenizer approximated with an RE2-safe
    * alternation (letter runs | digit runs | punctuation runs) so both
    * engines' regex dialects agree; reported against the whitespace
    * token count per language.
    */
  private[queries] def q52(s: SparkSession, d: String): DataFrame = {
    // explicit whitespace class: Java's \s includes \x0B, RE2's does
    // not — spelling the class out keeps both regex dialects identical
    val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f]+"
    t(s, d, "documents")
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
          .cast("long").as("bpe"),
        size(split(trim(col("text")), "[ \\t\\n\\r\\f]+")).cast("long").as("ws"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("ws")).as("ws_tokens"),
        round(sum(col("bpe")).cast("double") / sum(col("ws")), 6).as("fertility"))
      .orderBy(col("lang"))
  }


  /** Sequence packing (Packing op): concat-and-chunk doc offsets. */
  private[queries] def q64(s: SparkSession, d: String): DataFrame =
    Packing.contiguous(t(s, d, "documents"), "doc_id", "n_chars", budget = 4096)
      .select(col("doc_id"), col("start_off"), col("seq_id"))
      .orderBy(col("doc_id"))


  /** Deterministic fractional upsampling ([[Sampling.upsample]]) —
    * the data-mixing dual of q61: en documents get 2.3 epochs (2
    * copies each, a stable id-keyed 30% get 3), zh 0.5 (a stable 50%
    * appear once), everything else 1. denom=100 for the q61 reason.
    */
  private[queries] def q70(s: SparkSession, d: String): DataFrame =
    Sampling.upsample(t(s, d, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", epochs = Map("en" -> 2.3, "zh" -> 0.5),
        defaultEpochs = 1.0, denom = 100)
      .orderBy(col("doc_id"), col("epoch"))


  /** Hashed-linear quality classifier ([[Quality.hashedLinearQuality]]
    * — round 17): the fastText-style trained scorer (Joulin et al.
    * 2017) over the vendored offline-trained weights
    * (`quality_weights.tsv`, regenerable by `tools/train_quality.py`)
    * — the one standard corpus-quality stage the rule-based family
    * (q19/q84) lacks: a learned decision boundary over hashed
    * unigram+bigram evidence. The oracle recomputes the gram buckets
    * from q79's proven md5 CTEs and interpolates the SAME bias/weight
    * doubles the engine loads (the q83 constants rule), so the
    * feature hash, mean pooling, bias and sigmoid are all
    * load-bearing per row.
    */
  private[queries] def q152(s: SparkSession, d: String): DataFrame =
    Quality.hashedLinearQuality(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))


  /** BOUNDARY-RESPECTING packing ([[Packing.ffdPack]] — round 17):
    * first-fit-decreasing whole-document bin packing into 2048-token
    * bins over 8 id-mod shards — the context-window prep that never
    * splits a document (q64's contiguous packing does). The oracle
    * replays the exact greedy recurrence per shard as a recursive
    * CTE: items in (tokens desc, id) order, state = the ordered list
    * of bin remainders, first bin that fits else append — so the
    * shard assignment, the decreasing order, the first-fit election
    * AND the running remainders are all load-bearing per row.
    */
  private[queries] def q153(s: SparkSession, d: String): DataFrame =
    Packing.ffdPack(t(s, d, "documents"), "doc_id", "n_chars",
        capacity = 2048, shards = 8)
      .orderBy(col("doc_id"))


  /** REAL-TOKENIZER context-window prep, end to end — the composition
    * a training run actually executes: genuine BPE token counts
    * ([[GraftFunctions.bpe_encode_count]], q126's vendored-merges
    * tokenizer) feed boundary-respecting FFD packing
    * ([[Packing.ffdPack]], q153) and the result rolls up to the
    * per-bin utilization report a batch scheduler reads. The corpus is
    * synthesized from [[BpeCases]] by whitespace-joined repetition
    * (case `i mod 12`, `1 + i mod 9` copies), so the oracle can state
    * every document's token count EXACTLY — the pretokenizer never
    * merges across whitespace, so counts are additive over the join —
    * as `repeats x` the independent `tools/train_bpe.py --cases`
    * literal, then replay q153's proven FFD recurrence over those
    * counts and aggregate. Tokenizer, additivity, shard assignment,
    * the greedy and the rollup are all load-bearing in one hash.
    */
  private[queries] def q155(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = (0 until 96).map { i =>
      val txt = BpeCases(i % 12)._2
      (i.toLong, Seq.fill(1 + i % 9)(txt).mkString(" "))
    }.toDF("doc_id", "text")
    val counted = docs.select(col("doc_id"),
      GraftFunctions.bpe_encode_count(col("text")).as("bpe_tokens"))
    Packing.ffdPack(counted, "doc_id", "bpe_tokens",
        capacity = 256, shards = 4)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        round(sum(col("tokens")) / 256.0, 6).as("fill"))
      .orderBy(col("shard"), col("bin"))
  }


  /** Context-window chunking ([[Packing.slidingWindows]]): 200-char
    * windows every 150 chars — the embedding-pipeline chunker. */
  private[queries] def q71(s: SparkSession, d: String): DataFrame =
    Packing.slidingWindows(t(s, d, "documents"), "doc_id", "text",
        window = 200, stride = 150)
      .orderBy(col("doc_id"), col("win_id"))


  /** Deterministic epoch shuffle ([[Sampling.deterministicShuffle]]):
    * the reproducible global permutation, checked as an exact
    * POSITION assignment (the driver compares rows order-insensitively,
    * so the permutation is materialized as `row_number` over the
    * shuffle order — the oracle recomputes the same md5 ordering).
    * The windowed position here is the ORACLE FACE; the operator
    * itself is a plain range-exchange sort with no global window.
    */
  private[queries] def q76(s: SparkSession, d: String): DataFrame = {
    val shuffled = Sampling.deterministicShuffle(t(s, d, "documents"), "doc_id", seed = 42L)
    shuffled.select(
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
        md5(concat_ws(":", lit(42L), col("doc_id"))), col("doc_id"))).as("pos"),
      col("doc_id"))
      .orderBy(col("pos"))
  }


  /** LM perplexity filter ([[Quality.lmCrossEntropy]], CCNet Wenzek
    * et al. 2020 §3.3): per-language bigram LM trained on the
    * `src0` slice (the "curated reference" stand-in for CCNet's
    * Wikipedia), every document scored by cross-entropy under it —
    * src0 docs exercise the fully-seen path, the other sources the
    * unseen-gram add-one backoff. Score rounded to 6 dp (ln ulp
    * variance across libms; see the operator scaladoc).
    */
  private[queries] def q78(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Quality.lmCrossEntropy(docs.where(col("source") === "src0"), docs,
      "doc_id", "text", "lang")
      .orderBy(col("doc_id"))
  }


  /** DSIR importance resampling ([[Sampling.dsirResample]], Xie et
    * al. NeurIPS 2023): 200 docs selected from the full corpus
    * ∝ exp(importance weight) toward the `src0` target slice (the
    * q78 pairing: same curated-reference stand-in). buckets=1024
    * keeps bucket collisions active at the test vocabulary size;
    * the md5-derived Gumbel keys make the sample engine-exact.
    */
  private[queries] def q79(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Sampling.dsirResample(docs.where(col("source") === "src0"), docs,
      "doc_id", "text", k = 200, buckets = 1024, seed = 7L)
      .orderBy(col("doc_id"))
  }


  /** Unicode-bearing prefixes for q93, spelled in \u escapes so the
    * composed-vs-decomposed distinction survives any editor. Each row
    * concatenates these ahead of the (ASCII) document text, so the
    * normalizers do real work on EVERY row, not just on a constant:
    * nfc must compose the decomposed e+acute / ring / umlaut and
    * recompose the jamo; strip must drop every stacked combining
    * mark entirely.
    */
  private[queries] val NfcPrefix = "Cafe\u0301 A\u030angstro\u0308m \u1112\u1161\u11ab "

  private[queries] val StripPrefix = "Cafe\u0301 \u1eb7 e\u0301\u0302 \ud55c "


  /** Unicode normalization surface ([[GraftFunctions.nfc_normalize]] /
    * [[GraftFunctions.strip_accents]]): the pre-dedup canonicalization
    * pass — composed and decomposed spellings of the same text must
    * hash identically after NFC, and accent-folded text after
    * strip_accents. Output is md5 of the normalized strings (compact,
    * and any codepoint divergence from the oracle's utf8proc is a
    * hash mismatch). Codegen'd projections, zero exchanges.
    */
  private[queries] def q93(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        md5(GraftFunctions.nfc_normalize(concat(lit(NfcPrefix), col("text")))).as("nfc_md5"),
        md5(GraftFunctions.strip_accents(concat(lit(StripPrefix), col("text")))).as("strip_md5"))
      .orderBy(col("doc_id"))


  /** URL decomposition + eTLD+1
    * ([[GraftFunctions.url_parts]] / [[GraftFunctions.registered_domain]]):
    * the web-corpus keying primitive (per-domain quota caps, URL-keyed
    * dedup). URLs are synthesized deterministically from doc_id/source
    * ON BOTH SIDES (mixed-case scheme+host, optional userinfo, port,
    * query, fragment, and multi-label ccSLD suffixes), so the oracle
    * compares a full parse, not a fixed literal. Narrow codegen'd
    * projections, zero exchanges.
    */
  private[queries] def q96(s: SparkSession, d: String): DataFrame = {
    // github.io exercises a PRIVATE-section PSL rule through the
    // oracle gate: wwwN.srcM.github.io must keep three labels
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("com.au"), lit("github.io")),
      (col("doc_id") % 5 + 1).cast("int"))
    val url = concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("http")),
      lit("://"),
      when(col("doc_id") % 5 === 0, lit("user:pw@")).otherwise(lit("")),
      lit("WWW"), (col("doc_id") % 7).cast("string"),
      lit("."), col("source"), lit("."), tld,
      when(col("doc_id") % 4 === 0, lit(":8443")).otherwise(lit("")),
      lit("/p/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0,
        concat(lit("?utm_source=x&id="), col("doc_id").cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0, lit("#s2")).otherwise(lit("")))
    val p = GraftFunctions.url_parts(url)
    t(s, d, "documents").select(col("doc_id"),
      p.getField("scheme").as("scheme"),
      p.getField("host").as("host"),
      p.getField("port").cast("bigint").as("port"),
      p.getField("path").as("path"),
      p.getField("query").as("qstring"),
      p.getField("fragment").as("fragment"),
      GraftFunctions.registered_domain(p.getField("host")).as("reg_domain"))
      .orderBy(col("doc_id"))
  }


  /** HTML → text extraction ([[Quality.htmlToText]]): HTML pages are
    * synthesized deterministically from doc_id/text ON BOTH SIDES
    * (title, style block, script block carrying a raw `<`, headings,
    * entities, a comment, a self-closing tag), then extracted — so the
    * oracle exercises comment/script/style elision, tag stripping,
    * entity decoding and whitespace collapse on every row. Codegen'd
    * built-ins only, zero exchanges.
    */
  /** The synthesized HTML page both q97 and q98 extract from (and the
    * q97/q98 oracles re-synthesize in SQL — keep in sync with
    * [[HtmlSyntheticSql]]).
    */
  private[queries] def syntheticHtml: Column = {
    val did = col("doc_id").cast("string")
    concat(
      lit("<html><head><title>T"), did,
      lit("</title><style type=\"text/css\">p{color:red}</style></head>"),
      lit("<body><script>var x = 1 < 2;</script><h1>Doc "), did,
      lit("</h1><p>"), col("text"),
      lit(" &amp;x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      // hardening surface (r10 verdict #4): quoted attribute values
      // containing '>', numeric character references (dec + hex), a
      // double-encoded reference that must decode exactly once, and a
      // malformed reference that must pass through verbatim
      lit(" <a href=\"x>y\" title='z>w'>L</a> caf&#233; &#xE9; &amp;#65; &apos;a&apos; &#xZZ;</p>"),
      // r12 hardening: WHATWG named references beyond the classic six
      // (incl. the longest table name), a double-encoded NAMED ref
      // (decode-once), an unknown name (verbatim), and a sloppy
      // unpaired-quote tag that only the `<[^>]+>` cleanup pass strips
      // (placed after the last quoted attribute so the quote-aware
      // pass cannot pair its apostrophe with an earlier quote)
      lit("<p>caf&eacute; A&hellip;B &mdash; &copy;7 x&CounterClockwiseContourIntegral;y &amp;eacute; &notareal; <i title=don't>it</i></p><!-- note --><br/></body></html>"))
  }


  private[queries] def q97(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), Quality.htmlToText(syntheticHtml).as("extracted"))
      .withColumn("n_extracted", length(col("extracted")).cast("bigint"))
      .orderBy(col("doc_id"))


  /** End-to-end corpus-cleaning pipeline (the production composition
    * every training-data run executes): HTML → text
    * ([[Quality.htmlToText]]) → NFC canonicalization
    * ([[GraftFunctions.nfc_normalize]], with q93's decomposed-unicode
    * prefix so the normalizer does real work on every row) → length
    * gate → TRAINED quality gate
    * ([[Quality.hashedLinearProbVendored]] — the q152 classifier's
    * composed seat, round 17; rounded-probability threshold, the q18
    * round-then-compare discipline) → exact-dedup winner election
    * ([[Dedup.exactWinners]]) → deterministic md5-keyed 30% sample
    * (q61's oracle-shared rule). One shuffle total (the dedup hash
    * agg + semi-join; AQE broadcasts the winner side) — everything
    * else narrow; the classifier gate is a per-row projection at scan
    * speed. The oracle re-runs all six stages in SQL, so STAGE
    * COMPOSITION is what is checked, not any one operator.
    */
  private[queries] def q98(s: SparkSession, d: String): DataFrame = {
    // fan out WITH a pushdown barrier (Layouts.fanOutBarrier): a bare
    // repartition was tried first and REVERTED — the length gate's
    // filter pushed below it, so the heavy HTML+NFC chain still
    // evaluated on the narrow side; the barrier pins the whole chain
    // above the fan-out (identity at scale)
    val base = graft.ops.Layouts.fanOutBarrier(t(s, d, "documents"), "doc_id")
      .select(col("doc_id"), Quality.htmlToText(syntheticHtml).as("extracted"))
      .withColumn("clean",
        GraftFunctions.nfc_normalize(concat(lit(NfcPrefix), col("extracted"))))
      .where(length(col("clean")) >= 120)
    // the trained gate is a pure function of `clean`, and every row of
    // an exact-dup group shares `clean` — so gating winners equals
    // gating the corpus (drop-the-group commutes with min-id
    // election), and the engine evaluates the classifier on the
    // cheaper side: once per surviving row after election, instead of
    // once per corpus row on BOTH sides of the winner semi-join (the
    // oracle states the gate before election; identical by
    // commutation)
    Dedup.exactWinners(base, "doc_id", "clean")
      .where(round(Quality.hashedLinearProbVendored(col("clean")), 6) >= 0.5)
      .where(GraftFunctions.md5_long62(
        concat(lit("s:"), col("doc_id").cast("string"))) % 10 < 3)
      .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
        length(col("clean")).cast("bigint").as("n_clean"))
      .orderBy(col("doc_id"))
  }


  /** Incremental corpus refresh ([[graft.ops.Cdc.incrementalRefresh]]
    * — q136's snapshot diff DRIVING the recompute decision, composed
    * with q98's pipeline): between the old snapshot and q136's
    * mutated current one, only changed+added documents re-run the
    * heavy per-document derivation (html extract → NFC → length gate
    * → md5/len manifest row); unchanged documents carry their
    * manifest rows forward with their text never re-read; removed
    * documents drop. The corpus-GLOBAL q98 stages (exact-dedup winner
    * election, deterministic 30% sample) then run over the merged
    * manifest's 40-byte rows — election by the stored `clean_md5`,
    * never by payload. Because the derivation is deterministic
    * per-document, the refreshed output must equal running q98's
    * whole chain on the current snapshot from scratch — which is
    * exactly what the oracle does (q136's mutation CTEs feeding
    * q98's stage CTEs).
    */
  private[queries] def q140(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val old = docs.select(col("doc_id"), col("text"))
    val cur = docs.where(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 7, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.where(col("doc_id") % 10 === 4)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    // q98's per-document stages: deterministic in (doc_id, text), so
    // carried-forward rows equal what recomputing would produce
    // the q137 manifest shape: fan-out → heavy projection → checkpoint
    // of the NARROW manifest rows → gate ABOVE the checkpoint (the
    // length gate is a pure function of n_clean, so filtering the
    // manifest equals filtering on clean — and it cannot push back to
    // the single-partition scan side). An earlier variant that
    // checkpointed the RAW text rows below the projection measured 2x
    // slower and was reverted.
    def derive(df: DataFrame): DataFrame =
      graft.ops.Layouts.fanOutByKey(df, "doc_id")
        .select(col("doc_id"), Quality.htmlToText(syntheticHtml).as("extracted"))
        .withColumn("clean",
          GraftFunctions.nfc_normalize(concat(lit(NfcPrefix), col("extracted"))))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("bigint").as("n_clean"))
        .localCheckpoint(true)
        .where(col("n_clean") >= 120)
    val merged = graft.ops.Cdc.incrementalRefresh(
      old, cur, derive(old), "doc_id", "text")(derive)
    // q98's corpus-global stages over MANIFEST rows only: winner
    // election keyed by the stored hash, then the md5 sample
    val winners = merged.groupBy(col("clean_md5"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    merged.join(winners, Seq("doc_id"), "left_semi")
      .where(GraftFunctions.md5_long62(
        concat(lit("s:"), col("doc_id").cast("string"))) % 10 < 3)
      .select(col("doc_id"), col("clean_md5"), col("n_clean"))
      .orderBy(col("doc_id"))
  }


  /** URL-canonicalization-keyed exact dedup
    * ([[GraftFunctions.url_normalize]]): pairs of URL spellings that
    * crawl data uses interchangeably — mixed-case scheme/host, FQDN
    * trailing dot, unicode vs punycode host (IDN fold), explicit
    * default port, percent-encoded unreserved chars, lowercase vs
    * uppercase reserved triplets, empty-vs-absent path and query,
    * userinfo, fragments — are synthesized deterministically from
    * doc_id (variant = doc_id parity, logical key = doc_id/2) and must
    * collapse to ONE canonical key. The oracle constructs the expected
    * canonical string DIRECTLY from the synthesis parameters (punycode
    * constant interpolated from the same `java.net.IDN.toASCII` call
    * the engine makes) and runs the same min-id winner election — any
    * normalization drift splits a group and breaks rows, winners and
    * counts at once. Narrow codegen'd projection + one hash agg.
    */
  private[queries] def q99(s: SparkSession, d: String): DataFrame = {
    val k = floor(col("doc_id") / 2).cast("long")
    val v1 = col("doc_id") % 2 === 1
    val scheme = when(k % 5 === 0, when(v1, lit("HTTPS")).otherwise(lit("https")))
      .otherwise(when(v1, lit("HTTP")).otherwise(lit("http")))
    val host = when(k % 3 === 0,
        when(v1, lit("EXAMPLE.COM.")).otherwise(lit("example.com")))
      .when(k % 3 === 1,
        when(v1, lit("MÜNCHEN.de")).otherwise(lit("xn--mnchen-3ya.de")))
      .otherwise(when(v1, lit("SHOP.Example.Co.UK")).otherwise(lit("shop.example.co.uk")))
    val port = when((k % 4 === 0) && v1,
        when(k % 5 === 0, lit(":443")).otherwise(lit(":80")))
      .when(k % 4 === 2, lit(":8080"))
      .otherwise(lit(""))
    val path = when(k % 7 === 0, when(v1, lit("/")).otherwise(lit("")))
      .otherwise(concat(lit("/p/"), k.cast("string"),
        when(v1, lit("/%61%7Eb%2fq")).otherwise(lit("/a~b%2Fq"))))
    val query = when(k % 2 === 0,
        concat(lit("?id="), k.cast("string"),
          when(v1, lit("&t=%63%20d")).otherwise(lit("&t=c%20d"))))
      .otherwise(when(v1, lit("?")).otherwise(lit("")))
    val frag = when(v1, concat(lit("#sec"), k.cast("string"))).otherwise(lit(""))
    val raw = concat(scheme, lit("://"),
      when(v1, lit("user@")).otherwise(lit("")), host, port, path, query, frag)
    t(s, d, "documents")
      .select(col("doc_id"), GraftFunctions.url_normalize(raw).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("url_norm"), col("n_variants"))
      .orderBy(col("doc_id"))
  }


  /** Opt-in query-parameter sorting
    * ([[GraftFunctions.url_normalize]]`(url, sortQuery = true)`, the
    * crawler convention treating `?a=1&b=2` ≡ `?b=2&a=1`): pairs of
    * URL spellings differing ONLY in parameter order (duplicate keys
    * included, so full-token sort — not stable-by-key — is what is
    * checked) plus a fragment and mixed-case host on the odd variant
    * must collapse to ONE canonical key. The oracle constructs the
    * expected canonical string directly from the synthesis parameters
    * and runs the same min-id winner election (q99's pattern). Narrow
    * codegen'd projection + one hash agg.
    */
  private[queries] def q102(s: SparkSession, d: String): DataFrame = {
    val k = floor(col("doc_id") / 2).cast("long")
    val v1 = col("doc_id") % 2 === 1
    val host = when(v1, concat(lit("H"), (k % 10).cast("string"), lit(".Example.COM")))
      .otherwise(concat(lit("h"), (k % 10).cast("string"), lit(".example.com")))
    val query = when(v1, lit("?b=2&a=1&a=0")).otherwise(lit("?a=1&a=0&b=2"))
    val raw = concat(lit("http://"), host, lit("/p/"), k.cast("string"), query,
      when(v1, lit("#frag")).otherwise(lit("")))
    t(s, d, "documents")
      .select(col("doc_id"),
        GraftFunctions.url_normalize(raw, sortQuery = true).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_variants"))
      .select(col("doc_id"), col("url_norm"), col("n_variants"))
      .orderBy(col("doc_id"))
  }


  /** Per-domain quota cap ([[Sampling.domainCap]], the FineWeb
    * no-site-dominates rule): at most 10 docs per source, elected by
    * smallest md5(42:id) — a bounded typed-aggregation election plus
    * id-keyed semi-join, never a domain-keyed full-row window.
    */
  private[queries] def q82(s: SparkSession, d: String): DataFrame =
    Sampling.domainCap(t(s, d, "documents"), "source", "doc_id",
      quota = 10, seed = 42L)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))


  /** Token-budget mixture sampling ([[Sampling.tokenBudgetMix]]):
    * per-source admission in deterministic md5-shuffled order until
    * the source's TOKEN budget (1400) is exhausted — mixtures are
    * specified in tokens, not doc counts (q82's unit). The budget
    * straddles the per-source totals at this scale, so BOTH regimes
    * are load-bearing: under-budget sources pass through whole (no
    * ordering paid), over-budget sources flow through the per-source
    * cumulative window. The oracle restates the totals split, the
    * md5 admission order, and the running-sum cutoff.
    */
  private[queries] def q130(s: SparkSession, d: String): DataFrame =
    Sampling.tokenBudgetMix(t(s, d, "documents"), "doc_id", "text", "source",
      budget = 1400L, seed = "17")
      .orderBy(col("doc_id"))


  /** PER-SOURCE token budgets ([[Sampling.tokenBudgetMixWeighted]] —
    * the form a real mixture is specified in; q130's single budget is
    * the uniform special case): even-numbered sources get a 1300
    * budget that STRADDLES the per-source totals at gate scale (some
    * pass whole, some pay the admission window), odd-numbered sources
    * fall to the 50000 default (always under — the pass-through
    * regime), so the budget lookup, the default fill and both
    * admission regimes are all load-bearing in one answer. The oracle
    * restates the budget map as arithmetic over the source name and
    * chains q130's proven totals/cumsum CTEs against the per-source
    * budget.
    */
  private[queries] def q145(s: SparkSession, d: String): DataFrame = {
    val budgets = (0 until 20 by 2).map(i => s"src$i" -> 1300L).toMap
    val counted = t(s, d, "documents").select(col("doc_id"), col("source"),
      TextStats.tokenCount(col("text")).cast("long").as("n_tokens"))
    Sampling.tokenBudgetMixWeighted(counted, "doc_id", "n_tokens", "source",
        budgets, defaultBudget = 50000L, seed = "17")
      .orderBy(col("doc_id"))
  }


  /** Per-source corpus data card ([[Quality.dataCard]]): the summary
    * table every published dataset ships — docs, token mass, modal
    * language, corpus-wide exact-duplicate exposure — in one rollup.
    * The oracle restates all four ingredients from their
    * already-proven arithmetic: q20's token class, q24's language
    * table (per-doc guess, ties to the smaller lang), q17's exact
    * text hash (multiplicity > 1 CORPUS-wide, counted per source),
    * and the shared avg rounding.
    */
  private[queries] def q133(s: SparkSession, d: String): DataFrame =
    Quality.dataCard(t(s, d, "documents"), "doc_id", "text", "source")
      .orderBy(col("source"))


  /** The corpus SELECTION pipeline composed end to end — the four
    * stages every published training corpus actually runs, in their
    * production order, each already oracle-proven alone: q19's
    * quality gate (rounded score >= 0.5), q17's exact-dedup winners
    * (min id per text hash, WITHIN the gated set), an exact-dup-safe
    * train split (the q128 idea at exact granularity: the split
    * bucket is a pure function of the TEXT HASH, so byte-identical
    * docs can never straddle train/test, linearly oracle-restatable),
    * and q130's per-source token budget over the surviving train
    * docs. The oracle chains the same four CTE stages; the 1050
    * budget straddles the per-source train totals at gate scale so
    * both admission regimes stay load-bearing. Output = the final
    * training-corpus manifest.
    */
  private[queries] def q137(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.md5_long62
    // ONE narrow manifest pass over the text (r21, guide-§8 "decide on
    // small rows"): the previous shape evaluated the multi-regex
    // quality gate on BOTH sides of the winner election's join and
    // re-tokenized the text downstream. Here score, content hash and
    // token count are computed in a single projection, checkpointed,
    // and every later stage — winner election (min-id per md5, exactly
    // Dedup.exactWinners' rule), the train bucket (a pure function of
    // the same md5) and the token-budget admission (the Counted face
    // over the stored counts) — rides 40-byte manifest rows. Same
    // stage math, same oracle, text read once.
    // (A fan-out barrier was also tried here and REVERTED — its
    // materialization + extra jobs cost more than the parallelized
    // gate saved.)
    // fan-out + projection + checkpoint + THEN the gate: the heavy
    // multi-regex projection runs cluster-wide above the fan-out
    // exchange (projections do not push through a repartition), the
    // checkpoint materializes only the 40-byte manifest rows, and the
    // gate filters ABOVE the checkpoint so it cannot push back down to
    // the single-partition scan side (the pushdown trap that sank the
    // earlier raw-docs barrier)
    val manifest = graft.ops.Layouts
      .fanOutByKey(t(s, d, "documents"), "doc_id")
      .select(col("doc_id"), col("source"),
        md5(col("text").cast("binary")).as("__md5"),
        TextStats.qualityScore(col("text")).as("__score"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"))
      .localCheckpoint(true)
      .where(col("__score") >= 0.5)
    val winners = manifest.groupBy(col("__md5"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val train = manifest.join(winners, Seq("doc_id"), "left_semi")
      .where(pmod(md5_long62(concat(lit("13"), lit(":"), col("__md5"))),
        lit(100L)) < 80)
    Sampling.tokenBudgetMixCounted(
        train.select(col("doc_id"), col("source"), col("n_tokens")),
        "doc_id", "n_tokens", "source", budget = 1050L, seed = "19")
      .orderBy(col("doc_id"))
  }


  /** BM25 query terms for q83 — drawn from the testdata vocabulary so
    * tf/df vary across documents at every scale factor.
    */
  private[queries] val Bm25Terms = Seq("spark", "join", "window", "hash", "customer")


  /** Okapi BM25 scoring ([[Quality.bm25]]): every document scored
    * against a fixed 5-term query; corpus stats are one broadcast
    * row, tf/dl are narrow array projections.
    */
  private[queries] def q83(s: SparkSession, d: String): DataFrame =
    Quality.bm25(t(s, d, "documents"), "doc_id", "text", Bm25Terms)
      .orderBy(col("doc_id"))


  /** Gopher rule-pack filter ([[Quality.gopherFilter]]): per-rule
    * boolean flags + composite keep for every document — all narrow
    * array projections, zero exchanges.
    */
  private[queries] def q84(s: SparkSession, d: String): DataFrame =
    Quality.gopherFilter(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))


  /** Corpus-wide frequent trigrams ([[Quality.topNgrams]]): gram-keyed
    * partial agg + bounded top-k, lexicographic tiebreak.
    */
  private[queries] def q85(s: SparkSession, d: String): DataFrame =
    Quality.topNgrams(t(s, d, "documents"), "text", n = 3, k = 20)


  /** Character-entropy quality signal
    * ([[graft.functions.GraftFunctions.char_entropy]]): per-document
    * Shannon entropy (nats) of the code-point distribution — the
    * reference-free junk detector (near-0 = degenerate repetition,
    * high = random/compressed noise; both tails are cut in web-corpus
    * cleaning). One codegen'd projection, zero exchanges, scan speed
    * at any corpus size; the codepoint-ordered accumulation inside the
    * expression makes the double oracle-reproducible before the 6-dp
    * round (q78's ln rule).
    */
  private[queries] def q86(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        round(GraftFunctions.char_entropy(col("text")), 6).as("entropy"))
      .orderBy(col("doc_id"))


  /** Gopher-family repetition metrics per document (Quality op). */
  private[queries] def q60(s: SparkSession, d: String): DataFrame =
    Quality.repetition(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))


  /** Deterministic per-language mixture sampling (Sampling op).
    * denom=100 so the strata rates discriminate even at the smallest
    * test SF (500 dense doc_ids) — with the default 10000 every id
    * would sit below every threshold and the filter would be a no-op.
    */
  private[queries] def q61(s: SparkSession, d: String): DataFrame =
    Sampling.stratified(t(s, d, "documents"), "lang", "doc_id",
        rates = Map("en" -> 0.5, "zh" -> 0.25), defaultRate = 0.1, denom = 100)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))


  /** [[graft.ops.FreqItems]] sketch size for q106: smaller than the
    * key cardinality at every SF (76 at sf0.001, 764 at sf0.1), so the
    * sketch genuinely approximates; exactly 3 keys sit above the n/k
    * guarantee threshold at every SF.
    */
  private[queries] val FreqItemsK = 16


  /** Misra–Gries heavy hitters over a zipf-like key. The key
    * `m DIV l_orderkey` (m = max key) of a ~uniform positive integer
    * is the classic power-law synthesis: P(v) ≈ 1/(v(v+1)), so item 1
    * carries ~50% of the stream, item 2 ~17%, item 3 ~8% — the domain
    * -frequency shape of a real crawl. Output follows q68's sketch
    * rule: the rows are the EXACT heavy hitters (count·k > n, from a
    * real groupBy) and the sketch contributes its two order-
    * independent guarantees as booleans — present-in-sketch and
    * underestimate-within-n/k — which the oracle states as TRUE.
    * Estimates themselves are merge-order-dependent and never emitted.
    */
  private[queries] def q106(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = t(s, d, "lineitem").where(col("l_orderkey") > 0)
    val keys = li
      .crossJoin(broadcast(li.agg(max(col("l_orderkey")).as("m"))))
      .select(concat(lit("pg"), expr("CAST(m DIV l_orderkey AS STRING)")).as("tok"))
    // n derives from the grouped counts, not a second raw-keys pass —
    // the two identical groupBy subtrees collapse into one shuffle via
    // exchange reuse, so the exact side scans lineitem once
    val grouped = keys.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    val n = grouped.agg(sum(col("exact_cnt")).as("n"))
    val sk = keys.as[String]
      .select(graft.ops.FreqItems(FreqItemsK).toColumn.name("sk"))
    val est = element_at(col("sk"), col("tok"))
    grouped
      .crossJoin(broadcast(n))
      .where(col("exact_cnt") * FreqItemsK > col("n"))
      .crossJoin(broadcast(sk))
      .select(col("tok"), col("exact_cnt"),
        est.isNotNull.as("in_sketch"),
        (est <= col("exact_cnt") &&
          (col("exact_cnt") - est) * FreqItemsK <= col("n")).as("within_bound"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** Real BPE token counting ([[GraftFunctions.bpe_encode_count]] —
    * rank-priority merge application under the vendored
    * `bpe_merges.tsv`, the genuine fertility numerator q52's regex
    * face only approximates): the shared case table covers
    * rank-vs-leftmost merge order, repeated characters, case
    * sensitivity, digit/punct runs, characters unseen in training,
    * single letters and non-ASCII. Oracle literals come from the
    * INDEPENDENT reference implementation in
    * `tools/train_bpe.py --cases` (the q104 rule: a non-engine path
    * over the shared case table).
    */
  /** The shared BPE case table (q126's oracle literals come from the
    * independent `tools/train_bpe.py --cases` over exactly these
    * texts; q155 composes corpora from them by whitespace-joined
    * repetition, which is count-ADDITIVE because the pretokenizer
    * never merges across whitespace).
    */
  private[queries] val BpeCases: Seq[(String, String)] = Seq(
    ("c01_common", "the of and to in"),
    ("c02_sentence", "the quick brown fox jumps over the lazy dog"),
    ("c03_tech", "data pipeline token count for training text"),
    ("c04_repeat", "aaaaaa thththth"),
    ("c05_case", "THE The the"),
    ("c06_punct", "dont stop: a test, with punctuation!"),
    ("c07_digits", "version 42 build 20260815"),
    ("c08_unseen", "zqxj zzzzqqqq"),
    ("c09_singles", "a b c d e"),
    ("c10_long", "internationalization of documentation"),
    ("c11_mixed", "spark query over table 7 rows; done."),
    ("c12_unicode", "caf\u00e9 \u65e5\u672c"))

  private[queries] def q126(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    BpeCases.toDF("case_id", "text")
      .select(col("case_id"),
        GraftFunctions.bpe_encode_count(col("text")).as("bpe_tokens"))
      .orderBy(col("case_id"))
  }

  /** PII redaction under the oracle ([[GraftFunctions.redact_pii]] —
    * the safety-filtering stage between extraction and tokenization):
    * the per-doc synthesis embeds one email (two on even ids), two
    * valid IPv4s (one at sentence end exercising the trailing-dot
    * strip), one `+`-prefixed phone, one 33-char secret key — and the
    * near-misses that must SURVIVE: a TLD-less `bad@host`, a 1-char
    * TLD `x@y.z`, an out-of-range octet `300.d.1.1`, a version string
    * `v1.2.3.d`, a 2-digit pin under the phone floor, a 31-char key
    * under the length gate. The engine scans the assembled text
    * generically; the oracle restates the clean text with placeholders
    * straight from the synthesis spec (the q16 rule), so every
    * boundary rule is load-bearing in one md5.
    */
  private[queries] def q127(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ds = (c: Column) => c.cast("string")
    val raw = concat(
      lit("reach u"), ds(id), lit("@ex"), ds(id % 7), lit(".org"),
      when(id % 2 === 0, concat(lit(" or u"), ds(id), lit("b@mail.net")))
        .otherwise(lit("")),
      lit(" not bad@host or x@y.z ip "),
      ds(id % 200), lit("."), ds((id * 3) % 256), lit(".7."), ds(id % 100),
      lit(" dead 300."), ds(id % 10), lit(".1.1 ver v1.2.3."), ds(id % 9),
      lit(" call +1 555-01"), ds(id % 10), lit("-"), ds(lit(1000) + id % 9000),
      lit(" pin "), ds(lit(10) + id % 90),
      lit(" key k"), md5(ds(id).cast("binary")),
      lit(" short n"), substring(md5(concat(ds(id), lit("s")).cast("binary")), 1, 30),
      // the r16 regression pinned IN THE ORACLE: a date must pass
      // through unredacted (the 4-2-2 phone guard) while the IP and
      // phone immediately AFTER it still redact — the exact adjacency
      // r15's date sentinel swallowed
      lit(" log 2024-07-15 "), ds(id % 200), lit(".44.55."), ds(id % 100),
      lit(" ts 2023-11-02 +1 555-02"), ds(id % 10), lit("-"), ds(lit(1000) + id % 9000),
      lit(" end 8.8.8.8."))
    t(s, d, "documents")
      .select(col("doc_id"), GraftFunctions.redact_pii(raw).as("r"))
      .select(col("doc_id"),
        md5(col("r.clean").cast("binary")).as("clean_md5"),
        length(col("r.clean")).cast("bigint").as("clean_len"),
        col("r.n_email"), col("r.n_ip"), col("r.n_phone"), col("r.n_key"))
      .orderBy(col("doc_id"))
  }
}

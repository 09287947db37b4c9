package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-repetition quality metrics — the Gopher-rules repetition
  * family (Rae et al. 2021, §A1.1: fraction of duplicated content and
  * mass of the most-frequent n-gram are the strongest single filters
  * for machine-generated / boilerplate text). Complements
  * [[graft.functions.TextStats]] (length/punct/stopword scoring) and
  * the dedup operators: dedup removes copies ACROSS documents, these
  * metrics flag repetition WITHIN one.
  */
object Quality {

  /** Whitespace tokens under the engine-pinned class `[ \t\n\r\f]+`
    * (same dialect-safe choice as token_count / q52 — Java `\s`
    * includes \x0B, RE2 does not).
    */
  private def words(text: Column): Column =
    filter(split(text, "[ \\t\\n\\r\\f]+"), w => w =!= "")

  /** Tag body that survives quoted attribute values containing `>`
    * (`<a href="a>b">`): a tag is a run of non-delimiter chars or
    * whole quoted strings. Alternation + classes only — Java regex and
    * RE2 interpret it identically, so the q97 oracle reuses it
    * verbatim.
    */
  private[graft] val TagBody = """(?:[^>"']|"[^"]*"|'[^']*')*"""

  /** HTML → text extraction (the first step of every web-corpus
    * pipeline): drop comments, script and style blocks whole (their
    * bodies are code, not text — including any raw `<` inside), strip
    * remaining tags (quoted attribute values may contain `>` —
    * [[TagBody]] — and a second `<[^>]+>` pass then cleans up
    * sloppy-but-common tags the quote-aware pass must skip, e.g.
    * `<p title=don't>` with a bare apostrophe in an unquoted
    * attribute: the r11 hardening would otherwise leak the whole tag
    * into the text), decode character references
    * ([[graft.functions.HtmlEntityHelper]]: the full WHATWG named
    * table + decimal/hex numeric, single-pass so double-encoded input
    * decodes exactly once), collapse whitespace, trim.
    *
    * Everything stays inside whole-stage codegen: regex passes are
    * Spark built-ins, the entity step is the codegen'd
    * `decode_html_entities` expression — one narrow projection, zero
    * exchanges, scan speed at any corpus size. The regex pattern set
    * is deliberately restricted to syntax Java regex and RE2 interpret
    * identically (lazy quantifiers, inline (?is) flags, `[^>]`-family
    * classes, alternation, explicit `[ \t\n\r]` whitespace — NOT `\s`,
    * whose class differs between the engines), so the q97 oracle
    * mirrors it verbatim.
    */
  def htmlToText(html: Column): Column = cleanFragment(stripNonText(html))

  /** The non-text removal half of [[htmlToText]]: comments, script and
    * style blocks dropped whole (bodies are code, not text). Shared
    * with [[mainContent]], which must remove them BEFORE splitting
    * into blocks — a `<p` inside a script literal must never open a
    * block.
    */
  private def stripNonText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, s"(?is)<script$TagBody>.*?</script>", " ")
    regexp_replace(noScript, s"(?is)<style$TagBody>.*?</style>", " ")
  }

  /** The tag-strip + entity-decode + whitespace half of [[htmlToText]],
    * applied per-block by [[mainContent]]. Same pass order as the
    * composed pipeline: quote-aware strip, sloppy-tag cleanup, decode
    * entities once, collapse `[ \t\n\r]` runs, trim.
    */
  private def cleanFragment(c: Column): Column = {
    val noTags = regexp_replace(c, s"<$TagBody>", " ")
    val noSloppy = regexp_replace(noTags, "<[^>]+>", " ")
    val decoded = graft.functions.GraftFunctions.decode_html_entities(noSloppy)
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** HTML block-level elements that open a new text block for
    * [[mainContent]] (the block/inline split of the HTML spec's
    * flow-content model — inline markup like `<a> <b> <span>` flows
    * inside a block, these start one). Alternation backtracks, so
    * one-letter prefixes (`p` vs `pre`) still match via the longer
    * alternative when `\b` rejects the short one.
    */
  private[graft] val BlockTags: String =
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|nav|header|footer|article|" +
      "section|aside|main|table|tr|td|th|blockquote|pre|figure|figcaption|form"

  /** jusText/Boilerpipe-style main-content extraction (Kohlschütter et
    * al., WSDM 2010; Pomikálek 2011): real pages are mostly chrome —
    * nav menus, footers, related-links rails — and the two features
    * that separate chrome from body text in those papers are BLOCK
    * LENGTH and LINK DENSITY. This operator splits a page into
    * block-level segments, scores each, and keeps blocks that are
    * long enough (`>= minLen` chars after tag-strip + entity decode)
    * and link-poor enough (chars inside `<a>` elements / total chars
    * `<= maxLinkDensity`): a nav `<li>` is 100% link text, a footer is
    * link-heavy boilerplate, the article `<p>` is neither.
    *
    * Mechanics: comments/script/style are removed first (a `<p` inside
    * a script literal must not open a block), then a marker is
    * inserted before every [[BlockTags]] opener and the page is split
    * on it. Per block: text via the [[htmlToText]] cleanup chain, link
    * chars by summing the cleaned `<a>…</a>` inner texts. Blocks whose
    * cleaned text is empty (pure-markup segments like `<nav><ul>`) are
    * not blocks.
    *
    * Everything is Spark built-ins + the codegen'd entity decoder in
    * ONE narrow projection — no exchange, no UDF; at 100 TB this runs
    * at scan speed next to [[htmlToText]]. The regex subset is the
    * same Java/RE2-identical dialect as [[htmlToText]] (q97 rule).
    *
    * @return struct(n_blocks, n_content, content_len, content_text):
    *         total non-empty blocks, blocks classified content, their
    *         total cleaned length, and their texts joined with " " in
    *         document order
    */
  def mainContent(html: Column, minLen: Int, maxLinkDensity: Double): Column = {
    require(minLen > 0, "minLen must be positive")
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      "maxLinkDensity must be in [0,1]")
    // strip any pre-existing U+0001 first: raw 0x01 bytes in crawl
    // HTML must not split blocks spuriously (the marker is ours alone)
    val marked = regexp_replace(
      regexp_replace(stripNonText(html), "\u0001", ""),
      s"(?i)<(?:$BlockTags)\\b", "\u0001$0")
    // <a> then whitespace+attributes or an immediate '>' — the
    // optional group keeps <abbr>/<article> from matching
    val anchorPat = s"(?is)<a(?:[ \\t\\n\\r]$TagBody)?>(.*?)</a>"
    val blocks = filter(
      transform(split(marked, "\u0001"), b =>
        struct(
          cleanFragment(b).as("txt"),
          aggregate(regexp_extract_all(b, lit(anchorPat), lit(1)), lit(0),
            (acc, a) => acc + length(cleanFragment(a))).as("link_chars"))),
      b => b.getField("txt") =!= "")
    val content = filter(blocks, b =>
      length(b.getField("txt")) >= minLen &&
        b.getField("link_chars").cast("double") / length(b.getField("txt")) <= maxLinkDensity)
    struct(
      size(blocks).cast("long").as("n_blocks"),
      size(content).cast("long").as("n_content"),
      coalesce(
        aggregate(content, lit(0L), (acc, b) => acc + length(b.getField("txt")).cast("long")),
        lit(0L)).as("content_len"),
      array_join(transform(content, _.getField("txt")), " ").as("content_text"))
  }

  /** Cross-document line-level dedup — C4-style boilerplate removal
    * (Raffel et al. 2020 §2.2 drop boilerplate lines; RefinedWeb and
    * CCNet apply the same idea): delete every line whose EXACT text
    * occurs in at least `minDocs` distinct documents (cookie banners,
    * nav menus, license footers), keeping each document's remaining
    * lines in their original order. Complements [[repetition]] (within
    * -doc) and [[Dedup]] (whole/near-doc): this removes SHARED
    * fragments from otherwise-unique documents.
    *
    * Contract details:
    *   - lines are `\n`-separated; blank lines (space-trimmed empty)
    *     are never dedup candidates — they are structure, and their
    *     document frequency is meaningless;
    *   - the count is DOCUMENT frequency (distinct docs containing the
    *     line), not occurrence count, so one spammy document cannot
    *     push its own refrain over the threshold;
    *   - a document whose every line is boilerplate survives with
    *     empty text — dropping such rows is the caller's filter.
    *
    * Scale shape: explode to (id, pos, line); the frequency pass runs
    * distinct-(id, line) then a (line)-keyed count — both partial-
    * aggregated, so the wide exchange carries each distinct (doc,
    * line) once, never per occurrence. The boilerplate set (df >=
    * minDocs) is tiny on real corpora; Spark/AQE broadcasts the anti-
    * join side when it is, and no driver collect happens either way.
    * Reassembly sorts each doc's surviving (pos, line) structs in one
    * id-keyed aggregate — the single text-carrying exchange.
    *
    * @return (idCol, textCol) with textCol rewritten, one row per input
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would delete every non-blank line)")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      .where(trim(col("__line")) =!= "")
      .select(col(idCol), col("__line")).distinct()
      .groupBy("__line").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDocs)
      .select("__line")
    val rebuilt = lines.join(boiler, Seq("__line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        "\n").as("__clean"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__clean"), lit("")).as(textCol))
  }

  /** Per-document LM cross-entropy — the CCNet / RedPajama
    * "perplexity filter" (Wenzek et al. 2020 §3.3 score documents
    * under a reference-corpus LM and keep the low-perplexity tail;
    * Gopher and LLaMA reuse the same signal). The production systems
    * use a KenLM 5-gram; this operator is the same pipeline shape
    * with an add-one-smoothed BIGRAM model — the model order is a
    * constant in the dataflow (higher orders only widen the count
    * tables), and a bigram stays exactly reproducible in the oracle's
    * SQL dialect.
    *
    * Model, per language `l` (languages never share statistics, as in
    * CCNet's per-language LMs): P(w2|w1) = (c_l(w1 w2) + 1) /
    * (c_l(w1) + V_l) with counts from `ref`, V_l = distinct unigrams
    * of `l` in `ref`. Score = -mean ln P over the document's bigrams,
    * rounded to 6 dp (ln is the one non-correctly-rounded-everywhere
    * primitive in the engine surface — measured: ~1/50k integer and
    * ~1/1.5k quotient inputs differ by 1 ulp between libms — so the
    * score is pinned at a precision 10 orders of magnitude above the
    * ulp noise). Documents with no bigram (<2 tokens) score
    * (0, null) — no evidence, caller picks the polarity, same
    * convention as [[repetition]] — and so do documents in a language
    * `ref` never saw (no V_l exists to smooth against).
    *
    * Scale shape: the count tables are (lang, gram)-keyed partial
    * aggregates — each distinct gram crosses the wire once per
    * partition, never per occurrence. Scoring explodes the scored
    * corpus to (id, lang, w1, w2) rows and joins the three count
    * relations on their gram keys: Zipf-shaped vocabularies keep the
    * count sides orders of magnitude smaller than the token stream,
    * so AQE broadcasts them when they fit and falls back to a
    * gram-keyed shuffle join (one row per gram on the build side — a
    * hot token skews the probe side only, which partial-aggregates
    * per (id, gram) first). No driver materialization; `ref` is
    * typically a curated slice (CCNet: Wikipedia) orders of magnitude
    * smaller than the scored corpus.
    *
    * @param ref   corpus the LM is trained on (needs textCol, langCol)
    * @param df    corpus to score (needs idCol, textCol, langCol)
    * @return (idCol, langCol, bigrams, lm_ce), one row per input row
    */
  def lmCrossEntropy(ref: DataFrame, df: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    def pairs(src: DataFrame, cols: Column*): DataFrame = {
      val w = words(col(textCol))
      val n1 = greatest(size(w) - 1, lit(0))
      src.select(cols :+ explode(arrays_zip(
          slice(w, lit(1), n1).as("w1"), slice(w, lit(2), n1).as("w2")))
        .as("__p"): _*)
        .select(cols :+ col("__p.w1").as("__w1") :+ col("__p.w2").as("__w2"): _*)
    }
    val uni = ref.select(col(langCol), explode(words(col(textCol))).as("__t"))
      .groupBy(col(langCol), col("__t")).agg(count(lit(1)).as("__cu"))
    val vocab = uni.groupBy(col(langCol)).agg(count(lit(1)).as("__v"))
    val bi = pairs(ref, col(langCol))
      .groupBy(col(langCol), col("__w1"), col("__w2")).agg(count(lit(1)).as("__cb"))
    val scored = pairs(df, col(idCol), col(langCol))
      .join(bi, Seq(langCol, "__w1", "__w2"), "left")
      .join(uni.withColumnRenamed("__t", "__w1"), Seq(langCol, "__w1"), "left")
      .join(vocab, Seq(langCol))
      .groupBy(col(idCol), col(langCol))
      .agg(
        count(lit(1)).as("bigrams"),
        round(-avg(log(
          (coalesce(col("__cb"), lit(0)).cast("double") + lit(1.0)) /
            (coalesce(col("__cu"), lit(0)).cast("double") + col("__v")))), 6)
          .as("lm_ce"))
    df.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol, langCol), "left")
      .select(col(idCol), col(langCol),
        coalesce(col("bigrams"), lit(0L)).as("bigrams"), col("lm_ce"))
  }

  /** Per-document repetition metrics:
    *
    *   - `words` / `distinct_words` — token counts;
    *   - `dup_word_frac` — 1 - distinct/total: mass of repeated tokens;
    *   - `top_word_frac` — mass of the single most frequent token;
    *   - `top_bigram_frac` — mass of the most frequent word bigram.
    *
    * Null metrics for an empty document (no tokens carries no
    * repetition evidence either way — callers decide the polarity).
    * Assumes `idCol` is unique (like the dedup operators): duplicate
    * ids would pool their tokens into one metric row per input row.
    *
    * Scale shape: two aggregation chains off the tokenized frame —
    * (id, token) partial-agg then (id) — so the wide exchanges carry
    * (id, token, count) partial rows, never document text; identical
    * tokens within a partition collapse map-side. Bigram arrays come
    * from `zip_with` over two slices of the SAME split (constant
    * re-evaluations under Catalyst's projection collapse — unlike
    * per-index `element_at(transform(sequence(...)))`, which is
    * O(tokens²) per row).
    *
    * @return (idCol, words, distinct_words, dup_word_frac,
    *         top_word_frac, top_bigram_frac), one row per input row
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), words(col(textCol)).as("__w"))

    def topMass(tokens: DataFrame, totalName: String, topFrac: String,
        distinctName: Option[String]): DataFrame = {
      val counts = tokens.groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      val aggs = Seq(
        sum(col("__c")).as(totalName),
        max(col("__c")).as("__top")) ++
        distinctName.map(n => count(lit(1)).as(n))
      counts.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
        .withColumn(topFrac, round(col("__top").cast("double") / col(totalName), 6))
        .drop("__top")
    }

    val wordStats = topMass(
      base.select(col(idCol), explode(col("__w")).as("__t")),
      "words", "top_word_frac", Some("distinct_words"))
    val bigramStats = topMass(
      base.select(col(idCol), explode(zip_with(
        slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))),
        slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("__t")),
      "__bigrams", "top_bigram_frac", None)

    df.select(col(idCol))
      .join(wordStats, Seq(idCol), "left")
      .join(bigramStats, Seq(idCol), "left")
      .select(
        col(idCol),
        col("words"),
        col("distinct_words"),
        round(lit(1.0) - col("distinct_words").cast("double") / col("words"), 6)
          .as("dup_word_frac"),
        col("top_word_frac"),
        col("top_bigram_frac"))
  }

  /** Okapi BM25 relevance of every document against a fixed term set
    * (Robertson & Walker 1994; the ElasticSearch/Lucene default) — the
    * retrieval-style scoring a training pipeline uses to mine
    * topic-targeted subsets from a raw corpus (e.g. phi-style "rank
    * the crawl by similarity to a seed query").
    *
    * score(d) = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) ·
    *            tf_td·(k1+1) / (tf_td + k1·(1 - b + b·|d|/avgdl))
    *
    * summed over `terms` in their given order (the sum order is part
    * of the definition here: floating-point addition does not
    * commute, and a pinned order is what lets an external SQL oracle
    * reproduce the score bit-for-bit before the 6-dp round —
    * [[lmCrossEntropy]]'s ln rule).
    *
    * Tokens are the lowercased alphanumeric runs of the text (the
    * q79/DSIR normalization). Scale shape: tf/|d| are narrow
    * codegen'd array projections — no explode, no (doc, term)
    * shuffle, because the term set is a query-sized constant; the
    * corpus statistics (N, Σ|d|, df per term) are ONE partial-agg row
    * broadcast back over the corpus, so the whole operator is two
    * narrow passes and a single-row exchange. At 100 TB the scan
    * dominates; there is nothing to skew.
    *
    * @param terms distinct query terms, already normalized (lowercase
    *              alphanumeric)
    * @return (idCol, dl, bm25) — dl the token count, bm25 rounded 6 dp
    */
  /** The vendored hashed-linear quality model: (buckets, bias,
    * weights) from `graft/quality_weights.tsv` — trained offline by
    * `tools/train_quality.py` (fastText-style mean-pooled hashed
    * unigram+bigram logistic model, Joulin et al. 2017, over the
    * engine's `hashed_grams` feature hash; deterministic, regenerable
    * with no network — the `bpe_merges.tsv` vendoring play). KB-sized
    * and loaded once per JVM.
    */
  lazy val hashedLinearModel: (Int, Double, Array[Double]) = {
    val in = getClass.getResourceAsStream("/graft/quality_weights.tsv")
    require(in != null, "vendored quality_weights.tsv missing from resources")
    val rows =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filterNot(l => l.startsWith("#") || l.isEmpty)
        .map(_.split("\t", 2)).toArray
      finally in.close()
    def field(k: String): String = rows
      .collectFirst { case Array(`k`, v) => v }
      .getOrElse(sys.error(s"quality_weights.tsv: missing '$k' line"))
    val buckets = field("buckets").toInt
    val bias = field("bias").toDouble
    val w = new Array[Double](buckets)
    rows.foreach {
      case Array(k, v) if k.nonEmpty && k.forall(_.isDigit) =>
        // curated-error discipline for a regenerated/hand-edited TSV:
        // an out-of-range or Int-overflowing index names the file and
        // line instead of a raw ArrayIndexOutOfBounds/NumberFormat
        if (k.length > 9)
          sys.error(s"quality_weights.tsv: weight index '$k' overflows Int")
        val idx = k.toInt
        if (idx >= buckets)
          sys.error(s"quality_weights.tsv: weight index $idx out of range " +
            s"for buckets=$buckets (line '$k\t$v')")
        w(idx) = v.toDouble
      case _ =>
    }
    (buckets, bias, w)
  }

  /** fastText-style hashed-linear quality score (Joulin et al. 2017;
    * the architecture of the CCNet / web-corpus quality classifiers):
    * `p = sigmoid(bias + mean over gram occurrences of
    * weights[bucket(gram)])` with the engine's `hashed_grams`
    * unigram+bigram md5 buckets as the feature hash. The standard
    * corpus-quality STAGE the rule-based family (gopherFilter,
    * TextStats scores) cannot express: a trained decision boundary
    * over n-gram evidence, swappable for any production-trained
    * (bias, weights) table without touching the scorer.
    *
    * Scale shape: the weight table is inlined as an array literal
    * (8 KB at 1024 buckets — the IVF-codebook inlining discipline),
    * so scoring is ONE narrow per-row projection: hash the grams,
    * fold the lookups, sigmoid — no explode, no join, no shuffle,
    * nothing driver-side; a gramless document scores
    * `sigmoid(bias)`. At fastText-production bucket counts (2M+),
    * inlining would blow the codegen budget — the explode +
    * broadcast-join form is the alternative at that scale (the
    * weights frame broadcasts; one exchange of (doc, bucket) rows).
    *
    * @return (idCol, quality_prob rounded 6 dp, keep = prob >= 0.5)
    */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      bias: Double, weights: Array[Double]): DataFrame = {
    val prob = hashedLinearProb(col(textCol), bias, weights)
    // threshold on the ROUNDED probability (the q18 round-then-compare
    // discipline): exp() may differ by an ulp across engines, and an
    // unrounded >= 0.5 gate would let that flip a label
    df.select(col(idCol),
      round(prob, 6).as("quality_prob"),
      (round(prob, 6) >= 0.5).as("keep"))
  }

  /** The classifier probability as a composable COLUMN — the form a
    * pipeline gates on (`where(hashedLinearProb(...) >= 0.5)`, q98's
    * seat) without materializing a score frame.
    */
  def hashedLinearProb(text: Column, bias: Double,
      weights: Array[Double]): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    // the logit is ONE fused codegen'd expression (tokenize + hash +
    // weight lookup + mean pooling, HashingHelper.hashedLinearZ): the
    // equivalent aggregate(hashed_grams(...)) lambda-HOF form demotes
    // the enclosing projection/filter to interpreted evaluation and
    // tripled q98's corpus pass (same IEEE fold either way)
    val z = graft.functions.GraftFunctions.hashed_linear_z(text, weights, bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** [[hashedLinearProb]] with the vendored model. */
  def hashedLinearProbVendored(text: Column): Column = {
    val (_, bias, w) = hashedLinearModel
    hashedLinearProb(text, bias, w)
  }

  /** [[hashedLinearScore]] with the vendored model
    * ([[hashedLinearModel]]) — the ready-to-run classifier face.
    */
  def hashedLinearQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (_, bias, w) = hashedLinearModel
    hashedLinearScore(df, idCol, textCol, bias, w)
  }

  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.distinct == terms, "terms must be distinct")
    require(k1 > 0 && b >= 0 && b <= 1, "k1 > 0, b in [0, 1]")
    // tokenize ONCE per row behind an aliased projection (q85's
    // lesson): the terms loop references the token array per term,
    // and an inline tokenizer expression would re-split per reference
    val toks = col("__toks")
    val base = df
      .select(col(idCol), filter(
        split(lower(regexp_replace(col(textCol), "[^a-zA-Z0-9]+", " ")), " "),
        w => w =!= "").as("__toks"))
      .select(
        col(idCol) +: size(toks).cast("long").as("__dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(toks, w => w === lit(t))).cast("long").as(s"__tf$i")
          }: _*)
    val aggs = count(lit(1)).cast("double").as("__n") +:
      (sum(col("__dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl") +:
      terms.indices.map(i =>
        sum((col(s"__tf$i") > 0L).cast("long")).cast("double").as(s"__df$i"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val score = terms.indices.foldLeft(lit(0.0)) { (acc, i) =>
      val dfT = col(s"__df$i")
      val tf = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) + (col("__n") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      acc + idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl").cast("double") / col("__avgdl")))
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), col("__dl").as("dl"), round(score, 6).as("bm25"))
  }

  /** Gopher-style document filter rule-pack (Rae et al. 2021 §A1.1) —
    * the composite keep/drop gate a cleaning pipeline actually runs,
    * with one boolean per rule so drops are attributable:
    *
    *   - `r_words`      word count in [minWords, maxWords]
    *   - `r_mean_len`   mean word length in [3, 10] (alnum chars/words)
    *   - `r_alpha`      ≥80% of words contain a letter
    *   - `r_stop`       ≥2 DISTINCT stopwords present
    *   - `r_symbol`     (# + ellipsis occurrences)/words ≤ 0.1
    *   - `r_dup`        repeated-word mass ≤ maxDupFrac (word-level
    *                    stand-in for Gopher's dup-line family —
    *                    `array_distinct` keeps it narrow; the
    *                    line-level siblings are [[lineDedup]]/q69 and
    *                    [[repetition]]/q60)
    *
    * `keep` = every rule passes. All rules are narrow codegen'd array
    * projections — zero exchanges at any corpus size, the filter runs
    * at scan speed and pushes behind column pruning. Ratio thresholds
    * compare IEEE-exact divisions (no ln), so the booleans are
    * engine-reproducible without rounding.
    *
    * @return (idCol, words, r_*, keep), one row per input row
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      maxDupFrac: Double = 0.3): DataFrame = {
    // tokenize ONCE per row behind an aliased projection (q85's
    // lesson): four of the six rules reference the token array, and an
    // inline tokenizer expression would re-split per reference
    val w = col("__w")
    val nw = size(w).cast("long")
    val nwD = nw.cast("double")
    val meanLen = length(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""))
      .cast("double") / nwD
    val alphaFrac = size(filter(w, t => t.rlike("[a-zA-Z]"))).cast("double") / nwD
    val stops = array(graft.functions.TextStats.Stopwords.map(lit): _*)
    val distinctStops = size(array_intersect(array_distinct(w), stops))
    val symbols = (length(col(textCol)) - length(regexp_replace(col(textCol), "#", ""))) +
      (length(col(textCol)) - length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3
    val dupFrac = lit(1.0) - size(array_distinct(w)).cast("double") / nwD
    // (nw > 0) && … short-circuits the divide-by-zero NULLs of an
    // empty document to plain false in both engines' 3VL
    val rules = Seq(
      (nw >= minWords && nw <= maxWords).as("r_words"),
      (nw > 0 && meanLen >= 3.0 && meanLen <= 10.0).as("r_mean_len"),
      (nw > 0 && alphaFrac >= 0.8).as("r_alpha"),
      (distinctStops >= 2).as("r_stop"),
      (nw > 0 && symbols.cast("double") / nwD <= 0.1).as("r_symbol"),
      (nw > 0 && dupFrac <= maxDupFrac).as("r_dup"))
    df.select(col(idCol), col(textCol), words(col(textCol)).as("__w"))
      .select(col(idCol) +: nw.as("words") +: rules: _*)
      .withColumn("keep",
        col("r_words") && col("r_mean_len") && col("r_alpha") &&
          col("r_stop") && col("r_symbol") && col("r_dup"))
  }

  /** Corpus-wide most-frequent word n-grams — the boilerplate
    * discovery pass that feeds [[lineDedup]]-style removal and the
    * df-cap choices of the dedup family (a gram in the top-k here is
    * exactly the q69-regime content [[graft.ops.Dedup]] caps away).
    *
    * Scale shape: (gram)-keyed partial aggregation — hot grams
    * collapse map-side, the exchange carries (gram, count) — then a
    * `TakeOrderedAndProject` top-k (per-partition heaps + driver
    * merge of k rows), never a global sort. Ties break
    * lexicographically so the result is total-ordered and
    * engine-reproducible.
    *
    * @return (gram, n) — the k most frequent, count desc then gram asc
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(k >= 1, "k must be >= 1")
    // Tokenize ONCE per row behind an aliased projection: referencing
    // the tokenizer expression directly inside the transform lambda
    // would re-evaluate the split per element_at — O(tokens²) per
    // document (measured: 14-17 s → 1.5 s at sf0.1). The multi-use
    // non-cheap alias stops CollapseProject from inlining it back.
    val toks = df.select(words(col(textCol)).as("__w"))
    val w = col("__w")
    // the when-guard matters: sequence(1, size-(n-1)) DESCENDS for a
    // document shorter than n words (index 0 → element_at error);
    // explode drops the null branch
    val grams = when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
    toks.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
  }

  /** The per-source corpus DATA CARD — the summary table every
    * published dataset ships (docs, token mass, dominant language,
    * exact-duplicate exposure) rolled up in one pass per source.
    *
    * Columns: n_docs, total_tokens / avg_tokens (the pinned
    * whitespace class), top_lang (modal
    * [[graft.functions.TextStats.langGuess]], ties to the
    * lexicographically smallest), n_exact_dup (docs whose exact text
    * occurs more than once CORPUS-WIDE — the q17 notion, so a
    * source's column reflects its cross-source exposure too).
    *
    * Scale shape: one narrow projection computes all per-doc scalars;
    * corpus-wide multiplicity is a count-over-window keyed on the
    * text hash (one hash exchange, same bytes a dedup groupBy would
    * move); the rollup is one partial-aggregated groupBy(source);
    * the language mode ranks the tiny (source × lang) count table —
    * the window sorts aggregates, never documents.
    *
    * A NULL source is coalesced to the sentinel `(unknown)` up front:
    * the stats/top-lang inner join never matches null keys, so
    * without the sentinel every null-source document would vanish
    * from the card and the totals would understate the corpus.
    */
  def dataCard(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
      coalesce(col(sourceCol), lit("(unknown)")).as("source"),
      graft.functions.TextStats.tokenCount(col(textCol)).cast("long").as("tc"),
      graft.functions.TextStats.langGuess(col(textCol)).as("guess"),
      md5(col(textCol).cast("binary")).as("__h"))
    val flagged = base.withColumn("__nh",
      count(lit(1)).over(Window.partitionBy(col("__h"))))
    val stats = flagged.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("tc")).as("total_tokens"),
      round(sum(col("tc")).cast("double") / count(lit(1)), 6).as("avg_tokens"),
      sum(when(col("__nh") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
    val langCounts = base.groupBy(col("source"), col("guess"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__cnt").desc, col("guess"))
    val topLang = langCounts
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("source"), col("guess").as("top_lang"))
    stats.join(topLang, Seq("source"))
  }
}

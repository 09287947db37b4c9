package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality
  * scoring, token statistics, and a lightweight language-ID heuristic.
  * Everything is built-in compositions (codegen'd, no UDFs) and — where
  * results must be verifiable — deliberately oracle-expressible in
  * ANSI SQL.
  */
object TextStats {

  /** Lowercased alphanumeric tokens (same definition as
    * [[graft.ops.Dedup.tokens]] — keep in sync with oracle SQL).
    */
  def tokens(text: Column): Column =
    filter(split(lower(regexp_replace(text, "[^a-zA-Z0-9]+", " ")), " "), x => x =!= "")

  /** PII scrub patterns, deliberately RE2-safe (no lookaround, no
    * backreferences) so the SAME pattern text means the same thing to
    * Spark's Java regex and the DuckDB oracle's RE2 — the q52/q36
    * dialect-pinning rule applied to redaction. `\d`/`\b` are ASCII in
    * both dialects. Order matters: emails before phones (a phone
    * pattern must not eat the digits of an address's local part —
    * scrubbed emails leave no digits behind), IPs before phones
    * (dotted quads are digit runs a loose phone pattern would split).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  /** Phone spans: >= 7 digits with at most 2 separator chars
    * (space/paren/hyphen) between consecutive digits. The bounded
    * inter-digit gap keeps prose numeral SEQUENCES intact — a year
    * range like "1914 - 1918" (3-char gap) is two numbers, not a
    * phone — while still matching "+1 (555) 123-4567" shapes.
    * Deliberate recall-over-precision residual: any single >= 7-digit
    * run with tight separators ("1914-1918", order ids) still
    * redacts; a pre-training scrub prefers over-redaction of rare
    * numerals to leaked PII, and RE2-safety (no lookaround) rules out
    * digit-count assertions that could tell the cases apart.
    */
  val PhonePattern = "\\+?\\d([ ()-]{0,2}\\d){6,}"

  /** Redact email / IPv4 / phone-shaped spans to typed placeholders —
    * the standard pre-training scrub stage. One codegen'd projection
    * (three chained `regexp_replace`), embarrassingly parallel, no
    * shuffle; run it before tokenization so counts see placeholders,
    * not fragments.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Token count on the raw whitespace definition. The whitespace
    * class is pinned EXPLICITLY to `[ \t\n\r\f]+`: Java's `\s`
    * includes \x0B (vertical tab) while RE2's (DuckDB's) does not, so
    * a bare `\s+` silently diverges between engine and oracle on
    * \x0B-containing documents. Keep in sync with
    * [[graft.functions.GraftFunctions.token_count]] and the q19/q20/q36
    * oracle SQL.
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graft.GraftShims.column(
      TokenCount(org.apache.spark.sql.graft.GraftShims.expression(text)))

  /** Fraction of characters that are not alphanumeric or space. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
      .cast("double") / length(text).cast("double")

  /** A small fixed English stopword list (public knowledge). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "or", "be", "this", "that", "are")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val stops = array(Stopwords.map(lit): _*)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => array_contains(stops, x))).cast("double")
        / size(t).cast("double"))
  }

  /** Mean token length (alphanumeric chars / token count). */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(length(regexp_replace(lower(text), "[^a-z0-9]", ""))
        .cast("double") / size(t).cast("double"))
  }

  /** Composite quality score in [0,1]-ish: rewards moderate length,
    * low punctuation noise, and natural stopword density. The exact
    * formula is arbitrary but fixed — it is part of the declared,
    * oracle-checked surface.
    */
  def qualityScore(text: Column): Column =
    round(org.apache.spark.sql.graft.GraftShims.column(
      QualityScoreRaw(org.apache.spark.sql.graft.GraftShims.expression(text))), 6)

  /** The pre-r22 composed form of [[qualityScore]] — the reference
    * tree the fused [[QualityScoreRaw]] expression is property-pinned
    * against (OpsPropertySpec). Not used by any query path.
    */
  private[graft] def qualityScoreComposed(text: Column): Column =
    round(
      least(tokenCountComposed(text).cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
        + (lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))) * lit(0.3)
        + least(stopwordRatio(text) * lit(5.0), lit(1.0)) * lit(0.3),
      6)

  /** The pre-r22 composed form of [[tokenCount]] — the reference the
    * fused [[TokenCount]] expression is property-pinned against.
    */
  private[graft] def tokenCountComposed(text: Column): Column =
    size(split(trim(text), "[ \\t\\n\\r\\f]+"))

  /** Language-ID heuristic: score each candidate language by hits of
    * its characteristic function-word set; argmax, ties →
    * lexicographically first. Delegates to the codegen'd expression —
    * the equivalent built-in formulation (one interpreted HOF `filter`
    * per language plus re-tokenization under projection collapse) was
    * ~10x slower per row.
    */
  def langGuess(text: Column): Column =
    org.apache.spark.sql.graft.GraftShims.column(
      LangGuess(org.apache.spark.sql.graft.GraftShims.expression(text)))
}

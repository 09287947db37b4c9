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
}

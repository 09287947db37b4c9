package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing primitive of a
  * training pipeline (per-source / per-language mixture weights over a
  * raw corpus).
  *
  * Rows are kept by a pure predicate on the id: `pmod(id, denom) <
  * rate * denom`. Compared to `rand()`-based sampling this is
  *
  *   - reproducible: the same corpus and rates select the same rows on
  *     every run, engine, and cluster size — a rerun of one failed
  *      100 TB job stage samples the SAME subset (rand() is re-seeded
  *     per task attempt, so a retry silently changes the sample);
  *   - narrow: a codegen'd filter, no shuffle, no state, pushes past
  *     column pruning like any other predicate;
  *   - oracle-expressible: plain modular arithmetic any SQL engine
  *     reproduces bit-for-bit.
  *
  * The id should be uniform modulo `denom` (dense ids, a hash, or any
  * id without periodic structure). Correlated ids (e.g. all-even)
  * bias the sample exactly as they would bias any mod-based bucketing.
  * Negative ids are well-defined (`pmod` is non-negative) but note
  * that plain SQL `%` follows the dividend's sign — an external
  * reimplementation must use a positive modulus for negative ids.
  */
object Sampling {

  /** Keep each row with its stratum's rate (`strataCol` value → rate in
    * [0, 1]); strata not listed fall back to `defaultRate`.
    *
    * @param denom sampling resolution: rates are rounded to the
    *              NEAREST whole 1/denom step (default 10000 = 0.01%
    *              steps). Rounding, not truncation: `0.29 * 100`
    *              is `28.999…` in binary floating point, and a
    *              truncating cast would silently sample an exact
    *              whole-step rate one step low.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      denom: Int = 10000): DataFrame = {
    require(denom > 0, "denom must be positive")
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val threshold = rates.foldLeft(lit(math.round(defaultRate * denom)): Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(math.round(rate * denom))).otherwise(acc)
    }
    df.where(pmod(col(idCol), lit(denom.toLong)) < threshold)
  }

  /** Deterministic fractional upsampling — the mixture-weighting dual
    * of [[stratified]] ("2.3 epochs of source X" in a training-data
    * recipe): every row is replicated `floor(epochs)` times, plus one
    * more for the stable id-keyed fraction of rows selected by the
    * same `pmod(id, denom)` predicate — so a 2.3-epoch stratum emits
    * each row 2× and a fixed 30% of its rows 3×, identically on every
    * run, engine, and retry (a `rand()`-based upsample changes the
    * extra-epoch subset per task attempt).
    *
    * Output = input columns + `epoch` (1..copies); rows in a 0-epoch
    * stratum (or outside the fractional subset at epochs < 1)
    * disappear, so `upsample` subsumes downsampling too.
    *
    * Scale shape: a narrow `explode(sequence(...))` — zero exchanges;
    * replication happens where the row already lives and only the
    * downstream consumer shuffles the upsampled stream.
    */
  def upsample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      epochs: Map[String, Double],
      defaultEpochs: Double = 1.0,
      denom: Int = 10000): DataFrame = {
    require(denom > 0, "denom must be positive")
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 100.0),
      "epochs must be in [0, 100]")
    val e = epochs.foldLeft(lit(defaultEpochs): Column) {
      case (acc, (stratum, v)) => when(col(strataCol) === stratum, lit(v)).otherwise(acc)
    }
    val copies = floor(e).cast("long") +
      when(pmod(col(idCol), lit(denom.toLong)) < round((e - floor(e)) * denom), 1L)
        .otherwise(0L)
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .select(df.columns.toIndexedSeq.map(col) :+
        explode(sequence(lit(1L), col("__copies"))).as("epoch"): _*)
  }

  /** Deterministic global shuffle — the epoch-ordering primitive: a
    * reproducible pseudo-random permutation of the corpus, keyed by
    * `(seed, id)`. Training runs need the SAME shuffle order on every
    * rerun/resume (a `rand()` sort is re-seeded per task attempt and
    * not checkpoint-stable), and a different-but-equally-deterministic
    * order per epoch — vary `seed`.
    *
    * Ordering key is `md5(seed || ':' || id)` — md5 because it is the
    * one keyed hash every engine evaluates identically (the same
    * reason the simhash/winnowing surfaces build on it), so the
    * permutation is oracle-reproducible bit-for-bit. Ties are
    * impossible for distinct ids (equal digests would be a collision);
    * the id is appended as a tiebreak column anyway so the sort is
    * total even with duplicate ids.
    *
    * Scale shape: one range exchange on the digest (Spark samples
    * range boundaries, then each partition sorts locally) — the
    * standard distributed sort; at 100 TB this is exactly the shuffle
    * a global permutation costs, and nothing more. The output order is
    * the DATASET order (write it with `sortWithinPartitions`-stable
    * sinks or zip with a row number downstream).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.orderBy(md5(concat_ws(":", lit(seed), col(idCol))), col(idCol))
}

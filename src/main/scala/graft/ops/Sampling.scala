package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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

  /** DSIR data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): pick `k`
    * documents from `raw` whose hashed-n-gram distribution resembles
    * the curated `target` corpus. Features are unigram+bigram counts
    * hashed into `buckets` bins ([[graft.functions.HashingHelper
    * .dsirBuckets]]); bucket distributions p (target) and q (raw) get
    * add-one smoothing; a document's importance weight is
    * `log w(x) = Σ_b c_b(x)·(ln p_b − ln q_b)`, and selection is
    * Gumbel-top-k over `log w + g_id` — the exact sample-without-
    * replacement-∝-w(x) construction the paper uses, with the Gumbel
    * noise derived from `md5(seed:id)` instead of an RNG so the
    * selected set is identical on every run, engine, cluster size and
    * task retry (the [[stratified]]/[[deterministicShuffle]] rule).
    *
    * Scale shape: gram hashing is a narrow codegen'd projection; the
    * three count frames are bucket-keyed partial aggregates (the wide
    * exchanges carry (bucket, count) / (id, bucket, count), never
    * text). The per-bucket log-ratio table has at most `buckets` rows
    * — bounded and broadcast explicitly (10k buckets ≈ 160 KB; the
    * guard caps it at 2^24) — so scoring is one broadcast-join pass
    * over the per-doc bucket counts, and the final top-k is
    * `TakeOrderedAndProject` (per-partition heaps + driver merge of k
    * rows), never a single-partition sort.
    *
    * The weight arithmetic uses `ln`: the selected SET is ulp-robust (keys
    * collide only at ~1e-14 gaps, measure-zero under Gumbel noise) and
    * the reported weight is rounded to 6 dp like every ln-derived
    * surface (see [[Quality.lmCrossEntropy]]).
    *
    * Documents with no grams (empty text) have no feature evidence and
    * are never selected.
    *
    * @return (idCol, log_weight) — the k selected rows
    */
  def dsirResample(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 8192, seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    require(buckets > 0 && buckets <= (1 << 24),
      "buckets must be in [1, 2^24] (the log-ratio table is broadcast)")
    import graft.functions.GraftFunctions.{hashed_grams, md5_long62}
    val bD = lit(buckets.toDouble)
    // fan both gram passes out (md5 per token occurrence is the CPU;
    // identity at scale — Layouts.fanOutByKey). dc is consumed twice
    // (raw totals + scoring join) but deliberately NOT checkpointed:
    // its per-doc bucket rows are ~tokens-sized, so materializing them
    // measured costlier than re-running the now-parallel gram pass.
    val tc = Layouts.fanOutByKey(
        target.select(col(idCol), col(textCol)), idCol)
      .select(explode(hashed_grams(col(textCol), buckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__tc"))
    val dc = Layouts.fanOutByKey(raw.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol), explode(hashed_grams(col(textCol), buckets)).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
    val rc = dc.groupBy("__b").agg(sum(col("__c")).as("__rc"))
    val totals = tc.agg(sum(col("__tc")).cast("double").as("__tt"))
      .crossJoin(rc.agg(sum(col("__rc")).cast("double").as("__rt")))
    val lw = rc.join(tc, Seq("__b"), "left").crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((coalesce(col("__tc"), lit(0L)).cast("double") + 1.0) / (col("__tt") + bD)) -
          log((col("__rc").cast("double") + 1.0) / (col("__rt") + bD))).as("__lw"))
    val scored = dc.join(broadcast(lw), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c").cast("double") * col("__lw")).as("__logw"))
    // Gumbel(0,1) noise from the shared 62-bit md5: u = (h+1)/(2^62+1)
    val u = (md5_long62(concat_ws(":", lit(seed), col(idCol))) + lit(1L)).cast("double") /
      lit(4611686018427387905L).cast("double")
    scored.withColumn("__key", col("__logw") - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__logw"), 6).as("log_weight"))
  }

  /** Per-domain quota cap — the FineWeb/RefinedWeb "no single site
    * dominates the corpus" rule (Penedo et al. 2024 §3.3 dedup+cap
    * family): keep at most `quota` rows per `keyCol` value, selected
    * by the smallest md5(seed:id) keys — a deterministic uniform
    * sample of each domain, reproducible across runs/engines/retries
    * (the [[stratified]] rule).
    *
    * Scale shape: the election is a typed-[[KeepSmallestK]]
    * aggregation, NOT a `row_number` window — a window would shuffle
    * every full row grouped by domain (and a 100M-page domain lands
    * on one task: the exact skew this operator exists to fight),
    * while the Aggregator's map-side partial caps each partition's
    * contribution at `quota` (hash, id) PAIRS per domain, so the
    * domain-keyed exchange carries kilobytes. Survivors then
    * re-select the full rows with an id-keyed semi-join — uniform on
    * id, skew-free, and AQE broadcasts the survivor list when
    * quota × domains is small.
    *
    * Ids must be unique corpus-wide (the dedup-operator rule).
    *
    * @return the surviving input rows, schema unchanged
    */
  def domainCap(df: DataFrame, keyCol: String, idCol: String, quota: Int,
      seed: Long = 42L): DataFrame = {
    require(quota > 0, "quota must be positive")
    import graft.functions.GraftFunctions.md5_long62
    val s = df.sparkSession
    import s.implicits._
    val keyed = df.select(
        col(keyCol).cast("string").as("_1"),
        md5_long62(concat_ws(":", lit(seed), col(idCol))).as("_2"),
        col(idCol).cast("long").as("_3"))
      .as[(String, Long, Long)]
    val keep = keyed.groupByKey(_._1)
      .agg(KeepSmallestK(quota).toColumn.name("__keep"))
      .flatMap(_._2.map(_._2))
      .toDF("__kid")
    df.join(keep, col(idCol) === col("__kid"), "left_semi")
  }

  /** Leakage-free train/val/test split: a deterministic hash split at
    * NEAR-DUP-CLUSTER granularity, not document granularity. A plain
    * per-doc hash split puts the two halves of a near-duplicate pair
    * in train AND test — the held-out set then scores memorization,
    * not generalization (the Lee et al. 2021 dedup paper's core
    * contamination finding). Here every document first gets its
    * verified near-dup cluster label ([[Dedup.nearDupPairs]] ≥
    * `threshold` → [[Dedup.components]]; docs in no pair are their own
    * singleton cluster), and the split bucket is a pure function of
    * the CLUSTER id — so all members of a cluster land in the same
    * split, structurally.
    *
    * Bucketing is the corpus-standard md5 arithmetic
    * (`md5_long62(seed ":" cluster) % 100`, [[stratified]]'s
    * determinism argument): reproducible across runs, engines and
    * cluster sizes, and restatable by any SQL oracle.
    *
    * Scale shape: the pair/label stages are the q18/q33 LSH-bucketed
    * machinery (never all-pairs); the label join is one id-keyed
    * equi-join against a table bounded by the paired-doc count; the
    * bucket itself is a narrow codegen'd scalar.
    *
    * `idCol` must be an integral column (byte/short/int/long): the
    * singleton fill casts it to long, and [[Dedup.components]]'
    * union-find keys are longs. String-keyed corpora should derive a
    * long id first (e.g. `xxhash64`, the q124 host-id play).
    *
    * When `indexPath` names a [[Dedup.writeNearDupIndex]] layout, the
    * pair stage reads the STORED band signatures
    * ([[Dedup.nearDupPairsFromIndex]]) instead of re-minhashing the
    * corpus — a production split then costs zero signature passes
    * over 100 TB of text (the index was written once, at ingest).
    * The index must have been written at the banding whose candidacy
    * is complete at `threshold` (the defaults here and there match).
    *
    * @return input rows + `cluster` (long) + `split` (train/val/test)
    */
  def leakFreeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      seed: String = "13",
      trainPct: Int = 80,
      valPct: Int = 10,
      indexPath: Option[String] = None,
      shingleWidth: Int = 3): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "trainPct/valPct must be non-negative and sum to <= 100")
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(idCol).dataType),
      s"leakFreeSplit requires an integral id column; '$idCol' is " +
        s"${df.schema(idCol).dataType.simpleString} — derive a long id " +
        "first (e.g. xxhash64)")
    import graft.functions.GraftFunctions.md5_long62
    // shingleWidth threads to BOTH pair paths: an index written at a
    // non-default width would otherwise always fail its _meta width
    // check with a message telling the caller to pass a width this
    // function had no seat for (r14 ADVICE)
    val pairs = (indexPath match {
      case Some(p) => Dedup.nearDupPairsFromIndex(p, df, idCol, textCol,
        threshold, shingleWidth)
      case None => Dedup.nearDupPairs(df, idCol, textCol, threshold,
        shingleWidth = shingleWidth)
    }).select("id_a", "id_b")
    // rename the label key so a caller whose idCol is literally "id"
    // neither hits an ambiguous reference nor loses its id column to
    // the drop below
    val labels = Dedup.components(pairs) // (id, cluster), paired ids only
      .withColumnRenamed("id", "__lfs_id")
    val withCluster = df
      .join(labels, df(idCol) === labels("__lfs_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), df(idCol).cast("long")))
      .drop("__lfs_id")
    val bucket = pmod(
      md5_long62(concat(lit(seed), lit(":"), col("cluster").cast("string"))),
      lit(100L))
    withCluster.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Token-budget mixture sampling: per SOURCE, admit documents in a
    * deterministic shuffled order until the source's TOKEN budget is
    * exhausted. Training mixtures are specified in tokens, not
    * document counts ([[domainCap]]'s unit) — a source of long
    * documents contributes the same training mass as one of short
    * documents under the same budget.
    *
    * Determinism is the corpus-standard md5 arithmetic: admission
    * order within a source is `md5_long62(seed ":" id)` (a
    * reproducible shuffle — id order would bias toward early crawl
    * segments), and a document is kept iff the running token total
    * through it stays <= `budget`.
    *
    * Scale shape, two regimes split by ONE broadcast-joined per-source
    * aggregate:
    *   - sources whose TOTAL fits the budget pass through with no
    *     ordering at all (the common case in a healthy mixture — most
    *     sources fit, and they never pay a sort);
    *   - only over-budget sources flow into the per-source cumulative
    *     window, and a fetcher-style hash exchange on source carries
    *     ONLY those rows. Like q121's schedule, ranking every kept
    *     document of a source is the honest shape — the admission
    *     cutoff is order-dependent, so a bounded top-k aggregator
    *     cannot answer it (k is unknown until the cumsum crosses).
    *
    * Token definition is [[graft.functions.TextStats.tokenCount]]'s
    * pinned whitespace class (the q19/q20/q36 oracle contract).
    *
    * @return (idCol, sourceCol, n_tokens) of admitted documents
    */
  def tokenBudgetMix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budget: Long,
      seed: String = "17"): DataFrame =
    tokenBudgetMixCounted(
      // materialize the counted projection ONCE (eager localCheckpoint):
      // the admission core consumes its input three times (totals
      // aggregate, under-budget branch, over-budget branch), and without
      // the cut each consumer re-runs the tokenization — and everything
      // upstream of this operator — over the full corpus text. The
      // checkpointed frame is the narrow (id, source, n_tokens) decision
      // table (guide-§8 shape: decide on small rows), linear in rows and
      // ~24 bytes each, never the text.
      df.select(col(idCol), col(sourceCol),
        graft.functions.TextStats.tokenCount(col(textCol)).cast("long")
          .as("n_tokens"))
        .localCheckpoint(true),
      idCol, "n_tokens", sourceCol, budget, seed)

  /** The counted primitive under [[tokenBudgetMix]]: admission over an
    * EXISTING token-count column (the common case once counts are a
    * stored corpus column — recomputing them per mix would re-tokenize
    * 100 TB for arithmetic a bigint column already holds).
    */
  def tokenBudgetMixCounted(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      budget: Long,
      seed: String = "17"): DataFrame = {
    require(budget > 0, "budget must be positive")
    budgetMixCore(df, idCol, tokensCol, sourceCol, seed, j => j.withColumn("__budget", lit(budget)))
  }

  /** PER-SOURCE token budgets — the form a real training mixture is
    * actually specified in ("this many tokens of code, this many of
    * encyclopedia, ..."), where [[tokenBudgetMixCounted]]'s single
    * budget is the uniform special case. `budgets` maps a source to
    * its token budget; sources absent from the map (and a NULL
    * source, which a `Map[String, Long]` cannot key) get
    * `defaultBudget`.
    *
    * Scale shape: the budget table is one tiny broadcast LEFT join on
    * top of the same two-regime machinery — per source, a total at or
    * under ITS budget passes through with no ordering paid; only
    * over-budget sources flow through the per-source cumulative
    * window. Admission order stays the md5(seed:id) shuffle.
    */
  def tokenBudgetMixWeighted(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long,
      seed: String = "17"): DataFrame = {
    require(defaultBudget > 0 && budgets.values.forall(_ > 0),
      "every budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = budgets.toSeq.toDF("__bsrc", "__bud")
    budgetMixCore(df, idCol, tokensCol, sourceCol, seed, { j =>
      if (budgets.isEmpty) j.withColumn("__budget", lit(defaultBudget))
      else j.join(broadcast(bdf), col(sourceCol) <=> col("__bsrc"), "left")
        .withColumn("__budget", coalesce(col("__bud"), lit(defaultBudget)))
        .drop("__bsrc", "__bud")
    })
  }

  /** The shared two-regime admission core: `withBudget` attaches a
    * per-row `__budget` column after the totals join, and everything
    * downstream compares against IT — one code path for the uniform
    * and weighted faces.
    */
  private def budgetMixCore(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      sourceCol: String,
      seed: String,
      withBudget: DataFrame => DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.md5_long62
    import org.apache.spark.sql.expressions.Window
    val tc = df.select(
      col(idCol),
      col(sourceCol),
      col(tokensCol).cast("long").as("n_tokens"))
    // null-safe join: a NULL source is a legitimate budget group (the
    // groupBy above already made one) — a plain equi-join would
    // silently drop every null-source document from BOTH branches
    val totals = tc.groupBy(col(sourceCol)).agg(sum(col("n_tokens")).as("__tot"))
      .withColumnRenamed(sourceCol, "__src")
    val joined = withBudget(
      tc.join(broadcast(totals), col(sourceCol) <=> col("__src")).drop("__src"))
    val under = joined.where(col("__tot") <= col("__budget"))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
    // the md5 admission priority exists ONLY on the over-budget branch
    // — an under-budget source keeps every row regardless of order, so
    // hashing its ids would be pure waste (in a healthy mixture that
    // is most of the corpus)
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__pr"), col(idCol))
    val over = joined.where(col("__tot") > col("__budget"))
      .withColumn("__pr",
        md5_long62(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .where(col("__cum") <= col("__budget"))
      .select(col(idCol), col(sourceCol), col("n_tokens"))
    under.unionByName(over)
  }
}

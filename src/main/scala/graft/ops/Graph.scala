package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawl data: the ranking half of the
  * extract_links → url_resolve → registered_domain pipeline. A
  * host-level PageRank is the standard quality prior for crawl
  * frontier ordering and per-domain sampling weights (the CommonCrawl
  * host ranks are exactly this computation), and it composes with
  * [[Sampling.domainCap]] / [[Sampling.stratified]] as the weight
  * source.
  */
object Graph {

  /** Weighted PageRank over an edge list, a fixed number of power
    * iterations. Weighted: a page linking a host 5 times votes 5/W of
    * its rank there (W = its total out-weight), the natural semantics
    * when edges carry link multiplicities from a host-graph rollup.
    *
    * Semantics per iteration (damping d, N nodes, dangling mass D =
    * total rank on nodes with no out-edges):
    *
    *   pr'(v) = (1-d)/N + d * (Σ_{u→v} pr(u)·w(u,v)/W(u) + D/N)
    *
    * — the standard formulation where dangling rank redistributes
    * uniformly, so Σ pr = 1 is an invariant every iteration (asserted
    * in OpsSpec to 1e-9).
    *
    * Scale design (the CommonCrawl host graph is ~10⁸ nodes / ~10⁹
    * edges): the edge set with precomputed out-weights is the
    * iteration-invariant operand — built ONCE (one groupBy + one
    * co-keyed join) and cached; each iteration is then one
    * src-keyed join + one dst-keyed aggregation on (node, rank)
    * pairs, the minimum exchange structure a distributed power step
    * admits. The dangling term and Σ-invariant need no collect: both
    * ride as one-row aggregates crossJoined back (the
    * single-row-broadcast pattern the plan audit allows). Lineage is
    * truncated per iteration with an eager `localCheckpoint` — the
    * [[Dedup.componentsDistributed]] rule: a cached iteration chain
    * triples the analyzed plan per round. Iterations are FIXED (no
    * convergence probe): rank consumers want a reproducible k-step
    * result, and a fixpoint test would add a driver action per round.
    *
    * @param edges   columns (src, dst, weight); weight castable to
    *                double, > 0 (rows with null src/dst are dropped)
    * @param iterations power-iteration count (k ≥ 0; k=0 returns the
    *                uniform 1/N vector)
    * @param damping the usual 0.85
    * @return (node, pr) — one row per distinct node on either edge end
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    // materialized once: the edge frame is consumed FOUR times below
    // (out-weight aggregate, the votes join's probe side, both ends of
    // the node union) — when the caller hands in an expression-heavy
    // frame (a link-extraction chain), each pass would re-run it
    val e = edges
      .where(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src").cast("string"), col("dst").cast("string"),
        col("weight").cast("double"))
      .toDF("src", "dst", "w")
      .localCheckpoint(true)
    // iteration-invariant operand: per-edge vote fraction w/W(src).
    // Built once; the groupBy and the join share the src hash
    // partitioning, so this is one exchange over the edge set.
    val outW = e.groupBy("src").agg(sum("w").as("tot_w"))
    val votes = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("tot_w")).as("frac"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val srcSet = votes.select(col("src").as("node")).distinct()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    var it = 0
    while (it < iterations) {
      // one-row dangling-mass aggregate, crossJoined (broadcast) back
      val dangling = ranks.join(srcSet, Seq("node"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dmass"))
      val contribs = votes.join(ranks, votes("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") * col("frac")).as("in_pr"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_pr"), lit(0.0)) + col("dmass") / n))
            .as("pr"))
        .localCheckpoint(true)
      it += 1
    }
    ranks
  }
}

package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined-chunking dedup over binary/document content
  * (FastCDC, Xia et al. USENIX ATC'16 — see
  * [[graft.functions.CdcHelper]]). Where minhash/simhash find NEAR
  * duplicate *documents*, CDC finds byte-identical *regions* shared
  * across documents (boilerplate headers, re-posted articles, vendored
  * files inside archives) even when the surrounding bytes shifted —
  * insertions re-align within ~one chunk because cut points depend
  * only on a small sliding window of local content.
  *
  * 100 TB scale story:
  *   - chunking is a codegen'd narrow projection ([[CdcChunks]]):
  *     scan speed, zero exchanges, no state;
  *   - the only shuffle key is the 32-byte chunk hash with a 1-word
  *     count — map-side partial aggregation collapses each partition
  *     to its distinct chunk set before the exchange, so the shuffle
  *     carries the distinct-chunk cardinality, never the corpus bytes;
  *   - dedup accounting (`dedupStats`) reduces to a single row; the
  *     per-hash winner election for chunk-store construction is the
  *     same (hash → min id) shape as [[Dedup.exactWinners]].
  */
object Cdc {

  /** Explode each row's content into its content-defined chunks:
    * (idCol, offset, size, sha256). One narrow generate — no shuffle.
    *
    * NOT for the chunked walk's `content_part` rows: chunking each
    * part independently re-keys every oversize entry at its artificial
    * `maxEntryBytes` seams — use [[chunkTableOverParts]] there, which
    * reproduces the whole-entry cut points across seams.
    */
  def chunkTable(df: DataFrame, idCol: String, contentCol: String,
      min: Int = 2048, avg: Int = 8192, max: Int = 65536): DataFrame =
    df.select(col(idCol),
        explode(GraftFunctions.cdc_chunks(col(contentCol), min, avg, max)).as("c"))
      .select(col(idCol), col("c.offset").as("offset"),
        col("c.size").as("size"), col("c.sha256").as("sha256"))

  /** [[chunkTable]] for entries that arrive as ORDERED PARTS — the
    * chunked walk's oversize rows
    * ([[graft.walk.ArchiveWalker.walkChunked]], `content_part` index):
    * produces EXACTLY the chunks of each entry's concatenated content
    * ([[graft.functions.CdcHelper.chunksStream]]), so cut points and
    * hashes are invariant to where `maxEntryBytes` split the entry —
    * a per-row `cdc_chunks` would re-key every oversize entry at its
    * artificial part seams, the fixed-block failure mode CDC exists
    * to avoid.
    *
    * Scale shape: ONE exchange keyed by the entry id (parts of one
    * entry must meet), sorted-group streaming after it —
    * `flatMapSortedGroups` hands each group's parts in `content_part`
    * order without buffering the group, and the chunker's state is
    * bounded by `max` + one part regardless of entry size. Chunks for
    * a 100 GB entry stream out lazily; nothing driver-side.
    *
    * @param idCol column identifying the logical entry (e.g. a
    *              `concat_ws(source, path)` — parts of one entry must
    *              share it). The output id column keeps this column's
    *              ORIGINAL type: grouping keys on a string render
    *              internally (typed-encoder key), but the result casts
    *              back, so joining the chunk table to the source needs
    *              no caller-side cast (r11 ADVICE). Requires a type
    *              whose values round-trip through their string render
    *              (string/numeric/date — true of every id the walk
    *              family emits; binary ids would not).
    */
  def chunkTableOverParts(df: DataFrame, idCol: String, partIdxCol: String,
      contentCol: String, min: Int = 2048, avg: Int = 8192,
      max: Int = 65536): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("__id"),
        col(partIdxCol).cast("long").as("__pidx"),
        col(contentCol).as("__content"))
      .as[(String, Long, Array[Byte])]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("__pidx")) { (id, parts) =>
        graft.functions.CdcHelper.chunksStream(parts.map(_._3), min, avg, max)
          .map { case (off, size, sha) => (id, off, size, sha) }
      }
      .toDF(idCol, "offset", "size", "sha256")
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** One-row corpus dedup accounting over a [[chunkTable]]: total vs
    * distinct chunks and bytes, and the byte-level dedup ratio a
    * chunk-store would achieve. Hash-keyed partial agg, single
    * exchange on the chunk hash, one-row result.
    */
  def dedupStats(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("sha256"))
      .agg(count(lit(1)).as("occurrences"), first(col("size")).as("chunk_size"))
      .agg(
        sum(col("occurrences")).as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("occurrences") * col("chunk_size")).as("total_bytes"),
        sum(col("chunk_size")).as("distinct_bytes"))
      .withColumn("dedup_ratio",
        col("distinct_bytes").cast("double") / col("total_bytes"))

  /** Snapshot reconciliation — classify every id across two corpus
    * snapshots as added / removed / changed / unchanged by payload
    * hash. The data-ops face between two crawls of the same corpus:
    * what a re-crawl actually changed, before any recompute decision
    * (a changed doc re-enters the clean/dedup pipeline, an unchanged
    * one keeps its derived columns).
    *
    * Scale shape: each side reduces to one (id, 32-byte hash) row in
    * a narrow partial-aggregated projection BEFORE the full-outer
    * join, so the only full-data exchange carries 40-byte rows, never
    * payloads — the standard 100 TB reconciliation layout (the join
    * reuses the aggregation's id partitioning, so the groupBy adds no
    * exchange). Classification is a codegen'd null/equality scalar on
    * the joined row.
    *
    * Duplicate ids within a snapshot (a malformed manifest) are
    * reduced to their MINIMUM hash per side rather than fanned out
    * k_old × k_cur through the join — the one-row-per-id contract
    * holds unconditionally, at the cost of a best-effort comparison
    * for the already-degenerate duplicate case.
    *
    * @return one row per id present in either snapshot:
    *         (idCol, change in {added, removed, changed, unchanged})
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame,
      idCol: String, payloadCol: String): DataFrame = {
    // presence is a FLAG, never hash nullness: a row present in both
    // snapshots with a NULL payload must classify by the null-safe
    // hash comparison (unchanged for NULL==NULL, changed for
    // NULL vs value), not masquerade as added/removed. min() skips
    // NULLs, so a unique id with a NULL payload keeps its NULL hash
    // (min of one NULL is NULL) and a duplicate set reduces to NULL
    // only when EVERY duplicate is NULL — the deterministic
    // best-effort choice for the degenerate case.
    val o = old.select(col(idCol).as("__id"),
        md5(col(payloadCol).cast("binary")).as("__ho"))
      .groupBy("__id").agg(min(col("__ho")).as("__ho"))
      .withColumn("__po", lit(true))
    val n = cur.select(col(idCol).as("__id"),
        md5(col(payloadCol).cast("binary")).as("__hn"))
      .groupBy("__id").agg(min(col("__hn")).as("__hn"))
      .withColumn("__pn", lit(true))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(col("__ho") <=> col("__hn"), "unchanged")
          .otherwise("changed").as("change"))
  }

  /** Incremental corpus refresh — [[snapshotDiff]] composed into the
    * recompute decision it exists for: between two snapshots of a
    * corpus, ONLY changed and added documents re-enter the (heavy,
    * per-document) derivation pipeline; unchanged documents carry
    * their previously-derived columns forward from the old manifest
    * untouched; removed documents drop. The returned frame is the
    * refreshed manifest over the CURRENT snapshot.
    *
    * Correctness contract: `recompute` must be a deterministic
    * per-document function of (id, payload) — then a carried-forward
    * row is byte-identical to what recomputing the unchanged document
    * would produce, and the output equals `recompute(cur)` while
    * paying the derivation cost only on the delta. Corpus-GLOBAL
    * stages (dedup elections, samples) belong after this call, over
    * the merged manifest's derived columns — manifest rows are tens
    * of bytes, so a global pass over them is noise next to one over
    * payloads.
    *
    * Scale shape: the diff joins 40-byte (id, hash) rows
    * ([[snapshotDiff]]); its (id, change) output is localCheckpointed
    * (one short row per id — bounded) because both branch filters
    * consume it, and re-deriving it would re-hash both snapshots'
    * payloads per consumer; the carried branch semi-joins the old
    * manifest (derived columns only — unchanged TEXT is never read);
    * `recompute` sees only the delta rows of `cur`.
    *
    * @param oldManifest previous run's derived rows, keyed by `idCol`
    * @param recompute   maps delta rows of `cur` (same schema as
    *                    `cur`) to manifest rows (same schema as
    *                    `oldManifest`)
    */
  def incrementalRefresh(
      old: DataFrame, cur: DataFrame, oldManifest: DataFrame,
      idCol: String, payloadCol: String)(
      recompute: DataFrame => DataFrame): DataFrame = {
    val diff = snapshotDiff(old, cur, idCol, payloadCol).localCheckpoint(true)
    val unchangedIds = diff.where(col("change") === "unchanged").select(col(idCol))
    val freshIds = diff.where(col("change").isin("added", "changed")).select(col(idCol))
    val carried = oldManifest.join(unchangedIds, Seq(idCol), "left_semi")
    val fresh = recompute(cur.join(freshIds, Seq(idCol), "left_semi"))
    carried.unionByName(fresh)
  }
}

package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *   - [[cosineTopK]] — brute-force scan vs one query vector. Fully
  *     codegen'd (built-in `aggregate`/`zip_with` compositions, no
  *     UDFs); a single narrow pass + a k-row `orderBy.limit` (Spark
  *     plans TakeOrderedAndProject — no global sort materialization).
  *     This is the exact baseline and is linear in corpus size: fine
  *     at 100 TB *per query* only if queries are rare.
  *   - [[annLshTopK]] — random-hyperplane (sign) LSH: bucket by the
  *     h-bit sign pattern, probe only buckets within `probeHamming`
  *     of the query's code, re-rank exactly inside the probed buckets.
  *     The scan touches ~(sum_{d<=probeHamming} C(h,d))/2^h of the
  *     corpus — with h=16, probe<=2, that's ~137/65536 ≈ 0.2%.
  */
object Similarity {

  /** Deterministic Rademacher (±1) hyperplanes, entry (i, j) derived
    * from the md5-based hash of "hp_i_j" — identical on every executor
    * and every run, and (unlike seeded gaussians) reproducible inside
    * an ANSI-SQL oracle, where the plane literals can be regenerated or
    * inlined. ±1 random projections preserve angles like gaussian ones
    * (Achlioptas, "Database-friendly random projections", PODS'01).
    */
  private[ops] def hyperplanes(dim: Int, h: Int): Array[Array[Double]] =
    Array.tabulate(h)(i => Array.tabulate(dim)(j =>
      if ((graft.functions.HashingHelper.md5lo62(s"hp_${i}_${j}") & 1L) == 1L) 1.0 else -1.0))

  /** ±1 entries of the fixed LSH hyperplanes, for oracle-SQL literal
    * generation (the oracle inlines them as constants — they are part
    * of the operator's fixed definition, not data-derived).
    */
  def planeSigns(dim: Int, h: Int): Array[Array[Int]] =
    hyperplanes(dim, h).map(_.map(_.toInt))

  /** The h-bit sign-LSH code of a fixed query vector (driver-side). */
  def queryCode(query: Array[Double], dim: Int, h: Int): Long =
    hyperplanes(dim, h).zipWithIndex.map { case (p, i) =>
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += p(j) * query(j); j += 1 }
      if (dot >= 0) 1L << i else 0L
    }.reduce(_ | _)

  private def vecLit(v: Array[Double]): Column = array(v.toIndexedSeq.map(lit): _*)

  /** Ceiling on double literals inlined into one projection (2 MB of
    * constants). Janino compiles inlined literals into the generated
    * method — past a few MB the stage silently falls back to
    * interpreted (or dies on the 64 KB method limit even with
    * constant-pool splitting). The PQ encode/ADC/distortion surfaces
    * sidestep the cliff entirely by carrying their tables as codegen
    * REFERENCE OBJECTS ([[graft.functions.AnnHelper]] — one helper
    * call per row at any m/ks/nprobe); [[ivfCell]] keeps the inlined
    * argmax form (its NaN/tie ordering is pinned by the oracle SQL),
    * so the coarse codebook remains the one guarded surface. The
    * guard turns that cliff into a plan-build-time refusal naming the
    * layout that does NOT inline (partition-pruned at-rest probes).
    */
  private[ops] val MaxInlinedDoubles: Long = 256L * 1024

  private def requireInlineBudget(doubles: Long, what: String,
      alternative: String): Unit =
    require(doubles <= MaxInlinedDoubles,
      s"$what would inline $doubles double literals into one projection " +
        s"(codegen budget: $MaxInlinedDoubles, ~2 MB of constants) — " +
        s"past it the generated stage degrades or fails; $alternative")

  /** Cosine of each row's vector vs a constant query vector. */
  def cosineTo(vec: Column, query: Array[Double]): Column =
    GraftFunctions.cosine_similarity(vec, vecLit(query))

  /** Exact top-k by cosine similarity vs a constant query vector.
    * Output: (idCol, cos) ordered desc, ties broken by id.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int): DataFrame =
    df.select(col(idCol), round(cosineTo(col(vecCol), query), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** h-bit sign-LSH code of a vector column vs the fixed hyperplanes:
    * bit i = sign(v . plane_i). Pure built-ins, codegen-friendly.
    */
  def lshCode(vec: Column, dim: Int, h: Int = 16): Column = {
    val planes = hyperplanes(dim, h)
    planes.zipWithIndex.map { case (p, i) =>
      when(GraftFunctions.vec_dot(vec, vecLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate top-k: probe buckets whose code is within
    * `probeHamming` bits of the query's code, exact re-rank inside.
    * At scale the bucket column should be a partition/bucketing key of
    * the stored corpus so probing prunes file scans.
    */
  def annLshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, dim: Int,
      h: Int = 16, probeHamming: Int = 2): DataFrame = {
    val qCode = queryCode(query, dim, h)
    val coded = df.select(col(idCol), col(vecCol), lshCode(col(vecCol), dim, h).as("__code"))
    coded
      .where(bit_count(col("__code").bitwiseXOR(lit(qCode))) <= probeHamming)
      .select(col(idCol), round(cosineTo(col(vecCol), query), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN top-k: a coarse quantizer partitions the
    * corpus into `nlist` cells (assignment = nearest centroid by
    * cosine, ties to the smaller centroid id); a query searches only
    * the `nprobe` cells whose centroids are nearest the query vector,
    * re-ranking those exactly. Centroids here are the `nlist`
    * smallest-id vectors — a deterministic, oracle-reproducible
    * stand-in for an offline k-means codebook (the IVF plumbing, not
    * the codebook training, is the operator under test).
    *
    * Scale: the codebook is driver-collected and inlined — a k-means
    * codebook is KB-to-MB even for a 100 TB corpus — so cell
    * assignment is a narrow, fully-codegen projection: no shuffle, no
    * per-row join, one pass. At rest the corpus would be written
    * `partitionBy(cell)` so a probe prunes the file listing to
    * ~nprobe/nlist of the data; the probed fraction is re-ranked with
    * exact cosine like [[annLshTopK]].
    */
  /** (centroid id, vector, L2 norm) codebook entries. */
  type IvfCodebook = Array[(Long, Array[Double], Double)]

  // sequential left-fold dot — the exact IEEE add sequence VecDot
  // and the oracle's list_sum comprehension perform
  private def seqDot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < a.length) { acc += a(j) * b(j); j += 1 }
    acc
  }

  /** The SemDeDup/IVF sizing rule, programmatic: nlist grows with the
    * corpus so cells stay ~`targetCell` rows and within-cell pair
    * volume stays ~targetCell/2 per row regardless of n (measured on
    * the scale ladder: cell-pair fraction 6.3e-2 → 6.4e-3 → 3.3e-3 at
    * n = 2k/20k/40k with this rule; see PLANS_r09 §3b).
    */
  def recommendedNlist(n: Long, targetCell: Int = 125): Int =
    math.max(16L, n / targetCell).toInt

  /** The sign-LSH banding sizing rule, programmatic: per-table random
    * collision is ~2^-bits, so total candidates ≈ tables·n²/2·2^-bits;
    * widen codes until candidates ≈ `candidatesPerRow`·n, growing
    * tables with bits to hold recall (the measured 8×8 → 12×12 step
    * kept 96% of output while cutting candidates 8.2x). Capped at 16
    * bits — beyond that per-pair recall at cos 0.9 decays, which is
    * the regime where IVF cells ([[semDedup]], [[recommendedNlist]])
    * are the right candidate generator instead.
    *
    * @return (tables, bitsPerTable)
    */
  def recommendedBanding(n: Long, candidatesPerRow: Int = 64): (Int, Int) = {
    var bits = 8
    while (bits < 16 && bits.toDouble * n / 2 * math.pow(2.0, -bits) > candidatesPerRow)
      bits += 1
    (bits, bits)
  }

  /** Deterministic IVF codebook: the `nlist` smallest-id vectors — an
    * oracle-reproducible stand-in for an offline k-means codebook.
    * Bounded driver collect (nlist rows), like a real codebook load.
    */
  def ivfCodebook(df: DataFrame, idCol: String, vecCol: String, nlist: Int): IvfCodebook =
    df.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, math.sqrt(seqDot(v, v)))
      }

  /** TRAINED IVF codebook: bounded-iteration distributed spherical
    * k-means (Lloyd's) under the cosine metric [[ivfCell]] assigns by.
    *
    * Shape per iteration — the canonical scalable k-means layout:
    *   - centroids broadcast read-only (nlist x dim doubles, KB-MB
    *     even for production codebooks — never data-sized);
    *   - one narrow pass assigns each vector to its nearest centroid
    *     (max cosine, ties to the smaller index, mirroring
    *     [[ivfCell]]) and partial-aggregates per-centroid (sum, count)
    *     inside each partition (`treeAggregate`): the only bytes that
    *     leave an executor per iteration are nlist x dim partial sums,
    *     NEVER rows;
    *   - the driver re-normalizes means into unit centroids (spherical
    *     update); an emptied cell keeps its previous centroid.
    *
    * Init is a deterministic hash-ordered sample (`nlist` smallest
    * `xxhash64(id)` — id-order would seed all centroids from one
    * corner of the corpus, which is exactly the stand-in's weakness).
    * Stops early when no centroid moves more than `tol` in cosine.
    * Centroid ids are 0..nlist-1; vectors are unit-norm (norm field
    * 1.0), so the returned codebook drops into [[ivfCell]] /
    * [[ivfProbed]] / [[ivfTopK]] unchanged.
    */
  // top-level (not nested in trainIvfCodebook): a nested def would pull
  // the whole method scope — including the non-serializable DataFrame —
  // into the RDD closure below
  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(seqDot(v, v))
    if (n == 0) v else v.map(_ / n)
  }

  def trainIvfCodebook(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      maxIters: Int = 10, tol: Double = 1e-6): IvfCodebook = {
    require(nlist > 0 && maxIters > 0, "nlist and maxIters must be positive")
    val projected = df.select(
      col(idCol).cast("long"),
      transform(col(vecCol), x => x.cast("double")))
    // unit vectors once, cached: every iteration re-reads them
    val data = projected.rdd
      .map(r => unit(r.getSeq[Double](1).toArray))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Double]] = projected
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(nlist)
        .collect()
        .map(r => unit(r.getSeq[Double](1).toArray))
      require(cents.nonEmpty, "cannot train a codebook on an empty corpus")
      val dim = cents(0).length
      val sc = df.sparkSession.sparkContext
      var iter = 0
      var moved = true
      while (iter < maxIters && moved) {
        val bc = sc.broadcast(cents)
        val k = cents.length
        val (sums, counts) = data.treeAggregate(
          (Array.fill(k)(new Array[Double](dim)), new Array[Long](k)))(
          seqOp = { case ((s, c), v) =>
            val cb = bc.value
            var best = 0; var bestDot = seqDot(cb(0), v)
            var j = 1
            while (j < k) {
              val d = seqDot(cb(j), v)
              if (d > bestDot) { best = j; bestDot = d }
              j += 1
            }
            var i = 0
            while (i < dim) { s(best)(i) += v(i); i += 1 }
            c(best) += 1
            (s, c)
          },
          combOp = { case ((s1, c1), (s2, c2)) =>
            var j = 0
            while (j < k) {
              var i = 0
              while (i < dim) { s1(j)(i) += s2(j)(i); i += 1 }
              c1(j) += c2(j); j += 1
            }
            (s1, c1)
          })
        bc.destroy()
        val next = Array.tabulate(k) { j =>
          if (counts(j) == 0) cents(j) // emptied cell keeps its centroid
          else unit(sums(j))
        }
        moved = cents.zip(next).exists { case (a, b) => 1.0 - seqDot(a, b) > tol }
        cents = next
        iter += 1
      }
      cents.zipWithIndex.map { case (v, j) => (j.toLong, v, 1.0) }
    } finally data.unpersist(blocking = false)
  }

  /** Cell assignment vs an inlined codebook: nearest centroid by
    * cosine, ties to the smaller centroid id. A narrow, fully-codegen
    * projection (argmax via an orderable struct: max (cos, -cent_id))
    * — no shuffle, no join. Write the corpus `partitionBy(thisColumn)`
    * so probes prune the file listing (asserted in BucketingSpec).
    */
  def ivfCell(codebook: IvfCodebook, vec: Column): Column = {
    requireInlineBudget(
      codebook.length.toLong * (if (codebook.isEmpty) 0 else codebook(0)._2.length),
      s"ivfCell (nlist=${codebook.length})",
      "assign-and-write once with a smaller nlist per pass, or restate " +
        "the assignment as a broadcast join against the codebook rows " +
        "— at-rest probes (ivfPqTopKAtRest) never inline the codebook " +
        "at query time, they prune cell directories by file listing")
    val vnorm = sqrt(GraftFunctions.vec_dot(vec, vec))
    -greatest(codebook.toIndexedSeq.map { case (id, v, n) =>
      struct(
        (GraftFunctions.vec_dot(vec, vecLit(v)) / (vnorm * lit(n))).as("c"),
        lit(-id).as("nid"))
    }: _*).getField("nid")
  }

  /** The `nprobe` cells whose centroids are nearest the query
    * (driver-side, same arithmetic and tie order as the in-SQL oracle).
    */
  def ivfProbed(codebook: IvfCodebook, query: Array[Double], nprobe: Int): Seq[Long] = {
    val qnorm = math.sqrt(seqDot(query, query))
    codebook
      .map { case (id, v, n) => (seqDot(v, query) / (qnorm * n), id) }
      .sortBy { case (cos, id) => (-cos, id) }
      .take(nprobe).map(_._2).toSeq
  }

  /** `codebook` defaults to the deterministic smallest-id stand-in
    * (oracle-reproducible); pass [[trainIvfCodebook]]'s output for
    * real recall.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      codebook: Option[IvfCodebook] = None): DataFrame = {
    val cents = codebook.getOrElse(ivfCodebook(df, idCol, vecCol, nlist))
    val probed = ivfProbed(cents, query, nprobe)
    df.where(ivfCell(cents, col(vecCol)).isin(probed: _*))
      .select(col(idCol), round(cosineTo(col(vecCol), query), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The IVF at-rest layout: write the corpus `partitionBy` its cell
    * assignment so probes prune the FILE LISTING to ~nprobe/nlist of
    * the data (Hive-style partition pruning — proven in BucketingSpec:
    * a 2-of-8-cell probe plans exactly 2 partition directories). The
    * cell column is a narrow codegen'd projection of an inlined
    * codebook; the write shuffles nothing beyond the writer's own
    * file-per-cell fan-out.
    */
  def writeIvfPartitioned(df: DataFrame, vecCol: String,
      codebook: IvfCodebook, out: String, cellCol: String = "cell"): Unit =
    df.withColumn(cellCol, ivfCell(codebook, col(vecCol)))
      .write.mode("overwrite").partitionBy(cellCol).parquet(out)

  /** ANN top-k over a [[writeIvfPartitioned]] layout: filter on the
    * partition column (file-listing prune, no data read outside the
    * probed cells), exact cosine re-rank inside. The codebook must be
    * the one the layout was written with.
    */
  def ivfTopKAtRest(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, codebook: IvfCodebook,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell"): DataFrame = {
    val probed = ivfProbed(codebook, query, nprobe)
    spark.read.parquet(path)
      .where(col(cellCol).isin(probed: _*))
      .select(col(idCol), round(cosineTo(col(vecCol), query), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  // ---------------------------------------------------------------
  // Product quantization (PQ) — the compression half of the IVF-PQ
  // architecture (Jégou, Douze, Schmid, "Product Quantization for
  // Nearest Neighbor Search", TPAMI 2011). A d-dim vector is split
  // into `m` subvectors; each subvector is quantized to its nearest
  // of `ks` per-subspace centroids; the stored code is m small ints
  // (ks=16 -> 4 bits each, so a 64-dim float vector compresses
  // 256 bytes -> 4 bytes). Queries never decode: ADC (asymmetric
  // distance computation) precomputes the m x ks table of
  // query-to-centroid subspace distances once per query, and each
  // row's approximate distance is m table lookups summed — the scan
  // shape that makes 100 TB of embeddings searchable from RAM-sized
  // state.
  // ---------------------------------------------------------------

  /** Per-subspace centroid tables: entry (m)(j) is the j-th centroid
    * of subspace m (length d/m each).
    */
  type PqCodebooks = Array[Array[Array[Double]]]

  /** Deterministic PQ codebooks: subspace slices of the `ks`
    * smallest-id vectors — the [[ivfCodebook]] rule applied per
    * subspace, oracle-reproducible. Bounded driver collect (ks rows).
    */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ks: Int): PqCodebooks = {
    val rows = df.orderBy(col(idCol)).limit(ks)
      .select(transform(col(vecCol), x => x.cast("double")))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    pqFromRows(rows, m)
  }

  private def pqFromRows(rows: Array[Array[Double]], m: Int): PqCodebooks = {
    require(rows.nonEmpty, "cannot build PQ codebooks from an empty corpus")
    val dim = rows(0).length
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    Array.tabulate(m)(mi => rows.map(_.slice(mi * dsub, (mi + 1) * dsub)))
  }

  /** [[ivfCodebook]] + [[pqCodebooks]] from ONE bounded collect — both
    * deterministic stand-ins derive from the `max(nlist, ks)`
    * smallest-id vectors, so composing a layout previously paid two
    * identical TakeOrdered jobs for one row set (r21: one job per
    * composed ANN fixture saved). Identical codebooks to the separate
    * faces by construction (same ordering, same prefixes).
    */
  def ivfAndPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, ks: Int): (IvfCodebook, PqCodebooks) = {
    val rows = df.orderBy(col(idCol)).limit(math.max(nlist, ks))
      .select(col(idCol).cast("long"), transform(col(vecCol), x => x.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val ivf: IvfCodebook = rows.take(nlist).map { case (id, v) =>
      (id, v, math.sqrt(seqDot(v, v)))
    }
    (ivf, pqFromRows(rows.take(ks).map(_._2), m))
  }

  /** TRAINED PQ codebooks: bounded-iteration L2 k-means in EVERY
    * subspace, all m subspaces in ONE distributed pass per iteration
    * (the [[trainIvfCodebook]] layout: centroids broadcast, per-row
    * assignment + partial (sum, count) aggregation inside each
    * partition, only m x ks x dsub doubles of partials ever leave an
    * executor — never rows). Init per subspace is the deterministic
    * hash-ordered sample ([[trainIvfCodebook]]'s rule); an emptied
    * cell keeps its previous centroid; stops early when no centroid
    * moves more than `tol` in squared L2.
    */
  def trainPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ks: Int, maxIters: Int = 10, tol: Double = 1e-9): PqCodebooks = {
    require(m > 0 && ks > 0 && maxIters > 0, "m, ks, maxIters must be positive")
    val projected = df.select(
      col(idCol).cast("long"),
      transform(col(vecCol), x => x.cast("double")))
    val data = projected.rdd
      .map(_.getSeq[Double](1).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = projected
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(ks)
        .collect()
        .map(_.getSeq[Double](1).toArray)
      require(init.nonEmpty, "cannot train PQ codebooks on an empty corpus")
      val dim = init(0).length
      require(dim % m == 0, s"m=$m must divide dim=$dim")
      val dsub = dim / m
      var cents: PqCodebooks =
        Array.tabulate(m)(mi => init.map(_.slice(mi * dsub, (mi + 1) * dsub)))
      val sc = df.sparkSession.sparkContext
      var iter = 0
      var moved = true
      while (iter < maxIters && moved) {
        val bc = sc.broadcast(cents)
        val (sums, counts) = data.treeAggregate(
          (Array.fill(m, ks)(new Array[Double](dsub)), Array.fill(m, ks)(0L)))(
          seqOp = { case ((s, c), v) =>
            val cb = bc.value
            var mi = 0
            while (mi < m) {
              val off = mi * dsub
              var best = 0; var bestD = Double.MaxValue
              var j = 0
              while (j < ks) {
                val cent = cb(mi)(j)
                var d = 0.0; var i = 0
                while (i < dsub) { val t = v(off + i) - cent(i); d += t * t; i += 1 }
                if (d < bestD) { best = j; bestD = d }
                j += 1
              }
              var i = 0
              while (i < dsub) { s(mi)(best)(i) += v(off + i); i += 1 }
              c(mi)(best) += 1
              mi += 1
            }
            (s, c)
          },
          combOp = { case ((s1, c1), (s2, c2)) =>
            var mi = 0
            while (mi < m) {
              var j = 0
              while (j < ks) {
                var i = 0
                while (i < dsub) { s1(mi)(j)(i) += s2(mi)(j)(i); i += 1 }
                c1(mi)(j) += c2(mi)(j); j += 1
              }
              mi += 1
            }
            (s1, c1)
          })
        bc.destroy()
        val next = Array.tabulate(m, ks) { (mi, j) =>
          if (counts(mi)(j) == 0) cents(mi)(j)
          else sums(mi)(j).map(_ / counts(mi)(j))
        }
        moved = (0 until m).exists(mi => (0 until ks).exists { j =>
          var d = 0.0; var i = 0
          while (i < dsub) { val t = cents(mi)(j)(i) - next(mi)(j)(i); d += t * t; i += 1 }
          d > tol
        })
        cents = next
        iter += 1
      }
      cents
    } finally data.unpersist(blocking = false)
  }

  /** PQ code of a vector column: `array<int>` of length m, entry mi =
    * argmin_j ||v[mi*dsub ..] - cb(mi)(j)||² (ties to the smaller j).
    * A narrow, fully-codegen projection — per subspace the argmin is
    * `min (dist, j)` over inlined centroid literals via
    * [[GraftFunctions.vec_l2sq_slice]]; no shuffle, no join, one pass.
    */
  def pqCode(cb: PqCodebooks, vec: Column): Column =
    GraftFunctions.pq_encode(vec, cb)

  /** The m 4/8-bit codes packed into one BIGINT — the at-rest column
    * (ks <= 16 -> 4 bits per code, m <= 16 subspaces in one long).
    */
  def pqPack(code: Column, m: Int, ks: Int): Column = {
    val bits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros((ks - 1).toLong))
    require(m * bits <= 64, s"m=$m codes of $bits bits exceed one long")
    (0 until m).map(mi => shiftleft(element_at(code, mi + 1).cast("long"), mi * bits))
      .reduceLeft(_.bitwiseOR(_))
  }

  /** Inverse of [[pqPack]]. */
  def pqUnpack(packed: Column, m: Int, ks: Int): Column = {
    val bits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros((ks - 1).toLong))
    array((0 until m).map(mi =>
      shiftright(packed, mi * bits).bitwiseAND(lit((1L << bits) - 1)).cast("int")): _*)
  }

  /** The per-query ADC lookup table: entry (mi)(j) = squared L2
    * distance from the query's mi-th subvector to centroid (mi)(j).
    * Driver-side, m x ks doubles — broadcast-inlined into the scan.
    */
  def pqAdcTable(cb: PqCodebooks, query: Array[Double]): Array[Array[Double]] = {
    val dsub = cb(0)(0).length
    Array.tabulate(cb.length)(mi => cb(mi).map { c =>
      var d = 0.0; var i = 0
      while (i < dsub) { val t = query(mi * dsub + i) - c(i); d += t * t; i += 1 }
      d
    })
  }

  /** Approximate top-k by PQ/ADC: encode each row (or reuse a stored
    * code column), then its distance to the query is m lookups into
    * the inlined ADC table, summed left-to-right — a narrow
    * whole-stage-codegen scan + a k-row `orderBy.limit`
    * (TakeOrderedAndProject), zero exchanges. `codebooks` defaults to
    * the deterministic smallest-id stand-in (oracle-reproducible);
    * pass [[trainPqCodebooks]]'s output for real recall. Output:
    * (idCol, adc) ordered ascending (it is a distance), ties by id.
    */
  /** The ADC column: the code's m table lookups summed left-to-right
    * (the fixed IEEE add chain the oracle's `list(ld ORDER BY m)`
    * fold reproduces).
    */
  private def adcColumn(lut: Array[Array[Double]], code: Column): Column =
    GraftFunctions.pq_adc(code, lut)

  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, m: Int = 8, ks: Int = 16,
      codebooks: Option[PqCodebooks] = None): DataFrame = {
    val cb = codebooks.getOrElse(pqCodebooks(df, idCol, vecCol, m, ks))
    val lut = pqAdcTable(cb, query)
    df.select(col(idCol), pqCode(cb, col(vecCol)).as("__code"))
      .select(col(idCol), round(adcColumn(lut, col("__code")), 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** ADC top-k over PRE-ENCODED codes — the at-rest query shape: the
    * corpus stores only its `array<int>` codes ([[pqCode]], or
    * [[pqUnpack]] of the packed long), encoding cost was paid once at
    * ingest, and a query is m lookups + sum per row over a
    * codes-only scan (~4 bytes/vector read instead of 256).
    * [[pqAdcTopK]] is the encode-in-flight convenience face; THIS is
    * what a production scan runs.
    */
  def pqAdcTopKCoded(df: DataFrame, idCol: String, codeCol: String,
      cb: PqCodebooks, query: Array[Double], k: Int): DataFrame = {
    val lut = pqAdcTable(cb, query)
    df.select(col(idCol), round(adcColumn(lut, col(codeCol)), 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** IVF-PQ top-k — the composed architecture a 100 TB vector store
    * actually runs (FAISS's IndexIVFPQ): the coarse IVF quantizer
    * prunes the scan to the `nprobe` cells nearest the query
    * ([[ivfTopK]]'s probe — at rest, `partitionBy(cell)` file
    * pruning), and rows inside the probed cells rank by PQ/ADC
    * ([[pqAdcTopK]]) without ever touching full-precision vectors —
    * at rest only the packed codes ([[pqPack]]) need reading, ~4
    * bytes/vector. Both stages stay narrow codegen'd projections of
    * inlined codebooks: no shuffle, no join, one pass over the probed
    * fraction, TakeOrderedAndProject for the k rows.
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ks: Int = 16,
      ivfCb: Option[IvfCodebook] = None,
      pqCb: Option[PqCodebooks] = None): DataFrame = {
    val cents = ivfCb.getOrElse(ivfCodebook(df, idCol, vecCol, nlist))
    val probed = ivfProbed(cents, query, nprobe)
    val cb = pqCb.getOrElse(pqCodebooks(df, idCol, vecCol, m, ks))
    val lut = pqAdcTable(cb, query)
    df.where(ivfCell(cents, col(vecCol)).isin(probed: _*))
      .select(col(idCol), pqCode(cb, col(vecCol)).as("__code"))
      .select(col(idCol), round(adcColumn(lut, col("__code")), 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** Driver-side replica of [[ivfCell]]'s assignment (same dot/norm
    * arithmetic in the same order, ties to the smaller centroid id) —
    * for deriving residuals of the bounded codebook sample rows.
    */
  private def assignCell(cents: IvfCodebook, v: Array[Double]): Long = {
    val vn = math.sqrt(seqDot(v, v))
    cents.map { case (id, c, n) => (seqDot(v, c) / (vn * n), id) }
      .maxBy { case (cos, id) => (cos, -id) }._2
  }

  /** Deterministic RESIDUAL PQ codebooks: subspace slices of the
    * residuals (vector minus its assigned coarse centroid) of the
    * `ks` smallest-id vectors — [[pqCodebooks]]' rule applied in
    * residual space. Residual encoding is what FAISS's IndexIVFPQ
    * actually quantizes: residuals concentrate near the origin across
    * ALL cells, so one shared table spends its codes on the
    * within-cell structure instead of re-describing the coarse
    * centroid every cell already pins down. Bounded driver collect
    * (ks rows).
    */
  def residualPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      cents: IvfCodebook, m: Int, ks: Int): PqCodebooks = {
    val rows = df.orderBy(col(idCol)).limit(ks)
      .select(transform(col(vecCol), x => x.cast("double")))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "cannot build PQ codebooks from an empty corpus")
    val dim = rows(0).length
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val centOf = cents.map(c => c._1 -> c._2).toMap
    val residuals = rows.map { v =>
      val cent = centOf(assignCell(cents, v))
      Array.tabulate(dim)(i => v(i) - cent(i))
    }
    Array.tabulate(m)(mi => residuals.map(_.slice(mi * dsub, (mi + 1) * dsub)))
  }

  /** TRAINED residual PQ codebooks: [[trainPqCodebooks]]' distributed
    * per-subspace k-means run in RESIDUAL space — the residual
    * `v - centroid(cell(v))` is materialized once per row (one narrow
    * codegen'd projection of the inlined coarse codebook, the
    * [[ivfPqDistortion]] discipline) and the trainer iterates over
    * that frame exactly as over raw vectors. This is what FAISS's
    * IndexIVFPQ `train` actually fits; [[residualPqCodebooks]] is the
    * deterministic oracle-reproducible stand-in.
    */
  def trainResidualPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      cents: IvfCodebook, m: Int, ks: Int,
      maxIters: Int = 10, tol: Double = 1e-9): PqCodebooks = {
    val res = df
      .select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__v"),
        ivfCell(cents, col(vecCol)).as("__cell"))
      .withColumn("__res",
        zip_with(col("__v"), cellCentroid(cents, col("__cell")), (a, b) => a - b))
      .select(col(idCol), col("__res"))
    trainPqCodebooks(res, idCol, "__res", m, ks, maxIters, tol)
  }

  /** RESIDUAL-encoded IVF-PQ top-k — the full FAISS IndexIVFPQ
    * algorithm ([[ivfPqTopK]] quantizes raw vectors; real IVFPQ
    * quantizes `v - centroid(cell(v))`): the coarse probe prunes as
    * before, and inside each probed cell both encoding and ADC run in
    * COMBINED coordinates — per cell c, codebook entry (m)(j) becomes
    * `centroid_c[m-slice] + rcb[m][j]`, so `||residual - rcb_j||`
    * computes as `||v - combined_j||` directly on the raw vector (the
    * driver pre-adds the KB-sized tables once; the per-row arithmetic
    * is the same [[pqCode]]/ADC chain, restated exactly by the
    * oracle). Residuals concentrate near the origin, so the shared
    * `ks` codes describe within-cell structure — measurably lower
    * quantization error than raw-vector PQ on clustered data
    * (OpsSpec asserts it).
    *
    * Scale shape: unchanged from [[ivfPqTopK]] — narrow codegen'd
    * projections, zero exchanges, into TakeOrderedAndProject. The
    * per-cell combined tables (nprobe x m x ks subvectors — the one
    * constant volume that multiplies by nprobe) travel as ONE codegen
    * reference object per expression ([[graft.functions.AnnHelper]]),
    * so the generated method is a single call per row at any
    * nprobe/m/ks — no 64 KB-method cliff, no interpreted fallback.
    */
  def ivfPqResidualTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ks: Int = 16,
      ivfCb: Option[IvfCodebook] = None,
      residualCb: Option[PqCodebooks] = None): DataFrame = {
    require(nprobe >= 1,
      "nprobe must be >= 1 (the probe needs at least one cell)")
    val cents = ivfCb.getOrElse(ivfCodebook(df, idCol, vecCol, nlist))
    val probed = ivfProbed(cents, query, nprobe)
    val rcb = residualCb.getOrElse(
      residualPqCodebooks(df, idCol, vecCol, cents, m, ks))
    val centOf = cents.map(c => c._1 -> c._2).toMap
    val dsub = rcb(0)(0).length
    // per-probed-cell COMBINED tables (centroid + residual entry) ride
    // along as ONE codegen reference object — the generated method is a
    // single helper call per row at any nprobe/m/ks, never the unrolled
    // nprobe x m x ks expression chain that overflowed Janino's 64 KB
    // method limit and silently demoted the probe stage to interpreted
    def combined(cell: Long): PqCodebooks = {
      val cent = centOf(cell)
      Array.tabulate(rcb.length)(mi => rcb(mi).map { c =>
        Array.tabulate(dsub)(i => cent(mi * dsub + i) + c(i))
      })
    }
    val cellIds = probed.toArray
    val cbs = cellIds.map(combined)
    // reuse the already-built combined tables: rebuilding them inside
    // the LUT derivation doubles the driver-side nprobe x m x ks x dsub
    // construction at production parameters
    val luts = cbs.map(cb => pqAdcTable(cb, query))
    df.withColumn("__cell", ivfCell(cents, col(vecCol)))
      .where(col("__cell").isin(probed: _*))
      .withColumn("__code",
        GraftFunctions.pq_encode_by_cell(col("__cell"), col(vecCol), cellIds, cbs))
      .select(col(idCol),
        round(GraftFunctions.pq_adc_by_cell(col("__cell"), col("__code"), cellIds, luts),
          6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** The centroid VECTOR of a cell-id column: a CASE chain over the
    * inlined codebook (nlist x dim literals — KB-sized, the
    * [[ivfCell]] inlining budget, NOT nlist x m x ks combined tables,
    * which is what keeps residual encoding writable at production
    * nlist).
    */
  private def cellCentroid(ivfCb: IvfCodebook, cell: Column): Column =
    ivfCb.tail.foldLeft(
      when(cell === ivfCb.head._1, vecLit(ivfCb.head._2))) {
      (acc, c) => acc.when(cell === c._1, vecLit(c._2))
    }

  /** The (id, cell, code) projection with RESIDUAL-encoded codes —
    * the at-rest face of [[ivfPqResidualTopK]]'s encoder: the residual
    * `v - centroid(cell(v))` is materialized as its own projection
    * (an expensive multi-reference alias, so Catalyst keeps it a
    * separate Project — evaluated once per row, not once per
    * centroid-distance term), and the SHARED residual codebook
    * quantizes it through the same [[pqCode]] argmin chain raw
    * encoding uses. Arithmetic is residual-coordinate
    * (`(v[i] - cent[i]) - r[i]`), restated exactly by the q148
    * oracle; [[ivfPqResidualTopK]]'s combined-coordinate form is the
    * same real number with a different (equally oracle-pinned) IEEE
    * association.
    */
  private def ivfPqResidualCoded(df: DataFrame, idCol: String, vecCol: String,
      ivfCb: IvfCodebook, rcb: PqCodebooks,
      cellCol: String, codeCol: String,
      keep: Seq[String]): DataFrame =
    df.select((col(idCol) +: keep.map(col)) ++ Seq(
      transform(col(vecCol), x => x.cast("double")).as("__v"),
      ivfCell(ivfCb, col(vecCol)).as(cellCol)): _*)
      .withColumn("__res",
        zip_with(col("__v"), cellCentroid(ivfCb, col(cellCol)), (a, b) => a - b))
      .select((col(idCol) +: keep.map(col)) ++ Seq(
        col(cellCol),
        pqCode(rcb, col("__res")).as(codeCol)): _*)

  /** The (id, cell, code) projection shared by the IVF-PQ layout
    * writers: one narrow codegen'd pass of two inlined codebooks —
    * no shuffle, no join, nothing driver-side.
    */
  private def ivfPqCoded(df: DataFrame, idCol: String, vecCol: String,
      ivfCb: IvfCodebook, pqCb: PqCodebooks,
      cellCol: String, codeCol: String,
      keep: Seq[String]): DataFrame =
    df.select((col(idCol) +: keep.map(col)) ++ Seq(
      ivfCell(ivfCb, col(vecCol)).as(cellCol),
      pqCode(pqCb, col(vecCol)).as(codeCol)): _*)

  /** Write the IVF-PQ AT-REST layout: (id, cell, code) rows
    * `partitionBy(cell)` — PQ codes only, never fp32 vectors, so a
    * probe reads ~4 bytes/vector from ~nprobe/nlist of the files
    * ([[writeIvfPartitioned]]'s pruning with [[pqAdcTopKCoded]]'s
    * scan). Overwrite clears the whole layout (any prior appends
    * included) — the full-rebuild face; daily ingest uses
    * [[appendIvfPq]].
    *
    * `keep` carries extra METADATA columns (language, source, license
    * tier, ...) into the layout, making filtered search possible at
    * rest: [[ivfPqTopKAtRest]]'s `filter` predicate over a kept
    * column is pushed into the parquet scan, so "top-k among docs
    * with lang = en" reads codes from probed cells with the predicate
    * evaluated at scan speed — never a post-rank re-query.
    */
  def writeIvfPqPartitioned(df: DataFrame, idCol: String, vecCol: String,
      ivfCb: IvfCodebook, pqCb: PqCodebooks, out: String,
      cellCol: String = "cell", codeCol: String = "code",
      keep: Seq[String] = Nil): Unit = {
    ivfPqCoded(df, idCol, vecCol, ivfCb, pqCb, cellCol, codeCol, keep)
      .write.mode("overwrite").partitionBy(cellCol).parquet(out)
    writeIvfPqCodebooks(df.sparkSession, out, ivfCb, pqCb)
  }

  /** Persist the codebooks INSIDE the layout (an `_codebooks` parquet
    * sidecar — underscore-prefixed, so plain reads of the layout skip
    * it, the `_SUCCESS` convention). A layout that carries its own
    * codebooks is SELF-CONTAINED: a fresh session probes it from the
    * files alone ([[ivfPqTopKFromFiles]]) — no retraining, no
    * out-of-band codebook hand-off — and [[appendIvfPq]] can verify
    * the caller's codebooks against the stored ones instead of
    * trusting them. KB-sized: nlist x dim + m x ks x dsub doubles.
    *
    * `pqKind` tags the quantizer the codes were produced by — `"pq"`
    * (raw-vector PQ, [[writeIvfPqPartitioned]]) or `"rpq"`
    * (residual PQ, [[writeIvfPqResidualPartitioned]]) — so a reader
    * can never ADC-rank codes through the wrong table class.
    */
  def writeIvfPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      layout: String, ivfCb: IvfCodebook, pqCb: PqCodebooks,
      pqKind: String = "pq"): Unit = {
    import org.apache.spark.sql.Row
    val ivfRows = ivfCb.zipWithIndex.map { case ((id, v, n), i) =>
      Row("ivf", i, id, v.toSeq, n)
    }.toSeq
    val pqRows = pqCb.zipWithIndex.flatMap { case (tbl, m) =>
      tbl.zipWithIndex.map { case (c, j) => Row(pqKind, m, j.toLong, c.toSeq, 0.0) }
    }.toSeq
    // driver-side sidecar write (nlist + m*ks KB-sized rows the driver
    // already holds): no Spark job, no committer — see Layouts.writeSidecar
    Layouts.writeSidecar(spark, layout + "/_codebooks", CodebooksSchema,
      ivfRows ++ pqRows)
  }

  /** Schema of the `_codebooks` sidecar (matches the previous
    * `Seq((String, Int, Long, Seq[Double], Double)).toDF` output).
    */
  private val CodebooksSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("kind", StringType, nullable = true),
      StructField("i", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = false),
        nullable = true),
      StructField("norm", DoubleType, nullable = false)))
  }

  /** Load the codebooks a [[writeIvfPqPartitioned]] layout was written
    * with (exact double round-trip through parquet — the loaded
    * codebooks reproduce cell assignment and encoding bit-for-bit).
    * Bounded driver collect: nlist + m x ks rows.
    */
  /** True iff `layout` carries a `_codebooks` sidecar — an explicit
    * filesystem check, so a present-but-corrupt sidecar can never
    * masquerade as absence and skip validation (r14 ADVICE).
    */
  def hasIvfPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      layout: String): Boolean =
    Layouts.exists(spark, layout + "/_codebooks")

  def readIvfPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      layout: String): (IvfCodebook, PqCodebooks) =
    readCodebooksOfKind(spark, layout, "pq", "rpq",
      "the layout holds RESIDUAL-encoded codes — probe it with " +
        "ivfPqResidualTopKFromFiles / readIvfPqResidualCodebooks")

  /** [[readIvfPqCodebooks]] for a RESIDUAL layout
    * ([[writeIvfPqResidualPartitioned]]): the second element is the
    * residual PQ tables (`kind='rpq'`). Fails fast on a raw-PQ
    * layout — ranking raw codes through residual tables (or vice
    * versa) is silent garbage, which the kind tag exists to prevent.
    */
  def readIvfPqResidualCodebooks(spark: org.apache.spark.sql.SparkSession,
      layout: String): (IvfCodebook, PqCodebooks) =
    readCodebooksOfKind(spark, layout, "rpq", "pq",
      "the layout holds raw-PQ codes — probe it with " +
        "ivfPqTopKFromFiles / readIvfPqCodebooks")

  /** The PQ kind the layout's `_codebooks` sidecar stores: `"pq"`
    * (raw-vector codes) or `"rpq"` (residual codes) — the dispatch a
    * kind-agnostic caller (the streaming ingest loop) needs to pick
    * the right encoder without being told out of band. Curated
    * failure on a missing sidecar or one holding neither kind.
    */
  def sidecarPqKind(spark: org.apache.spark.sql.SparkSession,
      layout: String): String = {
    require(hasIvfPqCodebooks(spark, layout),
      s"no _codebooks sidecar under $layout — a kind-agnostic append " +
        "cannot pick an encoder; rewrite with writeIvfPqPartitioned / " +
        "writeIvfPqResidualPartitioned (or use the explicit-codebook faces)")
    val kinds = Layouts.collectSidecarCached(spark, layout + "/_codebooks",
      "writeIvfPqPartitioned / writeIvfPqResidualPartitioned")
      .map(_.getString(0)).distinct.toSet
    // a sidecar holding BOTH kinds is ambiguous/corrupt (no writer
    // produces one): refusing beats silently preferring the raw
    // encoder — exactly the garbage mode the kind tag exists to prevent
    if (kinds.contains("pq") && kinds.contains("rpq"))
      throw new IllegalStateException(
        s"the _codebooks sidecar under $layout holds BOTH 'pq' and " +
          "'rpq' tables — ambiguous (no writer produces this); rebuild " +
          "the layout with writeIvfPqPartitioned / " +
          "writeIvfPqResidualPartitioned")
    if (kinds.contains("pq")) "pq"
    else if (kinds.contains("rpq")) "rpq"
    else throw new IllegalStateException(
      s"the _codebooks sidecar under $layout holds neither 'pq' nor " +
        s"'rpq' tables (kinds present: ${kinds.toSeq.sorted.mkString(", ")})")
  }

  private def readCodebooksOfKind(spark: org.apache.spark.sql.SparkSession,
      layout: String, kind: String, otherKind: String,
      otherHint: String): (IvfCodebook, PqCodebooks) = {
    require(hasIvfPqCodebooks(spark, layout),
      s"no _codebooks sidecar under $layout — the layout predates the " +
        "sidecar or was hand-built; pass the codebooks explicitly " +
        "(ivfPqTopKAtRest) or rewrite with writeIvfPqPartitioned")
    // cached per generation: a streaming loop re-derives kind and
    // codebooks every micro-batch, and without the cache each
    // derivation re-reads the same KB-sized sidecar parquet
    val rows = Layouts.collectSidecarCached(spark, layout + "/_codebooks",
      "writeIvfPqPartitioned")
    val ivf: IvfCodebook = rows.filter(_.getString(0) == "ivf")
      .sortBy(_.getInt(1))
      .map(r => (r.getLong(2), r.getSeq[Double](3).toArray, r.getDouble(4)))
    val pqRows = rows.filter(_.getString(0) == kind)
    if (pqRows.isEmpty) {
      // unconditional: a sidecar with only 'ivf' rows (or an unknown
      // kind string) must fail HERE, naming what it actually holds,
      // not defer to a confusing downstream pqAdcTable/pqCode error
      val present = rows.map(_.getString(0)).distinct.sorted
      val hint =
        if (present.contains(otherKind)) "; " + otherHint else ""
      throw new IllegalStateException(
        s"the _codebooks sidecar under $layout has no '$kind' tables " +
          s"(kinds present: ${present.mkString(", ")})" + hint)
    }
    val pq: PqCodebooks = pqRows.map(_.getInt(1)).distinct.sorted.map { m =>
      pqRows.filter(_.getInt(1) == m).sortBy(_.getLong(2))
        .map(_.getSeq[Double](3).toArray)
    }
    if (ivf.isEmpty) {
      // same exception FACE as the missing-PQ-kind and collectSidecar
      // failures: every corruption mode of a present sidecar is an
      // IllegalStateException, so one catch covers them all
      val present = rows.map(_.getString(0)).distinct.sorted
      throw new IllegalStateException(
        s"the _codebooks sidecar under $layout has no 'ivf' coarse " +
          s"codebook (kinds present: ${present.mkString(", ")})")
    }
    (ivf, pq)
  }

  private def sameCodebooks(a: (IvfCodebook, PqCodebooks),
      ivfCb: IvfCodebook, pqCb: PqCodebooks): Boolean = {
    val (si, sp) = a
    si.length == ivfCb.length &&
      si.zip(ivfCb).forall { case ((ia, va, na), (ib, vb, nb)) =>
        ia == ib && na == nb && java.util.Arrays.equals(va, vb) } &&
      sp.length == pqCb.length &&
      sp.zip(pqCb).forall { case (ta, tb) =>
        ta.length == tb.length &&
          ta.zip(tb).forall { case (ca, cb) => java.util.Arrays.equals(ca, cb) }
      }
  }

  /** INCREMENTAL maintenance of a [[writeIvfPqPartitioned]] layout —
    * the daily-ingest shape for vectors (the q131 near-dup-index play):
    * encode ONLY the new batch with the EXISTING codebooks and append
    * its (id, cell, code) rows into the cell directories. The corpus
    * side is never read, never re-encoded and never shuffled — the
    * append costs one narrow pass over the batch plus new files in the
    * cells the batch lands in (existing files untouched; parquet
    * appends are file-additive). Probes over corpus+increment then
    * answer from the merged listing with the SAME pruning
    * ([[ivfPqTopKAtRest]]) and no retraining.
    *
    * The codebooks MUST be the ones the layout was written with —
    * mixing codebooks silently mis-cells the batch, so when the layout
    * carries its `_codebooks` sidecar ([[writeIvfPqPartitioned]]
    * writes one) the append VERIFIES the caller's codebooks against
    * the stored ones and fails fast on a mismatch (exact comparison —
    * doubles round-trip parquet bit-for-bit). A sidecar-less layout
    * (pre-sidecar or hand-built) skips the check. Quantization error
    * drifts as the ingested distribution leaves the trained one; the
    * rebuild cadence (re-train + [[writeIvfPqPartitioned]]) is the
    * caller's policy, exactly as in FAISS's IndexIVFPQ `add` vs
    * re-`train` — and [[ivfPqDistortion]] / [[quantizationDrift]] is
    * the number to set that policy by (mean ADC reconstruction error,
    * batch vs trained corpus).
    */
  def appendIvfPq(batch: DataFrame, idCol: String, vecCol: String,
      ivfCb: IvfCodebook, pqCb: PqCodebooks, out: String,
      cellCol: String = "cell", codeCol: String = "code",
      keep: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    // refuse while a compaction holds the layout's quiesce marker: an
    // append racing the increment fold is the documented race, made
    // mechanical (the caller retries after the fold)
    Layouts.assertNotQuiesced(spark, out, "appendIvfPq")
    // absence of the sidecar (pre-sidecar or hand-built layout) skips
    // the check — decided by an explicit filesystem probe, so a
    // present-but-corrupt sidecar FAILS (curated, in readIvfPqCodebooks)
    // instead of silently skipping the validation it exists to enforce
    val stored =
      if (hasIvfPqCodebooks(spark, out)) Some(readIvfPqCodebooks(spark, out))
      else None
    stored.foreach { s =>
      require(sameCodebooks(s, ivfCb, pqCb),
        s"appendIvfPq: the codebooks passed do not match the ones stored " +
          s"with the layout at $out — an append encoded with different " +
          "codebooks silently mis-cells the batch; read them back with " +
          "readIvfPqCodebooks or rebuild with writeIvfPqPartitioned")
    }
    ivfPqCoded(batch, idCol, vecCol, ivfCb, pqCb, cellCol, codeCol, keep)
      .write.mode("append").partitionBy(cellCol).parquet(out)
  }

  /** [[appendIvfPq]] for the STREAMING ingest loop (the
    * [[graft.ops.Dedup.appendNearDupIndexIncrement]] play for
    * vectors): the batch's (id, cell, code) rows land in a directory
    * the batch OWNS (`_increments/ingest_batch=<id>`, cell-partitioned
    * inside it, overwritten wholesale), so a crash-replay rewrites the
    * same rows — plain `mode("append")` would duplicate them, and a
    * duplicated id in an ANN layout surfaces twice in a top-k.
    * Underscore-prefixed: plain reads and [[ivfPqTopKFromFiles]] skip
    * increments; probes opt in via
    * [[ivfPqTopKFromFilesWithIncrements]] /
    * [[ivfPqResidualTopKFromFilesWithIncrements]], and
    * [[compactIvfPqLayout]] folds them into the next base generation.
    *
    * The layout must be self-contained (a `_codebooks` sidecar): a
    * stream is automation, and automation may not silently skip the
    * codebook check a hand-driven append can opt out of. KIND-AWARE:
    * the sidecar's tag picks the encoder — raw codes into a 'pq'
    * layout, residual codes into an 'rpq' one — so a stream can never
    * poison a residual layout with raw codes or vice versa.
    */
  def appendIvfPqIncrement(batch: DataFrame, idCol: String, vecCol: String,
      out: String, batchId: Long,
      cellCol: String = "cell", codeCol: String = "code",
      keep: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    // a pointered store root resolves to the CURRENT generation per
    // batch — the first micro-batch after a pointered rebuild's swap
    // lands (and re-encodes) in the new generation automatically
    val layout = resolveLayout(spark, out)
    // the streaming append face refuses mid-compaction like the batch
    // faces: the failed micro-batch replays from the checkpoint after
    // the fold (idempotent increment directories make that safe)
    Layouts.assertNotQuiesced(spark, layout, "appendIvfPqIncrement")
    val coded = sidecarPqKind(spark, layout) match {
      case "rpq" =>
        val (ivfCb, rcb) = readIvfPqResidualCodebooks(spark, layout)
        ivfPqResidualCoded(batch, idCol, vecCol, ivfCb, rcb,
          cellCol, codeCol, keep)
      case _ =>
        val (ivfCb, pqCb) = readIvfPqCodebooks(spark, layout)
        ivfPqCoded(batch, idCol, vecCol, ivfCb, pqCb, cellCol, codeCol, keep)
    }
    coded.write.mode("overwrite").partitionBy(cellCol)
      .parquet(Layouts.incrementDir(layout, batchId))
  }

  /** [[ivfPqTopKFromFiles]] over base + committed streamed increments
    * ([[appendIvfPqIncrement]] directories): the probe predicate is
    * applied ABOVE the union and Catalyst pushes it into every side,
    * so each increment directory is partition-pruned to the probed
    * cells exactly like the base layout. `excludeBatchId` mirrors the
    * replay rule of the ingest loop (a batch's own in-flight directory
    * is never read).
    */
  def ivfPqTopKFromFilesWithIncrements(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      excludeBatchId: Option[Long] = None): DataFrame = {
    val layout = resolveLayout(spark, path)
    val (ivfCb, pqCb) = readIvfPqCodebooks(spark, layout)
    val probed = ivfProbed(ivfCb, query, nprobe)
    val scan = Layouts.withIncrements(spark, spark.read.parquet(layout), layout,
        Seq(idCol, cellCol, codeCol), excludeBatchId)
      .where(col(cellCol).isin(probed: _*))
    pqAdcTopKCoded(scan, idCol, codeCol, pqCb, query, k)
  }

  /** The append-or-rebuild decision of a [[maintainIvfPq]] call:
    * `action` is `"append"` or `"rebuild"`, `storedErr`/`freshErr` the
    * batch's mean ADC reconstruction error under the layout's stored
    * codebooks vs under codebooks derived from the batch itself, and
    * `layout` the path now holding the batch (the original layout on
    * append, `rebuildAt` on rebuild — the caller swaps its pointer to
    * it, LSM convention).
    */
  case class MaintainReport(action: String, storedErr: Double,
      freshErr: Double, layout: String)

  /** DRIFT-GATED incremental maintenance — the composition
    * [[appendIvfPq]] and [[ivfPqDistortion]] were built for, and the
    * loop FAISS's IndexIVFPQ leaves to the caller (`add` vs
    * re-`train`): append the batch while its quantization error under
    * the STORED codebooks stays close to what codebooks fitted to the
    * batch itself would achieve; once the stored tables describe the
    * batch materially worse than its own do — the ingested
    * distribution has left the trained one — retrain on corpus ∪ batch
    * and write a NEW generation at `rebuildAt`.
    *
    * The decision is self-contained: both error terms come from the
    * batch alone (one narrow codegen'd pass each, only (sum, count)
    * partials leave executors), so no baseline statistic needs storing
    * or trusting. `storedErr <= driftThreshold * freshErr` appends;
    * above it rebuilds. A threshold of 2.0 tolerates the stored tables
    * being up to 2× worse than batch-fitted ones before paying a
    * rebuild.
    *
    * `corpus` is the CURRENT corpus vectors (pre-batch) — evaluated
    * ONLY on the rebuild path (appends never touch it), which is what
    * makes the steady state cheap: a year of in-distribution batches
    * costs a year of narrow append passes, and the corpus-wide retrain
    * runs exactly when the drift signal says the index stopped
    * describing the data. nlist/m/ks are DERIVED from the stored
    * codebooks, so a rebuild preserves the layout's geometry; the
    * codebooks are the deterministic smallest-id ones (the
    * oracle-reproducible rule) — swap in [[trainIvfCodebook]] /
    * [[trainPqCodebooks]] outputs by rebuilding manually when recall
    * matters more than reproducibility.
    *
    * QUIESCE WINDOW CAVEAT (rebuild path): the marker is released when
    * this call returns, BEFORE the caller swaps its pointer to
    * `rebuildAt` — an append landing in that gap writes into the old
    * generation and silently vanishes at the swap. Keep appends
    * quiesced until the swap, or use [[maintainPointedIvfPq]], which
    * swaps the generation pointer INSIDE the marker window.
    *
    * A batch of `ks` rows or fewer always APPENDS: its own stand-in
    * codebooks memorize it exactly (freshErr = 0), so the comparison
    * would otherwise trigger a full corpus retrain on a trickle batch
    * that carries no evidence about the distribution. The drift
    * question is asked again on the next large-enough batch.
    *
    * KIND-AWARE: the sidecar's 'pq'/'rpq' tag picks the quantizer —
    * a residual layout is scored by residual reconstruction error,
    * appended with residual codes, and rebuilt as a new 'rpq'
    * generation (spec-pinned for both kinds).
    */
  def maintainIvfPq(spark: org.apache.spark.sql.SparkSession,
      layout: String, corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, rebuildAt: String,
      driftThreshold: Double = 2.0, trained: Boolean = false): MaintainReport =
    maintainIvfPqCore(spark, layout, corpus, batch, idCol, vecCol,
      rebuildAt, driftThreshold, trained, afterRebuild = () => ())

  /** [[maintainIvfPq]] over a POINTERED store root
    * ([[Layouts.GenerationPointer]]): the live generation is resolved
    * through `root/_current`, the rebuild target is the next
    * `gen<k+1>` name, and on rebuild the pointer is swapped INSIDE the
    * quiesce window — closing the race [[maintainIvfPq]]'s caveat
    * documents: by the time the marker lifts, every probe and append
    * face ([[resolveLayout]]) already answers from the new generation,
    * so there is no gap for an append to land in the superseded one.
    *
    * Crash discipline: a crash between the generation write and the
    * swap leaves the marker HELD (appends stay refused — no data
    * loss); the operator inspects, then either completes by hand
    * ([[Layouts.swapGenerationPointer]] + [[Layouts.releaseQuiesce]])
    * or deletes the orphan generation and releases. The automated
    * drift-series face ([[maintainPointedFromDriftSeries]]) recovers
    * this window mechanically via its fence record.
    */
  def maintainPointedIvfPq(spark: org.apache.spark.sql.SparkSession,
      root: String, corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String,
      driftThreshold: Double = 2.0, trained: Boolean = false): MaintainReport = {
    val gen = Layouts.currentGenerationName(spark, root)
    val next = nextGenerationName(root, gen)
    maintainIvfPqCore(spark, s"$root/$gen", corpus, batch, idCol, vecCol,
      s"$root/$next", driftThreshold, trained,
      afterRebuild = () => Layouts.swapGenerationPointer(spark, root, next))
  }

  /** `gen<k>` -> `gen<k+1>` — the naming convention the pointered
    * lifecycle derives its rebuild targets from.
    */
  private def nextGenerationName(root: String, gen: String): String = {
    val Gen = "gen(\\d+)".r
    gen match {
      case Gen(k) => s"gen${k.toLong + 1}"
      case _ => throw new IllegalArgumentException(
        "the pointered maintenance lifecycle derives the next " +
          "generation from the current one's name, which must match " +
          s"gen<k>; '$gen' (under $root) does not — re-point " +
          s"${Layouts.GenerationPointer} at a gen<k>-named generation " +
          "or use the explicit-rebuildAt faces")
    }
  }

  /** Kind-aware retrain + new-generation write shared by every
    * rebuild path: geometry (nlist, m, ks) comes from the superseded
    * generation, codebooks from the deterministic smallest-id rule
    * (`trained = false`, oracle-reproducible) or the distributed
    * k-means trainers (`trained = true` —
    * [[trainIvfCodebook]]/[[trainPqCodebooks]]/
    * [[trainResidualPqCodebooks]], strictly lower distortion on
    * drifted corpora, spec-pinned).
    */
  private def retrainGeneration(residual: Boolean,
      nlist: Int, m: Int, ks: Int, all: DataFrame,
      idCol: String, vecCol: String, rebuildAt: String,
      trained: Boolean): Unit = {
    val newIvf =
      if (trained) trainIvfCodebook(all, idCol, vecCol, nlist)
      else ivfCodebook(all, idCol, vecCol, nlist)
    if (residual) {
      val newRcb =
        if (trained) trainResidualPqCodebooks(all, idCol, vecCol, newIvf, m, ks)
        else residualPqCodebooks(all, idCol, vecCol, newIvf, m, ks)
      writeIvfPqResidualPartitioned(all, idCol, vecCol, newIvf, newRcb, rebuildAt)
    } else {
      val newPq =
        if (trained) trainPqCodebooks(all, idCol, vecCol, m, ks)
        else pqCodebooks(all, idCol, vecCol, m, ks)
      writeIvfPqPartitioned(all, idCol, vecCol, newIvf, newPq, rebuildAt)
    }
  }

  private def maintainIvfPqCore(spark: org.apache.spark.sql.SparkSession,
      layout: String, corpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, rebuildAt: String,
      driftThreshold: Double, trained: Boolean,
      afterRebuild: () => Unit): MaintainReport = {
    require(driftThreshold >= 1.0,
      s"driftThreshold=$driftThreshold: below 1.0 every batch rebuilds " +
        "(stored codebooks cannot beat batch-fitted ones on the batch's " +
        "own distribution)")
    require(layout != rebuildAt,
      "maintainIvfPq writes the rebuilt generation at rebuildAt; swap " +
        "the pointer after (an in-place rewrite would clobber the files " +
        "it reads)")
    // KIND-AWARE like the streaming append: the sidecar's tag picks
    // the quantizer — a residual layout's drift is its residual
    // reconstruction error, its append encodes residual codes, and its
    // rebuild writes a new 'rpq' generation
    val residual = sidecarPqKind(spark, layout) == "rpq"
    val (ivfCb, pqCb) =
      if (residual) readIvfPqResidualCodebooks(spark, layout)
      else readIvfPqCodebooks(spark, layout)
    val (nlist, m, ks) = (ivfCb.length, pqCb.length, pqCb(0).length)
    val storedErr = ivfPqDistortion(batch, vecCol, ivfCb, pqCb, residual)
    // a batch of <= ks rows is MEMORIZED by its own stand-in codebooks
    // (every vector is an entry -> freshErr = 0), so the comparison
    // would rebuild on any nonzero storedErr — a full corpus retrain
    // triggered by a trickle batch carrying no distribution evidence.
    // Tiny batches append unconditionally; the drift question is asked
    // again when a batch large enough to answer it arrives. (Bounded
    // probe: limit ks+1, never a full count.)
    val tiny = batch.select(col(idCol)).limit(ks + 1).count() <= ks
    val freshIvf = ivfCodebook(batch, idCol, vecCol, nlist)
    val freshPq =
      if (residual) residualPqCodebooks(batch, idCol, vecCol, freshIvf, m, ks)
      else pqCodebooks(batch, idCol, vecCol, m, ks)
    val freshErr = ivfPqDistortion(batch, vecCol, freshIvf, freshPq, residual)
    if (tiny || storedErr <= driftThreshold * freshErr) {
      if (residual)
        appendIvfPqResidual(batch, idCol, vecCol, ivfCb, pqCb, layout)
      else appendIvfPq(batch, idCol, vecCol, ivfCb, pqCb, layout)
      MaintainReport("append", storedErr, freshErr, layout)
    } else {
      // hold the layout's quiesce marker for the retrain (the
      // maintainFromDriftSeries discipline): a stream batch landing in
      // the OLD generation mid-retrain would vanish at the pointer
      // swap; with the marker it fails curated and replays after. The
      // marker is taken AFTER the decision — the append branch must
      // not refuse against our own marker — so an append that slipped
      // in during the decision scans is the caller's corpus-of-record
      // to re-ship, exactly as with any batch ingested after the
      // retrain's corpus snapshot.
      Layouts.acquireQuiesce(spark, layout, "maintainIvfPq")
      try {
        // the handshake's second half, exactly as the compactors do
        // it: the marker stops NEW appends; this catches the one that
        // passed its check before we acquired and is still staging —
        // letting it drain (the caller retries) beats retiring its
        // rows with the pointer swap
        Layouts.assertNoInflightIncrements(spark, layout, "maintainIvfPq")
        val all = corpus.select(col(idCol), col(vecCol))
          .unionByName(batch.select(col(idCol), col(vecCol)))
        retrainGeneration(residual, nlist, m, ks, all, idCol, vecCol,
          rebuildAt, trained)
        // still inside the quiesce window: the pointered face swaps
        // _current here, so no append can land in the old generation
        // between the rebuild and the swap
        afterRebuild()
        MaintainReport("rebuild", storedErr, freshErr, rebuildAt)
      } finally Layouts.releaseQuiesce(spark, layout)
    }
  }

  /** The drift series a [[graft.streaming.StreamingSimilarity]] ingest
    * loop writes (`driftOut` — one row per micro-batch: the batch's
    * mean ADC reconstruction error under the layout's STORED
    * codebooks), read back as (ingest_batch, pq_err) ordered by batch.
    * One row per batch, never data-proportional.
    *
    * FORMAT-UPGRADE SAFE (spec-verified): batches written before
    * round 18's fix embedded `ingest_batch` as a DATA column as well;
    * Spark's partition discovery lets the directory-derived partition
    * column shadow the embedded copy — which held the identical value
    * by construction — so a driftOut mixing old and new batch
    * directories reads correctly with no migration. A series that
    * fails ANALYSIS (empty/unschematizable directory) fails here with
    * a curated message; execution-time corruption (a torn part file)
    * surfaces when the returned frame is consumed —
    * [[maintainFromDriftSeries]] wraps its collect with the curated
    * recovery hint (delete the torn batch directory; its replay
    * rewrites it).
    */
  def readDriftSeries(spark: org.apache.spark.sql.SparkSession,
      driftOut: String): DataFrame = {
    require(Layouts.exists(spark, driftOut),
      s"no drift series at $driftOut — point the ingest stream's " +
        "driftOut here first (StreamingSimilarity.incrementalAnnStream)")
    // a series whose every report was pruned ([[pruneDriftSeries]]
    // right after a rebuild, before any post-fence batch lands) holds
    // only underscore entries (the _rebuilt fence): that is a VALID
    // empty series — the steady state between generations — not the
    // unreadable-directory corruption the catch below curates. One
    // namenode listing; parquet read skipped entirely when empty.
    val root = new org.apache.hadoop.fs.Path(driftOut)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasReports = fs.listStatus(root)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("ingest_batch="))
    if (!hasReports)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ingest_batch",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pq_err",
            org.apache.spark.sql.types.DoubleType))))
    val raw =
      try spark.read.option("basePath", driftOut).parquet(driftOut)
        .select(col("ingest_batch").cast("long").as("ingest_batch"),
          col("pq_err"))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalStateException(
            s"the drift series at $driftOut is unreadable — expected " +
              "per-batch ingest_batch=<id> directories each holding a " +
              "one-row (pq_err) parquet file, as written by " +
              "StreamingSimilarity.incrementalAnnStream's driftOut", e)
      }
    raw.orderBy(col("ingest_batch"))
  }

  /** The verdict of a [[maintainFromDriftSeries]] call: `action` is
    * `"keep"` or `"rebuild"`, `baselineErr`/`trailingErr` the medians
    * of the series' first and last `window` drift reports, `batches`
    * the series length, and `layout` the path now current (the
    * original layout on keep, `rebuildAt` on rebuild — the caller
    * swaps its pointer to it, LSM convention).
    */
  case class DriftSeriesReport(action: String, baselineErr: Double,
      trailingErr: Double, batches: Long, layout: String)

  /** The MONITORING JOB that closes the ANN maintenance loop — the
    * composition [[graft.streaming.StreamingSimilarity]]'s scaladoc
    * defers to the caller: the ingest stream writes one drift report
    * per micro-batch (`driftOut`), and this job thresholds that series
    * and triggers the rebuild, so stream + monitor together implement
    * what [[maintainIvfPq]] does for a hand-driven batch.
    *
    * Decision, self-contained from the series alone (no baseline
    * statistic stored or trusted): `baseline` = median of the FIRST
    * `window` reports — the errors right after the codebooks were
    * trained, in-distribution by construction — and `trailing` =
    * median of the LAST `window`. Medians, not single batches: one
    * noisy micro-batch (a small or skewed file) must not trigger a
    * corpus-wide retrain. REBUILD when `trailing >
    * driftThreshold * baseline` and the series holds at least
    * `2 * window` reports (shorter series would compare overlapping
    * windows — a series against itself); otherwise KEEP.
    *
    * On rebuild the job takes the layout's quiesce marker
    * ([[graft.ops.Layouts.acquireQuiesce]]) for the whole retrain, so
    * the live stream's appends fail curated and replay from the
    * checkpoint into the NEW generation after the caller swaps the
    * pointer — without the marker, a batch appended to the old
    * generation mid-retrain would silently vanish at the swap.
    * `corpus` is the CURRENT full vector corpus (base + everything
    * ingested — the caller's system of record for raw vectors; the
    * layout itself stores only codes): the new generation at
    * `rebuildAt` is trained on it and re-encodes all of it, kind-aware
    * ('pq'/'rpq' from the sidecar, geometry preserved), with the
    * deterministic smallest-id codebooks ([[maintainIvfPq]]'s
    * oracle-reproducible rule).
    *
    * Cost shape: the keep path reads one KB-sized row per micro-batch
    * ever ingested (never data-proportional) and touches nothing else;
    * the corpus-wide retrain runs exactly when the series says the
    * stored tables stopped describing the data.
    *
    * RECURRING-RUN SAFE — a rebuild FENCES the series: the reports it
    * consumed describe the OLD generation's codebooks, so without a
    * fence every later monitor run would re-compare the new world
    * against the old baseline and re-fire the retrain forever. The
    * fence (`driftOut/_rebuilt`, the max batch id consumed — written
    * inside the quiesce window, after the new generation) makes later
    * runs threshold only batches ingested AFTER it; until a fresh
    * window accumulates they return `keep` with `batches = 0` and NaN
    * medians. A rebuild also REFUSES when `rebuildAt` already exists:
    * after a crash between the generation write and the fence write,
    * the operator decides (delete the orphan and re-run, or fence by
    * hand if the pointer swap already happened) instead of the monitor
    * silently overwriting a possibly-live generation. Pass a fresh
    * `rebuildAt` per generation, as with the compactors' dst.
    */
  def maintainFromDriftSeries(spark: org.apache.spark.sql.SparkSession,
      driftOut: String, layout: String, corpus: DataFrame,
      idCol: String, vecCol: String, rebuildAt: String,
      window: Int = 3, driftThreshold: Double = 2.0,
      trained: Boolean = false, prune: Boolean = false): DriftSeriesReport =
    maintainDriftCore(spark, driftOut, layout, corpus, idCol, vecCol,
      rebuildAt, window, driftThreshold, trained,
      fenceGeneration = None, afterFence = () => (), prune = prune)

  /** [[maintainFromDriftSeries]] over a POINTERED store root — the
    * fully-automated monitor tick: the live generation resolves
    * through `root/_current`, the rebuild target is the next
    * `gen<k+1>`, and on rebuild the fence records the new generation's
    * NAME and the pointer is swapped INSIDE the quiesce window (then
    * optionally the consumed reports are pruned) — so the
    * append-lands-in-the-old-generation race of the explicit-rebuildAt
    * face's caveat has no gap, and the next monitor tick, probe, and
    * ingest micro-batch all answer from the new generation via
    * [[resolveLayout]] with no operator in the loop.
    *
    * CRASH-RECOVERY, mechanical: the fence (written after the new
    * generation, before the swap) is the rebuild's commit record. A
    * run that finds a fence naming a generation the pointer does NOT
    * point at (and that exists on disk) died in the fence→swap window:
    * it completes the swap idempotently, releases the marker the dead
    * run left held on the superseded generation, and returns `action
    * = "swap"` — never a second fold (the series is already fenced).
    * A crash BEFORE the fence leaves an unfenced `gen<k+1>`; the next
    * tick's rebuild refuses on it curated, exactly as the explicit
    * face does. A crash AFTER the swap but before the marker release
    * leaves a stale marker on the SUPERSEDED generation — harmless
    * (appends resolve to the new generation) and reclaimed with it by
    * [[graft.ops.Layouts.vacuumGenerations]].
    */
  def maintainPointedFromDriftSeries(spark: org.apache.spark.sql.SparkSession,
      root: String, driftOut: String, corpus: DataFrame,
      idCol: String, vecCol: String,
      window: Int = 3, driftThreshold: Double = 2.0,
      trained: Boolean = false, prune: Boolean = false): DriftSeriesReport = {
    val gen = Layouts.currentGenerationName(spark, root)
    // FORWARD-ONLY recovery (r20 ADVICE, high): the fence names the
    // generation its rebuild produced, but the pointer can legitimately
    // advance PAST that generation without touching the fence
    // (compactPointedIvfPqLayout / maintainPointedIvfPq swap _current
    // and never write a drift fence) — treating any fence≠pointer
    // disagreement as an interrupted swap would then swap the pointer
    // BACKWARD onto the superseded generation, resurrecting rows a
    // compaction retired. Only a fence generation NUMERICALLY AHEAD of
    // the current pointer can be an interrupted fence→swap window;
    // anything else (behind, equal, or non-gen<k>-named) is history.
    val GenName = "gen(\\d+)".r
    def genIdx(n: String): Option[Long] = n match {
      case GenName(k) => Some(k.toLong)
      case _ => None
    }
    val pendingSwap = readFence(spark, driftOut).flatMap(_._2)
      .filter(g => g != gen && Layouts.exists(spark, s"$root/$g") &&
        (for { gi <- genIdx(g); ci <- genIdx(gen) } yield gi > ci)
          .getOrElse(false))
    pendingSwap match {
      case Some(g) =>
        Layouts.swapGenerationPointer(spark, root, g)
        Layouts.releaseQuiesce(spark, s"$root/$gen")
        DriftSeriesReport("swap", Double.NaN, Double.NaN, 0, s"$root/$g")
      case None =>
        val next = nextGenerationName(root, gen)
        maintainDriftCore(spark, driftOut, s"$root/$gen", corpus, idCol,
          vecCol, s"$root/$next", window, driftThreshold, trained,
          fenceGeneration = Some(next),
          afterFence = () => Layouts.swapGenerationPointer(spark, root, next),
          prune = prune)
    }
  }

  /** The drift series' fence record: (max consumed ingest_batch, the
    * generation the rebuild produced — None for fences written by the
    * explicit-rebuildAt face or before the pointer existed).
    */
  private def readFence(spark: org.apache.spark.sql.SparkSession,
      driftOut: String): Option[(Long, Option[String])] = {
    val fencePath = s"$driftOut/$RebuiltFence"
    if (!Layouts.exists(spark, fencePath)) None
    else {
      // cached per fence generation (the sidecar-cache discipline): a
      // recurring monitor tick reads the fence 2-3 times — recovery
      // check, empty-series check, threshold filter — and without the
      // cache each is a driver-side parquet read of the same KB file
      val r = Layouts.collectSidecarCached(spark, fencePath,
        "maintainFromDriftSeries (the fence is written by its rebuild " +
          "path)")(0)
      val gen =
        if (r.schema.fieldNames.contains("generation"))
          Option(r.getAs[String]("generation"))
        else None
      Some((r.getAs[Long]("through_batch"), gen))
    }
  }

  private def maintainDriftCore(spark: org.apache.spark.sql.SparkSession,
      driftOut: String, layout: String, corpus: DataFrame,
      idCol: String, vecCol: String, rebuildAt: String,
      window: Int, driftThreshold: Double, trained: Boolean,
      fenceGeneration: Option[String], afterFence: () => Unit,
      prune: Boolean): DriftSeriesReport = {
    require(window >= 1, s"window=$window: the medians need at least one report")
    require(driftThreshold >= 1.0,
      s"driftThreshold=$driftThreshold: below 1.0 an in-distribution " +
        "series (trailing ~= baseline) would rebuild on noise")
    require(layout != rebuildAt,
      "maintainFromDriftSeries writes the rebuilt generation at " +
        "rebuildAt; swap the pointer after (an in-place rewrite would " +
        "clobber the files the live stream and the retrain read)")
    // one double per micro-batch ever ingested — bounded by batch
    // count, never by data volume. Wrapped so an execution-time
    // failure (a torn part file a killed report writer left) names
    // the drift-series contract instead of surfacing as a raw task
    // exception.
    val fullSeries =
      try readDriftSeries(spark, driftOut)
        .select(col("ingest_batch"), col("pq_err").cast("double"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      catch {
        case e: org.apache.spark.SparkException =>
          throw new IllegalStateException(
            s"the drift series at $driftOut failed mid-read — a torn " +
              "per-batch report (killed writer) or a foreign file; " +
              "delete the offending ingest_batch directory (its batch " +
              "will rewrite it on replay) and re-run", e)
      }
    // the fence: reports at or before the last rebuild describe the
    // OLD generation's codebooks — thresholding them against the new
    // world would re-fire the retrain on every monitor run forever
    val fencePath = s"$driftOut/$RebuiltFence"
    // a series with zero reports is only legitimate when a fence shows
    // a rebuild consumed (and pruneDriftSeries dropped) them — the
    // steady state right after a prune, before new batches land; an
    // unfenced empty series means the ingest stream never committed
    if (fullSeries.isEmpty) {
      require(Layouts.exists(spark, fencePath),
        s"the drift series at $driftOut holds no reports — nothing to " +
          "threshold (has the ingest stream committed a batch?)")
      return DriftSeriesReport("keep", Double.NaN, Double.NaN, 0, layout)
    }
    val fencedThrough = readFence(spark, driftOut)
      .map(_._1).getOrElse(Long.MinValue)
    val series = fullSeries.filter(_._1 > fencedThrough).map(_._2)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    if (series.isEmpty)
      // everything already consumed by the last rebuild: the steady
      // state right after a generation swap, before new batches land
      return DriftSeriesReport("keep", Double.NaN, Double.NaN, 0, layout)
    val baseline = median(series.take(window))
    val trailing = median(series.takeRight(window))
    val drifted =
      series.length >= 2 * window && trailing > driftThreshold * baseline
    if (!drifted)
      DriftSeriesReport("keep", baseline, trailing, series.length, layout)
    else {
      require(!Layouts.exists(spark, rebuildAt),
        s"maintainFromDriftSeries: $rebuildAt already exists — either a " +
          "crashed rebuild left an unfenced generation (delete it and " +
          "re-run, or write the fence by hand if its pointer swap " +
          "already happened) or the path is a live generation; the " +
          "monitor never overwrites it. Pass a fresh rebuildAt per " +
          "generation.")
      // quiesce for the whole retrain: a stream append landing in the
      // OLD generation mid-rebuild would vanish at the pointer swap;
      // with the marker held it fails curated and the checkpoint
      // replays it into the new generation
      Layouts.acquireQuiesce(spark, layout, "maintainFromDriftSeries")
      try {
        // second half of the handshake (the compactors' rule): an
        // append that passed its marker check before we acquired and
        // is still staging must drain before the retrain+swap retires
        // its generation
        Layouts.assertNoInflightIncrements(spark, layout,
          "maintainFromDriftSeries")
        val residual = sidecarPqKind(spark, layout) == "rpq"
        val (ivfCb, pqCb) =
          if (residual) readIvfPqResidualCodebooks(spark, layout)
          else readIvfPqCodebooks(spark, layout)
        val (nlist, m, ks) = (ivfCb.length, pqCb.length, pqCb(0).length)
        val all = corpus.select(col(idCol), col(vecCol))
        retrainGeneration(residual, nlist, m, ks, all, idCol, vecCol,
          rebuildAt, trained)
        // fence AFTER the generation, still inside the quiesce window:
        // the consumed reports describe the generation this rebuild
        // just replaced, and the fence doubles as the COMMIT RECORD
        // the pointered face's crash-recovery keys on (it carries the
        // new generation's name). A crash before this line leaves an
        // unfenced rebuildAt, which the exists-refusal above surfaces
        // on the re-run.
        Layouts.writeSidecar(spark, fencePath, RebuiltFenceSchema,
          Seq(org.apache.spark.sql.Row(
            fullSeries.map(_._1).max, fenceGeneration.orNull)))
        // the pointered face swaps _current here — inside the marker
        // window, after the commit record
        afterFence()
        // self-maintaining series: with the fence just written, every
        // consumed report is provably dead weight — prune it now so a
        // year of monitor ticks never pays a year of listing tax
        if (prune) pruneDriftSeries(spark, driftOut)
        DriftSeriesReport("rebuild", baseline, trailing, series.length,
          rebuildAt)
      } finally Layouts.releaseQuiesce(spark, layout)
    }
  }

  /** The drift series' rebuild fence (`driftOut/_rebuilt`): one row —
    * the max ingest_batch a [[maintainFromDriftSeries]] rebuild
    * consumed. Underscore-prefixed, so [[readDriftSeries]]' root read
    * (the dashboard face, full history) never sees it; the monitor
    * thresholds only batches past it.
    */
  val RebuiltFence = "_rebuilt"

  /** Schema of the drift series' `_rebuilt` fence sidecar. */
  private val RebuiltFenceSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("through_batch", LongType, nullable = false),
      StructField("generation", StringType, nullable = true)))
  }

  /** Drop the drift reports a rebuild already CONSUMED — the series'
    * own small-files pay-down (the [[compactIvfPqLayout]] play for
    * the monitoring data): a year of per-batch report directories is
    * a listing tax on every monitor tick and dashboard read, and
    * everything at or before the fence can never influence a decision
    * again. Deletes every `ingest_batch=<id>` directory with
    * `id <= fence`; refuses curated when no fence exists (an unfenced
    * series has consumed nothing — pruning it would erase live
    * evidence). The fence itself stays: replays of pruned batches
    * (crash-recovery of a long-stopped stream) rewrite their report
    * directories, and the fence keeps them out of future decisions.
    * Returns the number of directories pruned.
    */
  def pruneDriftSeries(spark: org.apache.spark.sql.SparkSession,
      driftOut: String): Long = {
    val fencePath = s"$driftOut/$RebuiltFence"
    require(Layouts.exists(spark, fencePath),
      s"pruneDriftSeries: no $RebuiltFence fence under $driftOut — the " +
        "series has not been consumed by a rebuild; pruning would erase " +
        "live evidence (run maintainFromDriftSeries first)")
    val through = Layouts.collectSidecar(spark, fencePath,
      "maintainFromDriftSeries (the fence is written by its rebuild " +
        "path)")(0).getAs[Long]("through_batch")
    val root = new org.apache.hadoop.fs.Path(driftOut)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Batch = "ingest_batch=(-?\\d+)".r
    val pruned = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case Batch(id) if id.toLong <= through => Some(p)
          case _ => None
        }
      }
    pruned.foreach(fs.delete(_, true))
    pruned.length.toLong
  }

  /** Write the RESIDUAL-encoded IVF-PQ at-rest layout — the
    * [[ivfPqResidualTopK]] encoder persisted (the strictly better
    * quantizer: residuals concentrate near the origin, so the shared
    * `ks` codes describe within-cell structure; recall-dominance over
    * raw-vector PQ is spec-proven in OpsSpec). Same file shape as
    * [[writeIvfPqPartitioned]] — (id, cell, code) `partitionBy(cell)`,
    * codes only, ~4 B/vector — with the `_codebooks` sidecar tagging
    * its PQ tables `kind='rpq'` so a probe can never rank residual
    * codes through raw tables or vice versa.
    *
    * Scale: the encode is one narrow codegen'd pass — cell assignment
    * (inlined nlist x dim centroids), a once-per-row residual
    * projection, and the SHARED m x ks residual argmin. The inlined
    * constant volume is nlist x dim + m x ks x dsub doubles (KB) —
    * NOT the per-cell combined tables (nlist x m x ks x dsub), which
    * is what keeps residual encoding writable at production nlist.
    */
  def writeIvfPqResidualPartitioned(df: DataFrame, idCol: String,
      vecCol: String, ivfCb: IvfCodebook, rcb: PqCodebooks, out: String,
      cellCol: String = "cell", codeCol: String = "code",
      keep: Seq[String] = Nil): Unit = {
    ivfPqResidualCoded(df, idCol, vecCol, ivfCb, rcb, cellCol, codeCol, keep)
      .write.mode("overwrite").partitionBy(cellCol).parquet(out)
    writeIvfPqCodebooks(df.sparkSession, out, ivfCb, rcb, pqKind = "rpq")
  }

  /** [[appendIvfPq]] for a residual layout: encode ONLY the batch with
    * the EXISTING codebooks (residual coordinates, never retrained)
    * and append file-additively into the cell directories. The
    * sidecar check verifies BOTH the coarse centroids and the
    * residual tables — and, via the `kind='rpq'` tag, that the layout
    * is residual-encoded at all (appending residual codes into a
    * raw-PQ layout silently poisons every probe).
    */
  def appendIvfPqResidual(batch: DataFrame, idCol: String, vecCol: String,
      ivfCb: IvfCodebook, rcb: PqCodebooks, out: String,
      cellCol: String = "cell", codeCol: String = "code",
      keep: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    Layouts.assertNotQuiesced(spark, out, "appendIvfPqResidual")
    val stored =
      if (hasIvfPqCodebooks(spark, out))
        Some(readIvfPqResidualCodebooks(spark, out))
      else None
    stored.foreach { s =>
      require(sameCodebooks(s, ivfCb, rcb),
        s"appendIvfPqResidual: the codebooks passed do not match the " +
          s"ones stored with the layout at $out — an append encoded " +
          "with different codebooks silently mis-cells the batch; read " +
          "them back with readIvfPqResidualCodebooks or rebuild with " +
          "writeIvfPqResidualPartitioned")
    }
    ivfPqResidualCoded(batch, idCol, vecCol, ivfCb, rcb, cellCol, codeCol, keep)
      .write.mode("append").partitionBy(cellCol).parquet(out)
  }

  /** Per-row PQ quantization error: the squared L2 distance between
    * the vector and its nearest codebook entry, summed across the m
    * subspaces in order — the ADC reconstruction error of the code
    * [[pqCode]] would assign (the argmin distance IS the error, so no
    * code round-trip is needed). A narrow fully-codegen projection of
    * the inlined tables, like the encode itself.
    */
  private def pqDistortionCol(vec: Column, cb: PqCodebooks): Column =
    GraftFunctions.pq_min_dist(vec, cb)

  /** Mean ADC reconstruction error of a corpus under a quantizer —
    * THE number behind [[appendIvfPq]] / [[appendIvfPqResidual]]'s
    * "rebuild cadence is the caller's policy": quantization error
    * drifts upward as the ingested distribution leaves the trained
    * one, and this metric is how the caller sets the re-train
    * threshold (FAISS's `IndexIVFPQ` exposes the same diagnostic as
    * imbalance/quantization-error stats).
    *
    * `residual = false` scores raw-vector PQ codes ([[pqCode]] under
    * `cb`); `residual = true` scores residual codes (`v -
    * centroid(cell(v))` under the residual tables — the
    * [[writeIvfPqResidualPartitioned]] encoder). Cost: ONE narrow
    * codegen'd pass + a map-side partial average — only (sum, count)
    * partials leave an executor, never rows (the [[trainIvfCodebook]]
    * aggregation discipline in its DataFrame form).
    */
  def ivfPqDistortion(df: DataFrame, vecCol: String,
      ivfCb: IvfCodebook, cb: PqCodebooks, residual: Boolean): Double = {
    val err =
      if (!residual) pqDistortionCol(col(vecCol), cb)
      else {
        // the residual projection is materialized once per row (the
        // ivfPqResidualCoded discipline), then scored
        pqDistortionCol(col("__res"), cb)
      }
    val projected =
      if (!residual) df.select(err.as("__e"))
      else df
        .select(transform(col(vecCol), x => x.cast("double")).as("__v"),
          ivfCell(ivfCb, col(vecCol)).as("__cell"))
        .withColumn("__res",
          zip_with(col("__v"), cellCentroid(ivfCb, col("__cell")), (a, b) => a - b))
        .select(err.as("__e"))
    projected.agg(avg("__e")).head().getDouble(0)
  }

  /** The DRIFT REPORT — [[ivfPqDistortion]] for BOTH quantizer kinds,
    * split by a cohort column (trained corpus vs appended batch): one
    * row per cohort with the mean raw-PQ and residual-PQ
    * reconstruction errors. An appended cohort whose errors sit well
    * above the corpus cohort's is the rebuild signal; `rpq_err <
    * pq_err` on clustered data is the residual quantizer earning its
    * keep (both inequalities spec-asserted).
    *
    * One narrow codegen'd pass over the union of both kinds' error
    * projections + a tiny hash aggregate (cohort cardinality rows):
    * no join, no window, nothing driver-side.
    */
  def quantizationDrift(df: DataFrame, vecCol: String, cohortCol: String,
      ivfCb: IvfCodebook, pqCb: PqCodebooks, rcb: PqCodebooks): DataFrame =
    df.select(col(cohortCol).as("cohort"),
        transform(col(vecCol), x => x.cast("double")).as("__v"),
        ivfCell(ivfCb, col(vecCol)).as("__cell"))
      .withColumn("__res",
        zip_with(col("__v"), cellCentroid(ivfCb, col("__cell")), (a, b) => a - b))
      .select(col("cohort"),
        pqDistortionCol(col("__v"), pqCb).as("__epq"),
        pqDistortionCol(col("__res"), rcb).as("__erpq"))
      .groupBy("cohort")
      .agg(round(avg("__epq"), 6).as("pq_err"),
        round(avg("__erpq"), 6).as("rpq_err"))

  /** recall@k of an approximate per-query result against the exact
    * one — THE quality number of an ANN configuration (the standard
    * FAISS benchmark axis, and the missing half of the drift story:
    * [[ivfPqDistortion]] says the codes stopped describing the data,
    * recall@k says what that costs a query): per query,
    * `|exact ∩ approx| / k`. Both inputs are (queryCol, idCol) frames
    * holding each query's top-k — the exact side from [[cosineTopK]]
    * (tagged with its query id) or any ground-truth list, the
    * approximate side from any probe face. Output: one row per
    * distinct exact-side query, (queryCol, recall), recall in [0, 1]
    * rounded to 6 — a query with NO approximate hits scores 0, never
    * drops out.
    *
    * Scale: both sides are k rows per query by construction, so the
    * join input is Q·k rows a side — AQE broadcasts it; nothing here
    * is ever corpus-sized.
    */
  def annRecallAtK(exact: DataFrame, approx: DataFrame,
      queryCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hits = exact.select(col(queryCol), col(idCol))
      .join(approx.select(col(queryCol), col(idCol)), Seq(queryCol, idCol))
      .groupBy(queryCol).agg(count(lit(1)).as("__hits"))
    exact.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / k, 6)
          .as("recall"))
  }

  /** IVF-PQ top-k answered FROM an at-rest layout
    * ([[writeIvfPqPartitioned]] + any number of [[appendIvfPq]]
    * batches): the probe prunes the file listing to the `nprobe` cell
    * directories nearest the query, and [[pqAdcTopKCoded]] ranks the
    * pre-encoded codes — a query reads codes only, from probed cells
    * only, with zero exchanges into TakeOrderedAndProject.
    *
    * `filter` restricts the ranked rows to a predicate over the
    * layout's KEPT metadata columns (filtered ANN — "top-k among docs
    * with lang = en"): evaluated ON THE SCAN (pushed to parquet for
    * pushable predicates, plan-guarded in q146), so the probe still
    * reads only probed cells and ranks only qualifying rows.
    */
  def ivfPqTopKAtRest(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      ivfCb: IvfCodebook, pqCb: PqCodebooks,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      filter: Option[Column] = None): DataFrame = {
    val probed = ivfProbed(ivfCb, query, nprobe)
    val scan = spark.read.parquet(path).where(col(cellCol).isin(probed: _*))
    pqAdcTopKCoded(
      filter.fold(scan)(scan.where),
      idCol, codeCol, pqCb, query, k)
  }

  /** ADC top-k over a RESIDUAL layout
    * ([[writeIvfPqResidualPartitioned]] + [[appendIvfPqResidual]]
    * batches): the probe prunes the file listing to the `nprobe` cell
    * directories as in [[ivfPqTopKAtRest]], and ranking runs in
    * residual coordinates — per probed cell the driver derives the
    * query's residual `q - centroid_c` and its m x ks ADC table
    * (nprobe KB-sized tables, one codegen reference object), and each
    * row's distance is the PARTITION column selecting its cell's
    * table inside [[graft.functions.AnnHelper.adcByCell]] — a single
    * generated call per row at any nprobe/ks. Codes only, zero
    * exchanges, TakeOrderedAndProject — the q135 scan shape with the
    * q147 quantizer.
    *
    * `filter` restricts ranking to a predicate over kept metadata
    * columns, evaluated on the scan ([[ivfPqTopKAtRest]]'s filtered-
    * ANN contract).
    */
  def ivfPqResidualTopKAtRest(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      ivfCb: IvfCodebook, rcb: PqCodebooks,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      filter: Option[Column] = None): DataFrame = {
    require(nprobe >= 1,
      "nprobe must be >= 1 (the probe needs at least one cell)")
    val (probed, cellIds, luts) = residualCellLuts(ivfCb, rcb, query, nprobe)
    val adc = GraftFunctions.pq_adc_by_cell(col(cellCol), col(codeCol),
      cellIds, luts)
    val scan = spark.read.parquet(path).where(col(cellCol).isin(probed: _*))
    filter.fold(scan)(scan.where)
      .select(col(idCol), round(adc, 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** One m x ks residual ADC table PER PROBED CELL — the query's
    * residual against each probed centroid (the same double arithmetic
    * order the oracle restates: `q[i] - cvec[i]`), held as codegen
    * reference objects (one helper call per row at any nprobe/ks; see
    * [[graft.functions.AnnHelper]] for why not a CASE chain).
    */
  private def residualCellLuts(ivfCb: IvfCodebook, rcb: PqCodebooks,
      query: Array[Double], nprobe: Int):
      (Seq[Long], Array[Long], Array[Array[Array[Double]]]) = {
    val probed = ivfProbed(ivfCb, query, nprobe)
    val centOf = ivfCb.map(c => c._1 -> c._2).toMap
    val cellIds = probed.toArray
    val luts = cellIds.map { c =>
      val cent = centOf(c)
      val qres = Array.tabulate(query.length)(i => query(i) - cent(i))
      pqAdcTable(rcb, qres)
    }
    (probed, cellIds, luts)
  }

  /** [[ivfPqResidualTopKAtRest]] with the codebooks loaded from the
    * layout's `_codebooks` sidecar (`kind='rpq'` — a raw-PQ layout
    * fails fast): the fully self-contained residual probe.
    */
  def ivfPqResidualTopKFromFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      filter: Option[Column] = None): DataFrame = {
    val layout = resolveLayout(spark, path)
    val (ivfCb, rcb) = readIvfPqResidualCodebooks(spark, layout)
    ivfPqResidualTopKAtRest(spark, layout, idCol, codeCol, ivfCb, rcb,
      query, k, nprobe, cellCol, filter)
  }

  /** [[ivfPqResidualTopKFromFiles]] over base + committed streamed
    * increments ([[appendIvfPqIncrement]] into an 'rpq' layout) — the
    * residual sibling of [[ivfPqTopKFromFilesWithIncrements]]: the
    * probe predicate pushes into every increment directory (each is
    * cell-partitioned inside, so pruning holds across base and
    * increments), and ranking runs the per-probed-cell residual ADC.
    * `excludeBatchId` mirrors the ingest loop's replay rule.
    */
  def ivfPqResidualTopKFromFilesWithIncrements(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      excludeBatchId: Option[Long] = None): DataFrame = {
    require(nprobe >= 1,
      "nprobe must be >= 1 (the probe needs at least one cell)")
    val layout = resolveLayout(spark, path)
    val (ivfCb, rcb) = readIvfPqResidualCodebooks(spark, layout)
    val (probed, cellIds, luts) = residualCellLuts(ivfCb, rcb, query, nprobe)
    val adc = GraftFunctions.pq_adc_by_cell(col(cellCol), col(codeCol),
      cellIds, luts)
    Layouts.withIncrements(spark, spark.read.parquet(layout), layout,
        Seq(idCol, cellCol, codeCol), excludeBatchId)
      .where(col(cellCol).isin(probed: _*))
      .select(col(idCol), round(adc, 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** COMPACT an appended layout: daily [[appendIvfPq]] batches leave
    * one new file per touched cell per day, and a year of ingest
    * makes every probe pay hundreds of file opens per probed cell —
    * the classic LSM small-files tax. Compaction rewrites the codes
    * (NEVER re-encodes — no vectors are read, no codebooks applied)
    * hash-repartitioned by cell, so each cell's rows land in exactly
    * one task and therefore one file, and carries the `_codebooks`
    * sidecar forward.
    *
    * Writes a NEW layout at `dst` (the LSM convention: compaction
    * produces new files, the caller swaps the pointer) — an in-place
    * rewrite would read and clobber the same files. Cost: one shuffle
    * of the code rows (~4-40 B/row, ~1% of the vector corpus).
    *
    * QUIESCE WINDOW CAVEAT: the `_compacting` marker is released when
    * this call returns — BEFORE the caller's pointer swap. An append
    * landing in that gap writes into the OLD generation and vanishes
    * at the swap. Callers that automate the swap must keep appends
    * quiesced until the pointer points at `dst` — or use the pointered
    * lifecycle ([[maintainPointedFromDriftSeries]] /
    * [[graft.ops.Layouts.swapGenerationPointer]]), which swaps INSIDE
    * the marker window so the gap never exists.
    *
    * `dropIds` is the TOMBSTONE set — one id column
    * ([[graft.ops.Cdc.snapshotDiff]]'s `removed` class is the natural
    * producer): matching rows are retired during the rewrite (an
    * anti-join on `idCol` — the LSM tombstone-at-compaction
    * discipline), so a deleted document can never again surface in a
    * top-k, even when the caller forgets to filter the corpus side.
    * Without it, stale rows accumulate forever: probes pay their
    * reads and ranks, and correctness holds only if every consumer
    * re-joins the live corpus. The anti-join is unhinted — AQE
    * broadcasts a small tombstone set, and a bulk retirement (a
    * source-level license takedown) degrades to a shuffle join
    * instead of dying.
    */
  def compactIvfPqLayout(spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String, cellCol: String = "cell",
      dropIds: Option[DataFrame] = None, idCol: String = "id"): Unit =
    compactIvfPqCore(spark, src, dst, cellCol, dropIds, idCol,
      afterFold = () => ())

  /** [[compactIvfPqLayout]] over a POINTERED store root: folds the
    * CURRENT generation (base + committed increments, tombstones
    * retired) into the next `gen<k+1>` and swaps `_current` INSIDE the
    * quiesce window — the compaction-side twin of
    * [[maintainPointedIvfPq]], closing the same
    * append-lands-in-the-superseded-generation gap for the LSM fold.
    * Streams addressing the root refuse while the marker is held and
    * replay into the new generation after the swap; superseded
    * generations are reclaimed by [[graft.ops.Layouts.vacuumGenerations]].
    * Returns the new generation's path.
    */
  def compactPointedIvfPqLayout(spark: org.apache.spark.sql.SparkSession,
      root: String, cellCol: String = "cell",
      dropIds: Option[DataFrame] = None, idCol: String = "id"): String = {
    val gen = Layouts.currentGenerationName(spark, root)
    val next = nextGenerationName(root, gen)
    compactIvfPqCore(spark, s"$root/$gen", s"$root/$next", cellCol,
      dropIds, idCol,
      afterFold = () => Layouts.swapGenerationPointer(spark, root, next))
    s"$root/$next"
  }

  private def compactIvfPqCore(spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String, cellCol: String,
      dropIds: Option[DataFrame], idCol: String,
      afterFold: () => Unit): Unit = {
    require(src != dst,
      "compactIvfPqLayout writes a NEW layout at dst; swap the pointer " +
        "after (an in-place rewrite would clobber the files it reads)")
    // fold committed streamed increments ([[appendIvfPqIncrement]])
    // into the new generation — dst is a PLAIN base layout again.
    // The "quiesce the stream first" discipline is mechanical: the
    // compaction holds the layout's _compacting marker for its whole
    // run, so every append face refuses (curated) instead of racing
    // the fold; released on ANY exit — a failed compaction leaves src
    // intact and appendable, and the rerun re-reads everything.
    Layouts.acquireQuiesce(spark, src, "compactIvfPqLayout")
    try {
    // the marker stops NEW appends; this catches the one that passed
    // its marker check before we acquired — folding a half-written
    // increment is silent data loss
    Layouts.assertNoInflightIncrements(spark, src, "compactIvfPqLayout")
    val base = spark.read.parquet(src)
    val rows = Layouts.withIncrements(spark, base, src,
      base.columns.toIndexedSeq, excludeBatchId = None)
    // carry the sidecar rows VERBATIM (never decode/re-encode): the
    // copy preserves whatever kinds the source stored — 'pq' and
    // 'rpq' layouts compact identically. Presence is the explicit
    // probe (the appendIvfPq rule), and the readability check runs
    // BEFORE any dst write: a present-but-unreadable sidecar fails
    // the compaction with the curated collectSidecar message instead
    // of an uncaught AnalysisException AFTER the data rewrite left a
    // partial generation at dst.
    // the hint stays kind-neutral: the sidecar carries 'pq' OR 'rpq'
    // tables and this validation never decodes them, so naming one
    // rebuild function would misdirect half the operators
    val hasSidecar = hasIvfPqCodebooks(spark, src)
    // collected ONCE: validates the src sidecar (curated failure on an
    // empty/killed-writer directory — r20 ADVICE: the previous
    // part-file read threw an uncurated AnalysisException there) and
    // feeds the driver-side dst copy below
    val sidecarRows =
      if (hasSidecar)
        Layouts.collectSidecar(spark, src + "/_codebooks",
          "writeIvfPqPartitioned / writeIvfPqResidualPartitioned").toSeq
      else Nil
    // sidecar FIRST: a failure in the (much larger) data rewrite then
    // leaves a sidecar-only dst — detectable, and appends against it
    // still validate — instead of a data-only dst that masquerades as
    // a legitimate pre-sidecar layout and silently skips validation.
    // The dst is cleared explicitly (overwrite semantics for a rerun
    // after a failed compaction) because a mode("overwrite") data
    // write would delete the whole dst INCLUDING the sidecar just
    // written; the data write then appends into the fresh dir.
    // built (and its schema require fired) before dst is touched
    val compacted =
      Layouts.dropTombstones(rows, dropIds, idCol, "compactIvfPqLayout")
    Layouts.delete(spark, dst)
    if (hasSidecar)
      // driver-side copy of the rows collected (and validated) above —
      // the read-job + write-job round-trip became zero jobs
      Layouts.writeSidecar(spark, dst + "/_codebooks", CodebooksSchema,
        sidecarRows)
    compacted
      .repartition(col(cellCol))
      .write.mode("append").partitionBy(cellCol).parquet(dst)
    // still inside the marker window: the pointered face swaps
    // _current here, so no append can land in the folded-away
    // generation between the rewrite and the swap
    afterFold()
    } finally Layouts.releaseQuiesce(spark, src)
  }

  /** Resolve a layout argument through its generation pointer: a
    * STORE ROOT carrying [[Layouts.GenerationPointer]] resolves to the
    * pointed generation directory; a plain layout path resolves to
    * itself. One existence probe. Every `*FromFiles*` probe face and
    * the streaming append resolve through this, so after a pointered
    * rebuild ([[maintainPointedFromDriftSeries]] /
    * [[maintainPointedIvfPq]]) swaps `_current`, the whole fleet —
    * probes, monitors, the ingest stream's next micro-batch — answers
    * from the new generation with no coordination beyond the one
    * atomic rename.
    */
  def resolveLayout(spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    if (Layouts.hasGenerationPointer(spark, path))
      Layouts.currentGeneration(spark, path)
    else path

  /** [[ivfPqTopKAtRest]] with the codebooks loaded FROM THE LAYOUT's
    * `_codebooks` sidecar — the fully self-contained probe: a fresh
    * session answers top-k from the files alone, with nothing handed
    * over out of band and nothing retrained. `path` may be a plain
    * layout or a pointered store root ([[resolveLayout]]).
    */
  def ivfPqTopKFromFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      query: Array[Double], k: Int, nprobe: Int = 4,
      cellCol: String = "cell"): DataFrame = {
    val layout = resolveLayout(spark, path)
    val (ivfCb, pqCb) = readIvfPqCodebooks(spark, layout)
    ivfPqTopKAtRest(spark, layout, idCol, codeCol, ivfCb, pqCb,
      query, k, nprobe, cellCol)
  }

  /** SHORTLIST + EXACT RE-RANK over an at-rest layout — the REFINE
    * step production retrieval runs on top of IVF-PQ (FAISS's
    * IndexRefineFlat): the probe ranks codes by ADC and keeps a
    * `shortlist`-sized candidate set, then re-ranks exactly those rows
    * by TRUE cosine on the full-precision vectors the layout carries
    * (written with `keep = Seq(vecCol)`), returning the top `k`. This
    * buys back the PQ ranking loss [[annRecallAtK]] quantifies —
    * guaranteed never worse than the plain ADC top-k (every exact
    * neighbor the ADC top-k found is still in the shortlist and wins
    * its exact re-rank; OpsSpec pins the dominance) — while paying
    * exact distances on `shortlist` rows instead of the corpus.
    *
    * Scale shape: two narrow scans of the probed cells only. Scan 1
    * reads (id, code) and takes the ADC shortlist
    * (TakeOrderedAndProject, zero exchanges); the shortlist ids are a
    * BOUNDED driver collect (the codebook-collect discipline —
    * hundreds of longs) and re-enter scan 2 as an `isin` predicate
    * pushed into the parquet scan, which reads (id, vector) for
    * exactly those rows and re-ranks. No join, no shuffle; the
    * full-precision vectors are read for `shortlist` rows, never the
    * probed fraction.
    *
    * SCOPE (r20 ADVICE, explicit): this face reads the BASE layout of
    * a raw-PQ store only — committed streaming increments are NOT
    * scanned (use [[ivfPqTopKFromFilesWithIncrements]] for an
    * increments-aware plain probe, or compact first), and a residual
    * layout is refused by [[readIvfPqCodebooks]]'s kind check. The
    * increments/residual/batched refine variants are future surface,
    * not silent behavior.
    *
    * Output: (idCol, cos) ordered cos desc, ties by id.
    */
  def ivfPqTopKRefined(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String, vecCol: String,
      query: Array[Double], k: Int, shortlist: Int = 100,
      nprobe: Int = 4, cellCol: String = "cell"): DataFrame = {
    require(shortlist >= k,
      s"shortlist=$shortlist must be >= k=$k (the re-rank keeps k of " +
        "the shortlist)")
    require(shortlist <= 100000,
      s"shortlist=$shortlist: the shortlist ids are a driver collect " +
        "and an isin predicate — keep it bounded (the refine step's " +
        "point is exact distances on FEW rows)")
    val layout = resolveLayout(spark, path)
    val (ivfCb, pqCb) = readIvfPqCodebooks(spark, layout)
    val probed = ivfProbed(ivfCb, query, nprobe)
    val lut = pqAdcTable(pqCb, query)
    val cells = spark.read.parquet(layout)
      .where(col(cellCol).isin(probed: _*))
    val ids = cells
      .select(col(idCol), round(adcColumn(lut, col(codeCol)), 6).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(shortlist)
      .select(idCol)
      .collect().map(_.get(0))
    cells.where(col(idCol).isin(ids: _*))
      .select(col(idCol), round(cosineTo(col(vecCol), query), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** MULTI-QUERY batched ANN over an at-rest layout — the OFFLINE
    * retrieval shape (score an eval set, decontaminate a benchmark,
    * backfill neighbors for a whole ingest batch): Q query vectors
    * answered from ONE scan of the UNION of their probed cells,
    * instead of Q separate scans that each re-open the layout.
    *
    * Shape: the driver derives each query's probed cells and its
    * m x ks ADC table (Q KB-sized tables — inlined codegen constants,
    * the [[pqAdcTopKCoded]] discipline per query); the scan prunes the
    * file listing ONCE to the union of probed cells, each row fans out
    * to the queries whose probe covers its cell (an inline
    * `explode(array(struct...))` — no join, no second scan), and the
    * per-query top-k is one hash exchange on `query_id` + a bounded
    * window. Candidate volume is Σ_q (probed fraction), exactly what
    * Q separate probes would rank — the batch saves the Q-1 extra
    * scans and listings, which at a year-of-ingest layout is the
    * dominant cost ([[graft.ScaleEvidence]] `annlsm`'s listing tax,
    * paid once instead of Q times). Q is a BATCH (tens to hundreds):
    * each query adds one inlined LUT and one slot in the per-row
    * fan-out; chunk a larger query set and union the results.
    *
    * Output: (query_id, idCol, adc), the per-query k nearest by ADC
    * (ties by id), ordered (query_id, adc, id).
    */
  def ivfPqTopKBatchFromFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      queries: Seq[(Long, Array[Double])], k: Int, nprobe: Int = 4,
      cellCol: String = "cell"): DataFrame =
    ivfPqBatchCore(spark, path, idCol, codeCol, queries, k, nprobe,
      cellCol, residual = false, withIncrements = false,
      excludeBatchId = None)

  /** [[ivfPqTopKBatchFromFiles]] over base + committed streamed
    * increments ([[appendIvfPqIncrement]] directories) — the offline
    * batch shape answering from the SAME merged listing the single
    * probe ([[ivfPqTopKFromFilesWithIncrements]]) sees: the union-cell
    * predicate pushes into every increment directory (each is
    * cell-partitioned inside), `excludeBatchId` mirrors the ingest
    * loop's replay rule.
    */
  def ivfPqTopKBatchFromFilesWithIncrements(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      queries: Seq[(Long, Array[Double])], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      excludeBatchId: Option[Long] = None): DataFrame =
    ivfPqBatchCore(spark, path, idCol, codeCol, queries, k, nprobe,
      cellCol, residual = false, withIncrements = true, excludeBatchId)

  /** The batched probe over a RESIDUAL layout
    * ([[writeIvfPqResidualPartitioned]]): per query the driver derives
    * its probed cells and the per-probed-cell residual ADC tables
    * ([[residualCellLuts]] — nprobe KB-sized tables per query, one
    * codegen reference object each), and ranking masks each row to the
    * queries whose probe covers its cell, exactly the
    * [[ivfPqTopKBatchFromFiles]] fan-out with the q147 quantizer.
    */
  def ivfPqResidualTopKBatchFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      queries: Seq[(Long, Array[Double])], k: Int, nprobe: Int = 4,
      cellCol: String = "cell"): DataFrame =
    ivfPqBatchCore(spark, path, idCol, codeCol, queries, k, nprobe,
      cellCol, residual = true, withIncrements = false,
      excludeBatchId = None)

  /** [[ivfPqResidualTopKBatchFromFiles]] over base + committed
    * streamed increments — full parity with the single-probe faces:
    * every (kind × increments × batch) combination answers from the
    * same scan shape.
    */
  def ivfPqResidualTopKBatchFromFilesWithIncrements(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      queries: Seq[(Long, Array[Double])], k: Int, nprobe: Int = 4,
      cellCol: String = "cell",
      excludeBatchId: Option[Long] = None): DataFrame =
    ivfPqBatchCore(spark, path, idCol, codeCol, queries, k, nprobe,
      cellCol, residual = true, withIncrements = true, excludeBatchId)

  /** The shared scan+fanout+rank of the four batched-probe faces: ONE
    * scan pruned to the union of all queries' probed cells, each row
    * fanned out (inline `explode(array(struct...))` — no join, no
    * second scan) only to the queries whose probe covers its cell,
    * one hash exchange on `query_id` + a bounded window for the
    * per-query top-k.
    */
  private def ivfPqBatchCore(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, codeCol: String,
      queries: Seq[(Long, Array[Double])], k: Int, nprobe: Int,
      cellCol: String, residual: Boolean, withIncrements: Boolean,
      excludeBatchId: Option[Long]): DataFrame = {
    require(queries.nonEmpty, "the batched probe needs at least one query")
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids — each query needs its own id in the output")
    require(nprobe >= 1,
      "nprobe must be >= 1 (the probe needs at least one cell)")
    // each query adds one inlined LUT (a codegen reference object) and
    // one slot in the per-row fan-out array — fine for a BATCH (tens
    // to hundreds), a silent cliff at thousands (generated-code size,
    // Q-wide rows). Refuse curated instead: chunk and union, or flip
    // to a TopKByScore aggregation keyed by (query_id) when the query
    // set is itself a table.
    require(queries.length <= 1024,
      s"${queries.length} queries in one batched probe — the fan-out " +
        "inlines one ADC table and one struct slot per query; chunk " +
        "the query set (union the per-chunk results) past 1024")
    val layout = resolveLayout(spark, path)
    val (ivfCb, cb) =
      if (residual) readIvfPqResidualCodebooks(spark, layout)
      else readIvfPqCodebooks(spark, layout)
    // (query id, probed cells, the query's ADC column over codeCol)
    val perQuery: Seq[(Long, Seq[Long], Column)] = queries.map {
      case (qid, qv) =>
        if (residual) {
          val (probed, cellIds, luts) = residualCellLuts(ivfCb, cb, qv, nprobe)
          (qid, probed, GraftFunctions.pq_adc_by_cell(col(cellCol),
            col(codeCol), cellIds, luts))
        } else
          (qid, ivfProbed(ivfCb, qv, nprobe),
            adcColumn(pqAdcTable(cb, qv), col(codeCol)))
    }
    val allCells = perQuery.flatMap(_._2).distinct
    val base = spark.read.parquet(layout)
    val merged =
      if (withIncrements) Layouts.withIncrements(spark, base, layout,
        Seq(idCol, cellCol, codeCol), excludeBatchId)
      else base
    val scan = merged.where(col(cellCol).isin(allCells: _*))
    // one struct per query: its rounded ADC where the row's cell is
    // probed by THIS query, null elsewhere (dropped before ranking) —
    // rows fan out only to the queries that would have scanned them
    val fanout = perQuery.map { case (qid, probed, adc) =>
      struct(lit(qid).as("query_id"),
        when(col(cellCol).isin(probed: _*), round(adc, 6))
          .otherwise(lit(null).cast("double")).as("adc"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc"), col(idCol))
    scan.select(col(idCol), explode(array(fanout: _*)).as("__q"))
      .select(col("__q.query_id").as("query_id"), col(idCol),
        col("__q.adc").as("adc"))
      .where(col("adc").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col("query_id"), col(idCol), col("adc"))
      // the promised global (query_id, adc, id) order: the window
      // already sorted within each query partition, so this final sort
      // only merges the Q bounded partitions (Q·k rows total)
      .orderBy(col("query_id"), col("adc"), col(idCol))
  }

  /** Per-row (double vector, L2 norm) projection — computed ONCE per
    * row before a pairwise join. Folding the norm into the per-pair
    * cosine would re-evaluate it per candidate (higher-order array
    * functions are interpreted, not codegen'd — the recomputation
    * dominates pairwise stages).
    */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      id: String, v: String, nrm: String): DataFrame =
    df.select(
      col(idCol).as(id),
      transform(col(vecCol), x => x.cast("double")).as(v),
      sqrt(GraftFunctions.vec_dot(col(vecCol), col(vecCol))).as(nrm))

  private def pairCos(va: String, vb: String, na: String, nb: String): Column =
    round(GraftFunctions.vec_dot(col(va), col(vb)) / (col(na) * col(nb)), 6)

  /** All pairs of vectors with cosine >= `threshold` that collide in
    * at least one LSH band (embedding near-dup detection, the scale
    * path). Multi-table banding: `tables` independent sign-LSH codes of
    * `bitsPerTable` bits each — a pair is a candidate if ANY table's
    * code matches (recall for a pair at angle θ is
    * 1-(1-(1-θ/π)^r)^L, e.g. ~93% at cos 0.9 with r=8, L=8, vs ~0.1%
    * for one 16-bit table). Exact cosine verifies every candidate, so
    * the output is exactly {bucketed candidates} ∩ {cos >= t} —
    * deterministic and ANSI-SQL-reproducible (the oracle recomputes the
    * same codes from the inlined ±1 planes).
    *
    * Scale: the banding explode shuffles (id, band, code) keys only —
    * `tables` rows/vector; vectors+norms join in per candidate id.
    * Candidate volume at 8×8-bit: measured 3.6% of all pairs on the
    * random test corpus; on real corpora near-dup clusters dominate.
    *
    * @return (id_a, id_b, cos) with id_a < id_b
    */
  /** The multi-table-banded CANDIDATE pairs of
    * [[embeddingNearDupPairs]] BEFORE the exact-cosine verify —
    * exposed for scale instrumentation like [[Dedup.nearDupCandidates]].
    */
  def embeddingNearDupCandidates(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, tables: Int = 8, bitsPerTable: Int = 8): DataFrame = {
    val planes = hyperplanes(dim, tables * bitsPerTable)
    def codeOf(vec: Column, t: Int): Column =
      (0 until bitsPerTable).map { b =>
        when(GraftFunctions.vec_dot(vec, vecLit(planes(t * bitsPerTable + b))) >= 0,
          lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    // fan out before the code projection: tables x bits dot products
    // per row is the CPU here (identity at scale — Layouts.fanOutByKey)
    val banded = Layouts.fanOutByKey(
        df.select(col(idCol).as("__id"), col(vecCol).as("__nd_vec")), "__id")
      .select(
        col("__id"),
        posexplode(array((0 until tables).map(t => codeOf(col("__nd_vec"), t)): _*)))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__code")
    banded.select(col("__id").as("id_a"), col("__band"), col("__code"))
      .join(banded.select(col("__id").as("id_b"), col("__band"), col("__code")),
        Seq("__band", "__code"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, tables: Int = 8, bitsPerTable: Int = 8): DataFrame = {
    val cand = embeddingNearDupCandidates(df, idCol, vecCol, dim, tables, bitsPerTable)
    val sides = withNorm(df, idCol, vecCol, "__sid", "__v", "__n")
    cand
      .join(sides.select(col("__sid").as("id_a"), col("__v").as("__va"), col("__n").as("__na")), Seq("id_a"))
      .join(sides.select(col("__sid").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("cos", pairCos("__va", "__vb", "__na", "__nb"))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): cluster the embedding space
    * with a k-means codebook, compare pairs only WITHIN a cluster
    * (exact cosine), and keep one representative per connected group
    * of semantic duplicates. The survivor election is the
    * deterministic min-id representative over the within-cell
    * duplicate graph's connected components ([[Dedup.components]], the
    * same election as `nearDupWinnersVerified`) — the paper's
    * keep-lowest-centroid-similarity choice is a heuristic the caller
    * can swap in by re-ranking survivors; min-id keeps the survivor
    * set a pure function of the duplicate graph, reproducible by any
    * engine.
    *
    * Scale shape: the clustering bounds candidate generation exactly
    * like LSH banding — the only exchange before the verify carries
    * (cell, id, vector) and is keyed on the CELL, and pair enumeration
    * is quadratic only in the cell population, which the codebook size
    * controls (the paper runs k=50k clusters on LAION; size nlist
    * ∝ corpus so cells stay ~constant). Cells are also exactly the
    * [[writeIvfPartitioned]] layout, so at rest the pair join reads
    * co-partitioned files with no shuffle at all. A degenerate giant
    * cell (mass near one centroid) degrades gracefully: compose with
    * [[embeddingNearDupPairs]] INSIDE the cell — same verify, banded
    * candidates.
    *
    * Returns the surviving rows of `df` with the cell assignment
    * appended as `cellCol`.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      codebook: IvfCodebook, threshold: Double,
      cellCol: String = "cell"): DataFrame = {
    // fan out before the nlist-dot-products-per-row cell assignment
    // (identity at scale — Layouts.fanOutByKey); the survivors keep
    // the fanned frame's rows, which downstream consumers re-order
    val celled = Layouts.fanOutByKey(df, idCol)
      .withColumn(cellCol, ivfCell(codebook, col(vecCol)))
    val sides = celled.select(
      col(idCol).as("__sid"), col(cellCol).as("__scell"),
      transform(col(vecCol), x => x.cast("double")).as("__v"),
      sqrt(GraftFunctions.vec_dot(col(vecCol), col(vecCol))).as("__n"))
    val pairs = sides
      .select(col("__sid").as("id_a"), col("__scell").as("__cell"),
        col("__v").as("__va"), col("__n").as("__na"))
      .join(sides.select(col("__sid").as("id_b"), col("__scell").as("__cell"),
        col("__v").as("__vb"), col("__n").as("__nb")), Seq("__cell"))
      .where(col("id_a") < col("id_b"))
      .where(pairCos("__va", "__vb", "__na", "__nb") >= threshold)
      .select("id_a", "id_b")
    val losers = Dedup.components(pairs)
      .where(col("cluster") < col("id"))
      .select(col("id").as("__loser"))
    celled.join(losers, celled(idCol) === col("__loser"), "left_anti")
  }

  /** Exact all-pairs variant (for small corpora / oracle checks): a
    * broadcast self-join. O(n²) — NOT the scale path; see
    * [[embeddingNearDupPairs]].
    *
    * Guarded: the corpus must have at most `exactMax` rows. The guard
    * is one bounded CollectLimit job (the [[Dedup.components]] probe
    * pattern — `limit(max+1)` never scans past max+1 rows), so a user
    * cannot silently launch an O(n²) broadcast join over a 100 TB
    * corpus; the refusal message points at the banded scale path.
    */
  def embeddingNearDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, exactMax: Long = 100000L): DataFrame = {
    require(exactMax > 0 && exactMax < Int.MaxValue, "exactMax must fit an Int limit")
    val probed = df.select(col(idCol)).limit(exactMax.toInt + 1).count()
    require(probed <= exactMax,
      s"embeddingNearDupPairsExact is O(n^2) and gated at exactMax=$exactMax rows " +
        s"(corpus has at least $probed rows); use embeddingNearDupPairs (banded LSH + exact " +
        "verify) for large corpora, or raise exactMax deliberately")
    // spread the O(n²) probe work across the cluster: the corpus
    // typically arrives as one scan partition (a single small file),
    // and a broadcast NL join does ALL pair work inside the stream
    // side's tasks — one partition = one core doing n²/2 dot products.
    // An explicit hash repartition (explicit n, so AQE cannot coalesce
    // the tiny byte size back to one task — it sees bytes, not the n×
    // pair blow-up behind each row) makes the pair stage as wide as
    // the cluster. The cosine predicate moves INTO the join condition:
    // a BNL join evaluates its condition per pair and only MATERIALIZES
    // survivors, so the ~(1-selectivity) non-pairs never allocate an
    // output row carrying two vectors (measured 2.6 s -> 0.3 s at
    // sf0.1; identical result — conjunction of the same predicates).
    val par = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val a = withNorm(df, idCol, vecCol, "id_a", "__va", "__na")
      .repartition(par, col("id_a"))
    val b = withNorm(df, idCol, vecCol, "id_b", "__vb", "__nb")
    a.join(broadcast(b),
        col("id_a") < col("id_b") &&
          pairCos("__va", "__vb", "__na", "__nb") >= threshold)
      .withColumn("cos", pairCos("__va", "__vb", "__na", "__nb"))
      .select("id_a", "id_b", "cos")
  }
}

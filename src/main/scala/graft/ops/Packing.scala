package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing — the pre-training batching step: documents are
  * concatenated in a deterministic order and chunked into fixed
  * token-budget training sequences (concat-and-chunk, the GPT-style
  * packing scheme; docs may straddle a chunk boundary).
  *
  * The core is a GLOBAL running prefix sum, which is exactly the
  * operation Spark's naive form gets wrong at scale:
  * `Window.orderBy(...)` with no partition spec moves the ENTIRE
  * dataset into one partition (`Exchange SinglePartition`) — the
  * classic single-task collapse. This implementation computes the same
  * result with a two-phase distributed prefix sum:
  *
  *   1. `repartitionByRange(orderCol)` — rows land in sorted,
  *      non-overlapping ranges (one range exchange, the same cost a
  *      global sort would pay anyway) — and the result is PERSISTED:
  *      range boundaries come from a per-execution sampling job, so
  *      two separate actions over an unpersisted frame could place
  *      rows in different partitions and silently corrupt every
  *      offset near a shifted boundary. Persisting materializes ONE
  *      partitioning that both phases below share (and a lost cached
  *      partition recomputes through the already-built
  *      RangePartitioner, whose boundaries are fixed at first
  *      execution — it never re-samples);
  *   2. partition-LOCAL running sums via a single `mapPartitions`
  *      pass over the cached, within-partition-sorted rows — by
  *      construction no exchange at all (a
  *      `Window.partitionBy(spark_partition_id())` here would NOT be
  *      local: Catalyst cannot prove pid-clustering and inserts a
  *      full hash exchange on the pid);
  *   3. per-partition totals — numPartitions rows — collect to the
  *      driver (bounded like the IVF codebook collect), turn into
  *      exclusive prefix offsets, broadcast-join them back.
  *
  * The intermediate stays cached until the returned frame's consumer
  * is done with it (unpersisting eagerly would re-trigger the
  * boundary-resampling hazard the persist exists to prevent). Use
  * [[Packing.contiguousWithCleanup]] in a long-lived session and call
  * the returned cleanup once the result is consumed; the plain
  * [[Packing.contiguous]] leaves the cache to
  * `spark.catalog.clearCache()`.
  */
object Packing {

  /** Assign each document a training sequence: `seq_id` =
    * `floor(start_off / budget)` where `start_off` is the token offset
    * of the document in the concatenated stream (exclusive prefix sum
    * of `tokensCol` in ascending `orderCol` order).
    *
    * The shared-partitioning intermediate stays cached (see object
    * scaladoc); prefer [[contiguousWithCleanup]] when the caller can
    * signal consumption.
    *
    * @param budget tokens per packed training sequence
    * @return input row + (start_off, seq_id), ordered arbitrarily
    */
  def contiguous(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long): DataFrame =
    contiguousWithCleanup(df, orderCol, tokensCol, budget)._1

  /** [[contiguous]] plus an unpersist handle for the internal
    * range-partitioned cache: call the returned thunk AFTER the
    * result's consuming action completes (calling it earlier is safe
    * for correctness — the RangePartitioner's boundaries are fixed at
    * first execution — but forfeits the cache's recompute protection).
    * Idempotent, non-blocking.
    */
  def contiguousWithCleanup(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long): (DataFrame, () => Unit) = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val tokType = df.schema(tokensCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType).contains(tokType),
      s"tokensCol must be integral (token counts), got $tokType")
    val spark = df.sparkSession
    // materialize the partition id as a column so it survives the
    // cache; one shared partitioning for BOTH phases (see scaladoc)
    val ranged = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded driver collect: one row per partition, like the IVF
    // codebook — never scales with the data. Null token counts sum as
    // 0 (the semantics a Window `sum` had — it skips nulls; an
    // all-null partition must yield offset 0, not an NPE).
    val totals = ranged.groupBy("__pid")
      .agg(sum(coalesce(col(tokensCol).cast("long"), lit(0L))).as("__total"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix: offset(pid) = sum of totals of pids < pid
    val exclusive = {
      var acc = 0L
      totals.map { case (pid, tot) => val o = pid -> acc; acc += tot; o }
    }
    val offDf = spark.createDataFrame(exclusive.toSeq)
      .toDF("__pid", "__off")
    // partition-local running sum: one sequential pass per cached,
    // sorted partition — genuinely exchange-free (asserted in OpsSpec)
    val tokIdx = ranged.schema.fieldIndex(tokensCol)
    val outSchema = ranged.schema.add("__run", LongType, nullable = false)
    val local = ranged.mapPartitions { rows =>
      var acc = 0L
      rows.map { r =>
        // null token count contributes 0, matching the totals agg
        // above and the null-skipping Window sum this replaced
        val v = r.get(tokIdx)
        if (v != null) acc += v.asInstanceOf[Number].longValue()
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
    val out = local
      .join(broadcast(offDf), Seq("__pid"))
      // a null token count occupies zero tokens: subtract 0, not null
      // (null would poison start_off/seq_id for that row only)
      .withColumn("start_off",
        col("__off") + col("__run") - coalesce(col(tokensCol).cast("long"), lit(0L)))
      .withColumn("seq_id", floor(col("start_off") / budget))
      .drop("__pid", "__run", "__off")
    (out, () => { ranged.unpersist(blocking = false); () })
  }

  private def oversizeMsg(id: Long, t: Long, capacity: Long): String =
    s"ffdPack: document $id has $t tokens > capacity $capacity " +
      "and can never pack whole; filter oversize documents " +
      "first or chunk them (slidingWindows) before packing"

  /** True iff the narrow (id, tokens) projection is cheap enough for
    * an eager oversize probe: a tree of scans/projections/filters
    * whose every expression is attribute plumbing (refs, literals,
    * casts, coalesce) or a plain predicate. Anything computing per-row
    * values — a BPE count, a UDF, a join or aggregate below — makes
    * the probe re-run that compute just to check a precondition, so
    * those plans skip it (the in-task throw carries the same curated
    * message). Conservative on purpose: a false negative only changes
    * where the error surfaces, never whether it does.
    */
  private def cheapProbePlan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions._
    def cheapExpr(e: Expression): Boolean = {
      val bad = e.find {
        case _: Attribute | _: Literal | _: Alias | _: Cast | _: Coalesce => false
        case _: BinaryComparison | _: And | _: Or | _: Not | _: In |
            _: InSet | _: IsNull | _: IsNotNull => false
        case _ => true
      }
      bad.isEmpty
    }
    def walk(p: LogicalPlan): Boolean = p match {
      case Project(exprs, child) => exprs.forall(cheapExpr) && walk(child)
      case Filter(cond, child) => cheapExpr(cond) && walk(child)
      case SubqueryAlias(_, child) => walk(child)
      case _: LeafNode => true
      case _ => false
    }
    walk(plan)
  }

  /** BOUNDARY-RESPECTING sequence packing — first-fit-decreasing bin
    * packing of whole documents into fixed token-budget bins: what
    * context-window training prep runs when documents must NOT be
    * split across sequences (the complement of [[contiguous]], which
    * concat-and-chunks straight through boundaries).
    *
    * Semantics: documents are assigned to deterministic SHARDS
    * (`id mod shards` — a semantic parameter of the operator, NOT the
    * Spark partition count, so the answer is identical on 1 core or
    * 1000 executors), and within each shard exact FFD runs over
    * (tokens desc, id asc): each document lands in the FIRST bin with
    * enough remaining capacity, else opens a new bin. (shard, bin) is
    * the global bin key; `bin_off` is the bin fill before placement.
    *
    * Why sharded: global FFD is inherently sequential — first-fit
    * needs the ordered list of ALL open bins (O(#bins) = O(n) state),
    * so no per-partition summary can carry it and a "global" version
    * would be a driver loop in disguise. Sharding keeps the exact
    * greedy INSIDE each shard and makes the whole operator one hash
    * exchange on the shard key + embarrassingly parallel per-shard
    * packs; each shard sees an id-hash slice of the full size
    * distribution, so FFD's 11/9·OPT + 6/9 guarantee (Dósa 2007)
    * applies per shard and waste stays bounded by shards·O(1) bins
    * over optimal. Size `shards` so a shard's (id, tokens) pairs fit
    * one task's memory — 16 bytes/doc, so even 10M docs/shard is
    * 160 MB; at 100 TB the caller raises `shards`, never this code.
    *
    * A document larger than `capacity` can never pack — the call
    * fails with a curated error naming the offender (half-open
    * filtering or [[slidingWindows]] first is the caller's fix). When
    * the (id, tokens) projection is SCAN-BACKED (stored columns,
    * casts, simple filters — the probe's predicate pushes to the
    * files), an eager limit-1 probe runs before the shard exchange,
    * so the caller sees a plain IllegalArgumentException instead of
    * the same message wrapped in a SparkException after task retries.
    * When tokens are a COMPUTED column (a BPE count over text), the
    * probe would re-run the full tokenization pass just to check — so
    * it is skipped, plan construction stays lazy, and the in-task
    * throw (same curated message) is the check; the in-task throw is
    * also the backstop for a source that changes between a probe's
    * two reads.
    *
    * @return (idCol, tokens, shard, bin, bin_off), ordered arbitrarily
    */
  def ffdPack(df: DataFrame, idCol: String, tokensCol: String,
      capacity: Long, shards: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shards > 0, "shards must be positive")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val idType = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"idCol must be integral (shard = id mod shards), got $idType")
    val tokType = df.schema(tokensCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType).contains(tokType),
      s"tokensCol must be integral (token counts), got $tokType")
    val spark = df.sparkSession
    import spark.implicits._
    // a null token count occupies zero tokens (the contiguous rule)
    val narrow = df.select(col(idCol).cast("long"),
      coalesce(col(tokensCol).cast("long"), lit(0L)))
    // the eager oversize probe runs ONLY when the projection is
    // scan-backed (the probe is then one pushed-predicate read of two
    // columns); a computed tokens column — q155's BPE count — would
    // pay its full per-row compute twice, so those plans skip the
    // probe and the in-task throw below carries the same message
    if (cheapProbePlan(narrow.queryExecution.optimizedPlan)) {
      val over = narrow.toDF("__id", "__t")
        .where(col("__t") > capacity).limit(1).collect()
      over.headOption.foreach(r =>
        throw new IllegalArgumentException(
          oversizeMsg(r.getLong(0), r.getLong(1), capacity)))
    }
    narrow
      .as[(Long, Long)]
      .groupByKey { case (id, _) => java.lang.Math.floorMod(id, shards.toLong) }
      .flatMapGroups { (shard: Long, it: Iterator[(Long, Long)]) =>
        // FFD: sort desc by size (ties by id), first bin that fits.
        // The classic linear scan is O(items x bins) — fine for the
        // thousands-of-bins a sanely-sized shard holds; a tree-of-max
        // would drop it to O(items log bins) without changing the
        // assignment.
        val items = it.toArray.sortBy { case (id, t) => (-t, id) }
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (id, t) =>
          if (t > capacity)
            throw new IllegalArgumentException(oversizeMsg(id, t, capacity))
          var b = 0
          while (b < rem.length && rem(b) < t) b += 1
          val off =
            if (b < rem.length) { val o = capacity - rem(b); rem(b) -= t; o }
            else { rem += capacity - t; 0L }
          (id, t, shard, b.toLong, off)
        }
      }
      .toDF(idCol, "tokens", "shard", "bin", "bin_off")
  }

  /** Overlapping fixed-size character windows — context-window
    * chunking for embedding/retrieval pipelines: windows start every
    * `stride` chars; a document no longer than `window` yields exactly
    * one chunk; otherwise `ceil((len - window)/stride) + 1` windows,
    * enough that the last one reaches the document's end (it may
    * overlap its predecessor by more than `window - stride`).
    *
    * Char-based on purpose: `substring` is 1-based and
    * character-counted identically in Spark and ANSI SQL, so chunk
    * boundaries are engine-exact (a token-based chunker composes this
    * with [[graft.functions.TextStats.tokenCount]]-style splitting).
    *
    * Scale shape: one narrow `transform` + `posexplode` projection —
    * zero exchanges; output size is len/stride rows per doc and only
    * the consumer shuffles them.
    *
    * @return (idCol, win_id, chunk), win_id counting from 0
    */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    require(stride <= window, "stride > window would skip text")
    val len = length(col(textCol)).cast("long")
    val nwin = when(len <= window, lit(1L))
      .otherwise(ceil((len - window).cast("double") / stride).cast("long") + 1L)
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0L), nwin - 1),
          i => col(textCol).substr((i * stride + 1).cast("int"), lit(window)))))
      .toDF(idCol, "win_id", "chunk")
      .withColumn("win_id", col("win_id").cast("long"))
  }
}

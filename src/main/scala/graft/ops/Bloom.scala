package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{ShiftRight => CatShiftRight}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftShims.{column, expression}

/** Incremental exact-dedup gate: filter an incoming shard against an
  * existing corpus through a Bloom bitmap, without ever joining the
  * corpus (the standard Bloom-filter construction, Bloom CACM 1970;
  * the incremental-ingestion pattern every large corpus pipeline
  * needs once the historical corpus dwarfs each new shard).
  *
  * 100 TB scale story — the corpus REDUCES instead of shuffling:
  *   - each partition folds its documents into a local m-bit bitmap
  *     (the typed [[BloomBitmap]] aggregator's map-side partial), so
  *     the only corpus-side exchange is one m/64-long word array per
  *     partition, OR-merged to a single row — a 100 TB corpus moves
  *     m/8 bytes per partition (128 KiB at the default m = 2^20),
  *     not content, not even (hash, id) pairs;
  *   - the merged bitmap is collected to the driver (BOUNDED: m/8
  *     bytes by construction — same discipline as the IVF codebook
  *     collect, [[Similarity]]) and re-enters the plan as a literal,
  *     so the incoming side filters at scan speed with zero
  *     exchanges and no broadcast join;
  *   - false-positive semantics are DECLARED and deterministic: the
  *     k probe positions are md5-derived ([[GraftFunctions.md5_long62]]
  *     over `"i:" ++ text`), so engine and oracle compute the same
  *     drop set bit-for-bit — no false negatives ever (a text present
  *     in the corpus always probes all-set positions), and the FP
  *     rate is the textbook (1 - e^{-kn/m})^k, ~1e-4 per doc at
  *     n = 10M docs/bitmap-shard, m = 2^27, k = 4. Size m to the
  *     corpus shard; a whole-corpus gate at 100 TB shards the bitmap
  *     by hash prefix and unions the per-shard keeps.
  */
object Bloom {

  /** One m-bit Bloom bitmap as a typed aggregation over bit
    * POSITIONS: `reduce` sets a bit in the partition-local word
    * array, `merge` ORs arrays. Buffer = m/64 longs (128 KiB at
    * m = 2^20) per partition — bounded, spill-free, and the shuffle
    * carries exactly one buffer per partition.
    */
  final case class BloomBitmap(words: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(words > 0, "words must be positive")
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], p: Long): Array[Long] = {
      b((p >>> 6).toInt) |= 1L << (p & 63L)
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** The k md5-derived probe positions of a text value in an m-bit
    * bitmap (m a power of two). Position i = md5lo62("i:" ++ text)
    * mod m — reproducible in ANSI SQL via `md5_number_lower`, which
    * is what makes the gate's exact drop set oracle-checkable.
    */
  private[ops] def positions(text: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      pmod(GraftFunctions.md5_long62(concat(lit(s"$i:"), text)), lit(mBits.toLong))
    }

  /** `word >> bits` with a COLUMN shift amount (the functions API only
    * takes literal shifts); the underlying Catalyst expression is
    * codegen'd like any built-in.
    */
  private def shiftRightDyn(word: Column, bits: Column): Column =
    column(CatShiftRight(expression(word), expression(bits)))

  /** Keep the incoming rows whose text is DEFINITELY NOT in `corpus`
    * (some probe bit unset). Returns `incoming` filtered; rows whose
    * k positions are all set — every actual duplicate, plus the
    * declared-deterministic false positives — are dropped.
    *
    * @param mBits bitmap size in bits, power of two (default 2^20:
    *              128 KiB, sized for ~10^5-doc corpus shards at k=4)
    * @param k     probe hashes (default 4)
    */
  def bloomGate(corpus: DataFrame, incoming: DataFrame, textCol: String,
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val words = bitmapOf(corpus, textCol, mBits, k)
    incoming.where(!bloomMember(col(textCol), mBits, k, words))
  }

  /** The corpus' m-bit bitmap as a driver-side word array — the
    * map-side-reducing aggregation [[bloomGate]]'s scaladoc walks
    * through, exposed for the at-rest index faces. Bounded collect:
    * exactly one row of m/64 longs.
    */
  private[graft] def bitmapOf(corpus: DataFrame, textCol: String,
      mBits: Int, k: Int): Array[Long] = {
    require(mBits > 64 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two > 64")
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    import corpus.sparkSession.implicits._
    val posDs = corpus
      .select(explode(array(positions(col(textCol), mBits, k): _*)).as("p"))
      .as[Long]
    posDs.select(BloomBitmap(mBits >>> 6).toColumn.name("bm")).head()
  }

  /** The membership predicate of a text column against a bitmap
    * literal: all k probe bits set. Pure built-ins over the inlined
    * word array — evaluated at scan speed, zero exchanges.
    */
  def bloomMember(text: Column, mBits: Int, k: Int,
      words: Array[Long]): Column = {
    val wordsLit = lit(words)
    positions(text, mBits, k)
      .map { p =>
        val word = element_at(wordsLit, (shiftright(p, 6) + lit(1)).cast("int"))
        shiftRightDyn(word, p.bitwiseAND(lit(63L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
  }

  /** Persist the corpus bitmap as an AT-REST BLOOM INDEX — one
    * self-describing row (m_bits, k, words) — so the incremental gate
    * never recomputes the historical corpus' bitmap: a year of ingest
    * reads one KB-to-MB row (plus one per committed batch) instead of
    * re-folding 100 TB of history. The streaming loop
    * ([[graft.streaming.StreamingBloomGate]]) appends each batch's own
    * bitmap under `_increments/ingest_batch=<id>` (the
    * [[Layouts.IncrementsDir]] idempotence discipline), and
    * [[readBloomIndex]] OR-merges base + committed increments.
    */
  def writeBloomIndex(corpus: DataFrame, textCol: String, out: String,
      mBits: Int = 1 << 20, k: Int = 4): Unit =
    writeBitmapRow(corpus.sparkSession,
      bitmapOf(corpus, textCol, mBits, k), mBits, k, out)

  /** Schema of a bitmap row directory (base index and per-batch
    * increments alike; matches the previous `toDF` encoder output).
    */
  private[graft] val BitmapRowSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("m_bits", IntegerType, nullable = false),
      StructField("k", IntegerType, nullable = false),
      StructField("words", ArrayType(LongType, containsNull = false),
        nullable = true)))
  }

  private[graft] def writeBitmapRow(
      spark: org.apache.spark.sql.SparkSession, words: Array[Long],
      mBits: Int, k: Int, dir: String): Unit = {
    // driver-side sidecar write: the bitmap is already a driver array
    // (one m/64-long row) — see Layouts.writeSidecar
    Layouts.writeSidecar(spark, dir, BitmapRowSchema,
      Seq(org.apache.spark.sql.Row(mBits, k, words.toSeq)))
  }

  /** Load a [[writeBloomIndex]] layout's bitmap, OR-merged with its
    * committed per-batch increments. `historyBefore = Some(b)` keeps
    * only increments with `ingest_batch < b` — the gate's replay rule,
    * STRICTER than the other families' own-batch exclusion because the
    * gate's OUTPUT depends on history: batch ids are monotone in
    * Structured Streaming, so "increments < b" is exactly the history
    * batch b's first attempt judged against, even when the replay runs
    * after later batches committed (an own-batch-only exclusion would
    * let batch b+1's bits retroactively drop a doc batch b admitted —
    * divergence, not convergence). The geometry (m_bits, k) must agree
    * across every row — a mixed-m OR is garbage, so it fails curated.
    * Driver-bounded: one m/64-long array per committed batch, never
    * corpus rows.
    */
  def readBloomIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, historyBefore: Option[Long] = None): (Int, Int, Array[Long]) = {
    // DRIVER-SIDE read (the Layouts.collectSidecar path): the index is
    // one KB-to-MB row per committed batch, and the previous
    // spark.read + collect paid a full Spark job per gate evaluation —
    // per MICRO-BATCH in the streaming gate. Same listing discipline
    // as withIncrementsWhere (incrementIds + the `< b` history rule).
    val dirs = path +: Layouts.incrementIds(spark, path)
      .filter(id => historyBefore.forall(id < _))
      .map(id => Layouts.incrementDir(path, id))
    val rows = dirs.flatMap { d =>
      Layouts.collectSidecar(spark, d, "writeBloomIndex").map { r =>
        org.apache.spark.sql.Row(
          r.getInt(r.fieldIndex("m_bits")), r.getInt(r.fieldIndex("k")),
          r.getSeq[Long](r.fieldIndex("words")))
      }
    }
    require(rows.nonEmpty,
      s"the Bloom index at $path holds no bitmap row — rebuild it with " +
        "writeBloomIndex")
    val geoms = rows.map(r => (r.getInt(0), r.getInt(1))).distinct
    if (geoms.length != 1)
      throw new IllegalStateException(
        s"the Bloom index at $path mixes bitmap geometries " +
          s"(${geoms.sorted.mkString(", ")} as (m_bits, k)) — OR-merging " +
          "different-m bitmaps is garbage; rebuild the index and its " +
          "increments with one geometry")
    val (m, k) = geoms(0)
    val acc = new Array[Long](m >>> 6)
    rows.foreach { r =>
      val w = r.getSeq[Long](2)
      var i = 0
      while (i < acc.length) { acc(i) |= w(i); i += 1 }
    }
    (m, k, acc)
  }

  /** Fold a Bloom index's committed increments into the base row at
    * `dst` — the [[Similarity.compactIvfPqLayout]] play for the gate's
    * history (a year of per-batch rows is a listing tax on every
    * tick). Holds the quiesce marker for the fold; the caller swaps
    * its pointer (LSM convention).
    *
    * The NEWEST increment is carried verbatim, NOT folded: under
    * Structured Streaming's sequential epochs only the newest on-disk
    * batch can still be checkpoint-uncommitted (batch b+1's increment
    * existing proves batch b committed), and a replay of batch b needs
    * `increments < b` reconstructible — folding b's own bits into the
    * base would make its replay judge against ITSELF and silently drop
    * every doc it first admitted (the divergence the `<` history rule
    * exists to prevent). One extra row per read buys replay safety for
    * the only batch that can exercise it.
    */
  def compactBloomIndex(spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String): Unit = {
    require(src != dst,
      "compactBloomIndex writes a NEW index at dst; swap the pointer " +
        "after (an in-place rewrite would clobber the row it reads)")
    Layouts.acquireQuiesce(spark, src, "compactBloomIndex")
    try {
      Layouts.assertNoInflightIncrements(spark, src, "compactBloomIndex")
      val newest = Layouts.incrementIds(spark, src).lastOption
      val (m, k, folded) = readBloomIndex(spark, src, historyBefore = newest)
      Layouts.delete(spark, dst)
      writeBitmapRow(spark, folded, m, k, dst)
      newest.foreach { b =>
        // verbatim driver-side copy (one KB-to-MB row — the read was
        // already driver-bounded; now the write is job-free too)
        val rows = Layouts.collectSidecar(spark, Layouts.incrementDir(src, b),
          "writeBloomIndex (the increment is written by the streaming gate)")
          .map(r => org.apache.spark.sql.Row(
            r.getInt(r.fieldIndex("m_bits")), r.getInt(r.fieldIndex("k")),
            r.getSeq[Long](r.fieldIndex("words"))))
        Layouts.writeSidecar(spark, Layouts.incrementDir(dst, b),
          BitmapRowSchema, rows.toSeq)
      }
    } finally Layouts.releaseQuiesce(spark, src)
  }
}

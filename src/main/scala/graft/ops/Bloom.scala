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
    require(mBits > 64 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two > 64")
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    import corpus.sparkSession.implicits._
    val posDs = corpus
      .select(explode(array(positions(col(textCol), mBits, k): _*)).as("p"))
      .as[Long]
    // bounded driver collect: exactly one row of m/64 longs (see scaladoc)
    val words: Array[Long] = posDs.select(BloomBitmap(mBits >>> 6).toColumn.name("bm")).head()
    val wordsLit = lit(words)
    val member = positions(col(textCol), mBits, k)
      .map { p =>
        val word = element_at(wordsLit, (shiftright(p, 6) + lit(1)).cast("int"))
        shiftRightDyn(word, p.bitwiseAND(lit(63L)).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
    incoming.where(!member)
  }
}

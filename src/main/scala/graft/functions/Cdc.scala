package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FastCDC-style content-defined chunking (Xia et al., USENIX ATC'16):
  * a gear rolling hash with normalized chunking — a harder-to-match
  * mask before the average target size and an easier one after it —
  * bounded by hard min/max chunk sizes. Cut points depend only on a
  * ~`log2(avg)+2`-byte sliding window of local content, so an insertion
  * or deletion re-aligns within about one chunk and duplicated regions
  * across documents re-emit IDENTICAL chunk hashes. That is the property
  * binary-level dedup at corpus scale needs and that fixed-size
  * chunking fundamentally lacks (one shifted byte re-keys every
  * following block).
  *
  * Determinism contract: the gear table derives from the splitmix64
  * finalizer over a fixed seed, so cut points are bit-stable across
  * JVMs, engines and releases; the q95 oracle re-derives them in an
  * independent implementation of this spec.
  */
object CdcHelper {
  private final val Gamma = 0x9E3779B97F4A7C15L
  private final val GearSeed = 0x6772616674636463L // "graftcdc"

  /** splitmix64 finalizer (public domain, Steele et al.) — the same
    * mix both the gear table and the q95 fixture stream are built on.
    */
  def mix64(v: Long): Long = {
    var x = v
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val gear: Array[Long] =
    Array.tabulate(256)(i => mix64(GearSeed ^ (i.toLong * Gamma)))

  /** The FastCDC cut decision for the chunk starting at `off` in
    * `data[0, n)`: the boundary index of that chunk. Depends ONLY on
    * bytes in `[off, boundary)` — the property the streaming variant
    * ([[chunksStream]]) relies on to re-run it over a carry buffer and
    * get bit-identical cuts.
    */
  private def nextBoundary(data: Array[Byte], off: Int, n: Int,
      min: Int, avg: Int, max: Int): Int = {
    val bits = 31 - Integer.numberOfLeadingZeros(avg)
    val maskS = (1L << (bits + 2)) - 1L
    val maskL = (1L << (bits - 2)) - 1L
    // long-side min: off + max overflows Int on multi-GB values
    val end = math.min(off.toLong + max, n.toLong).toInt
    var boundary = end
    if (end - off > min) {
      // long-side min like `end`: off + avg overflows Int within avg
      // bytes of Int.MaxValue, which would silently skip the maskS
      // loop and break the bit-stable determinism contract
      val normal = math.min(off.toLong + avg, end.toLong).toInt
      var fp = 0L
      var i = off + min
      var found = false
      while (i < normal && !found) {
        fp = (fp << 1) + gear(data(i) & 0xFF)
        if ((fp & maskS) == 0L) { boundary = i + 1; found = true }
        i += 1
      }
      while (i < end && !found) {
        fp = (fp << 1) + gear(data(i) & 0xFF)
        if ((fp & maskL) == 0L) { boundary = i + 1; found = true }
        i += 1
      }
    }
    boundary
  }

  /** Cut `data` into content-defined chunks; returns rows of
    * (offset: long, size: int, sha256: string). `avg` must be a power
    * of two ≥ 16 and min < avg ≤ max must hold (analysis-time check in
    * [[CdcChunks]]).
    */
  def chunks(data: Array[Byte], min: Int, avg: Int, max: Int): GenericArrayData = {
    val n = data.length
    val md = MessageDigest.getInstance("SHA-256")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0
    while (off < n) {
      val boundary = nextBoundary(data, off, n, min, avg, max)
      val size = boundary - off
      md.reset()
      md.update(data, off, size)
      out += InternalRow(off.toLong, size, UTF8String.fromString(hex(md.digest())))
      off = boundary
    }
    new GenericArrayData(out.toArray)
  }

  /** Chunk a logical byte stream that arrives as ordered parts (the
    * chunked walk's `content_part` rows), producing EXACTLY the cut
    * points of chunking the concatenation — chunk seams never align to
    * the artificial part seams, which is the whole point of CDC (a
    * per-part `cdc_chunks` would re-key every oversize entry at its
    * `maxEntryBytes` boundaries, the fixed-block failure mode).
    *
    * State is bounded: only the tail bytes after the last CONFIRMED
    * cut carry over to the next part. A cut is confirmed when it falls
    * strictly before the buffered end (it was mask- or max-forced, and
    * [[nextBoundary]] depends only on bytes before it) or exactly at
    * the end with size == max (max-forced). A chunk that merely ran
    * out of buffer is tentative — re-cutting it with more data
    * appended reproduces every confirmed decision bit-identically.
    * Since any `max` consecutive bytes force a cut, the carry is
    * always < `max` + one part length.
    */
  def chunksStream(parts: Iterator[Array[Byte]], min: Int, avg: Int,
      max: Int): Iterator[(Long, Int, String)] = {
    // locals: inside the anonymous Iterator, `min`/`max` would resolve
    // to Iterator's own min/max methods
    val (mn, av, mx) = (min, avg, max)
    new Iterator[(Long, Int, String)] {
      private val md = MessageDigest.getInstance("SHA-256")
      private var buf: Array[Byte] = Array.emptyByteArray
      private var off = 0
      private var base = 0L
      private var exhausted = !parts.hasNext
      private var nextChunk: (Long, Int, String) = _

      // drop consumed bytes, append the next part — O(carry + part)
      private def pull(): Unit = {
        val part = parts.next()
        exhausted = !parts.hasNext
        val rem = buf.length - off
        val b = new Array[Byte](rem + part.length)
        System.arraycopy(buf, off, b, 0, rem)
        System.arraycopy(part, 0, b, rem, part.length)
        base += off
        buf = b
        off = 0
      }

      private def advance(): Unit = {
        nextChunk = null
        while (nextChunk == null) {
          if (off < buf.length) {
            val boundary = nextBoundary(buf, off, buf.length, mn, av, mx)
            if (exhausted || boundary < buf.length || boundary - off == mx) {
              md.reset()
              md.update(buf, off, boundary - off)
              nextChunk = ((base + off, boundary - off, hex(md.digest())))
              off = boundary
            } else pull() // tentative tail: extend before deciding
          } else if (!exhausted) pull()
          else return // stream fully consumed
        }
      }

      advance()
      override def hasNext: Boolean = nextChunk != null
      override def next(): (Long, Int, String) = {
        val c = nextChunk
        advance()
        c
      }
    }
  }

  private def hex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(Character.forDigit((b(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(b(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }
}

/** `cdc_chunks(content, min, avg, max) ->
  * array<struct<offset:bigint, size:int, sha256:string>>` — FastCDC
  * content-defined chunking of a binary value (see [[CdcHelper]]).
  * Codegen'd scalar: the per-row loop runs inside whole-stage codegen
  * via the static helper, the same pattern as [[Fingerprint]].
  */
case class CdcChunks(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("sha256", StringType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def intLit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
    if (first.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("cdc_chunks expects a binary content column")
    else (intLit(second), intLit(third), intLit(fourth)) match {
      case (Some(mn), Some(avg), Some(mx)) =>
        if (avg < 16 || Integer.bitCount(avg) != 1)
          TypeCheckResult.TypeCheckFailure(s"avg chunk size must be a power of two >= 16, got $avg")
        else if (!(mn > 0 && mn < avg && avg <= mx))
          TypeCheckResult.TypeCheckFailure(s"need 0 < min < avg <= max, got ($mn, $avg, $mx)")
        else TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure("cdc_chunks sizes must be integer literals")
    }
  }

  override protected def nullSafeEval(content: Any, mn: Any, avg: Any, mx: Any): Any =
    CdcHelper.chunks(content.asInstanceOf[Array[Byte]],
      mn.asInstanceOf[Int], avg.asInstanceOf[Int], mx.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, mn, avg, mx) =>
      s"graft.functions.CdcHelper.chunks($c, $mn, $avg, $mx)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): CdcChunks =
    copy(first = f, second = s, third = t, fourth = q)
}

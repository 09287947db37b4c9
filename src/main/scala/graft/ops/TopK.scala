package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed [[Aggregator]] (the UDAF surface
  * of SURVEY.md §2.8): input rows are (group, id, score); the buffer is
  * a sorted list of at most k (score, id) pairs, ordered score desc
  * then id asc.
  *
  * Scale: this is the aggregation-shaped alternative to the window
  * `row_number <= k` top-k (q06). The window plan shuffles and sorts
  * EVERY row of every group; the Aggregator's partial (map-side) phase
  * caps each partition's contribution at k pairs per group, so the
  * exchange carries at most k * partitions rows per group and the merge
  * is an O(k) sorted-list union. At 100 TB with millions of rows per
  * group, that is the difference between shuffling the corpus and
  * shuffling kilobytes.
  */
final case class TopKByScore(k: Int)
    extends Aggregator[(String, Long, Double), List[(Double, Long)], List[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // strict ordering: higher score wins, ties to the smaller id
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    val (pre, post) = buf.span(beats(_, e))
    if (pre.lengthCompare(k) >= 0) buf // e ranks below the kept k
    else (pre ::: e :: post).take(k)
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], in: (String, Long, Double)): List[(Double, Long)] =
    insert(b, (in._3, in._2))
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(r: List[(Double, Long)]): List[(Double, Long)] = r
  override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
}

/** [[TopKByScore]]'s string-payload sibling: (group, payload, score)
  * rows, keep the top-k payloads per group ordered score desc then
  * payload asc. The crawl-frontier shape — payloads are URLs, so a
  * Long-id round-trip would force an extra join just to restore the
  * string. Same bounded-buffer scale argument: the map-side partial
  * caps every partition at k (score, payload) pairs per group, so the
  * per-host frontier election shuffles kilobytes, not the distinct-URL
  * set.
  */
final case class TopKStrByScore(k: Int)
    extends Aggregator[(String, String, Double), List[(Double, String)], List[(Double, String)]] {
  require(k > 0, "k must be positive")

  private def beats(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, String)], e: (Double, String)): List[(Double, String)] = {
    val (pre, post) = buf.span(beats(_, e))
    if (pre.lengthCompare(k) >= 0) buf
    else (pre ::: e :: post).take(k)
  }

  override def zero: List[(Double, String)] = Nil
  override def reduce(b: List[(Double, String)], in: (String, String, Double)): List[(Double, String)] =
    insert(b, (in._3, in._2))
  override def merge(a: List[(Double, String)], b: List[(Double, String)]): List[(Double, String)] =
    b.foldLeft(a)(insert)
  override def finish(r: List[(Double, String)]): List[(Double, String)] = r
  override def bufferEncoder: Encoder[List[(Double, String)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[(Double, String)]] = ExpressionEncoder()
}

/** Misra–Gries frequent-items sketch as a typed [[Aggregator]] (Misra
  * & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012 §3): at most `k` (item, counter) pairs, with
  * the two classic guarantees that hold REGARDLESS of input order,
  * partitioning, or merge-tree shape —
  *
  *   - underestimate: `est(x) <= true(x)` for every item, and
  *   - bounded error: `true(x) - est(x) <= n / (k+1)` (n = stream
  *     length), so every item with `true(x) > n/k` is guaranteed
  *     present in the sketch.
  *
  * Reduce is the textbook step: tracked item +1; untracked item into a
  * free slot; no slot → decrement ALL counters by 1 (the new
  * occurrence and one unit of each tracked counter cancel — each such
  * event consumes k+1 units of total count, hence the bound).
  * Merge sums the two summaries and, if more than `k` items remain,
  * subtracts the (k+1)-th largest counter from every counter and drops
  * the non-positive ones — the PODS'12 rule that keeps the summed
  * error bound.
  *
  * Scale: this is the heavy-hitters alternative to a full
  * `groupBy(item).count()` — the map-side partial caps every
  * partition's contribution at k counters, so the exchange carries
  * O(k × partitions) rows instead of the item cardinality, and the
  * result fits on the driver by construction. The sketch CONTENT is
  * order-dependent (only the guarantees above are deterministic), so
  * oracle-checked queries must emit the guarantee booleans + exact
  * counts (q68's sketch rule), never raw estimates.
  */
final case class FreqItems(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      case None => b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // (k+1)-th largest counter; at most k counters strictly exceed it
      val kth = sum.valuesIterator.toArray.sortWith(_ > _).apply(k)
      sum.collect { case (t, c) if c > kth => t -> (c - kth) }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

/** [[TopKByScore]]'s exact-integer sibling: keep the k smallest
  * (ord, id) pairs per group, ordered lexicographically. Used where
  * the rank key is a 62-bit hash ([[Sampling.domainCap]]) — a Double
  * score would lose the low 9 bits of a 62-bit key to the 53-bit
  * mantissa and make tie behavior diverge from an integer-ordered
  * SQL oracle. Same bounded-buffer scale shape as [[TopKByScore]]:
  * the map-side partial caps every partition's contribution at k
  * pairs per group.
  */
final case class KeepSmallestK(k: Int)
    extends Aggregator[(String, Long, Long), List[(Long, Long)], List[(Long, Long)]] {
  require(k > 0, "k must be positive")

  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] = {
    val (pre, post) = buf.span(beats(_, e))
    if (pre.lengthCompare(k) >= 0) buf
    else (pre ::: e :: post).take(k)
  }

  override def zero: List[(Long, Long)] = Nil
  override def reduce(b: List[(Long, Long)], in: (String, Long, Long)): List[(Long, Long)] =
    insert(b, (in._2, in._3))
  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(r: List[(Long, Long)]): List[(Long, Long)] = r
  override def bufferEncoder: Encoder[List[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[List[(Long, Long)]] = ExpressionEncoder()
}

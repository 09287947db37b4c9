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

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization through the custom-state API
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`, SURVEY.md §2.8):
  * events gap-split per user exactly like `session_window` (q29), but
  * computed by user code holding explicit per-group state — the surface
  * a pipeline reaches for when the built-in windows can't express its
  * state machine.
  *
  * Semantics match the native operator bit-for-bit: a new session
  * starts when `ts - prev_ts >= gap`; session end = last ts + gap;
  * values are summed as DECIMAL(18,2) like the q29 aggregation, so the
  * same gaps-and-islands SQL oracles both.
  *
  * Scale: one shuffle on the group key, then a per-group in-memory
  * sort — bounded by the largest single group (per-user event counts;
  * fine at any corpus size where one user's history fits an executor).
  * For unbounded groups or continuous ingest use the native
  * `session_window` + watermark path (q29 / StreamingConverter):
  * Spark's MergingSessions aggregation is spillable and incremental.
  * In a true stream this function would carry open sessions in
  * `GroupState` with an event-time timeout; in batch mode Spark calls
  * it once per group and the state is never needed.
  */
object StatefulSessions {

  /** (ss_micros, se_micros, user_id, n, total_value) per session. */
  final case class SessionAgg(
      ssu: Long, seu: Long, user_id: Long, n: Long, total_value: Double)

  /** @param ds (user_id, ts_micros, value) */
  def sessionize(ds: Dataset[(Long, Long, Double)], gapMicros: Long): Dataset[SessionAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Int, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, Long, Double)], _: GroupState[Int]) =>
          // exact 2-decimal accumulation, same as cast(value as decimal(18,2))
          def dec2(v: Double): java.math.BigDecimal =
            java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)
          val evs = it.map(e => (e._2, e._3)).toArray
          java.util.Arrays.sort(evs, Ordering.by((x: (Long, Double)) => x._1))
          if (evs.isEmpty) Iterator.empty
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
            var start = evs(0)._1
            var last = start
            var n = 0L
            var tot = java.math.BigDecimal.ZERO
            evs.foreach { case (tsu, v) =>
              if (tsu - last >= gapMicros) {
                out += SessionAgg(start, last + gapMicros, uid, n, tot.doubleValue)
                start = tsu
                n = 0L
                tot = java.math.BigDecimal.ZERO
              }
              last = tsu
              n += 1
              tot = tot.add(dec2(v))
            }
            out += SessionAgg(start, last + gapMicros, uid, n, tot.doubleValue)
            out.iterator
          }
      }
  }
}

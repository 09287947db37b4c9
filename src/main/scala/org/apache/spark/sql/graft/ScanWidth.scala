package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{FilePartition, HadoopFsRelation, LogicalRelation}

/** Partition-width probe for [[graft.ops.Layouts.fanOutByKey]] that
  * does NOT physically plan the frame.
  *
  * The r21 form probed `df.rdd.getNumPartitions`, which runs the whole
  * physical-planning pipeline on the subtree once per call site at
  * query-build time — the final query then plans the same subtree
  * again (r21 verdict #5). For the shape every fan-out call site
  * actually has — a narrow Project/Filter chain over one parquet
  * relation — the scan width is a pure function of the file listing
  * (already cached on the relation's FileIndex) and the session's
  * split configuration, so it can be computed by replaying Spark's own
  * split math: [[FilePartition.maxSplitBytes]] plus the
  * Next-Fit-Decreasing packing of `FilePartition.getFilePartitions`
  * over split lengths. Any other plan shape returns None and the
  * caller falls back to the planning probe. Parity with the planner is
  * pinned in OpsSpec ("fanOutByKey width estimate").
  */
object ScanWidth {

  def estimate(df: DataFrame): Option[Int] = {
    @annotation.tailrec
    def rel(p: LogicalPlan): Option[HadoopFsRelation] = p match {
      case l: LogicalRelation =>
        l.relation match {
          case h: HadoopFsRelation => Some(h)
          case _ => None
        }
      case _: Project | _: Filter | _: SubqueryAlias => rel(p.children.head)
      case _ => None
    }
    rel(df.queryExecution.analyzed).map { r =>
      val spark = df.sparkSession
      val lens = r.location.listFiles(Nil, Nil).flatMap(_.files).map(_.getLen)
      val openCost = spark.sessionState.conf.filesOpenCostInBytes
      val totalBytes: Long = lens.map(_ + openCost).sum
      val maxSplit: Long = FilePartition.maxSplitBytes(spark, totalBytes)
      // parquet is splitable: every file splits at maxSplit boundaries,
      // splits sort by length descending, then Next-Fit-Decreasing
      // packing charges openCost per split on top of its length
      val splits = lens.iterator.flatMap { len =>
        (0L until len by maxSplit).map(o => math.min(maxSplit, len - o))
      }.toArray
      java.util.Arrays.sort(splits)
      var nParts = 0
      var cur = 0L
      var i = splits.length - 1
      while (i >= 0) {
        val len = splits(i)
        if (nParts == 0 || cur + len > maxSplit) { nParts += 1; cur = 0L }
        cur += len + openCost
        i -= 1
      }
      math.max(nParts, 1)
    }
  }
}

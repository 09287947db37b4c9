package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column <-> Expression conversion
  * and function registration — the single file in this repo that lives
  * under the `org.apache.spark.sql` namespace (the standard technique
  * used by open-source Spark extension libraries to expose custom
  * Catalyst expressions as `Column` functions). Everything else in the
  * engine depends only on public Spark API plus this shim.
  */
object GraftShims {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom expression builder for SQL use
    * (`SELECT my_fn(col) FROM ...`). Session-scoped temp function.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Build an [[org.apache.spark.scheduler.AccumulableInfo]] — its
    * constructor is `private[spark]`, and the live-progress listener's
    * tests need to synthesize the heartbeat events executors send
    * (`SparkListenerExecutorMetricsUpdate`) without running a real
    * multi-second heartbeat cycle.
    */
  def accumulableInfo(id: Long, name: String, update: Any): org.apache.spark.scheduler.AccumulableInfo =
    org.apache.spark.scheduler.AccumulableInfo(
      id, Some(name), Some(update), None, internal = false, countFailedValues = false)
}

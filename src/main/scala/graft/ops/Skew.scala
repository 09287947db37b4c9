package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * Spark's hash aggregation is already two-phase (map-side partial →
  * exchange → final), which handles most skew; what it cannot fix is a
  * key so hot that its FINAL-phase partition dominates a stage (the
  * "5 distinct keys, 32 reducers" shape — 27 reducers idle while 5
  * churn). Salting splits each key across `salts` reducers and merges
  * in a second, tiny aggregation whose cardinality is only
  * |keys| × salts.
  *
  * Use when |distinct keys| « shuffle partitions or when one key holds
  * a large fraction of all rows. For joins, prefer AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default) —
  * salting a join needs the dimension side replicated per salt.
  */
object Skew {

  /** Count + sum of `valueCol` per `keyCol`, salted across `salts`
    * reducers. The salt is a deterministic hash of the value column,
    * so the result is reproducible; both aggregation phases are exact
    * (counts and DECIMAL/long sums are associative — for DOUBLE sums
    * route through DECIMAL first, as the query inventory does).
    *
    * @return (keyCol, n, total) — identical to the unsalted
    *         `groupBy(key).agg(count, sum)`
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: Column,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(valueCol), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
}

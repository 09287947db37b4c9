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
    * reducers. The salt is ROW-LOCAL — `monotonically_increasing_id()`
    * (partitionId<<33 | per-partition counter) mod `salts` round-robins
    * each partition's rows across every salt — so a hot key is split
    * even when its values are constant or low-cardinality (the most
    * common skew shape: a default/null value). A value-derived salt
    * (`hash(valueCol)`) silently fails there: every row of the hot key
    * lands on one salt. Salt assignment does not need to be
    * data-deterministic for the result to be exact: both aggregation
    * phases are associative (counts and DECIMAL/long sums — for DOUBLE
    * sums route through DECIMAL first, as the query inventory does),
    * so ANY row→salt assignment merges to the same totals.
    *
    * @return (keyCol, n, total) — identical to the unsalted
    *         `groupBy(key).agg(count, sum)`
    */
  /** The row-local salt in [0, salts) — package-visible so tests can
    * assert the hot-key split without duplicating the definition.
    */
  private[graft] def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: Column,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For every left row, attach the right row with the greatest
  * `tsCol <= left.tsCol` within the same `keyCol` group (the semantics
  * of DuckDB's/kdb's ASOF JOIN with an `>=` condition).
  *
  * Implementation is the scale-friendly union + running
  * `last(ignoreNulls)` window rather than a range join:
  *
  *   - both sides are tagged and unioned (narrow),
  *   - ONE hash exchange on the key column,
  *   - a per-key sort by (ts, side, tiebreak) where right rows sort
  *     before left rows at equal ts (so "at-or-before" includes ties),
  *   - each left row reads the running `last` non-null right-row
  *     STRUCT (ts + all carried columns in one value, so they always
  *     come from the same right row, nullable value columns included).
  *
  * At 100 TB this is one shuffle of (key, ts, carried cols) and a
  * per-partition sort — no range-condition blow-up, no broadcast
  * nested-loop (which is what Spark plans for a raw `l.ts >= r.ts`
  * theta join), no per-row binary search structure to build. Ties on
  * (key, ts) among right rows resolve deterministically to the row
  * with the greatest tiebreak column value.
  */
object AsOf {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keyCol     equi-join key present on both sides
    * @param tsCol      ordering column present on both sides
    * @param valueCols  right-side columns to carry onto left rows
    *                   (emitted under the same names; must not collide
    *                   with left column names)
    * @param tiebreak   right-side column deciding ties at equal
    *                   (key, ts): the row with the greatest value wins
    * @return left rows (all original columns) + valueCols + `asof_ts`
    *         (the matched right timestamp), inner-join semantics: left
    *         rows with no matching right row are dropped
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(valueCols.contains),
      s"valueCols ${valueCols.mkString(",")} collide with left columns")
    // ONE struct carries (matched ts, all value cols) so every carried
    // field comes from the SAME right row. A per-column
    // last(ignoreNulls) would, when a right value column is null, pull
    // that column from an OLDER right row — mixing rows. The struct is
    // never null for right rows (a struct of null fields is non-null),
    // so ignoreNulls skips only the left rows' null placeholder.
    val rightTagged = right.select(
      col(keyCol), col(tsCol), lit(0).as("__side"), col(tiebreak).as("__tb"),
      struct(col(tsCol).as("__rts") +: valueCols.map(c => col(c).as(s"__v_$c")): _*).as("__r"))
    val leftTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(rightTagged.schema("__tb").dataType).as("__tb"),
        lit(null).cast(rightTagged.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    // right rows sort before left at equal ts (side 0 < 1) => ">=";
    // among right ties, the greatest tiebreak sorts last and wins
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.unionByName(leftTagged, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col("__m").isNotNull)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__m.__v_$c").as(c)) :+
        col("__m.__rts").as("asof_ts"): _*)
  }
}

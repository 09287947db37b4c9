package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The stream-stream interval join pipeline (query q46), shared with
  * `StreamJoinProbe` so state-store tuning data is always measured on
  * the exact plan the query ships.
  */
object StreamJoins {

  /** For each 'view', the same user's 'purchase's within the following
    * hour: two file-source streams over `srcDir`, per-side watermarks
    * (which bound join state to rate x window), event-time range join.
    * Source schema is footer-derived and ts layout-adaptive
    * ([[graft.sources.EventsTable]]).
    */
  def viewPurchaseJoin(s: SparkSession, srcDir: String): DataFrame = {
    def src = graft.sources.EventsTable.readStream(s, srcDir)
    val views = src.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      .withWatermark("vts", "2 hours")
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
      .withWatermark("pts", "2 hours")
    views.join(purchases,
      col("user_id") === col("p_user") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
  }
}

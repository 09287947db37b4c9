package graft.queries

import graft.convert.ArchiveConverter
import graft.core.{ConvertOptions, IncludeType}
import graft.functions.{GraftFunctions, TextStats}
import graft.ops.{Dedup, MultiModal, Packing, Quality, Sampling, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import scala.collection.immutable.ListMap

/** Relational core: scans, aggregations, joins, windows, set ops,
  * rollup/cube, skew/salting, approximate sketches, as-of and range
  * joins, the SQL surface, and the streaming window/join faces.
  *
  * One trait of the [[Inventory]] registry split (r12 verdict #7):
  * the single `queries` ListMap + `oracleSql` map in [[Inventory]]
  * remain the registry face; the linear trait chain preserves the
  * original member initialization order.
  */
private[queries] trait InventoryRelational extends InventoryShared {


  // -------------------------------------------------------------------
  // Q1–Q15: relational surface
  // -------------------------------------------------------------------

  private[queries] def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .where(col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))


  private[queries] def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))


  private[queries] def q03(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)


  private[queries] def q04(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))


  private[queries] def q05(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("with").as("side"), col("c_custkey"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("without").as("side"), col("c_custkey"))
    withOrders.unionAll(withoutOrders).orderBy(col("side"), col("c_custkey"))
  }


  private[queries] def q06(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }


  private[queries] def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }


  private[queries] def q08(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name").asc_nulls_first, col("o_orderpriority").asc_nulls_first)


  private[queries] def q09(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(10)


  private[queries] def q10(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val a = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val b = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    a.except(b).select(lit("except").as("op"), col("c_custkey"))
      .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("c_custkey")))
      .orderBy(col("op"), col("c_custkey"))
  }


  private[queries] def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique_texts"))
      .orderBy(col("lang"))


  private[queries] def q12(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        date_trunc("month", col("o_orderdate")).cast("date").as("omonth"),
        round(col("o_totalprice"), 0).as("price_round"),
        round(sqrt(col("o_totalprice")), 6).as("price_sqrt"))
      .orderBy(col("o_orderkey"))


  private[queries] def q13(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("total_k"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))


  private[queries] def q15(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))
      .orderBy(col("ws"), col("event_type"))


  private[queries] def q27(s: SparkSession, d: String): DataFrame = {
    // Structured Streaming parity: the same tumbling-window aggregation
    // as q15, computed BY THE STREAMING ENGINE (file source ->
    // availableNow trigger -> complete-mode memory sink) and checked
    // against the batch DuckDB oracle. Schema is footer-derived (file
    // stream sources don't infer) and ts layout-adaptive.
    val name = "graft_q27_sink"
    withStagedTable(d, "events") { stageDir =>
      val stream = graft.sources.EventsTable.readStream(s, stageDir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
      withStreamPartitions(s, 8) {
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
    }
    s.table(name).orderBy(col("ws"), col("event_type"))
  }


  /** As-of join via [[graft.ops.AsOf]]: for each 'click' event, the
    * user's most recent 'purchase' at-or-before the click. Ties at one
    * (user, ts) resolve to the max value through the window tiebreak —
    * same result as DuckDB's ASOF JOIN against a max-per-ts right side,
    * with no pre-aggregation exchange (one shuffle total).
    */
  private[queries] def q28(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    graft.ops.AsOf.join(clicks, purchases, "user_id", "ts",
        valueCols = Seq("pv"), tiebreak = "pv")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts").as("pts"), col("pv"))
      .orderBy(col("event_id"))
  }


  /** Session windows (gap-based): events of a user belong to one
    * session while consecutive gaps stay under 4 hours; window end =
    * last event + gap. Oracle: gaps-and-islands SQL.
    */
  private[queries] def q29(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("session_window.start").as("ss"), col("session_window.end").as("se"),
        col("user_id"), col("n"), col("total_value"))
      .orderBy(col("user_id"), col("ss"))


  /** Full grouping-sets coverage: CUBE over (mktsegment, priority)
    * (q08 covers ROLLUP).
    */
  private[queries] def q30(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderpriority").asc_nulls_first)


  /** Interval/range join (§2.8): clicks landing inside the 1-hour
    * window after a same-user purchase. The window side is broadcast
    * (it is the filtered, projected small side); the range predicate
    * then evaluates stream-side with no shuffle at all. At 100 TB with
    * two large sides the plan becomes bin-bucketing: floor(ts to 1h)
    * equi-keys on both sides (+1 neighbor bin), shuffle on
    * (user, bin), residual range filter — same declarative shape, one
    * added `explode(bins)`.
    */
  private[queries] def q32(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val windows = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    clicks.join(broadcast(windows),
        col("user_id") === col("p_user") &&
          col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select(col("click_id"), col("purchase_id"))
      .orderBy(col("click_id"), col("purchase_id"))
  }


  /** Skewed aggregation via salting ([[graft.ops.Skew]]): events have
    * only 5 event_type keys — at 32 shuffle partitions an unsalted
    * final phase leaves 27 reducers idle. The salted plan splits each
    * hot key across 16 reducers and merges exactly (counts + DECIMAL
    * sums are associative). Result is identical to the plain GROUP BY,
    * which is the oracle.
    */
  private[queries] def q34(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.saltedCountSum(t(s, d, "events"), "event_type",
        dec(col("value")), salts = 16)
      .select(col("event_type"), col("n"),
        col("total").cast("double").as("total_value"))
      .orderBy(col("event_type"))


  /** Window frame coverage beyond q06/q07: lag/lead offsets and a
    * RANGE frame (trailing 30-day revenue per customer, keyed on an
    * epoch-day ordering column — peers at the same day share the
    * frame, exactly DuckDB's RANGE semantics).
    */
  private[queries] def q35(s: SparkSession, d: String): DataFrame = {
    val w1 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wr = Window.partitionBy(col("o_custkey"))
      .orderBy(datediff(col("o_orderdate"), to_date(lit("1970-01-01"))))
      .rangeBetween(-30, 0)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w1).as("prev_price"),
        lead(col("o_orderdate"), 1).over(w1).as("next_date"),
        sum(dec(col("o_totalprice"))).over(wr).cast("double").as("trailing_30d"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }


  /** Typed-Aggregator top-k per group ([[graft.ops.TopKByScore]], the
    * §2.8 UDAF surface): top-3 documents per language by token count.
    * Unlike the q06 window shape, the map-side partial keeps only k
    * pairs per group per partition — the shuffle never carries the
    * full group.
    */
  private[queries] def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "documents")
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"),
        GraftFunctions.token_count(col("text")).cast("double").as("score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(graft.ops.TopKByScore(3).toColumn.name("top"))
      .toDF("lang", "top")
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col._2").as("doc_id"), col("col._1").as("score"))
      .orderBy(col("lang"), col("rank"))
  }


  /** Streaming stateful dedup (§2.8's one reference-motivated stateful
    * op, D1 as a stream): file source -> md5(text) ->
    * `dropDuplicates` backed by the state store -> append-mode memory
    * sink under an availableNow trigger. Which row survives is
    * engine-arbitrary, so the checked output is the surviving hash SET
    * (= batch DISTINCT, the oracle).
    */
  private[queries] def q38(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val name = "graft_q38_sink"
    withStagedTable(d, "documents") { stageDir =>
      val stream = s.readStream.schema(schema).parquet(stageDir)
        .select(md5(col("text").cast("binary")).as("h"))
        .dropDuplicates("h")
      withStreamPartitions(s, 8) {
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
    }
    s.table(name).select(col("h")).orderBy(col("h"))
  }


  /** Custom-state sessionization ([[graft.streaming.StatefulSessions]],
    * the §2.8 `flatMapGroupsWithState` surface): same sessions as the
    * native `session_window` (q29) — and the same gaps-and-islands
    * oracle — computed by explicit per-group state code.
    */
  private[queries] def q39(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = t(s, d, "events")
      .select(col("user_id").cast("long"), unix_micros(col("ts")), col("value"))
      .as[(Long, Long, Double)]
    graft.streaming.StatefulSessions.sessionize(ev, gapMicros = 4L * 3600 * 1000000)
      .select(timestamp_micros(col("ssu")).as("ss"), timestamp_micros(col("seu")).as("se"),
        col("user_id"), col("n"), col("total_value"))
      .orderBy(col("user_id"), col("ss"))
  }


  /** Exact (sort-based) percentiles per group — the order-statistics
    * aggregation surface. Spark's `percentile` and DuckDB's
    * `quantile_cont` both compute the type-7 interpolated quantile on
    * the fully sorted group.
    */
  private[queries] def q40(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))


  /** Sliding (hopping) windows — 2-hour windows every hour, so each
    * event lands in exactly two windows (q15/q27 cover tumbling).
    */
  private[queries] def q43(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("ws"), col("event_type"))


  /** Bucketed storage + co-located join: both sides written
    * `bucketBy(custkey)` into the session catalog, then joined and
    * aggregated. Write-time bucketing replaces the per-query join
    * shuffle (the exchange-free SMJ plan is asserted in BucketingSpec;
    * at 100 TB this is the layout for repeated fact-fact joins — pay
    * the partitioning once at write, never per query).
    */
  private[queries] def q41(s: SparkSession, d: String): DataFrame = {
    s.sql("DROP TABLE IF EXISTS graft_q41_orders")
    s.sql("DROP TABLE IF EXISTS graft_q41_customer")
    // ONE fixed warehouse path, overwritten per invocation: DROP TABLE
    // on path-based tables does not delete data, so a fresh temp dir
    // per run would leak full bucketed copies of orders+customer into
    // /tmp on every bench warm+timed pass. mode(overwrite) below
    // replaces the data in place — at most one copy ever exists.
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_q41_wh"
    t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").option("path", s"$wh/orders")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("graft_q41_orders")
    t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").option("path", s"$wh/customer")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("graft_q41_customer")
    s.table("graft_q41_orders")
      .join(s.table("graft_q41_customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }


  /** Pivot (columnar cross-tab) — `groupBy().pivot()` with an explicit
    * value list, so the plan is a single two-phase aggregation (no
    * value-discovery pre-pass, no second shuffle; at scale always pass
    * the value list).
    */
  private[queries] def q45(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(sum(dec(col("o_totalprice"))).cast("double"))
      .orderBy(col("o_orderstatus"))


  /** Stream-stream inner join with event-time range — for each 'view',
    * the same user's 'purchase's within the following hour, computed BY
    * THE STREAMING ENGINE (two file-source streams, per-side
    * watermarks, availableNow). Watermarks bound the join state: each
    * side buffers only rows newer than (watermark - range), so state
    * is O(rate x window), not O(stream). Inner-join output is exactly
    * the batch join, which is what the oracle computes.
    */
  private[queries] def q46(s: SparkSession, d: String): DataFrame = {
    val name = "graft_q46_sink"
    withStagedTable(d, "events") { stageDir =>
      val joined = graft.streaming.StreamJoins.viewPurchaseJoin(s, stageDir)
      withStreamPartitions(s, 8) {
        val q = joined.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
    }
    s.table(name).orderBy(col("user_id"), col("view_id"), col("purchase_id"))
  }


  /** Approximate sketches — the single-pass, mergeable, bounded-memory
    * scale path for distinct counts (HLL++) and quantiles (KLL-style
    * approx_percentile): at 100 TB these replace the shuffle-heavy
    * exact forms when a few percent error is acceptable. The oracle
    * pins the EXACT values and asserts the sketches land inside their
    * published error envelopes (HLL rsd 5% -> 15% is >3 sigma;
    * approx_percentile accuracy 1000 -> well under 5% here), so the
    * check is deterministic for a fixed dataset.
    */
  private[queries] def q47(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("__hll"),
        expr("percentile(l_extendedprice, 0.5)").as("__p50"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("__ap50"))
      .select(col("l_returnflag"),
        col("exact_orders").cast("long").as("exact_orders"),
        (abs(col("__hll") - col("exact_orders")) <= col("exact_orders") * lit(0.15))
          .as("hll_within_15pct"),
        (abs(col("__ap50") - col("__p50")) <= col("__p50") * lit(0.05))
          .as("p50_within_5pct"))
      .orderBy(col("l_returnflag"))


  /** Full outer join with nulls on BOTH sides (q03/q04 cover inner,
    * q05 semi/anti): per-customer order totals full-outer joined to
    * the BUILDING-segment customer list — customers without orders
    * null the left side, non-BUILDING buyers null the right.
    */
  private[queries] def q48(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("spend"))
    val b = t(s, d, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    a.join(b, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy(col("custkey"))
  }


  /** Set ops with multiplicity (q10 covers the DISTINCT forms):
    * `intersectAll` keeps min(countA, countB) copies, `exceptAll`
    * keeps countA - countB — bag semantics, folded to (key, copies)
    * for a deterministic result.
    */
  private[queries] def q49(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "lineitem").where(col("l_quantity") < 10).select(col("l_orderkey"))
    val b = t(s, d, "lineitem").where(col("l_discount") > 0.05).select(col("l_orderkey"))
    val ia = a.intersectAll(b).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("copies")).withColumn("op", lit("intersect_all"))
    val ea = a.exceptAll(b).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("copies")).withColumn("op", lit("except_all"))
    ia.unionByName(ea)
      .select(col("op"), col("l_orderkey"), col("copies"))
      .orderBy(col("op"), col("l_orderkey"))
  }


  /** Frame sampling (brief's multimodal frame-sample op): each "video"
    * blob explodes into 4 evenly-spaced 256-byte frames inside its
    * partition — narrow, content never shuffles; only (id, idx, len,
    * hash) projections leave the stage. The stub frame arithmetic is
    * byte-slice arithmetic, so the oracle recomputes every frame hash
    * with `substring` (ASCII corpus: byte == char).
    */
  private[queries] def q50(s: SparkSession, d: String): DataFrame = {
    val media = t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
    MultiModal.sampleFrames(media, "bytes", n = 4, frameBytes = 256)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("flen"),
        md5(col("frame")).as("fhash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }


  /** Array higher-order functions (§2.8 scalar families beyond q12's
    * string/date/math): `transform`, `filter`, `aggregate` (sequential
    * fold — same evaluation order as DuckDB's list_sum), `zip_with`,
    * `reverse`, `array_max` in one projection. Everything is codegen'd
    * per-row work with no shuffle beyond the final presentation sort.
    */
  private[queries] def q51(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .withColumn("e", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"),
        expr("cast(size(filter(e, x -> x > 0)) as bigint)").as("n_pos"),
        expr("round(aggregate(e, cast(0.0 as double), (acc, x) -> acc + x * x), 6)")
          .as("sum_sq"),
        expr("round(array_max(e), 6)").as("max_e"),
        expr("round(aggregate(zip_with(e, reverse(e), (x, y) -> x * y), " +
          "cast(0.0 as double), (acc, z) -> acc + z), 6)").as("rev_dot"))
      .orderBy(col("vec_id"))


  /** The SQL entry path (`spark.sql` over registered views) — TPC-H
    * Q3 shape written once in ANSI SQL and executed verbatim by BOTH
    * engines, proving dialect-level parity, not just DataFrame parity.
    */
  private[queries] val q53Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin


  private[queries] def q53(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q53Sql)
  }


  /** Correlated scalar subquery + EXISTS (§2.8 joins: Catalyst
    * decorrelates both into aggregating/semi joins — `.explain` shows
    * no nested execution). Verbatim SQL on both engines.
    */
  private[queries] val q54Sql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
      |    AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin


  private[queries] def q54(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q54Sql)
  }


  /** Distribution window functions (ntile / percent_rank / cume_dist —
    * q06/q07/q35 cover ranking, frames, offsets). The window order is
    * made total with the key tiebreak, so every rank is deterministic.
    */
  private[queries] val q55Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin


  private[queries] def q55(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(q55Sql)
  }


  /** Explicit GROUPING SETS with `grouping()` indicator columns (q08
    * covers rollup, q30 cube — this is the general form, planned as a
    * single Expand + two-phase aggregate like both of those).
    */
  private[queries] val q56Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin


  private[queries] def q56(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(q56Sql)
  }


  /** Recursive CTE (§2.8 SQL surface; Spark 4.x WITH RECURSIVE):
    * walk each region's nations in key order via a lead()-derived
    * successor relation, accumulating the path — a linear-recursion
    * traversal with a window-built non-recursive CTE feeding the
    * recursive member. Verbatim SQL on both engines (q53 rule: the
    * SAME text runs on Spark and DuckDB; `||`, lead(), CAST agree).
    * Depth is bounded by the largest region (5), rows by the nation
    * table (25) — recursion state stays trivially broadcastable at
    * any corpus scale (the recursion is over dimension data, never
    * facts).
    */
  private[queries] val q63Sql: String =
    """WITH RECURSIVE succ AS (
      |  SELECT n_regionkey AS rk, n_nationkey AS nk, n_name AS name,
      |         lead(n_nationkey) OVER (PARTITION BY n_regionkey
      |                                 ORDER BY n_nationkey) AS next_nk,
      |         row_number() OVER (PARTITION BY n_regionkey
      |                            ORDER BY n_nationkey) AS rn
      |  FROM nation
      |), chain AS (
      |  SELECT rk, nk, next_nk, 1 AS depth, name AS path
      |  FROM succ WHERE rn = 1
      |  UNION ALL
      |  SELECT s.rk, s.nk, s.next_nk, c.depth + 1, c.path || '>' || s.name
      |  FROM chain c JOIN succ s ON s.rk = c.rk AND s.nk = c.next_nk
      |)
      |SELECT rk AS regionkey, CAST(depth AS BIGINT) AS levels, path
      |FROM chain WHERE next_nk IS NULL
      |ORDER BY regionkey""".stripMargin


  private[queries] def q63(s: SparkSession, d: String): DataFrame = {
    t(s, d, "nation").createOrReplaceTempView("nation")
    s.sql(q63Sql)
  }


  /** Map-typed columns + map higher-order functions (§2.8 scalar
    * families, the map siblings of q51's array HOFs): per-document
    * token histogram as a real MapType column (`map_from_entries`),
    * filtered with `map_filter`, re-flattened with `map_entries`.
    * The oracle states the same semantics relationally (GROUP BY +
    * HAVING) — the map round-trip must be lossless.
    */
  private[queries] def q65(s: SparkSession, d: String): DataFrame = {
    // fan out before the tokenize+explode (generator — no pushdown
    // concern; identity at scale — Layouts.fanOutByKey)
    val tok = graft.ops.Layouts.fanOutByKey(t(s, d, "documents"), "doc_id")
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("tok"))
    tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("tok"), col("n")))))
        .as("hist"))
      .select(col("doc_id"),
        explode(map_entries(map_filter(col("hist"), (_, v) => v >= 5))).as("e"))
      .select(col("doc_id"), col("e.key").as("tok"), col("e.value").cast("long").as("n"))
      .orderBy(col("doc_id"), col("tok"))
  }


  /** UNPIVOT (§2.8 reshaping, the inverse of q45's pivot): wide
    * per-flag measure columns melted to (flag, measure, value) rows
    * via the DataFrame `unpivot` API (Spark 3.4+). Money through
    * DECIMAL per the oracle-parity rules.
    */
  private[queries] def q66(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).cast("double").as("qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("price"),
        sum(dec(col("l_discount"))).cast("double").as("disc"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("qty"), col("price"), col("disc")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy(col("l_returnflag"), col("measure"))


  /** Correlated LATERAL subquery join (§2.8 joins — the per-row
    * top-N-per-group idiom; Catalyst plans the correlated LIMIT
    * without nested execution). Verbatim SQL on both engines — the
    * comma-LATERAL form is the dialect intersection (Spark's bare
    * `JOIN LATERAL` and DuckDB's required `ON true` differ).
    */
  private[queries] val q67Sql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey <= 100
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin


  private[queries] def q67(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
    s.sql(q67Sql)
  }


  /** Mergeable HLL sketches (§2.8 approx aggregation beyond q47's
    * one-shot approx_count_distinct): per-group sketches built with
    * `hll_sketch_agg`, merged ACROSS groups with `hll_union_agg`, and
    * estimated — the pre-aggregation pattern that makes distinct
    * counts roll up across days/partitions at 100 TB without
    * re-scanning raw data. Sketch construction and union depend only
    * on register maxima, so the estimate is deterministic and input-
    * order-independent; the oracle checks the q47-style error
    * envelope (default lgConfigK=12 → rsd ~1.6%, enveloped at 5%)
    * as booleans against exact distincts.
    */
  private[queries] def q68(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql("""
      WITH per AS (
        SELECT o_orderstatus AS status, hll_sketch_agg(o_custkey) AS sk,
               count(DISTINCT o_custkey) AS exact_d
        FROM orders GROUP BY o_orderstatus),
      rows AS (
        SELECT status, hll_sketch_estimate(sk) AS est, exact_d FROM per
        UNION ALL
        SELECT 'ALL', hll_sketch_estimate(hll_union_agg(sk)),
               (SELECT count(DISTINCT o_custkey) FROM orders) FROM per)
      SELECT status, CAST(exact_d AS BIGINT) AS exact_d,
             abs(est - exact_d) <= exact_d * 0.05 AS within_5pct
      FROM rows ORDER BY status""")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.util.Num._

/** Time-series shaping operators over the calendar-keyed tables:
  * gap-filling (resampling a sparse daily series onto a dense
  * calendar) and slowly-changing-dimension (SCD type 2) history
  * building — the two transforms a warehouse user reaches for when
  * turning an event log into an analysis-ready series or a versioned
  * dimension.
  *
  * Both are declarative single-window / single-join plans: at 100 TB
  * the calendar spine stays tiny (days × group cardinality) and
  * broadcasts, the daily pre-aggregation is a partial-combine shuffle
  * on (group, day), and the SCD windows shuffle once on the dimension
  * key — no driver-side loops anywhere.
  */
object TimeSeriesOps {

  /** Epoch seconds of a timestamp column. The parquet dates are
    * TIMESTAMP_NTZ, which has no direct long cast — routing through
    * TIMESTAMP uses the session timezone, pinned to UTC by
    * GraftSession, so this equals DuckDB's epoch() exactly. Shared by
    * EVERY operator that second-indexes a timestamp column — orders
    * (incrAgg, profileTable) and events (EventOps, StatOps.asofJoin,
    * streaming.EventStream) — so a timezone-semantics fix lands once.
    */
  private[graft] def epochSecExpr(colName: String) =
    expr(s"CAST(CAST($colName AS TIMESTAMP) AS LONG)")

  /** Epoch-day index: integer DIV on epoch seconds (a double divide
    * would be exact here, but integer math keeps the oracle trivially
    * identical).
    */
  private[graft] def epochDayExpr(colName: String) =
    expr(s"CAST(CAST($colName AS TIMESTAMP) AS LONG) DIV 86400")

  /** Calendar gap-fill: daily order count + exact revenue per
    * priority, resampled onto each priority's full [min_day, max_day]
    * calendar. Missing days appear with n=0 / total 0.00, and
    * `ffill_value` carries the last observed day's revenue forward
    * (`last(..., ignoreNulls)` over an unbounded-preceding frame — the
    * standard forward-fill).
    *
    * Plan shape: one partial-combine shuffle on (priority, day) for
    * the daily aggregate; the calendar spine is generated from the
    * per-priority min/max via `sequence` + `explode` (days × 5 rows —
    * trivially broadcastable at any corpus scale, since calendars grow
    * with wall-clock time, not data volume); the spine-to-daily join
    * is a broadcast; the forward fill is one window shuffle on
    * priority. No driver-side date loop — the reference's pandas
    * `reindex`/`ffill` pattern re-expressed relationally.
    */
  def tsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), epochDayExpr("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total_value"))
    val spine = daily
      .groupBy("o_orderpriority")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("o_orderpriority"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val ffill = Window.partitionBy("o_orderpriority").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("o_orderpriority", "day"), "left")
      .select(
        col("o_orderpriority"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"),
        last(col("total_value"), ignoreNulls = true).over(ffill).as("ffill_value"))
      .orderBy("o_orderpriority", "day")
  }

  /** SCD type-2 dimension build: version each customer's
    * `o_orderpriority` attribute from their order history. A change
    * row opens whenever the priority differs from the previous order
    * (lag over (custkey, date, orderkey)); `valid_to` is the next
    * change's `valid_from` (lead over the change rows); the open
    * version has `valid_to` NULL and `is_current` true.
    *
    * Two windows, both partitioned by the dimension key — one shuffle
    * on o_custkey total (the second window reuses the first's
    * partitioning; AQE coalesces). Per-key state is bounded by one
    * customer's history, never the table — the standard distributed
    * SCD2 derivation, vs. the row-at-a-time MERGE loop a single-node
    * engine would run.
    */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        epochDayExpr("o_orderdate").as("od"))
      .withColumn("_prev", lag(col("o_orderpriority"), 1).over(byKey))
      .filter(col("_prev").isNull || col("_prev") =!= col("o_orderpriority"))
      .withColumn("valid_to", lead(col("od"), 1).over(byKey))
      .select(
        col("o_custkey"), col("o_orderpriority"),
        col("od").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("o_custkey", "valid_from")
  }
}

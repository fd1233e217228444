package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.util.Num._

/** Time-series operators over the `events` table — the batch
  * equivalents of the Structured Streaming pipeline in
  * graft.streaming (same windowing semantics, verifiable against a
  * SQL oracle).
  *
  * The events parquet stores TIMESTAMP(MICROS) without timezone, which
  * Spark reads as TIMESTAMP_NTZ. All window math happens on whole
  * epoch seconds via the shared [[TimeSeriesOps.epochSecExpr]]
  * (session timezone is UTC, so the NTZ wall clock IS the epoch
  * instant — same convention as the DuckDB oracle's
  * `floor(epoch(ts))`), in integer arithmetic (`DIV`) so bucket
  * boundaries are exact.
  */
object EventOps {

  private def epochSec = TimeSeriesOps.epochSecExpr("ts")

  /** Tumbling 5-minute windows per event type: count + exact value sum.
    * Batch twin of `window($"ts", "5 minutes")` — bucket arithmetic is
    * used so the oracle is plain SQL.
    */
  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        (floor(epochSec / 300) * 300).cast("long").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type")

  /** Sliding 10-minute windows advancing by 5 minutes (each event lands
    * in 2 buckets), via explicit bucket replication — the generic
    * form of Spark's `window(ts, "10 minutes", "5 minutes")`.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("window_start",
        explode(array((floor(epochSec / 300) * 300).cast("long"),
          (floor(epochSec / 300) * 300 - 300).cast("long"))))
      .groupBy("window_start")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .orderBy("window_start")

  /** Sessionization: per-user sessions split on >30-minute inactivity
    * gaps (lag + cumulative boundary count — one shuffle on user_id).
    * The batch twin of `session_window($"ts", "30 minutes")`.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("_prev", lag(epochSec, 1).over(byUser))
      .withColumn("_new_session",
        (col("_prev").isNull || (epochSec - col("_prev") > 1800)).cast("long"))
      .withColumn("session_idx",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        min(epochSec).as("session_start"),
        max(epochSec).as("session_end"),
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Click-to-purchase attribution: for each purchase, the number of
    * clicks by the same user in the preceding 30 minutes — an interval
    * join, the batch twin of the stream-stream join in
    * graft.streaming.EventStream.
    *
    * The equi-key is (user_id, time-bucket), not user_id alone. A
    * user_id-only hash join evaluates clicks × purchases pairs per
    * user before the range filter — one bot user with 10⁶ clicks and
    * 10⁴ purchases turns one partition into 10¹⁰ pair evaluations.
    * Bucketing both sides by floor(es / 1800) (the window length) and
    * replicating each purchase into its own bucket and the one before
    * caps pair work per (user, bucket) at
    * clicks_in_bucket × purchases_in_2_buckets — i.e. proportional to
    * events within any one-hour span, never to a user's full history —
    * at the cost of doubling the (skinnier) purchase side. Every
    * matching click lives in bucket k or k−1 of its purchase
    * (c_es ∈ [p_es−1800, p_es] ⇒ ⌊c_es/1800⌋ ∈ {⌊p_es/1800⌋−1,
    * ⌊p_es/1800⌋}), and a click has exactly ONE bucket, so each
    * qualifying pair joins exactly once — identical output, no
    * dedup needed. Bucket math is integer DIV on whole epoch seconds,
    * so boundaries are exact (no float rounding).
    */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).withColumn("es", epochSec)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("es").as("p_es"))
      .withColumn("tb", explode(array(expr("p_es DIV 1800"), expr("p_es DIV 1800 - 1"))))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("es").as("c_es"), expr("es DIV 1800").as("tb"))
    p.join(c, Seq("user_id", "tb"))
      .filter(col("c_es").between(col("p_es") - 1800, col("p_es")))
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  /** Cohort retention: users grouped by first-seen day, activity
    * counted per (cohort_day, day offset) — the standard retention
    * matrix in long form. Two shuffles total: the per-user min-day
    * aggregate (partial combine) re-joins on user_id (the aggregate
    * output is already user_id-partitioned, so the join reuses that
    * exchange), then a (cohort, offset, user) distinct-count — which
    * Spark plans as two partial aggregations, never a per-group set.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), TimeSeriesOps.epochDayExpr("ts").as("day"))
    val cohorts = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "offset_days")
  }

  /** Time-RANGE window frame: per-event rolling 10-minute value sum
    * within event_type — `RANGE BETWEEN 600 PRECEDING AND CURRENT ROW`
    * over epoch seconds, i.e. the frame is defined by time distance,
    * not row count (rows-frames are windowRunningSum's job). Peers at
    * the same second share one frame in both engines. The sum is an
    * exact decimal (order-independent) cast back to double. One window
    * shuffle on event_type.
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("event_type").orderBy("es").rangeBetween(-600, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), epochSec.as("es"), col("value"))
      .withColumn("rolling_value",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .drop("value")
      .orderBy("event_id")
  }

  /** JSON prop extraction + filtered aggregation per event type:
    * error share and value stats (F11-style semi-structured access).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .orderBy("event_id")

  /** JSON built-in-function surface over the events payload: path
    * extraction (string and typed), from_json struct parse, to_json
    * round-trips for structs and arrays, and a missing-path NULL probe
    * — oracle-matched against DuckDB's JSON functions. Completes the
    * semi-structured trio next to array_funcs / map_funcs; the
    * hot-path extraction stays jsonExtract's single get_json_object.
    * to_json keeps null fields explicit (ignoreNullFields=false) so
    * both engines print `{"k":null}`, not a field-dropping `{}`.
    */
  /** VARIANT semi-structured surface (Spark 4's open-schema path,
    * next to jsonFuncs' fixed-schema from_json): `try_parse_json`
    * parses each payload ONCE into the binary VARIANT encoding —
    * shredded, typed access without declaring a schema up front —
    * then `variant_get` extracts a typed field, `to_json` round-trips,
    * and `schema_of_variant` reports the per-row inferred shape. At
    * 100 TB this is the ingest-side answer to heterogeneous payloads:
    * parse once into VARIANT at the edge, let every downstream
    * consumer do typed point reads without re-parsing text. Same
    * deterministic 10% slice as jsonFuncs (semantic-parity gate, not
    * a scan benchmark); the oracle replicates with DuckDB's JSON
    * functions and pins the inferred schema string as a literal — a
    * malformed payload would flip it and fail the hash.
    */
  def variantFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), try_parse_json(col("props")).as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'long')").as("k_long"),
        expr("to_json(v)").as("rt"),
        expr("schema_of_variant(v)").as("sch"),
        expr("variant_get(v, '$.missing', 'string')").isNull.as("miss_null"))
      .orderBy("event_id")

  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    // two projections, deliberately: JsonToStructs is a non-codegen
    // parse, and CollapseProject keeps a multiply-referenced expensive
    // expression in its own stage — so the document parses ONCE and
    // the three consumers read the parsed value (inlining the parse
    // into each consumer measured 3x slower at sf1)
    // deterministic 10% slice: like array_funcs/map_funcs this query
    // pins SEMANTIC parity of the function surface, not scan
    // throughput — jsonExtract covers the full-table hot path
    Tables.events(spark, dir)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("props"),
        from_json(col("props"), "k LONG, missing STRING",
          Map.empty[String, String]).as("j"))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        col("j.k").as("k_long"),
        to_json(struct(col("j.k").as("k")),
          Map("ignoreNullFields" -> "false")).as("rt_obj"),
        to_json(array(col("j.k"), col("j.k") + 1)).as("rt_arr"),
        col("j.missing").isNull.as("miss_null"))
      .orderBy("event_id")
}

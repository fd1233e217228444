package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table — the streaming
  * upgrade of the reference's calendar rollup (SURVEY.md §7.4a): the
  * same windowed aggregations as graft.operators.EventOps, expressed
  * as an unbounded source with watermarks, plus a custom stateful
  * sessionizer via flatMapGroupsWithState.
  *
  * The batch twins in EventOps share the window math, so streaming
  * results are directly checkable against the DuckDB-oracled batch
  * queries (see StreamingSpec).
  *
  * Scale notes: tumbling/sliding windows are partial-aggregated per
  * micro-batch and merged in the state store (one shuffle per batch on
  * the window key); the watermark bounds state. Sessionization keys
  * state by user_id — state size is O(active users), not O(events).
  */
object EventStream {

  /** The events schema — `ts` is TIMESTAMP_NTZ (micros, UTC wall
    * clock; see EventOps scaladoc).
    */
  private def eventsSchema(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/events.parquet").schema

  /** Unbounded view of the events directory. `maxFilesPerTrigger=1`
    * exercises incremental processing even on a single input file.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema(spark, dir))
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      // whole-second truncation, SAME rounding as the batch twins'
      // unix_timestamp bucket math, so stream ≡ batch comparisons hold
      .withColumn("event_time",
        timestamp_seconds(graft.operators.TimeSeriesOps.epochSecExpr("ts")))

  /** Tumbling 5-minute window per event type with a 10-minute
    * watermark — the streaming twin of EventOps.tumblingWindow.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding 10-minute window advancing by 5 — twin of
    * EventOps.slidingWindow.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("window_start"), col("n"))

  /** Built-in session windows (30-minute gap) rendered to the custom
    * sessionizers' EXACT output shape — the third sessionizer twin
    * beside [[statefulSessions]] (flatMapGroupsWithState) and
    * [[statefulSessionsTws]] (transformWithState). `session_window`'s
    * window END is last-event + gap, so `session_end` subtracts the
    * gap back to the last event time; the gap and watermark delay
    * match the custom twins (30 min). StreamingSpec pins three-way
    * set equality on the deterministic flush fixture — the strongest
    * available evidence that the two hand-built state machines
    * implement the standard session semantics, and the declarative
    * form Catalyst can optimize is the one to PREFER when gaps are
    * constant (the custom processors exist for semantics
    * session_window cannot express, e.g. value-dependent gaps).
    */
  def sessionWindowSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "30 minutes")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        (col("session_window.end").cast("long") - 1800L).as("session_end"),
        col("n_events"), col("total_value"))

  /** Per-user session counts off [[sessionWindowSessions]] — twin of
    * EventOps.sessionize's grouping.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    sessionWindowSessions(events).select(col("user_id"), col("n_events"))

  /** Streaming KMV/theta sketch: per tumbling day, the k-minimum-
    * values sketch of distinct users plus its cardinality estimate —
    * the streaming face of StatOps.thetaSetOps' sketch tier, and the
    * proof that the custom bounded aggregate
    * ([[graft.functions.MinKDistinctLongs]], a TypedImperativeAggregate)
    * composes with Structured Streaming STATE: its serialized buffer
    * is what the state store persists between micro-batches, and its
    * merge() folds each batch's partials into the stored sketch. At
    * 100 TB this is the continuous-distincts plan: O(k) state per
    * window regardless of traffic, watermark-bounded window count,
    * and the emitted sketches are MERGEABLE downstream (union across
    * windows/streams = k smallest of concatenated retained sets) —
    * overlap dashboards without ever storing raw ids. Because the
    * retained set is deterministic under any merge order and
    * partitioning, StreamingSpec pins the streamed sketch arrays
    * EXACTLY equal to the batch twin's, element for element — a
    * stronger gate than any estimate tolerance.
    */
  def windowedDistinctSketch(events: DataFrame, k: Int): DataFrame =
    events
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 day"))
      // NULL ids are not distinct members (countDistinct semantics) —
      // and xxhash64(NULL) would be the constant seed, a phantom
      // element in every window's sketch; the null-gated hash keeps
      // the aggregate's null-skip path in charge
      .agg(graft.functions.BoundedAgg.minKDistinctLongs(
        when(col("user_id").isNotNull, xxhash64(col("user_id"))), k).as("sketch"))
      .select(col("window.start").cast("long").as("window_start"),
        col("sketch"),
        // single-sourced estimator — the same definition the batch
        // set-ops gate uses (BoundedAgg.kmvEstimate)
        graft.functions.BoundedAgg.kmvEstimate(col("sketch"), k)
          .as("est_distinct"))

  /** Stream-static join: enrich the event stream with a static
    * dimension (per-user tier derived from the batch view) — the
    * static side is re-read per micro-batch and broadcast; the stream
    * never shuffles for the join.
    */
  def enrichedCounts(spark: SparkSession, events: DataFrame, dir: String): DataFrame = {
    val userTiers = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        when(col("n_events") >= 200, "heavy").otherwise("light").as("tier"))
    events.join(broadcast(userTiers), Seq("user_id"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"))
  }

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding 30 minutes. Both sides carry watermarks
    * so the join state is bounded — clicks older than the interval plus
    * the watermark delay are evicted; matches emit eagerly (inner
    * join). Pass two independent readEvents sources. Batch twin:
    * graft.operators.EventOps.clickAttribution (DuckDB-oracled).
    */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "30 minutes")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_time").as("c_time"))
      .withWatermark("c_time", "30 minutes")
    p.join(c, expr(
      "c_user = p_user AND c_time BETWEEN p_time - INTERVAL 30 MINUTES AND p_time"))
      .select(col("purchase_id"), col("p_user").as("user_id"))
  }

  /** Streaming twin of the KEYED binned point-in-interval range join
    * (RangeJoinOps.pointInInterval with keys — the `rj_key` gate):
    * each purchase matched to the SAME USER's incident windows
    * `[error_time, error_time + windowSec)`. In the stream rendering
    * the window's hi bound is DERIVED (`i_lo + windowSec`), which is
    * what makes the join state evictable: the condition bounds
    * `p_time` on both sides of `i_lo`, so with watermarks on both
    * streams the symmetric hash join drops interval state as soon as
    * the point-side watermark passes `i_lo + windowSec` — the
    * streaming analog of "candidates only meet inside a grid cell";
    * neither the batch grid join nor this holds unbounded state.
    * Inner semantics (matches the inner batch form); StreamingSpec
    * pins stream ≡ batch on the events fixture.
    */
  def incidentWindowMatches(purchases: DataFrame, incidents: DataFrame,
      windowSec: Long): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "30 minutes")
    val i = incidents.filter(col("event_type") === "error")
      .select(col("user_id").as("i_user"), col("event_time").as("i_lo"))
      .withWatermark("i_lo", "30 minutes")
    p.join(i, expr(
        "p_user = i_user AND p_time >= i_lo AND " +
          s"p_time < i_lo + INTERVAL $windowSec SECONDS"))
      .select(col("p_id"), col("p_user").as("user_id"), col("i_lo"))
  }

  /** The LEFT OUTER face of [[clickAttribution]]: every purchase
    * emits — matched pairs eagerly like the inner join, and an
    * unmatched purchase emits ONE null-click row only once the
    * watermark proves no in-interval click can still arrive (the
    * state-eviction moment doubles as the null-emission trigger; this
    * is the outer-join capability the inner twin renders as absence).
    * Same bounded join state as the inner form.
    */
  def clickAttributionOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_time").as("c_time"))
      .withWatermark("c_time", "10 minutes")
    p.join(c, expr(
        "c_user = p_user AND c_time BETWEEN p_time - INTERVAL 30 MINUTES AND p_time"),
        "leftOuter")
      .select(col("purchase_id"), col("p_user").as("user_id"), col("c_time"))
  }

  /** Streaming as-of twin: enrich each purchase with its user's
    * LATEST signup within `toleranceSec` — the stream-stream
    * counterpart of the batch native as-of join's tolerance form
    * (StatOps.asofJoinTolerance / AsOfJoinOps.asof(tolerance)).
    *
    * Two chained stateful operators, both watermark-bounded:
    *
    *  1. an event-time INTERVAL join (`s_time ∈ [p_time − tol,
    *     p_time]`) — join state holds only rows inside the interval
    *     plus the watermark delay, then is evicted;
    *  2. a windowed MAX per purchase — for a max-orderable payload,
    *     "latest within the bound" ≡ the as-of match exactly when one
    *     exists (the same identity asofJoinTolerance's oracle uses),
    *     and the tumbling window over p_time gives the aggregation an
    *     event-time horizon so append mode can finalize each purchase
    *     (chaining a time-interval join into a window aggregation is
    *     the multi-stateful-operator support Spark gained in 3.4).
    *
    * Inner-join semantics: a purchase with NO in-tolerance signup
    * emits nothing — the streaming rendering of the batch operator's
    * null row (an outer streaming join would hold every purchase to
    * the watermark horizon for the same information). StreamingSpec
    * pins result equality against AsOfJoinOps.asof(tolerance) on a
    * deterministic fixture.
    */
  def asofSignupEnrichment(purchases: DataFrame, signups: DataFrame,
      toleranceSec: Long): DataFrame =
    asofEnrichment(purchases, signups, toleranceSec, "inner")

  /** The LEFT OUTER face of [[asofSignupEnrichment]] — the streaming
    * twin of the batch operator's FULL contract, null rows included:
    * every purchase emits exactly one row, with a null
    * `last_signup_es` when no in-tolerance signup exists. The chain
    * is the left-outer interval join (unmatched purchases surface a
    * null-signup row once the watermark proves no match can still
    * arrive — the state-eviction moment) feeding the same windowed
    * MAX; an unmatched purchase's group holds only its null row, so
    * the MAX is null and the row survives. The join's late null
    * emissions are not dropped by the aggregation because Spark's
    * per-operator watermark propagation (the 3.4 multi-stateful-
    * operator work) delays the downstream operator's input watermark
    * by the join's state retention. StreamingSpec pins result
    * equality against AsOfJoinOps.asof(tolerance) INCLUDING the null
    * rows.
    */
  def asofSignupEnrichmentOuter(purchases: DataFrame, signups: DataFrame,
      toleranceSec: Long): DataFrame =
    asofEnrichment(purchases, signups, toleranceSec, "leftOuter")

  /** FORWARD-direction streaming twin: each purchase picks its user's
    * EARLIEST signup at-or-after it within `toleranceSec` — the
    * stream rendering of `AsOfJoinOps.asof(direction = Forward,
    * tolerance)`. Same two-stateful-operator chain, mirrored: the
    * interval flips to `s_time ∈ [p_time, p_time + tol]` and the
    * windowed aggregate takes MIN (earliest ≥ ≡ the forward match for
    * a min-orderable payload, the mirror of the backward twin's MAX
    * identity). Inner semantics: no in-window signup → absence.
    * Nearest has no such rendering — it needs both neighbors compared
    * per row, which a single monotone aggregate cannot express; batch
    * owns that direction.
    */
  def asofSignupEnrichmentForward(purchases: DataFrame, signups: DataFrame,
      toleranceSec: Long): DataFrame =
    asofEnrichment(purchases, signups, toleranceSec, "inner", forward = true)

  private def asofEnrichment(purchases: DataFrame, signups: DataFrame,
      toleranceSec: Long, joinType: String,
      forward: Boolean = false): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "10 minutes")
    val s = signups.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_time").as("s_time"))
      .withWatermark("s_time", "10 minutes")
    val interval =
      if (forward)
        s"s_user = p_user AND s_time BETWEEN " +
          s"p_time AND p_time + INTERVAL $toleranceSec SECONDS"
      else
        s"s_user = p_user AND s_time BETWEEN " +
          s"p_time - INTERVAL $toleranceSec SECONDS AND p_time"
    val agg =
      if (forward) min(col("s_time").cast("long")).as("first_signup_es")
      else max(col("s_time").cast("long")).as("last_signup_es")
    p.join(s, expr(interval), joinType)
      .groupBy(window(col("p_time"), "5 minutes"),
        col("purchase_id"), col("p_user"))
      .agg(agg)
      .select(col("purchase_id"), col("p_user").as("user_id"), col(
        if (forward) "first_signup_es" else "last_signup_es"))
  }

  /** Streaming exact dedup with BOUNDED state: the streaming twin of
    * DedupOps.dedupExactText's hash-group dedup.
    * `dropDuplicatesWithinWatermark` holds a key only until the
    * watermark passes its event time, so state is O(keys per
    * watermark window) — a plain dropDuplicates would grow state
    * forever on an unbounded stream.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"))

  /** Streaming → JDBC sink via foreachBatch: each micro-batch's
    * windowed aggregate full-replaces the target table (complete-mode
    * semantics — the reference's DROP+CREATE sink applied per batch).
    * foreachBatch is the production pattern for sinks Spark has no
    * native streaming writer for; the batch handle reuses the exact
    * SalesIo.writeJdbc path the batch pipeline ships with. Returns the
    * started query; callers own its lifecycle.
    */
  def countsToJdbc(counts: DataFrame, url: String, table: String,
                   user: String, password: String): org.apache.spark.sql.streaming.StreamingQuery =
    counts.writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.SalesIo.writeJdbc(batch.toDF(), url, table, user, password)
      }
      .start()

  final case class Ev(user_id: Long, es: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: Long,
    session_end: Long, n_events: Long, total_value: Double)

  /** Custom stateful sessionization: explicit per-user state — the
    * escape hatch when session semantics outgrow `session_window`
    * (e.g. value-dependent gaps). A session closes two ways:
    *
    *  - a later event for the same user arrives > 30 min after the
    *    session's last event (gap close), or
    *  - the EVENT-TIME watermark passes last + 30 min with no further
    *    events (timeout flush) — so the trailing session of every user
    *    eventually emits instead of sitting in state forever. An
    *    event-time timeout is the right tool here: it fires off the
    *    watermark (data-driven, replay-deterministic), whereas a
    *    processing-time timeout would keep the micro-batch engine
    *    spinning on wall-clock and make results timing-dependent.
    *
    * State per user is one SessionState, removed on timeout — bounded
    * by active users within the watermark horizon.
    */
  def statefulSessions(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val evs = events.select(col("user_id"),
        graft.operators.TimeSeriesOps.epochSecExpr("ts").as("es"), col("value"),
        timestamp_seconds(
          graft.operators.TimeSeriesOps.epochSecExpr("ts")).as("event_ts"))
      .withWatermark("event_ts", "30 minutes")
      .as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: flush the
            // open session and drop the state entry.
            val flushed = state.getOption
              .map(s => SessionOut(uid, s.start, s.last, s.n, s.total))
            state.remove()
            flushed.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => e.es)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.es - s.last <= 1800 =>
                  // min/max envelope-extension, NOT last = e.es: an
                  // out-of-order event that arrives in a later
                  // micro-batch (but inside the watermark) would
                  // otherwise REGRESS `last`, shortening the session
                  // and its timeout bound (found by StreamingSpec's
                  // within-watermark merge fixture). With watermark
                  // delay == gap, every above-watermark event provably
                  // lands inside the open session's envelope
                  // [start-gap, last+gap]: es ≥ globalMax − delay and
                  // start ≤ globalMax give es ≥ start − gap — so this
                  // merge arm plus the gap-close arm are exhaustive
                  // and no retro-session case exists.
                  cur = Some(s.copy(
                    start = math.min(s.start, e.es),
                    last = math.max(s.last, e.es),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(e.es, e.es, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.es, e.es, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush when the watermark passes the session's gap bound
              state.setTimeoutTimestamp((s.last + 1800) * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  final case class VgState(start: Long, last: Long, lastValue: Double,
    n: Long, total: Double)

  /** The sessionizer variant the built-in `session_window` CANNOT
    * express — the concrete justification for the custom stateful
    * tier: the allowed gap depends on the DATA. After a high-value
    * event (value ≥ `highValue`) the session stays open for
    * `longGap` seconds; otherwise `baseGap` — "a big purchase keeps
    * the visit alive longer". `session_window(col, gap)` takes a
    * per-row gap expression only for the row STARTING the window;
    * here the gap is a property of the session's LAST event, a
    * stateful read no declarative form provides.
    *
    * Mechanics mirror [[statefulSessions]] (envelope merge, gap
    * close, event-time-timeout flush) with the gap drawn from the
    * state's last-event value; the watermark delay must be ≥ the MAX
    * gap for the no-retro-session envelope argument to hold, so
    * callers watermark at `longGap`. Spec-pinned against an in-JVM
    * reference on a fixture where the two gap regimes disagree.
    */
  def statefulSessionsValueGap(spark: SparkSession, events: DataFrame,
      baseGap: Long = 1800L, longGap: Long = 3600L,
      highValue: Double = 50.0): Dataset[SessionOut] = {
    import spark.implicits._
    def gapOf(v: Double): Long = if (v >= highValue) longGap else baseGap
    val evs = events.select(col("user_id"),
        graft.operators.TimeSeriesOps.epochSecExpr("ts").as("es"), col("value"),
        timestamp_seconds(
          graft.operators.TimeSeriesOps.epochSecExpr("ts")).as("event_ts"))
      .withWatermark("event_ts", s"$longGap seconds")
      .as[Ev]
    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState[VgState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[VgState]) =>
          if (state.hasTimedOut) {
            val flushed = state.getOption
              .map(s => SessionOut(uid, s.start, s.last, s.n, s.total))
            state.remove()
            flushed.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.es)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.es - s.last <= gapOf(s.lastValue) =>
                  // envelope merge as in statefulSessions; the value
                  // that governs the NEXT gap is the latest event's
                  val (nl, nlv) =
                    if (e.es >= s.last) (e.es, e.value) else (s.last, s.lastValue)
                  cur = Some(s.copy(start = math.min(s.start, e.es),
                    last = nl, lastValue = nlv,
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, s.start, s.last, s.n, s.total)
                  cur = Some(VgState(e.es, e.es, e.value, 1, e.value))
                case None =>
                  cur = Some(VgState(e.es, e.es, e.value, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapOf(s.lastValue)) * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** The sessionizer as a Spark 4 `StatefulProcessor` — identical
    * semantics to statefulSessions (same envelope merge, same gap
    * close, same watermark-driven flush), expressed on the modern API:
    * a typed ValueState[SessionState] per user and an explicit
    * event-time TIMER standing in for setTimeoutTimestamp. Two
    * deliberate differences from the fMGWS mechanics, both pinned in
    * StreamingSpec's backend-equivalence test:
    *  - timers ACCUMULATE (registerTimer adds; setTimeoutTimestamp
    *    replaced), so stale gap bounds are deleted before re-arming;
    *  - a stale timer that still fires (same-batch race between input
    *    processing and timer expiry) is ignored unless the watermark
    *    really passed the CURRENT session's bound.
    */
  final class SessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var session: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // O(per-user-per-trigger) memory, same as the fMGWS twin's
      // group sort: bounded by one user's volume within one
      // micro-batch, not by the stream. If a single hot user could
      // exceed executor memory in one trigger, pre-aggregate or
      // sub-bucket upstream.
      val sorted = rows.toSeq.sortBy(_.es)
      var cur = if (session.exists()) Some(session.get()) else None
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.es - s.last <= 1800 =>
            // min/max envelope extension — see statefulSessions
            cur = Some(s.copy(start = math.min(s.start, e.es),
              last = math.max(s.last, e.es), n = s.n + 1,
              total = s.total + e.value))
          case Some(s) =>
            closed += SessionOut(uid, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(e.es, e.es, 1, e.value))
          case None =>
            cur = Some(SessionState(e.es, e.es, 1, e.value))
        }
      }
      cur.foreach { s =>
        session.update(s)
        getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
        getHandle.registerTimer((s.last + 1800) * 1000L)
      }
      closed.result().iterator
    }
    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists()) {
        val s = session.get()
        // only flush when the watermark genuinely passed the CURRENT
        // session's bound — a stale timer must not truncate a live one
        if (timerValues.getCurrentWatermarkInMs() >= (s.last + 1800) * 1000L) {
          session.clear()
          Iterator.single(SessionOut(uid, s.start, s.last, s.n, s.total))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** statefulSessions on the transformWithState backend. Caller must
    * run with the RocksDB state store provider (the API requires it).
    */
  def statefulSessionsTws(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.TimeMode
    import spark.implicits._
    val evs = events.select(col("user_id"),
        graft.operators.TimeSeriesOps.epochSecExpr("ts").as("es"), col("value"),
        timestamp_seconds(
          graft.operators.TimeSeriesOps.epochSecExpr("ts")).as("event_ts"))
      .withWatermark("event_ts", "30 minutes")
      .as[Ev]
    evs.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append)
  }
}

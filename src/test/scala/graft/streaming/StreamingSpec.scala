package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Streaming results must agree with their DuckDB-oracled batch twins:
  * drive each streaming query to completion with a memory sink over
  * the finite sf0.001 events file and compare row sets.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("streaming-spec", "4")
  val sf = "/root/testdata/sf0.001"

  private def runToCompletion(df: org.apache.spark.sql.DataFrame,
                              name: String, mode: String): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling window matches batch twin") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.tumblingCounts(events), "tumbling", "complete")
    val streamed = spark.table("tumbling")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventOps.tumblingWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch)
  }

  test("streaming sliding window matches batch twin") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.slidingCounts(events), "sliding", "complete")
    val streamed = spark.table("sliding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventOps.slidingWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }

  test("session_window session count matches batch sessionize") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.sessionWindows(events), "sessions", "complete")
    val streamed = spark.table("sessions")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = EventOps.sessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("stream-static join matches the batch equivalent") {
    val events = EventStream.readEvents(spark, sf)
    runToCompletion(EventStream.enrichedCounts(spark, events, sf), "enriched", "complete")
    val streamed = spark.table("enriched")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batchEvents = graft.sources.Tables.events(spark, sf)
    val batch = EventStream.enrichedCounts(spark, batchEvents, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }

  test("stateful sessionizer emits consistent closed sessions") {
    val events = EventStream.readEvents(spark, sf)
    val out = EventStream.statefulSessions(spark, events)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("stateful").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stateful").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // closed sessions (the final open session per user stays in state)
    assert(got.nonEmpty)
    assert(got.forall { case (_, s, e, n) => s <= e && n >= 1 })
    // each closed session must exist in the batch sessionization
    val batch = EventOps.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val missing = got.filterNot(batch.contains)
    assert(missing.isEmpty, s"sessions not in batch result: ${missing.take(3)}")
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the time-series shaping / SCD2 / retention /
  * fuzzy-join / regression operators (the DuckDB hash gate proves
  * engine parity; these prove the semantics are the intended ones).
  */
class TimeSeriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("ts-spec", "4")
  val sf = "/root/testdata/sf0.001"

  test("ts_gapfill: spine is dense, gaps are zero-filled, ffill carries forward") {
    val out = TimeSeriesOps.tsGapfill(spark, sf).collect()
    val byPrio = out.groupBy(_.getString(0))
    byPrio.foreach { case (_, rows) =>
      val days = rows.map(_.getLong(1))
      assert(days.max - days.min + 1 === days.length, "calendar has holes")
      assert(days.distinct.length === days.length)
    }
    val gaps = out.filter(_.getLong(2) == 0L)
    assert(gaps.nonEmpty, "sf0.001 must have empty calendar days")
    assert(gaps.forall(_.getDouble(3) == 0.0))
    // ffill on a gap day equals the most recent non-gap day's total
    byPrio.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      var lastSeen: Option[Double] = None
      sorted.foreach { r =>
        if (r.getLong(2) > 0L) lastSeen = Some(r.getDouble(3))
        lastSeen.foreach(v => assert(r.getDouble(4) === v, s"ffill broke at $r"))
      }
    }
  }

  test("scd2_build: versions chain per key, exactly one current") {
    val out = TimeSeriesOps.scd2Build(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      // exactly one open (NULL valid_to) version per key, and it is last
      assert(sorted.count(_.isNullAt(3)) === 1, s"cust $k open-version count")
      assert(sorted.last.isNullAt(3) && sorted.last.getBoolean(4))
      // each valid_to equals the next valid_from (contiguous history)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) === b.getLong(2), s"cust $k gap in history")
          // consecutive versions differ (otherwise no change row)
          assert(a.getString(1) !== b.getString(1), s"cust $k no-op version")
        case _ =>
      }
    }
  }

  test("events_retention: offset-0 cohort sizes partition the user base") {
    val e = graft.sources.Tables.events(spark, sf)
    val totalUsers = e.select("user_id").distinct().count()
    val out = EventOps.cohortRetention(spark, sf).collect()
    assert(out.forall(_.getLong(1) >= 0L), "negative day offset")
    // every user appears in their cohort's offset-0 row exactly once
    val day0 = out.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(day0 === totalUsers)
    // retention never exceeds the cohort's day-0 size
    val day0ByCohort = out.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.forall(r => r.getLong(2) <= day0ByCohort(r.getLong(0))))
  }

  test("window_range_frame matches a brute-force time-range sum") {
    val rows = EventOps.windowRangeFrame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val vals = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("es"), col("value")).collect()
      .map(r => (r.getString(1), r.getLong(2), BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)))
    val byType = vals.groupBy(_._1)
    rows.foreach { case (_, typ, es, got) =>
      val want = byType(typ).filter(v => v._2 >= es - 600 && v._2 <= es)
        .map(_._3).sum.toDouble
      assert(got === want, s"range frame mismatch at ($typ, $es)")
    }
  }

  test("join_fuzzy_edit: blocked, canonical, thresholded") {
    val out = RelationalOps.joinFuzzyEdit(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b)
      assert(d >= 1L && d <= 3L)
      // dual blocking: the pair met on its first OR its last token
      val (ta, tb) = (a.split(" "), b.split(" "))
      assert(ta.last === tb.last || ta.head === tb.head, "blocking key violated")
      // the length-band prune is implied by d <= 3, so no pair may
      // violate it (lossless by construction)
      assert(math.abs(a.length - b.length) <= 3)
    }
  }

  test("regr_by_group agrees with corr_by_group (r2 = corr^2)") {
    val corr = StatOps.corrByGroup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    StatOps.regrByGroup(spark, sf).collect().foreach { r =>
      val c = corr(r.getString(0))
      assert(math.abs(r.getDouble(4) - c * c) < 1e-8,
        s"r2 != corr^2 for ${r.getString(0)}")
      // slope sign must match the correlation's sign
      assert(r.getDouble(2).sign === c.sign, s"slope/corr sign mismatch")
    }
  }

  test("sketch gates hold: all accuracy booleans true") {
    val d = StatOps.sketchDistinctGate(spark, sf).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      assert(r.getBoolean(2), s"approx_count_distinct out of tolerance: $r")
      assert(r.getBoolean(3), s"hll_sketch out of tolerance: $r")
    }
    val q = StatOps.sketchQuantileGate(spark, sf).collect()
    q.foreach(r => assert(r.getBoolean(2), s"approx_percentile out of tolerance: $r"))
  }

  test("profile_table: counts line up with direct per-column queries") {
    val o = graft.sources.Tables.orders(spark, sf)
    val out = QualityOps.profileTable(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("o_orderkey", "o_custkey", "o_totalprice",
      "od_sec", "o_orderstatus", "o_orderpriority"))
    val n = o.count()
    out.values.foreach(r => assert(r.getLong(1) === n))
    assert(out("o_orderkey").getLong(3) === n, "orderkey must be unique")
    assert(out("o_orderpriority").getLong(3) === 5L)
    // numeric columns carry min/max nums, strings carry min/max strs
    assert(!out("o_totalprice").isNullAt(4) && out("o_totalprice").isNullAt(6))
    assert(out("o_orderstatus").isNullAt(4) && !out("o_orderstatus").isNullAt(6))
  }

  test("dq_checks: clean synthetic corpus passes every constraint") {
    val out = QualityOps.dqChecks(spark, sf).collect()
    assert(out.length === 7)
    out.foreach(r => assert(r.getLong(1) === 0L, s"violated: ${r.getString(0)}"))
  }

  test("pagerank: mass conserved, bipartite ends differ, determinism under repartition") {
    val out = GraphOps.pageRank(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum / 1e9
    // 3 floored iterations leak < 1e-6 of mass; damping keeps the rest
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass drifted: $total")
    val (supp, part) = out.partition(_.getString(0).startsWith("s"))
    assert(supp.nonEmpty && part.nonEmpty)
    // suppliers have far higher degree than parts -> higher mean rank
    assert(supp.map(_.getLong(1)).sum / supp.length >
      part.map(_.getLong(1)).sum / part.length)
  }

  test("win_value: full-frame values consistent within each customer") {
    val rows = RelationalOps.windowValueFuncs(spark, sf).collect()
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      // first/last/second are frame-constant across the partition
      assert(rs.map(_.getDouble(2)).distinct.length === 1)
      assert(rs.map(_.getDouble(3)).distinct.length === 1)
      if (rs.length == 1) assert(rs.head.isNullAt(4), "nth_value(2) on 1 row")
      val cds = rs.map(_.getDouble(5))
      assert(cds.max === 1.0) // the max-price row always has cume_dist 1
      assert(cds.forall(c => c > 0.0 && c <= 1.0))
    }
  }

  test("incr_agg: merge of history+delta partials equals full recompute") {
    import graft.util.Num._
    val full = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val incr = RelationalOps.incrAgg(spark, sf).collect()
    assert(incr.length === full.size)
    incr.foreach { r =>
      val (n, rev) = full(r.getLong(0))
      assert(r.getLong(1) === n && r.getDouble(2) === rev)
    }
  }

  test("sample_importance: saturated docs always kept, short docs thinned") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val longDocs = docs.filter(col("n_chars") >= 2000).count()
    val out = PipelineOps.sampleImportance(spark, sf)
    assert(out.filter(col("thr") === 65536L).count() === longDocs)
    val shortTotal = docs.filter(col("n_chars") < 1000).count()
    val shortKept = out.filter(col("n_chars") < 1000).count()
    assert(shortKept < shortTotal, "importance sampling must thin short docs")
  }
}

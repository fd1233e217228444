package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range-join semantics, pinned against the naive non-equi
  * form Catalyst plans as a nested loop: binning is an EXECUTION
  * strategy, never a semantics change. Plan-shape pins prove the
  * binned form actually escapes BroadcastNestedLoopJoin/Cartesian —
  * the whole point of the operator at 100 TB.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("range-join-spec", "4")
  val sf = "/root/testdata/sf0.001"

  private def events = graft.sources.Tables.events(spark, sf)

  test("pointInInterval ≡ naive containment join, boundaries half-open") {
    val inc = events.filter(col("event_type") === "error")
      .select(col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"),
        col("event_id").as("inc_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("ts"), col("event_id").as("p_id"))
    val binned = RangeJoinOps.pointInInterval(p, "ts", inc, "lo", "hi", 900.0)
      .select("p_id", "inc_id")
    val naive = p.join(inc, p("ts") >= inc("lo") && p("ts") < inc("hi"))
      .select("p_id", "inc_id")
    assert(binned.count() > 0, "fixture produced no pairs")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "binned point-in-interval diverged from the naive join")
  }

  test("pointInInterval boundary rows: lo inclusive, hi exclusive, nulls drop") {
    import spark.implicits._
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, 15.0), (4L, Double.NaN))
      .toDF("pid", "t")
      .withColumn("t", when(col("pid") === 4L, lit(null)).otherwise(col("t")))
    val ivs = Seq((100L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", 7.0)
      .select("pid").as[Long].collect().sorted
    // t=10 at lo -> in; t=20 at hi -> out (half-open); t=15 in; null -> dropped
    assert(got === Array(1L, 3L), s"boundary semantics broken: ${got.toSeq}")
  }

  test("pointInInterval bins floor (not truncate) on negative domains") {
    import spark.implicits._
    // points at -0.5 and -7.5 against interval [-8, -0.2): truncation
    // toward zero would put -0.5 and +0.5 in the same bin and misplace
    // every negative interval end; floor keeps the grid aligned
    val pts = Seq((1L, -0.5), (2L, -7.5), (3L, -0.1), (4L, 0.5)).toDF("pid", "t")
    val ivs = Seq((9L, -8.0, -0.2)).toDF("iid", "lo", "hi")
    val got = RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", 2.0)
      .select("pid").as[Long].collect().sorted
    assert(got === Array(1L, 2L), s"negative-domain binning broken: ${got.toSeq}")
  }

  test("intervalOverlap ≡ naive overlap join, exactly once per pair across many bins") {
    import spark.implicits._
    // long intervals spanning MANY bins force the canonical-bin dedup
    // to do real work: [0,100) shares 25+ bins with [50,150) at w=4
    val a = Seq((1L, 0.0, 100.0), (2L, 120.0, 130.0), (3L, 200.0, 300.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 50.0, 150.0), (11L, 99.0, 100.5), (12L, 100.0, 101.0),
      (13L, 299.0, 310.0), (14L, 400.0, 401.0))
      .toDF("bid", "blo", "bhi")
    val binned = RangeJoinOps.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 4.0)
      .select("aid", "bid")
    val naive = a.join(b, a("alo") < b("bhi") && b("blo") < a("ahi"))
      .select("aid", "bid")
    val got = binned.as[(Long, Long)].collect().sorted.toSeq
    val want = naive.as[(Long, Long)].collect().sorted.toSeq
    assert(got === want, s"overlap diverged: binned=$got naive=$want")
    // the multiset equality above already proves no duplicates, but be
    // explicit: (1,10) spans ~13 shared bins and appears exactly once
    assert(got.count(_ == (1L, 10L)) === 1, "canonical-bin dedup failed")
    // half-open: [2]:[120,130) does NOT overlap [12]:[100,101); and a
    // touching pair ([1]:[0,100) vs [12]:[100,101)) is NOT an overlap
    assert(!got.contains((1L, 12L)), "touching intervals must not overlap (half-open)")
  }

  test("intervalOverlap on the events fixture ≡ naive, with timestamps") {
    val err = events.filter(col("event_type") === "error")
      .select(col("ts").as("elo"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("ehi"),
        col("event_id").as("eid"))
    val clk = events.filter(col("event_type") === "click")
      .select(col("ts").as("clo"),
        (col("ts") + expr("INTERVAL 3 MINUTES")).as("chi"),
        col("event_id").as("cid"))
    val binned = RangeJoinOps.intervalOverlap(
      err, "elo", "ehi", clk, "clo", "chi", 300.0).select("eid", "cid")
    val naive = err.join(clk,
      err("elo") < clk("chi") && clk("clo") < err("ehi")).select("eid", "cid")
    assert(binned.count() > 0, "fixture produced no overlaps")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "binned overlap diverged from naive on timestamps")
  }

  test("equi-keys restrict matches on both ops") {
    import spark.implicits._
    val pts = Seq(("u1", 5.0, 1L), ("u2", 5.0, 2L)).toDF("pu", "t", "pid")
    val ivs = Seq(("u1", 0.0, 10.0, 100L)).toDF("iu", "lo", "hi", "iid")
    val got = RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", 5.0,
      keys = Seq("pu" -> "iu")).select("pid").as[Long].collect()
    assert(got.toSeq === Seq(1L), "key restriction lost on pointInInterval")
    val a = Seq(("u1", 0.0, 10.0, 1L), ("u2", 0.0, 10.0, 2L)).toDF("au", "alo", "ahi", "aid")
    val b = Seq(("u1", 5.0, 15.0, 10L)).toDF("bu", "blo", "bhi", "bid")
    val got2 = RangeJoinOps.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 5.0,
      keys = Seq("au" -> "bu")).select("aid").as[Long].collect()
    assert(got2.toSeq === Seq(1L), "key restriction lost on intervalOverlap")
  }

  test("pointInIntervalOuter: null-emission pinned both ways") {
    import spark.implicits._
    val pts = Seq((1L, 10.0), (2L, 50.0), (3L, 15.0)).toDF("pid", "t")
    val ivs = Seq((100L, 10.0, 20.0), (200L, 14.0, 16.0)).toDF("iid", "lo", "hi")
    val got = RangeJoinOps.pointInIntervalOuter(pts, "t", ivs, "lo", "hi", 7.0)
      .select(col("pid"), col("iid"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    // pid=2 has NO covering interval → exactly ONE null row; pid=3 is
    // covered twice → two rows and NO null row; pid=1 once
    assert(got === Seq((1L, Some(100L)), (2L, None),
      (3L, Some(100L)), (3L, Some(200L))),
      s"outer point-in-interval semantics broken: $got")
    // and ≡ the naive LEFT OUTER band join on the events fixture
    val inc = events.filter(col("event_type") === "error")
      .select(col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"),
        col("event_id").as("inc_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("ts"), col("event_id").as("p_id"))
    val binned = RangeJoinOps.pointInIntervalOuter(p, "ts", inc, "lo", "hi", 900.0)
      .select("p_id", "inc_id")
    val naive = p.join(inc, p("ts") >= inc("lo") && p("ts") < inc("hi"), "left_outer")
      .select("p_id", "inc_id")
    assert(binned.where(col("inc_id").isNull).count() > 0,
      "fixture has no windowless purchases — outer case not exercised")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "binned outer point-in-interval diverged from the naive LEFT JOIN")
    // the outer form must still be nested-loop-free
    val plan = binned.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"outer grid join planned a nested loop:\n$plan")
  }

  test("intervalOverlapOuter: unmatched left intervals add back exactly once") {
    import spark.implicits._
    // [0,100) spans 25 bins at w=4 — a naive LEFT OUTER grid join
    // would emit ~25 null rows for it were it unmatched, and spurious
    // null rows even when matched; the add-back must emit exactly one
    val a = Seq((1L, 0.0, 100.0), (2L, 160.0, 170.0), (3L, 200.0, 300.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 50.0, 150.0), (13L, 299.0, 310.0)).toDF("bid", "blo", "bhi")
    val got = RangeJoinOps.intervalOverlapOuter(a, "alo", "ahi", b, "blo", "bhi", 4.0)
      .select(col("aid"), col("bid"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    // aid=1 overlaps 10 (once, despite ~13 shared bins); aid=2
    // overlaps nothing → one null row; aid=3 overlaps 13
    assert(got === Seq((1L, Some(10L)), (2L, None), (3L, Some(13L))),
      s"outer overlap semantics broken: $got")
    val naive = a.join(b, a("alo") < b("bhi") && b("blo") < a("ahi"), "left_outer")
      .select(col("aid"), col("bid"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    assert(got === naive, "outer overlap diverged from the naive LEFT JOIN")
    graft.operators.DedupOps.releaseTransients(spark)
  }

  test("keyed hot key: candidates split across bins instead of a per-key quadratic") {
    import spark.implicits._
    // ONE key owns every row — the shape where a hash join on the key
    // alone degenerates: every point × every interval of that key
    // meets in a single task before the range filter (n² candidates).
    // Joining on (key, bin) caps candidates at pairs SHARING A GRID
    // CELL: same result, ~n·(len/w+1) candidate pairs spread over the
    // key's time bins.
    val n = 400
    val pts = (0 until n).map(i => ("hot", i * 10.0 + 0.5, i.toLong)).toDF("pu", "t", "pid")
    val ivs = (0 until n).map(i => ("hot", i * 10.0, i * 10.0 + 10.0, i.toLong))
      .toDF("iu", "lo", "hi", "iid")
    val keyed = RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", 10.0,
      keys = Seq("pu" -> "iu"))
    val got = keyed.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    // every point lands in exactly its own interval
    assert(got === (0L until n.toLong).map(i => (i, i)),
      "keyed binned join lost or invented matches")
    // candidate-count evidence: key-only equi join = n² pre-residual
    // pairs; (key, bin) equi join = one bin probe per point. The 100×+
    // gap is what the rewrite buys on a hot key.
    val naiveCand = pts.join(ivs, pts("pu") === ivs("iu")).count()
    val binnedCand = pts.withColumn("b", floor(col("t") / 10.0))
      .join(ivs.withColumn("b", floor(col("lo") / 10.0)), Seq("b"))
      .where(col("pu") === col("iu")).count()
    assert(naiveCand === n.toLong * n, s"fixture drifted: $naiveCand")
    assert(binnedCand <= 2L * n,
      s"binned candidate set should be ~n, got $binnedCand vs naive $naiveCand")
  }

  test("pointInBox ≡ naive 2-D containment join, plan stays an equi-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100))
      .toDF("pid", "x", "y")
    val boxes = (1 to 60).map { i =>
      val (xlo, ylo) = (rnd.nextDouble() * 180 - 100, rnd.nextDouble() * 180 - 100)
      (1000L + i, xlo, xlo + rnd.nextDouble() * 40,
        ylo, ylo + rnd.nextDouble() * 40)
    }.toDF("bid", "xlo", "xhi", "ylo", "yhi")
    val binned = RangeJoinOps.pointInBox(pts, "x", "y",
        boxes, "xlo", "xhi", "ylo", "yhi", 25.0, 25.0)
      .select("pid", "bid").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.join(boxes,
        pts("x") >= boxes("xlo") && pts("x") < boxes("xhi") &&
          pts("y") >= boxes("ylo") && pts("y") < boxes("yhi"))
      .select("pid", "bid").as[(Long, Long)].collect().sorted.toSeq
    assert(binned.nonEmpty, "fixture produced no containments")
    assert(binned === naive, "2-D binned join diverged from the naive box join")
    // plan: equi-join on the (bx, by) cell, never a nested loop
    val plan = RangeJoinOps.pointInBox(pts, "x", "y",
        boxes, "xlo", "xhi", "ylo", "yhi", 25.0, 25.0)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"2-D binned join planned a nested loop:\n$plan")
    // keyed restriction composes in 2-D as well
    val kp = Seq(("a", 5.0, 5.0, 1L), ("b", 5.0, 5.0, 2L)).toDF("pu", "x", "y", "pid")
    val kb = Seq(("a", 0.0, 10.0, 0.0, 10.0, 9L)).toDF("bu", "xlo", "xhi", "ylo", "yhi", "bid")
    val got = RangeJoinOps.pointInBox(kp, "x", "y", kb,
        "xlo", "xhi", "ylo", "yhi", 10.0, 10.0, keys = Seq("pu" -> "bu"))
      .select("pid").as[Long].collect().toSeq
    assert(got === Seq(1L), "key restriction lost on pointInBox")
    // LEFT OUTER: uncontained points surface exactly once, nulls in
    val outer = RangeJoinOps.pointInBoxOuter(pts, "x", "y",
        boxes, "xlo", "xhi", "ylo", "yhi", 25.0, 25.0)
      .select("pid", "bid").as[(Long, Option[Long])].collect().sorted.toSeq
    val naiveOuter = pts.join(boxes,
        pts("x") >= boxes("xlo") && pts("x") < boxes("xhi") &&
          pts("y") >= boxes("ylo") && pts("y") < boxes("yhi"), "left_outer")
      .select("pid", "bid").as[(Long, Option[Long])].collect().sorted.toSeq
    assert(outer.exists(_._2.isEmpty), "fixture has no uncontained points")
    assert(outer === naiveOuter, "outer 2-D join diverged from the naive LEFT JOIN")
  }

  test("runaway-interval guard fails the query instead of exploding") {
    import spark.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "t")
    val ivs = Seq((9L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", 1.0,
        maxBinsPerInterval = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("raise binWidth")),
      s"guard error not surfaced: ${ex.getMessage}")
    intercept[IllegalArgumentException] {
      RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", -1.0)
    }
  }

  test("reversed intervals (lo > hi) match nothing — no descending bins, no raise") {
    import spark.implicits._
    // a mildly reversed interval, an EXTREME reversed bound (would be a
    // giant descending sequence without the guard — Spark's generic
    // "sequence too long" instead of zero rows), and a healthy control.
    // The guard must neither raise nor multiply candidate work: reversed
    // rows register in NO bins (naive semantics: they match nothing).
    val pts = Seq((1L, 5.0), (2L, 50.0)).toDF("pid", "t")
    val ivs = Seq(
      (9L, 10.0, 0.0),      // reversed: would cover bins 10..0 descending
      (8L, 1e12, -1e12),    // extreme reversed: huge negative span
      (7L, 0.0, 100.0))     // control: matches both points
      .toDF("iid", "lo", "hi")
    val got = RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", 1.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 7L), (2L, 7L)),
      s"reversed-interval rows leaked or control lost: $got")
    // same guard on the overlap form (both sides explode there)
    val left = Seq((1L, 0.0, 10.0)).toDF("alo_id", "alo", "ahi")
    val rev = Seq((2L, 1e12, -1e12), (3L, 5.0, 6.0)).toDF("bid", "blo", "bhi")
    val ov = RangeJoinOps.intervalOverlap(left, "alo", "ahi", rev, "blo", "bhi", 2.0)
      .select("bid").as[Long].collect().toSeq
    assert(ov === Seq(3L), s"reversed interval leaked through overlap: $ov")
  }

  test("property: binned ≡ naive across random intervals, widths, and signs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    (1 to 4).foreach { trial =>
      // intervals with wildly mixed lengths (0.1 .. ~60 units) on a
      // signed domain, so single-bin, many-bin, and negative cases mix
      val ivs = (1 to 60).map { i =>
        val lo = rnd.nextDouble() * 200 - 100
        (i.toLong, lo, lo + math.pow(10, rnd.nextDouble() * 3 - 1) * 0.6)
      }.toDF("iid", "lo", "hi")
      val pts = (1 to 150).map(i => (i.toLong, rnd.nextDouble() * 220 - 110))
        .toDF("pid", "t")
      val w = Seq(0.5, 3.0, 25.0, 500.0)(trial - 1) // tiny .. one-giant-bin
      val b = RangeJoinOps.pointInInterval(pts, "t", ivs, "lo", "hi", w,
        maxBinsPerInterval = 100000).select("pid", "iid")
        .as[(Long, Long)].collect().sorted.toSeq
      val n = pts.join(ivs, pts("t") >= ivs("lo") && pts("t") < ivs("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(b === n, s"trial $trial (w=$w): point-in-interval diverged")
      val ivs2 = (1 to 50).map { i =>
        val lo = rnd.nextDouble() * 200 - 100
        (i.toLong, lo, lo + math.pow(10, rnd.nextDouble() * 3 - 1) * 0.6)
      }.toDF("bid", "blo", "bhi")
      val a2 = ivs.select(col("iid").as("aid"), col("lo").as("alo"), col("hi").as("ahi"))
      val b2 = RangeJoinOps.intervalOverlap(a2, "alo", "ahi", ivs2, "blo", "bhi", w,
        maxBinsPerInterval = 100000).select("aid", "bid")
        .as[(Long, Long)].collect().sorted.toSeq
      val n2 = a2.join(ivs2, a2("alo") < ivs2("bhi") && ivs2("blo") < a2("ahi"))
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      assert(b2 === n2, s"trial $trial (w=$w): interval-overlap diverged")
    }
  }

  test("plan shape: equi-join on the bin id, never a nested loop") {
    // default session: whatever Catalyst picks must not be BNLJ/cartesian
    val inc = events.filter(col("event_type") === "error")
      .select(col("ts").as("lo"), (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"))
    val p = events.filter(col("event_type") === "purchase").select(col("ts"))
    val plan = RangeJoinOps.pointInInterval(p, "ts", inc, "lo", "hi", 900.0)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned join planned a nested loop:\n$plan")
    // and with broadcast disabled (the 100 TB shape: neither side
    // small), it must become a co-partitioned SortMergeJoin on the bin
    val child = spark.newSession()
    child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val inc2 = graft.sources.Tables.events(child, sf)
      .filter(col("event_type") === "error")
      .select(col("ts").as("lo"), (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"))
    val p2 = graft.sources.Tables.events(child, sf)
      .filter(col("event_type") === "purchase").select(col("ts"))
    val plan2 = RangeJoinOps.pointInInterval(p2, "ts", inc2, "lo", "hi", 900.0)
      .queryExecution.executedPlan.toString()
    assert(plan2.contains("SortMergeJoin") &&
      !plan2.contains("BroadcastNestedLoopJoin") && !plan2.contains("CartesianProduct"),
      s"no-broadcast shape did not plan SMJ on the bin id:\n$plan2")
    // the naive form of the SAME query really is a nested loop — the
    // negative control that the claim distinguishes anything
    val naive = p2.join(inc2, p2("ts") >= inc2("lo") && p2("ts") < inc2("hi"))
      .queryExecution.executedPlan.toString()
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"),
      s"negative control: naive non-equi join did not plan a nested loop:\n$naive")
  }
}

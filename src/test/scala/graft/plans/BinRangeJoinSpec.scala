package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RANGE_BIN hint: pure-SQL access to the binned range join. The
  * rule lives in the analyzer's resolution slot, so these pins run on
  * a GraftSession (extensions installed at build time) and assert
  * through the EXECUTED plan — rewrite evidence is the absence of
  * BroadcastNestedLoopJoin on a query whose un-hinted twin plans
  * exactly that.
  *
  * The hint PICKS by stats (a broadcast-sized side keeps the nested
  * loop — no explode needed when the scan side is small), so the
  * rewrite pins run on a CHILD session with
  * `autoBroadcastJoinThreshold=-1` (the big-big shape, where the grid
  * form is the only non-quadratic plan); the pick itself is dialed
  * both ways in its own test. Child sessions also keep the shared
  * test-JVM session's conf untouched.
  */
class BinRangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("bin-range-hint-spec", "4")
  /** Big-big shape: no side broadcastable, the rewrite always fires. */
  lazy val forced: SparkSession = {
    val c = spark.newSession()
    c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    c
  }
  val sf = "/root/testdata/sf0.001"

  private def prepViews(s: SparkSession): Unit = {
    val ev = graft.sources.Tables.events(s, sf)
    ev.filter(col("event_type") === "error")
      .select(col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"),
        col("event_id").as("inc_id"), col("user_id").as("i_uid"))
      .createOrReplaceTempView("brj_inc")
    ev.filter(col("event_type") === "purchase")
      .select(col("ts"), col("event_id").as("p_id"), col("user_id"), col("value"))
      .createOrReplaceTempView("brj_p")
  }

  test("hinted band join ≡ un-hinted, and escapes the nested loop") {
    prepViews(forced)
    val hinted = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val naive = forced.sql(
      """SELECT p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val hp = hinted.queryExecution.executedPlan.toString()
    val np = naive.queryExecution.executedPlan.toString()
    assert(!hp.contains("BroadcastNestedLoopJoin") && !hp.contains("CartesianProduct"),
      s"hint did not rewrite the band join:\n$hp")
    assert(np.contains("BroadcastNestedLoopJoin") || np.contains("CartesianProduct"),
      s"negative control: un-hinted band join should be a nested loop:\n$np")
    assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
      "hint changed the result")
    assert(hinted.count() > 0, "fixture produced no pairs")
    // point side must not pay a Generate (degenerate [t, t] interval)
    assert(hp.sliding("Generate".length).count(_ == "Generate") >= 1)
    val analyzedGenerates = hinted.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(analyzedGenerates.length === 1,
      s"expected exactly one explode (intervals side only): $analyzedGenerates")
  }

  test("overlap-shaped hint rewrites and matches the naive overlap join") {
    val ev = graft.sources.Tables.events(forced, sf)
    ev.filter(col("event_type") === "error")
      .select(col("ts").as("elo"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("ehi"),
        col("event_id").as("eid"))
      .createOrReplaceTempView("brj_e")
    ev.filter(col("event_type") === "click")
      .select(col("ts").as("clo"),
        (col("ts") + expr("INTERVAL 3 MINUTES")).as("chi"),
        col("event_id").as("cid"))
      .createOrReplaceTempView("brj_c")
    val hinted = forced.sql(
      """SELECT /*+ RANGE_BIN(300) */ eid, cid
         FROM brj_e e JOIN brj_c c ON e.elo < c.chi AND c.clo < e.ehi""")
    val naive = forced.sql(
      """SELECT eid, cid
         FROM brj_e e JOIN brj_c c ON e.elo < c.chi AND c.clo < e.ehi""")
    val hp = hinted.queryExecution.executedPlan.toString()
    assert(!hp.contains("BroadcastNestedLoopJoin") && !hp.contains("CartesianProduct"),
      s"hint did not rewrite the overlap join:\n$hp")
    assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
      "hint changed the overlap result")
    assert(hinted.count() > 0, "fixture produced no overlaps")
  }

  test("keyed band join composes the equi key WITH the bin id") {
    prepViews(forced)
    val hinted = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i
           ON p.user_id = i.i_uid AND p.ts >= i.lo AND p.ts < i.hi""")
    val naive = forced.sql(
      """SELECT p_id, inc_id
         FROM brj_p p JOIN brj_inc i
           ON p.user_id = i.i_uid AND p.ts >= i.lo AND p.ts < i.hi""")
    val hp = hinted.queryExecution.executedPlan.toString()
    assert(!hp.contains("BroadcastNestedLoopJoin") && !hp.contains("CartesianProduct"),
      s"keyed band join not rewritten:\n$hp")
    assert(hp.contains("__graft_bin"), s"bin id not in the executed join:\n$hp")
    // the equi key must ride NEXT TO the bin in the hash/merge join
    // keys — ExtractEquiJoinKeys lifts it from the residual. The plan
    // prints join keys as [user_id#… , __graft_bin#…]; both names
    // must appear inside the same join operator line.
    val joinLine = hp.linesIterator.find(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joinLine.exists(l => l.contains("user_id") && l.contains("__graft_bin")),
      s"equi key and bin id not co-located in the join keys:\n$hp")
    assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
      "keyed rewrite changed the result")
    assert(hinted.count() > 0, "keyed fixture produced no pairs")
  }

  test("stats-driven pick: tiny side declines, bnl cap bounds it, threshold=-1 forces") {
    // 1) a genuinely tiny side (4-row VALUES dim) under DEFAULT confs
    //    → decline: the nested loop's per-probe scan is 4 comparisons
    val keep = spark.newSession()
    prepViews(keep)
    val tiers = """(VALUES ('lo', 0.0, 100.0), ('hi', 100.0, 1e12)) t(tier, lo, hi)"""
    val kept = keep.sql(
      s"""SELECT /*+ RANGE_BIN(100) */ p_id, t.tier
         FROM brj_p p JOIN $tiers ON p.value >= t.lo AND p.value < t.hi""")
    val kp = kept.queryExecution.executedPlan.toString()
    assert(kp.contains("BroadcastNestedLoopJoin") && !kp.contains("__graft_bin"),
      s"tiny dim side should keep the nested loop (no explode):\n$kp")
    val keptRows = kept.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val naiveRows = keep.sql(
      s"""SELECT p_id, t.tier
         FROM brj_p p JOIN $tiers ON p.value >= t.lo AND p.value < t.hi""")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(keptRows.nonEmpty && keptRows === naiveRows, "decline changed the result")
    // 2) the bnl cap — not the broadcast threshold — is the binding
    //    bound: the fixture's interval side fits the 10 MB broadcast
    //    threshold comfortably, but nested-loop work is |L|·|R|
    //    (measured 10.2 s BNLJ vs 0.6 s binned at sf1), so once the
    //    side exceeds the cap the hint must rewrite even though a
    //    broadcast would fit. Dialed by shrinking the cap below the
    //    fixture side's size.
    val capDown = spark.newSession()
    capDown.conf.set("spark.graft.rangeBin.bnlThreshold", "1024")
    prepViews(capDown)
    val mbSide = capDown.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val mp = mbSide.queryExecution.executedPlan.toString()
    assert(mp.contains("__graft_bin") && !mp.contains("BroadcastNestedLoopJoin"),
      s"a fits-in-broadcast side above the bnl cap must still bin:\n$mp")
    // ...unless the user raises the cap and opts into the nested loop
    val capUp = spark.newSession()
    capUp.conf.set("spark.graft.rangeBin.bnlThreshold", (1L << 30).toString)
    prepViews(capUp)
    val opted = capUp.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val op = opted.queryExecution.executedPlan.toString()
    assert(op.contains("BroadcastNestedLoopJoin") && !op.contains("__graft_bin"),
      s"raised bnl cap should keep the nested loop:\n$op")
    // 3) threshold=-1 forces the grid regardless (the big-big shape)
    prepViews(forced)
    val rewritten = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val rp = rewritten.queryExecution.executedPlan.toString()
    assert(rp.contains("__graft_bin") && !rp.contains("BroadcastNestedLoopJoin"),
      s"threshold=-1 must force the grid form:\n$rp")
    // and the pick never changes results across the dial positions
    val a = opted.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b, "stats pick changed the result")
  }

  test("LEFT OUTER band join rewrites in the point orientation, declines interval-left") {
    prepViews(forced)
    val hinted = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p LEFT JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val naive = forced.sql(
      """SELECT p_id, inc_id
         FROM brj_p p LEFT JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    val hp = hinted.queryExecution.executedPlan.toString()
    assert(hp.contains("__graft_bin") && !hp.contains("BroadcastNestedLoopJoin"),
      s"LEFT OUTER point-orientation band join not rewritten:\n$hp")
    assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
      "LEFT OUTER rewrite changed the result")
    // the outer contract itself: windowless purchases survive as nulls
    assert(hinted.filter(col("inc_id").isNull).count() > 0,
      "fixture has no windowless purchases — outer case not exercised")
    // keyed LEFT OUTER composes too
    val keyed = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p LEFT JOIN brj_inc i
           ON p.user_id = i.i_uid AND p.ts >= i.lo AND p.ts < i.hi""")
    val keyedNaive = forced.sql(
      """SELECT p_id, inc_id
         FROM brj_p p LEFT JOIN brj_inc i
           ON p.user_id = i.i_uid AND p.ts >= i.lo AND p.ts < i.hi""")
    assert(keyed.queryExecution.executedPlan.toString().contains("__graft_bin"),
      "keyed LEFT OUTER band join not rewritten")
    assert(keyed.exceptAll(keyedNaive).isEmpty && keyedNaive.exceptAll(keyed).isEmpty,
      "keyed LEFT OUTER rewrite changed the result")
    // interval-shaped LEFT side under LEFT OUTER → not rewritable in
    // place (the add-back pass can't hide behind an analyzer hint)
    val intervalLeft = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_inc i LEFT JOIN brj_p p ON p.ts >= i.lo AND p.ts < i.hi""")
    assert(!intervalLeft.queryExecution.executedPlan.toString().contains("__graft_bin"),
      "interval-left LEFT OUTER must decline the rewrite")
  }

  test("band with an equality but no lower bound still declines (not a band)") {
    prepViews(forced)
    // p.ts = i.lo is an equi conjunct (a join KEY, not a bound); the
    // remaining p.ts < i.hi gives an upper bound only → no band → the
    // join is left alone (and the equi key already hash-joins fine)
    val equi = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts = i.lo AND p.ts < i.hi""")
    val ep = equi.queryExecution.executedPlan.toString()
    assert(!ep.contains("__graft_bin"), s"half-band was rewritten:\n$ep")
    // no join at all → hint dropped with a warning, query still runs
    val nojoin = forced.sql("SELECT /*+ RANGE_BIN(900) */ count(*) AS n FROM brj_p")
    assert(nojoin.head().getLong(0) > 0)
  }

  test("malformed width fails analysis loudly") {
    prepViews(forced)
    val e = intercept[Exception] {
      forced.sql(
        """SELECT /*+ RANGE_BIN(0) */ p_id, inc_id
           FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("width must be positive")),
      s"unexpected error: ${e.getMessage}")
  }

  test("BETWEEN surface rewrites too (parser lowers it to the two conjuncts)") {
    prepViews(forced)
    val hinted = forced.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts BETWEEN i.lo AND i.hi""")
    val naive = forced.sql(
      """SELECT p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts BETWEEN i.lo AND i.hi""")
    val hp = hinted.queryExecution.executedPlan.toString()
    assert(!hp.contains("BroadcastNestedLoopJoin") && !hp.contains("CartesianProduct"),
      s"BETWEEN band join not rewritten:\n$hp")
    assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
      "BETWEEN rewrite changed the result")
  }

  test("property: hint ≡ naive across operators, orientations, keys, and join types") {
    import forced.implicits._
    val rnd = new scala.util.Random(41)
    val users = Seq("u1", "u2", "u3")
    val pts = (1 to 120).map(i =>
      (i.toLong, users(rnd.nextInt(3)), rnd.nextDouble() * 200 - 100))
      .toDF("pid", "pu", "t")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 200 - 100
      (100L + i, users(rnd.nextInt(3)), lo, lo + rnd.nextDouble() * 30)
    }.toDF("iid", "iu", "lo", "hi")
    pts.createOrReplaceTempView("brj_pp")
    ivs.createOrReplaceTempView("brj_pi")
    // every combination of: bound strictness, operand orientation
    // (point side written left or right of each comparison), equi key
    // present or not, INNER or LEFT JOIN — the classifier must
    // normalize all of them to the same band
    val conds = Seq(
      "p.t >= i.lo AND p.t < i.hi",
      "i.lo <= p.t AND i.hi > p.t",
      "p.t > i.lo AND p.t <= i.hi",
      "p.t BETWEEN i.lo AND i.hi")
    for (cond <- conds; keyed <- Seq(false, true); outer <- Seq(false, true)) {
      val key = if (keyed) "p.pu = i.iu AND " else ""
      val jt = if (outer) "LEFT JOIN" else "JOIN"
      val q = s"FROM brj_pp p $jt brj_pi i ON $key$cond"
      val hinted = forced.sql(s"SELECT /*+ RANGE_BIN(7) */ pid, iid $q")
      val naive = forced.sql(s"SELECT pid, iid $q")
      val label = s"cond='$cond' keyed=$keyed outer=$outer"
      assert(hinted.queryExecution.executedPlan.toString().contains("__graft_bin"),
        s"$label: hint did not rewrite")
      assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
        s"$label: hint changed the result")
    }
  }

  test("RANGE_BIN2: 2-D box join rewrites to the (bx, by) grid, both orientations") {
    import forced.implicits._
    val rnd = new scala.util.Random(43)
    (1 to 150).map(i =>
      (i.toLong, rnd.nextDouble() * 1000, rnd.nextDouble() * 400 - 200))
      .toDF("pid", "x", "y").createOrReplaceTempView("brj2_p")
    (1 to 40).map { i =>
      val (xlo, ylo) = (rnd.nextDouble() * 1000, rnd.nextDouble() * 400 - 200)
      (1000L + i, xlo, xlo + 80, ylo, ylo + 40)
    }.toDF("bid", "xlo", "xhi", "ylo", "yhi").createOrReplaceTempView("brj2_b")
    val cond = "p.x >= b.xlo AND p.x < b.xhi AND p.y >= b.ylo AND p.y < b.yhi"
    val hinted = forced.sql(
      s"SELECT /*+ RANGE_BIN2(80, 40) */ pid, bid FROM brj2_p p JOIN brj2_b b ON $cond")
    val naive = forced.sql(s"SELECT pid, bid FROM brj2_p p JOIN brj2_b b ON $cond")
    val hp = hinted.queryExecution.executedPlan.toString()
    val np = naive.queryExecution.executedPlan.toString()
    assert(hp.contains("__graft_bx") && hp.contains("__graft_by") &&
      !hp.contains("BroadcastNestedLoopJoin") && !hp.contains("CartesianProduct"),
      s"RANGE_BIN2 did not rewrite to the 2-D grid:\n$hp")
    assert(np.contains("BroadcastNestedLoopJoin") || np.contains("CartesianProduct"),
      s"negative control: un-hinted box join should nested-loop:\n$np")
    assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
      "RANGE_BIN2 changed the result")
    assert(hinted.count() > 0, "box fixture produced no matches")
    // ≡ the DataFrame API
    val api = graft.operators.RangeJoinOps.pointInBox(
      forced.table("brj2_p"), "x", "y",
      forced.table("brj2_b"), "xlo", "xhi", "ylo", "yhi", 80.0, 40.0)
      .select("pid", "bid")
    assert(hinted.exceptAll(api).isEmpty && api.exceptAll(hinted).isEmpty,
      "hint and pointInBox disagree")
    // point side written on the RIGHT of the join still classifies
    val flipped = forced.sql(
      s"SELECT /*+ RANGE_BIN2(80, 40) */ pid, bid FROM brj2_b b JOIN brj2_p p ON $cond")
    assert(flipped.queryExecution.executedPlan.toString().contains("__graft_bx"),
      "point-on-right orientation not rewritten")
    assert(flipped.exceptAll(naive).isEmpty && naive.exceptAll(flipped).isEmpty,
      "flipped orientation changed the result")
    // LEFT OUTER: point-left rewrites and keeps boxless points; the
    // interval-shaped left declines (no add-back behind a hint)
    val outer = forced.sql(
      s"SELECT /*+ RANGE_BIN2(80, 40) */ pid, bid FROM brj2_p p LEFT JOIN brj2_b b ON $cond")
    val outerNaive = forced.sql(
      s"SELECT pid, bid FROM brj2_p p LEFT JOIN brj2_b b ON $cond")
    assert(outer.queryExecution.executedPlan.toString().contains("__graft_bx"),
      "LEFT OUTER point-left 2-D join not rewritten")
    assert(outer.exceptAll(outerNaive).isEmpty && outerNaive.exceptAll(outer).isEmpty,
      "LEFT OUTER 2-D rewrite changed the result")
    assert(outer.filter(col("bid").isNull).count() > 0,
      "fixture has no boxless points — outer case not exercised")
    val outerFlipped = forced.sql(
      s"SELECT /*+ RANGE_BIN2(80, 40) */ pid, bid FROM brj2_b b LEFT JOIN brj2_p p ON $cond")
    assert(!outerFlipped.queryExecution.executedPlan.toString().contains("__graft_bx"),
      "interval-left LEFT OUTER must decline the 2-D rewrite")
    // a 1-D condition under RANGE_BIN2 declines (hint dropped, query runs)
    val oneDim = forced.sql(
      """SELECT /*+ RANGE_BIN2(80, 40) */ pid, bid
         FROM brj2_p p JOIN brj2_b b ON p.x >= b.xlo AND p.x < b.xhi""")
    assert(!oneDim.queryExecution.executedPlan.toString().contains("__graft_bx"),
      "single-dim condition must decline RANGE_BIN2")
    assert(oneDim.count() > 0)
    // malformed arity fails analysis loudly
    val e = intercept[Exception] {
      forced.sql(
        s"SELECT /*+ RANGE_BIN2(80) */ pid, bid FROM brj2_p p JOIN brj2_b b ON $cond")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("RANGE_BIN2(wx, wy")),
      s"unexpected error: ${e.getMessage}")
  }

  test("property: RANGE_BIN2 ≡ naive across strictness, keys, and join types") {
    import forced.implicits._
    val rnd = new scala.util.Random(47)
    val users = Seq("u1", "u2", "u3")
    (1 to 120).map(i => (i.toLong, users(rnd.nextInt(3)),
        rnd.nextDouble() * 300, rnd.nextDouble() * 100 - 50))
      .toDF("pid", "pu", "x", "y").createOrReplaceTempView("brj2p_p")
    (1 to 30).map { i =>
      val (xlo, ylo) = (rnd.nextDouble() * 300, rnd.nextDouble() * 100 - 50)
      (500L + i, users(rnd.nextInt(3)), xlo, xlo + 40, ylo, ylo + 15)
    }.toDF("bid", "bu", "xlo", "xhi", "ylo", "yhi")
      .createOrReplaceTempView("brj2p_b")
    val xConds = Seq(
      "p.x >= b.xlo AND p.x < b.xhi",
      "b.xlo <= p.x AND b.xhi > p.x",
      "p.x BETWEEN b.xlo AND b.xhi")
    val yCond = "p.y >= b.ylo AND p.y <= b.yhi"
    for (xc <- xConds; keyed <- Seq(false, true); outer <- Seq(false, true)) {
      val key = if (keyed) "p.pu = b.bu AND " else ""
      val jt = if (outer) "LEFT JOIN" else "JOIN"
      val q = s"FROM brj2p_p p $jt brj2p_b b ON $key$xc AND $yCond"
      val hinted = forced.sql(s"SELECT /*+ RANGE_BIN2(40, 15) */ pid, bid $q")
      val naive = forced.sql(s"SELECT pid, bid $q")
      val label = s"x='$xc' keyed=$keyed outer=$outer"
      assert(hinted.queryExecution.executedPlan.toString().contains("__graft_bx"),
        s"$label: RANGE_BIN2 did not rewrite")
      assert(hinted.exceptAll(naive).isEmpty && naive.exceptAll(hinted).isEmpty,
        s"$label: RANGE_BIN2 changed the result")
    }
  }

  test("a reserved __graft_ column on a side declines instead of aborting analysis") {
    import forced.implicits._
    // a view that ALREADY carries a __graft_ column (nested hint, or a
    // query over RangeJoinOps output that kept its working columns):
    // handing it to binnedIntervalJoinD would abort the whole analysis
    // on requireNoReserved — the hint must decline and leave the plain
    // join, which still answers correctly
    Seq((1L, 10.0, 5L), (2L, 99.0, 6L)).toDF("pid", "t", "__graft_bin")
      .createOrReplaceTempView("brj_rp")
    Seq((100L, 0.0, 20.0)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("brj_ri")
    val df = forced.sql(
      """SELECT /*+ RANGE_BIN(5) */ pid, iid
         FROM brj_rp p JOIN brj_ri i ON p.t >= i.lo AND p.t < i.hi""")
    // one Generate would mean the rewrite fired on reserved input
    assert(!df.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Generate]),
      "hint must decline when a side exposes __graft_ columns")
    assert(df.as[(Long, Long)].collect().toSeq === Seq((1L, 100L)))
  }

  test("bnlThreshold takes byte-suffixed values; garbage fails with the conf name") {
    val kb = spark.newSession()
    kb.conf.set("spark.graft.rangeBin.bnlThreshold", "1KB")
    prepViews(kb)
    val df = kb.sql(
      """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
         FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""")
    // "1KB" = 1024 — same dial position as the numeric capDown test,
    // so the fixture side is over the cap and the rewrite fires
    assert(df.queryExecution.executedPlan.toString().contains("__graft_bin"),
      "byte-suffixed bnlThreshold did not parse to its numeric twin")
    val bad = spark.newSession()
    bad.conf.set("spark.graft.rangeBin.bnlThreshold", "lots")
    prepViews(bad)
    val e = intercept[Exception] {
      bad.sql(
        """SELECT /*+ RANGE_BIN(900) */ p_id, inc_id
           FROM brj_p p JOIN brj_inc i ON p.ts >= i.lo AND p.ts < i.hi""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("spark.graft.rangeBin.bnlThreshold")
      && m.contains("lots")), s"unexpected error: ${e.getMessage}")
  }

  test("numeric-domain band join through the hint, DataFrame-registered views") {
    import forced.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 15.0)).toDF("pid", "t")
      .createOrReplaceTempView("brj_np")
    Seq((100L, 10.0, 20.0), (200L, 14.0, 16.0)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("brj_ni")
    val got = forced.sql(
      """SELECT /*+ RANGE_BIN(5) */ pid, iid
         FROM brj_np p JOIN brj_ni i ON p.t >= i.lo AND p.t < i.hi""")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 100L), (3L, 100L), (3L, 200L)),
      s"numeric hint join wrong: $got")
  }
}

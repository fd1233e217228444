package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-profiling and constraint-validation operators — the "is this
  * table what I think it is" utilities every warehouse grows: a
  * one-scan column profiler and a declarative DQ check suite. Both
  * return small long-format summaries (rows ∝ columns/checks, never
  * data), so their output is driver-safe at any corpus scale.
  */
object QualityOps {

  /** Exact column profiler for `orders`: per column, row count, null
    * count, exact distinct count, and min/max (numerics as double;
    * strings lexicographic — min/max are selections, not arithmetic,
    * so they're engine-exact). TWO hash-based aggregation passes
    * joined on their 1-row results, NOT one combined aggregate: the
    * multi-distinct rewrite (one Expand + partial aggregation,
    * regardless of column count) runs alone so its counts-only
    * buffers stay HashAggregate-able, and the min/max/null pass runs
    * alone as an ObjectHashAggregate. MIXING them forces the planner
    * to SortAggregate — string min/max buffers are immutable, so the
    * whole ×columns-expanded stream gets globally SORTED twice
    * (measured 3.1 s → 0.5 s at sf0.1, 17 s at 10×; the same
    * split-the-aggregate lesson as sk_distinct). Timestamps profile
    * as epoch seconds.
    */
  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("od_sec", TimeSeriesOps.epochSecExpr("o_orderdate"))
    val num = Seq("o_orderkey", "o_custkey", "o_totalprice", "od_sec")
    val str = Seq("o_orderstatus", "o_orderpriority")
    val dAggs = (num ++ str).map(c => countDistinct(col(c)).as(s"${c}__distinct"))
    val distincts = o.agg(dAggs.head, dAggs.tail: _*)
    val oAggs = (num ++ str).flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls")) ++
        (if (num.contains(c))
           Seq(min(col(c)).cast("double").as(s"${c}__min_num"),
             max(col(c)).cast("double").as(s"${c}__max_num"))
         else
           Seq(min(col(c)).as(s"${c}__min_str"),
             max(col(c)).as(s"${c}__max_str")))
    }
    val wide = o.agg(oAggs.head, oAggs.tail: _*).crossJoin(distincts)
    val rows = (num ++ str).map { c =>
      val isNum = num.contains(c)
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        (if (isNum) col(s"${c}__min_num") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"${c}__max_num") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__min_str")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__max_str")).as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Order-independent table content fingerprint, per return flag:
    * the migration/transfer-validation tool — run it on both sides of
    * a copy (cluster→cluster, format migration, backfill) and compare
    * small signatures instead of data. Each row hashes to 60 bits
    * (md5-prefix, the engine-shared DedupOps.tokenHash scheme over a
    * '|'-joined tuple of integer/flag columns — no floats, whose
    * string forms are engine-divergent) and the group signature is the
    * XOR plus the exact 38-digit decimal SUM of row hashes: both are
    * commutative/associative, so ANY partitioning, row order, or
    * merge tree yields identical signatures — and the pair is
    * stronger than either alone (XOR cancels even multiplicities,
    * SUM catches them). One partial-aggregated pass; constant bytes
    * per group cross the wire at any corpus size.
    */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.lineitem(spark, dir)
      .withColumn("h", DedupOps.tokenHash(concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_returnflag"), col("l_linestatus"))))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_sig"),
        // the sum ships as a STRING: it is a signature, not a number,
        // and 22-digit decimals degrade to float through both engines'
        // pandas bridges (observed: value-identical sums hash-mismatch
        // as 1.14e+22). Strings survive every bridge exactly.
        sum(col("h").cast(DecimalType(38, 0))).cast("string").as("sum_sig"))
      .orderBy("l_returnflag")
  }

  /** The APPROX profiler's one-pass aggregation: per column, row
    * count, null count, HLL++ distinct estimate (rsd 2%), min/max —
    * in ONE un-expanded scan. `approx_count_distinct` carries fixed-KB
    * map-side-combinable state per column, so unlike the exact
    * multi-distinct (which plans one Expand replicating every row per
    * distinct column — the row stream inflates ×columns) this plan's
    * cost is independent of how many columns are profiled. At 100 TB
    * THIS is the profiling plan; [[profileTable]]'s exact Expand plan
    * is the right default up to dimension scale. PlanSpec pins the
    * no-Expand shape. Exposed for that pin; [[profileApprox]] adds the
    * accuracy gate.
    */
  private[operators] def profileApproxOnly(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("od_sec", TimeSeriesOps.epochSecExpr("o_orderdate"))
    val num = Seq("o_orderkey", "o_custkey", "o_totalprice", "od_sec")
    val str = Seq("o_orderstatus", "o_orderpriority")
    val aggs = (num ++ str).flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        approx_count_distinct(col(c), 0.02).as(s"${c}__acd")) ++
        (if (num.contains(c))
           Seq(min(col(c)).cast("double").as(s"${c}__min_num"),
             max(col(c)).cast("double").as(s"${c}__max_num"))
         else
           Seq(min(col(c)).as(s"${c}__min_str"),
             max(col(c)).as(s"${c}__max_str")))
    }
    o.agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-based profiler, accuracy-gated: the long-format profile
    * with the HLL++ distinct estimate checked within 5% of the exact
    * distinct per column — same contract as sk_distinct (the oracle
    * computes the exact counts and expects every gate TRUE, so a
    * sketch drifting out of tolerance fails the hash gate). The exact
    * multi-distinct pass (the Expand plan) exists here ONLY as the
    * gate's reference; the production one-pass plan is
    * [[profileApproxOnly]], and the emitted `n_distinct` is the exact
    * value so the row hash is engine-comparable.
    */
  def profileApprox(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("od_sec", TimeSeriesOps.epochSecExpr("o_orderdate"))
    val num = Seq("o_orderkey", "o_custkey", "o_totalprice", "od_sec")
    val str = Seq("o_orderstatus", "o_orderpriority")
    val exAggs = (num ++ str).map(c => countDistinct(col(c)).as(s"${c}__exact"))
    val exact = o.agg(exAggs.head, exAggs.tail: _*)
    val wide = profileApproxOnly(spark, dir).crossJoin(exact)
    val rows = (num ++ str).map { c =>
      val isNum = num.contains(c)
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__exact").as("n_distinct"),
        (abs(col(s"${c}__acd") - col(s"${c}__exact")) <=
          col(s"${c}__exact") * 0.05).as("acd_within_5pct"),
        (if (isNum) col(s"${c}__min_num") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"${c}__max_num") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__min_str")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__max_str")).as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Declarative data-quality checks over the star schema, one row per
    * check: PK nulls and duplicates, FK orphans (anti-join), domain
    * violations. All FILTER-style checks on a table fold into ONE
    * conditional aggregate (`count(when(...))`) — one scan of orders
    * and one of lineitem total, vs. one scan per check — unpivoted to
    * the long check-per-row shape by the same struct-explode the
    * profiler uses. The orphan checks stay as the standard anti-join
    * (broadcast at dim scale) and the PK-dup check as its own grouped
    * aggregate; counts only cross the wire everywhere. A zero row is a
    * passing check, so the output shape is fixed and diffable across
    * runs.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val l = Tables.lineitem(spark, dir)
    // one pass per table over its filter-style checks; count(when())
    // (never sum) so an empty table yields 0, not NULL
    def folded(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
      val wide = df.agg(
        count(when(checks.head._2, lit(1))).as(checks.head._1),
        checks.tail.map { case (n, p) => count(when(p, lit(1))).as(n) }: _*)
      val rows = checks.map { case (n, _) =>
        struct(lit(n).as("check_name"), col(n).as("n_bad"))
      }
      wide.select(explode(array(rows: _*)).as("r")).select("r.*")
    }
    def check(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_bad")).select(lit(name).as("check_name"), col("n_bad"))
    folded(o, Seq(
        "orders_custkey_null" -> col("o_custkey").isNull,
        "orders_totalprice_negative" -> (col("o_totalprice") < 0)))
      .unionAll(folded(l, Seq(
        "lineitem_quantity_nonpositive" -> (col("l_quantity") <= 0),
        "lineitem_discount_range" -> (col("l_discount") < 0 || col("l_discount") > 1))))
      .unionAll(check("orders_custkey_orphan",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")))
      .unionAll(check("orders_orderkey_dup",
        o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)))
      .unionAll(check("lineitem_orderkey_orphan",
        l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")))
      .orderBy("check_name")
  }
}

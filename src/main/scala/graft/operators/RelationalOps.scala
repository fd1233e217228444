package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.util.Num._

/** The SURVEY.md §2 operator inventory demonstrated on the driver's
  * TPC-H-ish tables, one named query per operator family, each with a
  * DuckDB oracle in SparkEntry. These are the generic building blocks
  * the ETL engine composes (dedup D1, imputation A5/D4-D6, scalar
  * functions F1-F13, joins J1-J3, sorts/top-k W1-W4) plus the
  * completeness extensions (semi/anti/full joins, set ops, rollup,
  * window functions) a user of the reference would expect from a
  * full analytics engine.
  */
object RelationalOps {

  /** D1: exact key-based dedup — dropDuplicates is a partial-aggregate
    * (map-side combine), no full-row shuffle.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .dropDuplicates()

  /** A5: exact interpolated per-group median (pandas-equivalent, never
    * percentile_approx — SURVEY.md §2.9.5).
    */
  /** Oracle-exactness note: Spark `percentile` ≡ DuckDB
    * median/quantile_cont holds bitwise here (validated at
    * sf0.001/0.01/0.1), but the two engines round their interpolation
    * formulas differently in general — a p95 over different groups
    * diverged by 1 ulp at sf0.1. If a quantile query ever flakes,
    * switch to the explicit rank-interpolation form of
    * PipelineOps.winsorizeByGroup (identical IEEE ops on both
    * engines by construction).
    */
  def medianByGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy("p_brand")
      .agg(percentile(col("p_retailprice"), lit(0.5)).as("median_price"))
      .orderBy("p_brand")

  /** D4/D5 pattern: group-median imputation, set-based. A deterministic
    * mask (p_size divisible by 7) plays the "missing" role since the
    * synthetic tables have no nulls; the median pool is the unmasked
    * complement, exactly like the ETL engine's pre-imputation pool
    * semantics (SURVEY.md §2.9.2).
    */
  def imputeGroupMedian(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val masked = part.withColumn("_price",
      when(col("p_size") % 7 === 0, lit(null)).otherwise(col("p_retailprice")))
    val med = masked.filter(col("_price").isNotNull)
      .groupBy("p_brand")
      .agg(percentile(col("_price"), lit(0.5)).as("_med"))
    masked.join(broadcast(med), Seq("p_brand"), "left")
      .select(col("p_partkey"), col("p_brand"),
        round(coalesce(col("_price"), col("_med")), 2).as("price_filled"),
        col("_price").isNull.as("imputed"))
      .orderBy("p_partkey")
  }

  /** F1-F13 scalar surface: concat templates, conditional replace,
    * regex extract, clamp, coalesce/CASE, arithmetic, rounding.
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      concat(lit("Part "), col("p_partkey").cast("string")).as("display_name"),
      when(col("p_type") === "widget", lit("gadget")).otherwise(col("p_type")).as("type_fixed"),
      nullif(regexp_extract(col("p_name"), "(\\d+)", 1), lit("")).cast("int").as("name_number"),
      least(greatest(col("p_size"), lit(5)), lit(40)).as("size_clamped"),
      (col("p_size") < 5 || col("p_size") > 40).as("size_adjusted"),
      round(col("p_retailprice") * lit(1.1), 2).as("price_bumped"),
      coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("UNBRANDED")).as("brand_or_default"))
      .orderBy("p_partkey")

  /** F4/F5: date parse/format/truncate/extract on the order dates. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM").as("month_str"),
      year(col("o_orderdate")).cast("long").as("order_year"),
      quarter(col("o_orderdate")).cast("long").as("order_quarter"),
      dayofweek(col("o_orderdate")).cast("long").as("dow"),
      datediff(lit("2025-01-01").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("age_days"))
      .orderBy("o_orderkey")

  /** J1: left enrichment join, small dim broadcast — the fact side
    * never shuffles.
    */
  def joinLeftEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(broadcast(part.select("p_partkey", "p_type", "p_brand")),
        li("l_partkey") === part("p_partkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("p_type"), col("p_brand"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Semi join (EXISTS): customers that have at least one order —
    * broadcast of the distinct keys, no fact shuffle.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Anti join (NOT EXISTS): customers with no orders — the implicit
    * semi-filter the reference's INNER JOINs apply (SURVEY.md §2.9.10),
    * made explicit.
    */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Full outer join preserving both unmatched sides. */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val s = Tables.supplier(spark, dir)
    n.join(s, n("n_nationkey") === s("s_nationkey"), "full_outer")
      .select(col("n_nationkey"), col("n_name"), col("s_suppkey"), col("s_name"))
      .orderBy(col("n_nationkey"), col("s_suppkey"))
  }

  /** W2: global top-K — TakeOrderedAndProject, O(K) memory per
    * partition at any scale.
    */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  /** P1-P6: projection + compound predicate, pushed into the parquet
    * scan (PushedFilters + pruned ReadSchema).
    */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_discount")
      .where(col("l_quantity") > 40 && col("l_discount") >= 0.05 &&
        col("l_returnflag") =!= "R")
      .orderBy("l_orderkey", "l_partkey")

  /** Set ops: nations that have customers and suppliers / customers
    * but no suppliers.
    */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  def setExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** Grouping sets: ROLLUP over returnflag × linestatus with exact
    * decimal sums (partial aggregation handles all levels in one pass).
    */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Window: top-3 parts per brand by price (dense partition top-k —
    * shuffles once on the partition key).
    */
  def windowTopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(desc("p_retailprice"), col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "rk")
  }

  /** Window: per-customer running revenue in order-date order. The
    * cumulative sum runs over exact decimals so the result is
    * order-of-evaluation-independent.
    */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_revenue"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** String-function suite: case, substring, pad, replace, reverse,
    * position, edit distance — all codegen'd built-ins.
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_brand")).as("lo"),
      substring(col("p_name"), 1, 4).as("sub"),
      length(col("p_name")).cast("long").as("len"),
      lpad(col("p_brand"), 10, "_").as("pad"),
      reverse(col("p_name")).as("rev"),
      regexp_replace(col("p_name"), "\\s+", "-").as("dashed"),
      instr(col("p_name"), "e").cast("long").as("pos_e"),
      levenshtein(col("p_name"), lit("widget")).cast("long").as("dist"))
      .orderBy("p_partkey")

  /** Conditional aggregation: count_if / filtered sums / boolean aggs
    * per group.
    */
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        count_if(col("l_discount") > 0.05).as("n_highdisc"),
        moneySum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0))).as("returned_value"),
        bool_or(col("l_quantity") > 45).as("any_bulk"),
        bool_and(col("l_quantity") > 0).as("all_positive"))
      .orderBy("l_linestatus")

  /** Unpivot (wide → long): part metrics as (metric, value) rows via
    * `stack` — the inverse of pivot, one narrow projection.
    */
  def unpivotLong(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        expr("stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice)")
          .as(Seq("metric", "value")))
      .orderBy("p_partkey", "metric")

  /** Deterministic per-group mode: most frequent p_type per brand,
    * ties broken by type ascending — expressed as an explicit argmax
    * (count window) rather than the builtin `mode()`, whose tie choice
    * is engine-dependent.
    */
  def modeByGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.part(spark, dir)
      .groupBy("p_brand", "p_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("p_brand").orderBy(desc("n"), col("p_type"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("p_brand"), col("p_type").as("mode_type"), col("n"))
      .orderBy("p_brand")
  }

  /** Fuzzy (edit-distance) self-join over part names — the
    * entity-resolution pattern: project to DISTINCT names first (one
    * partial-combine shuffle collapses N rows to the name vocabulary,
    * which is what actually pairs), block on cheap keys so only
    * plausible matches meet, then verify candidates with codegen'd
    * `levenshtein`. Pair work is per-block-quadratic over the
    * *vocabulary*, never the table; at 100 TB the vocabulary side
    * still broadcasts. `a < b` canonicalizes each unordered pair to
    * one row.
    *
    * Blocking is DUAL-key — a name posts under its FIRST and its LAST
    * token (deduped, so one-token names post once) and a pair is a
    * candidate if either key collides. Single-key (last-token)
    * blocking loses any pair whose edit lands in the final token
    * ("steel blue" ~ "steel blues"); the first∨last union is the
    * standard recall refinement and costs one extra posting per name.
    * A free length-band prune rides the join: levenshtein ≤ 3 implies
    * |len(a)−len(b)| ≤ 3 (each edit changes length by at most 1), so
    * the inequality is applied IN the join before the quadratic
    * verify — provably lossless, and on a hot block (common surname /
    * noun at entity scale) it discards most of the block's pair work
    * for the cost of two ints.
    */
  def joinFuzzyEdit(spark: SparkSession, dir: String): DataFrame = {
    // element_at(..., 1/-1): FIRST/LAST token, never null for a
    // non-null name — getItem would be NULL on single-token names
    // (silently dropping them from the equi-join) while the oracle's
    // list[1]/list[-1] still blocks them, an engine divergence waiting
    // for a 1-word name.
    val toks = split(col("p_name"), " ")
    val keyed = Tables.part(spark, dir)
      .select(col("p_name")).distinct()
      .select(col("p_name"), explode(array_distinct(
        array(element_at(toks, 1), element_at(toks, -1)))).as("blk"))
    val a = keyed.select(col("p_name").as("name_a"), col("blk"))
    val b = keyed.select(col("p_name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= 3)
      // a pair can collide on both keys — dedup BEFORE the verify so
      // levenshtein runs once per candidate pair
      .select("name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 3)
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b")
  }

  /** Window value functions: per customer, the first/last/second order
    * price (full-partition frame) and each order's cume_dist by price.
    * first/last/nth_value need the explicit unbounded-both-ends frame
    * (the default frame stops at CURRENT ROW, silently making
    * last_value ≡ current row — a classic SQL trap both engines
    * share); cume_dist counts peers ≤ current, so price ties are
    * deterministic without a tiebreaker. One window shuffle on
    * o_custkey shared by all four functions.
    */
  def windowValueFuncs(spark: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byPrice = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        first("o_totalprice").over(full).as("first_price"),
        last("o_totalprice").over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"),
        cume_dist().over(byPrice).as("cd"))
      .orderBy("o_orderkey")
  }

  /** Incremental aggregate maintenance: per-customer order counts and
    * exact revenue computed as pre-aggregated history (orders before
    * the split day) COMBINED with a fresh delta aggregate — the
    * re-aggregation of partial (count, decimal-sum) states, i.e. the
    * materialized-view update pattern that avoids rescanning history
    * at 100 TB. Both input aggregates partial-combine map-side and the
    * final merge touches only (customer, partial) rows; the oracle
    * recomputes from scratch, proving merge ≡ recompute.
    */
  def incrAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val split = 10000L // epoch-day boundary between "history" and "delta"
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"),
        TimeSeriesOps.epochDayExpr("o_orderdate").as("od"))
    def partial(df: DataFrame) = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("pn"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("ps"))
    partial(o.filter(col("od") < split))
      .unionAll(partial(o.filter(col("od") >= split)))
      .groupBy("o_custkey")
      .agg(sum("pn").as("n_orders"), sum("ps").cast("double").as("revenue"))
      .orderBy("o_custkey")
  }

  /** Bloom-filter join pruning — the runtime-filter shape Spark's own
    * `InjectRuntimeFilter` rule produces for shuffle joins, made
    * explicit as an operator. The dim-side join keys are folded into a
    * fixed-size bloom filter by a distributed aggregate
    * (`BloomFilterAggregate` over `xxhash64(key)` — one binary row,
    * merged map-side, never collected to the driver), and that row is
    * injected into the fact-side scan as a scalar subquery feeding
    * `might_contain`, so fact rows that cannot join are dropped AT THE
    * SCAN, before any shuffle. At 100 TB this is the difference
    * between shuffling the whole fact table into a semi-join and
    * shuffling only `match + fpp·miss` of it; the filter itself stays
    * ~1 MiB regardless of scale (size `estimatedNumItems` from table
    * stats on a real deployment). The bloom has no false negatives, so
    * the exact semi-join on the surviving candidates is provably equal
    * to the unpruned join — the gate emits that exact result (DuckDB
    * computes it independently) plus two machine-checked bounds:
    * candidates ⊇ matches, and false positives within 5% of the
    * non-matching population (default 8M-bit filter ⇒ fpp ≪ 1% at
    * every test SF).
    */
  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge

    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // size the filter from the actual key count (one cheap pruned scan
    // at build time — the stand-in for catalog stats on a real
    // deployment; Spark derives the bit geometry from the estimate,
    // with the runtime-filter conf caps as guardrails). A hardcoded
    // default would under-size at scale and silently raise fpp.
    val nKeys = math.max(urgent.count(), 1L)
    val bfPlan = urgent.agg(Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(col("o_orderkey"))), nKeys)
        .toAggregateExpression()).as("bf"))
    val mightContain = Bridge.column(new BloomFilterMightContain(
      ScalarSubquery(bfPlan.queryExecution.analyzed),
      Bridge.expression(xxhash64(col("l_orderkey")))))

    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
    val dimK = urgent.distinct().withColumn("_m", lit(1))
    // no broadcast hint: AQE broadcasts while the key set fits and
    // falls back to a shuffle join of the PRUNED candidates beyond
    // that — which is exactly the traffic the bloom bought down
    val counts = li.filter(mightContain)
      .join(dimK, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(when(col("_m").isNotNull, 1)).as("n_match"),
        sum(when(col("_m").isNotNull, col("l_extendedprice"))
          .cast(DecimalType(18, 2))).as("rev"),
        count(lit(1)).as("n_cand"))
    val total = li.agg(count(lit(1)).as("n_total"))
    counts.crossJoin(total).select(
      col("n_match"),
      col("rev").cast("double").as("revenue"),
      (col("n_cand") >= col("n_match")).as("cand_ge_match"),
      ((col("n_cand") - col("n_match")).cast("double") <=
        (col("n_total") - col("n_match")).cast("double") * 0.05 + 1.0)
        .as("fp_bounded"))
  }

  /** Window: lag/lead — days since the customer's previous order. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).cast("long")
          .as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout evidence for the 100 TB story: co-located (bucketed)
  * joins must not shuffle either side, and partition-pruned scans must
  * push the partition predicate into file listing — the two techniques
  * that keep a 1000-executor join/scan from touching the whole corpus.
  * Local bucket/partition counts are small; the plan SHAPES are what
  * carry to scale.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.build("layout-spec", "4")
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchanges on either side") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf)
      .select("c_custkey", "c_name")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    orders.write.mode("overwrite")
      .option("path", "/tmp/graft_layout/orders_bkt")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    customer.write.mode("overwrite")
      .option("path", "/tmp/graft_layout/customer_bkt")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // forbid broadcast so the join must exploit the bucket layout
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is not vacuous: the same join on the raw parquet DOES shuffle
      val raw = orders.join(customer, col("o_custkey") === col("c_custkey"))
      assert(raw.queryExecution.executedPlan.toString().contains("Exchange"))
      // results identical either way
      assert(j.count() === raw.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("partition-pruned scan pushes the partition predicate to file listing") {
    val out = "/tmp/graft_layout/orders_by_year"
    Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("order_year") === 1995)
    val s = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("PartitionFilters") &&
      s.replaceAll("\\s", "").contains("order_year"),
      s"partition predicate not pruned in:\n$s")
    // the predicate must NOT appear as a data filter on row contents
    val full = spark.read.parquet(out)
    assert(pruned.count() > 0 && pruned.count() < full.count())
  }

  test("z-order layout gives every file a tight two-column bounding box") {
    import graft.operators.LayoutOps
    // sf0.01 so each of the 8 range partitions holds enough orders
    // for per-partition spans to be meaningful
    val o = graft.operators.LayoutOps.zorderKeys(spark, "/root/testdata/sf0.01")
    val parts = 8
    // per-file (x-span + y-span) under a layout = what min/max
    // skipping sees: a file is pruned for a box query when the box
    // misses its bounds, so tighter boxes = more pruned files
    def meanSpan(laidOut: org.apache.spark.sql.DataFrame): Double =
      laidOut.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max("zx") - min("zx")) + (max("zy") - min("zy"))).as("span"))
        .agg(avg("span")).head().getDouble(0)
    val zLayout = meanSpan(
      o.repartitionByRange(parts, col("zval")).sortWithinPartitions("zval"))
    val keyLayout = meanSpan(
      o.repartitionByRange(parts, col("o_orderkey")))
    // single-key layout: zx/zy are independent of o_orderkey, so every
    // file spans ~the full plane; z-order must tile it substantially
    assert(zLayout < keyLayout * 0.5,
      s"z-order did not tighten bounds: z=$zLayout vs key=$keyLayout")
    // and a one-dimension range layout on zx alone must NOT bound zy:
    // z-order trades a little x-tightness for bounds on BOTH columns
    val xOnly = o.repartitionByRange(parts, col("zx"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("zy") - min("zy")).as("yspan"))
      .agg(avg("yspan")).head().getDouble(0)
    val zY = o.repartitionByRange(parts, col("zval"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("zy") - min("zy")).as("yspan"))
      .agg(avg("yspan")).head().getDouble(0)
    assert(zY < xOnly,
      s"z-order should bound the second column too: z=$zY vs xOnly=$xOnly")
  }
}

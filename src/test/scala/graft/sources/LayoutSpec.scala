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
}

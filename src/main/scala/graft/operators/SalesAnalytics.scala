package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.util.Num._

/** The reference's five analytic queries (reference:
  * save-data/save_data_pdf_report.py:64-222), re-expressed Spark-first
  * over the driver's TPC-H-ish star schema:
  *
  *   vendas -> orders/lineitem (fact), empregados -> customer,
  *   produtos -> part, categoria -> p_type, periodo -> order month.
  *
  * All are partial-aggregatable hash group-bys; dimensions (customer,
  * part) are broadcast so the fact table never shuffles for the join.
  * At 100 TB the fact scan is the only wide input; each query is one
  * shuffle (the final aggregation) at most.
  */
object SalesAnalytics {

  /** Q1 analog (save_data_pdf_report.py:75-85): revenue per customer,
    * INNER JOIN fact->dim, GROUP BY id+name, ORDER BY total DESC.
    */
  def q1RevenueByCustomer(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
  }

  /** Q2 analog (save_data_pdf_report.py:103-112): "ticket médio" —
    * SUM/COUNT ratio per product. Kept as SUM/COUNT (not avg) for
    * fidelity with the reference expression.
    */
  def q2AvgTicketByPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_partkey", "p_name")
      .agg(
        (coalesce(moneySum(col("l_extendedprice")), lit(0.0)) /
          count(col("l_orderkey"))).as("ticket_medio"))
      .orderBy(col("p_partkey"))
  }

  /** Q3 analog (save_data_pdf_report.py:153-162): sales count per
    * category, ORDER BY count DESC.
    */
  def q3CountByType(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_type")
      .agg(count(col("l_orderkey")).as("quantidade_vendas"))
      .orderBy(desc("quantidade_vendas"), col("p_type"))
  }

  /** Q4 analog (save_data_pdf_report.py:180-190): top-5 customers by
    * revenue — Catalyst plans TakeOrderedAndProject, so only K rows
    * per partition ever reach the driver regardless of input scale.
    * Tie-break on c_custkey for determinism.
    */
  def q4Top5Customers(spark: SparkSession, dir: String): DataFrame =
    q1RevenueByCustomer(spark, dir).limit(5)

  /** Q5 analog (save_data_pdf_report.py:205-218): per-month order
    * count + revenue, ORDER BY period ASC. TO_CHAR(data,'YYYY-MM') ->
    * date_format.
    */
  def q5SalesByMonth(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .where(col("o_orderdate").isNotNull)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("periodo"))
      .agg(
        count(col("o_orderkey")).as("total_vendas"),
        moneySum(col("o_totalprice")).as("valor_total"))
      .orderBy("periodo")
  }
}

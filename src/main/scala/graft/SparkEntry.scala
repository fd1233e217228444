package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the scale
  * extensions) is exposed as a named query over a scale-factor
  * directory; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SalesAnalytics.q1RevenueByCustomer(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_revenue_by_customer" -> (SalesAnalytics.q1RevenueByCustomer _),
    "q2_avg_ticket_by_part"  -> (SalesAnalytics.q2AvgTicketByPart _),
    "q3_count_by_type"       -> (SalesAnalytics.q3CountByType _),
    "q4_top5_customers"      -> (SalesAnalytics.q4Top5Customers _),
    "q5_sales_by_month"      -> (SalesAnalytics.q5SalesByMonth _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Column names/aliases match the Spark side
    * exactly (driver sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_revenue_by_customer" ->
      """SELECT c.c_custkey, c.c_name,
         CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS revenue
         FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_custkey, c.c_name
         ORDER BY revenue DESC, c.c_custkey""",
    "q2_avg_ticket_by_part" ->
      """SELECT p.p_partkey, p.p_name,
         CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
           / COUNT(l.l_orderkey) AS ticket_medio
         FROM lineitem l INNER JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_partkey, p.p_name
         ORDER BY p.p_partkey""",
    "q3_count_by_type" ->
      """SELECT p.p_type, COUNT(l.l_orderkey) AS quantidade_vendas
         FROM lineitem l INNER JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_type
         ORDER BY quantidade_vendas DESC, p.p_type""",
    "q4_top5_customers" ->
      """SELECT c.c_custkey, c.c_name,
         CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS revenue
         FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_custkey, c.c_name
         ORDER BY revenue DESC, c.c_custkey
         LIMIT 5""",
    "q5_sales_by_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS periodo,
         COUNT(o_orderkey) AS total_vendas,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS valor_total
         FROM orders
         WHERE o_orderdate IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The SQL entry surface: `spark.sql` over registered temp views — the
  * same engine Catalyst path as the DataFrame API (SURVEY §3), plus the
  * subquery-decorrelation coverage called out in SURVEY §4
  * (RewriteCorrelatedScalarSubquery): the correlated scalar subquery
  * plans as an aggregate + left outer join, not a per-row loop.
  */
object SqlSurface extends graft.QueryModule {

  private def correlatedScalar(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders_v o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT bround(max(o_totalprice), 2) FROM orders_v o
        |        WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer_v c
        |ORDER BY c_custkey""".stripMargin)
  }

  /** CTE + window-function SQL text: monthly revenue per customer (exact
    * decimal sums), top-2 months kept by rank — the everyday analyst
    * query shape, straight through `spark.sql`. */
  private def cteWindow(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """WITH monthly AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM orders_v GROUP BY 1, 2)
        |SELECT o_custkey, mon, total, rnk FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY total DESC, mon) AS rnk
        |  FROM monthly)
        |WHERE rnk <= 2
        |ORDER BY o_custkey, rnk""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_correlated_subquery" -> correlatedScalar,
    "sql_cte_window" -> cteWindow)

  val oracles: Map[String, String] = Map(
    "sql_correlated_subquery" ->
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT round_even(max(o_totalprice), 2) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,
    "sql_cte_window" ->
      """WITH monthly AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, mon, total, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY total DESC, mon) AS INTEGER) AS rnk
        |  FROM monthly)
        |WHERE rnk <= 2
        |ORDER BY o_custkey, rnk""".stripMargin)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Full TPC-H-shaped reporting queries over the star schema (deepening
  * SURVEY §2.C/§2.D beyond the Q1/Q5/Q6 shapes already registered):
  * the complete Q1 pricing summary and the Q10 returned-item report.
  *
  * Float determinism: money arithmetic runs in EXACT decimals —
  * `decimal(12,2)` inputs, products widened by Catalyst — and is cast to
  * double only at the aggregate boundary. An exact decimal sum is
  * order-invariant, so the result is bit-identical at any partition count
  * and matches DuckDB's decimal engine exactly; averages are computed as
  * one post-aggregate division (never an incremental mean).
  */
object TpchDeep extends graft.QueryModule {

  private def dec(c: String) = col(c).cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(3,2)")

  /** TPC-H Q1: pricing summary report. One map-side-partial hash
    * aggregation over the filtered scan (predicate pushed to parquet);
    * 4 grouped rows at any scale — the canonical 100 TB-safe shape. */
  private def q1Pricing(s: SparkSession, d: String): DataFrame = {
    val discPrice = dec("l_extendedprice") * (one - dec("l_discount"))
    val charge = discPrice * (one + dec("l_tax"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q10: returned-item revenue per customer, one quarter, top 20.
    * Plan: lineitem(R-flag, pushed) ⋈ orders(quarter, pushed) on orderkey
    * (shuffle), then broadcast customer-side dims; final top-20 is
    * TakeOrderedAndProject — no global sort ever materializes. */
  private def q10Returns(s: SparkSession, d: String): DataFrame = {
    val revenue = sum(dec("l_extendedprice") * (one - dec("l_discount")))
      .cast("double").as("revenue")
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_q1_pricing" -> q1Pricing,
    "join_q10_returns" -> q10Returns)

  val oracles: Map[String, String] = Map(
    "agg_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |           * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_q10_returns" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
}

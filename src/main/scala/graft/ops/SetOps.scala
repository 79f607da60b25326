package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.G — set operations (`set.update` dedup at
  * `fetch_data.py:282,296`; requested-minus-produced at 311-316).
  */
object SetOps extends graft.QueryModule {

  /** Union of two lists' members, deduplicated (`fetch_data.py:282,296`). */
  private def unionDistinct(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val b = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    a.union(b).distinct().orderBy("c_custkey")
  }

  /** Members present in both lists [N] (NASDAQ-100 ∩ Dividend shape). */
  private def intersectKeys(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val b = o.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
    a.intersect(b).orderBy("o_custkey")
  }

  /** Requested − produced (`fetch_data.py:311-316`; `update.yml:39`). */
  private def exceptKeys(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.select(col("o_custkey"))
      .except(o.filter(col("o_totalprice") > 150000).select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setop_union_distinct" -> unionDistinct,
    "setop_intersect" -> intersectKeys,
    "setop_except" -> exceptKeys)

  val oracles: Map[String, String] = Map(
    "setop_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY c_custkey""".stripMargin,
    "setop_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,
    "setop_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |ORDER BY o_custkey""".stripMargin)
}

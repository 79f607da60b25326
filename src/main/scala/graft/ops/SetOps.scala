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

  /** Bag-semantics EXCEPT ALL [N]: multiplicities subtract instead of
    * the set form's vanish — the right answer when the "produced" side
    * may partially cover duplicates in "requested". Spark plans it as a
    * replicate-count generate over a grouped anti-count, never a sort. */
  private def exceptAll(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    l.select(col("l_suppkey"))
      .exceptAll(l.filter(col("l_returnflag") === "R").select(col("l_suppkey")))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_suppkey")
  }

  /** Bag-semantics INTERSECT ALL [N] — [[exceptAll]]'s twin: each
    * supplier key survives min(multiplicity-left, multiplicity-right)
    * times. Spark plans it as one aggregate computing both counts plus
    * a generate replicating min(counts) — two shuffles total, no join
    * of the raw bags. */
  private def intersectAll(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    l.filter(col("l_returnflag") =!= "A").select(col("l_suppkey"))
      .intersectAll(l.filter(col("l_returnflag") =!= "R").select(col("l_suppkey")))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_suppkey")
  }

  /** Schema-evolution union [N]: `unionByName(allowMissingColumns)`
    * aligns by NAME and null-fills the columns one side lacks — the
    * union a long-lived pipeline actually needs once v2 of a feed adds
    * a column (positional `union` would silently misalign). */
  private def unionByNameEvolved(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val v1 = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"))
    val v2 = c.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setop_except_all" -> exceptAll,
    "setop_intersect_all" -> intersectAll,
    "setop_union_by_name" -> unionByNameEvolved,
    "setop_union_distinct" -> unionDistinct,
    "setop_intersect" -> intersectKeys,
    "setop_except" -> exceptKeys)

  val oracles: Map[String, String] = Map(
    "setop_intersect_all" ->
      """WITH r AS (
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag <> 'A'
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag <> 'R')
        |SELECT l_suppkey, count(*) AS n
        |FROM r GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "setop_except_all" ->
      """WITH r AS (
        |  SELECT l_suppkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |SELECT l_suppkey, count(*) AS n
        |FROM r GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "setop_union_by_name" ->
      """SELECT c_custkey, c_name, NULL::DOUBLE AS c_acctbal
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,
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

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

  /** TPC-H Q18: large-quantity orders (group-HAVING → join-back → top-k).
    * Plan: ONE aggregation of lineitem produces both the HAVING filter
    * and the reported quantity (no second scan for the IN-subquery —
    * Catalyst would also decorrelate it, but expressing the reuse
    * directly guarantees it); qualifying orders (rare) then join to
    * orders/customer, top-100 via TakeOrderedAndProject. Quantity sums
    * are integral doubles — exact at any order. */
  private def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q7: bilateral trade volume between two nations by ship year.
    * Plan: lineitem filtered on the two-year window (pushed), orderkey
    * shuffle join to orders, then ALL dims — supplier, customer, the two
    * nation copies — broadcast; the OR-of-nation-pairs predicate runs
    * after the broadcasts, and the final agg is 2×2×2 rows. At 100 TB
    * the only shuffle is the fact-to-orders join. */
  private def q7Volume(s: SparkSession, d: String): DataFrame = {
    val revenue = sum(dec("l_extendedprice") * (one - dec("l_discount")))
      .cast("double").as("revenue")
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between("1996-01-01", "1997-12-31"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenue)
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14: promo revenue share for one month — the
    * conditional-sum-over-join shape. part broadcasts; the share is ONE
    * double division of two exact decimal sums (never an incremental
    * ratio), so the scalar is bit-stable at any partition count. */
  private def q14Promo(s: SparkSession, d: String): DataFrame = {
    val disc = dec("l_extendedprice") * (one - dec("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(((lit(100.0) * coalesce(sum(when(col("p_type") === "PROMO", disc)),
          lit(0).cast("decimal(12,2)")).cast("double")) /
        sum(disc).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q3: unshipped-order revenue for one market segment, top 10.
    * The customer side contributes NO output columns, so it joins
    * LEFT SEMI against the segment-filtered customer — the build side
    * carries only c_custkey instead of the whole row, and at 100 TB the
    * semi join lets AQE turn it into a broadcast of just the key set.
    * lineitem⋈orders is the one real shuffle; top-10 is
    * TakeOrderedAndProject. (o_shippriority doesn't exist in this
    * synthetic schema; the reported columns end at o_orderdate.) */
  private def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val revenue = sum(dec("l_extendedprice") * (one - dec("l_discount")))
      .cast("double").as("revenue")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1996-07-01"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-07-01"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q12 shape: late-shipment counts per order priority over one
    * ship year (this schema has no l_shipmode/commitdate, so "late" is
    * shipped > 75 days after order date and the grouping key is
    * o_orderpriority). The point of the shape: BOTH conditional counts
    * come out of ONE aggregation over the joined scan — never two passes
    * — and the ship-year range is pushed to the lineitem parquet scan. */
  private def q12LateLines(s: SparkSession, d: String): DataFrame = {
    val late = col("l_shipdate") >
      col("o_orderdate") + expr("INTERVAL 75 DAYS")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(when(late, 1)).as("late_lines"),
        count(lit(1)).as("total_lines"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q19 shape: disjunctive OR-of-ANDs revenue — three
    * (brand, type-set, quantity-band) clauses OR'd together in the JOIN
    * condition. Scale notes: Catalyst extracts the common p_partkey
    * equi-key so this stays a broadcast HASH join (not nested-loop), and
    * the UNION of the clause domains is pre-pushed to both scans —
    * part shrinks to 3 brands before broadcast, lineitem prunes
    * quantity ∉ [1, 30] at the parquet scan instead of post-join. */
  private def q19Disjunct(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_quantity").between(1, 30))
    val clauses =
      (col("p_brand") === "Brand#1" &&
        col("p_type").isin("PROMO", "ECONOMY") &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" &&
        col("p_type").isin("STANDARD", "MEDIUM") &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" &&
        col("p_type").isin("SMALL", "LARGE") &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey") && clauses)
      .agg(coalesce(sum(dec("l_extendedprice") * (one - dec("l_discount"))),
          lit(0).cast("decimal(12,2)")).cast("double").as("revenue"))
  }

  /** TPC-H Q21 SHAPE (suppliers who kept waiting): the deepest
    * correlation pattern in the suite — an EXISTS (another supplier on
    * the same order) AND a NOT EXISTS (no OTHER supplier was late)
    * against the same fact table, both correlated on (orderkey,
    * suppkey). Catalyst decorrelates the pair into a LEFT SEMI and a
    * LEFT ANTI join on l_orderkey with the suppkey inequality as the
    * residual — three passes over lineitem, zero per-row subquery loops.
    * (This lineitem has no receipt/commit dates, so "late" :=
    * shipped > 90 days after the order date — the derived predicate
    * keeps every join and correlation of the original.) */
  private def q21Waiting(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("late"))
    val l1 = li.filter(col("late"))
    // EXISTS: another supplier shipped on the same order
    val withOther = l1.as("a").join(
      li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .as("b"),
      col("a.l_orderkey") === col("b.ok") &&
        col("a.l_suppkey") =!= col("b.sk"), "left_semi")
    // NOT EXISTS: no OTHER supplier was ALSO late on that order
    val sole = withOther.as("a").join(
      l1.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).as("c"),
      col("a.l_orderkey") === col("c.ok") &&
        col("a.l_suppkey") =!= col("c.sk"), "left_anti")
    sole.join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 SHAPE (global sales opportunity): a SCALAR subquery
    * (the positive-balance average) feeding a filter, then an anti-join
    * against orders — customers with above-average balance and no
    * purchase history, tallied by country code. The scalar average
    * broadcasts as a 1-row literal-like input; the anti-join is the
    * same hash shape as `join_anti_failures`. (No phone column here, so
    * cntrycode := c_nationkey % 7 — predicate derived, shape intact.)
    * The balance average is an exact decimal sum / count, divided ONCE
    * — never an incremental mean. */
  private def q22Opportunity(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select((col("c_nationkey") % 7).cast("int").as("cntrycode"),
        col("c_custkey"), dec("c_acctbal").as("bal"))
      .filter(col("cntrycode").isin(0, 1, 2, 3, 4))
    val avgBal = cust.filter(col("bal") > 0.0)
      .agg((sum(col("bal")).cast("double") / count(lit(1))).as("ab"))
    val rich = cust.join(broadcast(avgBal),
      col("bal").cast("double") > col("ab"))
    // every customer here has SOME order (synthetic data is dense), so
    // the no-history predicate is "no order since 1998" — same anti-join
    // shape, and it actually bites
    rich.join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-01-01"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_q21_waiting" -> q21Waiting,
    "agg_q22_opportunity" -> q22Opportunity,
    "agg_q1_pricing" -> q1Pricing,
    "join_q10_returns" -> q10Returns,
    "join_q7_volume" -> q7Volume,
    "agg_q14_promo" -> q14Promo,
    "join_q3_shipping" -> q3Shipping,
    "agg_q12_late" -> q12LateLines,
    "join_q19_disjunct" -> q19Disjunct,
    "agg_q18_large_orders" -> q18LargeOrders)

  val oracles: Map[String, String] = Map(
    "join_q21_waiting" ->
      """WITH li AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |         (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'),
        |l1 AS (SELECT * FROM li WHERE late)
        |SELECT s.s_name, count(*) AS numwait
        |FROM l1 a
        |JOIN supplier s ON a.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |             AND n.n_name = 'NATION_3'
        |WHERE EXISTS (SELECT 1 FROM li b
        |              WHERE b.l_orderkey = a.l_orderkey
        |                AND b.l_suppkey <> a.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l1 c
        |                  WHERE c.l_orderkey = a.l_orderkey
        |                    AND c.l_suppkey <> a.l_suppkey)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "agg_q22_opportunity" ->
      """WITH cust AS (
        |  SELECT CAST(c_nationkey % 7 AS INTEGER) AS cntrycode, c_custkey,
        |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM customer
        |  WHERE CAST(c_nationkey % 7 AS INTEGER) IN (0, 1, 2, 3, 4)),
        |ab AS (SELECT CAST(sum(bal) AS DOUBLE) / count(*) AS ab
        |       FROM cust WHERE bal > 0.0)
        |SELECT cntrycode, count(*) AS numcust,
        |       CAST(sum(bal) AS DOUBLE) AS totacctbal
        |FROM cust, ab
        |WHERE CAST(bal AS DOUBLE) > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = cust.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "join_q3_shipping" ->
      """SELECT o_orderkey, o_orderdate,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "agg_q12_late" ->
      """SELECT o_orderpriority,
        |       CAST(count(CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
        |                       THEN 1 END) AS BIGINT) AS late_lines,
        |       CAST(count(*) AS BIGINT) AS total_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_q19_disjunct" ->
      """SELECT CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (1 - CAST(l_discount AS DECIMAL(12,2)))), 0) AS DOUBLE)
        |       AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_type IN ('PROMO', 'ECONOMY')
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_type IN ('STANDARD', 'MEDIUM')
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_type IN ('SMALL', 'LARGE')
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "join_q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "agg_q14_promo" ->
      """SELECT (100.0 * CAST(coalesce(sum(CASE WHEN p_type = 'PROMO'
        |           THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (1 - CAST(l_discount AS DECIMAL(12,2))) END),
        |           0) AS DOUBLE))
        |       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |       AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
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
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "agg_q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin)
}

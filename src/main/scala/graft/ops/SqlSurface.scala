package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** The native as-of operator through pure SQL text (VERDICT r3 #4):
    * the `graft_asof` TVF registered by [[graft.plans.AsOf.registerSql]]
    * (or `spark.sql.extensions=graft.GraftExtensions`) over temp views —
    * the same probes/series shape and oracle as `join_asof_native`, but
    * every character the analyst writes is SQL. */
  private def sqlAsOf(s: SparkSession, d: String): DataFrame = {
    graft.plans.AsOf.registerSql(s)
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    ev.createOrReplaceTempView("events_series_v")
    ev.groupBy(col("user_id"))
      .agg((max(col("ts")) - expr("INTERVAL 1 HOUR")).as("ts"))
      .createOrReplaceTempView("events_probes_v")
    s.sql(
      """SELECT user_id, ts AS probe_ts, last_value
        |FROM graft_asof('events_probes_v', 'events_series_v',
        |                'user_id', 'ts', 'event_id', 'value')
        |ORDER BY user_id""".stripMargin)
  }

  /** EXISTS / NOT EXISTS in one query — Catalyst decorrelates the pair
    * into a LEFT SEMI and a LEFT ANTI join (RewritePredicateSubquery),
    * so the "loop over orders per customer" the SQL reads as is actually
    * two hash joins; at 100 TB both reduce the fact side before any
    * wide row is carried. */
  private def existsSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders_v o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** SQL PIVOT clause (long→wide through pure SQL text; the DataFrame
    * twin is `stmt_pivot_wide`). Exact decimal sums inside the pivot,
    * doubles only at the outer projection. */
  private def sqlPivot(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT yr, CAST(urgent AS DOUBLE) AS urgent,
        |       CAST(high AS DOUBLE) AS high,
        |       CAST(medium AS DOUBLE) AS medium
        |FROM (SELECT year(o_orderdate) AS yr, o_orderpriority,
        |             CAST(o_totalprice AS DECIMAL(12,2)) AS price
        |      FROM orders_v)
        |PIVOT (sum(price) FOR o_orderpriority IN
        |       ('1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium))
        |ORDER BY yr""".stripMargin)
  }

  /** LATERAL correlated subquery join: "top-2 orders for each customer
    * of two nations" — the subquery re-executes per outer row in the
    * SQL reading, but Catalyst plans it as DecorrelateInnerQuery +
    * window rank + ONE join (no per-row loop; the same rewrite every
    * warehouse applies to LATERAL ... ORDER BY ... LIMIT k). */
  private def sqlLateral(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT n.n_name, c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM nation_v n
        |JOIN customer_v c ON c.c_nationkey = n.n_nationkey,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders_v o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE n.n_name IN ('NATION_3', 'NATION_7')
        |ORDER BY n_name, c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** WITH RECURSIVE through Spark 4's native recursive-CTE support [N]:
    * the calendar-spine pattern — derive the date bounds, recursively
    * enumerate every day between them, left-join the daily aggregate so
    * gap days surface as explicit zeros (a plain GROUP BY silently drops
    * them). Recursion depth = span in days (30 here), well under
    * `spark.sql.cteRecursionLevelLimit`; each step is one tiny
    * one-row-widening union, the daily agg stays a normal hash agg. */
  private def recursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_rcte_v")
    s.sql(
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
        |  FROM events_rcte_v),
        |spine(day) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT date_add(sp.day, 1) FROM spine sp, bounds b
        |  WHERE sp.day < b.hi),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        |         count(DISTINCT user_id) AS n_users
        |  FROM events_rcte_v GROUP BY 1)
        |SELECT day, coalesce(n_events, 0) AS n_events,
        |       coalesce(n_users, 0) AS n_users
        |FROM spine LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin)
  }

  /** GROUP BY ALL / ORDER BY ALL [N] — the analyst-ergonomics form both
    * Spark 4 and DuckDB support natively: every non-aggregate select
    * item becomes a grouping key, and the output orders by the full
    * select list left-to-right. Same plan as the explicit form (one
    * hash-agg exchange on the inferred keys) — this key pins that the
    * inference stays correct, not a new physical shape. */
  private def groupByAll(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders_v GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** Named WINDOW clause [N]: one window definition shared by several
    * analytic functions — the ANSI form both engines parse. Catalyst
    * resolves all four functions onto the SAME Window operator (one
    * exchange + one sort), which is the point: a shared named window
    * is the textual guarantee the frames can fuse. */
  private def windowClause(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER w AS rn,
        |       rank() OVER w AS rk,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |              OVER w AS DOUBLE) AS run_total
        |FROM orders_v
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** SQL pipe syntax [N] — Spark 4.0's `|>` operator chain
    * (SPARK-49555, the GoogleSQL-style form): FROM … |> WHERE … |>
    * AGGREGATE … GROUP BY … |> ORDER BY. Same Catalyst plan as the
    * classic text — the key pins that the pipe parser resolves onto
    * identical semantics (the oracle is the classic formulation, which
    * is also all DuckDB can parse). */
  private def pipeSyntax(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """FROM orders_v
        ||> WHERE o_orderstatus = 'O'
        ||> AGGREGATE count(*) AS n,
        |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |       AS total
        |   GROUP BY o_orderpriority
        ||> ORDER BY o_orderpriority""".stripMargin)
  }

  /** SQL scripting (SQL/PSM, Spark 4): BEGIN … END block with a DECLAREd
    * session variable referenced by the query — procedural SQL without
    * leaving the engine. The block's last statement is the result. */
  private def sqlScripting(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.conf.set("spark.sql.scripting.enabled", "true")
    s.sql(
      """BEGIN
        |  DECLARE thr DOUBLE DEFAULT 150000.0;
        |  SELECT o_orderpriority, count(*) AS n,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS big_total
        |  FROM orders_v WHERE o_totalprice > thr
        |  GROUP BY o_orderpriority ORDER BY o_orderpriority;
        |END""".stripMargin)
  }

  /** SQL-language function (CREATE FUNCTION … RETURN expr, Spark 4):
    * the UDF the catalog understands and Catalyst INLINES — unlike a
    * Scala closure it stays a plain expression, so codegen, pushdown,
    * and the zero-UDF policy (§2.J) all survive. */
  private def sqlUdfCreate(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        |RETURNS STRING
        |RETURN CASE WHEN p < 50000 THEN 'low'
        |            WHEN p < 150000 THEN 'mid'
        |            ELSE 'high' END""".stripMargin)
    s.sql(
      """SELECT price_tier(o_totalprice) AS tier, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders_v GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Parameterized SQL (named parameter markers, Spark 4): the text is
    * a template with `:name` placeholders and values bind as LITERALS
    * at parse time — injection-safe by construction and plan-cacheable
    * by text. */
  private def sqlParameterized(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders_v
        |WHERE o_orderstatus = :status AND o_totalprice >= :floor
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("status" -> "F", "floor" -> 25000))
  }

  /** EXECUTE IMMEDIATE [N] (Spark 4): SQL text held in a declared
    * variable runs as a statement with USING parameter binding — the
    * dynamic-SQL surface warehouse procedures use (query text assembled
    * by one layer, executed safely by another). The query string stays a
    * parameterized template: values bind as literals at parse time, the
    * injection-safe path. */
  private def executeImmediate(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql("DECLARE OR REPLACE VARIABLE seg_query STRING")
    s.sql(
      """SET VAR seg_query =
        |  'SELECT c_mktsegment, count(*) AS n,
        |          CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |            AS total
        |   FROM customer_v WHERE c_acctbal >= ?
        |   GROUP BY c_mktsegment ORDER BY c_mktsegment'""".stripMargin)
    s.sql("EXECUTE IMMEDIATE seg_query USING 1000")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_execute_immediate" -> executeImmediate,
    "sql_parameterized" -> sqlParameterized,
    "sql_scripting" -> sqlScripting,
    "sql_udf_create" -> sqlUdfCreate,
    "sql_pipe_syntax" -> pipeSyntax,
    "sql_window_clause" -> windowClause,
    "sql_group_by_all" -> groupByAll,
    "sql_recursive_cte" -> recursiveCte,
    "sql_lateral" -> sqlLateral,
    "sql_correlated_subquery" -> correlatedScalar,
    "sql_cte_window" -> cteWindow,
    "sql_exists_subquery" -> existsSubquery,
    "sql_pivot" -> sqlPivot,
    "sql_asof" -> sqlAsOf)

  val oracles: Map[String, String] = Map(
    "sql_execute_immediate" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM customer WHERE c_acctbal >= 1000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "sql_parameterized" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice >= 25000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sql_scripting" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS big_total
        |FROM orders WHERE o_totalprice > 150000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sql_udf_create" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS tier,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_pipe_syntax" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sql_window_clause" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(row_number() OVER w AS INTEGER) AS rn,
        |       CAST(rank() OVER w AS INTEGER) AS rk,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |              OVER w AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "sql_group_by_all" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE e AS (
        |  SELECT CAST(date_trunc('microseconds', ts) AS DATE) AS day,
        |         user_id
        |  FROM events),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |spine(day) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT sp.day + 1 FROM spine sp, bounds b WHERE sp.day < b.hi),
        |daily AS (
        |  SELECT day, count(*) AS n_events,
        |         count(DISTINCT user_id) AS n_users
        |  FROM e GROUP BY 1)
        |SELECT day, coalesce(n_events, 0) AS n_events,
        |       coalesce(n_users, 0) AS n_users
        |FROM spine LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin,
    "sql_lateral" ->
      """SELECT n.n_name, c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM nation n
        |JOIN customer c ON c.c_nationkey = n.n_nationkey,
        |LATERAL (SELECT o_orderkey, o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |WHERE n.n_name IN ('NATION_3', 'NATION_7')
        |ORDER BY n_name, c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "sql_exists_subquery" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,
    "sql_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS medium
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
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
        |ORDER BY o_custkey, rnk""".stripMargin,
    // same oracle as join_asof_native: the correlated-subquery rendering
    // of backward as-of
    "sql_asof" ->
      """WITH p AS (
        |  SELECT user_id,
        |         max(date_trunc('microseconds', ts)) - INTERVAL 1 HOUR AS probe_ts
        |  FROM events GROUP BY user_id)
        |SELECT p.user_id, p.probe_ts,
        |       (SELECT e.value FROM events e
        |        WHERE e.user_id = p.user_id
        |          AND date_trunc('microseconds', e.ts) <= p.probe_ts
        |        ORDER BY date_trunc('microseconds', e.ts) DESC, e.event_id DESC
        |        LIMIT 1) AS last_value
        |FROM p ORDER BY user_id""".stripMargin)
}

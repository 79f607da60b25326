package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.E (window functions) + §2.F (sorts/limits/top-k).
  *
  * All per-entity windows partition by the entity key — one hash exchange,
  * then in-partition sort; `sort_limit` compiles to TakeOrderedAndProject
  * (per-partition top-k + merge on the driver, no global sort).
  */
object Windows extends graft.QueryModule {

  private def userWindow = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** Most-recent-row-per-entity selection (`fetch_data.py:197-198`). */
  private def latestRow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** Running last non-null value in time order (`Close.dropna().iloc[-1]`,
    * `fetch_data.py:156-160`). */
  private def lastNonNull(s: SparkSession, d: String): DataFrame = {
    val nulled = when(col("event_type") === "click", lit(null).cast("double"))
      .otherwise(col("value"))
    Tables.events(s, d)
      .withColumn("v", nulled)
      .withColumn("filled", last(col("v"), ignoreNulls = true)
        .over(userWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("filled"))
      .orderBy("event_id")
  }

  /** Trailing-4-row frame sum — the per-period TTM formulation
    * (`fetch_data.py:35`). */
  private def rollingFrame(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("ttm_asof", bround(
        sum(coalesce(col("value"), lit(0.0))).over(userWindow.rowsBetween(-3, 0)), 2))
      .select(col("event_id"), col("user_id"), col("ttm_asof"))
      .orderBy("event_id")

  /** Ranking/analytic top-k per group [N]: top-3 orders per customer with
    * the previous order's price (lag). */
  private def rankTopk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", bround(percent_rank().over(w), 6))
      .withColumn("cume", bround(cume_dist().over(w), 6))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("drk"), col("quartile"),
        col("pct_rank"), col("cume"),
        col("o_orderkey"), col("o_totalprice"), col("prev_price"), col("next_price"))
      .orderBy("o_custkey", "rk")
  }

  /** Order-by-recency + take-first-k (`fetch_data.py:35,198,156-160`) —
    * plans as TakeOrderedAndProject, not a full sort. */
  private def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Deterministic presentation order — the engine imposes a total order
    * where the reference's set-iteration was nondeterministic
    * (`fetch_data.py:282,308`). */
  private def sortOutput(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("n_nationkey"))
      .orderBy(col("r_name").asc, col("n_name").desc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_latest_row" -> latestRow,
    "win_last_nonnull" -> lastNonNull,
    "win_rolling_frame" -> rollingFrame,
    "win_rank_topk" -> rankTopk,
    "sort_limit" -> sortLimit,
    "sort_output" -> sortOutput)

  val oracles: Map[String, String] = Map(
    "win_latest_row" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "win_last_nonnull" ->
      """SELECT event_id, user_id,
        |       last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id
        |               ORDER BY date_trunc('microseconds', ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,
    "win_rolling_frame" ->
      """SELECT event_id, user_id,
        |       round_even(sum(coalesce(value, 0))
        |         OVER (PARTITION BY user_id
        |               ORDER BY date_trunc('microseconds', ts), event_id
        |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS ttm_asof
        |FROM events ORDER BY event_id""".stripMargin,
    "win_rank_topk" ->
      """SELECT o_custkey, rk, drk, quartile, pct_rank, cume, o_orderkey,
        |       o_totalprice, prev_price, next_price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER w AS INTEGER) AS rk,
        |         CAST(dense_rank() OVER w AS INTEGER) AS drk,
        |         CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |         round_even(percent_rank() OVER w, 6) AS pct_rank,
        |         round_even(cume_dist() OVER w, 6) AS cume,
        |         lag(o_totalprice, 1) OVER w AS prev_price,
        |         lead(o_totalprice, 1) OVER w AS next_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "sort_output" ->
      """SELECT r_name, n_name, n_nationkey
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name ASC, n_name DESC""".stripMargin)
}

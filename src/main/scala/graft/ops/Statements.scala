package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.StatementLine

/** SURVEY §1.3 — the reference's metric-row × period-column pandas matrix
  * re-modeled as long-format `Dataset[StatementLine]`, with recency by
  * window (never positional), and the reference's composite lookup
  * (`safe_get_row` alias probe at `fetch_data.py:20-27` feeding
  * `get_ttm_value` at 29-36) as one declarative plan:
  *
  *   1. keep only rows of alias-candidate metrics, tagged with priority;
  *   2. the chosen metric per entity = min priority PRESENT (first alias
  *      with any data — presence, not value, decides);
  *   3. TTM = sum of the 4 most-recent periods of the chosen metric.
  */
object Statements extends graft.QueryModule {

  /** events reshaped to typed statement lines (ticker=user, metric=type). */
  def statementLines(s: SparkSession, d: String): Dataset[StatementLine] = {
    import s.implicits._
    Tables.events(s, d).select(
      col("user_id").cast("string").as("ticker"),
      lit("events").as("statement"),
      col("event_type").as("metric"),
      col("ts").as("period_end"),
      col("value")).as[StatementLine]
  }

  private def aliasTtm(s: SparkSession, d: String): DataFrame = {
    // typed model is exercised (and its encoder checked) even though the
    // plan below re-reads with event_id as the recency tiebreak
    statementLines(s, d)
    val withIds = Tables.events(s, d).select(
      col("user_id").cast("string").as("ticker"),
      col("event_type").as("metric"),
      col("ts").as("period_end"),
      col("event_id"), col("value"))
    val cand = withIds
      .filter(col("metric").isin("purchase", "click"))
      .withColumn("prio", when(col("metric") === "purchase", 1).otherwise(2))
    val chosen = cand.groupBy(col("ticker")).agg(min(col("prio")).as("prio"))
    val w = Window.partitionBy(col("ticker"))
      .orderBy(col("period_end").desc, col("event_id").desc)
    cand.join(chosen, Seq("ticker", "prio"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .groupBy(col("ticker"))
      .agg(max(col("metric")).as("metric_used"),
        bround(sum(coalesce(col("value"), lit(0.0))), 2).as("ttm"))
      .orderBy("ticker")
  }

  /** Long → wide: the pandas statement matrix (metric rows × period
    * columns, `fetch_data.py:175-177`) recovered via pivot with an
    * EXPLICIT value list (deterministic columns, no driver-side
    * distinct scan). */
  private def pivotWide(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(bround(sum(coalesce(col("value"), lit(0.0))), 2))
      .orderBy("user_id")

  /** Wide → long: melt metric columns into (metric, value) rows — the
    * inverse reshape back into [[StatementLine]] form. */
  private def unpivotLong(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "value")
      .orderBy("p_partkey", "metric")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stmt_alias_ttm" -> aliasTtm,
    "stmt_pivot_wide" -> pivotWide,
    "stmt_unpivot_long" -> unpivotLong)

  val oracles: Map[String, String] = Map(
    "stmt_pivot_wide" ->
      """SELECT user_id,
        |       round_even(sum(CASE WHEN event_type = 'click' THEN coalesce(value, 0) END), 2) AS click,
        |       round_even(sum(CASE WHEN event_type = 'error' THEN coalesce(value, 0) END), 2) AS error,
        |       round_even(sum(CASE WHEN event_type = 'purchase' THEN coalesce(value, 0) END), 2) AS purchase,
        |       round_even(sum(CASE WHEN event_type = 'signup' THEN coalesce(value, 0) END), 2) AS signup,
        |       round_even(sum(CASE WHEN event_type = 'view' THEN coalesce(value, 0) END), 2) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stmt_unpivot_long" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "stmt_alias_ttm" ->
      """WITH cand AS (
        |  SELECT CAST(user_id AS VARCHAR) AS ticker, event_type AS metric,
        |         date_trunc('microseconds', ts) AS period_end, event_id, value,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS prio
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |), chosen AS (
        |  SELECT ticker, min(prio) AS prio FROM cand GROUP BY ticker
        |), ranked AS (
        |  SELECT c.*, row_number() OVER (PARTITION BY c.ticker
        |    ORDER BY c.period_end DESC, c.event_id DESC) AS rn
        |  FROM cand c JOIN chosen ch ON c.ticker = ch.ticker AND c.prio = ch.prio
        |)
        |SELECT ticker, max(metric) AS metric_used,
        |       round_even(sum(coalesce(value, 0)), 2) AS ttm
        |FROM ranked WHERE rn <= 4 GROUP BY ticker ORDER BY ticker""".stripMargin)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-data aggregates over the `events` stream table [N] — the
  * windows the reference's consumers compute downstream of its price
  * snapshots (time- and volume-weighted averages), expressed as one
  * window pass + one hash aggregate each.
  *
  * Float determinism: `value` carries exactly two decimals, so
  * `decimal(12,2)` weights make every weighted sum EXACT and
  * order-invariant; the single division to a double happens once per
  * group at the output boundary (never an incremental mean) — the same
  * discipline as [[TpchDeep]].
  */
object Finance extends graft.QueryModule {

  private def dec(c: String) = col(c).cast("decimal(12,2)")

  /** Time-weighted average price per user: each observation holds until
    * the next one, so its weight is the gap to the successor in
    * microseconds (exact integers); the last observation of a user has
    * no successor and carries no weight — the standard left-closed TWAP.
    * One window pass (lead), one hash agg. */
  private def twap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("w_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      // the exact-decimal numerator exceeds 2^53 units here, where
      // decimal->double conversion rounds differently across engines by
      // 1 ULP; a generic division is safe to pin at 6dp banker's
      .agg(bround(sum(dec("value") * col("w_us")).cast("double") /
        sum(col("w_us")).cast("double"), 6).as("twap"),
        sum(col("w_us")).as("span_us"))
      .orderBy("user_id")
  }

  /** Volume-weighted average price per user: volume rides the event's
    * JSON props (`$.k`); zero-volume ticks carry no weight and drop
    * before the aggregate, so the denominator is always positive for
    * every emitted user. */
  private def vwap(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("vol"))
      .filter(col("vol") > 0)
      .groupBy(col("user_id"))
      .agg((sum(dec("value") * col("vol")).cast("double") /
        sum(col("vol")).cast("double")).as("vwap"),
        sum(col("vol")).cast("bigint").as("total_vol"))
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fin_twap" -> twap,
    "fin_vwap" -> vwap)

  val oracles: Map[String, String] = Map(
    "fin_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |g AS (
        |  SELECT user_id, value,
        |         epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
        |                                    ORDER BY ts, event_id))
        |           - epoch_us(ts) AS w_us
        |  FROM e)
        |SELECT user_id,
        |       round_even(CAST(sum(CAST(value AS DECIMAL(12,2)) * w_us) AS DOUBLE)
        |         / CAST(sum(w_us) AS DOUBLE), 6) AS twap,
        |       CAST(sum(w_us) AS BIGINT) AS span_us
        |FROM g WHERE w_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "fin_vwap" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |         CAST(json_extract(props, '$.k') AS INTEGER) AS vol
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CAST(value AS DECIMAL(12,2)) * vol) AS DOUBLE)
        |         / CAST(sum(vol) AS DOUBLE) AS vwap,
        |       CAST(sum(vol) AS BIGINT) AS total_vol
        |FROM e WHERE vol > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}

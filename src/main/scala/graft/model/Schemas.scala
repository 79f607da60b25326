package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Typed data model (SURVEY.md §1). */

/** The reference's uniform 22-field snapshot record
  * (`fetch_data.py:246-273`; verified identical key set across all 199
  * golden data JSON files). */
case class StockSnapshot(
    ticker: String,
    name: String,
    price: Double,
    market_cap: Double,
    revenue_ttm: Double,
    net_income_ttm: Double,
    ocf_ttm: Double,
    capex_ttm: Double,
    sbc_ttm: Double,
    buyback_ttm: Double,
    total_debt: Double,
    cash_and_equivalents: Double,
    book_value_ttm: Double,
    shares_outstanding: Long,
    beta: Double,
    roe: Double,
    analyst_growth_estimate: Double,
    forward_eps: Double,
    dividend_yield: Double,
    sector_type: String,
    currency_code: String,
    last_updated: String)

/** Long-format financial-statement line (SURVEY §1.3): the reference's
  * metric-row × period-column pandas matrix re-modeled as rows, recency by
  * window, never positional. */
case class StatementLine(
    ticker: String,
    statement: String,
    metric: String,
    period_end: Timestamp,
    value: Option[Double])

/** `events` table row (driver testdata; ts already µs-truncated by
  * `graft.Tables.events`). */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Option[Double],
    props: String)

object Schemas {

  /** Schema-on-read contract for snapshot JSON records (`src_json_records`). */
  val snapshot: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("market_cap", DoubleType),
    StructField("revenue_ttm", DoubleType),
    StructField("net_income_ttm", DoubleType),
    StructField("ocf_ttm", DoubleType),
    StructField("capex_ttm", DoubleType),
    StructField("sbc_ttm", DoubleType),
    StructField("buyback_ttm", DoubleType),
    StructField("total_debt", DoubleType),
    StructField("cash_and_equivalents", DoubleType),
    StructField("book_value_ttm", DoubleType),
    StructField("shares_outstanding", LongType),
    StructField("beta", DoubleType),
    StructField("roe", DoubleType),
    StructField("analyst_growth_estimate", DoubleType),
    StructField("forward_eps", DoubleType),
    StructField("dividend_yield", DoubleType),
    StructField("sector_type", StringType),
    StructField("currency_code", StringType),
    StructField("last_updated", StringType)))

  /** `events` stream schema (for readStream / MemoryStream). */
  val event: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Manifest doc (`fetch_data.py:318-319`):
    * `{"lists": map<string, array<string>>, "last_updated": string}`. */
  val manifest: StructType = StructType(Seq(
    StructField("lists", MapType(StringType, ArrayType(StringType))),
    StructField("last_updated", StringType)))
}

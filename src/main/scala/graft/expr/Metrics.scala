package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's metric library re-expressed as pure `Column => Column`
  * functions — native Catalyst expressions only (no UDFs), so every metric
  * stays inside whole-stage codegen and is visible to the optimizer.
  *
  * Semantics derived from `/root/reference/fetch_data.py` (see file:line in
  * each Scaladoc). Two non-standard conventions matter everywhere
  * (SURVEY.md §1):
  *
  *   - '''0-as-missing sentinels''': the reference treats `0`/`0.0` like an
  *     absent value (Python truthiness). Encoded here via `nullif`-style
  *     `when(c === 0, null)` before `coalesce`.
  *   - '''Banker's rounding''': Python `round()` is round-half-to-even, so
  *     all rounding uses Spark `bround`, never `round` (HALF_UP).
  */
object Metrics {

  /** Python `a or b or ... or z` over numeric columns: a value counts only
    * if non-null AND non-zero; the final fallback is taken as-is.
    * Ref: price chain `fetch_data.py:142-146`, FX rate `fetch_data.py:45`. */
  def truthyCoalesce(cols: Column*): Column = {
    require(cols.nonEmpty)
    val init = cols.init.map(c => when(c.isNotNull && c =!= 0.0, c))
    coalesce(init :+ cols.last: _*)
  }

  /** `x * 100 if x else 0.0` — percent scaling with Python truthiness.
    * Ref: roe / dividend_yield `fetch_data.py:240-243`. */
  def pctScale(c: Column): Column =
    coalesce(when(c.isNotNull && c =!= 0.0, c * 100), lit(0.0))

  /** First present (non-null) value from an ordered alias list — the
    * wide-format equivalent of `safe_get_row` probing metric-name aliases.
    * Ref: `fetch_data.py:20-27`, call sites 180-189, 197-206, 218-223. */
  def aliasFirstMatch(cols: Column*): Column = coalesce(cols: _*)

  /** First alias whose value is strictly positive; a present-but-
    * non-positive candidate is skipped. Missing everywhere => 0.0.
    * Ref: short-term investments `fetch_data.py:211-216`. */
  def firstPositive(cols: Column*): Column =
    coalesce(cols.map(c => when(c > 0, c)) :+ lit(0.0): _*)

  /** Ticker symbol normalization `BRK.B` -> `BRK-B`.
    * Ref: `fetch_data.py:130` and file naming `312-314`. */
  def normalizeTicker(c: Column): Column = translate(c, ".", "-")

  /** Ordered first-match-wins substring classifier over (sector, industry)
    * -> 8-class domain. Rule order is semantic (e.g. Semiconductor must win
    * over SaaS; 'Drug' catches 'Drug Manufacturers').
    * Ref: `determine_sector`, `fetch_data.py:53-66`. */
  def classifySector(sector: Column, industry: Column): Column = {
    val s = coalesce(sector, lit(""))
    val i = coalesce(industry, lit(""))
    when(i.contains("Semiconductor") || s.contains("Semiconductor"), "Semiconductor")
      .when(i.contains("Software") || s.contains("Technology Services"), "SaaS")
      .when(i.contains("Consumer Electronics") || i.contains("Computer Hardware"), "Hardware")
      .when(i.contains("Biotechnology") || i.contains("Drug"), "BioTech")
      .when(i.contains("Bank") || s.contains("Financial") || i.contains("Insurance"), "Financial")
      .when(s.contains("Energy") || i.contains("Oil") || s.contains("Utilities"), "Energy/Utility")
      .when(s.contains("Real Estate") || i.contains("REIT"), "REIT")
      .otherwise("General")
  }

  /** Implied growth: `pe/peg` when both truthy and `peg > 0`, else
    * `revenueGrowth * 100` when present (null-check only — 0.0 revenue
    * growth IS used), else 3.0.
    * Ref: `calculate_sane_growth_rate` first half, `fetch_data.py:84-96`. */
  def impliedGrowth(pe: Column, peg: Column, revenueGrowth: Column): Column =
    when(pe.isNotNull && pe =!= 0.0 && peg.isNotNull && peg =!= 0.0 && peg > 0, pe / peg)
      .otherwise(coalesce(revenueGrowth * 100, lit(3.0)))

  /** Sector-config clamp of an implied growth rate:
    *   - below `min`: 3.0 for cyclical sectors, `min` for non-cyclical;
    *   - above `max`: `max`;
    *   - mega-cap rule: marketCap > 5e11 and clamped value > 30 => 30.0;
    *   - banker's-rounded to 2 dp.
    * Ref: `calculate_sane_growth_rate` second half, `fetch_data.py:98-108`. */
  def clampGrowth(implied: Column, minG: Column, maxG: Column,
                  cyclical: Column, marketCap: Column): Column = {
    val clamped =
      when(implied < minG, when(cyclical, 3.0).otherwise(minG))
        .when(implied > maxG, maxG)
        .otherwise(implied)
    bround(when(marketCap > 5e11 && clamped > 30, 30.0).otherwise(clamped), 2)
  }

  /** Beta winsorization: null -> 1.0; `< 0.5` -> 1.2 for high-vol sectors
    * (SaaS/Semiconductor/BioTech) else 0.8; size-tiered caps are EXCLUSIVE
    * (`elif`): mcap > 1e12 caps at 1.35, else mcap > 2e11 caps at 1.6;
    * global cap 2.5; surviving raw values banker's-rounded to 2 dp.
    * Ref: `sanitize_beta`, `fetch_data.py:110-124`. */
  def winsorizeBeta(rawBeta: Column, sectorType: Column, marketCap: Column): Column = {
    val highVol = sectorType.isin("SaaS", "Semiconductor", "BioTech")
    when(rawBeta.isNull, 1.0)
      .when(rawBeta < 0.5, when(highVol, 1.2).otherwise(0.8))
      .when(marketCap > 1e12 && rawBeta > 1.35, 1.35)
      .when(marketCap <= 1e12 && marketCap > 2e11 && rawBeta > 1.6, 1.6)
      .when(rawBeta > 2.5, 2.5)
      .otherwise(bround(rawBeta, 2))
  }

  /** Book-value fallback: when the balance-sheet figure is 0/absent, use
    * per-share book value x shares outstanding.
    * Ref: `fetch_data.py:226-227`. */
  def bookValueFallback(balanceSheetEquity: Column, bookValuePerShare: Column,
                        shares: Column): Column =
    when(balanceSheetEquity.isNull || balanceSheetEquity === 0.0,
      coalesce(bookValuePerShare, lit(0.0)) * shares)
      .otherwise(balanceSheetEquity)

  /** The 7-row sector config dim of `fetch_data.py:72-80` as literal rows
    * `(sector_type, max, min, cyclical)` — broadcast-join it, never collect. */
  val sectorConfig: Seq[(String, Double, Double, Boolean)] = Seq(
    ("Semiconductor", 60.0, -5.0, true),
    ("SaaS", 45.0, 0.0, false),
    ("BioTech", 40.0, -10.0, true),
    ("Financial", 15.0, 0.0, true),
    ("REIT", 10.0, 0.0, false),
    ("Energy/Utility", 10.0, -5.0, true),
    ("General", 20.0, -2.0, false))
}

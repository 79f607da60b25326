package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Metrics

/** Unit expectations for the metric library, hand-computed from
  * `/root/reference/fetch_data.py` semantics (SURVEY §5.2): banker's-
  * rounding ties, 0-sentinel truthiness, first-positive skipping
  * negatives, classifier rule order, EXCLUSIVE winsorize tiers. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Evaluate a Column over a single dummy row. */
  private def eval(c: Column): Any = {
    import spark.implicits._
    Seq(1).toDF("dummy").select(c.as("r")).head().get(0)
  }

  private def d(v: Double): Column = lit(v)
  private val nul: Column = lit(null).cast("double")

  test("truthyCoalesce: 0 counts as missing (fetch_data.py:142-146)") {
    assert(eval(Metrics.truthyCoalesce(d(0.0), nul, d(5.0))) == 5.0)
    assert(eval(Metrics.truthyCoalesce(d(0.0), d(3.0), d(1.0))) == 3.0)
    assert(eval(Metrics.truthyCoalesce(d(2.0), d(3.0), d(1.0))) == 2.0)
    // all falsy: the final fallback is returned AS-IS (0, like Python `or`)
    assert(eval(Metrics.truthyCoalesce(d(0.0), nul, d(0.0))) == 0.0)
  }

  test("firstPositive skips present-but-negative aliases (fetch_data.py:211-216)") {
    assert(eval(Metrics.firstPositive(d(-1.0), d(5.0))) == 5.0)
    assert(eval(Metrics.firstPositive(nul, d(-2.0), d(7.0))) == 7.0)
    assert(eval(Metrics.firstPositive(d(-1.0), nul)) == 0.0)
  }

  test("banker's rounding on exact ties (Python round == bround)") {
    // Python: round(0.125,2)=0.12 round(0.375,2)=0.38 round(2.5)=2 round(3.5)=4
    assert(eval(bround(d(0.125), 2)) == 0.12)
    assert(eval(bround(d(0.375), 2)) == 0.38)
    assert(eval(bround(d(2.5), 0)) == 2.0)
    assert(eval(bround(d(3.5), 0)) == 4.0)
  }

  test("classifySector rule order (fetch_data.py:53-66)") {
    def cls(sector: String, industry: String): Any =
      eval(Metrics.classifySector(lit(sector), lit(industry)))
    // Semiconductor wins over SaaS even when industry also has Software
    assert(cls("Technology", "Semiconductor Software") == "Semiconductor")
    assert(cls("Technology Services", "Anything") == "SaaS")
    assert(cls("Healthcare", "Drug Manufacturers - General") == "BioTech")
    assert(cls("Financial Services", "Banks - Diversified") == "Financial")
    assert(cls("Energy", "Oil & Gas Midstream") == "Energy/Utility")
    // Financial is checked BEFORE Energy: an insurance row in an Energy
    // sector classifies Financial
    assert(cls("Energy", "Insurance Brokers") == "Financial")
    assert(cls("Real Estate", "REIT - Office") == "REIT")
    assert(cls("Unknown", "Unknown") == "General")
    assert(eval(Metrics.classifySector(nul.cast("string"), nul.cast("string"))) == "General")
  }

  test("clampGrowth: cyclical floor maps to 3.0, non-cyclical to min (fetch_data.py:98-108)") {
    def g(implied: Double, min: Double, max: Double, cyc: Boolean, mcap: Double): Any =
      eval(Metrics.clampGrowth(d(implied), d(min), d(max), lit(cyc), d(mcap)))
    assert(g(-8.0, -5.0, 60.0, true, 1e9) == 3.0)   // cyclical below min
    assert(g(-8.0, 0.0, 45.0, false, 1e9) == 0.0)   // non-cyclical -> min
    assert(g(70.0, -5.0, 60.0, true, 1e9) == 60.0)  // above max -> max
    assert(g(12.345, 0.0, 45.0, false, 1e9) == 12.34) // pass-through; binary 12.345 < decimal tie, like Python
    assert(g(70.0, -5.0, 60.0, true, 6e11) == 30.0) // mega-cap cap at 30
    assert(g(25.0, -5.0, 60.0, true, 6e11) == 25.0) // mega-cap only if > 30
  }

  test("winsorizeBeta: EXCLUSIVE size tiers (elif at fetch_data.py:117-120)") {
    def b(beta: java.lang.Double, sector: String, mcap: Double): Any =
      eval(Metrics.winsorizeBeta(
        if (beta == null) nul else d(beta), lit(sector), d(mcap)))
    assert(b(null, "General", 1e9) == 1.0)
    assert(b(0.3, "SaaS", 1e9) == 1.2)
    assert(b(0.3, "General", 1e9) == 0.8)
    assert(b(1.5, "General", 2e12) == 1.35)  // >1e12 tier
    assert(b(2.0, "General", 2e12) == 1.35)  // still the 1.35 cap, NOT 1.6
    assert(b(1.7, "General", 3e11) == 1.6)   // (2e11, 1e12] tier
    assert(b(1.5, "General", 3e11) == 1.5)   // below tier cap: rounded raw
    assert(b(3.0, "General", 1e9) == 2.5)    // global cap
    assert(b(1.234567, "General", 1e9) == 1.23)
  }

  test("bookValueFallback (fetch_data.py:226-227)") {
    assert(eval(Metrics.bookValueFallback(d(0.0), d(2.5), lit(100L))) == 250.0)
    assert(eval(Metrics.bookValueFallback(nul, d(2.5), lit(100L))) == 250.0)
    assert(eval(Metrics.bookValueFallback(d(42.0), d(2.5), lit(100L))) == 42.0)
  }

  test("pctScale truthiness (fetch_data.py:240-243)") {
    assert(eval(Metrics.pctScale(d(0.17))) == 17.0)
    assert(eval(Metrics.pctScale(d(0.0))) == 0.0)
    assert(eval(Metrics.pctScale(nul)) == 0.0)
  }

  test("normalizeTicker (fetch_data.py:130)") {
    assert(eval(Metrics.normalizeTicker(lit("BRK.B"))) == "BRK-B")
    assert(eval(Metrics.normalizeTicker(lit("AAPL"))) == "AAPL")
  }
}

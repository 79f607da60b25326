package graft

import org.scalatest.funsuite.AnyFunSuite

/** PACF + Adamic-Adar: structural invariants. */
class AutocorrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("ts_pacf: 6 lags, values in [-1,1], lag-1 pacf equals lag-1 rho") {
    val rows = SparkEntry.queries("ts_pacf")(spark, sf)
      .orderBy("lag").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("rho")) <= 1.0)
      assert(math.abs(r.getAs[Double]("pacf")) <= 1.0)
    }
    // Durbin-Levinson base case: phi_{1,1} = rho_1 exactly
    assert(rows.head.getAs[Double]("pacf") == rows.head.getAs[Double]("rho"))
    // daily revenue is near-white: no autocorrelation above 0.2
    rows.foreach(r => assert(math.abs(r.getAs[Double]("rho")) < 0.2))
  }

  test("graph_adamic_adar: scores positive, pairs are non-edges," +
    " weights below the 1/ln(2) per-neighbor cap") {
    val out = SparkEntry.queries("graph_adamic_adar")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 100)
    val maxPerCommon = 1.0 / math.log(2.0)
    out.foreach { r =>
      val (common, aa) =
        (r.getAs[Long]("common"), r.getAs[Double]("adamic_adar"))
      assert(common >= 1)
      assert(aa > 0.0)
      // each common neighbor contributes at most 1/ln(2) (deg >= 2)
      assert(aa <= common * maxPerCommon + 1e-9)
    }
    // descending score order with (x, y) tie-break
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("adamic_adar") >= b.getAs[Double]("adamic_adar"))
    }
  }
}

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

  test("ts_hmm_viterbi: regimes partition the days and persist (median" +
    " switch cost beats per-day flipping)") {
    val rows = SparkEntry.queries("ts_hmm_viterbi")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length > 2000)
    val regs = rows.map(_.getAs[String]("regime"))
    assert(regs.toSet.subsetOf(Set("H", "L")))
    // the sticky transition prior (0.9 stay) must yield long runs:
    // far fewer switches than a per-day obs readout would give
    val switches = regs.sliding(2).count { case Array(a, b) => a != b }
    val obsSwitches = rows.map(_.getAs[Int]("obs")).sliding(2)
      .count { case Array(a, b) => a != b }
    assert(switches < obsSwitches,
      s"Viterbi smoothing lost: $switches vs obs $obsSwitches")
    // decoded regime still tracks the observation (H = high days)
    val hObs = rows.filter(_.getAs[String]("regime") == "H")
      .map(_.getAs[Int]("obs"))
    if (hObs.nonEmpty)
      assert(hObs.sum.toDouble / hObs.length > 0.5)
  }

  test("attr_top_paths: 20 paths, counts descend, segments are event" +
    " types") {
    val rows = SparkEntry.queries("attr_top_paths")(spark, sf).collect()
    assert(rows.length == 20)
    val types = Set("click", "error", "purchase", "signup", "view")
    rows.foreach { r =>
      r.getAs[String]("path").split(">").foreach(t =>
        assert(types.contains(t), s"unknown event type $t"))
    }
    rows.map(_.getAs[Long]("n_users")).sliding(2)
      .foreach { case Array(a, b) => assert(a >= b) }
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

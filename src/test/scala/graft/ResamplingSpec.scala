package graft

import org.scalatest.funsuite.AnyFunSuite

/** Statistical laws for the hash-coin resampling family
  * (`ops.Resampling`). Cross-engine equality lives in the oracle gate;
  * here we pin that the md5-coin draws actually behave like the
  * distributions they claim (the part an oracle twin cannot see). */
class ResamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("stats_bootstrap: CI brackets the mean; se positive; replicate count fixed") {
    val rows = SparkEntry.queries("stats_bootstrap")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("b_cnt") == 64L)
      val m = r.getAs[Double]("boot_mean")
      val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
      assert(lo < m && m < hi, s"CI does not bracket mean: $r")
      assert(r.getAs[Double]("boot_se") > 0.0)
      // bootstrap se of a mean over n_g ~ 1200 orders at sf0.001 is a
      // few percent of the mean, never its own magnitude
      assert(r.getAs[Double]("boot_se") < m / 5.0, r.toString)
    }
  }

  test("stats_bootstrap: replicate mean stays within a few SE of the true mean") {
    import org.apache.spark.sql.functions._
    val truth = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("g"))
      .agg((sum(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
        .cast("double") / count(lit(1)) / lit(100.0)).as("mean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    SparkEntry.queries("stats_bootstrap")(spark, sf).collect().foreach { r =>
      val t = truth(r.getAs[String]("g"))
      val dev = math.abs(r.getAs[Double]("boot_mean") - t)
      assert(dev < 5.0 * r.getAs[Double]("boot_se"),
        s"bootstrap mean biased: $r vs true $t")
    }
  }

  test("stats_randomization: p-value in (0,1]; count consistency") {
    val r = SparkEntry.queries("stats_randomization")(spark, sf).collect().head
    val b = r.getAs[Long]("b_cnt"); val nGe = r.getAs[Long]("n_ge")
    val p = r.getAs[Double]("p_value")
    assert(b == 128L && nGe >= 0 && nGe <= b)
    assert(math.abs(p - (1.0 + nGe) / (b + 1.0)) < 1e-15)
    assert(p > 0.0 && p <= 1.0)
  }

  test("quality_dp_counts: noise bounded by the capped geometric support") {
    val rows = SparkEntry.queries("quality_dp_counts")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val noise = r.getAs[Long]("noise")
      assert(math.abs(noise) <= 8, s"noise outside capped support: $r")
      assert(r.getAs[Long]("noisy_n") == r.getAs[Long]("n") + noise)
      assert(math.abs(r.getAs[Double]("epsilon") - math.log(2.0)) < 1e-15)
    }
  }
}

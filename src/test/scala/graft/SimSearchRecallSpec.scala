package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quality gate for the approximate NN path: IVF/LSH answers are only
  * useful if they actually recover most of the exact top-k. Recall is
  * deterministic here (fixed data, hash-derived hyperplanes), so a drop
  * below the recorded floor means the bucketing scheme regressed. */
class SimSearchRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF top-10 recall vs exact top-10 on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("sim_search_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall")
    assert(recall >= 0.5, s"recall@10 regressed: $recall")
  }

  test("k-means IVF top-10 recall vs exact top-10 on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("sim_search_ivf_kmeans")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"k-means IVF recall@10 = $recall")
    assert(recall >= 0.5, s"recall@10 regressed: $recall")
  }
}

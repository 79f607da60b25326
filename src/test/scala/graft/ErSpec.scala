package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fellegi–Sunter linkage recovers the planted duplicates exactly. */
class ErSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("er_fellegi_sunter: perfect precision and recall on the planted pairs") {
    val rows = SparkEntry.queries("er_fellegi_sunter")(spark, sf).collect()
    assert(rows.nonEmpty)
    // precision: every linked pair IS a planted duplicate (same source key)
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") == r.getAs[Long]("b_src"),
        s"false positive link: $r")
      assert(r.getAs[Double]("jw") >= 0.92)
      assert(r.getAs[Double]("score") > 6.0)
    }
    // recall: every planted duplicate is linked
    val planted = Tables.customer(spark, sf)
      .filter("c_custkey % 5 = 0").count()
    assert(rows.length.toLong == planted,
      s"recall gap: ${rows.length} links vs $planted planted dups")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Model laws for Markov removal-effect attribution (`ops.Attribution`). */
class AttributionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("attr_markov_removal: probabilities proper; attribution sums to 1; removal hurts") {
    val rows = SparkEntry.queries("attr_markov_removal")(spark, sf).collect()
    assert(rows.length == 4)
    val base = rows.head.getAs[Double]("base_p")
    rows.foreach { r =>
      assert(r.getAs[Double]("base_p") == base) // one chain, one base
      val rp = r.getAs[Double]("removed_p")
      assert(rp >= 0.0 && rp <= base,
        s"removing a channel must not raise conversion: $r")
      assert(r.getAs[Double]("removal_effect") >= 0.0)
    }
    assert(base > 0.0 && base < 1.0)
    val attrSum = rows.map(_.getAs[Double]("attribution")).sum
    assert(math.abs(attrSum - 1.0) < 1e-9, s"attribution sum $attrSum")
  }

  test("attr_markov_removal: all four touch channels present") {
    val rows = SparkEntry.queries("attr_markov_removal")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("channel")).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
  }
}

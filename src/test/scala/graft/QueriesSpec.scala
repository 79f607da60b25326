package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query key executes at sf0.001 (the driver's t1 shape);
  * contract invariants between `queries` and `oracleSql`. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf0001)
      assert(df.count() >= 0)
    }
  }
}

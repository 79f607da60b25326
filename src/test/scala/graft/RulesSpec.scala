package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.CollapseNestedBround

/** The injected optimizer rule: nested banker's roundings collapse when
  * the outer scale is no finer, and only then. */
class RulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def broundCount(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case b: org.apache.spark.sql.catalyst.expressions.BRound => n += 1; b
    }
    n
  }

  test("bround(bround(x,2),4) collapses to one BRound; values unchanged") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapseNestedBround
    try {
      // parquet-backed (a literal Seq would be ConvertToLocalRelation-
      // folded before BRound could be counted)
      val df = Tables.lineitem(spark, TestSpark.sf0001)
        .select(col("l_extendedprice").as("x"))
      val stacked = df.select(bround(bround(col("x"), 2), 4).as("r"))
      assert(broundCount(stacked) == 1)
      val single = df.select(bround(col("x"), 2).as("r"))
      assert(stacked.collect().map(_.getDouble(0)).toSeq ==
        single.collect().map(_.getDouble(0)).toSeq)
      // finer outer scale must NOT collapse (it is not the identity)
      val finer = df.select(bround(bround(col("x"), 4), 2).as("r"))
      assert(broundCount(finer) == 2)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CollapseNestedBround)
    }
  }
}

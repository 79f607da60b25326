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

  test("RewriteRangeJoin: naive BETWEEN join re-plans as a binned equi-join") {
    import graft.rules.RewriteRangeJoin
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteRangeJoin
    try {
      val c = Tables.customer(spark, TestSpark.sf0001)
        .select(col("c_custkey"), (col("c_acctbal") * 10).as("lo"))
        .withColumn("hi", col("lo") + 500)
      val o = Tables.orders(spark, TestSpark.sf0001)
        .select(col("o_orderkey"), col("o_totalprice"))
      def q() = o.join(c, col("o_totalprice").between(col("lo"), col("hi")))
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy("c_custkey", "o_orderkey")
      // without the conf: nested loop (the only plan Spark has for this)
      val naive = q()
      assert(naive.queryExecution.executedPlan.toString
        .contains("NestedLoop"), "expected the naive plan to nested-loop")
      val expected = naive.collect().toSeq
      // with the conf: hash join on the bucket, same rows
      spark.conf.set(RewriteRangeJoin.WidthConf, "500.0")
      try {
        val rewritten = q()
        val p = rewritten.queryExecution.executedPlan.toString
        assert(!p.contains("NestedLoop"), p)
        assert(p.contains("__graft_bucket"), p)
        assert(rewritten.collect().toSeq == expected)
      } finally spark.conf.unset(RewriteRangeJoin.WidthConf)
      // an equi-keyed join must NOT be touched even with the conf set
      spark.conf.set(RewriteRangeJoin.WidthConf, "500.0")
      try {
        val equi = o.join(c, col("o_orderkey") === col("c_custkey") &&
          col("o_totalprice") >= col("lo"))
        assert(!equi.queryExecution.executedPlan.toString
          .contains("__graft_bucket"))
      } finally spark.conf.unset(RewriteRangeJoin.WidthConf)
      // the UPPER-BOUND-FIRST formulation (hi >= x AND x >= lo) must
      // pair too — headOption used to silently skip it (ADVICE r6)
      spark.conf.set(RewriteRangeJoin.WidthConf, "500.0")
      try {
        val flipped = o.join(c,
          col("hi") >= col("o_totalprice") && col("o_totalprice") >= col("lo"))
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy("c_custkey", "o_orderkey")
        val p = flipped.queryExecution.executedPlan.toString
        assert(!p.contains("NestedLoop"), p)
        assert(p.contains("__graft_bucket"), p)
        assert(flipped.collect().toSeq == expected)
      } finally spark.conf.unset(RewriteRangeJoin.WidthConf)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.rules.RewriteRangeJoin)
    }
  }

  test("RewriteAggregateToSummary: eligible fact aggregate served from the " +
    "summary; ineligible shapes untouched") {
    import graft.rules.RewriteAggregateToSummary
    import RewriteAggregateToSummary.{PathConf, SourceConf, SumQty, SumBase, Cnt}
    val d = TestSpark.sf0001
    val mvPath = "target/tmp/mv_lineitem_spec"
    val li = Tables.lineitem(spark, d)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as(SumQty),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as(SumBase),
        count(lit(1)).as(Cnt))
      .write.mode("overwrite").parquet(mvPath)
    def naive() = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    val expected = naive().collect().toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteAggregateToSummary
    spark.conf.set(PathConf, mvPath)
    spark.conf.set(SourceConf, s"$d/lineitem")
    try {
      // through the real optimizer: the plan reads the summary, the
      // values are indistinguishable from the direct fact scan
      val served = naive()
      assert(RewriteAggregateToSummary.servesFrom(
        served.queryExecution.optimizedPlan, mvPath),
        served.queryExecution.optimizedPlan.treeString)
      assert(served.collect().toSeq == expected)
      assert(served.schema == naive().schema)
      // a measure the summary cannot merge (sum of a THIRD column)
      // must leave the fact scan in place
      val other = li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_discount").cast("decimal(18,2)")).as("sum_disc"))
      assert(!RewriteAggregateToSummary.servesFrom(
        other.queryExecution.optimizedPlan, mvPath))
      // a grouping key outside the summary's keys must too
      val finer = li.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"))
      assert(!RewriteAggregateToSummary.servesFrom(
        finer.queryExecution.optimizedPlan, mvPath))
    } finally {
      spark.conf.unset(PathConf); spark.conf.unset(SourceConf)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == RewriteAggregateToSummary)
    }
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

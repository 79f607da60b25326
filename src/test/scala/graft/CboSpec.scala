package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization is a STATISTICS pipeline, not a config flag:
  * without ANALYZE the optimizer sees only file sizes; with table +
  * column stats it sees row counts and NDVs and can estimate filtered
  * cardinalities. At 100 TB this is the difference between "shuffle
  * both sides because the filtered dim LOOKS big" and "broadcast the
  * 0.1% survivor side" — so the stats path itself needs a regression
  * gate. */
class CboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ANALYZE TABLE feeds row counts and filtered-cardinality estimates") {
    val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS cbo_orders_t")
      Tables.orders(spark, TestSpark.sf0001)
        .write.mode("overwrite").saveAsTable("cbo_orders_t")
      val total = spark.table("cbo_orders_t").count()

      spark.sql("ANALYZE TABLE cbo_orders_t COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_orders_t COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderpriority, o_custkey")

      // table stats: the optimizer now knows the exact row count
      val stats = spark.table("cbo_orders_t")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(total)),
        s"rowCount ${stats.rowCount} != $total after ANALYZE")

      // column stats: an equality filter on a 5-value column estimates
      // ~total/5 rows, not the unfiltered table size — the signal a
      // broadcast decision needs at scale
      val filtered = spark.table("cbo_orders_t")
        .filter(col("o_orderpriority") === "1-URGENT")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined, "filtered estimate missing")
      val est = filtered.rowCount.get.toDouble
      assert(est > total / 20.0 && est < total / 2.0,
        s"filter estimate $est implausible for a 5-value column of $total rows")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_orders_t")
      prevCbo match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }
}

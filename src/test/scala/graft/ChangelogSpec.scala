package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the snapshot-diff changelog (`cdc_capture`), the
  * sweep-line concurrency timeline, and the fixed-width histogram —
  * invariants the DuckDB oracle's hash equality can't articulate. */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("cdc ops partition cleanly: I not in prev, D not in curr, U differs") {
    val log = SparkEntry.queries("cdc_capture")(spark, d)
    val byOp = log.groupBy(col("op")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts exist (keys % 11 == 3 that survive % 7), deletes exist,
    // updates exist (keys % 5 == 0 present in both snapshots)
    assert(byOp.keySet == Set("I", "D", "U"))
    val badI = log.filter(col("op") === "I" && col("old_price").isNotNull)
    val badD = log.filter(col("op") === "D" && col("new_price").isNotNull)
    val badU = log.filter(col("op") === "U" &&
      !(col("old_price") =!= col("new_price")))
    assert(badI.count() == 0 && badD.count() == 0 && badU.count() == 0)
  }

  test("cdc emits no row for unchanged keys") {
    val log = SparkEntry.queries("cdc_capture")(spark, d)
    // an unchanged key: in both snapshots (not %11==3, not %7==2) and
    // not price-bumped (%5 != 0) — none may appear in the changelog
    val unchanged = log.filter(
      col("o_orderkey") % 11 =!= 3 && col("o_orderkey") % 7 =!= 2 &&
      col("o_orderkey") % 5 =!= 0).count()
    assert(unchanged == 0L)
  }

  test("sweep concurrency: running sum never negative, closes at zero") {
    val t = SparkEntry.queries("win_sweep_concurrency")(spark, d)
    assert(t.filter(col("active") < 0).count() == 0L)
    val last = t.orderBy(col("day").desc).limit(1)
      .collect()(0).getAs[Long]("active")
    assert(last == 0L, s"timeline must close at 0, got $last")
    // deltas are conservative: sum(net) over the whole timeline is 0
    val netSum = t.agg(sum(col("net"))).collect()(0).getLong(0)
    assert(netSum == 0L)
  }

  test("histogram buckets partition the table exactly") {
    val h = SparkEntry.queries("agg_histogram")(spark, d)
    val n = h.agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(n == Tables.orders(spark, d).count())
    val badBucket = h.filter(col("bucket") < 0 || col("bucket") > 19).count()
    assert(badBucket == 0L)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank

/** GlobalRank must BE row_number/ntile — same numbers, no global
  * exchange: the whole point is replacing the unpartitioned window's
  * single-partition sort with range partitions + offsets. */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("withRank equals the global row_number at several partition counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate-heavy sort values force the unique-tiebreak contract
    val df = (1L to 5000L).map(i => (i, rnd.nextInt(40))).toDF("id", "v")
    val expect = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "rk").as[(Long, Int)].collect().toMap
    for (p <- Seq(1, 4, 32)) {
      val got = GlobalRank.withRank(df, Seq(col("v"), col("id")), "rk", p)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got.size == expect.size)
      expect.foreach { case (id, rk) =>
        assert(got(id) == rk.toLong, s"id $id at $p partitions")
      }
    }
  }

  test("ntileFromRank reproduces ANSI ntile for uneven fills") {
    import spark.implicits._
    for (n <- Seq(3L, 4L, 5L, 10L, 17L, 100L, 101L); k <- Seq(2, 4, 7)) {
      val df = (1L to n).toDF("rank")
      val got = df.select(col("rank"),
          GlobalRank.ntileFromRank(col("rank"), n, k).as("b"))
        .as[(Long, Int)].collect().toMap
      val expect = (1L to n).toDF("x")
        .withColumn("b", ntile(k).over(Window.orderBy(col("x"))))
        .as[(Long, Int)].collect().toMap
      (1L to n).foreach { i =>
        assert(got(i) == expect(i), s"rank $i of n=$n k=$k")
      }
    }
  }

  test("the rank plan contains no unpartitioned window exchange") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
    val plan = GlobalRank.withRank(df, Seq(col("v"), col("id")), "rk", 4)
      .queryExecution.executedPlan.toString
    // a global window plans SinglePartition; the construction must not
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange found:\n$plan")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The single-pass SimHashAgg must be bit-identical to the reference
  * 64-separate-sum formulation, across partition counts (merge path). */
class SimHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def referenceSimhash(df: org.apache.spark.sql.DataFrame) = {
    val bitAggs = (0 until 64).map(i =>
      sum(when(expr(s"(shiftright(h, $i) & 1) = 1"), 1).otherwise(-1)).as(s"b$i"))
    df.groupBy(col("k")).agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("sig", expr(
        (0 until 64).map(i => s"IF(b$i > 0, shiftleft(1L, $i), 0L)").mkString(" + ")))
      .select(col("k"), col("sig"))
  }

  test("matches the 64-slot sum formulation on hashed words, any partitioning") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val words = (1 to 500).map(i => (i % 7, s"word$i"))
    for (parts <- Seq(1, 8)) {
      val df = words.toDF("k", "w").repartition(parts)
        .withColumn("h", xxhash64(col("w")))
      val got = df.groupBy(col("k"))
        .agg(VectorFunctions.simhash(col("h")).as("sig"))
        .orderBy("k").as[(Int, Long)].collect().toSeq
      val want = referenceSimhash(df).orderBy("k").as[(Int, Long)].collect().toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("null hashes are skipped; empty group yields signature 0") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((1, Some(-1L)), (1, None), (2, None))
      .toDF("k", "h")
    val got = df.groupBy(col("k"))
      .agg(VectorFunctions.simhash(col("h")).as("sig"))
      .orderBy("k").as[(Int, Long)].collect().toSeq
    // k=1: single hash -1L = all 64 bits set -> signature all-ones = -1L
    // k=2: only nulls -> all counts 0, no bit positive -> 0L
    assert(got == Seq((1, -1L), (2, 0L)))
  }

  test("works through SQL as a registered aggregate") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((1, "a"), (1, "b")).toDF("k", "w").createOrReplaceTempView("shs_t")
    val n = spark.sql(
      "SELECT k, graft_simhash(xxhash64(w)) AS sig FROM shs_t GROUP BY k").count()
    assert(n == 1)
  }
}

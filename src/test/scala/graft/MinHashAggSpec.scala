package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{MinHashAgg, VectorFunctions}

/** The one-pass MinHash aggregate must equal a driver-side recomputation
  * of the same mix over the same inputs, at any partitioning, and obey
  * the min-merge property that makes LSH banding sound. */
class MinHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 8

  /** Same mixing, computed independently of the aggregate. */
  private def refSignature(hashes: Seq[Long]): Seq[Long] =
    (0 until K).map(k => hashes.map(h => MinHashAgg.mix(h, k)).min)

  test("matches driver-side recomputation, any partitioning") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val words = (1 to 300).map(i => (i % 5, s"tok$i"))
    for (parts <- Seq(1, 7)) {
      val df = words.toDF("k", "w").repartition(parts)
        .withColumn("h", xxhash64(col("w")))
      val got = df.groupBy(col("k"))
        .agg(VectorFunctions.minhash(col("h"), K).as("sig"))
        .orderBy("k").as[(Int, Seq[Long])].collect().toSeq
      val baseHashes = df.select(col("k"), col("h")).as[(Int, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val want = baseHashes.toSeq.sortBy(_._1)
        .map { case (k, hs) => (k, refSignature(hs)) }
      assert(got == want, s"parts=$parts")
    }
  }

  test("min-merge property: signature of a union is the elementwise min") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val a = (1 to 50).map(i => ("a", s"w$i"))
    val b = (40 to 90).map(i => ("b", s"w$i"))
    val u = (a ++ b).map { case (_, w) => ("u", w) }
    val df = (a ++ b ++ u).toDF("k", "w").withColumn("h", xxhash64(col("w")))
    val sigs = df.groupBy(col("k"))
      .agg(VectorFunctions.minhash(col("h"), K).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    val expected = sigs("a").zip(sigs("b")).map { case (x, y) => math.min(x, y) }
    assert(sigs("u") == expected)
  }

  test("identical word sets share identical signatures (the LSH premise)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = (Seq(("x", "p q r s t"), ("y", "t s r q p"))) // same set, different order
      .toDF("k", "text")
      .select(col("k"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val sigs = df.groupBy(col("k"))
      .agg(VectorFunctions.minhash(col("h"), K).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs("x") == sigs("y"))
  }
}

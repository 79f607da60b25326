package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ThetaOps

/** Laws for the theta-sketch distinct-set algebra
  * (`functions.ThetaSketchAgg`, key `agg_theta_setops`). */
class ThetaSketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  private def sketches(lgK: Int): Map[String, Array[Byte]] = {
    graft.functions.VectorFunctions.register(spark)
    Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("long").as("u"))
      .groupBy(col("event_type"))
      .agg(expr(s"graft_theta(u, $lgK)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
  }

  test("exact regime: estimates equal exact distinct counts; set identities hold") {
    val exact = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = sketches(12)
    exact.foreach { case (t, n) =>
      assert(math.rint(ThetaOps.estimate(sk(t))).toLong == n,
        s"exact-mode estimate drifted for $t")
    }
    val a = ThetaOps.estimate(sk("click"))
    val inter = ThetaOps.intersect(sk("click"), sk("view"))
    val diff = ThetaOps.aNotB(sk("click"), sk("view"))
    assert(math.rint(inter + diff).toLong == math.rint(a).toLong,
      "|A∩B| + |A\\B| must partition |A| in exact mode")
  }

  test("estimating regime (lgK=4): bounded relative error, graceful degradation") {
    val exact = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    val sk = sketches(4) // 16 nominal entries << 150 users → estimating
    val any = ThetaOps.unionAll(sk.values.toSeq, 4)
    val rel = math.abs(any - exact) / exact.toDouble
    assert(rel < 0.5, s"union estimate $any vs exact $exact (rel $rel)")
    // union dominates every input sketch's estimate
    sk.values.foreach(b => assert(any >= ThetaOps.estimate(b) - 1e-9))
  }

  test("sketch bytes are partitioning-invariant (ordered compact form)") {
    val a = sketches(12)
    val b = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id").cast("long").as("u"))
      .repartition(7, col("u")) // different physical layout
      .groupBy(col("event_type"))
      .agg(expr("graft_theta(u, 12)").as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    a.foreach { case (t, bytes) =>
      assert(java.util.Arrays.equals(bytes, b(t)),
        s"sketch bytes changed under repartitioning for $t")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Adaptive Query Execution behavior the 100 TB posture relies on:
  * skewed-partition splitting in shuffle joins. A hot key that would pin
  * one reducer gets split into parallel sub-partitions at runtime — the
  * engine-level complement to the explicit salting in agg_salted_skew. */
class AqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the synthetic hot key trips skew handling
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // left: one hot key (50k rows) + a uniform tail; right: one row/key
      val hot = spark.range(50000).select(lit(0L).as("k"), col("id").as("payload"))
      val tail = spark.range(1, 200).select(col("id").as("k"), col("id").as("payload"))
      val left = hot.union(tail)
      val right = spark.range(200).select(col("id").as("k"), (col("id") * 10).as("dim"))
      val joined = left.join(right, "k")
      // collect() runs THIS dataset's queryExecution (count() would build
      // a new one and leave joined's adaptive plan unfinalized)
      val n = joined.collect().length
      assert(n == 50000 + 199)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan:\n$finalPlan")
    }
  }
}

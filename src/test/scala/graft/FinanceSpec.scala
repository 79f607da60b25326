package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TWAP/VWAP semantics pinned on tiny hand-computed series (the oracle
  * checks cross-engine equality; this checks the MATH is the intended
  * left-closed time weighting / positive-volume weighting). */
class FinanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("left-closed TWAP weights each price by its holding time") {
    import spark.implicits._
    // u1 holds 10.0 for 30s, then 20.0 for 10s, last tick unweighted:
    // twap = (10*30e6 + 20*10e6) / 40e6 = 12.5
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (1L, "2024-01-01 00:00:30", 2L, 20.0),
      (1L, "2024-01-01 00:00:40", 3L, 99.0),
      (2L, "2024-01-01 00:00:00", 4L, 5.0) // single tick: no output row
    ).toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val got = df
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("w_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg((sum(col("value").cast("decimal(12,2)") * col("w_us")).cast("double") /
        sum(col("w_us")).cast("double")).as("twap"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 12.5))
  }

  test("VWAP ignores zero-volume ticks and weights by volume") {
    import spark.implicits._
    // vwap = (10*1 + 20*3) / 4 = 17.5; the 0-volume 99.0 tick is inert
    val df = Seq((1L, 10.0, 1), (1L, 20.0, 3), (1L, 99.0, 0))
      .toDF("user_id", "value", "vol")
    val got = df.filter(col("vol") > 0)
      .groupBy(col("user_id"))
      .agg((sum(col("value").cast("decimal(12,2)") * col("vol")).cast("double") /
        sum(col("vol")).cast("double")).as("vwap"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 17.5))
  }
}

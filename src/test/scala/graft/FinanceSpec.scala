package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TWAP/VWAP semantics pinned on tiny hand-computed series (the oracle
  * checks cross-engine equality; this checks the MATH is the intended
  * left-closed time weighting / positive-volume weighting). */
class FinanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fin_ewma: bit-equal to a driver-side Horner fold over each frame") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("fin_ewma")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = graft.Tables.events(spark, TestSpark.sf0001)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(12,2)").cast("double").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(raw.nonEmpty && got.size == raw.length)
    raw.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (r._2.toInstant.getEpochSecond, r._2.toInstant.getNano, r._3))
      sorted.indices.foreach { i =>
        val frame = sorted.slice(math.max(0, i - 15), i + 1).map(_._4)
        val num = frame.foldLeft(0.0)((acc, x) => acc * 0.5 + x)
        val den = frame.foldLeft(0.0)((acc, _) => acc * 0.5 + 1.0)
        val want = BigDecimal(num / den)
          .setScale(8, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        assert(got((u, sorted(i)._3)) == want, s"user $u row ${sorted(i)._3}")
      }
    }
  }

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

  test("OHLC ordering-key precondition: (user_id, ts) unique at sf0.001") {
    // fin_ohlc pins open/close with min_by/max_by on ts alone; this is
    // only deterministic while no user has two ticks on one microsecond
    val dups = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id"), col("ts")).count()
      .filter(col("count") > 1).count()
    assert(dups == 0L)
  }

  test("OHLC candle invariants: low <= open,close <= high; n sums to ticks") {
    val d = TestSpark.sf0001
    val bars = SparkEntry.queries("fin_ohlc")(spark, d)
    val bad = bars.filter(
      col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close")).count()
    assert(bad == 0L)
    val total = bars.agg(sum(col("n_ticks"))).collect()(0).getLong(0)
    assert(total == Tables.events(spark, d).count())
  }

  test("realized vol matches hand computation on a 3-tick series") {
    import spark.implicits._
    // returns: 12/10-1 = 0.2, 6/12-1 = -0.5
    // sum_ret = -0.3; vol = sqrt((0.04 + 0.25) / 1) = sqrt(0.29)
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10.0),
      (1L, "2024-01-01 00:00:01", 12.0),
      (1L, "2024-01-01 00:00:02", 6.0)
    ).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val got = df
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("ret", col("value") / col("prev") - lit(1.0))
      .groupBy(col("user_id"))
      .agg(bround(sum(bround(col("ret"), 12).cast("decimal(24,12)"))
          .cast("double"), 6).as("sum_ret"),
        bround(sqrt(sum(bround(col("ret") * col("ret"), 14)
          .cast("decimal(30,14)")).cast("double") /
          (count(lit(1)) - lit(1)).cast("double")), 6).as("vol"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 1)
    assert(got(0)._2 == -0.3)
    assert(math.abs(got(0)._3 - math.sqrt(0.29)) < 1e-6)
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

  test("graft_product: sum-like null semantics, exact on power-of-two inputs") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // powers of two are associativity-immune: any merge order is exact
    val df = Seq((1L, Some(2.0)), (1L, Some(4.0)), (1L, Some(8.0)),
      (2L, None), (2L, Some(0.5)), (3L, None))
      .toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(call_function("graft_product", col("v")).as("p"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == Map(1L -> 64.0, 2L -> 0.5, 3L -> null),
      "nulls skipped, all-null group -> null")
  }

  test("fin_compound_return: window product == driver-side left fold") {
    val rows = SparkEntry.queries("fin_compound_return")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // rebuild one user's factor sequence in query order and fold it
    val user = rows.head._1
    val factors = graft.Tables.events(spark, TestSpark.sf0001)
      .filter(col("user_id") === user && col("value").isNotNull)
      .select(col("ts"), col("event_id"),
        (lit(1.0) + bround(col("value"), 2) / lit(1000.0)).as("f"))
      .orderBy("ts", "event_id")
      .collect().map(r => r.getLong(1) -> r.getDouble(2))
    val expect = factors.indices.map { i =>
      val frame = factors.slice(math.max(0, i - 7), i + 1).map(_._2)
      factors(i)._1 -> frame.foldLeft(1.0)(_ * _)
    }.toMap
    rows.filter(_._1 == user).foreach { case (_, eid, got) =>
      // same 10dp half-even pin the query applies
      val want = BigDecimal(expect(eid))
        .setScale(10, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(got == want, s"event $eid: window $got vs fold $want")
    }
  }
}

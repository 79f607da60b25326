package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Edge cases for the native as-of join that the oracle-checked testdata
  * query may never hit: probe before any series row (null), key absent
  * from the series, equal timestamps (tiebreak order), many partitions. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(iso: String) = Timestamp.valueOf(iso)

  test("backward as-of: exact-time match, nulls, missing keys, tiebreaks") {
    import spark.implicits._
    val series = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, 11.0),
      // same timestamp, higher tiebreak must win
      (1L, ts("2024-01-01 11:00:00"), 3L, 12.0),
      (2L, ts("2024-01-01 12:00:00"), 4L, 20.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 09:59:59")), // before any series row -> null
      (1L, ts("2024-01-01 10:30:00")), // between rows -> 10.0
      (1L, ts("2024-01-01 11:00:00")), // exact time -> tiebreak winner 12.0
      (2L, ts("2024-01-01 12:00:01")), // after last -> 20.0
      (3L, ts("2024-01-01 12:00:00"))  // key absent from series -> null
    ).toDF("user_id", "ts")

    val got = AsOf.joinBackward(probes, series, "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Double])))

    assert(got.toSeq == Seq(
      (1L, None), (1L, Some(10.0)), (1L, Some(12.0)),
      (2L, Some(20.0)), (3L, None)))
  }

  test("forward as-of: exact match, peek-not-consume, tiebreaks, nulls") {
    import spark.implicits._
    val series = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      // same timestamp, LOWER tiebreak must win in forward mode
      (1L, ts("2024-01-01 11:00:00"), 2L, 11.0),
      (1L, ts("2024-01-01 11:00:00"), 3L, 12.0),
      (2L, ts("2024-01-01 12:00:00"), 4L, 20.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 09:59:59")), // before any series row -> 10.0
      // two probes needing the SAME head row: the match must be peeked,
      // never consumed
      (1L, ts("2024-01-01 10:30:00")), // -> 11.0 (min tie at 11:00)
      (1L, ts("2024-01-01 11:00:00")), // exact time -> 11.0
      (1L, ts("2024-01-01 11:00:01")), // after last of key 1 -> null
      (2L, ts("2024-01-01 11:00:00")), // -> 20.0
      (3L, ts("2024-01-01 12:00:00"))  // key absent -> null
    ).toDF("user_id", "ts")

    val got = AsOf.joinForward(probes, series, "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Double])))

    assert(got.toSeq == Seq(
      (1L, Some(10.0)), (1L, Some(11.0)), (1L, Some(11.0)), (1L, None),
      (2L, Some(20.0)), (3L, None)))
  }

  test("nearest as-of: distance compare, equal-distance tie -> backward") {
    import spark.implicits._
    val series = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 12:00:00"), 2L, 12.0),
      (2L, ts("2024-01-01 10:00:00"), 3L, 20.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts("2024-01-01 10:30:00")), // closer to 10:00 -> 10.0
      (1L, ts("2024-01-01 11:00:00")), // EQUAL distance -> backward 10.0
      (1L, ts("2024-01-01 11:30:01")), // closer to 12:00 -> 12.0
      (2L, ts("2024-01-01 09:00:00")), // only a forward match -> 20.0
      (3L, ts("2024-01-01 09:00:00"))  // no match either way -> null
    ).toDF("user_id", "ts")
    val got = AsOf.joinNearest(probes, series, "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, Some(10.0)), (1L, Some(10.0)), (1L, Some(12.0)),
      (2L, Some(20.0)), (3L, None)))
  }

  test("multi-partition merge: matches the window-rewrite on 2k random rows") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // probes at each user's median-ish event times: every 7th event
    val probes = ev.filter(col("event_id") % 7 === 0)
      .select(col("user_id"), col("ts"))
    val native = AsOf.joinBackward(probes, ev, "user_id", "ts", "event_id", "value")
      .select(col("user_id"), col("ts"), col("last_value"))
    val rewrite = probes.as("p").join(ev.as("e"),
        col("p.user_id") === col("e.user_id") && col("e.ts") <= col("p.ts"), "left_outer")
      .groupBy(col("p.user_id").as("user_id"), col("p.ts").as("ts"))
      .agg(max_by(col("e.value"), struct(col("e.ts"), col("e.event_id"))).as("last_value"))
    val a = native.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.get(2))).toSet
    val b = rewrite.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.get(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("generalized types: string keys, double times, string values") {
    import spark.implicits._
    val series = Seq(
      ("aapl", 1.0, 1L, "open"), ("aapl", 2.0, 2L, "close"),
      ("brk-b", 5.0, 3L, "halt")
    ).toDF("sym", "t", "seq", "state")
    val probes = Seq(
      ("aapl", 1.5), ("aapl", 9.9), ("brk-b", 4.9), ("zzz", 1.0)
    ).toDF("sym", "t")
    val got = AsOf.joinBackward(probes, series, "sym", "t", "seq", "state")
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getString(0), Option(r.get(2)).map(_.asInstanceOf[String])))
    assert(got.toSeq == Seq(
      ("aapl", Some("open")), ("aapl", Some("close")),
      ("brk-b", None), ("zzz", None)))
  }

  test("null probe keys/times match nothing; null series rows are skipped") {
    import spark.implicits._
    val series = Seq(
      (Some(1L), Some(10L), 1L, 1.0),  // normal
      (Some(1L), None, 2L, 2.0),       // null series time: skipped
      (None, Some(5L), 3L, 3.0)        // null series key: skipped
    ).toDF("k", "t", "seq", "v")
    val probes = Seq(
      (Some(1L), Some(11L)),  // -> 1.0 (null-time series row not matched)
      (Some(1L), None),       // null probe time -> null
      (None, Some(11L))       // null probe key -> null
    ).toDF("k", "t")
    val got = AsOf.joinBackward(probes, series, "k", "t", "seq", "v")
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(got == Set(
      (Some(1L), Some(11L), Some(1.0)),
      (Some(1L), None, None),
      (None, Some(11L), None)))
  }

  test("strict as-of (allow_exact_matches=false): exact-time rows excluded") {
    import spark.implicits._
    val series = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 20L, 3L, 3.0),
      (2L, 5L, 4L, 4.0)).toDF("k", "t", "seq", "v")
    val probes = Seq((1L, 20L), (1L, 25L), (2L, 5L), (2L, 4L)).toDF("k", "t")
    val strict = AsOf.joinBackward(probes, series, "k", "t", "seq", "v",
        allowExactMatches = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(strict == Set(
      (1L, 20L, Some(1.0)),  // rows at t=20 excluded; previous row wins
      (1L, 25L, Some(3.0)),  // t=20 rows eligible again (20 < 25); max seq wins
      (2L, 5L, None),        // only row is AT the probe time
      (2L, 4L, None)))
    // forward strict: the row at the probe time is skipped
    val fwd = AsOf.joinForward(probes, series, "k", "t", "seq", "v",
        allowExactMatches = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(fwd == Set(
      (1L, 20L, None),       // t=20 rows are AT the probe: excluded
      (1L, 25L, None),       // nothing strictly after 25
      (2L, 5L, None),        // only row is AT the probe time
      (2L, 4L, Some(4.0))))  // t=5 > 4 qualifies
  }

  test("tolerance as-of: stale matches null out, fresh ones survive") {
    import spark.implicits._
    val series = Seq((1L, 10L, 1L, 1.0), (1L, 100L, 2L, 2.0)).toDF("k", "t", "seq", "v")
    val probes = Seq((1L, 15L), (1L, 105L), (1L, 150L)).toDF("k", "t")
    val got = AsOf.joinBackwardTolerance(probes, series, "k", "t", "seq", "v",
        org.apache.spark.sql.functions.lit(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 15L, Some(1.0)),   // 15-10=5 <= 10
      (1L, 105L, Some(2.0)),  // 105-100=5 <= 10
      (1L, 150L, None)))      // 150-100=50 > 10: stale
  }

  test("graft_asof TVF: SQL text reaches the native operator, both directions") {
    import spark.implicits._
    AsOf.registerSql(spark)
    Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (2L, 15L, 3L, 3.0))
      .toDF("k", "t", "seq", "v").createOrReplaceTempView("tvf_series")
    Seq((1L, 15L), (2L, 10L), (3L, 15L))
      .toDF("k", "t").createOrReplaceTempView("tvf_probes")
    val back = spark.sql(
      "SELECT * FROM graft_asof('tvf_probes', 'tvf_series', 'k', 't', 'seq', 'v')")
    // the SQL text must plan through AsOfJoinExec, not a rewrite
    assert(back.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      back.queryExecution.executedPlan.toString)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet ==
      Set((1L, 15L, Some(1.0)), (2L, 10L, None), (3L, 15L, None)))
    val fwd = spark.sql(
      "SELECT * FROM graft_asof('tvf_probes', 'tvf_series', 'k', 't', 'seq', 'v', 'forward')")
    assert(fwd.collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet ==
      Set((1L, 15L, Some(2.0)), (2L, 10L, Some(3.0)), (3L, 15L, None)))
    // equals the Scala-API answer on the same inputs
    val api = AsOf.joinBackward(spark.table("tvf_probes"), spark.table("tvf_series"),
      "k", "t", "seq", "v").collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == api)
  }

  test("graft_asof TVF: named argument errors") {
    AsOf.registerSql(spark)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof('a', 'b', 'k', 't', 'seq')").collect())
    assert(e1.getMessage.contains("6 or 7"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof('a', 'b', 'k', 't', 'seq', 'v', 'sideways')").collect())
    assert(e2.getMessage.contains("backward"))
  }
}

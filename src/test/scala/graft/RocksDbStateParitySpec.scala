package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Event
import graft.streaming.Streams

/** Dual-provider state-store parity (r13 VERDICT #3): SCALE.md's
  * streaming posture claims state-store-backed bounded state, and at
  * 100 TB keyed state the deployment answer is the RocksDB provider —
  * but `transformWithState` aside (which REQUIRES RocksDB and is
  * already pinned under it), every stateful lifecycle here ran only on
  * the default HDFS-backed provider. Behavioral parity is not free
  * (store versioning, eviction, timer bookkeeping differ), so each
  * scenario below runs TWICE — default provider, then
  * `RocksDBStateStoreProvider` — and must produce identical rows:
  * watermark dedup, windowed agg with late-data drop, inner and
  * left-outer stream-stream joins, mapGroupsWithState, and
  * flatMapGroupsWithState. These are parameterized re-runs of the
  * StreamingSpec scenarios, not new semantics. */
class RocksDbStateParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def ev(id: Long, iso: String, user: Long, typ: String,
                 v: Double): Event =
    Event(id, Timestamp.valueOf(iso), user, typ, Some(v), "{}")

  /** Run `body` under the given provider (None = session default),
    * restoring the session conf after. */
  private def withProvider[T](provider: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    provider.foreach(spark.conf.set(ProviderKey, _))
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** Run one streaming scenario under both providers and assert the
    * collected rows match. `scenario` gets a unique sink name each run
    * and returns the collected result set. */
  private def parity(name: String)(scenario: String => Set[Seq[Any]]): Unit = {
    val default = withProvider(None)(scenario(s"${name}_default"))
    val rocks = withProvider(Some(Rocks))(scenario(s"${name}_rocks"))
    assert(rocks == default,
      s"$name diverged under RocksDB:\n$rocks\nvs default:\n$default")
    assert(default.nonEmpty, s"$name produced no rows — vacuous parity")
  }

  private def collectTable(sink: String): Set[Seq[Any]] =
    spark.table(sink).collect().map(_.toSeq).toSet

  test("watermark dedup: identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    parity("dedup_wm") { sink =>
      val ms = MemoryStream[Event]
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:00:30", 1, "click", 1.0),
        ev(2, "2024-01-01 10:01:00", 1, "view", 2.0)))
      val q = Streams.dedupWithinWatermark(ms.toDF()).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      collectTable(sink)
    }
  }

  test("windowed agg + late-data drop: identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    parity("late_wm") { sink =>
      val ms = MemoryStream[Event]
      val q = Streams.lateDataCounts(ms.toDF()).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      ms.addData(Seq(ev(1, "2024-01-01 10:00:00", 1, "a", 1.0),
        ev(2, "2024-01-01 10:10:00", 1, "a", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(3, "2024-01-01 11:30:00", 1, "a", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        ev(4, "2024-01-01 10:05:00", 1, "a", 1.0), // late: dropped
        ev(5, "2024-01-01 12:30:00", 1, "a", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(6, "2024-01-01 13:30:00", 1, "a", 1.0)))
      q.processAllAvailable(); q.stop()
      collectTable(sink)
    }
  }

  test("inner stream-stream interval join: identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    parity("ssj_inner") { sink =>
      val clicks = MemoryStream[Event]
      val views = MemoryStream[Event]
      val q = Streams.clickViewJoin(clicks.toDF(), views.toDF()).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      views.addData(Seq(
        ev(100, "2024-01-01 10:00:00", 7, "view", 0.0),
        ev(101, "2024-01-01 09:50:00", 7, "view", 0.0),
        ev(102, "2024-01-01 10:04:00", 8, "view", 0.0)))
      clicks.addData(Seq(
        ev(200, "2024-01-01 10:03:00", 7, "click", 0.0),
        ev(201, "2024-01-01 10:05:00", 9, "click", 0.0)))
      q.processAllAvailable(); q.stop()
      collectTable(sink)
    }
  }

  test("left-outer stream-stream join: identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    parity("ssj_louter") { sink =>
      val clicks = MemoryStream[Event]
      val views = MemoryStream[Event]
      val q = Streams.clickViewJoinLeftOuter(clicks.toDF(), views.toDF())
        .writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      views.addData(Seq(ev(100, "2024-01-01 10:00:00", 7, "view", 0.0)))
      clicks.addData(Seq(
        ev(200, "2024-01-01 10:03:00", 7, "click", 0.0),
        ev(201, "2024-01-01 10:05:00", 9, "click", 0.0))) // unmatched
      q.processAllAvailable()
      // advance the watermark far enough to null-pad the unmatched click
      clicks.addData(Seq(ev(202, "2024-01-01 12:00:00", 7, "click", 0.0)))
      views.addData(Seq(ev(103, "2024-01-01 12:00:00", 8, "view", 0.0)))
      q.processAllAvailable(); q.stop()
      collectTable(sink)
    }
  }

  test("mapGroupsWithState: identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    parity("mgws") { sink =>
      val ms = MemoryStream[Event]
      val q = Streams.runningUserTotals(ms.toDS()).writeStream
        .format("memory").queryName(sink).outputMode("update").start()
      ms.addData(Seq(ev(1, "2024-01-01 10:00:00", 7, "a", 1.0),
        ev(2, "2024-01-01 10:01:00", 7, "a", 2.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(3, "2024-01-01 10:02:00", 7, "a", 4.0),
        ev(4, "2024-01-01 10:02:30", 9, "b", 5.0)))
      q.processAllAvailable(); q.stop()
      collectTable(sink)
    }
  }

  test("flatMapGroupsWithState alerts: identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    parity("fmgws") { sink =>
      val ms = MemoryStream[Event]
      val q = Streams.thresholdAlerts(ms.toDS()).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      ms.addData(Seq(ev(1, "2024-01-01 10:00:00", 7, "a", 60.0),
        ev(2, "2024-01-01 10:01:00", 7, "a", 150.0))) // 210: cross 100, 200
      q.processAllAvailable()
      ms.addData(Seq(ev(3, "2024-01-01 10:02:00", 7, "a", 95.0), // 305
        ev(4, "2024-01-01 10:03:00", 9, "b", 120.0)))            // cross 100
      q.processAllAvailable(); q.stop()
      collectTable(sink)
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Snapshots

class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("full lifecycle through a file:-scheme Hadoop URI (r11 #4)") {
    import spark.implicits._
    // an explicit-scheme URI: java.io.File probes would read every path
    // as absent (no version discovery, no vacuum) — the Hfs rewrite must
    // make the whole commit/read/vacuum lifecycle scheme-transparent
    val dir = "file:" + Files.createTempDirectory("graft_snap_uri").toString
    assert(Snapshots.latestVersion(dir).isEmpty)
    assert(Snapshots.commit(Seq((1L, 1.0)).toDF("key", "value"), dir) == 0)
    assert(Snapshots.commit(Seq((2L, 2.0)).toDF("key", "value"), dir) == 1)
    assert(Snapshots.latestVersion(dir).contains(1))
    assert(Snapshots.readAsOf(spark, dir, 0)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(Snapshots.commit(Seq((3L, 3.0)).toDF("key", "value"), dir) == 2)
    assert(Snapshots.vacuum(dir, keepLast = 2) == Seq(0))
    assert(Snapshots.readLatest(spark, dir)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    val e = intercept[RuntimeException](Snapshots.readAsOf(spark, dir, 0))
    assert(e.getMessage.contains("does not exist"))
  }

  test("commits are sequential versions; as-of reads are immutable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap").toString
    val v0 = Seq((1L, 10.0), (2L, 20.0)).toDF("key", "value")
    val v1 = Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)).toDF("key", "value")
    assert(Snapshots.latestVersion(dir).isEmpty)
    assert(Snapshots.commit(v0, dir) == 0)
    assert(Snapshots.commit(v1, dir) == 1)
    assert(Snapshots.latestVersion(dir).contains(1))
    // v0 read AFTER the v1 commit is exactly the v0 content
    val got0 = Snapshots.readAsOf(spark, dir, 0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(got0.toSeq == Seq((1L, 10.0), (2L, 20.0)))
    val latest = Snapshots.readLatest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(latest.toSeq == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
  }

  test("a leftover temp dir from a crashed commit is ignored, not read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap_crash").toString
    Snapshots.commit(Seq((1L, 1.0)).toDF("key", "value"), dir)
    // simulate a commit that died mid-write
    new java.io.File(s"$dir/.tmp_v1").mkdirs()
    assert(Snapshots.latestVersion(dir).contains(0))
    // the next commit still lands (overwrites the stale temp) as v1
    assert(Snapshots.commit(Seq((2L, 2.0)).toDF("key", "value"), dir) == 1)
    assert(Snapshots.readAsOf(spark, dir, 1).count() == 1)
  }

  test("reading a never-committed version fails loudly") {
    val dir = Files.createTempDirectory("graft_snap_missing").toString
    val e = intercept[RuntimeException](Snapshots.readAsOf(spark, dir, 3))
    assert(e.getMessage.contains("v3"))
  }

  test("vacuum expires old versions, keeps the newest, sweeps crashed temps") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap_vacuum").toString
    (0 to 3).foreach(i =>
      Snapshots.commit(Seq((i.toLong, i.toDouble)).toDF("key", "value"), dir))
    new java.io.File(s"$dir/.tmp_v9").mkdirs()
    assert(Snapshots.vacuum(dir, keepLast = 2) == Seq(0, 1))
    // survivors still read; expired reads fail loudly; temp gone
    assert(Snapshots.readAsOf(spark, dir, 3).collect()(0).getLong(0) == 3L)
    assert(Snapshots.readAsOf(spark, dir, 2).count() == 1)
    intercept[RuntimeException](Snapshots.readAsOf(spark, dir, 0))
    assert(!new java.io.File(s"$dir/.tmp_v9").exists())
    // version numbering continues after the gap: next commit is v4
    assert(Snapshots.commit(Seq((9L, 9.0)).toDF("key", "value"), dir) == 4)
    intercept[IllegalArgumentException](Snapshots.vacuum(dir, keepLast = 0))
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Compact

/** Small-file compaction: sizing from byte totals, content preservation,
  * and the already-compact no-op path. */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction merges small files, preserves rows, no-ops when compact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1L to 10000L).map(i => (i, s"row$i")).toDF("id", "payload")
    df.repartition(16).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    // target far above total size -> everything fits one file
    val r = Compact.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(r.filesBefore == 16)
    assert(r.filesAfter == 1, s"got ${r.filesAfter} files")
    assert(r.rows == 10000L)
    val afterRows = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(afterRows == beforeRows)

    // second pass: already at or under the implied file count -> no-op
    val r2 = Compact.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(r2.filesBefore == 1 && r2.filesAfter == 1)
  }

  test("crash recovery: interrupted swap heals, stale temp dirs are cleared") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_compact_crash").toString
    val dir = base + "/t"
    val df = (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "payload")
    df.repartition(8).write.parquet(dir)
    val expect = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    // simulate a crash BETWEEN the two renames: data sits at _compact_old,
    // a finished rewrite sits at _compact_tmp, dir itself is gone
    df.coalesce(1).write.parquet(dir + "_compact_tmp")
    require(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))

    // next run must first restore dir from _compact_old, drop the stale
    // tmp, and then complete a normal compaction
    val r = Compact.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(r.filesBefore == 8 && r.filesAfter == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == expect)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "_compact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "_compact_old")))
  }
}

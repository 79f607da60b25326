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
}

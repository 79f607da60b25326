package graft

import org.scalatest.funsuite.AnyFunSuite

/** File-level proof for partition-level commit-if-changed: the oracle
  * check on `sink_commit_partitions` shows the VALUES are right; this
  * spec shows the dynamic-overwrite mechanism leaves unchanged
  * partitions' files physically untouched (same names, sizes, mtimes) —
  * which is the point of partition-level publish at 100 TB. */
class PartitionCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def listFiles(dir: java.io.File): Map[String, (Long, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("dynamic overwrite rewrites only the partitions present in the data") {
    import spark.implicits._
    val dir = "target/tmp/partition_commit_spec"
    val snap = Seq((1L, 1992, 10.0), (2L, 1995, 20.0), (3L, 1997, 30.0),
      (4L, 1992, 40.0)).toDF("k", "yr", "v")
    snap.write.mode("overwrite").partitionBy("yr").parquet(dir)
    val base = new java.io.File(dir)
    def state() = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("yr="))
      .map(d => d.getName -> listFiles(d)).toMap
    val before = state()
    assert(before.keySet == Set("yr=1992", "yr=1995", "yr=1997"))

    // publish new data for 1995 and 1997 only
    Seq((2L, 1995, 21.0), (3L, 1997, 31.0)).toDF("k", "yr", "v")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("yr").parquet(dir)
    val after = state()

    assert(before("yr=1992") == after("yr=1992"),
      "untouched partition was rewritten")
    assert(before("yr=1995") != after("yr=1995"))
    assert(before("yr=1997") != after("yr=1997"))
    // merged read-back: old 1992 rows + new 1995/1997 rows
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(1))).toSet
    assert(got == Set((1L, 1992, 10.0), (4L, 1992, 40.0),
      (2L, 1995, 21.0), (3L, 1997, 31.0)))
  }

  test("sink_commit_partitions heals changed partitions, keeps prev elsewhere") {
    val rows = SparkEntry.queries("sink_commit_partitions")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(r =>
        if (Set(1995, 1997)(r.getInt(1))) "changed" else "unchanged")
      .view.mapValues(_.map(_.getString(3)).toSet).toMap
    assert(bySrc("changed") == Set("cur"))
    assert(bySrc("unchanged") == Set("prev"))
  }
}

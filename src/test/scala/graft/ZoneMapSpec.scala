package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.ZoneMap

/** Zone-map pruning must (a) return exactly the full-scan filter answer,
  * (b) actually exclude files when the band is selective, and (c) stay
  * exact when the band straddles file boundaries or misses entirely. */
class ZoneMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sf001
  private val dir = "target/tmp/zonemap_spec"

  private lazy val built = {
    ZoneMap.write(
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice")),
      dir, "o_totalprice", Seq("o_totalprice", "o_orderkey"), nFiles = 8)
    true
  }

  test("selective band prunes most files and matches the full scan") {
    assert(built)
    val total = ZoneMap.fileCount(spark, dir)
    assert(total >= 8, s"expected >=8 data files, manifest has $total")
    val files = ZoneMap.prunedFiles(spark, dir, "o_totalprice",
      lit(450000.0), lit(500000.0))
    assert(files.nonEmpty && files.length <= total / 4,
      s"band touched ${files.length} of $total files — no pruning happened")
    val pruned = ZoneMap.read(spark, dir, "o_totalprice",
        lit(450000.0), lit(500000.0))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val full = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice").between(450000.0, 500000.0))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == full.toSeq)
  }

  test("band straddling file boundaries stays exact (residual filter)") {
    assert(built)
    // a mid-range band overlaps interior file edges where zone false
    // positives live; the residual filter must remove them
    val pruned = ZoneMap.read(spark, dir, "o_totalprice",
        lit(249000.0), lit(251000.0))
      .agg(count(lit(1)), coalesce(min(col("o_totalprice")), lit(0.0)),
        coalesce(max(col("o_totalprice")), lit(0.0)))
      .collect().head
    val full = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice").between(249000.0, 251000.0))
      .agg(count(lit(1)), coalesce(min(col("o_totalprice")), lit(0.0)),
        coalesce(max(col("o_totalprice")), lit(0.0)))
      .collect().head
    assert(pruned == full)
  }

  test("band outside the data reads zero files and zero rows") {
    assert(built)
    val files = ZoneMap.prunedFiles(spark, dir, "o_totalprice",
      lit(9e9), lit(1e10))
    assert(files.isEmpty)
    assert(ZoneMap.read(spark, dir, "o_totalprice", lit(9e9), lit(1e10))
      .count() == 0)
  }

  test("secondary stats column prunes independently of the cluster key") {
    assert(built)
    // o_orderkey is NOT the cluster column, so its per-file bands are
    // wide — pruning on it must still be EXACT (maybe not selective)
    val pruned = ZoneMap.read(spark, dir, "o_orderkey", lit(1L), lit(100L))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val full = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey").between(1L, 100L))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == full.toSeq)
  }
}

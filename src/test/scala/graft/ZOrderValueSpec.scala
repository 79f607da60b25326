package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions, ZOrderValue}
import graft.ops.ZoneMap

/** ZOrderValue must match a bit-by-bit reference loop on the full int
  * domain, keep the curve's dimension monotonicity on non-negative
  * inputs, agree between interpreted eval and codegen, and — the point —
  * give file layouts where BOTH dimensions prune. */
class ZOrderValueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference: place bit i of x at 2i, bit i of y at 2i+1, one bit at
    * a time — the definition, no magic masks. */
  private def slowInterleave(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x.toLong >> i) & 1L) << (2 * i)
      z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the reference loop across the int domain") {
    val rnd = new scala.util.Random(7)
    val edge = Seq(0, 1, -1, 2, 50, 999, 65535, 65536,
      Int.MaxValue, Int.MinValue, Int.MaxValue - 1)
    val samples = edge.flatMap(x => edge.map(x -> _)) ++
      (1 to 2000).map(_ => rnd.nextInt() -> rnd.nextInt())
    samples.foreach { case (x, y) =>
      assert(ZOrderValue.interleave(x, y) == slowInterleave(x, y),
        s"mismatch at ($x, $y)")
    }
  }

  test("non-negative inputs give non-negative z, monotone per dimension") {
    val rnd = new scala.util.Random(13)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextInt(Int.MaxValue); val y = rnd.nextInt(Int.MaxValue)
      val z = ZOrderValue.interleave(x, y)
      assert(z >= 0L)
      // growing either dimension never decreases the z-value
      if (x < Int.MaxValue - 1) {
        assert(ZOrderValue.interleave(x + 1, y) > z)
      }
      if (y < Int.MaxValue - 1) {
        assert(ZOrderValue.interleave(x, y + 1) > z)
      }
    }
    assert(ZOrderValue.interleave(0, 0) == 0L)
    assert(ZOrderValue.interleave(1, 0) == 1L)
    assert(ZOrderValue.interleave(0, 1) == 2L)
    assert(ZOrderValue.interleave(3, 3) == 15L)
  }

  test("codegen path equals interpreted eval and handles nulls") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(29)
    val rows = (1 to 500).map(_ => (rnd.nextInt(), rnd.nextInt()))
    val got = rows.toDF("x", "y")
      .select(VectorFunctions.zorder(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == rows.map { case (x, y) => ZOrderValue.interleave(x, y) })
    val withNull = Seq((Some(1), Some(2)), (None, Some(2)), (Some(1), None))
      .toDF("x", "y")
      .select(VectorFunctions.zorder(col("x"), col("y")).as("z"))
      .collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0) &&
      withNull(2).isNullAt(0))
  }

  test("z-order layout prunes on BOTH dimensions; linear sort only on one") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // uniform 256x256 grid: the adversarial case for linear sort
    val grid = (0 until 256).flatMap(a => (0 until 256).map(b => (a, b)))
      .toDF("a", "b")
    val zDir = "target/tmp/zorder_grid"
    val linDir = "target/tmp/linear_grid"
    ZoneMap.write(grid.withColumn("z", VectorFunctions.zorder(col("a"), col("b"))),
      zDir, "z", Seq("a", "b"), nFiles = 16)
    ZoneMap.write(grid, linDir, "a", Seq("a", "b"), nFiles = 16)
    val total = ZoneMap.fileCount(spark, zDir)
    val zOnA = ZoneMap.prunedFiles(spark, zDir, "a", lit(10), lit(20)).length
    val zOnB = ZoneMap.prunedFiles(spark, zDir, "b", lit(10), lit(20)).length
    val linOnA = ZoneMap.prunedFiles(spark, linDir, "a", lit(10), lit(20)).length
    val linOnB = ZoneMap.prunedFiles(spark, linDir, "b", lit(10), lit(20)).length
    info(s"files touched of $total: zorder a=$zOnA b=$zOnB; linear a=$linOnA b=$linOnB")
    assert(zOnA < total && zOnB < total,
      "z-order layout failed to prune on one of its dimensions")
    assert(linOnB == total,
      "linear layout unexpectedly pruned on the secondary dimension")
    assert(zOnB < linOnB, "z-order did not beat linear sort on dimension b")
    // answers stay exact through either layout
    val zRows = ZoneMap.read(spark, zDir, "b", lit(10), lit(20)).count()
    val linRows = ZoneMap.read(spark, linDir, "b", lit(10), lit(20)).count()
    assert(zRows == 256L * 11 && linRows == 256L * 11)
  }
}

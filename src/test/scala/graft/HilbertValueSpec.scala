package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{HilbertValue, VectorFunctions}
import graft.ops.ZoneMap

/** HilbertValue must be a genuine Hilbert curve (proved via an
  * INDEPENDENT inverse transform: index→(x,y) round-trips, and
  * consecutive curve positions are grid-adjacent — the defining
  * property z-order lacks), agree between interpreted eval and codegen,
  * and give file layouts where both dimensions prune. */
class HilbertValueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent inverse: distance → (x, y), the Wikipedia d2xy walk
    * (bottom-up, rotation by sub-square size — a different formulation
    * than HilbertValue.index's top-down walk, so agreement is
    * evidence, not tautology). */
  private def d2xy(d: Long): (Long, Long) = {
    var t = d
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < (1L << 31)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("index round-trips through the independent inverse") {
    val rnd = new scala.util.Random(7)
    val edge = Seq(0, 1, 2, 3, 255, 256, 65535, 65536, Int.MaxValue)
    val samples = edge.flatMap(x => edge.map(x -> _)) ++
      (1 to 2000).map(_ => rnd.nextInt(Int.MaxValue) -> rnd.nextInt(Int.MaxValue))
    samples.foreach { case (x, y) =>
      val d = HilbertValue.index(x, y)
      assert(d >= 0L, s"negative index at ($x, $y)")
      assert(d2xy(d) == (x.toLong, y.toLong), s"round-trip failed at ($x, $y)")
    }
    assert(HilbertValue.index(0, 0) == 0L)
    // negative inputs clamp to 0 (documented contract)
    assert(HilbertValue.index(-5, 3) == HilbertValue.index(0, 3))
  }

  test("consecutive curve positions are grid-adjacent (no z-order seams)") {
    val rnd = new scala.util.Random(13)
    (1 to 2000).foreach { _ =>
      // random 62-bit curve position
      val d = rnd.nextLong() & ((1L << 62) - 2)
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"curve step $d -> ${d + 1} jumped: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("codegen path equals interpreted eval and handles nulls") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rnd = new scala.util.Random(29)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue)))
    val got = rows.toDF("x", "y")
      .select(VectorFunctions.hilbert(col("x"), col("y")).as("h"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == rows.map { case (x, y) => HilbertValue.index(x, y) })
    val withNull = Seq((Some(1), Some(2)), (None, Some(2)), (Some(1), None))
      .toDF("x", "y")
      .select(VectorFunctions.hilbert(col("x"), col("y")).as("h"))
      .collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0) &&
      withNull(2).isNullAt(0))
  }

  test("hilbert layout prunes on BOTH dimensions of the uniform grid") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val grid = (0 until 256).flatMap(a => (0 until 256).map(b => (a, b)))
      .toDF("a", "b")
    val hDir = "target/tmp/hilbert_grid"
    val zDir = "target/tmp/hilbert_vs_z_grid"
    ZoneMap.write(
      grid.withColumn("h", VectorFunctions.hilbert(col("a"), col("b"))),
      hDir, "h", Seq("a", "b"), nFiles = 16)
    ZoneMap.write(
      grid.withColumn("z", VectorFunctions.zorder(col("a"), col("b"))),
      zDir, "z", Seq("a", "b"), nFiles = 16)
    val total = ZoneMap.fileCount(spark, hDir)
    val hOnA = ZoneMap.prunedFiles(spark, hDir, "a", lit(10), lit(20)).length
    val hOnB = ZoneMap.prunedFiles(spark, hDir, "b", lit(10), lit(20)).length
    val zOnA = ZoneMap.prunedFiles(spark, zDir, "a", lit(10), lit(20)).length
    val zOnB = ZoneMap.prunedFiles(spark, zDir, "b", lit(10), lit(20)).length
    info(s"files touched of $total: hilbert a=$hOnA b=$hOnB; zorder a=$zOnA b=$zOnB")
    assert(hOnA < total && hOnB < total,
      "hilbert layout failed to prune on one of its dimensions")
    // the curve's adjacency keeps bands at least as tight as Morton's
    assert(hOnA <= zOnA && hOnB <= zOnB,
      "hilbert bands came out wider than z-order's on the uniform grid")
    // answers stay exact through the layout
    val rows = ZoneMap.read(spark, hDir, "b", lit(10), lit(20)).count()
    assert(rows == 256L * 11)
  }
}

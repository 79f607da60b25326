package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Metrics

/** Property-style tests (SURVEY §5.3) with a fixed-seed generator:
  * reference-semantics equivalences over randomized inputs. */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new Random(42)

  /** Python `a or b or c` over Option[Double] (0.0 falsy). */
  private def pyOr(xs: Seq[Option[Double]]): Option[Double] =
    xs.dropRight(1).collectFirst { case Some(v) if v != 0.0 => Some(v) }
      .getOrElse(xs.last)

  test("RewriteRangeJoin == naive BETWEEN join on randomized intervals/widths") {
    import spark.implicits._
    import graft.rules.RewriteRangeJoin
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteRangeJoin
    try {
      (1 to 5).foreach { trial =>
        // random points and intervals, including empty (hi < lo),
        // negative, null-bound, and zero-width intervals
        val points = Seq.fill(120)(
          (rng.nextInt(1000).toLong, rng.nextDouble() * 200 - 100))
          .toDF("pid", "v")
        val ivals = Seq.fill(60) {
          val lo = rng.nextDouble() * 200 - 100
          val span = rng.nextInt(4) match {
            case 0 => -10.0 // empty interval
            case 1 => 0.0   // zero width
            case _ => rng.nextDouble() * 50
          }
          (rng.nextInt(1000).toLong,
            if (rng.nextInt(10) == 0) None else Some(lo),
            Some(lo + span))
        }.toDF("iid", "lo", "hi")
        def q() = points.join(ivals,
            col("v") >= col("lo") && col("v") <= col("hi"))
          .select(col("pid"), col("iid")).orderBy("pid", "iid")
        val naive = q().collect().toSeq
        val width = Seq("0.5", "7.0", "300.0")(trial % 3)
        spark.conf.set(RewriteRangeJoin.WidthConf, width)
        try {
          val rewritten = q()
          assert(rewritten.queryExecution.executedPlan.toString
            .contains("__graft_bucket"), s"rule did not fire (trial $trial)")
          assert(rewritten.collect().toSeq == naive,
            s"trial $trial width $width diverged")
        } finally spark.conf.unset(RewriteRangeJoin.WidthConf)
      }
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.rules.RewriteRangeJoin)
    }
  }

  test("interval-merge window plan == driver-side sweep on randomized intervals") {
    import spark.implicits._
    val rng = new Random(11)
    // 40 keys x up to 12 random [s, s+len] integer intervals, dense
    // enough that overlap, touching, containment, and gaps all occur
    val data = (1 to 40).flatMap { k =>
      (1 to (1 + rng.nextInt(12))).map { _ =>
        val s = rng.nextInt(60); val e = s + rng.nextInt(15)
        (k.toLong, s, e)
      }
    }
    val df = data.toDF("k", "s", "e")
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    // the exact plan shape win_interval_merge uses, on integer bounds
    val merged = df
      .withColumn("pmax",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    // reference: classic driver-side sweep per key
    val want = data.groupBy(_._1).flatMap { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      val islands = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        (acc, iv) =>
          if (iv._1 > acc.last.map(_._2).max) acc :+ Vector(iv)
          else acc.init :+ (acc.last :+ iv)
      }
      islands.map(isl =>
        (k, isl.map(_._1).min, isl.map(_._2).max, isl.size.toLong))
    }.toSet
    assert(merged == want,
      s"missing=${want -- merged}\nextra=${merged -- want}")
  }

  test("truthyCoalesce == Python or-chain on 200 random triples") {
    import spark.implicits._
    def gen(): Option[Double] = rng.nextInt(4) match {
      case 0 => None
      case 1 => Some(0.0)
      case _ => Some(rng.nextInt(100) + 1.0)
    }
    val rows = Seq.fill(200)((gen(), gen(), gen()))
    val got = rows.toDF("a", "b", "c")
      .select(Metrics.truthyCoalesce(col("a"), col("b"), col("c")).as("r"))
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    val expected = rows.map(t => pyOr(Seq(t._1, t._2, t._3)))
    assert(got.toSeq == expected)
  }

  test("clampGrowth output always within [min(3.0,ming), maxg] and idempotent-shaped") {
    import spark.implicits._
    val rows = Seq.fill(300)((rng.nextDouble() * 160 - 60, rng.nextDouble() * 1e12))
    val out = rows.toDF("implied", "mcap")
      .select(Metrics.clampGrowth(col("implied"), lit(-5.0), lit(60.0), lit(true), col("mcap")).as("g"))
      .collect().map(_.getDouble(0))
    assert(out.forall(g => g >= -5.0 && g <= 60.0))
    // cyclical floor: anything below min becomes exactly 3.0
    val below = rows.zip(out).filter(_._1._1 < -5.0)
    assert(below.forall(_._2 == 3.0))
  }

  test("winsorizeBeta always in [0.5, 2.5] for non-null and bounded by tier caps") {
    import spark.implicits._
    val rows = Seq.fill(300)((rng.nextDouble() * 5 - 1, rng.nextDouble() * 2e12))
    val out = rows.toDF("beta", "mcap")
      .select(col("mcap"), Metrics.winsorizeBeta(col("beta"), lit("General"), col("mcap")).as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // floor is 0.5: raw betas in [0.5, 0.8) pass through rounded
    assert(out.forall { case (_, b) => b >= 0.5 - 1e-9 && b <= 2.5 })
    assert(out.filter(_._1 > 1e12).forall(_._2 <= 1.35))
  }

  test("TTM: window-frame formulation == rank-filter formulation on random series") {
    import spark.implicits._
    val base = 1700000000000L
    val rows = for {
      user <- 0 until 20
      k <- 0 until (1 + rng.nextInt(7)) // 1..7 periods, some users < 4
    } yield (user.toLong, new Timestamp(base + k * 86400000L + rng.nextInt(1000)),
      rng.nextInt(1000) / 10.0)
    val df = rows.toDF("user_id", "ts", "value")

    val byRank = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").desc)))
      .filter(col("rn") <= 4)
      .groupBy(col("user_id")).agg(sum(col("value")).as("ttm"))

    val byFrame = df
      .withColumn("run", sum(col("value")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").asc).rowsBetween(-3, 0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("run").as("ttm"))

    val a = byRank.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = byFrame.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    assert(a.forall { case (k, v) => math.abs(v - b(k)) < 1e-9 })
  }

  test("union-distinct == set semantics") {
    import spark.implicits._
    val xs = Seq.fill(200)(rng.nextInt(50))
    val ys = Seq.fill(200)(rng.nextInt(50))
    val got = xs.toDF("k").union(ys.toDF("k")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(got == (xs.toSet ++ ys.toSet))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must agree exactly with the window
  * `row_number() <= k` formulation it replaces (same comparator:
  * ord DESC, id ASC), independent of partitioning/arrival order. */
class TopKByAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_topk_by == window row_number formulation on seeded data") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    // duplicate ord values on purpose: the id tie-break must decide
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(7).toLong, math.floor(rnd.nextDouble() * 20) / 20.0, i.toLong)
    }
    val df = rows.toDF("g", "ord", "id").repartition(13)

    val agg = df.groupBy($"g")
      .agg(graft.functions.VectorFunctions.topk_by($"ord", $"id", 10).as("nn"))
      .select($"g", posexplode($"nn").as(Seq("pos", "e")))
      .select($"g", ($"pos" + 1).as("rn"), $"e.ord".as("ord"), $"e.id".as("id"))

    import org.apache.spark.sql.expressions.Window
    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"ord".desc, $"id")))
      .filter($"rn" <= 10)
      .select($"g", $"rn".cast("long").as("rn"), $"ord", $"id")

    val a = agg.orderBy("g", "rn").collect().map(_.toSeq)
    val w = win.orderBy("g", "rn").collect().map(_.toSeq)
    assert(a.length == w.length)
    assert(a.sameElements(w))
  }

  test("groups smaller than k return all members, sorted") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (2L, 0.1, 12L))
      .toDF("g", "ord", "id")
    val out = df.groupBy($"g")
      .agg(graft.functions.VectorFunctions.topk_by($"ord", $"id", 10).as("nn"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    assert(out(1L) == Seq((0.9, 11L), (0.5, 10L)))
    assert(out(2L) == Seq((0.1, 12L)))
  }
}

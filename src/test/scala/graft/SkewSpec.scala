package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Skew

/** The salted-aggregation helper must (a) return EXACTLY the direct
  * groupBy answer for every offered aggregate, and (b) actually split a
  * hot key across salt sub-groups — the whole point of the shape. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 90% of rows share one key — the classic hot-partition distribution
  private lazy val skewed = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 20000).map { i =>
      val k = if (rnd.nextInt(10) < 9) "hot" else s"cold${rnd.nextInt(5)}"
      (k, rnd.nextDouble() * 100, i.toLong)
    }.toDF("k", "v", "id").repartition(8)
  }

  test("saltedAgg == direct groupBy for count/sum/min/max/avg") {
    val direct = skewed.groupBy(col("k")).agg(
        count(lit(1)).cast("bigint").as("n"),
        sum(col("v")).as("s"),
        min(col("v")).as("mn"),
        max(col("v")).as("mx"),
        (sum(col("v")) / count(col("v"))).as("a"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"),
        Seq(Skew.Count("n"), Skew.Sum("v", "s"), Skew.Min("v", "mn"),
          Skew.Max("v", "mx"), Skew.Avg("v", "a")),
        saltN = 16, salt = Some(pmod(col("id"), lit(16))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    // count/min/max are order-insensitive -> exact; sum/avg partials can
    // reassociate doubles, so compare to 1e-9 relative
    direct.foreach { case (k, (n, s, mn, mx)) =>
      val (n2, s2, mn2, mx2) = salted(k)
      assert(n2 == n && mn2 == mn && mx2 == mx)
      assert(math.abs(s2 - s) / math.abs(s) < 1e-9, s"sum drift for $k")
    }
  }

  test("hot key splits into multiple salt sub-groups in phase 1") {
    // replicate phase 1's grouping with the default partition-id salt:
    // the hot key's rows must land in >1 (k, salt) sub-group, so no
    // single reducer sees all of them
    val subGroups = skewed.withColumn("__salt", Skew.saltColumn(16))
      .groupBy(col("k"), col("__salt")).count()
      .filter(col("k") === "hot")
      .collect()
    assert(subGroups.length > 1,
      s"hot key not split: ${subGroups.length} sub-group(s)")
    val biggest = subGroups.map(_.getLong(2)).max
    val total = subGroups.map(_.getLong(2)).sum
    assert(biggest < total, "one sub-group still holds every hot row")
    info(s"hot key: $total rows over ${subGroups.length} sub-groups, max $biggest")
  }

  test("saltedAgg validates its arguments") {
    intercept[IllegalArgumentException](
      Skew.saltedAgg(skewed, Seq.empty, Seq(Skew.Count("n"))))
    intercept[IllegalArgumentException](
      Skew.saltedAgg(skewed, Seq("k"), Seq.empty))
    intercept[IllegalArgumentException](
      Skew.saltedAgg(skewed, Seq("k"), Seq(Skew.Count("n")), saltN = 0))
  }
}

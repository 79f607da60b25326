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

  test("saltedJoin == plain join (inner and left), including unmatched rows") {
    import spark.implicits._
    val dim = Seq(("hot", 1.5), ("cold0", 2.0), ("cold1", 3.0), ("orphan", 9.9))
      .toDF("k", "w")
    // big side keeps cold2..cold4 unmatched so LEFT null-extension is exercised
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .select(col("k"), col("v"), col("id"), col("w"))
        .collect().map(key).sortBy(_.toString)
      val salted = Skew.saltedJoin(skewed, dim, Seq("k"), jt, saltN = 8)
        .select(col("k"), col("v"), col("id"), col("w"))
        .collect().map(key).sortBy(_.toString)
      assert(salted.toSeq == plain.toSeq, s"$jt salted join drifted")
    }
    // the orphan dim row must never surface through inner/left
    val out = Skew.saltedJoin(skewed, dim, Seq("k"), "inner", saltN = 8)
    assert(out.filter(col("k") === "orphan").count() == 0)
  }

  test("saltedJoin spreads the hot key over multiple join partitions") {
    import spark.implicits._
    val dim = Seq(("hot", 1.5), ("cold0", 2.0)).toDF("k", "w")
    // observe which shuffle partition each joined hot row lands in; AQE
    // would re-coalesce this tiny shuffle into one partition and mask
    // the spread, so pin coalescing off for the observation
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    val parts =
      try {
        spark.conf.set(coalesceKey, "false")
        Skew.saltedJoin(skewed, dim.hint("shuffle_hash"), Seq("k"), saltN = 8)
          .filter(col("k") === "hot")
          .select(spark_partition_id().as("p"))
          .distinct().collect().map(_.getInt(0))
      } finally spark.conf.set(coalesceKey, prev)
    assert(parts.length > 1,
      s"hot key still on a single join partition: ${parts.mkString(",")}")
    info(s"hot key joined across ${parts.length} partitions")
  }

  test("saltedJoin rejects outer join types") {
    import spark.implicits._
    val dim = Seq(("hot", 1.0)).toDF("k", "w")
    intercept[IllegalArgumentException](
      Skew.saltedJoin(skewed, dim, Seq("k"), "full_outer"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(skewed, dim, Seq("k"), "right"))
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

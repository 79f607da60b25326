package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Item-item collaborative filtering [N]: cosine similarity over basket
  * co-occurrence (the classic Amazon-style item-to-item recommender,
  * Linden/Smith/York 2003), top-3 neighbors per item.
  *
  * Scale shape — the detail that decides 100 TB viability: pairs are
  * generated per BASKET (self-join on the order key), so the expansion
  * is Σ_b k_b(k_b−1)/2 with k ≤ 13 here — linear in lineitems with a
  * small constant, never the |items|² all-pairs matrix. The pair
  * stream reduces by (i, j) with map-side combine, joins the two
  * broadcast-able item-frequency dims, and ranks inside the i
  * partition. Cosine = c_ij/√(c_i·c_j) is exact-int inputs through
  * one correctly-rounded sqrt/divide — identical IEEE on both
  * engines, no pinning needed. */
object Recommender extends graft.QueryModule {

  private def itemCosine(s: SparkSession, d: String): DataFrame = {
    // distinct (basket, item): a part twice in one order counts once
    val bi = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .distinct()
      .localCheckpoint() // reused 3x: two pair sides + the item dim
    val freq = bi.groupBy(col("i")).agg(count(lit(1)).as("ci"))
    val pairs = bi.as("x").join(bi.as("y"), col("x.b") === col("y.b"))
      .filter(col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("i"), col("y.i").as("j"))
      .agg(count(lit(1)).as("cij"))
    // symmetrize so every item ranks ALL its neighbors
    val sym = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j"), col("cij")))
    val scored = sym
      .join(broadcast(freq).withColumnRenamed("ci", "fi"), Seq("i"))
      .join(broadcast(freq.select(col("i").as("j"), col("ci").as("fj"))),
        Seq("j"))
      .select(col("i"), col("j"), col("cij"), col("fi"), col("fj"),
        (col("cij").cast("double") /
          sqrt(col("fi").cast("double") * col("fj").cast("double")))
          .as("cosine"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("i"))
          .orderBy(col("cosine").desc, col("cij").desc, col("j"))))
      .filter(col("rnk") <= 3)
      .select(col("i").as("item"), col("j").as("neighbor"),
        col("cij").as("cooc"), col("cosine"), col("rnk").cast("long").as("rnk"))
      .orderBy("item", "rnk")
  }

  private val itemCosineOracle =
    """WITH bi AS (
      |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
      |freq AS (SELECT i, count(*) AS ci FROM bi GROUP BY i),
      |pairs AS (
      |  SELECT x.i AS i, y.i AS j, count(*) AS cij
      |  FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
      |  GROUP BY x.i, y.i),
      |sym AS (
      |  SELECT i, j, cij FROM pairs
      |  UNION ALL
      |  SELECT j AS i, i AS j, cij FROM pairs),
      |scored AS (
      |  SELECT s.i, s.j, s.cij,
      |         CAST(s.cij AS DOUBLE)
      |           / sqrt(CAST(f1.ci AS DOUBLE) * CAST(f2.ci AS DOUBLE)) AS cosine
      |  FROM sym s JOIN freq f1 ON s.i = f1.i JOIN freq f2 ON s.j = f2.i),
      |ranked AS (
      |  SELECT i, j, cij, cosine,
      |         row_number() OVER (PARTITION BY i
      |           ORDER BY cosine DESC, cij DESC, j) AS rnk
      |  FROM scored)
      |SELECT i AS item, j AS neighbor, CAST(cij AS BIGINT) AS cooc, cosine,
      |       CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 3 ORDER BY item, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_item_cosine" -> itemCosine)

  val oracles: Map[String, String] = Map(
    "rec_item_cosine" -> itemCosineOracle)
}

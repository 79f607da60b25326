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

  /** One rank-1 ALS alternation [N] (Koren/Bell/Volinsky's alternating
    * least squares, the distributed-MF workhorse) over the
    * customer×part quantity matrix, v initialized to 1:
    *   user step:  u_i = Σ_j r_ij / n_i            (since v ≡ 1)
    *   item step:  v_j = Σ_i r_ij·u_i / Σ_i u_i²   (over item j's raters)
    * Both solves land on a ×10⁶ integer grid via half-even integer
    * division (the `text_ccnet_buckets` lesson: a ratio of exact sums
    * must divide on the grid, never round after a float divide). The
    * item-step denominator Σu6² reaches ~2.5e17 — past 2⁵³ — so it
    * accumulates as decimal(38,0)/HUGEINT and the division stays
    * integral end to end; the only floats are the /1e6 display casts.
    *
    * Scale shape: exactly distributed ALS — ratings shuffle once per
    * half-step on the side being solved (custkey, then partkey), the
    * factor table rides the join. Top-50 items by factor emit. */
  private def alsRank1(s: SparkSession, d: String): DataFrame = {
    val ratings = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity").cast("bigint")).as("r"))
    val users = ratings.groupBy("cust")
      .agg(sum(col("r")).as("sr"), count(lit(1)).as("nr"))
      .selectExpr("cust",
        graft.ops.Technicals.divHESparkSql("sr * 1000000", "nr") + " as u6")
    val items = ratings.join(users, "cust")
      .groupBy("item")
      .agg(sum(col("r") * col("u6")).as("num"),
        sum((col("u6") * col("u6")).cast("decimal(38,0)")).as("den"),
        count(lit(1)).as("n_raters"))
      .selectExpr("item", "n_raters",
        graft.ops.Technicals.divHESparkSql(
          "cast(num as decimal(38,0)) * 1000000", "den") + " as v6")
    items
      .select(col("item"), col("n_raters"),
        (col("v6").cast("double") / lit(1.0e6)).as("v"))
      .orderBy(col("v").desc, col("item"))
      .limit(50)
  }

  private def alsRank1Oracle: String = {
    val u6 = Technicals.divHEDuckSql("sr * 1000000", "nr")
    val v6 = Technicals.divHEDuckSql(
      "CAST(num AS HUGEINT) * 1000000", "den")
    s"""WITH ratings AS (
       |  SELECT o_custkey AS cust, l_partkey AS item,
       |         sum(CAST(l_quantity AS BIGINT)) AS r
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |users AS (
       |  SELECT cust, $u6 AS u6
       |  FROM (SELECT cust, sum(r) AS sr, count(*) AS nr
       |        FROM ratings GROUP BY cust)),
       |items AS (
       |  SELECT item, count(*) AS n_raters,
       |         sum(r * u6) AS num,
       |         sum(CAST(u6 AS HUGEINT) * u6) AS den
       |  FROM ratings JOIN users USING (cust) GROUP BY item)
       |SELECT item, CAST(n_raters AS BIGINT) AS n_raters,
       |       CAST($v6 AS DOUBLE) / 1.0e6 AS v
       |FROM items ORDER BY v DESC, item LIMIT 50""".stripMargin
  }

  /** Weighted Slope One [N] (Lemire & Maclachlan, SDM 2005) — the
    * deliberately-simple rating predictor that beats memory-based CF
    * at a fraction of the cost: dev(j,i) = mean over co-raters of
    * (r(u,j) − r(u,i)), and the weighted prediction folds to
    * P(u,j) = Σ_i (diff_sum(j,i) + r(u,i)·n(j,i)) / Σ_i n(j,i)
    * — EXACT integers (implicit count ratings) into one IEEE
    * division, so the key hash-matches with no pinning. Scale shape:
    * ratings are one (user, item) hash agg; the pair self-join is
    * per-user over the ITEM-TYPE domain (domain² per user, never
    * data²); the deviation matrix is domain²-bounded and broadcasts
    * against the sampled probe users. */
  private def slopeOne(s: SparkSession, d: String): DataFrame = {
    val r = Tables.events(s, d)
      .groupBy(col("user_id").as("u"), col("event_type").as("i"))
      .agg(count(lit(1)).as("r"))
      .localCheckpoint() // reused 3x: two pair sides + the probe
    val dev = r.as("x").join(r.as("y"),
        col("x.u") === col("y.u") && col("x.i") =!= col("y.i"))
      .groupBy(col("x.i").as("j"), col("y.i").as("i2"))
      .agg(sum(col("x.r") - col("y.r")).as("diff_sum"),
        count(lit(1)).as("n"))
    val pred = r.as("p").filter(col("u") < 10)
      .join(broadcast(dev), col("p.i") === col("i2"))
      .groupBy(col("p.u").as("user_id"), col("j").as("item"))
      .agg(sum(col("diff_sum") + col("p.r") * col("n")).as("num"),
        sum(col("n")).as("den"))
      .select(col("user_id"), col("item"),
        bround(col("num").cast("double") / col("den").cast("double"), 8)
          .as("pred"))
    pred.join(r,
        col("user_id") === col("u") && col("item") === col("i"), "left")
      .select(col("user_id"), col("item"), col("pred"),
        col("r").as("actual"))
      .orderBy("user_id", "item")
  }

  private def slopeOneOracle: String =
    """WITH r AS (
      |  SELECT user_id AS u, event_type AS i, count(*) AS r
      |  FROM events GROUP BY 1, 2),
      |dev AS (
      |  SELECT x.i AS j, y.i AS i2, sum(x.r - y.r) AS diff_sum,
      |         count(*) AS n
      |  FROM r x JOIN r y ON x.u = y.u AND x.i <> y.i
      |  GROUP BY 1, 2),
      |pred AS (
      |  SELECT p.u AS user_id, d.j AS item,
      |         round_even(CAST(sum(d.diff_sum + p.r * d.n) AS DOUBLE)
      |           / CAST(sum(d.n) AS DOUBLE), 8) AS pred
      |  FROM r p JOIN dev d ON p.i = d.i2
      |  WHERE p.u < 10
      |  GROUP BY 1, 2)
      |SELECT pred.user_id, pred.item, pred.pred, rr.r AS actual
      |FROM pred LEFT JOIN r rr
      |  ON pred.user_id = rr.u AND pred.item = rr.i
      |ORDER BY user_id, item""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_item_cosine" -> itemCosine,
    "rec_als_rank1" -> alsRank1,
    "rec_slope_one" -> slopeOne)

  val oracles: Map[String, String] = Map(
    "rec_item_cosine" -> itemCosineOracle,
    "rec_als_rank1" -> alsRank1Oracle,
    "rec_slope_one" -> slopeOneOracle)
}

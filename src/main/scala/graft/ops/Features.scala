package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Feature-engineering and distribution-drift operators [N] — the
  * supervised-ML data-prep family a training warehouse runs before any
  * model sees the data: smoothed target encoding, weight-of-evidence /
  * information value, per-group min-max scaling, equal-frequency
  * bucketing, and the population stability index (PSI) drift monitor.
  * No reference anchor; warehouse-parity rows per BASELINE.json's
  * mandate, nearest SURVEY anchors §2.C and the §L stats battery.
  *
  * Float discipline: ratios assemble from exact integer aggregates in
  * mirrored IEEE order; every `ln` is pinned at 6dp the moment it is
  * computed (`bround(log x, 6)` ↔ `round_even(ln x, 6)` — the
  * `text_logprob` acceptance), and PSI's per-bin contributions re-pin
  * at 12dp and sum as decimal(24,12) so the total is order-invariant
  * (the `graph_pagerank` discipline). */
object Features extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  private def orderCents: Column = Synth.orderCents

  /** Smoothed target (mean) encoding [N] — per priority category, the
    * Bayesian-smoothed positive rate enc = (pos + m·prior)/(n + m)
    * with m = 100 and the global prior from a 1-row broadcast. One
    * conditional hash agg into the 5-category domain; enc is IEEE
    * arithmetic over exact counts in mirrored order. */
  private def targetEncode(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderpriority").as("category"),
        (col("o_orderstatus") === "F").as("y"))
    val g = base.groupBy(col("category"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val tot = base.agg(count(lit(1)).as("nt"),
      sum(when(col("y"), 1L).otherwise(0L)).as("post"))
    g.crossJoin(broadcast(tot))
      .withColumn("prior", dd(col("post")) / dd(col("nt")))
      .select(col("category"), col("n"), col("pos"), col("prior"),
        ((dd(col("pos")) + lit(100.0) * col("prior")) /
          (dd(col("n")) + lit(100.0))).as("enc"))
      .orderBy("category")
  }

  /** Weight of evidence + information value terms [N] — per category,
    * woe = ln((pos_i/POS)/(neg_i/NEG)) pinned at 6dp, and the IV
    * contribution (pos_i/POS − neg_i/NEG)·woe. The credit-scoring
    * feature screen; same 5-category domain agg as target encoding. */
  private def woeIv(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderpriority").as("category"),
        (col("o_orderstatus") === "F").as("y"))
    val g = base.groupBy(col("category"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("neg"))
    val tot = base.agg(sum(when(col("y"), 1L).otherwise(0L)).as("post"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("negt"))
    g.crossJoin(broadcast(tot))
      .withColumn("p", dd(col("pos")) / dd(col("post")))
      .withColumn("q", dd(col("neg")) / dd(col("negt")))
      .withColumn("woe", bround(log(col("p") / col("q")), 6))
      .select(col("category"), col("pos"), col("neg"), col("woe"),
        ((col("p") - col("q")) * col("woe")).as("iv_term"))
      .orderBy("category")
  }

  /** Per-group min-max scaling [N] — each order's price rescaled to
    * [0,1] within its priority group, on exact cents. One domain agg +
    * broadcast join + pure projection (zero extra shuffles at any
    * scale); the scale is ONE IEEE division of exact integer spans. */
  private def minmaxScale(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("g"),
        orderCents.as("cents"))
    val ranges = base.groupBy(col("g"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    base.join(broadcast(ranges), "g")
      .filter(col("hi") > col("lo"))
      .select(col("o_orderkey"), col("g"),
        (dd(col("cents") - col("lo")) / dd(col("hi") - col("lo")))
          .as("scaled"))
      .orderBy("o_orderkey")
  }

  /** Equal-frequency (quartile) bucketing [N] at $100 granularity:
    * every $100 price bin is assigned the quartile its cumulative
    * position falls in — the declared tie semantics (all rows of a bin
    * share a bucket). Cumulative counts run over the BOUNDED bin
    * domain (the `win_skyline` class), never over raw rows. */
  private def quantileBucket(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bins = Tables.orders(s, d)
      .groupBy(expr(
        "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 10000"
      ).as("v"))
      .agg(count(lit(1)).as("n"))
    val tot = bins.agg(sum(col("n")).as("nt"))
    bins
      .withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("n"),
        least(lit(3L), expr("(before * 4) div nt")).as("bucket"))
      .orderBy("v")
  }

  /** Population stability index [N] — the model-monitoring drift
    * metric between open ('O') and fulfilled ('F') order prices over
    * $10k bins (coarse on purpose: PSI's add-one smoothing must stay
    * a small correction, which needs bins ≫ 1 expected count — at
    * $100 granularity the smoothing mass dominates the statistic):
    * PSI = Σ (p_i − q_i)·ln(p_i/q_i). Each bin's ln is pinned at 6dp,
    * each contribution re-pins at 12dp and sums as decimal(24,12) —
    * the total is order-invariant, one final 6dp rounding. One hash
    * agg into the bin domain; bin count B is a 1-row broadcast. */
  private def psi(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(expr(
        "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 1000000"
      ).as("v"))
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c1"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("c2"))
    val tot = cells.agg(count(lit(1)).as("b"),
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cells.crossJoin(broadcast(tot))
      .withColumn("p", dd(col("c1") + 1) / dd(col("n1") + col("b")))
      .withColumn("q", dd(col("c2") + 1) / dd(col("n2") + col("b")))
      .select(bround((col("p") - col("q")) * bround(log(col("p") / col("q")), 6), 12)
        .cast("decimal(24,12)").as("t"))
      .agg(bround(dd(sum(col("t"))), 6).as("psi"))
  }

  /** The feature hashing trick [N] (Weinberger et al. 2009 — the
    * vocabulary-free featurizer a 100 TB text pipeline needs: no
    * dictionary to build, broadcast, or keep consistent): every word
    * hashes to one of D=64 buckets, a second hash bit supplies the ±1
    * sign that keeps collisions unbiased, and the per-(doc, bucket)
    * signed count is one explode + hash agg. Index and sign both come
    * from md5 hex (conv here, strpos polynomial in the oracle). */
  private def hashingTrick(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .selectExpr("doc_id",
        "graft_hex_long(md5(concat(w, ':hash')), 1, 4) % 64 as idx",
        "case when graft_hex_long(md5(concat(w, ':hash')), 5, 1)" +
          " % 2 = 0 then 1L else -1L end as sign")
      .groupBy(col("doc_id"), col("idx"))
      .agg(sum(col("sign")).as("val"))
      .orderBy("doc_id", "idx")
  }

  private val hashingTrickOracle = {
    val hex4 = (0 until 4).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(w || ':hash'), ${i + 1}, 1))" +
        s" - 1) * ${1L << (4 * (3 - i))}"
    }.mkString("(", " + ", ")")
    val sign = "(strpos('0123456789abcdef', substr(md5(w || ':hash'), 5, 1)) - 1)"
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |h AS (
       |  SELECT doc_id, $hex4 % 64 AS idx,
       |         CASE WHEN $sign % 2 = 0 THEN 1 ELSE -1 END AS sign
       |  FROM words WHERE w <> '')
       |SELECT doc_id, idx, CAST(sum(sign) AS BIGINT) AS val
       |FROM h GROUP BY doc_id, idx
       |ORDER BY doc_id, idx""".stripMargin
  }

  /** Point-in-time-correct training-set assembly [N] — the feature-
    * store flagship: for every 1998 order (the example spine), build
    * leak-free customer features from STRICTLY PRIOR history (running
    * spend, order count, recency via window frames ending at −1), a
    * FUTURE label (next order within 90 days, via lead), and an
    * md5-coin train/valid/test split keyed on the ENTITY (customer —
    * so no customer straddles splits and leaks their own history).
    * The whole set is ONE declarative plan: a single shuffle on
    * custkey drives every feature window AND the label — no
    * per-example point lookups, which is exactly what makes the shape
    * scale (the per-example-join formulation re-shuffles the history
    * once per feature).
    *
    * Same-day earlier orders (tie-broken by orderkey) count as
    * "prior": the ordering is total, so the feature values are
    * deterministic and the oracle replays them row-for-row. */
  private def trainingSet(s: SparkSession, d: String): DataFrame = {
    val cents = "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wPrior = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr(cents).as("cts"))
      .withColumn("spend_prior",
        coalesce(sum(col("cts")).over(wPrior), lit(0L)))
      .withColumn("orders_prior", count(lit(1)).over(wPrior))
      .withColumn("recency_days", coalesce(
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)), lit(-1)))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .filter(year(col("o_orderdate")) === 1998)
      .select(col("o_orderkey"), col("o_custkey"),
        col("spend_prior"), col("orders_prior"), col("recency_days"),
        when(col("next_date").isNotNull &&
          datediff(col("next_date"), col("o_orderdate")) <= 90, 1)
          .otherwise(0).as("label"),
        expr("cast(graft_hex_long(md5(concat(cast(o_custkey as string)," +
          " ':ts')), 1, 4) as int) % 100").as("bucket"))
      .select(col("o_orderkey"), col("o_custkey"), col("spend_prior"),
        col("orders_prior"), col("recency_days"), col("label"),
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "valid")
          .otherwise("test").as("split"))
      .orderBy("o_orderkey")
  }

  private def trainingSetOracle: String =
    """WITH hist AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           AS cts,
      |         COALESCE(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |             AS BIGINT)) OVER w1, 0) AS spend_prior,
      |         count(*) OVER w1 AS orders_prior,
      |         COALESCE(date_diff('day',
      |           lag(o_orderdate) OVER w2, o_orderdate), -1) AS recency_days,
      |         lead(o_orderdate) OVER w2 AS next_date
      |  FROM orders
      |  WINDOW w1 AS (PARTITION BY o_custkey
      |                ORDER BY o_orderdate, o_orderkey
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         w2 AS (PARTITION BY o_custkey
      |                ORDER BY o_orderdate, o_orderkey)),
      |spine AS (
      |  SELECT o_orderkey, o_custkey, spend_prior, orders_prior,
      |         CAST(recency_days AS INTEGER) AS recency_days,
      |         CASE WHEN next_date IS NOT NULL
      |               AND date_diff('day', o_orderdate, next_date) <= 90
      |              THEN 1 ELSE 0 END AS label,
      |         CAST((
      |             (strpos('0123456789abcdef', substr(md5(
      |               CAST(o_custkey AS VARCHAR) || ':ts'), 1, 1)) - 1) * 4096
      |           + (strpos('0123456789abcdef', substr(md5(
      |               CAST(o_custkey AS VARCHAR) || ':ts'), 2, 1)) - 1) * 256
      |           + (strpos('0123456789abcdef', substr(md5(
      |               CAST(o_custkey AS VARCHAR) || ':ts'), 3, 1)) - 1) * 16
      |           + (strpos('0123456789abcdef', substr(md5(
      |               CAST(o_custkey AS VARCHAR) || ':ts'), 4, 1)) - 1)) % 100
      |           AS INTEGER) AS bucket
      |  FROM hist WHERE year(o_orderdate) = 1998)
      |SELECT o_orderkey, o_custkey, CAST(spend_prior AS BIGINT)
      |         AS spend_prior,
      |       CAST(orders_prior AS BIGINT) AS orders_prior, recency_days,
      |       label,
      |       CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'valid'
      |            ELSE 'test' END AS split
      |FROM spine ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feat_training_set" -> trainingSet,
    "feat_hashing_trick" -> hashingTrick,
    "feat_target_encode" -> targetEncode,
    "feat_woe_iv" -> woeIv,
    "feat_minmax_scale" -> minmaxScale,
    "feat_quantile_bucket" -> quantileBucket,
    "stats_psi" -> psi)

  val oracles: Map[String, String] = Map(
    "feat_training_set" -> trainingSetOracle,
    "feat_hashing_trick" -> hashingTrickOracle,
    "feat_target_encode" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS category, count(*) AS n,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nt,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS post
        |  FROM orders)
        |SELECT category, n, pos,
        |       CAST(post AS DOUBLE) / CAST(nt AS DOUBLE) AS prior,
        |       (CAST(pos AS DOUBLE) + 100.0 * (CAST(post AS DOUBLE) / CAST(nt AS DOUBLE)))
        |         / (CAST(n AS DOUBLE) + 100.0) AS enc
        |FROM g, tot ORDER BY category""".stripMargin,
    "feat_woe_iv" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS category,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |         CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS neg
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS post,
        |         CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS negt
        |  FROM orders),
        |r AS (
        |  SELECT category, pos, neg,
        |         CAST(pos AS DOUBLE) / CAST(post AS DOUBLE) AS p,
        |         CAST(neg AS DOUBLE) / CAST(negt AS DOUBLE) AS q
        |  FROM g, tot)
        |SELECT category, pos, neg,
        |       round_even(ln(p / q), 6) AS woe,
        |       (p - q) * round_even(ln(p / q), 6) AS iv_term
        |FROM r ORDER BY category""".stripMargin,
    "feat_minmax_scale" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderpriority AS g,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |ranges AS (
        |  SELECT g, min(cents) AS lo, max(cents) AS hi FROM base GROUP BY g)
        |SELECT b.o_orderkey, b.g,
        |       CAST(b.cents - r.lo AS DOUBLE) / CAST(r.hi - r.lo AS DOUBLE) AS scaled
        |FROM base b JOIN ranges r USING (g)
        |WHERE r.hi > r.lo ORDER BY o_orderkey""".stripMargin,
    "feat_quantile_bucket" ->
      """WITH bins AS (
        |  SELECT (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 10000 AS v,
        |         count(*) AS n
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM bins),
        |c AS (
        |  SELECT v, n,
        |         coalesce(sum(n) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM bins)
        |SELECT v, n, CAST(least(3, (before * 4) // nt) AS BIGINT) AS bucket
        |FROM c, tot ORDER BY v""".stripMargin,
    "stats_psi" ->
      """WITH cells AS (
        |  SELECT (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 1000000 AS v,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c2
        |  FROM orders WHERE o_orderstatus IN ('F','O') GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS b,
        |         CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
        |  FROM cells),
        |terms AS (
        |  SELECT CAST(round_even(
        |           (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + b AS DOUBLE)
        |            - CAST(c2 + 1 AS DOUBLE) / CAST(n2 + b AS DOUBLE))
        |           * round_even(ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + b AS DOUBLE))
        |                           / (CAST(c2 + 1 AS DOUBLE) / CAST(n2 + b AS DOUBLE))), 6),
        |           12) AS DECIMAL(24,12)) AS t
        |  FROM cells, tot)
        |SELECT round_even(CAST(sum(t) AS DOUBLE), 6) AS psi FROM terms""".stripMargin)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Closed-form / pinned-iteration statistical learning [N]: one-way
  * ANOVA, ridge regression, an integer batch perceptron, the jackknife
  * for a ratio estimator, and the Theil–Sen robust line.
  *
  * Shared discipline (the `stats_ols_multi` / `graph_pagerank`
  * lessons): every data-scale reduction is an EXACT integer/decimal
  * sum, floats appear only in final formulas assembled from identical
  * exact inputs, and any value that must survive a re-aggregation is
  * pinned with `bround` at a grid coarser than the double ULP at its
  * magnitude. The 100 TB shape is the same for all five: touch the
  * fact table once (or once per pinned iteration), reduce to a
  * group/domain-sized relation, finish with constant work.
  */
object StatsLearn extends graft.QueryModule {

  /** o_totalprice as the exact $1000 bin (|v| ≤ 350 after centering at
    * 0; here uncentered, 0..~600) — the `agg_skewkurt` integer-valued
    * pin. */
  private val binExprSpark = "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 100000"
  private val binExprDuck = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 100000"

  // ---- one-way ANOVA --------------------------------------------------

  /** One-way ANOVA of the $1000 order-value bin across the 5 priority
    * groups. Per-group exact sums (n, Σy, Σy² — decimal(38,0), the
    * skewKurt overflow lesson) collapse to 5 rows; the between/within
    * decomposition needs Σ_g s_g²/n_g, a sum of per-group DOUBLES whose
    * addition order neither engine pins — so each term is bround'ed to
    * the integer grid (term magnitude ~10¹⁰, ULP ~10⁻⁵; relative error
    * ~10⁻¹¹, immaterial to F) and summed as decimal(38,0), restoring
    * order-invariance. F's final assembly is one expression over
    * identical exact inputs. */
  private def anova(s: SparkSession, d: String): DataFrame = {
    val g = Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"), expr(binExprSpark).as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("sg"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("qg"))
      .select(col("n"), col("sg"), col("qg"),
        bround(col("sg").cast("double") * col("sg").cast("double") /
          col("n").cast("double"), 0).cast("decimal(38,0)").as("tg"))
    g.agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(col("tg")).as("t"))
      .selectExpr("cast(k as bigint) as k", "cast(n as bigint) as n",
        "cast(s as double) as sd", "cast(q as double) as qd",
        "cast(t as double) as td")
      .selectExpr("k", "n",
        "td - sd * sd / cast(n as double) as ssb",
        "qd - td as ssw")
      .selectExpr("k", "n", "ssb", "ssw",
        "(ssb / cast(k - 1 as double)) / (ssw / cast(n - k as double)) as f_stat")
  }

  private val anovaOracle =
    s"""WITH g AS (
       |  SELECT o_orderpriority AS g, count(*) AS n,
       |         sum($binExprDuck) AS sg,
       |         sum(CAST($binExprDuck AS HUGEINT) * ($binExprDuck)) AS qg
       |  FROM orders GROUP BY 1),
       |p AS (
       |  SELECT n, sg, qg,
       |         CAST(round_even(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
       |              / CAST(n AS DOUBLE), 0) AS HUGEINT) AS tg
       |  FROM g),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
       |         CAST(sum(sg) AS DOUBLE) AS sd, CAST(sum(qg) AS DOUBLE) AS qd,
       |         CAST(sum(tg) AS DOUBLE) AS td
       |  FROM p),
       |b AS (
       |  SELECT k, n, td - sd * sd / CAST(n AS DOUBLE) AS ssb, qd - td AS ssw
       |  FROM a)
       |SELECT k, n, ssb, ssw,
       |       (ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)) AS f_stat
       |FROM b""".stripMargin

  // ---- ridge regression ----------------------------------------------

  /** Ridge regression (λ on the feature diagonal, intercept unpenalized
    * — the scikit-learn convention) over the `stats_ols_multi` design:
    * price_dollars ~ quantity + discount_pct on lineitem. Identical
    * one-pass exact power sums; Cramer's rule on the λ-shifted normal
    * matrix [[n, sx1, sx2], [sx1, s11+λ, s12], [sx2, s12, s22+λ]].
    * The formula STRINGS are shared between the Spark selectExpr and
    * the DuckDB oracle so IEEE evaluation order cannot drift. */
  private val ridgeLambda = "100000.0"
  private val rDet =
    s"(nn * (r11d * r22d - s12d * s12d) - sx1d * (sx1d * r22d - s12d * sx2d)" +
      s" + sx2d * (sx1d * s12d - r11d * sx2d))"
  private val rDet0 =
    s"(syd * (r11d * r22d - s12d * s12d) - sx1d * (s1yd * r22d - s12d * s2yd)" +
      s" + sx2d * (s1yd * s12d - r11d * s2yd))"
  private val rDet1 =
    s"(nn * (s1yd * r22d - s12d * s2yd) - syd * (sx1d * r22d - s12d * sx2d)" +
      s" + sx2d * (sx1d * s2yd - s1yd * sx2d))"
  private val rDet2 =
    s"(nn * (r11d * s2yd - s1yd * s12d) - sx1d * (sx1d * s2yd - s1yd * sx2d)" +
      s" + syd * (sx1d * s12d - r11d * sx2d))"
  private val ridgeDoubles = Seq("nn" -> "n", "sx1d" -> "sx1",
    "sx2d" -> "sx2", "s11d" -> "s11", "s12d" -> "s12", "s22d" -> "s22",
    "syd" -> "sy", "s1yd" -> "s1y", "s2yd" -> "s2y")

  private def ridge(s: SparkSession, d: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val base = Tables.lineitem(s, d).select(
      col("l_quantity").cast("long").as("x1"),
      (col("l_discount").cast("decimal(4,2)") * 100).cast("long").as("x2"),
      expr("(cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint))" +
        " div 100").as("y"))
    val a = base.agg(
      count(lit(1)).as("n"),
      sum(dec(col("x1"))).as("sx1"), sum(dec(col("x2"))).as("sx2"),
      sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
      sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
      sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
      sum(dec(col("y"))).as("sy"),
      sum(dec(col("x1")) * dec(col("y"))).as("s1y"),
      sum(dec(col("x2")) * dec(col("y"))).as("s2y"))
    a.selectExpr("cast(n as bigint) as n" +:
        ridgeDoubles.map { case (d2, src) => s"cast($src as double) as $d2" }: _*)
      .selectExpr("n", "nn", "syd", "s1yd", "s2yd", "sx1d", "sx2d", "s12d",
        s"s11d + $ridgeLambda as r11d", s"s22d + $ridgeLambda as r22d")
      .selectExpr("n", s"cast($ridgeLambda as double) as lambda",
        s"$rDet0 / $rDet as b0",
        s"$rDet1 / $rDet as b1",
        s"$rDet2 / $rDet as b2")
  }

  private def ridgeOracle: String = {
    val dbls = ridgeDoubles
      .map { case (d2, src) => s"CAST($src AS DOUBLE) AS $d2" }
      .mkString(",\n|         ")
    s"""WITH base AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS x1,
       |         CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x2,
       |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |           // 100 AS y
       |  FROM lineitem),
       |a AS (
       |  SELECT count(*) AS n,
       |         sum(CAST(x1 AS HUGEINT)) AS sx1,
       |         sum(CAST(x2 AS HUGEINT)) AS sx2,
       |         sum(CAST(x1 AS HUGEINT) * x1) AS s11,
       |         sum(CAST(x1 AS HUGEINT) * x2) AS s12,
       |         sum(CAST(x2 AS HUGEINT) * x2) AS s22,
       |         sum(CAST(y AS HUGEINT)) AS sy,
       |         sum(CAST(x1 AS HUGEINT) * y) AS s1y,
       |         sum(CAST(x2 AS HUGEINT) * y) AS s2y
       |  FROM base),
       |v AS (
       |  SELECT CAST(n AS BIGINT) AS n,
       |         $dbls
       |  FROM a),
       |w AS (
       |  SELECT n, nn, syd, s1yd, s2yd, sx1d, sx2d, s12d,
       |         s11d + $ridgeLambda AS r11d, s22d + $ridgeLambda AS r22d
       |  FROM v)
       |SELECT n, CAST($ridgeLambda AS DOUBLE) AS lambda,
       |       $rDet0 / $rDet AS b0,
       |       $rDet1 / $rDet AS b1,
       |       $rDet2 / $rDet AS b2
       |FROM w""".stripMargin
  }

  // ---- batch perceptron ----------------------------------------------

  /** Batch perceptron, 3 epochs, learning rate 1 — the one iterative
    * trainer that needs NO pinning at all: integer features
    * (x1 = $1000 bin, x2 = priority rank, bias 1), label ±1
    * (fulfilled?), so with lr=1 the weight vector stays exact BIGINT
    * through every epoch (w ≤ Σ|y·x| ~ 10⁸ per epoch, far from 2⁶³;
    * the oracle's HUGEINT sums cast back loudly). Each epoch is one
    * full scan reducing to the 3 misclassified-gradient sums — the
    * distributed-training shape (map-side combine, driver-side 3-adds),
    * batch-exact like a single allreduce step. */
  private val perceptronEpochs = 3

  private def perceptron(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      expr(binExprSpark).as("x1"),
      expr("cast(substring(o_orderpriority, 1, 1) as bigint)").as("x2"),
      expr("case when o_orderstatus = 'F' then 1L else -1L end").as("y"))
    var w = (0L, 0L, 0L)
    for (_ <- 1 to perceptronEpochs) {
      val du = base
        .filter(expr(s"y * (${w._1} + ${w._2} * x1 + ${w._3} * x2) <= 0"))
        .agg(sum(col("y")).as("d0"), sum(col("y") * col("x1")).as("d1"),
          sum(col("y") * col("x2")).as("d2"))
        .collect().head
      def g(i: Int): Long = if (du.isNullAt(i)) 0L else du.getLong(i)
      w = (w._1 + g(0), w._2 + g(1), w._3 + g(2))
    }
    val errs = base
      .filter(expr(s"y * (${w._1} + ${w._2} * x1 + ${w._3} * x2) <= 0"))
      .count()
    val n = base.count()
    s.range(1).selectExpr(s"${perceptronEpochs} as epochs",
      s"${w._1}L as w0", s"${w._2}L as w1", s"${w._3}L as w2",
      s"${errs}L as n_errors", s"${n}L as n")
  }

  private def perceptronOracle: String = {
    val rounds = (1 to perceptronEpochs).map { k =>
      s"""w$k AS (
         |  SELECT w.w0 + coalesce(CAST(sum(b.y) AS BIGINT), 0) AS w0,
         |         w.w1 + coalesce(CAST(sum(b.y * b.x1) AS BIGINT), 0) AS w1,
         |         w.w2 + coalesce(CAST(sum(b.y * b.x2) AS BIGINT), 0) AS w2
         |  FROM w${k - 1} w LEFT JOIN base b
         |    ON b.y * (w.w0 + w.w1 * b.x1 + w.w2 * b.x2) <= 0
         |  GROUP BY w.w0, w.w1, w.w2)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT $binExprDuck AS x1,
       |         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x2,
       |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE -1 END AS y
       |  FROM orders),
       |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |              CAST(0 AS BIGINT) AS w2),
       |$rounds
       |SELECT $perceptronEpochs AS epochs, w.w0, w.w1, w.w2,
       |       (SELECT count(*) FROM base b
       |        WHERE b.y * (w.w0 + w.w1 * b.x1 + w.w2 * b.x2) <= 0) AS n_errors,
       |       (SELECT count(*) FROM base) AS n
       |FROM w$perceptronEpochs w""".stripMargin
  }

  // ---- jackknife for a ratio estimator -------------------------------

  /** Delete-one jackknife SE of the ratio estimator θ = Σrevenue/Σqty
    * ($ per unit) per returnflag — the estimator whose SE has no
    * closed form, computed WITHOUT n re-computations: each leave-one-out
    * replicate is algebra over the broadcast group totals,
    * θ₍ᵢ₎ = (S_r − rᵢ)/(S_q − qᵢ), one scan total. Replicates are
    * pinned at 9dp (θ ~ 10³, ULP ~2·10⁻¹³ — grid safely coarser) and
    * reduced as exact decimals: Σθ as decimal(38,12), Σθ² via the
    * exact decimal(13,9)² → decimal(27,18) square, so the variance of
    * 600k doubles is order-invariant. */
  private def jackknife(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint)").as("r"),
      col("l_quantity").cast("long").as("q"))
    val tot = base.groupBy(col("flag"))
      .agg(sum(col("r")).as("sr"), sum(col("q")).as("sq"),
        count(lit(1)).as("n"))
    // jk lives on a scaled-BIGINT 1e-9 grid, never a wide decimal: the
    // DuckDB (19,9)×(13,9) decimal multiply rounds each product through
    // a double (measured at sf0.1: Σjk² off by 3e-5, amplified ~1e4× by
    // the variance cancellation), while BIGINT²→HUGEINT/decimal sums are
    // exact integers whose ONE double conversion is bit-identical in
    // both engines.
    base.join(broadcast(tot), "flag")
      .select(col("flag"), col("n"),
        col("sr"), col("sq"),
        bround((col("sr") - col("r")).cast("double") /
          (col("sq") - col("q")).cast("double") / lit(100.0) * lit(1e9), 0)
          .cast("long").as("jk9"))
      .groupBy(col("flag"))
      .agg(max(col("n")).as("n"),
        max(col("sr")).as("sr"), max(col("sq")).as("sq"),
        sum(col("jk9")).as("sjk9"),
        // decimal(20,0): any BIGINT jk9 fits, the square is (38,0)-exact
        // (≤1e38), and non-ANSI overflow-to-null can't fire — at (14,0) a
        // pseudovalue past ~1e14 (tiny sq−q denominator) would silently
        // null out while DuckDB's HUGEINT path stayed exact (ADVICE r11)
        sum(col("jk9").cast("decimal(20,0)") *
          col("jk9").cast("decimal(20,0)")).as("sjk2i"))
      .selectExpr("flag", "cast(n as bigint) as n",
        "cast(sr as double) / cast(sq as double) / 100.0 as theta",
        "cast(n as double) as nd", "cast(sjk9 as double) as sjkd",
        "cast(sjk2i as double) as sjk2d")
      .selectExpr("flag", "n", "theta",
        "sjkd / 1000000000.0 / nd as jk_mean",
        "sqrt((nd - 1.0) / nd * (sjk2d / 1e18 - " +
          "(sjkd / 1000000000.0) * (sjkd / 1000000000.0) / nd)) as jk_se")
      .orderBy("flag")
  }

  private val jackknifeOracle =
    """WITH base AS (
      |  SELECT l_returnflag AS flag,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS r,
      |         CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem),
      |tot AS (
      |  SELECT flag, CAST(sum(r) AS BIGINT) AS sr,
      |         CAST(sum(q) AS BIGINT) AS sq, count(*) AS n
      |  FROM base GROUP BY flag),
      |jk AS (
      |  SELECT b.flag, t.n, t.sr, t.sq,
      |         CAST(round_even(CAST(t.sr - b.r AS DOUBLE)
      |              / CAST(t.sq - b.q AS DOUBLE) / 100.0 * 1e9, 0)
      |              AS BIGINT) AS jk9
      |  FROM base b JOIN tot t USING (flag)),
      |a AS (
      |  SELECT flag, CAST(max(n) AS BIGINT) AS n,
      |         max(sr) AS sr, max(sq) AS sq,
      |         CAST(sum(jk9) AS HUGEINT) AS sjk9,
      |         sum(CAST(jk9 AS HUGEINT) * jk9) AS sjk2i
      |  FROM jk GROUP BY flag),
      |v AS (
      |  SELECT flag, n,
      |         CAST(sr AS DOUBLE) / CAST(sq AS DOUBLE) / 100.0 AS theta,
      |         CAST(n AS DOUBLE) AS nd, CAST(sjk9 AS DOUBLE) AS sjkd,
      |         CAST(sjk2i AS DOUBLE) AS sjk2d
      |  FROM a)
      |SELECT flag, n, theta,
      |       sjkd / 1000000000.0 / nd AS jk_mean,
      |       sqrt((nd - 1.0) / nd * (sjk2d / 1e18
      |            - (sjkd / 1000000000.0) * (sjkd / 1000000000.0) / nd)) AS jk_se
      |FROM v ORDER BY flag""".stripMargin

  // ---- Theil–Sen robust line -----------------------------------------

  /** Theil–Sen estimator of the daily-revenue trend: the (lower) median
    * of all pairwise slopes over the DAY domain, then the median
    * intercept at the chosen slope. The pair expansion is
    * calendar-bounded (D ≈ 2.4k days → ~2.9M pairs at ANY SF — the
    * whole point: data scale only sharpens each day's exact revenue
    * sum, the robust fit runs on the bounded domain). Slopes are exact
    * int ratios evaluated once in doubles (identical IEEE on both
    * engines); medians are rank SELECTIONS (row_number over
    * (slope, t1, t2)), never averages — no float accumulation
    * anywhere. */
  private def theilSen(s: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr(binExprSpark)).as("r"))
      .select(datediff(col("day"), lit("1995-01-01").cast("date")).as("t"),
        col("r"))
      .localCheckpoint()
    val a = days.select(col("t").as("t1"), col("r").as("r1"))
    val b = days.select(col("t").as("t2"), col("r").as("r2"))
    val slopes = a.join(b, col("t1") < col("t2"))
      .select(((col("r2") - col("r1")).cast("double") /
        (col("t2") - col("t1")).cast("double")).as("slope"),
        col("t1"), col("t2"))
    val np = slopes.count()
    val med = slopes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("slope"), col("t1"), col("t2"))))
      .filter(col("rn") === lit((np + 1) / 2))
      .select(col("slope"))
    val nd = days.count()
    val inter = days.crossJoin(broadcast(med))
      .select((col("r").cast("double") -
        col("slope") * col("t").cast("double")).as("ic"),
        col("t"), col("slope"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("ic"), col("t"))))
      .filter(col("rn") === lit((nd + 1) / 2))
    inter.select(lit(nd).as("n_days"), lit(np).as("n_pairs"),
      col("slope"), col("ic").as("intercept"))
  }

  private val theilSenOracle =
    s"""WITH days AS (
       |  SELECT date_diff('day', DATE '1995-01-01',
       |                   CAST(o_orderdate AS DATE)) AS t,
       |         sum($binExprDuck) AS r
       |  FROM orders GROUP BY 1),
       |pairs AS (
       |  SELECT CAST(b.r - a.r AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope,
       |         a.t AS t1, b.t AS t2
       |  FROM days a JOIN days b ON a.t < b.t),
       |np AS (SELECT count(*) AS np FROM pairs),
       |med AS (
       |  SELECT slope FROM (
       |    SELECT slope, row_number() OVER (ORDER BY slope, t1, t2) AS rn
       |    FROM pairs) s CROSS JOIN np
       |  WHERE rn = (np + 1) // 2),
       |nd AS (SELECT count(*) AS nd FROM days),
       |inter AS (
       |  SELECT ic, slope FROM (
       |    SELECT CAST(d.r AS DOUBLE) - m.slope * CAST(d.t AS DOUBLE) AS ic,
       |           m.slope,
       |           row_number() OVER (
       |             ORDER BY CAST(d.r AS DOUBLE) - m.slope * CAST(d.t AS DOUBLE),
       |                      d.t) AS rn
       |    FROM days d CROSS JOIN med m) s CROSS JOIN nd
       |  WHERE rn = (nd + 1) // 2)
       |SELECT (SELECT CAST(nd AS BIGINT) FROM nd) AS n_days,
       |       (SELECT CAST(np AS BIGINT) FROM np) AS n_pairs,
       |       slope, ic AS intercept
       |FROM inter""".stripMargin

  // ---- Fleiss' kappa -------------------------------------------------

  /** Per-(item, rater) synthetic label: base category from the order
    * status, flipped to an md5-coin category with p = 1/5 — three
    * raters whose planted agreement Fleiss' κ must recover. The hex
    * decode differs per engine (conv vs strpos polynomial); everything
    * downstream is the same integer arithmetic. */
  private def fleissLabel(r: Int, hex4: String, intDiv: String): String = {
    val base = "CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END"
    s"CASE WHEN ($hex4) % 5 = 0 THEN (($hex4) $intDiv 5) % 3 ELSE $base END"
  }

  private def fleissCore(lab: Int => String): Seq[String] = {
    val njs = (0 to 2).map { j =>
      s"(CASE WHEN ${lab(0)} = $j THEN 1 ELSE 0 END" +
        s" + CASE WHEN ${lab(1)} = $j THEN 1 ELSE 0 END" +
        s" + CASE WHEN ${lab(2)} = $j THEN 1 ELSE 0 END)"
    }
    njs
  }

  /** Fleiss' kappa [N] — chance-corrected agreement for n=3 raters
    * over k=3 categories (the multi-rater generalization of
    * `stats_cohens_kappa`, the metric label-quality audits over LLM/
    * human annotator pools report). EXACT end to end: per-item
    * agreement 6·P_i = Σ_j n_ij(n_ij−1) is integer, margins are
    * integer sums, and P̄/P_e/κ assemble in one mirrored IEEE
    * expression each — the only doubles are the final three. One
    * conditional hash agg over one scan. */
  private def fleissKappa(s: SparkSession, d: String): DataFrame = {
    def hex4(r: Int) =
      s"graft_hex_long(md5(concat(cast(o_orderkey as string), '#$r', ':fk')), 1, 4)"
    val njs = fleissCore(r => fleissLabel(r, hex4(r), "div"))
    val p6 = njs.map(nj => s"$nj * ($nj - 1)").mkString(" + ")
    Tables.orders(s, d)
      .selectExpr(s"$p6 as p6" +: njs.zipWithIndex.map {
        case (nj, j) => s"$nj as n$j" }: _*)
      .agg(count(lit(1)).as("n_items"), sum(col("p6")).as("s6"),
        sum(col("n0")).as("t0"), sum(col("n1")).as("t1"),
        sum(col("n2")).as("t2"))
      .selectExpr("cast(n_items as bigint) as n_items",
        "cast(s6 as double) / (6.0 * cast(n_items as double)) as p_bar",
        "cast(t0 as double) / (3.0 * cast(n_items as double)) as p0",
        "cast(t1 as double) / (3.0 * cast(n_items as double)) as p1",
        "cast(t2 as double) / (3.0 * cast(n_items as double)) as p2")
      .selectExpr("n_items", "p_bar",
        "p0 * p0 + p1 * p1 + p2 * p2 as p_e")
      .selectExpr("n_items", "p_bar", "p_e",
        "(p_bar - p_e) / (1.0 - p_e) as kappa")
  }

  private def fleissOracle: String = {
    def hex4(r: Int) = (0 until 4).map { i =>
      val f = 1L << (4 * (3 - i))
      s"(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)" +
        s" || '#$r' || ':fk'), ${i + 1}, 1)) - 1) * $f"
    }.mkString("(", " + ", ")")
    val njs = fleissCore(r => fleissLabel(r, hex4(r), "//"))
    val p6 = njs.map(nj => s"$nj * ($nj - 1)").mkString(" + ")
    val njSel = njs.zipWithIndex
      .map { case (nj, j) => s"$nj AS n$j" }.mkString(",\n|         ")
    s"""WITH rows0 AS (
       |  SELECT $p6 AS p6,
       |         $njSel
       |  FROM orders),
       |a AS (
       |  SELECT count(*) AS n_items, sum(p6) AS s6,
       |         sum(n0) AS t0, sum(n1) AS t1, sum(n2) AS t2
       |  FROM rows0),
       |v AS (
       |  SELECT CAST(n_items AS BIGINT) AS n_items,
       |         CAST(s6 AS DOUBLE) / (6.0 * CAST(n_items AS DOUBLE)) AS p_bar,
       |         CAST(t0 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)) AS p0,
       |         CAST(t1 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)) AS p1,
       |         CAST(t2 AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)) AS p2
       |  FROM a),
       |e AS (
       |  SELECT n_items, p_bar, p0 * p0 + p1 * p1 + p2 * p2 AS p_e FROM v)
       |SELECT n_items, p_bar, p_e,
       |       (p_bar - p_e) / (1.0 - p_e) AS kappa
       |FROM e""".stripMargin
  }

  // ---- TOST equivalence ----------------------------------------------

  /** TOST equivalence test [N] (Schuirmann's two one-sided tests — the
    * A/B question stats_welch_ttest cannot answer: "are these two arms
    * the SAME to within δ?"). Mean $1000 order-value bins, fulfilled vs
    * open; margin δ = 5 bins; Welch SE from exact power sums; both
    * one-sided t statistics against the pinned large-df critical value
    * 1.645. Everything is doubles assembled once from exact integers —
    * identical IEEE on both engines, so even the boolean decision
    * agrees exactly. */
  private def tost(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(expr("case when o_orderstatus = 'F' then 1 else 0 end").as("g"),
        expr(binExprSpark).as("v"))
    base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("q"))
      .agg(
        max(when(col("g") === 1, col("n"))).as("n1"),
        max(when(col("g") === 1, col("s"))).as("s1"),
        max(when(col("g") === 1, col("q"))).as("q1"),
        max(when(col("g") === 0, col("n"))).as("n0"),
        max(when(col("g") === 0, col("s"))).as("s0"),
        max(when(col("g") === 0, col("q"))).as("q0"))
      .selectExpr(
        "cast(n1 as double) as n1d", "cast(s1 as double) as s1d",
        "cast(q1 as double) as q1d", "cast(n0 as double) as n0d",
        "cast(s0 as double) as s0d", "cast(q0 as double) as q0d")
      .selectExpr(
        "s1d / n1d - s0d / n0d as diff",
        "sqrt(((q1d - s1d * s1d / n1d) / (n1d - 1.0)) / n1d" +
          " + ((q0d - s0d * s0d / n0d) / (n0d - 1.0)) / n0d) as se")
      .selectExpr("diff", "se",
        "(diff + 5.0) / se as t_lower",
        "(5.0 - diff) / se as t_upper")
      .selectExpr("diff", "se", "t_lower", "t_upper",
        "t_lower > 1.645 and t_upper > 1.645 as equivalent")
  }

  private val tostOracle =
    s"""WITH base AS (
       |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g,
       |         $binExprDuck AS v
       |  FROM orders),
       |a AS (
       |  SELECT g, count(*) AS n, sum(v) AS s,
       |         sum(CAST(v AS HUGEINT) * v) AS q
       |  FROM base GROUP BY g),
       |w AS (
       |  SELECT max(CASE WHEN g = 1 THEN CAST(n AS DOUBLE) END) AS n1d,
       |         max(CASE WHEN g = 1 THEN CAST(s AS DOUBLE) END) AS s1d,
       |         max(CASE WHEN g = 1 THEN CAST(q AS DOUBLE) END) AS q1d,
       |         max(CASE WHEN g = 0 THEN CAST(n AS DOUBLE) END) AS n0d,
       |         max(CASE WHEN g = 0 THEN CAST(s AS DOUBLE) END) AS s0d,
       |         max(CASE WHEN g = 0 THEN CAST(q AS DOUBLE) END) AS q0d
       |  FROM a),
       |c AS (
       |  SELECT s1d / n1d - s0d / n0d AS diff,
       |         sqrt(((q1d - s1d * s1d / n1d) / (n1d - 1.0)) / n1d
       |           + ((q0d - s0d * s0d / n0d) / (n0d - 1.0)) / n0d) AS se
       |  FROM w),
       |t AS (
       |  SELECT diff, se, (diff + 5.0) / se AS t_lower,
       |         (5.0 - diff) / se AS t_upper
       |  FROM c)
       |SELECT diff, se, t_lower, t_upper,
       |       t_lower > 1.645 AND t_upper > 1.645 AS equivalent
       |FROM t""".stripMargin

  // ---- multinomial naive Bayes ---------------------------------------

  /** Multinomial naive Bayes over `documents`: train on even doc_ids
    * (tokens -> language), classify the odd ones. The whole model is
    * counting — class priors, per-(class, token) counts, per-class token
    * totals, vocabulary size — so training is two hash aggregations; the
    * classifier is Σ ln((cnt+1)/(T_c+V)) + ln(n_c/N) with add-one
    * smoothing, each ln pinned at 6dp BEFORE the sum (the `text_logprob`
    * discipline: identical addends on both engines despite libm
    * differences) and accumulated as decimal(18,6) (exact,
    * order-invariant). argmax per doc is a rank-1 window ordered by
    * (score DESC, class ASC) — a total order, so ties cannot flip
    * between engines.
    *
    * 100 TB shape: the model relations are vocabulary-bounded (real
    * pipelines cap V at the tokenizer vocab), so they broadcast; scoring
    * is explode -> broadcast joins -> ONE hash exchange on (doc, class).
    * The only corpus-scale shuffle is the training count itself. */
  private def naiveBayes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val trainToks = train.select(col("lang").as("c"), explode(col("ws")).as("w"))
    val cnt = trainToks.groupBy(col("c"), col("w")).agg(count(lit(1)).as("cnt"))
    val tTot = trainToks.groupBy(col("c")).agg(count(lit(1)).as("t_c"))
    val vocab = trainToks.select(col("w")).distinct()
      .agg(count(lit(1)).as("v"))
    val nDocs = train.agg(count(lit(1)).as("n_all"))
    val priors = train.groupBy(col("lang").as("c"))
      .agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(nDocs))
      .select(col("c"),
        bround(log(col("n_c").cast("double") / col("n_all").cast("double")), 6)
          .cast("decimal(18,6)").as("prior_lp"))
    val classDim = tTot.crossJoin(broadcast(vocab))
    val scored = test.select(col("doc_id"), explode(col("ws")).as("w"))
      .crossJoin(broadcast(classDim))
      .join(broadcast(cnt), Seq("c", "w"), "left")
      .withColumn("lp", bround(log(
        (coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("t_c") + col("v")).cast("double")), 6).cast("decimal(18,6)"))
      .groupBy(col("doc_id"), col("c"))
      .agg(sum(col("lp")).cast("decimal(18,6)").as("tok_lp"))
      .join(broadcast(priors), "c")
      .withColumn("score",
        (col("prior_lp") + col("tok_lp")).cast("decimal(18,6)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("c").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .join(test.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("c").as("pred_lang"), col("lang"),
        (col("c") === col("lang")).as("correct"),
        col("score").cast("double").as("score"))
      .orderBy("doc_id")
  }

  private val naiveBayesOracle =
    """WITH docs AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      |train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
      |test AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
      |ttoks AS (SELECT lang AS c, unnest(ws) AS w FROM train),
      |cnt AS (SELECT c, w, count(*) AS cnt FROM ttoks GROUP BY c, w),
      |ttot AS (SELECT c, count(*) AS t_c FROM ttoks GROUP BY c),
      |vocab AS (SELECT count(DISTINCT w) AS v FROM ttoks),
      |ndocs AS (SELECT count(*) AS n_all FROM train),
      |priors AS (
      |  SELECT lang AS c,
      |         CAST(round_even(ln(CAST(count(*) AS DOUBLE) /
      |           (SELECT CAST(n_all AS DOUBLE) FROM ndocs)), 6)
      |           AS DECIMAL(18,6)) AS prior_lp
      |  FROM train GROUP BY lang),
      |stoks AS (SELECT doc_id, unnest(ws) AS w FROM test),
      |terms AS (
      |  SELECT s.doc_id, cd.c,
      |         CAST(round_even(ln(
      |           CAST(COALESCE(cnt.cnt, 0) + 1 AS DOUBLE) /
      |           CAST(cd.t_c + cd.v AS DOUBLE)), 6)
      |           AS DECIMAL(18,6)) AS lp
      |  FROM stoks s
      |  CROSS JOIN (SELECT c, t_c, v FROM ttot, vocab) cd
      |  LEFT JOIN cnt ON cnt.c = cd.c AND cnt.w = s.w),
      |scored AS (
      |  SELECT t.doc_id, t.c,
      |         CAST(p.prior_lp + CAST(sum(t.lp) AS DECIMAL(18,6))
      |           AS DECIMAL(18,6)) AS score
      |  FROM terms t JOIN priors p ON p.c = t.c
      |  GROUP BY t.doc_id, t.c, p.prior_lp),
      |ranked AS (
      |  SELECT doc_id, c, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, c ASC) AS rk
      |  FROM scored)
      |SELECT r.doc_id, r.c AS pred_lang, te.lang,
      |       r.c = te.lang AS correct, CAST(r.score AS DOUBLE) AS score
      |FROM ranked r JOIN test te ON te.doc_id = r.doc_id
      |WHERE r.rk = 1
      |ORDER BY r.doc_id""".stripMargin

  // ---- decision stump (CART depth-1) ---------------------------------

  /** Depth-1 CART: the Gini-optimal binary split of the $1000
    * order-value bin predicting fulfillment (o_orderstatus = 'F') —
    * the base learner of every tree ensemble, trained entirely in SQL.
    * For each candidate threshold t (left: bin ≤ t), weighted Gini
    * impurity is the RATIONAL
    *   G(t) = [nL²·nR + nL·nR² − nR·(pL²+qL²) − nL·(pR²+qR²)] / (nL·nR)
    * with all counts from ONE cumulative window over the bounded bin
    * domain (~600 bins — candidate generation never touches row
    * scale), normalized by n into the usual [0, 0.5] weighted form.
    * Numerator/denominator are exact decimal(38,0); each
    * converts to double once (exact below 2⁵³, i.e. any SF ≤ ~10⁴ —
    * no rounding at all), so the quotient is the SAME IEEE double on
    * both engines and argmin by (gini ASC, t ASC) is a total order
    * that cannot flip. Leaf predictions are exact majority votes
    * (2·pos ≥ n). */
  private def treeStump(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.orders(s, d)
      .select(expr(binExprSpark).as("t"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("nb"), sum(col("pos")).as("pb"))
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = bins.agg(sum(col("nb")).as("n_all"), sum(col("pb")).as("p_all"))
    val cand = bins
      .withColumn("n_l", sum(col("nb")).over(wc))
      .withColumn("p_l", sum(col("pb")).over(wc))
      .crossJoin(broadcast(tot))
      .filter(col("n_l") < col("n_all"))
      .selectExpr("t", "n_l", "p_l", "n_l - p_l as q_l",
        "n_all - n_l as n_r", "p_all - p_l as p_r",
        "(n_all - n_l) - (p_all - p_l) as q_r")
      .selectExpr("t", "n_l", "n_r", "p_l", "p_r",
        "cast(cast(n_l as decimal(38,0)) * n_l * n_r" +
          " + cast(n_l as decimal(38,0)) * n_r * n_r" +
          " - cast(n_r as decimal(38,0)) * (p_l * p_l + q_l * q_l)" +
          " - cast(n_l as decimal(38,0)) * (p_r * p_r + q_r * q_r)" +
          " as decimal(38,0)) as num",
        "cast(cast(n_l as decimal(38,0)) * n_r * (n_l + n_r)" +
          " as decimal(38,0)) as den")
      .withColumn("gini",
        col("num").cast("double") / col("den").cast("double"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("gini").asc, col("t").asc)
    cand.withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
      .selectExpr("t as split_bin", "n_l", "n_r", "p_l", "p_r", "gini",
        "2 * p_l >= n_l as pred_left", "2 * p_r >= n_r as pred_right")
  }

  private val treeStumpOracle =
    s"""WITH bins AS (
       |  SELECT $binExprDuck AS t, count(*) AS nb,
       |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pb
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT sum(nb) AS n_all, sum(pb) AS p_all FROM bins),
       |cum AS (
       |  SELECT t,
       |         sum(nb) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS n_l,
       |         sum(pb) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS p_l
       |  FROM bins),
       |cand AS (
       |  SELECT t, n_l, p_l, n_l - p_l AS q_l,
       |         tot.n_all - n_l AS n_r, tot.p_all - p_l AS p_r,
       |         (tot.n_all - n_l) - (tot.p_all - p_l) AS q_r
       |  FROM cum, tot WHERE n_l < tot.n_all),
       |scored AS (
       |  SELECT t, n_l, n_r, p_l, p_r,
       |         CAST(CAST(n_l AS DECIMAL(38,0)) * n_l * n_r
       |              + CAST(n_l AS DECIMAL(38,0)) * n_r * n_r
       |              - CAST(n_r AS DECIMAL(38,0)) * (p_l * p_l + q_l * q_l)
       |              - CAST(n_l AS DECIMAL(38,0)) * (p_r * p_r + q_r * q_r)
       |           AS DECIMAL(38,0)) AS num,
       |         CAST(CAST(n_l AS DECIMAL(38,0)) * n_r * (n_l + n_r)
       |           AS DECIMAL(38,0)) AS den
       |  FROM cand),
       |ranked AS (
       |  SELECT t, n_l, n_r, p_l, p_r,
       |         CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS gini,
       |         row_number() OVER (
       |           ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) ASC,
       |                    t ASC) AS rk
       |  FROM scored)
       |SELECT t AS split_bin, CAST(n_l AS BIGINT) AS n_l,
       |       CAST(n_r AS BIGINT) AS n_r, CAST(p_l AS BIGINT) AS p_l,
       |       CAST(p_r AS BIGINT) AS p_r, gini,
       |       2 * p_l >= n_l AS pred_left, 2 * p_r >= n_r AS pred_right
       |FROM ranked WHERE rk = 1""".stripMargin

  // ---- logistic regression (pinned gradient descent) ------------------

  private val lgdIters = 3
  private val lgdLr = "0.5"

  /** Logistic regression by batch gradient descent — the iterative
    * FLOAT trainer the perceptron (integer) and ridge (closed-form)
    * rows don't cover, made cross-engine exact with the pinning
    * discipline: the sigmoid is evaluated per $1000 BIN (the bounded
    * feature domain, never per row), pinned at 6dp before entering any
    * sum; residual sums n_b·σ₆ − p_b and their (b−250)-weighted twins
    * are exact decimals; each weight update re-pins at 12dp, so all
    * three iterations run on identical numbers in both engines. The
    * feature standardizes as x = (bin−250)/100 (exact-int inputs,
    * identically rounded IEEE division). Log-loss before/after is the
    * convergence witness (StatsLearnSpec-style assert lives in
    * Round8Spec); σ stays in (0,1) at these weights so ln never sees 0.
    *
    * 100 TB shape: ONE corpus-scale hash agg into the ~600-bin domain,
    * then 3 rounds of domain-sized crossJoin(1-row weights) — the
    * allreduce-gradient shape with the reduce done by the engine. */
  private def logisticGd(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val bins = Tables.orders(s, d)
      .select(expr(binExprSpark).as("b"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("pb"))
      .withColumn("x", (col("b") - 250).cast("double") / 100.0)
      .localCheckpoint()
    val tot = bins.agg(sum(col("nb")).cast("double").as("nd"))
    val sigExpr = "cast(bround(1 / (1 + exp(-(cast(w0 as double)" +
      " + cast(w1 as double) * x))), 6) as decimal(18,6))"
    val wInit = s.sql(
      "select cast(0 as decimal(28,12)) as w0, cast(0 as decimal(28,12)) as w1")
    def logloss(wf: DataFrame, alias: String): DataFrame =
      bins.crossJoin(broadcast(wf))
        .selectExpr("pb", "nb", s"$sigExpr as sig")
        .selectExpr(
          "cast(pb * cast(bround(ln(cast(sig as double)), 6) as decimal(18,6))" +
            " + (nb - pb) * cast(bround(ln(1 - cast(sig as double)), 6)" +
            " as decimal(18,6)) as decimal(38,6)) as t")
        .agg(sum(col("t")).cast("decimal(38,6)").as(alias))
    var w = wInit
    for (_ <- 1 to lgdIters) {
      w = bins.crossJoin(broadcast(w)).crossJoin(broadcast(tot))
        .selectExpr("b", "nb", "pb", "w0", "w1", "nd", s"$sigExpr as sig")
        .selectExpr("w0", "w1", "nd",
          "cast(nb * sig - pb as decimal(38,6)) as resid",
          "cast((b - 250) * (nb * sig - pb) as decimal(38,6)) as resid_x")
        .groupBy(col("w0"), col("w1"), col("nd"))
        .agg(sum(col("resid")).cast("decimal(38,6)").as("g0"),
          sum(col("resid_x")).cast("decimal(38,6)").as("g1"))
        .selectExpr(
          s"cast(bround(cast(w0 as double) - $lgdLr * (cast(g0 as double) / nd)," +
            " 12) as decimal(28,12)) as w0",
          s"cast(bround(cast(w1 as double) - $lgdLr * (cast(g1 as double)" +
            " / 100.0 / nd), 12) as decimal(28,12)) as w1")
        .localCheckpoint()
    }
    w.selectExpr("cast(w0 as double) as w0", "cast(w1 as double) as w1")
      .crossJoin(broadcast(
        logloss(wInit, "l0").selectExpr("cast(l0 as double) as ll_init")))
      .crossJoin(broadcast(
        logloss(w, "lf").selectExpr("cast(lf as double) as ll_final")))
  }

  private def logisticGdOracle: String = {
    val sig = "CAST(round_even(1/(1+exp(-(CAST(w.w0 AS DOUBLE)" +
      " + CAST(w.w1 AS DOUBLE) * b.x))), 6) AS DECIMAL(18,6))"
    def it(k: Int) =
      s"""it$k AS (
         |  SELECT CAST(round_even(CAST(w.w0 AS DOUBLE) - $lgdLr *
         |           (CAST(sum(b.nb * $sig - b.pb) AS DOUBLE) / t.nd), 12)
         |           AS DECIMAL(28,12)) AS w0,
         |         CAST(round_even(CAST(w.w1 AS DOUBLE) - $lgdLr *
         |           (CAST(sum((b.b - 250) * (b.nb * $sig - b.pb)) AS DOUBLE)
         |            / 100.0 / t.nd), 12) AS DECIMAL(28,12)) AS w1
         |  FROM bins b CROSS JOIN it${k - 1} w CROSS JOIN tot t
         |  GROUP BY w.w0, w.w1, t.nd)""".stripMargin
    def ll(k: Int) =
      s"""ll$k AS (
         |  SELECT CAST(sum(b.pb * CAST(round_even(ln(CAST($sig AS DOUBLE)), 6)
         |           AS DECIMAL(18,6))
         |         + (b.nb - b.pb) * CAST(round_even(ln(1 - CAST($sig
         |           AS DOUBLE)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS ll
         |  FROM bins b CROSS JOIN it$k w)""".stripMargin
    val iters = (1 to lgdIters).map(it).mkString(",\n")
    s"""WITH binsraw AS (
       |  SELECT $binExprDuck AS b, count(*) AS nb,
       |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pb
       |  FROM orders GROUP BY 1),
       |bins AS (SELECT b, nb, pb, CAST(b - 250 AS DOUBLE) / 100.0 AS x
       |         FROM binsraw),
       |tot AS (SELECT CAST(sum(nb) AS DOUBLE) AS nd FROM bins),
       |it0 AS (SELECT CAST(0 AS DECIMAL(28,12)) AS w0,
       |               CAST(0 AS DECIMAL(28,12)) AS w1),
       |$iters,
       |${ll(0)},
       |${ll(lgdIters)}
       |SELECT CAST(f.w0 AS DOUBLE) AS w0, CAST(f.w1 AS DOUBLE) AS w1,
       |       l0.ll AS ll_init, lf.ll AS ll_final
       |FROM it$lgdIters f, ll0 l0, ll$lgdIters lf""".stripMargin
  }

  // ---- EM for a 2-component Gaussian mixture --------------------------

  private val emIters = 3

  /** 2-component Gaussian-mixture EM over the standardized $1000 bin —
    * the UNSUPERVISED trainer completing the stats-learn family
    * (perceptron: integer online; ridge: closed form; logistic: pinned
    * GD; stump: exact rational; this: pinned fixpoint with latent
    * variables). Pinning discipline per E-step: densities φ_c pin at
    * 9dp (values < 1, so their decimal→double casts are EXACT);
    * responsibilities r are ONE double ratio of those pinned values,
    * re-pinned at 9dp; the variance products r·(x−μ)² re-pin at 9dp
    * BEFORE multiplying by counts so every M-step sum keeps scale 9 and
    * stays under 2⁵³ unscaled (a scale-18 product would round in the
    * decimal→double cast, where DuckDB and the JVM can differ a ULP).
    * M-step parameters re-pin at 12dp. Variances floor at 0.01
    * (collapse guard, both engines).
    *
    * 100 TB shape: ONE corpus-scale hash agg into the ~600-bin domain;
    * each EM round is a domain-sized crossJoin(1-row params) + one
    * 5-sum aggregate — the classic distributed-EM allreduce. */
  private def gmmEm(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.orders(s, d)
      .select(expr(binExprSpark).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("nb"))
      // the width-controlled decimal(14,0)*(18,9)*(4,0) products below
      // peak at exactly (38,9) ONLY while nb < 10^14 and |b-250| < 10^4
      // — beyond them Spark's non-ANSI cast silently NULLs and the sum
      // drifts (the jk9 lesson: assert the bound, don't comment it).
      // assert_true is NULL when the bound holds, raises otherwise —
      // the filter keeps every row on the happy path and fails LOUDLY
      // on a corpus that outgrows the grid. DuckDB's oracle needs no
      // twin: its decimal cast overflow errors loudly by default.
      .filter(expr(
        "assert_true(nb < 100000000000000 AND b - 250 BETWEEN -9999 AND 9999, " +
          "'gmm grid bound exceeded: decimal(14,0)/(4,0) operands') IS NULL"))
      .withColumn("x", (col("b") - 250).cast("double") / 100.0)
      .localCheckpoint()
    val tot = bins.agg(sum(col("nb")).cast("double").as("nd"))
    def dens(mu: String, v: String) =
      s"cast(bround(exp(-((x - cast($mu as double)) * (x - cast($mu as double)))" +
        s" / (2 * cast($v as double))) / sqrt(cast($v as double)), 9)" +
        " as decimal(18,9))"
    var w = s.sql(
      "select cast(0.5 as decimal(28,12)) as p1," +
        " cast(-1 as decimal(28,12)) as mu1, cast(1 as decimal(28,12)) as mu2," +
        " cast(1 as decimal(28,12)) as v1, cast(1 as decimal(28,12)) as v2")
    for (_ <- 1 to emIters) {
      w = bins.crossJoin(broadcast(w))
        .selectExpr("b", "nb", "x",
          "cast(p1 as double) as p1d",
          s"cast(${dens("mu1", "v1")} as double) as f1d",
          s"cast(${dens("mu2", "v2")} as double) as f2d",
          "cast(bround((x - cast(mu1 as double)) * (x - cast(mu1 as double)), 9)" +
            " as decimal(18,9)) as t1",
          "cast(bround((x - cast(mu2 as double)) * (x - cast(mu2 as double)), 9)" +
            " as decimal(18,9)) as t2")
        .selectExpr("b", "nb", "t1", "t2",
          "cast(bround((p1d * f1d) / (p1d * f1d + (1 - p1d) * f2d), 9)" +
            " as decimal(18,9)) as r")
        .selectExpr("b", "nb", "r",
          "cast(1 - r as decimal(18,9)) as r2",
          "cast(bround(cast(r as double) * cast(t1 as double), 9)" +
            " as decimal(18,9)) as rt1",
          "cast(bround((1 - cast(r as double)) * cast(t2 as double), 9)" +
            " as decimal(18,9)) as rt2")
        .crossJoin(broadcast(tot))
        .groupBy(col("nd"))
        // width-controlled operands: a bare long * decimal(18,9) * int chain
        // exceeds precision 38 and Spark silently CUTS THE SCALE of the
        // product (allowPrecisionLoss) while DuckDB would flip to DOUBLE —
        // both en route to 1e-10 drift. decimal(14,0) * (18,9) * (4,0)
        // peaks at exactly (38,9): every product stays exact.
        .agg(
          sum(expr("cast(nb as decimal(14,0)) * r"))
            .cast("decimal(28,9)").as("w1"),
          sum(expr("cast(nb as decimal(14,0)) * r2"))
            .cast("decimal(28,9)").as("w2"),
          sum(expr("cast(nb as decimal(14,0)) * r * cast(b - 250 as decimal(4,0))"))
            .cast("decimal(28,9)").as("wx1"),
          sum(expr("cast(nb as decimal(14,0)) * r2 * cast(b - 250 as decimal(4,0))"))
            .cast("decimal(28,9)").as("wx2"),
          sum(expr("cast(nb as decimal(14,0)) * rt1"))
            .cast("decimal(28,9)").as("s1"),
          sum(expr("cast(nb as decimal(14,0)) * rt2"))
            .cast("decimal(28,9)").as("s2"))
        .selectExpr(
          "cast(bround(cast(w1 as double) / nd, 12) as decimal(28,12)) as p1",
          "cast(bround(cast(wx1 as double) / 100.0 / cast(w1 as double), 12)" +
            " as decimal(28,12)) as mu1",
          "cast(bround(cast(wx2 as double) / 100.0 / cast(w2 as double), 12)" +
            " as decimal(28,12)) as mu2",
          "cast(bround(greatest(cast(s1 as double) / cast(w1 as double), 0.01)," +
            " 12) as decimal(28,12)) as v1",
          "cast(bround(greatest(cast(s2 as double) / cast(w2 as double), 0.01)," +
            " 12) as decimal(28,12)) as v2")
        .localCheckpoint()
    }
    w.selectExpr("cast(p1 as double) as p1", "cast(mu1 as double) as mu1",
      "cast(mu2 as double) as mu2", "cast(v1 as double) as v1",
      "cast(v2 as double) as v2")
  }

  private def gmmEmOracle: String = {
    def dens(mu: String, v: String) =
      s"CAST(round_even(exp(-((x - CAST($mu AS DOUBLE)) * (x - CAST($mu AS DOUBLE)))" +
        s" / (2 * CAST($v AS DOUBLE))) / sqrt(CAST($v AS DOUBLE)), 9)" +
        " AS DECIMAL(18,9))"
    def it(k: Int) =
      s"""it$k AS (
         |  SELECT CAST(round_even(CAST(w1 AS DOUBLE) / nd, 12)
         |           AS DECIMAL(28,12)) AS p1,
         |         CAST(round_even(CAST(wx1 AS DOUBLE) / 100.0
         |           / CAST(w1 AS DOUBLE), 12) AS DECIMAL(28,12)) AS mu1,
         |         CAST(round_even(CAST(wx2 AS DOUBLE) / 100.0
         |           / CAST(w2 AS DOUBLE), 12) AS DECIMAL(28,12)) AS mu2,
         |         CAST(round_even(greatest(CAST(s1 AS DOUBLE)
         |           / CAST(w1 AS DOUBLE), 0.01), 12) AS DECIMAL(28,12)) AS v1,
         |         CAST(round_even(greatest(CAST(s2 AS DOUBLE)
         |           / CAST(w2 AS DOUBLE), 0.01), 12) AS DECIMAL(28,12)) AS v2
         |  FROM (
         |    SELECT t.nd,
         |           sum(CAST(nb AS DECIMAL(14,0)) * r) AS w1,
         |           sum(CAST(nb AS DECIMAL(14,0)) * r2) AS w2,
         |           sum(CAST(nb AS DECIMAL(14,0)) * r
         |               * CAST(b - 250 AS DECIMAL(4,0))) AS wx1,
         |           sum(CAST(nb AS DECIMAL(14,0)) * r2
         |               * CAST(b - 250 AS DECIMAL(4,0))) AS wx2,
         |           sum(CAST(nb AS DECIMAL(14,0)) * rt1) AS s1,
         |           sum(CAST(nb AS DECIMAL(14,0)) * rt2) AS s2
         |    FROM (
         |      SELECT b, nb, r, CAST(1 - r AS DECIMAL(18,9)) AS r2,
         |             CAST(round_even(CAST(r AS DOUBLE) * CAST(t1 AS DOUBLE), 9)
         |               AS DECIMAL(18,9)) AS rt1,
         |             CAST(round_even((1 - CAST(r AS DOUBLE))
         |               * CAST(t2 AS DOUBLE), 9) AS DECIMAL(18,9)) AS rt2
         |      FROM (
         |        SELECT b, nb, t1, t2,
         |               CAST(round_even((p1d * f1d)
         |                 / (p1d * f1d + (1 - p1d) * f2d), 9)
         |                 AS DECIMAL(18,9)) AS r
         |        FROM (
         |          SELECT b.b, b.nb, b.x, CAST(w.p1 AS DOUBLE) AS p1d,
         |                 CAST(${dens("w.mu1", "w.v1")} AS DOUBLE) AS f1d,
         |                 CAST(${dens("w.mu2", "w.v2")} AS DOUBLE) AS f2d,
         |                 CAST(round_even((x - CAST(w.mu1 AS DOUBLE))
         |                   * (x - CAST(w.mu1 AS DOUBLE)), 9)
         |                   AS DECIMAL(18,9)) AS t1,
         |                 CAST(round_even((x - CAST(w.mu2 AS DOUBLE))
         |                   * (x - CAST(w.mu2 AS DOUBLE)), 9)
         |                   AS DECIMAL(18,9)) AS t2
         |          FROM bins b CROSS JOIN it${k - 1} w) s1) s2) s3
         |    CROSS JOIN tot t GROUP BY t.nd) agg$k)""".stripMargin
    val iters = (1 to emIters).map(it).mkString(",\n")
    s"""WITH binsraw AS (
       |  SELECT $binExprDuck AS b, count(*) AS nb FROM orders GROUP BY 1),
       |bins AS (SELECT b, nb, CAST(b - 250 AS DOUBLE) / 100.0 AS x
       |         FROM binsraw),
       |tot AS (SELECT CAST(sum(nb) AS DOUBLE) AS nd FROM bins),
       |it0 AS (SELECT CAST(0.5 AS DECIMAL(28,12)) AS p1,
       |               CAST(-1 AS DECIMAL(28,12)) AS mu1,
       |               CAST(1 AS DECIMAL(28,12)) AS mu2,
       |               CAST(1 AS DECIMAL(28,12)) AS v1,
       |               CAST(1 AS DECIMAL(28,12)) AS v2),
       |$iters
       |SELECT CAST(p1 AS DOUBLE) AS p1, CAST(mu1 AS DOUBLE) AS mu1,
       |       CAST(mu2 AS DOUBLE) AS mu2, CAST(v1 AS DOUBLE) AS v1,
       |       CAST(v2 AS DOUBLE) AS v2
       |FROM it$emIters""".stripMargin
  }

  /** Krippendorff's alpha [N] (nominal, with MISSING ratings — the
    * generalization `stats_fleiss_kappa` can't do): the same 3
    * md5-derived annotators, but each rater skips ~1/7 of items
    * (hex % 7 = 0 → missing). Per unit with m ≥ 2 ratings, the
    * disagreement contribution dis/(m−1) has denominator 1 or 2 only,
    * so DOUBLED it is an exact integer (2·(m² − Σcount_c²) div (m−1));
    * expected disagreement comes from the marginals (n² − Σn_c²).
    * α = 1 − (n−1)·Do2 / (2·(n² − Σn_c²)) — one mirrored division of
    * exact BIGINTs. ONE data-scale projection + one hash agg. */
  private def krippendorff(s: SparkSession, d: String): DataFrame = {
    def hex4(r: Int) =
      s"graft_hex_long(md5(concat(cast(o_orderkey as string), " +
        s"'#$r', ':ka')), 1, 4)"
    def lab(r: Int) = {
      val h = hex4(r)
      val base = "CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END"
      // missing when h % 7 = 0, else the fleiss-style noisy label
      s"CASE WHEN ($h) % 7 = 0 THEN NULL " +
        s"WHEN ($h) % 5 = 0 THEN (($h) div 5) % 3 ELSE $base END"
    }
    val labs = (0 to 2).map(lab)
    val cnt = (j: Int) => labs.map(l =>
      s"CASE WHEN ($l) = $j THEN 1 ELSE 0 END").mkString("(", " + ", ")")
    val cs = (0 to 2).map(cnt)
    val mU = labs.map(l => s"CASE WHEN ($l) IS NULL THEN 0 ELSE 1 END")
      .mkString("(", " + ", ")")
    val s2 = cs.map(c => s"$c * $c").mkString(" + ")
    Tables.orders(s, d)
      .selectExpr(Seq(s"$mU as mu", s"($mU) * ($mU) - ($s2) as dis") ++
        cs.zipWithIndex.map { case (c, j) => s"$c as c$j" }: _*)
      .filter(col("mu") >= 2)
      .agg(sum(col("mu")).as("n"),
        sum(expr("(2 * dis) div (mu - 1)")).as("do2"),
        sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"))
      .selectExpr("cast(n as bigint) as n", "cast(do2 as bigint) as do2",
        "cast(n0 as bigint) as n0", "cast(n1 as bigint) as n1",
        "cast(n2 as bigint) as n2",
        "1.0D - cast((n - 1) * do2 as double)" +
          " / (2.0D * cast(n * n - (n0 * n0 + n1 * n1 + n2 * n2)" +
          " as double)) as alpha")
  }

  private def krippendorffOracle: String = {
    def hex4(r: Int) = (0 until 4).map { i =>
      val f = 1L << (4 * (3 - i))
      s"(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)" +
        s" || '#$r' || ':ka'), ${i + 1}, 1)) - 1) * $f"
    }.mkString("(", " + ", ")")
    def lab(r: Int) = {
      val h = hex4(r)
      val base = "CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 ELSE 2 END"
      s"CASE WHEN ($h) % 7 = 0 THEN NULL " +
        s"WHEN ($h) % 5 = 0 THEN (($h) // 5) % 3 ELSE $base END"
    }
    val labs = (0 to 2).map(lab)
    val cnt = (j: Int) => labs.map(l =>
      s"CASE WHEN ($l) = $j THEN 1 ELSE 0 END").mkString("(", " + ", ")")
    val cs = (0 to 2).map(cnt)
    val mU = labs.map(l => s"CASE WHEN ($l) IS NULL THEN 0 ELSE 1 END")
      .mkString("(", " + ", ")")
    val s2 = cs.map(c => s"$c * $c").mkString(" + ")
    s"""WITH units AS (
       |  SELECT $mU AS mu, ($mU) * ($mU) - ($s2) AS dis,
       |         ${cs.zipWithIndex.map { case (c, j) => s"$c AS c$j" }
            .mkString(",\n|         ")}
       |  FROM orders),
       |agg AS (
       |  SELECT sum(mu) AS n, sum((2 * dis) // (mu - 1)) AS do2,
       |         sum(c0) AS n0, sum(c1) AS n1, sum(c2) AS n2
       |  FROM units WHERE mu >= 2)
       |SELECT CAST(n AS BIGINT) AS n, CAST(do2 AS BIGINT) AS do2,
       |       CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       |       CAST(n2 AS BIGINT) AS n2,
       |       1.0 - CAST((n - 1) * do2 AS DOUBLE)
       |         / (2.0 * CAST(n * n - (n0 * n0 + n1 * n1 + n2 * n2)
       |            AS DOUBLE)) AS alpha
       |FROM agg""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_krippendorff" -> krippendorff,
    "stats_naive_bayes" -> naiveBayes,
    "stats_tree_stump" -> treeStump,
    "stats_logistic_gd" -> logisticGd,
    "stats_gmm_em" -> gmmEm,
    "stats_tost" -> tost,
    "stats_fleiss_kappa" -> fleissKappa,
    "stats_anova" -> anova,
    "stats_ridge" -> ridge,
    "stats_perceptron" -> perceptron,
    "stats_jackknife" -> jackknife,
    "stats_theil_sen" -> theilSen)

  val oracles: Map[String, String] = Map(
    "stats_krippendorff" -> krippendorffOracle,
    "stats_naive_bayes" -> naiveBayesOracle,
    "stats_tree_stump" -> treeStumpOracle,
    "stats_logistic_gd" -> logisticGdOracle,
    "stats_gmm_em" -> gmmEmOracle,
    "stats_tost" -> tostOracle,
    "stats_fleiss_kappa" -> fleissOracle,
    "stats_anova" -> anovaOracle,
    "stats_ridge" -> ridgeOracle,
    "stats_perceptron" -> perceptronOracle,
    "stats_jackknife" -> jackknifeOracle,
    "stats_theil_sen" -> theilSenOracle)
}

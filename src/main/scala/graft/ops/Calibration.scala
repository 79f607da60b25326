package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Probability-calibration operators [N] on the shared
  * [[Synth.calibrationBins]] relation (the same 10 bins `eval_calibration`
  * and `eval_brier` report on): expected calibration error, and isotonic
  * regression (pool-adjacent-violators) — the standard recalibration fit
  * served next to a model scorecard.
  *
  * Scale shape: ONE data-scale hash agg builds the 10-bin relation;
  * everything after is bin-domain arithmetic. PAV runs as 9 unrolled
  * first-violator merge rounds over ≤10 pool rows — pool means are
  * compared by exact integer cross-multiplication (np_i·n_j vs np_j·n_i),
  * so the merge sequence is bit-identical on both engines and the only
  * floats anywhere are the final one-division fitted values. */
object Calibration extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")
  private val pavRounds = 9 // 10 bins → at most 9 merges; extra rounds no-op

  /** Isotonic (nondecreasing) fit of P(fulfilled) against the predicted-
    * probability bin: PAV, first-violator-per-round variant (the final
    * partition is PAV's unique solution; one merge per round keeps the
    * round deterministic without chain-merge ambiguity). */
  private def isotonic(s: SparkSession, d: String): DataFrame = {
    val bins = Synth.calibrationBins(s, d)
      .select(col("bin"), col("npos").as("np"), col("n"))
      .localCheckpoint() // 10 rows; feeds every round + the final map-back
    var pools = bins.select(col("bin").as("pool"), col("np"), col("n"))
    for (_ <- 1 to pavRounds) {
      val w = Window.orderBy(col("pool"))
      val flagged = pools
        .withColumn("nnp", lead(col("np"), 1).over(w))
        .withColumn("nn", lead(col("n"), 1).over(w))
      val viol = flagged
        .filter(col("nnp").isNotNull &&
          col("np") * col("nn") > col("nnp") * col("n"))
        .agg(min(col("pool")).as("vp"))
      pools = pools
        .withColumn("prev", lag(col("pool"), 1).over(Window.orderBy(col("pool"))))
        .crossJoin(broadcast(viol))
        .select(when(col("prev") === col("vp"), col("vp"))
          .otherwise(col("pool")).as("pool"), col("np"), col("n"))
        .groupBy("pool")
        .agg(sum("np").as("np"), sum("n").as("n"))
        .localCheckpoint() // ≤10 rows; cut the per-round lineage
    }
    bins.crossJoin(broadcast(pools.select(col("pool"),
        col("np").as("pnp"), col("n").as("pn"))))
      .filter(col("pool") <= col("bin"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("bin")).orderBy(col("pool").desc)))
      .filter(col("r") === 1)
      .select(col("bin"), col("pool"),
        (dd(col("pnp")) / dd(col("pn"))).as("iso"))
      .orderBy("bin")
  }

  private def isotonicOracle: String = {
    val steps = (1 to pavRounds).map { k =>
      s"""v$k AS (
         |  SELECT min(pool) AS vp FROM (
         |    SELECT pool, np, n,
         |           lead(np) OVER (ORDER BY pool) AS nnp,
         |           lead(n) OVER (ORDER BY pool) AS nn
         |    FROM p${k - 1})
         |  WHERE nnp IS NOT NULL AND np * nn > nnp * n),
         |p$k AS MATERIALIZED (
         |  SELECT pool, sum(np) AS np, sum(n) AS n FROM (
         |    SELECT CASE WHEN lag(pool) OVER (ORDER BY pool) = v$k.vp
         |                THEN v$k.vp ELSE pool END AS pool, np, n
         |    FROM p${k - 1}, v$k)
         |  GROUP BY pool)""".stripMargin
    }.mkString(",\n")
    s"""WITH bins AS MATERIALIZED (
       |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
       |               AS BIGINT), 59999999) // 6000000 AS bin,
       |         count(*) AS n,
       |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np
       |  FROM orders GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT bin AS pool, np, n FROM bins),
       |$steps
       |SELECT b.bin, p.pool,
       |       CAST(p.np AS DOUBLE) / CAST(p.n AS DOUBLE) AS iso
       |FROM bins b
       |JOIN LATERAL (SELECT pool, np, n FROM p$pavRounds
       |              WHERE pool <= b.bin
       |              ORDER BY pool DESC LIMIT 1) p ON true
       |ORDER BY b.bin""".stripMargin
  }

  /** Expected calibration error: Σ_b n_b·|acc_b − conf_b| / N. The
    * per-bin term is pinned at 8dp (term ≤ n_b ≈ 2e4 at sf0.1 — 8dp
    * sits far above the double ULP at that magnitude) so the 10-term
    * sum is an exact decimal in any order. */
  private def ece(s: SparkSession, d: String): DataFrame = {
    Synth.calibrationBins(s, d)
      .select(col("bin"), col("n"), col("npos"), col("sp"),
        (dd(col("n")) * abs(dd(col("npos")) / dd(col("n")) -
          dd(col("sp")) / (dd(col("n")) * lit(6.0e7)))).as("term"))
      .agg(sum(col("n")).as("n"),
        sum(bround(col("term"), 8).cast("decimal(24,8)")).as("terms"))
      .select(col("n"), (dd(col("terms")) / dd(col("n"))).as("ece"))
  }

  private def eceOracle: String =
    """WITH bins AS (
      |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |               AS BIGINT), 59999999) // 6000000 AS bin,
      |         count(*) AS n,
      |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np,
      |         sum(least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |             AS BIGINT), 60000000)) AS sp
      |  FROM orders GROUP BY 1),
      |terms AS (
      |  SELECT n, CAST(round_even(
      |           CAST(n AS DOUBLE) * abs(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
      |             - CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 6.0e7)), 8)
      |         AS DECIMAL(24,8)) AS term
      |  FROM bins)
      |SELECT CAST(sum(n) AS BIGINT) AS n,
      |       CAST(sum(term) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS ece
      |FROM terms""".stripMargin

  /** Cumulative gains / lift table over the 10 score bins, highest
    * score first — the credit-scoring "top decile captures X% of
    * positives at Y× lift" report. Cumulative counts are exact window
    * sums over the 10-bin domain; capture and lift are single mirrored
    * double expressions of exact integers (lift as one a·b/(c·d) —
    * never two stacked divisions). */
  private def liftDeciles(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    Synth.calibrationBins(s, d)
      .select(col("bin"), col("n"), col("npos"))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("npos")).over(w))
      .withColumn("tot_n", sum(col("n")).over(Window.partitionBy()))
      .withColumn("tot_pos", sum(col("npos")).over(Window.partitionBy()))
      .select(col("bin"), col("n"), col("npos"), col("cum_n"),
        col("cum_pos"),
        (dd(col("cum_pos")) / dd(col("tot_pos"))).as("capture"),
        (dd(col("cum_pos")) * dd(col("tot_n")) /
          (dd(col("cum_n")) * dd(col("tot_pos")))).as("lift"))
      .orderBy(col("bin").desc)
  }

  private def liftDecilesOracle: String =
    """WITH bins AS (
      |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |               AS BIGINT), 59999999) // 6000000 AS bin,
      |         count(*) AS n,
      |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np
      |  FROM orders GROUP BY 1),
      |cum AS (
      |  SELECT bin, n, np,
      |         sum(n) OVER (ORDER BY bin DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
      |         sum(np) OVER (ORDER BY bin DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
      |         sum(n) OVER () AS tot_n, sum(np) OVER () AS tot_pos
      |  FROM bins)
      |SELECT bin, CAST(n AS BIGINT) AS n, CAST(np AS BIGINT) AS npos,
      |       CAST(cum_n AS BIGINT) AS cum_n,
      |       CAST(cum_pos AS BIGINT) AS cum_pos,
      |       CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS capture,
      |       CAST(cum_pos AS DOUBLE) * CAST(tot_n AS DOUBLE)
      |         / (CAST(cum_n AS DOUBLE) * CAST(tot_pos AS DOUBLE)) AS lift
      |FROM cum ORDER BY bin DESC""".stripMargin

  /** Split-conformal prediction interval [N] (Vovk; the
    * distribution-free coverage guarantee a model-serving layer wraps
    * around ANY point predictor): predictor = per-priority mean price
    * trained on ≤1997 (pinned to a ×10⁶ grid by half-even integer
    * division), calibration = 1998 H1 absolute residuals, q = the
    * ⌈0.9·(n+1)⌉-th order statistic of the calibration residuals —
    * taken over $100 residual BINS via cumulative counts (the exact
    * order-statistic-without-a-sort trick from `stats_brown_forsythe`;
    * the bin's upper edge keeps the guarantee conservative), then
    * coverage measured on the held-out 1998 H2. Everything is exact
    * integers; coverage is one division. */
  private def conformal(s: SparkSession, d: String): DataFrame = {
    val cents = "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"
    val base = Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"), expr(cents).as("c"),
        col("o_orderdate").as("dt"))
    val mu = base.filter(col("dt") < lit("1998-01-01"))
      .groupBy("g").agg(sum(col("c")).as("sc"), count(lit(1)).as("nc"))
      .selectExpr("g",
        Technicals.divHESparkSql("sc * 1000000", "nc") + " as mu6")
    val calib = base
      .filter(col("dt") >= lit("1998-01-01") && col("dt") < lit("1998-07-01"))
      .join(broadcast(mu), "g")
      .select(expr("abs(c * 1000000 - mu6) div 10000000000")
        .as("rb")) // $100 residual bins
      .groupBy("rb").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("rb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = calib.agg(sum("cnt").as("n_cal"))
    val qBin = calib.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 10 >= (col("n_cal") + 1) * 9)
      .agg(min(col("rb")).as("qb"), max(col("n_cal")).as("n_cal"))
    val test = base
      .filter(col("dt") >= lit("1998-07-01") && col("dt") < lit("1999-01-01"))
      .join(broadcast(mu), "g")
      .crossJoin(broadcast(qBin))
      .select(col("n_cal"), col("qb"),
        (abs(col("c") * 1000000L - col("mu6")) <=
          (col("qb") + 1) * 10000000000L).as("covered"))
    test.groupBy(col("n_cal"), col("qb"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("covered"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("n_cal"), col("qb").as("q_bin_100usd"), col("n_test"),
        col("n_covered"),
        (dd(col("n_covered")) / dd(col("n_test"))).as("coverage"))
  }

  private def conformalOracle: String = {
    val mu6 = Technicals.divHEDuckSql("sc * 1000000", "nc")
    s"""WITH base AS (
       |  SELECT o_orderpriority AS g,
       |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |           AS c,
       |         o_orderdate AS dt
       |  FROM orders),
       |mu AS (
       |  SELECT g, $mu6 AS mu6
       |  FROM (SELECT g, sum(c) AS sc, count(*) AS nc FROM base
       |        WHERE dt < DATE '1998-01-01' GROUP BY g)),
       |calib AS (
       |  SELECT abs(b.c * 1000000 - mu.mu6) // 10000000000 AS rb,
       |         count(*) AS cnt
       |  FROM base b JOIN mu USING (g)
       |  WHERE dt >= DATE '1998-01-01' AND dt < DATE '1998-07-01'
       |  GROUP BY 1),
       |tot AS (SELECT sum(cnt) AS n_cal FROM calib),
       |qbin AS (
       |  SELECT min(rb) AS qb, max(n_cal) AS n_cal FROM (
       |    SELECT rb, sum(cnt) OVER (ORDER BY rb
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |      n_cal
       |    FROM calib, tot)
       |  WHERE cum * 10 >= (n_cal + 1) * 9),
       |test AS (
       |  SELECT qbin.n_cal, qbin.qb,
       |         abs(b.c * 1000000 - mu.mu6)
       |           <= (qbin.qb + 1) * 10000000000 AS covered
       |  FROM base b JOIN mu USING (g), qbin
       |  WHERE dt >= DATE '1998-07-01' AND dt < DATE '1999-01-01')
       |SELECT CAST(n_cal AS BIGINT) AS n_cal,
       |       CAST(qb AS BIGINT) AS q_bin_100usd,
       |       CAST(count(*) AS BIGINT) AS n_test,
       |       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_covered,
       |       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS coverage
       |FROM test GROUP BY n_cal, qb""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_isotonic" -> isotonic,
    "eval_ece" -> ece,
    "eval_conformal" -> conformal,
    "eval_lift_deciles" -> liftDeciles)

  def oracles: Map[String, String] = Map(
    "stats_isotonic" -> isotonicOracle,
    "eval_ece" -> eceOracle,
    "eval_conformal" -> conformalOracle,
    "eval_lift_deciles" -> liftDecilesOracle)
}

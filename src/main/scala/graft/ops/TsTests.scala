package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Econometric time-series tests [N] — the two diagnostics a market
  * warehouse runs over its price/revenue series that the existing ts_*
  * family does not yet cover: Engle–Granger cointegration (the pairs-
  * trading question: "do these two series share a long-run equilibrium,
  * i.e. is a spread trade mean-reverting?") and the Ljung–Box
  * portmanteau test ("are these residuals white noise?" — the standard
  * post-fit check of Box–Jenkins modelling, complementing `ts_pacf`'s
  * identification step and `ts_backtest_mae`'s accuracy step).
  *
  * No reference anchor (the reference pipeline has no analytics
  * engine); warehouse-parity rows per BASELINE.json's mandate, nearest
  * SURVEY anchors §2.L's ts_* battery.
  *
  * Float discipline (graft-verify-protocol, the `stats_ols_multi` /
  * `ts_pacf` lessons): every data-scale reduction is an EXACT
  * integer/decimal sum; means land on a ×10⁶ integer grid by half-even
  * INTEGER division (never round a float quotient); the second-stage
  * regressions pin their double inputs at 6dp and multiply as exact
  * decimals; final statistics assemble in doubles with the expression
  * order mirrored token-for-token in the DuckDB oracle. SSE uses the
  * algebraic expansion sdd − 2γ·sud + γ²·suu so no second data pass
  * (and no float re-accumulation) is ever needed.
  *
  * Scale shape: each key touches the fact table ONCE (one hash agg
  * into the calendar-bounded month domain); everything after runs on
  * ~84 rows — window lags, 1-row model broadcasts, constant-work
  * formula assembly. The same shape survives 100 TB because the month
  * domain does not grow with data volume. */
object TsTests extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  /** Half-even integer division over NAMED bigint columns (POSITIVE
    * operands only — cents and counts here). Mirrors Autocorr's
    * divHESql, which is the DuckDB-side text of the same algebra. */
  private def heDiv(n: String, den: String): Column = expr(
    s"($n div $den) + (case when ($n % $den) * 2 > $den then 1L " +
      s"when ($n % $den) * 2 = $den then ($n div $den) % 2 " +
      s"else 0L end)")

  /** Engle–Granger cointegration test [N] (Engle & Granger 1987) on the
    * monthly mean order price of priority 1-URGENT (y) vs 2-HIGH (x):
    *
    *  1. SERIES: per-month mean price per leg on a ×10⁶ integer grid —
    *     exact cent sums, half-even integer division by the count
    *     (never a rounded float quotient), both legs from ONE
    *     conditional hash agg over the fact scan.
    *  2. HEDGE: OLS y = α + βx by normal equations from exact decimal
    *     power sums; α, β are the only doubles, assembled once.
    *  3. SPREAD: u_t = y − α − βx in doubles (identical IEEE inputs →
    *     identical u_t on both engines).
    *  4. DICKEY–FULLER on the spread: Δu_t regressed on u_{t−1}
    *     (no intercept, lag-0 — the Engle–Granger second step); inputs
    *     pin at 6dp and multiply as exact decimal(18,6) so the three
    *     regression sums are order-invariant, then γ, SSE (algebraic
    *     expansion), se(γ) and the DF t-statistic assemble in mirrored
    *     doubles. t below the 5% Engle–Granger critical value −3.37
    *     (two variables, estimated constant) flags cointegration.
    *
    * The two legs ride the same order flow, so the spread is strongly
    * mean-reverting by construction and the flag fires — CointSpec
    * asserts it, plus β ≈ 1 on the symmetric legs. */
  private def cointegration(s: SparkSession, d: String): DataFrame = {
    val dec19 = (c: Column) => c.cast("decimal(19,0)")
    val cents = expr(
      "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")
    val monthly = Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", cents)).as("yc"),
        count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("yn"),
        sum(when(col("o_orderpriority") === "2-HIGH", cents)).as("xc"),
        count(when(col("o_orderpriority") === "2-HIGH", lit(1))).as("xn"))
      .filter(col("yn") > 0 && col("xn") > 0)
      .select(col("month"), (col("yc") * 10000L).as("yc4"), col("yn"),
        (col("xc") * 10000L).as("xc4"), col("xn"))
      .select(col("month"), heDiv("yc4", "yn").as("y6"),
        heDiv("xc4", "xn").as("x6"))
    val sums = monthly.agg(
      count(lit(1)).as("n"),
      sum(dec19(col("x6"))).as("sx"), sum(dec19(col("y6"))).as("sy"),
      sum(dec19(col("x6")) * dec19(col("x6"))).as("sxx"),
      sum(dec19(col("x6")) * dec19(col("y6"))).as("sxy"))
    val model = sums.select(col("n").as("nm"),
        ((dd(col("n")) * dd(col("sxy")) - dd(col("sx")) * dd(col("sy"))) /
          (dd(col("n")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))))
          .as("beta"),
        dd(col("sx")).as("sxd"), dd(col("sy")).as("syd"),
        dd(col("n")).as("nd"))
      .select(col("nm"), col("beta"),
        ((col("syd") - col("beta") * col("sxd")) / col("nd")).as("alpha"))
    val w = Window.orderBy(col("month"))
    val spread = monthly.join(broadcast(model), expr("true"))
      .select(col("month"), col("nm"), col("beta"), col("alpha"),
        (dd(col("y6")) - (col("alpha") + col("beta") * dd(col("x6"))))
          .as("u"))
    val df = spread
      .withColumn("up", lag(col("u"), 1).over(w))
      .filter(col("up").isNotNull)
      .select(col("nm"), col("beta"), col("alpha"),
        bround(col("up"), 6).cast("decimal(18,6)").as("upp"),
        bround(col("u") - col("up"), 6).cast("decimal(18,6)").as("dup"))
      .groupBy(col("nm"), col("beta"), col("alpha"))
      .agg(count(lit(1)).as("m"),
        sum(col("upp") * col("upp")).as("suu"),
        sum(col("upp") * col("dup")).as("sud"),
        sum(col("dup") * col("dup")).as("sdd"))
    df.select(col("nm").as("n_months"), col("beta"), col("alpha"),
        (dd(col("sud")) / dd(col("suu"))).as("gamma"),
        col("m"), dd(col("suu")).as("suud"), dd(col("sud")).as("sudd"),
        dd(col("sdd")).as("sddd"))
      .select(col("n_months"), col("beta"), col("alpha"), col("gamma"),
        (col("gamma") /
          sqrt(((col("sddd") - lit(2.0) * col("gamma") * col("sudd") +
            col("gamma") * col("gamma") * col("suud")) /
            dd(col("m") - 1)) / col("suud"))).as("df_t"))
      .select(col("n_months"), col("beta"), col("alpha"), col("gamma"),
        col("df_t"), (col("df_t") < lit(-3.37)).as("cointegrated"))
  }

  private def divHESqlTxt(n: String, den: String): String =
    s"(($n) // ($den) + (case when (($n) % ($den)) * 2 > ($den) then 1 " +
      s"when (($n) % ($den)) * 2 = ($den) then (($n) // ($den)) % 2 " +
      s"else 0 end))"

  private def cointegrationOracle: String =
    s"""WITH monthly0 AS (
       |  SELECT date_trunc('month', o_orderdate) AS month,
       |         sum(CASE WHEN o_orderpriority = '1-URGENT' THEN
       |             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |             END) AS yc,
       |         count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS yn,
       |         sum(CASE WHEN o_orderpriority = '2-HIGH' THEN
       |             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |             END) AS xc,
       |         count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS xn
       |  FROM orders
       |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
       |  GROUP BY 1),
       |monthly AS (
       |  SELECT month,
       |         ${divHESqlTxt("yc * 10000", "yn")} AS y6,
       |         ${divHESqlTxt("xc * 10000", "xn")} AS x6
       |  FROM monthly0 WHERE yn > 0 AND xn > 0),
       |sums AS (
       |  SELECT count(*) AS n,
       |         sum(CAST(x6 AS HUGEINT)) AS sx, sum(CAST(y6 AS HUGEINT)) AS sy,
       |         sum(CAST(x6 AS HUGEINT) * x6) AS sxx,
       |         sum(CAST(x6 AS HUGEINT) * y6) AS sxy
       |  FROM monthly),
       |model AS (
       |  SELECT n AS nm,
       |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |         (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta,
       |         sx, sy, n FROM sums),
       |model2 AS (
       |  SELECT nm, beta,
       |         (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
       |           / CAST(n AS DOUBLE) AS alpha
       |  FROM model),
       |spread AS (
       |  SELECT month, nm, beta, alpha,
       |         CAST(y6 AS DOUBLE) - (alpha + beta * CAST(x6 AS DOUBLE)) AS u
       |  FROM monthly CROSS JOIN model2),
       |lagged AS (
       |  SELECT nm, beta, alpha, u,
       |         lag(u) OVER (ORDER BY month) AS up
       |  FROM spread),
       |pinned AS (
       |  SELECT nm, beta, alpha,
       |         CAST(round_even(up, 6) AS DECIMAL(19,6)) AS upp,
       |         CAST(round_even(u - up, 6) AS DECIMAL(19,6)) AS dup
       |  FROM lagged WHERE up IS NOT NULL),
       |reg AS (
       |  SELECT nm, beta, alpha, count(*) AS m,
       |         sum(upp * upp) AS suu, sum(upp * dup) AS sud,
       |         sum(dup * dup) AS sdd
       |  FROM pinned GROUP BY nm, beta, alpha),
       |g AS (
       |  SELECT nm AS n_months, beta, alpha,
       |         CAST(sud AS DOUBLE) / CAST(suu AS DOUBLE) AS gamma,
       |         m, CAST(suu AS DOUBLE) AS suud, CAST(sud AS DOUBLE) AS sudd,
       |         CAST(sdd AS DOUBLE) AS sddd
       |  FROM reg),
       |t AS (
       |  SELECT n_months, beta, alpha, gamma,
       |         gamma / sqrt(((sddd - 2.0 * gamma * sudd
       |             + gamma * gamma * suud) / CAST(m - 1 AS DOUBLE)) / suud)
       |           AS df_t
       |  FROM g)
       |SELECT n_months, beta, alpha, gamma, df_t,
       |       df_t < -3.37 AS cointegrated
       |FROM t""".stripMargin

  private val lbLags = 6

  /** Ljung–Box portmanteau test [N] (Ljung & Box 1978) on the
    * month-over-month revenue CHANGES — "is the differenced series
    * white noise?", the decision between modelling and not modelling:
    *
    * Q = m(m+2) Σ_{k=1..6} ρ̂²_k / (m−k),  vs  χ²₆ at 5% (12.592).
    *
    * EXACT end to end: monthly cent sums are exact integers, diffs are
    * exact, centering multiplies through by m (c_t = m·d_t − S — no
    * float mean anywhere), and every ACF numerator/denominator is a
    * decimal(38,0) sum of integer products. The six ρ̂_k are single
    * IEEE divisions; Q is ONE mirrored expression whose addition order
    * is fixed by the SQL text, so even the white-noise boolean agrees
    * across engines.
    *
    * Scale shape: one fact-scan hash agg into the month domain, then
    * window lags and a 1-row reduction over ~84 rows. */
  private def ljungBox(s: SparkSession, d: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val monthly = Tables.orders(s, d)
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(12,2))) * 100" +
        " as decimal(38,0))").as("cents"))
    val w = Window.orderBy(col("month"))
    val diffs = monthly
      .withColumn("d", col("cents") - lag(col("cents"), 1).over(w))
      .filter(col("d").isNotNull)
      .select(col("month"), col("d"))
    val st = diffs.agg(count(lit(1)).as("m"), sum(col("d")).as("sd"))
    val cser = diffs.join(broadcast(st), expr("true"))
      .select(col("month"), col("m"),
        dec38(col("m") * col("d") - col("sd")).as("c"))
    val lagged = (1 to lbLags).foldLeft(cser) { (acc, k) =>
      acc.withColumn(s"c$k", lag(col("c"), k).over(w))
    }
    val numAggs = (1 to lbLags).map(k =>
      sum(col("c") * col(s"c$k")).as(s"n$k"))
    val sums = lagged.groupBy(col("m"))
      .agg(sum(col("c") * col("c")).as("den"), numAggs: _*)
    val rhoCols = (1 to lbLags).map(k =>
      (dd(col(s"n$k")) / dd(col("den"))).as(s"rho$k"))
    val withRho = sums.select((col("m") +: rhoCols): _*)
    val qExpr = (1 to lbLags).map(k =>
      s"rho$k * rho$k / cast(m - $k as double)").mkString(" + ")
    withRho
      .select((col("m").as("n_diffs") +:
        (1 to lbLags).map(k => col(s"rho$k")) :+
        expr(s"cast(m as double) * cast(m + 2 as double) * ($qExpr)")
          .as("q")): _*)
      .withColumn("white_noise", col("q") <= lit(12.592))
  }

  private def ljungBoxOracle: String = {
    val lagSel = (1 to lbLags).map(k =>
      s"lag(c, $k) OVER (ORDER BY month) AS c$k").mkString(",\n|         ")
    val numSel = (1 to lbLags).map(k =>
      s"sum(c * c$k) AS n$k").mkString(", ")
    val rhoSel = (1 to lbLags).map(k =>
      s"CAST(n$k AS DOUBLE) / CAST(den AS DOUBLE) AS rho$k").mkString(",\n|         ")
    val qTxt = (1 to lbLags).map(k =>
      s"rho$k * rho$k / CAST(m - $k AS DOUBLE)").mkString(" + ")
    s"""WITH monthly AS (
       |  SELECT date_trunc('month', o_orderdate) AS month,
       |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
       |           AS HUGEINT) AS cents
       |  FROM orders GROUP BY 1),
       |diffs AS (
       |  SELECT month, cents - lag(cents) OVER (ORDER BY month) AS d
       |  FROM monthly),
       |dd2 AS (SELECT month, d FROM diffs WHERE d IS NOT NULL),
       |st AS (SELECT count(*) AS m, sum(d) AS sd FROM dd2),
       |cser AS (
       |  SELECT month, m, CAST(m AS HUGEINT) * d - sd AS c
       |  FROM dd2 CROSS JOIN st),
       |lagged AS (
       |  SELECT month, m, c,
       |         $lagSel
       |  FROM cser),
       |sums AS (
       |  SELECT m, sum(c * c) AS den, $numSel
       |  FROM lagged GROUP BY m),
       |rho AS (
       |  SELECT m,
       |         $rhoSel
       |  FROM sums),
       |q AS (
       |  SELECT m AS n_diffs, ${(1 to lbLags).map(k => s"rho$k").mkString(", ")},
       |         CAST(m AS DOUBLE) * CAST(m + 2 AS DOUBLE) * ($qTxt) AS q
       |  FROM rho)
       |SELECT n_diffs, ${(1 to lbLags).map(k => s"rho$k").mkString(", ")}, q,
       |       q <= 12.592 AS white_noise
       |FROM q""".stripMargin
  }

  /** Yule–Walker AR(2) fit [N] (the moment-matching autoregression
    * estimator, Box–Jenkins ch. 3) per order priority, on the monthly
    * revenue series: solve the 2×2 Yule–Walker system for (φ₁, φ₂)
    * from the lag-1/lag-2 sample autocorrelations —
    *
    *   φ₁ = r₁(1 − r₂)/(1 − r₁²),  φ₂ = (r₂ − r₁²)/(1 − r₁²),
    *   σ²/c₀ = 1 − φ₁r₁ − φ₂r₂  (the innovation-variance ratio).
    *
    * EXACT end to end (the `ts_ljung_box` centering trick): monthly
    * cent sums are exact decimals, the series centers by multiplying
    * through with the per-group count (c_t = m·y_t − S — no float mean
    * anywhere), and each ACF numerator/denominator is a decimal(38,0)
    * sum of integer products; r₁, r₂ are single IEEE divisions and the
    * φ assembly is one mirrored double expression per column.
    *
    * Scale shape: one fact-scan hash agg into the (priority × month)
    * domain, a 5-row stats equi-join (hash, not a crossJoin — the
    * group key makes it a plain dimension join), per-group window lags
    * over ≤84 rows, one final hash agg. The month domain is calendar-
    * bounded, so the post-scan work is constant at any SF. */
  private def yuleWalker(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("g"),
        trunc(col("o_orderdate"), "month").as("month"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(12,2))) * 100" +
        " as decimal(38,0))").as("cents"))
    val st = monthly.groupBy(col("g"))
      .agg(count(lit(1)).as("m"), sum(col("cents")).as("sd"))
    val w = Window.partitionBy(col("g")).orderBy(col("month"))
    val cser = monthly.join(st, Seq("g"))
      .select(col("g"), col("month"), col("m"),
        (col("m") * col("cents") - col("sd")).cast("decimal(38,0)").as("c"))
      .withColumn("c1", lag(col("c"), 1).over(w))
      .withColumn("c2", lag(col("c"), 2).over(w))
    val sums = cser.groupBy(col("g"), col("m"))
      .agg(sum(col("c") * col("c")).as("den"),
        sum(col("c") * col("c1")).as("n1"),
        sum(col("c") * col("c2")).as("n2"))
    sums
      .select(col("g"), col("m").as("n_months"),
        (dd(col("n1")) / dd(col("den"))).as("r1"),
        (dd(col("n2")) / dd(col("den"))).as("r2"))
      .select(col("g"), col("n_months"), col("r1"), col("r2"),
        (col("r1") * (lit(1.0) - col("r2")) /
          (lit(1.0) - col("r1") * col("r1"))).as("phi1"),
        ((col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1"))).as("phi2"))
      .withColumn("noise_ratio",
        lit(1.0) - col("phi1") * col("r1") - col("phi2") * col("r2"))
      .orderBy("g")
  }

  private def yuleWalkerOracle: String =
    """WITH monthly AS (
      |  SELECT o_orderpriority AS g, date_trunc('month', o_orderdate) AS month,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
      |           AS HUGEINT) AS cents
      |  FROM orders GROUP BY 1, 2),
      |st AS (SELECT g, count(*) AS m, sum(cents) AS sd
      |       FROM monthly GROUP BY g),
      |cser AS (
      |  SELECT monthly.g, month, m,
      |         CAST(m AS HUGEINT) * cents - sd AS c
      |  FROM monthly JOIN st ON monthly.g = st.g),
      |lagged AS (
      |  SELECT g, m, c,
      |         lag(c, 1) OVER (PARTITION BY g ORDER BY month) AS c1,
      |         lag(c, 2) OVER (PARTITION BY g ORDER BY month) AS c2
      |  FROM cser),
      |sums AS (
      |  SELECT g, m, sum(c * c) AS den,
      |         sum(c * c1) AS n1, sum(c * c2) AS n2
      |  FROM lagged GROUP BY g, m),
      |rho AS (
      |  SELECT g, m AS n_months,
      |         CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
      |         CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2
      |  FROM sums),
      |phi AS (
      |  SELECT g, n_months, r1, r2,
      |         r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
      |         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
      |  FROM rho)
      |SELECT g, n_months, r1, r2, phi1, phi2,
      |       1.0 - phi1 * r1 - phi2 * r2 AS noise_ratio
      |FROM phi ORDER BY g""".stripMargin

  /** EWMA control chart [N] (Roberts 1959, the SPC drift detector ISO
    * 7870-6 standardizes) per priority on the monthly revenue series:
    * z_t = λy_t + (1−λ)z_{t−1}, z_0 = μ, flagged when |z_t − μ|
    * exceeds 3σ·√(λ/(2−λ))·√(1−(1−λ)^{2t}) — the time-varying limits
    * of the exact-variance form. Cross-engine float discipline:
    *
    *  - λ = 1/2 (DYADIC — every smoothing step is exact in IEEE, the
    *    `fin_ewma` trick applied to a recursion over the full prefix),
    *    and the recursion is ONE left fold over the prefix list with
    *    z_0 = μ prepended — Spark `aggregate(arr, μ, ...)` ≡ DuckDB
    *    `list_reduce(list_prepend(μ, arr), ...)`, same op sequence,
    *    bit-identical.
    *  - (1−λ)^{2t} = 4^{−t} comes from an INTEGER shift (1L << 2t),
    *    never libm pow (pow is the one non-mirrorable primitive —
    *    engines' libm may differ in the last ulp); past t = 31 the
    *    factor underflows double's view of 1−x and the limit is exactly
    *    the asymptote.
    *  - μ and σ assemble from exact cent power sums, one IEEE op each.
    *
    * Scale shape: one fact-scan hash agg into the (priority × month)
    * domain, a 5-row stats equi-join, prefix lists over ≤84 rows. */
  private def ewmaControl(s: SparkSession, d: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("g"),
        trunc(col("o_orderdate"), "month").as("month"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(12,2))) * 100" +
        " as decimal(38,0))").as("cents"))
      .select(col("g"), col("month"), expr("cast(cents div 100000 as bigint)").as("y"))
    val st = monthly.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(dec38(col("y")) * dec38(col("y"))).as("qy"))
      .select(col("g"),
        (dd(col("sy")) / dd(col("n"))).as("mu"),
        sqrt((dd(col("qy")) - dd(col("sy")) * dd(col("sy")) / dd(col("n"))) /
          dd(col("n") - 1)).as("sigma"))
    val w = Window.partitionBy(col("g")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly.join(st, Seq("g"))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("month"))))
      .withColumn("arr", collect_list(dd(col("y"))).over(w))
      .withColumn("z",
        expr("aggregate(arr, mu, (acc, x) -> acc * 0.5D + x * 0.5D)"))
      .withColumn("wfac",
        when(col("t") <= 31,
          lit(1.0) - lit(1.0) / expr("cast(shiftleft(1L, t * 2) as double)"))
          .otherwise(lit(1.0)))
      .withColumn("band",
        lit(3.0) * col("sigma") * sqrt(col("wfac") / lit(3.0)))
      .select(col("g"), col("month"), col("t"), col("y"), col("z"),
        (col("mu") + col("band")).as("ucl"),
        (col("mu") - col("band")).as("lcl"),
        (abs(col("z") - col("mu")) > col("band")).as("breach"))
      .orderBy("g", "month")
  }

  private def ewmaControlOracle: String =
    """WITH monthly AS (
      |  SELECT o_orderpriority AS g,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
      |           AS HUGEINT) // 100000 AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2),
      |st AS (
      |  SELECT g,
      |         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE)
      |           / CAST(count(*) AS DOUBLE) AS mu,
      |         sqrt((CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE)
      |             - CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE)
      |               * CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE)
      |               / CAST(count(*) AS DOUBLE))
      |           / CAST(count(*) - 1 AS DOUBLE)) AS sigma
      |  FROM monthly GROUP BY g),
      |pre AS (
      |  SELECT m.g, m.month, m.y, st.mu, st.sigma,
      |         CAST(row_number() OVER (PARTITION BY m.g ORDER BY m.month)
      |              AS INTEGER) AS t,
      |         list(CAST(m.y AS DOUBLE)) OVER (PARTITION BY m.g
      |           ORDER BY m.month
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
      |  FROM monthly m JOIN st ON m.g = st.g),
      |zc AS (
      |  SELECT g, month, t, y, mu, sigma,
      |         list_reduce(list_prepend(mu, arr),
      |                     (acc, x) -> acc * 0.5 + x * 0.5) AS z,
      |         CASE WHEN t <= 31
      |              THEN 1.0 - 1.0 / CAST(1::BIGINT << (t * 2) AS DOUBLE)
      |              ELSE 1.0 END AS wfac
      |  FROM pre),
      |b AS (
      |  SELECT g, month, t, y, mu, z,
      |         3.0 * sigma * sqrt(wfac / 3.0) AS band
      |  FROM zc)
      |SELECT g, month, t, y, z,
      |       mu + band AS ucl, mu - band AS lcl,
      |       abs(z - mu) > band AS breach
      |FROM b ORDER BY g, month""".stripMargin

  /** Augmented Dickey–Fuller unit-root test [N] (Dickey & Fuller 1979;
    * lag order 0 with constant — the DF regression `fin_cointegration`
    * runs on residuals, here standalone on the monthly revenue LEVEL
    * series): Δy_t = α + γ·y_{t−1} + ε; reject the unit root (series is
    * stationary) when t(γ) < −2.86 (5%, constant, large n). Everything
    * reduces to ONE agg over the lagged month relation: x = y_{t−1} and
    * Δ are exact grid integers, the five regression sums are exact
    * decimal(38,0), and γ, α, SSE (via the centered expansion
    * Syy − γ·Sxy), se(γ), t assemble in mirrored doubles. */
  private def adf(s: SparkSession, d: String): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val monthly = Tables.orders(s, d)
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(12,2))) * 100" +
        " as decimal(38,0))").as("cents"))
      .select(col("month"), expr("cast(cents div 100000 as bigint)").as("y"))
    val w = Window.orderBy(col("month"))
    val lagged = monthly
      .withColumn("x", lag(col("y"), 1).over(w))
      .filter(col("x").isNotNull)
      .select(col("x"), (col("y") - col("x")).as("dy"))
    val sums = lagged.agg(count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("dy")).as("sd"),
      sum(dec38(col("x")) * dec38(col("x"))).as("sxx"),
      sum(dec38(col("x")) * dec38(col("dy"))).as("sxd"),
      sum(dec38(col("dy")) * dec38(col("dy"))).as("sdd"))
    sums
      .select(col("m"),
        ((dd(col("m")) * dd(col("sxd")) - dd(col("sx")) * dd(col("sd"))) /
          (dd(col("m")) * dd(col("sxx")) - dd(col("sx")) * dd(col("sx"))))
          .as("gamma"),
        dd(col("sx")).as("sxd2"), dd(col("sd")).as("sdd2"),
        dd(col("m")).as("md"),
        (dd(col("sxx")) - dd(col("sx")) * dd(col("sx")) / dd(col("m")))
          .as("sxx_c"),
        (dd(col("sxd")) - dd(col("sx")) * dd(col("sd")) / dd(col("m")))
          .as("sxd_c"),
        (dd(col("sdd")) - dd(col("sd")) * dd(col("sd")) / dd(col("m")))
          .as("sdd_c"))
      .select(col("m").as("n_diffs"), col("gamma"),
        ((col("sdd2") - col("gamma") * col("sxd2")) / col("md")).as("alpha"),
        (col("gamma") /
          sqrt(((col("sdd_c") - col("gamma") * col("sxd_c")) /
            (col("md") - lit(2.0))) / col("sxx_c"))).as("adf_t"))
      .withColumn("stationary", col("adf_t") < lit(-2.86))
  }

  private def adfOracle: String =
    """WITH monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS month,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
      |           AS HUGEINT) // 100000 AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |lagged AS (
      |  SELECT x, y - x AS dy FROM (
      |    SELECT y, lag(y) OVER (ORDER BY month) AS x FROM monthly)
      |  WHERE x IS NOT NULL),
      |sums AS (
      |  SELECT count(*) AS m,
      |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sd,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(x AS HUGEINT) * dy) AS sxd,
      |         sum(CAST(dy AS HUGEINT) * dy) AS sdd
      |  FROM lagged),
      |g AS (
      |  SELECT m,
      |         (CAST(m AS DOUBLE) * CAST(sxd AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE)) /
      |         (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS gamma,
      |         CAST(sx AS DOUBLE) AS sxd2, CAST(sd AS DOUBLE) AS sdd2,
      |         CAST(m AS DOUBLE) AS md,
      |         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |           / CAST(m AS DOUBLE) AS sxx_c,
      |         CAST(sxd AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE)
      |           / CAST(m AS DOUBLE) AS sxd_c,
      |         CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
      |           / CAST(m AS DOUBLE) AS sdd_c
      |  FROM sums),
      |t AS (
      |  SELECT m AS n_diffs, gamma,
      |         (sdd2 - gamma * sxd2) / md AS alpha,
      |         gamma / sqrt(((sdd_c - gamma * sxd_c) / (md - 2.0)) / sxx_c)
      |           AS adf_t
      |  FROM g)
      |SELECT n_diffs, gamma, alpha, adf_t, adf_t < -2.86 AS stationary
      |FROM t""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fin_cointegration" -> cointegration,
    "ts_ljung_box" -> ljungBox,
    "ts_yule_walker" -> yuleWalker,
    "ts_ewma_control" -> ewmaControl,
    "ts_adf" -> adf)

  def oracles: Map[String, String] = Map(
    "fin_cointegration" -> cointegrationOracle,
    "ts_ljung_box" -> ljungBoxOracle,
    "ts_yule_walker" -> yuleWalkerOracle,
    "ts_ewma_control" -> ewmaControlOracle,
    "ts_adf" -> adfOracle)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Technical-indicator operators [N] over the daily revenue series —
  * the chartist layer above `fin_rsi`/`fin_ewma`: MACD (12/26/9 EMA
  * crossover), Bollinger bands (20-day mean ± 2σ), and the stochastic
  * oscillator (14-day %K, 3-day %D).
  *
  * The series is CALENDAR-BOUNDED (~2.4k days at every SF): the daily
  * rollup is the only data-scale stage; the indicators run on the day
  * domain. MACD's EMA recursion is inherently sequential, so it runs
  * as the `ts_holt_linear` exact-integer walk (BigInt + half-even
  * integer division on cents; the oracle replays it as a recursive CTE
  * in HUGEINT) — zero float accumulation, bit-identical on both
  * engines. Bollinger/stochastic are pure window algebra over exact
  * $1000-unit integers with one mirrored float step per row. */
object Technicals extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  /** Daily revenue in $1000 units (exact BIGINT — keeps every rolling
    * power sum double-exact far past sf0.1; see `agg_skewkurt` bound
    * discipline). */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)" +
          " div 100000")).as("r"))

  private val dailySql =
    """SELECT o_orderdate AS day,
      |       sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 100000) AS r
      |FROM orders GROUP BY 1""".stripMargin

  /** Signed half-even integer division (mirrors Finance.divHE — the
    * Spark-side walk arithmetic the oracles replay). */
  private def divHE(n: BigInt, den: BigInt): BigInt = {
    val a = n.abs
    val b0 = a / den; val r2 = (a % den) * 2
    val q = b0 + (if (r2 > den) BigInt(1)
                  else if (r2 == den) b0 % 2 else BigInt(0))
    if (n < 0) -q else q
  }

  private def divHESql(n: String, den: Long): String =
    divHEDuckSql(n, den.toString)

  /** Shared signed half-even-division SQL fragments with EXPRESSION
    * denominators — Spark (`div`) and DuckDB (`//`) spellings of the
    * same arithmetic, for modules whose grid divisions have column
    * denominators (rec_als_rank1's per-entity counts). */
  private[ops] def divHESparkSql(n: String, den: String): String =
    divHEFrag(n, den, "div")

  private[ops] def divHEDuckSql(n: String, den: String): String =
    divHEFrag(n, den, "//")

  private def divHEFrag(n: String, den: String, div: String): String = {
    def pos(m: String) =
      s"(($m) $div ($den) + (case when (($m) % ($den)) * 2 > ($den) then 1 " +
        s"when (($m) % ($den)) * 2 = ($den) then ((($m) $div ($den))) % 2 " +
        s"else 0 end))"
    s"(case when ($n) < 0 then -${pos(s"-($n)")} else ${pos(n)} end)"
  }

  /** MACD over daily revenue CENTS: EMA12/EMA26 with α=2/(N+1) as the
    * exact-integer recursions ema' = divHE(2y + (N−1)·ema, N+1), the
    * MACD line their difference, and the 9-day signal EMA of the MACD
    * line (init: first MACD value). hist = macd − signal is what the
    * crossover alert fires on. */
  private def macd(s: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
        .as("y"))
      .orderBy("day")
      .collect() // calendar-bounded (~2.4k days at every SF)
    val out =
      Array.newBuilder[(java.time.LocalDateTime, Long, Long, Long, Long)]
    var e12, e26, sig = BigInt(0)
    days.zipWithIndex.foreach { case (row, i) =>
      val day = row.getAs[java.time.LocalDateTime]("day")
      val y = BigInt(row.getAs[Long]("y"))
      if (i == 0) { e12 = y; e26 = y } else {
        e12 = divHE(y * 2 + e12 * 11, 13)
        e26 = divHE(y * 2 + e26 * 25, 27)
      }
      val m = e12 - e26
      sig = if (i == 0) m else divHE(m * 2 + sig * 8, 10)
      out += ((day, y.toLong, m.toLong, sig.toLong, (m - sig).toLong))
    }
    s.createDataFrame(out.result().toSeq)
      .toDF("day", "y_cents", "macd", "signal", "hist")
      .orderBy("day")
  }

  private def macdOracle: String = {
    val e12 = divHESql("2 * m.y + 11 * w.e12", 13)
    val e26 = divHESql("2 * m.y + 25 * w.e26", 27)
    val sg = divHESql(s"2 * (($e12) - ($e26)) + 8 * w.sig", 10)
    s"""WITH RECURSIVE dd AS (
       |  SELECT o_orderdate AS day,
       |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
       |           AS BIGINT)) AS HUGEINT) AS y
       |  FROM orders GROUP BY 1),
       |mon AS (
       |  SELECT day, y,
       |         CAST(row_number() OVER (ORDER BY day) AS INTEGER) AS idx
       |  FROM dd),
       |walk(i, day, y, e12, e26, sig) AS (
       |  SELECT 1, day, y, y, y, CAST(0 AS HUGEINT)
       |  FROM mon WHERE idx = 1
       |  UNION ALL
       |  SELECT w.i + 1, m.day, m.y, $e12, $e26, $sg
       |  FROM walk w JOIN mon m ON m.idx = w.i + 1)
       |SELECT day, CAST(y AS BIGINT) AS y_cents,
       |       CAST(e12 - e26 AS BIGINT) AS macd,
       |       CAST(CASE WHEN i = 1 THEN e12 - e26 ELSE sig END
       |            AS BIGINT) AS signal,
       |       CAST((e12 - e26) - CASE WHEN i = 1 THEN e12 - e26
       |                               ELSE sig END AS BIGINT) AS hist
       |FROM walk ORDER BY day""".stripMargin
  }

  /** Bollinger bands: 20-day rolling mean ± 2 sample standard
    * deviations over daily $1000 revenue. Variance from the exact
    * integer power sums (20·Σx² − (Σx)² — double-exact), one sqrt,
    * mirrored. Only full 20-day windows emit. */
  private def bollinger(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-19, 0)
    daily(s, d)
      .withColumn("s1", sum(col("r")).over(w))
      .withColumn("s2", sum(col("r") * col("r")).over(w))
      .withColumn("m", count(lit(1)).over(w))
      .filter(col("m") === 20)
      .withColumn("mid", dd(col("s1")) / lit(20.0))
      .withColumn("sd", sqrt(dd(col("s1") * col("s1")).multiply(-1)
        .plus(dd(col("s2")) * lit(20.0)) / lit(380.0)))
      .select(col("day"), col("r"), col("mid"),
        (col("mid") + lit(2.0) * col("sd")).as("upper"),
        (col("mid") - lit(2.0) * col("sd")).as("lower"))
      .orderBy("day")
  }

  private def bollingerOracle: String =
    s"""WITH dd AS ($dailySql),
       |win AS (
       |  SELECT day, r,
       |         sum(r) OVER w AS s1,
       |         sum(r * r) OVER w AS s2,
       |         count(*) OVER w AS m
       |  FROM dd
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING
       |               AND CURRENT ROW)),
       |full20 AS (
       |  SELECT day, r, CAST(s1 AS DOUBLE) / 20.0 AS mid,
       |         sqrt((CAST(s1 * s1 AS DOUBLE) * -1 + CAST(s2 AS DOUBLE)
       |               * 20.0) / 380.0) AS sd
       |  FROM win WHERE m = 20)
       |SELECT day, CAST(r AS BIGINT) AS r, mid,
       |       mid + 2.0 * sd AS upper, mid - 2.0 * sd AS lower
       |FROM full20 ORDER BY day""".stripMargin

  /** Stochastic oscillator: %K = 100·(close − min₁₄)/(max₁₄ − min₁₄)
    * (exact-int numerator/denominator, one division), %D = 3-row mean
    * of %K with each %K pinned at 8dp so the 3-term sum is an exact
    * decimal in any order. Flat 14-day windows (max = min) are skipped
    * before %D, matching the oracle row-for-row. */
  private def stochastic(s: SparkSession, d: String): DataFrame = {
    val w14 = Window.orderBy(col("day")).rowsBetween(-13, 0)
    val k = daily(s, d)
      .withColumn("lo", min(col("r")).over(w14))
      .withColumn("hi", max(col("r")).over(w14))
      .withColumn("m", count(lit(1)).over(w14))
      .filter(col("m") === 14 && col("hi") > col("lo"))
      .select(col("day"),
        bround(lit(100.0) * dd(col("r") - col("lo")) /
          dd(col("hi") - col("lo")), 8).as("k"))
    val w3 = Window.orderBy(col("day")).rowsBetween(-2, 0)
    k.withColumn("ks",
        sum(col("k").cast("decimal(16,8)")).over(w3))
      .withColumn("m3", count(lit(1)).over(w3))
      .filter(col("m3") === 3)
      .select(col("day"), col("k"),
        (dd(col("ks")) / lit(3.0)).as("d"))
      .orderBy("day")
  }

  private def stochasticOracle: String =
    s"""WITH dd AS ($dailySql),
       |win AS (
       |  SELECT day, r,
       |         min(r) OVER w AS lo, max(r) OVER w AS hi,
       |         count(*) OVER w AS m
       |  FROM dd
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
       |               AND CURRENT ROW)),
       |pk AS (
       |  SELECT day,
       |         round_even(100.0 * CAST(r - lo AS DOUBLE)
       |                    / CAST(hi - lo AS DOUBLE), 8) AS k
       |  FROM win WHERE m = 14 AND hi > lo),
       |pd AS (
       |  SELECT day, k,
       |         sum(CAST(k AS DECIMAL(16,8))) OVER w3 AS ks,
       |         count(*) OVER w3 AS m3
       |  FROM pk
       |  WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING
       |                AND CURRENT ROW))
       |SELECT day, k, CAST(ks AS DOUBLE) / 3.0 AS d
       |FROM pd WHERE m3 = 3 ORDER BY day""".stripMargin

  /** Holt-Winters additive seasonal smoothing [N] over the monthly
    * revenue series (season m = 12) — the seasonal layer above
    * `ts_holt_linear`: with α=0.2, β=0.1, γ=0.1,
    *   level_t = 0.2·(y_t − s_{t−12}) + 0.8·(level + trend)
    *   trend_t = 0.1·(level_t − level) + 0.9·trend
    *   s_t     = 0.1·(y_t − level_t) + 0.9·s_{t−12}
    * initialized classically from the first two years (level = mean of
    * year 1, trend = (Σyear2 − Σyear1)/144, s_j = y_j − level). Exact-
    * integer walk on cents (divHE per smoothing step); the oracle
    * replays it as a recursive CTE whose 12-slot seasonal state
    * rotates through scalar columns s1..s12 — no float accumulation
    * anywhere. Emits the warm months (13+). */
  private def holtWinters(s: SparkSession, d: String): DataFrame = {
    val months = Tables.orders(s, d)
      .groupBy(trunc(col("o_orderdate"), "month").as("month"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)"))
        .as("y"))
      .orderBy("month")
      .collect() // calendar-bounded (~84 months at every SF)
    val ys = months.map(r =>
      (r.getAs[java.sql.Date]("month"), BigInt(r.getAs[Long]("y"))))
    require(ys.length >= 24, "Holt-Winters needs two full seasons")
    var level = divHE(ys.take(12).map(_._2).sum, 12)
    var trend = divHE(
      ys.slice(12, 24).map(_._2).sum - ys.take(12).map(_._2).sum, 144)
    val season = scala.collection.mutable.Queue(
      ys.take(12).map(_._2 - level): _*)
    val out =
      Array.newBuilder[(java.sql.Date, Long, Long, Long, Long, Long)]
    for (i <- 12 until ys.length) {
      val (mth, y) = ys(i)
      val sOld = season.dequeue()
      val fit = level + trend + sOld
      val nl = divHE((y - sOld) * 2 + (level + trend) * 8, 10)
      val nt = divHE((nl - level) + trend * 9, 10)
      val sNew = divHE((y - nl) + sOld * 9, 10)
      level = nl; trend = nt; season.enqueue(sNew)
      out += ((mth, y.toLong, fit.toLong, nl.toLong, nt.toLong,
        sNew.toLong))
    }
    s.createDataFrame(out.result().toSeq)
      .toDF("month", "y_cents", "fitted", "level", "trend", "seasonal")
      .orderBy("month")
  }

  private def holtWintersOracle: String = {
    val sumY = (a: Int, b: Int) =>
      s"(SELECT sum(y) FROM mon WHERE idx BETWEEN $a AND $b)"
    val initS = (1 to 12).map(j =>
      s"(SELECT y FROM mon WHERE idx = $j) - l AS s$j").mkString(",\n       ")
    val lvl = divHESql("2 * (m.y - w.s1) + 8 * (w.level + w.trend)", 10)
    val trd = divHESql(s"(($lvl) - w.level) + 9 * w.trend", 10)
    val snew = divHESql(s"(m.y - ($lvl)) + 9 * w.s1", 10)
    val shift = (2 to 12).map(j => s"w.s$j").mkString(", ")
    val sCols = (1 to 12).map(j => s"s$j").mkString(", ")
    s"""WITH RECURSIVE monthly AS (
       |  SELECT date_trunc('month', o_orderdate) AS month,
       |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
       |           AS BIGINT)) AS HUGEINT) AS y
       |  FROM orders GROUP BY 1),
       |mon AS (
       |  SELECT month, y,
       |         CAST(row_number() OVER (ORDER BY month) AS INTEGER) AS idx
       |  FROM monthly),
       |init AS (
       |  SELECT l, ${divHESql(s"${sumY(13, 24)} - ${sumY(1, 12)}", 144)}
       |           AS tr,
       |       $initS
       |  FROM (SELECT ${divHESql(sumY(1, 12), 12)} AS l)),
       |walk(i, month, y, fit, level, trend, $sCols) AS (
       |  SELECT 12, m.month, m.y, CAST(0 AS HUGEINT), init.l, init.tr,
       |         ${(1 to 12).map(j => s"init.s$j").mkString(", ")}
       |  FROM mon m, init WHERE m.idx = 12
       |  UNION ALL
       |  SELECT w.i + 1, m.month, m.y,
       |         w.level + w.trend + w.s1,
       |         $lvl, $trd,
       |         $shift, $snew
       |  FROM walk w JOIN mon m ON m.idx = w.i + 1)
       |SELECT month, CAST(y AS BIGINT) AS y_cents,
       |       CAST(fit AS BIGINT) AS fitted,
       |       CAST(level AS BIGINT) AS level,
       |       CAST(trend AS BIGINT) AS trend,
       |       CAST(s12 AS BIGINT) AS seasonal
       |FROM walk WHERE i >= 13 ORDER BY month""".stripMargin
  }

  /** Rolling 30-row OLS slope of daily revenue against the day index —
    * the "local trend" a momentum screen reads: slope = (nΣxy − ΣxΣy)
    * / (nΣx² − (Σx)²) per window, every power sum an exact integer
    * (x = days since 1995-01-01 ≤ ~2.4k, y in $1000 units → nΣxy ≤
    * ~30·2.4e3·2.3e4·30 ≈ 5e10, double-exact at any SF), one mirrored
    * division per row. */
  private def rollingSlope(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-29, 0)
    daily(s, d)
      .withColumn("x", datediff(col("day"), lit("1995-01-01")))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("r")).over(w))
      .withColumn("sxy", sum(col("x") * col("r")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("m", count(lit(1)).over(w))
      .filter(col("m") === 30)
      .select(col("day"), col("r"),
        (dd(col("sxy") * 30 - col("sx") * col("sy")) /
          dd(col("sxx") * 30 - col("sx") * col("sx"))).as("slope"))
      .orderBy("day")
  }

  private def rollingSlopeOracle: String =
    s"""WITH dd AS ($dailySql),
       |xy AS (
       |  SELECT day, r,
       |         date_diff('day', DATE '1995-01-01', CAST(day AS DATE)) AS x
       |  FROM dd),
       |win AS (
       |  SELECT day, r,
       |         sum(x) OVER w AS sx, sum(r) OVER w AS sy,
       |         sum(x * r) OVER w AS sxy, sum(x * x) OVER w AS sxx,
       |         count(*) OVER w AS m
       |  FROM xy
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING
       |               AND CURRENT ROW))
       |SELECT day, CAST(r AS BIGINT) AS r,
       |       CAST(sxy * 30 - sx * sy AS DOUBLE)
       |         / CAST(sxx * 30 - sx * sx AS DOUBLE) AS slope
       |FROM win WHERE m = 30 ORDER BY day""".stripMargin

  /** Exponentially time-decayed counters [N] (0.99/day half-life ≈ 69
    * days) — the "trending now" scoring a feed ranker runs nightly:
    * per priority, Σ_days n_d · 0.99^Δ_d with Δ = days before the
    * corpus max date. The decay curve is NOT computed with pow()
    * (cross-engine ULP drift compounds over thousands of days);
    * instead 0.99^Δ lives on the ×10¹² integer grid via the recursion
    * w(Δ) = divHE(w(Δ−1)·99·10¹⁰, 10¹²) — exact and bit-identical by
    * construction (Spark: a calendar-bounded driver-built dimension,
    * broadcast; oracle: the same recursion as a recursive CTE). The
    * weighted sum n·w accumulates as decimal(38,0) (reaches ~2.4e19 —
    * past int64); one /1e12 display division per group. */
  private def timeDecay(s: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("g"), col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val maxDay = days.agg(max(col("day")).as("mx"))
    val horizon = days.crossJoin(broadcast(maxDay))
      .agg(max(datediff(col("mx"), col("day"))).as("h"))
      .collect().head.getInt(0) // calendar-bounded scalar
    var w = BigInt("1000000000000")
    val weights = (0 to horizon).map { delta =>
      val row = (delta, w.toLong)
      w = divHE(w * BigInt("990000000000"), BigInt("1000000000000"))
      row
    }
    val wDf = s.createDataFrame(weights).toDF("delta", "w12")
    days.crossJoin(broadcast(maxDay))
      .withColumn("delta", datediff(col("mx"), col("day")))
      .join(broadcast(wDf), "delta")
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n_orders"),
        sum((col("n") * col("w12")).cast("decimal(38,0)")).as("dw"))
      // grid-divide BEFORE the double cast: dw crosses 2^53, and a wide
      // decimal/HUGEINT -> double cast is the engine-divergent step
      .selectExpr("g", "n_orders",
        divHESparkSql("dw", "1000000") + " as d6")
      .select(col("g"), col("n_orders"),
        (col("d6").cast("double") / lit(1.0e6)).as("decayed"))
      .orderBy("g")
  }

  private def timeDecayOracle: String = {
    val step = divHESql("w.w12 * 990000000000", 1000000000000L)
    s"""WITH RECURSIVE days AS MATERIALIZED (
       |  SELECT o_orderpriority AS g, o_orderdate AS day, count(*) AS n
       |  FROM orders GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS mx FROM days),
       |h AS (SELECT max(date_diff('day', CAST(day AS DATE),
       |               CAST(mx AS DATE))) AS h FROM days, mx),
       |w(delta, w12) AS (
       |  SELECT 0, CAST(1000000000000 AS HUGEINT)
       |  UNION ALL
       |  SELECT w.delta + 1, $step
       |  FROM w, h WHERE w.delta < h.h),
       |joined AS (
       |  SELECT g, n,
       |         date_diff('day', CAST(day AS DATE), CAST(mx AS DATE))
       |           AS delta
       |  FROM days, mx),
       |agg AS (
       |  SELECT g, sum(n) AS n_orders,
       |         sum(CAST(n AS HUGEINT) * w.w12) AS dw
       |  FROM joined JOIN w USING (delta)
       |  GROUP BY g)
       |SELECT g, CAST(n_orders AS BIGINT) AS n_orders,
       |       CAST(__D6__ AS DOUBLE) / 1.0e6 AS decayed
       |FROM agg ORDER BY g""".stripMargin
      .replace("__D6__", divHEDuckSql("dw", "1000000"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_time_decay" -> timeDecay,
    "fin_macd" -> macd,
    "fin_bollinger" -> bollinger,
    "fin_stochastic" -> stochastic,
    "win_rolling_slope" -> rollingSlope,
    "ts_holt_winters" -> holtWinters)

  def oracles: Map[String, String] = Map(
    "agg_time_decay" -> timeDecayOracle,
    "fin_macd" -> macdOracle,
    "fin_bollinger" -> bollingerOracle,
    "fin_stochastic" -> stochasticOracle,
    "win_rolling_slope" -> rollingSlopeOracle,
    "ts_holt_winters" -> holtWintersOracle)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Partial autocorrelation [N]: ACF(1..6) of the daily $1000 revenue
  * series, then the Durbin-Levinson recursion for the PACF — the
  * order-selection diagnostic an AR modeler reads first (the lag where
  * PACF cuts off ≈ the AR order). Complements `fin_autocorr` (plain
  * ACF on events) and `ts_holt_linear` (fitting).
  *
  * Cross-engine determinism is the `attr_markov_removal` integer-
  * fixpoint pattern: every autocorrelation is quantized ONCE onto a
  * ×1e12 BIGINT grid via half-even integer division of exact integer
  * sums (numerator n²·Σx_t·x_{t+k} − n·S·(Σhead+Σtail) + (n−k)·S²
  * over denominator n²·Σx² − n·S², both exact in BigInt/HUGEINT —
  * ~3.4e18 at sf0.1, past int64 at larger SFs, hence HUGEINT), and
  * Durbin-Levinson then runs ENTIRELY in scaled-integer arithmetic
  * (a⊗b = divHE(a·b, 1e12)) — zero float accumulation, bit-identical
  * fixpoints; the only float is the final /1e12 display division.
  *
  * Scale shape: the day rollup is the single data-scale stage; the
  * series is CALENDAR-BOUNDED (~2.4k rows at any SF), so the lag sums
  * and the 6-step recursion are metadata-scale (driver-side exact
  * BigInt, the `ts_holt_linear` walk precedent; the oracle unrolls the
  * same recursion as scalar HUGEINT CTEs). */
object Autocorr extends graft.QueryModule {

  private val pLags = 6
  private val R = BigInt("1000000000000") // 1e12 quantization grid

  private def divHE(n: BigInt, den: BigInt): BigInt = {
    val a = n.abs
    val b0 = a / den; val r2 = (a % den) * 2
    val q = b0 + (if (r2 > den) BigInt(1)
                  else if (r2 == den) b0 % 2 else BigInt(0))
    if (n < 0) -q else q
  }

  private def pacf(s: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)" +
          " div 100000")).as("r"))
      .orderBy("day")
      .collect() // calendar-bounded series
    val xs = days.map(r => BigInt(r.getAs[Long]("r"))).toVector
    val n = BigInt(xs.length)
    val sv = xs.sum
    val sxx = xs.map(x => x * x).sum
    val den = n * n * sxx - n * sv * sv
    val rho = (1 to pLags).map { k =>
      val c = (0 until xs.length - k).map(i => xs(i) * xs(i + k)).sum
      val sh = xs.dropRight(k).sum
      val st = xs.drop(k).sum
      val num = n * n * c - n * sv * (sh + st) + (n - k) * sv * sv
      divHE(num * R, den)
    }.toVector
    def mulR(a: BigInt, b: BigInt) = divHE(a * b, R)
    var phi = Vector(rho(0))
    val pacfs = scala.collection.mutable.ArrayBuffer(rho(0))
    for (k <- 2 to pLags) {
      val num = rho(k - 1) -
        (1 until k).map(j => mulR(phi(j - 1), rho(k - 1 - j))).sum
      val dn = R - (1 until k).map(j => mulR(phi(j - 1), rho(j - 1))).sum
      val pkk = divHE(num * R, dn)
      phi = (1 until k).map(j => phi(j - 1) - mulR(pkk, phi(k - 1 - j)))
        .toVector :+ pkk
      pacfs += pkk
    }
    val rows = (1 to pLags).map { k =>
      (k, rho(k - 1).toDouble / 1.0e12, pacfs(k - 1).toDouble / 1.0e12)
    }
    s.createDataFrame(rows).toDF("lag", "rho", "pacf").orderBy("lag")
  }

  /** Half-even division with an EXPRESSION denominator (the walk
    * denominators are columns, not literals). den must be positive —
    * true for the ACF variance and the 1−Σφρ innovation term of any
    * non-degenerate series. */
  private def divHESql(n: String, den: String): String = {
    def pos(m: String) =
      s"(($m) // ($den) + (case when (($m) % ($den)) * 2 > ($den) then 1 " +
        s"when (($m) % ($den)) * 2 = ($den) then ((($m) // ($den))) % 2 " +
        s"else 0 end))"
    s"(case when ($n) < 0 then -${pos(s"-($n)")} else ${pos(n)} end)"
  }

  private def pacfOracle: String = {
    val mul = (a: String, b: String) => divHESql(s"($a) * ($b)", R.toString)
    val rCols = (1 to pLags).map(k => s"r$k").mkString(", ")
    val lagCtes = (1 to pLags).map { k =>
      s"""c$k AS (
         |  SELECT sum(a.x * b.x) AS c, sum(a.x) AS sh, sum(b.x) AS st
         |  FROM s a JOIN s b ON b.idx = a.idx + $k)""".stripMargin
    }.mkString(",\n")
    val rhoExprs = (1 to pLags).map { k =>
      val num = s"base.n * base.n * c$k.c - base.n * base.sv" +
        s" * (c$k.sh + c$k.st) + (base.n - $k) * base.sv * base.sv"
      val dn = "base.n * base.n * base.sxx - base.n * base.sv * base.sv"
      s"${divHESql(s"($num) * $R", dn)} AS r$k"
    }.mkString(",\n       ")
    val fromLags = "base, " + (1 to pLags).map(k => s"c$k").mkString(", ")
    val dlCtes = (2 to pLags).map { k =>
      val carryP = (1 until k).map(j => s"p${k - 1}_$j") ++
        (1 until k).map(j => s"p${j}_$j").distinct
      val carry = (carryP.distinct ++ (1 to pLags).map(j => s"r$j"))
        .mkString(", ")
      val num = s"r$k - (" + (1 until k)
        .map(j => mul(s"p${k - 1}_$j", s"r${k - j}")).mkString(" + ") + ")"
      val dn = s"$R - (" + (1 until k)
        .map(j => mul(s"p${k - 1}_$j", s"r$j")).mkString(" + ") + ")"
      val updates = (1 until k).map { j =>
        s"p${k - 1}_$j - ${mul(s"p${k}_$k", s"p${k - 1}_${k - j}")} AS p${k}_$j"
      }.mkString(",\n         ")
      s"""dl${k}a AS (
         |  SELECT $carry, ${divHESql(s"($num) * $R", dn)} AS p${k}_$k
         |  FROM dl${k - 1}),
         |dl$k AS (
         |  SELECT $carry, p${k}_$k,
         |         $updates
         |  FROM dl${k}a)""".stripMargin
    }.mkString(",\n")
    val outs = (1 to pLags).map { k =>
      s"SELECT $k AS lag, CAST(r$k AS DOUBLE) / 1.0e12 AS rho," +
        s" CAST(p${k}_$k AS DOUBLE) / 1.0e12 AS pacf FROM dl$pLags"
    }.mkString("\nUNION ALL\n")
    s"""WITH dd AS (
       |  SELECT o_orderdate AS day,
       |         sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
       |             AS BIGINT) // 100000) AS r
       |  FROM orders GROUP BY 1),
       |s AS (SELECT row_number() OVER (ORDER BY day) AS idx,
       |             CAST(r AS HUGEINT) AS x FROM dd),
       |base AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sv,
       |                sum(x * x) AS sxx FROM s),
       |$lagCtes,
       |rhos AS MATERIALIZED (
       |  SELECT $rhoExprs
       |  FROM $fromLags),
       |dl1 AS (SELECT r1 AS p1_1, $rCols FROM rhos),
       |$dlCtes
       |$outs
       |ORDER BY lag""".stripMargin
  }

  // ×1e6 integer log-probability literals for the fixed 2-state HMM —
  // computed offline, NOT at runtime (ln across engines drifts a ULP;
  // literals cannot): A = [[.9,.1],[.1,.9]], B(high|H)=.7, B(high|L)=.3,
  // π = [.5,.5]
  private val LnStay = -105361L // ln(0.9)·1e6
  private val LnSwitch = -2302585L // ln(0.1)·1e6
  private val LnHiH = -356675L // ln(0.7)·1e6
  private val LnLoH = -1203973L // ln(0.3)·1e6
  private val LnInit = -693147L // ln(0.5)·1e6

  /** 2-state HMM regime decoding [N] (Viterbi — the volatility/demand
    * regime detector): observation = daily revenue above/below its
    * lower median (SF-invariant), fixed transition/emission
    * parameters whose LOG-probabilities are ×10⁶ integer LITERALS —
    * the whole Viterbi recursion is integer max-plus arithmetic
    * (δ'_j = max_i(δ_i + a_ij) + b_j(y)), ties broken toward state H,
    * so the decoded path is bit-identical by construction with zero
    * runtime transcendentals. Forward pass + backtrace run driver-side
    * over the calendar-bounded series (the `ts_holt_linear` walk
    * precedent); the oracle replays BOTH passes as recursive CTEs
    * (forward with backpointers, then a backward walk). */
  private def hmmViterbi(s: SparkSession, d: String): DataFrame = {
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)" +
          " div 100000")).as("r"))
      .orderBy("day")
      .collect()
    val rs = days.map(_.getAs[Long]("r"))
    val sorted = rs.sorted
    val med = sorted((rs.length - 1) / 2) // lower median
    val obs = rs.map(r => if (r > med) 1 else 0)
    // forward: δ(H), δ(L) + backpointers
    val n = obs.length
    val bpH = new Array[Int](n); val bpL = new Array[Int](n)
    var dH = LnInit + (if (obs(0) == 1) LnHiH else LnLoH)
    var dL = LnInit + (if (obs(0) == 1) LnLoH else LnHiH)
    for (t <- 1 until n) {
      val fromHtoH = dH + LnStay; val fromLtoH = dL + LnSwitch
      val fromHtoL = dH + LnSwitch; val fromLtoL = dL + LnStay
      // ties prefer H (the lower state index) — mirrored in the oracle
      val (nH, bh) =
        if (fromHtoH >= fromLtoH) (fromHtoH, 0) else (fromLtoH, 1)
      val (nL, bl) =
        if (fromHtoL >= fromLtoL) (fromHtoL, 0) else (fromLtoL, 1)
      bpH(t) = bh; bpL(t) = bl
      dH = nH + (if (obs(t) == 1) LnHiH else LnLoH)
      dL = nL + (if (obs(t) == 1) LnLoH else LnHiH)
    }
    // backtrace
    val states = new Array[Int](n)
    states(n - 1) = if (dH >= dL) 0 else 1
    for (t <- n - 1 to 1 by -1)
      states(t - 1) = if (states(t) == 0) bpH(t) else bpL(t)
    val out = days.zipWithIndex.map { case (row, i) =>
      (row.getAs[java.time.LocalDateTime]("day"), rs(i), obs(i),
        if (states(i) == 0) "H" else "L")
    }
    s.createDataFrame(out.toSeq).toDF("day", "r", "obs", "regime")
      .orderBy("day")
  }

  /** The oracle carries the two SURVIVOR PATHS ('H'/'L' strings) through
    * ONE forward recursion instead of a second backtrace recursion — a
    * recursive CTE referencing another recursive CTE is inlined by
    * DuckDB and re-runs the whole forward pass per backward step
    * (measured: minutes at 2.4k days). Survivor-path Viterbi is
    * algebraically identical to backpointer+backtrace under the same
    * tie-breaks. */
  private def hmmViterbiOracle: String =
    s"""WITH RECURSIVE dd AS MATERIALIZED (
       |  SELECT o_orderdate AS day,
       |         sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
       |             AS BIGINT) // 100000) AS r
       |  FROM orders GROUP BY 1),
       |med AS (
       |  SELECT min(r) AS med FROM (
       |    SELECT r, sum(cnt) OVER (ORDER BY r
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, t
       |    FROM (SELECT r, count(*) AS cnt FROM dd GROUP BY r),
       |         (SELECT count(*) AS t FROM dd))
       |  WHERE cum >= (t + 1) // 2),
       |s AS MATERIALIZED (
       |  SELECT day, r,
       |         CASE WHEN r > med.med THEN 1 ELSE 0 END AS obs,
       |         CAST(row_number() OVER (ORDER BY day) AS INTEGER) AS idx
       |  FROM dd, med),
       |fwd(i, dh, dl, ph, pl) AS (
       |  SELECT 1,
       |         $LnInit + CASE WHEN obs = 1 THEN $LnHiH ELSE $LnLoH END,
       |         $LnInit + CASE WHEN obs = 1 THEN $LnLoH ELSE $LnHiH END,
       |         CAST('H' AS VARCHAR), CAST('L' AS VARCHAR)
       |  FROM s WHERE idx = 1
       |  UNION ALL
       |  SELECT w.i + 1,
       |         greatest(w.dh + $LnStay, w.dl + $LnSwitch)
       |           + CASE WHEN m.obs = 1 THEN $LnHiH ELSE $LnLoH END,
       |         greatest(w.dh + $LnSwitch, w.dl + $LnStay)
       |           + CASE WHEN m.obs = 1 THEN $LnLoH ELSE $LnHiH END,
       |         (CASE WHEN w.dh + $LnStay >= w.dl + $LnSwitch
       |               THEN w.ph ELSE w.pl END) || 'H',
       |         (CASE WHEN w.dh + $LnSwitch >= w.dl + $LnStay
       |               THEN w.ph ELSE w.pl END) || 'L'
       |  FROM fwd w JOIN s m ON m.idx = w.i + 1),
       |best AS (
       |  SELECT CASE WHEN dh >= dl THEN ph ELSE pl END AS path
       |  FROM fwd, (SELECT max(idx) AS n FROM s) nm WHERE fwd.i = nm.n)
       |SELECT s.day, CAST(s.r AS BIGINT) AS r, s.obs,
       |       substr(best.path, s.idx, 1) AS regime
       |FROM s, best
       |ORDER BY s.day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_pacf" -> pacf,
    "ts_hmm_viterbi" -> hmmViterbi)

  def oracles: Map[String, String] = Map(
    "ts_pacf" -> pacfOracle,
    "ts_hmm_viterbi" -> hmmViterbiOracle)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Extended statistics operators [N]: survey raking (IPF), changepoint
  * detection, Hoeffding bounds, the runs test, and ABC classification.
  *
  * IPF (Deming & Stephan 1940) is the survey-weighting workhorse:
  * rescale the observed
  * (priority × status) contingency table until its margins match
  * target margins (uniform here: total/5 per priority row, total/3 per
  * status column). Three full row+column rounds with every scaled cell
  * re-pinned at 6dp and every margin summed as decimal(24,12) — the
  * `graph_pagerank` pinned-fixpoint discipline on a 2-D problem. The
  * pin is 6dp (not the usual 12) because the cells are COUNT-scale: a
  * 12dp grid sits below the double ULP at magnitude ~10³⁺, where the
  * two engines' round-even implementations stop agreeing — the pin
  * precision must stay coarser than ULP at the value's magnitude
  * (measured: 12dp drifted 10/15 cells at sf0.01).
  *
  * Scale shape: ONE data-scale hash agg builds the 15-cell table; the
  * iteration is entirely domain-sized (broadcast margin joins). A
  * production rake over billions of rows has exactly this decomposition
  * — the data is touched once, the fit runs on the margins. */
object StatsExtra extends graft.QueryModule {

  private val ipfRounds = 3

  private def ipf(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = cells.agg(sum(col("n")).as("t")).collect().head.getLong(0)
    val rowTarget = tot.toDouble / 5.0
    val colTarget = tot.toDouble / 3.0
    var w = cells.select(col("p"), col("c"), col("n"),
      col("n").cast("double").as("w"))
    for (_ <- 1 to ipfRounds) {
      val rows = w.groupBy(col("p"))
        .agg(sum(col("w").cast("decimal(24,12)")).as("rs"))
      val afterRow = w.join(broadcast(rows), "p")
        .select(col("p"), col("c"), col("n"),
          bround(col("w") * (lit(rowTarget) / col("rs").cast("double")), 6)
            .as("w"))
      val cols = afterRow.groupBy(col("c"))
        .agg(sum(col("w").cast("decimal(24,12)")).as("cs"))
      w = afterRow.join(broadcast(cols), "c")
        .select(col("p"), col("c"), col("n"),
          bround(col("w") * (lit(colTarget) / col("cs").cast("double")), 6)
            .as("w"))
        .localCheckpoint()
    }
    w.select(col("p"), col("c"), col("n"),
      col("w").as("weight"),
      bround(col("w") / col("n").cast("double"), 8).as("rake_factor"))
      .orderBy("p", "c")
  }

  private def ipfOracle: String = {
    val steps = (1 to ipfRounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT w.p, w.c, w.n,
         |         round_even(w.w * (tt.t / 5.0 / CAST(m.rs AS DOUBLE)), 6) AS w
         |  FROM w${k - 1} w
         |  JOIN (SELECT p, sum(CAST(w AS DECIMAL(24,12))) AS rs
         |        FROM w${k - 1} GROUP BY p) m ON w.p = m.p
         |  CROSS JOIN tt),
         |w$k AS MATERIALIZED (
         |  SELECT r.p, r.c, r.n,
         |         round_even(r.w * (tt.t / 3.0 / CAST(m.cs AS DOUBLE)), 6) AS w
         |  FROM r$k r
         |  JOIN (SELECT c, sum(CAST(w AS DECIMAL(24,12))) AS cs
         |        FROM r$k GROUP BY c) m ON r.c = m.c
         |  CROSS JOIN tt)""".stripMargin
    }.mkString(",\n")
    s"""WITH cells AS MATERIALIZED (
       |  SELECT o_orderpriority AS p, o_orderstatus AS c, count(*) AS n
       |  FROM orders GROUP BY 1, 2),
       |tt AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM cells),
       |w0 AS MATERIALIZED (
       |  SELECT p, c, n, CAST(n AS DOUBLE) AS w FROM cells),
       |$steps
       |SELECT p, c, CAST(n AS BIGINT) AS n, w AS weight,
       |       round_even(w / CAST(n AS DOUBLE), 8) AS rake_factor
       |FROM w$ipfRounds ORDER BY p, c""".stripMargin
  }

  /** Single-changepoint detection [N] (binary segmentation, first
    * split — Scott & Knott / PELT's inner step): over daily revenue in
    * exact $1000 units, choose the split day k maximizing the
    * between-segment explained sum S₁²/n₁ + S₂²/n₂ (equivalent to
    * minimizing within-segment SSE). Prefix sums run over the
    * CALENDAR-BOUNDED day domain; every score input is an exact
    * BIGINT (revenue bins keep S² < 2⁵³, double-exact), so both
    * engines compute IEEE-identical scores and the argmax (day
    * tie-break) is deterministic with no pinning at all. */
  private def changepoint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr(
        "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 100000"
      )).as("r"), count(lit(1)).as("m"))
    val wPre = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = days
      .withColumn("s1", sum(col("r")).over(wPre))
      .withColumn("n1", sum(col("m")).over(wPre))
    val tot = days.agg(sum(col("r")).as("st"), sum(col("m")).as("nt"))
    val dd = (c: org.apache.spark.sql.Column) => c.cast("double")
    val scored = pre.crossJoin(broadcast(tot))
      .filter(col("n1") < col("nt")) // a split must leave a right segment
      .select(col("day"),
        (dd(col("s1")) * dd(col("s1")) / dd(col("n1")) +
          dd(col("st") - col("s1")) * dd(col("st") - col("s1")) /
            dd(col("nt") - col("n1"))).as("score"),
        (dd(col("s1")) / dd(col("n1"))).as("mean_left"),
        (dd(col("st") - col("s1")) / dd(col("nt") - col("n1"))).as("mean_right"),
        col("n1"), (col("nt") - col("n1")).as("n2"))
    scored.orderBy(col("score").desc, col("day")).limit(1)
  }

  private val changepointOracle =
    """WITH days AS (
      |  SELECT o_orderdate AS day,
      |         CAST(sum((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 100000) AS BIGINT) AS r,
      |         count(*) AS m
      |  FROM orders GROUP BY 1),
      |pre AS (
      |  SELECT day, r, m,
      |         CAST(sum(r) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
      |         CAST(sum(m) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1
      |  FROM days),
      |tot AS (SELECT CAST(sum(r) AS BIGINT) AS st, CAST(sum(m) AS BIGINT) AS nt FROM days),
      |scored AS (
      |  SELECT day,
      |         CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |           + CAST(st - s1 AS DOUBLE) * CAST(st - s1 AS DOUBLE)
      |             / CAST(nt - n1 AS DOUBLE) AS score,
      |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_left,
      |         CAST(st - s1 AS DOUBLE) / CAST(nt - n1 AS DOUBLE) AS mean_right,
      |         n1, nt - n1 AS n2
      |  FROM pre, tot WHERE n1 < nt)
      |SELECT * FROM scored ORDER BY score DESC, day LIMIT 1""".stripMargin

  /** Distribution-free mean confidence bounds [N] — Hoeffding's
    * inequality per segment: the fulfilled-rate estimate ±
    * √(ln(2/δ)/(2n)) at δ = 0.05, with ln(2/δ) a pinned 9dp literal
    * (no runtime transcendental; sqrt is IEEE-exact). The
    * anytime-bound companion to `stats_sprt` — what a metrics
    * dashboard shows when it cannot assume normality. One conditional
    * hash agg into the 5-segment domain. */
  private def hoeffdingCi(s: SparkSession, d: String): DataFrame = {
    val ln2OverDelta = 3.688879454 // ln(2 / 0.05), pinned
    val dd = (c: org.apache.spark.sql.Column) => c.cast("double")
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("pos"))
      .withColumn("rate", dd(col("pos")) / dd(col("n")))
      .withColumn("hw", sqrt(lit(ln2OverDelta) / (lit(2.0) * dd(col("n")))))
      .select(col("g"), col("n"), col("rate"),
        greatest(col("rate") - col("hw"), lit(0.0)).as("lo"),
        least(col("rate") + col("hw"), lit(1.0)).as("hi"))
      .orderBy("g")
  }

  private val hoeffdingOracle =
    """WITH a AS (
      |  SELECT o_orderpriority AS g, count(*) AS n,
      |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT g, n,
      |         CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
      |         sqrt(3.688879454 / (2.0 * CAST(n AS DOUBLE))) AS hw
      |  FROM a)
      |SELECT g, n, rate,
      |       greatest(rate - hw, CAST(0.0 AS DOUBLE)) AS lo,
      |       least(rate + hw, CAST(1.0 AS DOUBLE)) AS hi
      |FROM r ORDER BY g""".stripMargin

  /** Wald-Wolfowitz runs test [N] — is daily revenue's above/below-
    * median sequence random, or does it trend/cluster? The sign
    * threshold is the exact integer revenue median over the day
    * domain (LOWER median — `stats_mad_outliers`' convention), runs
    * are counted by a lag window over the same bounded domain, and
    * the normal-approximation z assembles from exact counts in
    * mirrored IEEE order (one sqrt, no transcendentals). */
  private def runsTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = (c: org.apache.spark.sql.Column) => c.cast("double")
    val days = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(expr(
        "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 100000"
      )).as("r"))
    val med = days.select(col("r"))
      .withColumn("rk", row_number().over(Window.orderBy(col("r"))))
      .crossJoin(broadcast(days.agg(count(lit(1)).as("nd"))))
      .filter(col("rk") === expr("(nd + 1) div 2"))
      .select(col("r").as("median"))
    val signed = days.crossJoin(broadcast(med))
      .filter(col("r") =!= col("median")) // ties at the median drop out
      .select(col("day"), (col("r") > col("median")).as("up"))
    val wLag = Window.orderBy(col("day"))
    val agg = signed
      .withColumn("prev", lag(col("up"), 1).over(wLag))
      .select(
        when(col("prev").isNull || col("prev") =!= col("up"), 1L)
          .otherwise(0L).as("newrun"),
        when(col("up"), 1L).otherwise(0L).as("isup"))
      .agg(sum(col("newrun")).as("runs"), sum(col("isup")).as("n1"),
        sum(lit(1L) - col("isup")).as("n2"))
    agg.select(col("runs"), col("n1"), col("n2"),
      // E[R] = 1 + 2 n1 n2 / (n1+n2); Var = (E-1)(E-2)/(n1+n2-1)
      (lit(1.0) + lit(2.0) * dd(col("n1")) * dd(col("n2")) /
        dd(col("n1") + col("n2"))).as("expected"))
      .withColumn("z",
        (dd(col("runs")) - col("expected")) /
          sqrt((col("expected") - lit(1.0)) * (col("expected") - lit(2.0)) /
            dd(col("n1") + col("n2") - 1)))
  }

  private val runsTestOracle =
    """WITH days AS (
      |  SELECT o_orderdate AS day,
      |         CAST(sum((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 100000) AS BIGINT) AS r
      |  FROM orders GROUP BY 1),
      |med AS (
      |  SELECT r AS median FROM (
      |    SELECT r, row_number() OVER (ORDER BY r) AS rk FROM days),
      |    (SELECT count(*) AS nd FROM days)
      |  WHERE rk = (nd + 1) // 2),
      |signed AS (
      |  SELECT day, r > median AS up FROM days, med WHERE r <> median),
      |lagged AS (
      |  SELECT up, lag(up, 1) OVER (ORDER BY day) AS prev FROM signed),
      |agg AS (
      |  SELECT CAST(sum(CASE WHEN prev IS NULL OR prev <> up THEN 1 ELSE 0 END) AS BIGINT) AS runs,
      |         CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2
      |  FROM lagged),
      |e AS (
      |  SELECT runs, n1, n2,
      |         1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |           / CAST(n1 + n2 AS DOUBLE) AS expected
      |  FROM agg)
      |SELECT runs, n1, n2, expected,
      |       (CAST(runs AS DOUBLE) - expected)
      |         / sqrt((expected - 1.0) * (expected - 2.0)
      |                / CAST(n1 + n2 - 1 AS DOUBLE)) AS z
      |FROM e""".stripMargin

  /** ABC (Pareto) classification [N] — the inventory-analytics
    * classic: parts ranked by revenue; A = the head covering 80% of
    * cumulative revenue, B = the next 15%, C = the tail. Class
    * boundaries are EXACT integer comparisons (cum·100 vs share·total
    * — no float thresholds); cumulative sums run over the part-domain
    * ranking window. */
  private def abcAnalysis(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")).as("rev"))
    val tot = parts.agg(sum(col("rev")).as("tr"))
    val w = Window.orderBy(col("rev").desc, col("pk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("cum", sum(col("rev")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("pk"), col("rev"),
        when(col("cum") * 100 <= col("tr") * 80, "A")
          .when(col("cum") * 100 <= col("tr") * 95, "B")
          .otherwise("C").as("abc_class"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("revenue"))
      .orderBy("abc_class")
  }

  private val abcOracle =
    """WITH parts AS (
      |  SELECT l_partkey AS pk,
      |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS tr FROM parts),
      |c AS (
      |  SELECT pk, rev,
      |         CAST(sum(rev) OVER (ORDER BY rev DESC, pk
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM parts),
      |labeled AS (
      |  SELECT pk, rev,
      |         CASE WHEN cum * 100 <= tr * 80 THEN 'A'
      |              WHEN cum * 100 <= tr * 95 THEN 'B'
      |              ELSE 'C' END AS abc_class
      |  FROM c, tot)
      |SELECT abc_class, count(*) AS n_parts,
      |       CAST(sum(rev) AS BIGINT) AS revenue
      |FROM labeled GROUP BY 1 ORDER BY abc_class""".stripMargin

  /** Mutual information [N] between order priority and status — the
    * dependency measure `agg_chisq` tests for, as an information
    * quantity: MI = ΣΣ p_ij·ln(p_ij/(p_i·p_j)) with margin entropies
    * and the normalized MI (mi / min(H_row, H_col)). Every ln pins at
    * 6dp, every cell term re-pins at 12dp and sums as decimal(24,12);
    * one hash agg into the 15-cell domain + a 1-row total. */
  private def mutualInfo(s: SparkSession, d: String): DataFrame = {
    val dd = (c: org.apache.spark.sql.Column) => c.cast("double")
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rows = cells.groupBy(col("p")).agg(sum(col("n")).as("rn"))
    val cols = cells.groupBy(col("c")).agg(sum(col("n")).as("cn"))
    val tot = cells.agg(sum(col("n")).as("t"))
    val mi = cells
      .join(broadcast(rows), "p").join(broadcast(cols), "c")
      .crossJoin(broadcast(tot))
      .select(bround((dd(col("n")) / dd(col("t"))) *
        bround(log((dd(col("n")) * dd(col("t"))) /
          (dd(col("rn")) * dd(col("cn")))), 6), 12)
        .cast("decimal(24,12)").as("term"))
      .agg(bround(dd(sum(col("term"))), 8).as("mi"))
    def entropy(margin: DataFrame, cnt: String): DataFrame = margin
      .crossJoin(broadcast(tot))
      .select(bround((dd(col(cnt)) / dd(col("t"))) *
        bround(log(dd(col(cnt)) / dd(col("t"))), 6), 12)
        .cast("decimal(24,12)").as("term"))
      .agg(bround(-dd(sum(col("term"))), 8).as("h"))
    val hr = entropy(rows, "rn").withColumnRenamed("h", "h_row")
    val hc = entropy(cols, "cn").withColumnRenamed("h", "h_col")
    mi.crossJoin(broadcast(hr)).crossJoin(broadcast(hc))
      .withColumn("nmi", bround(col("mi") / least(col("h_row"), col("h_col")), 8))
  }

  private val mutualInfoOracle =
    """WITH cells AS MATERIALIZED (
      |  SELECT o_orderpriority AS p, o_orderstatus AS c, count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |rows_m AS (SELECT p, CAST(sum(n) AS BIGINT) AS rn FROM cells GROUP BY p),
      |cols_m AS (SELECT c, CAST(sum(n) AS BIGINT) AS cn FROM cells GROUP BY c),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells),
      |mi AS (
      |  SELECT round_even(CAST(sum(CAST(round_even(
      |           (CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
      |           * round_even(ln((CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
      |                           / (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE))), 6),
      |           12) AS DECIMAL(24,12))) AS DOUBLE), 8) AS mi
      |  FROM cells JOIN rows_m USING (p) JOIN cols_m USING (c), tot),
      |hr AS (
      |  SELECT round_even(-CAST(sum(CAST(round_even(
      |           (CAST(rn AS DOUBLE) / CAST(t AS DOUBLE))
      |           * round_even(ln(CAST(rn AS DOUBLE) / CAST(t AS DOUBLE)), 6),
      |           12) AS DECIMAL(24,12))) AS DOUBLE), 8) AS h_row
      |  FROM rows_m, tot),
      |hc AS (
      |  SELECT round_even(-CAST(sum(CAST(round_even(
      |           (CAST(cn AS DOUBLE) / CAST(t AS DOUBLE))
      |           * round_even(ln(CAST(cn AS DOUBLE) / CAST(t AS DOUBLE)), 6),
      |           12) AS DECIMAL(24,12))) AS DOUBLE), 8) AS h_col
      |  FROM cols_m, tot)
      |SELECT mi, h_row, h_col,
      |       round_even(mi / least(h_row, h_col), 8) AS nmi
      |FROM mi, hr, hc""".stripMargin

  /** IPF's margins after the final column step: columns match the
    * target EXACTLY (the last step scaled them); rows are near-target
    * (IPF converges geometrically). Spec asserts both. */
  /** Lincoln-Petersen / Chapman capture-recapture [N] — the coverage
    * estimator a dedup pipeline uses to judge how much of the true
    * population two overlapping samples saw: capture 1 = customers
    * ordering in 1996, capture 2 = in 1997, recaptures = both. Chapman
    * N̂ = (n1+1)(n2+1)/(m+1) − 1 with its variance, both single
    * mirrored expressions of exact counts; the true distinct-customer
    * count rides along so the spec can pin estimator quality. */
  private def captureRecapture(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(when(year(col("o_orderdate")) === 1996, 1).otherwise(0))
        .as("c1"),
        max(when(year(col("o_orderdate")) === 1997, 1).otherwise(0))
          .as("c2"))
    per.agg(count(lit(1)).as("n_true"),
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * col("c2")).as("m"))
      .select(col("n_true"), col("n1"), col("n2"), col("m"),
        (dd((col("n1") + 1) * (col("n2") + 1)) / dd(col("m") + 1) -
          lit(1.0)).as("chapman"),
        (dd((col("n1") + 1) * (col("n2") + 1)) *
          dd((col("n1") - col("m")) * (col("n2") - col("m"))) /
          (dd((col("m") + 1) * (col("m") + 1)) * dd(col("m") + 2)))
          .as("variance"))
  }

  private def captureRecaptureOracle: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |         max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
      |           AS c1,
      |         max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END)
      |           AS c2
      |  FROM orders GROUP BY 1),
      |agg AS (
      |  SELECT count(*) AS n_true, sum(c1) AS n1, sum(c2) AS n2,
      |         sum(c1 * c2) AS m
      |  FROM per)
      |SELECT CAST(n_true AS BIGINT) AS n_true, CAST(n1 AS BIGINT) AS n1,
      |       CAST(n2 AS BIGINT) AS n2, CAST(m AS BIGINT) AS m,
      |       CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE)
      |         - 1.0 AS chapman,
      |       CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
      |         * CAST((n1 - m) * (n2 - m) AS DOUBLE)
      |         / (CAST((m + 1) * (m + 1) AS DOUBLE)
      |            * CAST(m + 2 AS DOUBLE)) AS variance
      |FROM agg""".stripMargin

  /** Two-proportion z-test [N] (pooled): fulfilled-order rate of the
    * URGENT priorities vs the rest. Counts exact; z is one mirrored
    * expression (pooled p̂, single sqrt). The proportions companion to
    * `stats_welch_ttest`. */
  private def propZtest(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val flag = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
      .otherwise(0)
    val pos = when(col("o_orderstatus") === "F", 1L).otherwise(0L)
    Tables.orders(s, d)
      .select(flag.as("g"), pos.as("y"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      .agg(
        sum(when(col("g") === 1, col("n")).otherwise(0L)).as("n1"),
        sum(when(col("g") === 1, col("k")).otherwise(0L)).as("k1"),
        sum(when(col("g") === 0, col("n")).otherwise(0L)).as("n2"),
        sum(when(col("g") === 0, col("k")).otherwise(0L)).as("k2"))
      .select(col("n1"), col("k1"), col("n2"), col("k2"),
        ((dd(col("k1")) / dd(col("n1")) - dd(col("k2")) / dd(col("n2"))) /
          sqrt(dd(col("k1") + col("k2")) / dd(col("n1") + col("n2")) *
            (lit(1.0) - dd(col("k1") + col("k2")) /
              dd(col("n1") + col("n2"))) *
            (lit(1.0) / dd(col("n1")) + lit(1.0) / dd(col("n2")))))
          .as("z"))
  }

  private def propZtestOracle: String =
    """WITH g AS (
      |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |              THEN 1 ELSE 0 END AS g,
      |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |per AS (SELECT g, count(*) AS n, sum(y) AS k FROM g GROUP BY g),
      |agg AS (
      |  SELECT sum(CASE WHEN g = 1 THEN n ELSE 0 END) AS n1,
      |         sum(CASE WHEN g = 1 THEN k ELSE 0 END) AS k1,
      |         sum(CASE WHEN g = 0 THEN n ELSE 0 END) AS n2,
      |         sum(CASE WHEN g = 0 THEN k ELSE 0 END) AS k2
      |  FROM per)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
      |       CAST(n2 AS BIGINT) AS n2, CAST(k2 AS BIGINT) AS k2,
      |       (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |        - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
      |       / sqrt(CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
      |              * (1.0 - CAST(k1 + k2 AS DOUBLE)
      |                 / CAST(n1 + n2 AS DOUBLE))
      |              * (1.0 / CAST(n1 AS DOUBLE)
      |                 + 1.0 / CAST(n2 AS DOUBLE))) AS z
      |FROM agg""".stripMargin

  /** Jarque–Bera normality test [N] (Jarque & Bera 1980) per order
    * priority — the moment-based normality screen a reporting layer
    * runs before trusting z-intervals: JB = n/6·(S² + K²/4) from the
    * sample skewness S and EXCESS kurtosis K, vs χ²₂ at 5% (5.991).
    * Reuses `agg_skewkurt`'s exact-power-sum discipline verbatim: the
    * value lands on the integer grid (totalprice in $1000 units,
    * centered at 250), all four power sums are exact decimals, and the
    * moment assembly is one mirrored double expression per column.
    * Scale shape: ONE hash agg over the fact scan into the 5-row
    * priority domain; everything after is constant work. */
  private def jarqueBera(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val agg = Tables.orders(s, d)
      .select(col("o_orderpriority"), cents.as("cents"))
      .select(col("o_orderpriority"),
        (expr("cents div 100000") - lit(250L)).as("y"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("y")).cast("double").as("s1"),
        sum((col("y") * col("y")).cast("decimal(38,0)"))
          .cast("double").as("s2"),
        sum((col("y") * col("y") * col("y")).cast("decimal(38,0)"))
          .cast("double").as("s3"),
        sum((col("y") * col("y") * col("y") * col("y")).cast("decimal(38,0)"))
          .cast("double").as("s4"))
    agg
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("m2",
        col("s2") / col("n") - col("mean") * col("mean"))
      .withColumn("skew",
        (col("s3") / col("n") - lit(3.0) * col("mean") * (col("s2") / col("n")) +
          lit(2.0) * col("mean") * col("mean") * col("mean")) /
          (col("m2") * sqrt(col("m2"))))
      .withColumn("kurt",
        (col("s4") / col("n") - lit(4.0) * col("mean") * (col("s3") / col("n")) +
          lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n")) -
          lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean")) /
          (col("m2") * col("m2")) - lit(3.0))
      .withColumn("jb",
        col("n") / lit(6.0) *
          (col("skew") * col("skew") + col("kurt") * col("kurt") / lit(4.0)))
      .select(col("o_orderpriority"), col("n").cast("bigint").as("n"),
        col("skew"), col("kurt"), col("jb"),
        (col("jb") > lit(5.991)).as("reject_normal"))
      .orderBy("o_orderpriority")
  }

  private def jarqueBeraOracle: String =
    """WITH y AS (
      |  SELECT o_orderpriority,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 100000 - 250 AS y
      |  FROM orders),
      |a AS (
      |  SELECT o_orderpriority,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS s1,
      |         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS s2,
      |         CAST(sum(CAST(y AS HUGEINT) * y * y) AS DOUBLE) AS s3,
      |         CAST(sum(CAST(y AS HUGEINT) * y * y * y) AS DOUBLE) AS s4
      |  FROM y GROUP BY 1),
      |m AS (
      |  SELECT o_orderpriority, n, s1 / n AS mean, s2, s3, s4,
      |         s2 / n - (s1 / n) * (s1 / n) AS m2
      |  FROM a),
      |sk AS (
      |  SELECT o_orderpriority, n, m2,
      |         (s3 / n - 3.0 * mean * (s2 / n)
      |            + 2.0 * mean * mean * mean) / (m2 * sqrt(m2)) AS skew,
      |         (s4 / n - 4.0 * mean * (s3 / n)
      |            + 6.0 * mean * mean * (s2 / n)
      |            - 3.0 * mean * mean * mean * mean) / (m2 * m2) - 3.0 AS kurt
      |  FROM m),
      |j AS (
      |  SELECT o_orderpriority, n, skew, kurt,
      |         n / 6.0 * (skew * skew + kurt * kurt / 4.0) AS jb
      |  FROM sk)
      |SELECT o_orderpriority, CAST(n AS BIGINT) AS n, skew, kurt, jb,
      |       jb > 5.991 AS reject_normal
      |FROM j ORDER BY o_orderpriority""".stripMargin

  /** CUPED variance reduction [N] (Deng, Xu, Kohavi & Walker 2013) —
    * the standard experimentation trick: adjust the experiment-period
    * metric Y by the PRE-period covariate X, Ŷ = Y − θ(X − X̄), with
    * θ = cov(X,Y)/var(X) fit on the POOLED population (both variants,
    * the unbiasedness requirement). Events before Jan 16 are the
    * pre-period, after are the experiment; variant = user_id % 2 (the
    * deterministic split `text_split_assign` also uses). Everything
    * reduces to exact per-user cent sums, then exact per-variant power
    * sums; θ and the adjusted means/variances assemble in mirrored
    * doubles — var(Ŷ) = (Σy² − 2θΣxy + θ²Σx² − n(ȳ − θx̄)²)/(n−1)
    * needs NO second data pass (the `fin_cointegration` SSE expansion).
    *
    * Scale shape: one fact-scan hash agg per user (the experiment-unit
    * domain), one hash agg per variant (2 rows), a 1-row pooled-θ
    * broadcast crossJoin. At 100 TB the per-user agg is the only
    * data-scale stage and it map-side combines. */
  private def cuped(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val dec38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cents = expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
    val perUser = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("user_id"), cents.as("v"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).as("pre"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("v")).otherwise(0L)).as("y"))
    val perVariant = perUser
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec38(col("x")) * dec38(col("y"))).as("sxy"),
        sum(dec38(col("x")) * dec38(col("x"))).as("sxx"),
        sum(dec38(col("y")) * dec38(col("y"))).as("syy"))
      .localCheckpoint()
    val pooled = perVariant.agg(
      sum(col("n")).as("np"), sum(col("sx")).as("sxp"),
      sum(col("sy")).as("syp"), sum(col("sxy")).as("sxyp"),
      sum(col("sxx")).as("sxxp"))
      .select(
        ((dd(col("np")) * dd(col("sxyp")) - dd(col("sxp")) * dd(col("syp"))) /
          (dd(col("np")) * dd(col("sxxp")) - dd(col("sxp")) * dd(col("sxp"))))
          .as("theta"),
        (dd(col("sxp")) / dd(col("np"))).as("xbar"))
    perVariant.crossJoin(broadcast(pooled))
      .select(col("variant"), col("n"), col("theta"),
        (dd(col("sy")) / dd(col("n"))).as("mean_y"),
        (dd(col("sy")) / dd(col("n")) -
          col("theta") * (dd(col("sx")) / dd(col("n")) - col("xbar")))
          .as("mean_y_cuped"),
        ((dd(col("syy")) - dd(col("sy")) * dd(col("sy")) / dd(col("n"))) /
          dd(col("n") - 1)).as("var_y"),
        ((dd(col("syy")) - lit(2.0) * col("theta") * dd(col("sxy")) +
          col("theta") * col("theta") * dd(col("sxx")) -
          dd(col("n")) *
            (dd(col("sy")) / dd(col("n")) -
              col("theta") * dd(col("sx")) / dd(col("n"))) *
            (dd(col("sy")) / dd(col("n")) -
              col("theta") * dd(col("sx")) / dd(col("n")))) /
          dd(col("n") - 1)).as("var_y_cuped"))
      .withColumn("var_reduction",
        lit(1.0) - col("var_y_cuped") / col("var_y"))
      .orderBy("variant")
  }

  private def cupedOracle: String =
    """WITH pu AS (
      |  SELECT user_id,
      |         sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
      |             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |             ELSE 0 END) AS x,
      |         sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE
      |             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |             END) AS y
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |pv AS (
      |  SELECT user_id % 2 AS variant, count(*) AS n,
      |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |         sum(CAST(x AS HUGEINT) * y) AS sxy,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pu GROUP BY 1),
      |pool AS (
      |  SELECT (CAST(sum(n) AS DOUBLE) * CAST(sum(sxy) AS DOUBLE)
      |            - CAST(sum(sx) AS DOUBLE) * CAST(sum(sy) AS DOUBLE)) /
      |         (CAST(sum(n) AS DOUBLE) * CAST(sum(sxx) AS DOUBLE)
      |            - CAST(sum(sx) AS DOUBLE) * CAST(sum(sx) AS DOUBLE))
      |           AS theta,
      |         CAST(sum(sx) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS xbar
      |  FROM pv),
      |adj AS (
      |  SELECT variant, CAST(n AS BIGINT) AS n, theta,
      |         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
      |         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |           - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - xbar)
      |           AS mean_y_cuped,
      |         (CAST(syy AS DOUBLE)
      |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |              / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_y,
      |         (CAST(syy AS DOUBLE) - 2.0 * theta * CAST(sxy AS DOUBLE)
      |            + theta * theta * CAST(sxx AS DOUBLE)
      |            - CAST(n AS DOUBLE) *
      |              (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |                 - theta * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
      |              (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |                 - theta * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |           / CAST(n - 1 AS DOUBLE) AS var_y_cuped
      |  FROM pv CROSS JOIN pool)
      |SELECT variant, n, theta, mean_y, mean_y_cuped, var_y, var_y_cuped,
      |       1.0 - var_y_cuped / var_y AS var_reduction
      |FROM adj ORDER BY variant""".stripMargin

  /** Cohen's d / Hedges' g effect size [N] — the companion every
    * `stats_welch_ttest` report needs (significance without magnitude
    * is the classic A/B mistake): d = (m̄₁ − m̄₂)/s_pooled with the
    * pooled SD from exact per-group power sums, and the small-sample
    * bias correction g = d·(1 − 3/(4(n₁+n₂) − 9)). Groups are the
    * deterministic user_id % 2 split over event values on the cent
    * grid. One hash agg over the fact scan, a 2-row pivot, constant
    * assembly — the `stats_prop_ztest` shape. */
  private def cohensD(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val cents = expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select((col("user_id") % 2).as("g"), cents.as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("qv"))
      .agg(
        sum(when(col("g") === 0, col("n")).otherwise(0L)).as("n1"),
        sum(when(col("g") === 0, col("sv")).otherwise(0L)).as("s1"),
        sum(when(col("g") === 0, col("qv"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("q1"),
        sum(when(col("g") === 1, col("n")).otherwise(0L)).as("n2"),
        sum(when(col("g") === 1, col("sv")).otherwise(0L)).as("s2"),
        sum(when(col("g") === 1, col("qv"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("q2"))
      .select(col("n1"), col("n2"),
        (dd(col("s1")) / dd(col("n1"))).as("mean1"),
        (dd(col("s2")) / dd(col("n2"))).as("mean2"),
        (((dd(col("q1")) - dd(col("s1")) * dd(col("s1")) / dd(col("n1"))) +
          (dd(col("q2")) - dd(col("s2")) * dd(col("s2")) / dd(col("n2")))) /
          dd(col("n1") + col("n2") - 2)).as("sp2"))
      .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
        ((col("mean1") - col("mean2")) / sqrt(col("sp2"))).as("cohens_d"))
      .withColumn("hedges_g",
        col("cohens_d") *
          (lit(1.0) - lit(3.0) / (lit(4.0) * dd(col("n1") + col("n2")) - lit(9.0))))
  }

  private def cohensDOracle: String =
    """WITH v AS (
      |  SELECT user_id % 2 AS g,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |per AS (
      |  SELECT g, count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv,
      |         sum(CAST(v AS HUGEINT) * v) AS qv
      |  FROM v GROUP BY g),
      |piv AS (
      |  SELECT sum(CASE WHEN g = 0 THEN n ELSE 0 END) AS n1,
      |         sum(CASE WHEN g = 0 THEN sv ELSE 0 END) AS s1,
      |         sum(CASE WHEN g = 0 THEN qv ELSE 0 END) AS q1,
      |         sum(CASE WHEN g = 1 THEN n ELSE 0 END) AS n2,
      |         sum(CASE WHEN g = 1 THEN sv ELSE 0 END) AS s2,
      |         sum(CASE WHEN g = 1 THEN qv ELSE 0 END) AS q2
      |  FROM per),
      |m AS (
      |  SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
      |         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
      |         ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |             / CAST(n1 AS DOUBLE))
      |          + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
      |             / CAST(n2 AS DOUBLE)))
      |         / CAST(n1 + n2 - 2 AS DOUBLE) AS sp2
      |  FROM piv),
      |eff AS (
      |  SELECT n1, n2, mean1, mean2,
      |         (mean1 - mean2) / sqrt(sp2) AS cohens_d
      |  FROM m)
      |SELECT n1, n2, mean1, mean2, cohens_d,
      |       cohens_d * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0))
      |         AS hedges_g
      |FROM eff""".stripMargin

  /** Cochran–Mantel–Haenszel test [N] (Cochran 1954; Mantel & Haenszel
    * 1959) — the STRATIFIED 2×2 association test: "does the treatment
    * (deterministic custkey-parity arm) move the outcome (order status
    * F) after controlling for the stratum (order priority)?" — the
    * confounder-adjusted question a naive pooled `stats_prop_ztest`
    * gets wrong (Simpson's paradox). CMH χ²₁ = (Σ(a_k − E_k))²/ΣV_k
    * with E_k = r1·c1/n and V_k = r1·r2·c1·c2/(n²(n−1)) per stratum.
    * Each stratum's counts are exact longs; E_k and V_k are single
    * IEEE expressions pinned at 6dp into decimal(28,6) sums (count-
    * scale magnitudes — the `stats_ipf_rake` ULP lesson), so the
    * over-strata totals are order-invariant; the final statistic is
    * one mirrored double expression, plus the Mantel–Haenszel common
    * odds-ratio estimate Σ(a·d/n)/Σ(b·c/n) under the same pinning.
    * Scale shape: ONE fact-scan hash agg into the (stratum × arm ×
    * outcome) cell table (≤20 cells), constant work after. */
  private def cmh(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val cells = Tables.orders(s, d)
      .select(col("o_orderpriority").as("k"),
        pmod(col("o_custkey"), lit(2)).as("arm"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy(col("k"))
      .agg(
        sum(when(col("arm") === 0 && col("y") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("arm") === 0 && col("y") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("arm") === 1 && col("y") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("arm") === 1 && col("y") === 0, 1L).otherwise(0L)).as("dd"))
    val per = cells.select(col("k"), col("a"),
        (col("a") + col("b")).as("r1"), (col("c") + col("dd")).as("r2"),
        (col("a") + col("c")).as("c1"), (col("b") + col("dd")).as("c2"),
        (col("a") + col("b") + col("c") + col("dd")).as("n"),
        col("b"), col("c"), col("dd"))
      .select(
        bround(dd(col("a")) - dd(col("r1")) * dd(col("c1")) / dd(col("n")), 6)
          .cast("decimal(28,6)").as("dev"),
        bround(dd(col("r1")) * dd(col("r2")) * dd(col("c1")) * dd(col("c2")) /
          (dd(col("n")) * dd(col("n")) * dd(col("n") - 1)), 6)
          .cast("decimal(28,6)").as("v"),
        bround(dd(col("a")) * dd(col("dd")) / dd(col("n")), 6)
          .cast("decimal(28,6)").as("adn"),
        bround(dd(col("b")) * dd(col("c")) / dd(col("n")), 6)
          .cast("decimal(28,6)").as("bcn"))
    per.agg(count(lit(1)).as("n_strata"),
        sum(col("dev")).as("sdev"), sum(col("v")).as("sv"),
        sum(col("adn")).as("sadn"), sum(col("bcn")).as("sbcn"))
      .select(col("n_strata"),
        (dd(col("sdev")) * dd(col("sdev")) / dd(col("sv"))).as("cmh_chi2"),
        (dd(col("sadn")) / dd(col("sbcn"))).as("mh_odds_ratio"))
      .withColumn("reject_5pct", col("cmh_chi2") > lit(3.841))
  }

  private def cmhOracle: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS k,
      |         sum(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus = 'F'
      |                  THEN 1 ELSE 0 END) AS a,
      |         sum(CASE WHEN o_custkey % 2 = 0 AND o_orderstatus <> 'F'
      |                  THEN 1 ELSE 0 END) AS b,
      |         sum(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus = 'F'
      |                  THEN 1 ELSE 0 END) AS c,
      |         sum(CASE WHEN o_custkey % 2 = 1 AND o_orderstatus <> 'F'
      |                  THEN 1 ELSE 0 END) AS dd
      |  FROM orders GROUP BY 1),
      |marg AS (
      |  SELECT k, a, b, c, dd,
      |         a + b AS r1, c + dd AS r2, a + c AS c1, b + dd AS c2,
      |         a + b + c + dd AS n
      |  FROM cells),
      |per AS (
      |  SELECT
      |    CAST(round_even(CAST(a AS DOUBLE)
      |        - CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE),
      |        6) AS DECIMAL(28,6)) AS dev,
      |    CAST(round_even(CAST(r1 AS DOUBLE) * CAST(r2 AS DOUBLE)
      |        * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |           * CAST(n - 1 AS DOUBLE)), 6) AS DECIMAL(28,6)) AS v,
      |    CAST(round_even(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
      |        / CAST(n AS DOUBLE), 6) AS DECIMAL(28,6)) AS adn,
      |    CAST(round_even(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
      |        / CAST(n AS DOUBLE), 6) AS DECIMAL(28,6)) AS bcn
      |  FROM marg),
      |agg AS (
      |  SELECT count(*) AS n_strata, sum(dev) AS sdev, sum(v) AS sv,
      |         sum(adn) AS sadn, sum(bcn) AS sbcn
      |  FROM per)
      |SELECT CAST(n_strata AS BIGINT) AS n_strata,
      |       CAST(sdev AS DOUBLE) * CAST(sdev AS DOUBLE)
      |         / CAST(sv AS DOUBLE) AS cmh_chi2,
      |       CAST(sadn AS DOUBLE) / CAST(sbcn AS DOUBLE) AS mh_odds_ratio,
      |       CAST(sdev AS DOUBLE) * CAST(sdev AS DOUBLE)
      |         / CAST(sv AS DOUBLE) > 3.841 AS reject_5pct
      |FROM agg""".stripMargin

  /** Tukey–Kramer HSD post-hoc [N] (Tukey 1949; Kramer 1956) — the
    * pairwise follow-up `stats_anova` needs: WHICH priorities differ,
    * with the studentized-range correction that keeps the familywise
    * error at α across all 10 comparisons (10 naive t-tests at 5%
    * inflate to ~40% familywise). q = |m̄ᵢ − m̄ⱼ| / √(MSE/2·(1/nᵢ+1/nⱼ))
    * vs the pinned critical q(k=5, df=∞) = 3.858. All power sums are
    * exact; MSE rides a 1-row broadcast crossJoin onto the 10-pair
    * self-join of the 5-row group relation — constant work after ONE
    * fact-scan hash agg. */
  private def tukeyHsd(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val y = expr("(cast(cast(o_totalprice as decimal(12,2)) * 100" +
      " as bigint)) div 100000")
    val per = Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"), y.as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("qy"))
      .localCheckpoint()
    // per-group within-SS term pinned at 6dp into decimal(28,6) BEFORE
    // the sum (ADVICE r9): a raw double sum's addition order is
    // partition-dependent, and a last-ulp MSE drift could flip the
    // q > 3.858 boundary under a different partitioning. Same pin as the
    // CMH / G-test reductions; the oracle mirrors it with round_even.
    val mse = per.agg(
      sum(col("n")).as("nt"), count(lit(1)).as("k"),
      sum(bround(dd(col("qy")) - dd(col("sy")) * dd(col("sy")) / dd(col("n")), 6)
        .cast("decimal(28,6)")).as("ssw"))
      .select((dd(col("ssw")) / dd(col("nt") - col("k"))).as("mse"))
    val a = per.select(col("g").as("g1"), col("n").as("n1"), col("sy").as("s1"))
    val b = per.select(col("g").as("g2"), col("n").as("n2"), col("sy").as("s2"))
    a.join(b, col("g1") < col("g2"))
      .crossJoin(broadcast(mse))
      .select(col("g1"), col("g2"),
        (dd(col("s1")) / dd(col("n1"))).as("mean1"),
        (dd(col("s2")) / dd(col("n2"))).as("mean2"),
        (abs(dd(col("s1")) / dd(col("n1")) - dd(col("s2")) / dd(col("n2"))) /
          sqrt(col("mse") / lit(2.0) *
            (lit(1.0) / dd(col("n1")) + lit(1.0) / dd(col("n2")))))
          .as("q"))
      .withColumn("significant", col("q") > lit(3.858))
      .orderBy("g1", "g2")
  }

  private def tukeyHsdOracle: String =
    """WITH y AS (
      |  SELECT o_orderpriority AS g,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 100000 AS y
      |  FROM orders),
      |per AS (
      |  SELECT g, count(*) AS n, sum(CAST(y AS HUGEINT)) AS sy,
      |         sum(CAST(y AS HUGEINT) * y) AS qy
      |  FROM y GROUP BY g),
      |m AS (
      |  SELECT CAST(sum(CAST(round_even(
      |               CAST(qy AS DOUBLE)
      |               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |                 / CAST(n AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE)
      |           / CAST(sum(n) - count(*) AS DOUBLE) AS mse
      |  FROM per),
      |pairs AS (
      |  SELECT a.g AS g1, b.g AS g2,
      |         CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean1,
      |         CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean2,
      |         abs(CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
      |             - CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE))
      |           / sqrt(m.mse / 2.0 * (1.0 / CAST(a.n AS DOUBLE)
      |                                 + 1.0 / CAST(b.n AS DOUBLE))) AS q
      |  FROM per a JOIN per b ON a.g < b.g CROSS JOIN m)
      |SELECT g1, g2, mean1, mean2, q, q > 3.858 AS significant
      |FROM pairs ORDER BY g1, g2""".stripMargin

  /** Wilson score interval [N] (Wilson 1927) per priority on the
    * fulfilled-rate proportion — the dashboard-standard rate CI: unlike
    * the Wald interval it never leaves [0,1] and behaves at extreme
    * rates; unlike `stats_hoeffding_ci` it uses the binomial shape, so
    * it's ~3× tighter at these n. Closed form at z = 1.96:
    * center = (p̂ + z²/2n)/(1 + z²/n), half-width =
    * z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n). k and n are exact longs from
    * one conditional hash agg; the interval is one mirrored double
    * expression per bound. */
  private def wilsonCi(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val z2 = 1.96 * 1.96
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("k"))
      .select(col("g"), col("n"), col("k"),
        (dd(col("k")) / dd(col("n"))).as("p_hat"),
        dd(col("n")).as("nd"))
      .select(col("g"), col("n"), col("k"), col("p_hat"),
        ((col("p_hat") + lit(z2) / (lit(2.0) * col("nd")) -
          lit(1.96) * sqrt(col("p_hat") * (lit(1.0) - col("p_hat")) / col("nd") +
            lit(z2) / (lit(4.0) * col("nd") * col("nd")))) /
          (lit(1.0) + lit(z2) / col("nd"))).as("lo"),
        ((col("p_hat") + lit(z2) / (lit(2.0) * col("nd")) +
          lit(1.96) * sqrt(col("p_hat") * (lit(1.0) - col("p_hat")) / col("nd") +
            lit(z2) / (lit(4.0) * col("nd") * col("nd")))) /
          (lit(1.0) + lit(z2) / col("nd"))).as("hi"))
      .orderBy("g")
  }

  private def wilsonCiOracle: String =
    """WITH a AS (
      |  SELECT o_orderpriority AS g, count(*) AS n,
      |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS k
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT g, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
      |         CAST(n AS DOUBLE) AS nd
      |  FROM a)
      |SELECT g, n, k, p_hat,
      |       (p_hat + (1.96 * 1.96) / (2.0 * nd)
      |          - 1.96 * sqrt(p_hat * (1.0 - p_hat) / nd
      |                        + (1.96 * 1.96) / (4.0 * nd * nd)))
      |         / (1.0 + (1.96 * 1.96) / nd) AS lo,
      |       (p_hat + (1.96 * 1.96) / (2.0 * nd)
      |          + 1.96 * sqrt(p_hat * (1.0 - p_hat) / nd
      |                        + (1.96 * 1.96) / (4.0 * nd * nd)))
      |         / (1.0 + (1.96 * 1.96) / nd) AS hi
      |FROM p ORDER BY g""".stripMargin

  /** G-test of independence [N] (the likelihood-ratio χ² — Sokal &
    * Rohlf's preferred form; Pearson's `agg_chisq` is its second-order
    * Taylor approximation): G = 2·Σ O·ln(O/E) over the same
    * (priority × status) table, E = row·col/N. Better calibrated when
    * cells are small or effects large, and G is ADDITIVE across table
    * partitions (the property that lets stratified analyses decompose
    * exactly — χ² can't). Each cell's O·ln term pins at 6dp into a
    * decimal(28,6) sum (ln is libm; count-scale magnitudes per the ipf
    * ULP lesson), so the 15-cell reduction is order-invariant; G is
    * one doubling at the end. Same plan as `agg_chisq`: one fact-scan
    * hash agg + margin broadcasts + a 1-row total crossJoin. */
  private def gTest(s: SparkSession, d: String): DataFrame = {
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("r"), col("o_orderstatus").as("c"))
      .agg(count(lit(1)).as("obs"))
    val rt = cells.groupBy("r").agg(sum("obs").as("rt"))
    val ct = cells.groupBy("c").agg(sum("obs").as("ct"))
    val n = cells.agg(sum("obs").as("n"))
    cells
      .join(broadcast(rt), "r").join(broadcast(ct), "c")
      .crossJoin(broadcast(n))
      .select(col("r"), col("c"),
        bround(dd(col("obs")) *
          log(dd(col("obs")) * dd(col("n")) / (dd(col("rt")) * dd(col("ct")))),
          6).cast("decimal(28,6)").as("t"))
      .agg((lit(2.0) * sum(col("t")).cast("double")).as("g_stat"),
        ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1))
          .cast("int").as("dof"),
        count(lit(1)).cast("int").as("cells"))
      .withColumn("reject_5pct", col("g_stat") > lit(15.507))
  }

  private def gTestOracle: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS r, o_orderstatus AS c, count(*) AS obs
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT r, sum(obs) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT c, sum(obs) AS ct FROM cells GROUP BY 1),
      |n AS (SELECT sum(obs) AS n FROM cells),
      |t AS (
      |  SELECT r, c,
      |         CAST(round_even(CAST(obs AS DOUBLE)
      |             * ln(CAST(obs AS DOUBLE) * CAST(n.n AS DOUBLE)
      |                  / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE))),
      |             6) AS DECIMAL(28,6)) AS t
      |  FROM cells JOIN rt USING (r) JOIN ct USING (c), n),
      |g AS (
      |  SELECT 2.0 * CAST(sum(t) AS DOUBLE) AS g_stat,
      |         CAST(((SELECT count(DISTINCT r) FROM cells) - 1)
      |              * ((SELECT count(DISTINCT c) FROM cells) - 1)
      |              AS INTEGER) AS dof,
      |         CAST(count(*) AS INTEGER) AS cells
      |  FROM t)
      |SELECT g_stat, dof, cells, g_stat > 15.507 AS reject_5pct
      |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_g_test" -> (gTest _),
    "stats_wilson_ci" -> (wilsonCi _),
    "stats_tukey_hsd" -> (tukeyHsd _),
    "stats_cmh" -> (cmh _),
    "stats_capture_recapture" -> (captureRecapture _),
    "stats_prop_ztest" -> (propZtest _),
    "stats_ipf_rake" -> (ipf _),
    "ts_changepoint" -> (changepoint _),
    "stats_hoeffding_ci" -> (hoeffdingCi _),
    "stats_runs_test" -> (runsTest _),
    "agg_abc_pareto" -> (abcAnalysis _),
    "stats_mutual_info" -> (mutualInfo _),
    "stats_jarque_bera" -> (jarqueBera _),
    "stats_cuped" -> (cuped _),
    "stats_cohens_d" -> (cohensD _))

  val oracles: Map[String, String] = Map(
    "stats_g_test" -> gTestOracle,
    "stats_wilson_ci" -> wilsonCiOracle,
    "stats_tukey_hsd" -> tukeyHsdOracle,
    "stats_cmh" -> cmhOracle,
    "stats_capture_recapture" -> captureRecaptureOracle,
    "stats_prop_ztest" -> propZtestOracle,
    "stats_ipf_rake" -> ipfOracle,
    "ts_changepoint" -> changepointOracle,
    "stats_hoeffding_ci" -> hoeffdingOracle,
    "stats_runs_test" -> runsTestOracle,
    "agg_abc_pareto" -> abcOracle,
    "stats_mutual_info" -> mutualInfoOracle,
    "stats_jarque_bera" -> jarqueBeraOracle,
    "stats_cuped" -> cupedOracle,
    "stats_cohens_d" -> cohensDOracle)
}

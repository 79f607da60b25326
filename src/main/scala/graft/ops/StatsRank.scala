package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Rank-based nonparametric tests [N] — the family a warehouse reaches
  * for when distributions are skewed or ordinal: Kendall's tau-b
  * (concordance), the Wilcoxon signed-rank test (paired), the
  * Kruskal-Wallis H test (k-group), and McNemar's test (paired binary).
  *
  * Cross-engine determinism: every rank is the DOUBLED mean rank of its
  * tie block (the `eval_auc` trick — 2·before + count + 1 is always an
  * exact integer), so rank sums accumulate as exact integers in any
  * partition order; floats appear only in the final test statistic,
  * with the expression mirrored token for token in the oracle and any
  * multi-term double sum folded in SORTED order (the `agg_chisq`
  * list_reduce discipline).
  *
  * Scale shape: each test is one or two data-scale hash aggs that
  * collapse to a bounded domain (value bins × groups, or one row per
  * entity), then metadata-scale arithmetic. Nothing here joins or
  * sorts the fact table beyond the grouping shuffle. */
object StatsRank extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")
  private def cents: Column =
    (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")

  /** Kendall's tau-b over a bounded 2-D bin domain: price ($20k bins)
    * vs order month. Concordant/discordant pair MASSES come from the
    * cell-level pair join (cells ≤ bins×months — broadcast-sized; the
    * raw-pair formulation would be O(n²) and is never built), tie
    * corrections from the margins. All counts are exact BIGINTs
    * (C, D ≤ n(n−1)/2 ≈ 1.1e10 at sf0.1, double-exact far past SF 100);
    * tau is one mirrored double expression. */
  private def kendallTau(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .select(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")
        .as("cts"), col("o_orderdate"))
      .select(expr("cts div 2000000").as("x"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
      .localCheckpoint() // cells feed 4 branches; bounded (bins×months)
    val c2 = cells.select(col("x").as("x2"), col("y").as("y2"),
      col("n").as("n2"))
    val pairs = cells.join(broadcast(c2), col("x") < col("x2"))
      .agg(
        sum(when(col("y") < col("y2"), col("n") * col("n2"))
          .otherwise(0L)).as("conc"),
        sum(when(col("y") > col("y2"), col("n") * col("n2"))
          .otherwise(0L)).as("disc"))
    val tx = cells.groupBy("x").agg(sum("n").as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1x"))
    val ty = cells.groupBy("y").agg(sum("n").as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1y"))
    val tot = cells.agg(sum("n").as("n"))
      .select(col("n"), expr("n * (n - 1) div 2").as("n0"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("conc"), col("disc"),
        (dd(col("conc") - col("disc")) /
          sqrt(dd(col("n0") - col("n1x")) * dd(col("n0") - col("n1y"))))
          .as("tau_b"))
  }

  private def kendallTauOracle: String =
    """WITH cells AS MATERIALIZED (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 2000000 AS x,
      |         year(o_orderdate) * 12 + month(o_orderdate) AS y,
      |         count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |p AS (
      |  SELECT sum(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END) AS conc,
      |         sum(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END) AS disc
      |  FROM cells a JOIN cells b ON a.x < b.x),
      |tx AS (SELECT sum(t * (t - 1) // 2) AS n1x
      |       FROM (SELECT sum(n) AS t FROM cells GROUP BY x)),
      |ty AS (SELECT sum(t * (t - 1) // 2) AS n1y
      |       FROM (SELECT sum(n) AS t FROM cells GROUP BY y)),
      |tot AS (SELECT sum(n) AS n, sum(n) * (sum(n) - 1) // 2 AS n0
      |        FROM cells)
      |SELECT CAST(tot.n AS BIGINT) AS n,
      |       CAST(p.conc AS BIGINT) AS conc, CAST(p.disc AS BIGINT) AS disc,
      |       CAST(p.conc - p.disc AS DOUBLE)
      |         / sqrt(CAST(tot.n0 - tx.n1x AS DOUBLE)
      |                * CAST(tot.n0 - ty.n1y AS DOUBLE)) AS tau_b
      |FROM p, tx, ty, tot""".stripMargin

  /** Wilcoxon signed-rank: per-customer 1997-vs-1996 spend (paired by
    * construction), zero diffs dropped per the classic test. |d| is in
    * exact cents so tie blocks are well-defined; W⁺ accumulates in
    * DOUBLED rank units (exact). Variance uses the tie-corrected
    * n(n+1)(2n+1)/24 − Σ(t³−t)/48 (≈1.4e13 at sf0.1 — double-exact),
    * z mirrored token for token. */
  private def wilcoxonSigned(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum(cents).as("sp"))
    val a = spend.filter(col("yr") === 1996)
      .select(col("o_custkey").as("k"), col("sp").as("sa"))
    val b = spend.filter(col("yr") === 1997)
      .select(col("o_custkey").as("k"), col("sp").as("sb"))
    val blocks = a.join(b, "k")
      .select((col("sb") - col("sa")).as("diff"))
      .filter(col("diff") =!= 0)
      .groupBy(abs(col("diff")).as("ad"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("diff") > 0, 1L).otherwise(0L)).as("pos"))
    val w = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("t2", col("before") * 2 + col("cnt") + 1)
      .agg(sum(col("cnt")).as("n"),
        sum(col("pos") * col("t2")).as("w2"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
      .select(col("n"), col("w2").as("w_plus2"),
        (dd(col("w2") - expr("n * (n + 1) div 2")) /
          (lit(2.0) * sqrt(
            dd(expr("n * (n + 1) * (2 * n + 1)")) / lit(24.0) -
              dd(col("ties")) / lit(48.0)))).as("z"))
  }

  private def wilcoxonSignedOracle: String =
    """WITH spend AS (
      |  SELECT o_custkey AS k, year(o_orderdate) AS yr,
      |         sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |             AS BIGINT)) AS sp
      |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      |  GROUP BY 1, 2),
      |blocks AS (
      |  SELECT abs(b.sp - a.sp) AS ad, count(*) AS cnt,
      |         sum(CASE WHEN b.sp - a.sp > 0 THEN 1 ELSE 0 END) AS pos
      |  FROM (SELECT k, sp FROM spend WHERE yr = 1996) a
      |  JOIN (SELECT k, sp FROM spend WHERE yr = 1997) b USING (k)
      |  WHERE b.sp - a.sp <> 0
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT cnt, pos,
      |         2 * COALESCE(sum(cnt) OVER (ORDER BY ad
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           + cnt + 1 AS t2
      |  FROM blocks),
      |agg AS (
      |  SELECT sum(cnt) AS n, sum(pos * t2) AS w2,
      |         sum(cnt * cnt * cnt - cnt) AS ties
      |  FROM ranked)
      |SELECT CAST(n AS BIGINT) AS n, CAST(w2 AS BIGINT) AS w_plus2,
      |       CAST(w2 - n * (n + 1) // 2 AS DOUBLE)
      |         / (2.0 * sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24.0
      |                       - CAST(ties AS DOUBLE) / 48.0)) AS z
      |FROM agg""".stripMargin

  /** Kruskal-Wallis H across the 5 order priorities over $1000 price
    * bins (heavy ties — the tie-robust formulation below needs no
    * separate correction): H = (N−1)·Σ n_g(R̄_g−R̄)² / Σ(r_i−R̄)².
    * In doubled-rank units numerator and denominator both scale by 4,
    * so the ratio is exact. The denominator is an exact BIGINT
    * (≈ N³/3 ≈ 1.1e15 at sf0.1 — double-exact; crosses 2⁵³ near
    * SF ~0.2·2, comment-bounded like `agg_skewkurt`, accumulated as
    * decimal(38,0) so past that it still sums exactly and only the
    * final cast is at risk); the 5 numerator terms fold in sorted
    * group order. */
  private def kruskalWallis(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)" +
          " div 100000").as("v"))
    val gv = rows.groupBy("g", "v").agg(count(lit(1)).as("ngv"))
      .localCheckpoint() // bounded: 5 priorities × ~600 price bins
    val blocks = gv.groupBy("v").agg(sum("ngv").as("cnt"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = blocks
      .withColumn("before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("t2", col("before") * 2 + col("cnt") + 1)
    val tot = ranked.agg(sum("cnt").as("n"))
    val den = ranked.crossJoin(broadcast(tot))
      .agg(sum((col("cnt") * (col("t2") - (col("n") + 1)) *
        (col("t2") - (col("n") + 1))).cast("decimal(38,0)"))
        .cast("double").as("den"),
        max(col("n")).as("n"))
    val perG = gv
      .join(broadcast(ranked.select(col("v"), col("t2"))), "v")
      .groupBy("g")
      .agg(sum(col("ngv") * col("t2")).as("r2"), sum("ngv").as("ng"))
    val num = perG.crossJoin(broadcast(tot))
      .withColumn("a", col("r2") - col("ng") * (col("n") + 1))
      .withColumn("term", dd(col("a")) * dd(col("a")) / dd(col("ng")))
      .agg(aggregate(
        array_sort(collect_list(struct(col("g"), col("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")).as("num"),
        count(lit(1)).cast("int").as("k"))
    num.crossJoin(broadcast(den))
      .select(col("n"), (col("k") - 1).as("dof"),
        (dd(col("n") - 1) * col("num") / col("den")).as("h"))
  }

  private def kruskalWallisOracle: String =
    """WITH gv AS MATERIALIZED (
      |  SELECT o_orderpriority AS g,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 100000 AS v,
      |         count(*) AS ngv
      |  FROM orders GROUP BY 1, 2),
      |blocks AS (SELECT v, sum(ngv) AS cnt FROM gv GROUP BY v),
      |ranked AS (
      |  SELECT v, cnt,
      |         2 * COALESCE(sum(cnt) OVER (ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           + cnt + 1 AS t2
      |  FROM blocks),
      |tot AS (SELECT sum(cnt) AS n FROM ranked),
      |den AS (
      |  SELECT CAST(sum(CAST(cnt * (t2 - (n + 1)) * (t2 - (n + 1))
      |                       AS DECIMAL(38,0))) AS DOUBLE) AS den,
      |         max(n) AS n
      |  FROM ranked, tot),
      |perg AS (
      |  SELECT g, sum(ngv * t2) AS r2, sum(ngv) AS ng
      |  FROM gv JOIN ranked USING (v) GROUP BY g),
      |num AS (
      |  SELECT list_reduce(list(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
      |                          / CAST(ng AS DOUBLE) ORDER BY g),
      |                     (acc, x) -> acc + x) AS num,
      |         CAST(count(*) AS INTEGER) AS k
      |  FROM (SELECT g, r2 - ng * (n + 1) AS a, ng FROM perg, tot))
      |SELECT CAST(den.n AS BIGINT) AS n, k - 1 AS dof,
      |       CAST(den.n - 1 AS DOUBLE) * num.num / den.den AS h
      |FROM num, den""".stripMargin

  /** McNemar's test (continuity-corrected) on paired binary outcomes:
    * per customer, "had a fulfilled order" before vs from mid-1998 (the data midpoint). The
    * discordant counts b (yes→no) and c (no→yes) are exact; the
    * statistic (|b−c|−1)²/(b+c) is one division of exact-int doubles. */
  private def mcnemar(s: SparkSession, d: String): DataFrame = {
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_orderdate") < lit("1998-07-01") &&
          col("o_orderstatus") === "F", 1).otherwise(0)).as("pre"),
        max(when(col("o_orderdate") >= lit("1998-07-01") &&
          col("o_orderstatus") === "F", 1).otherwise(0)).as("post"))
    per.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("pre") === 1 && col("post") === 0, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("pre") === 0 && col("post") === 1, 1L).otherwise(0L))
        .as("c"))
      .select(col("n_pairs"), col("b"), col("c"),
        (dd((abs(col("b") - col("c")) - 1) *
          (abs(col("b") - col("c")) - 1)) / dd(col("b") + col("c")))
          .as("chi2_cc"))
  }

  private def mcnemarOracle: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |         max(CASE WHEN o_orderdate < DATE '1998-07-01'
      |                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pre,
      |         max(CASE WHEN o_orderdate >= DATE '1998-07-01'
      |                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS post
      |  FROM orders GROUP BY 1),
      |agg AS (
      |  SELECT count(*) AS n_pairs,
      |         sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END) AS b,
      |         sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END) AS c
      |  FROM per)
      |SELECT CAST(n_pairs AS BIGINT) AS n_pairs, CAST(b AS BIGINT) AS b,
      |       CAST(c AS BIGINT) AS c,
      |       CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
      |         / CAST(b + c AS DOUBLE) AS chi2_cc
      |FROM agg""".stripMargin

  /** Friedman test: blocks = months, treatments = the 5 priorities,
    * observation = that priority's revenue in that month (complete
    * blocks only). Within-block doubled ranks (k = 5 rows per block —
    * the rank window is block-bounded, never data-wide); the statistic
    * Q = 3·ΣR2_j²/(n·k·(k+1)) − 3n(k+1) uses the doubled-rank column
    * sums R2_j, all exact BIGINTs, in one mirrored double expression.
    * (With doubled ranks ΣR2² = 4ΣR², so the leading 12 becomes 3.) */
  private def friedman(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.orders(s, d)
      .groupBy(trunc(col("o_orderdate"), "month").as("blk"),
        col("o_orderpriority").as("trt"))
      .agg(sum(cents).as("v"))
    val complete = obs.groupBy("blk").agg(count(lit(1)).as("kk"))
      .filter(col("kk") === 5).select("blk")
    // RANGE frame: "before" must count strictly-smaller v only — a ROWS
    // frame would split tie blocks by Spark's unstable within-tie order
    val wBefore = Window.partitionBy(col("blk")).orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val ranked = obs.join(broadcast(complete), "blk")
      .withColumn("tcnt", count(lit(1)).over(
        Window.partitionBy(col("blk"), col("v"))))
      .withColumn("before", coalesce(count(lit(1)).over(wBefore), lit(0L)))
    // doubled mean rank of the tie block within the month
    val r2 = ranked
      .withColumn("t2", col("before") * 2 + col("tcnt") + 1)
      .groupBy(col("trt")).agg(sum(col("t2")).as("r2j"))
    val nBlocks = complete.agg(count(lit(1)).as("n"))
    r2.crossJoin(broadcast(nBlocks))
      .agg(max(col("n")).as("n_blocks"),
        sum(col("r2j") * col("r2j")).as("sr2"))
      .select(col("n_blocks"),
        (lit(3.0) * dd(col("sr2")) /
          (dd(col("n_blocks")) * lit(30.0)) -
          lit(3.0) * dd(col("n_blocks")) * lit(6.0)).as("q"),
        lit(4).as("dof"))
  }

  private def friedmanOracle: String =
    """WITH obs AS (
      |  SELECT date_trunc('month', o_orderdate) AS blk,
      |         o_orderpriority AS trt,
      |         sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
      |             AS BIGINT)) AS v
      |  FROM orders GROUP BY 1, 2),
      |complete AS (
      |  SELECT blk FROM obs GROUP BY blk HAVING count(*) = 5),
      |ranked AS (
      |  SELECT o.trt,
      |         2 * COALESCE(count(*) OVER (
      |             PARTITION BY o.blk ORDER BY o.v
      |             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           + count(*) OVER (PARTITION BY o.blk, o.v) + 1 AS t2
      |  FROM obs o JOIN complete USING (blk)),
      |r2 AS (SELECT trt, sum(t2) AS r2j FROM ranked GROUP BY trt),
      |nb AS (SELECT count(*) AS n FROM complete)
      |SELECT CAST(max(n) AS BIGINT) AS n_blocks,
      |       3.0 * CAST(sum(r2j * r2j) AS DOUBLE)
      |         / (CAST(max(n) AS DOUBLE) * 30.0)
      |         - 3.0 * CAST(max(n) AS DOUBLE) * 6.0 AS q,
      |       4 AS dof
      |FROM r2, nb""".stripMargin

  /** Brown-Forsythe (median-based Levene) homogeneity-of-variance test
    * across the 5 priorities on $1000 price bins: spreads z = |2x −
    * med2_g| use the DOUBLED group median (sum of the two central
    * order statistics — exact integers via cumulative bin counts, no
    * row-level sort), and the one-way-ANOVA F on z comes from exact
    * integer power sums; the five S_g²/n_g terms fold in sorted group
    * order (`agg_chisq` discipline), everything else is one mirrored
    * double expression. */
  private def brownForsythe(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)" +
          " div 100000").as("v"))
    val gv = rows.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // bounded: 5 groups × ~600 bins
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = gv
      .withColumn("cumc", sum(col("cnt")).over(wCum))
      .withColumn("ng", sum(col("cnt")).over(Window.partitionBy(col("g"))))
    // doubled median: x(floor((n+1)/2)) + x(ceil((n+1)/2)) via the
    // first bins whose cumulative count reaches each order statistic
    val lo = cum.filter(col("cumc") >= expr("(ng + 1) div 2"))
      .groupBy("g").agg(min(col("v")).as("mlo"))
    val hi = cum.filter(col("cumc") >= expr("(ng + 2) div 2"))
      .groupBy("g").agg(min(col("v")).as("mhi"))
    val med = lo.join(hi, "g")
      .select(col("g"), (col("mlo") + col("mhi")).as("med2"))
    val z = gv.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") * 2 - col("med2")).as("z"),
        col("cnt"))
    val perG = z.groupBy("g")
      .agg(sum(col("z") * col("cnt")).as("sg"),
        sum(col("z") * col("z") * col("cnt")).as("sg2"),
        sum(col("cnt")).as("ng"))
    val terms = perG
      .withColumn("term", dd(col("sg")) * dd(col("sg")) / dd(col("ng")))
    terms.agg(
        aggregate(array_sort(collect_list(struct(col("g"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("sq"),
        sum(col("sg")).as("st"), sum(col("sg2")).as("st2"),
        sum(col("ng")).as("n"), count(lit(1)).cast("int").as("k"))
      .select(col("n"), (col("k") - 1).as("dof1"),
        (col("n") - col("k")).as("dof2"),
        (((col("sq") - dd(col("st")) * dd(col("st")) / dd(col("n"))) /
          dd(col("k") - 1)) /
          ((dd(col("st2")) - col("sq")) / dd(col("n") - col("k"))))
          .as("f"))
  }

  private def brownForsytheOracle: String =
    """WITH gv AS MATERIALIZED (
      |  SELECT o_orderpriority AS g,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 100000 AS v,
      |         count(*) AS cnt
      |  FROM orders GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, v, cnt,
      |         sum(cnt) OVER (PARTITION BY g ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
      |         sum(cnt) OVER (PARTITION BY g) AS ng
      |  FROM gv),
      |lo AS (SELECT g, min(v) AS mlo FROM cum
      |       WHERE cumc >= (ng + 1) // 2 GROUP BY g),
      |hi AS (SELECT g, min(v) AS mhi FROM cum
      |       WHERE cumc >= (ng + 2) // 2 GROUP BY g),
      |med AS (SELECT g, mlo + mhi AS med2 FROM lo JOIN hi USING (g)),
      |z AS (SELECT g, abs(v * 2 - med2) AS z, cnt
      |      FROM gv JOIN med USING (g)),
      |perg AS (
      |  SELECT g, sum(z * cnt) AS sg, sum(z * z * cnt) AS sg2,
      |         sum(cnt) AS ng
      |  FROM z GROUP BY g),
      |agg AS (
      |  SELECT list_reduce(list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
      |                          / CAST(ng AS DOUBLE) ORDER BY g),
      |                     (acc, x) -> acc + x) AS sq,
      |         sum(sg) AS st, sum(sg2) AS st2, sum(ng) AS n,
      |         CAST(count(*) AS INTEGER) AS k
      |  FROM perg)
      |SELECT CAST(n AS BIGINT) AS n, k - 1 AS dof1,
      |       CAST(n - k AS BIGINT) AS dof2,
      |       ((sq - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |          / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
      |       / ((CAST(st2 AS DOUBLE) - sq) / CAST(n - k AS DOUBLE)) AS f
      |FROM agg""".stripMargin

  /** Cochran's Q: k = 3 repeated binary measures per customer (had a
    * fulfilled order in 1996 / 1997 / 1998). Q = (k−1)·(k·ΣC_j² − N²)
    * / (k·N − ΣR_i²) — column totals, grand total, and row-sum squares
    * are all exact BIGINTs from ONE hash agg; Q is a single mirrored
    * division. The k-treatment generalization of [[mcnemar]]. */
  private def cochranQ(s: SparkSession, d: String): DataFrame = {
    def hadF(y: Int) =
      max(when(year(col("o_orderdate")) === y &&
        col("o_orderstatus") === "F", 1).otherwise(0))
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(hadF(1996).as("y1"), hadF(1997).as("y2"), hadF(1998).as("y3"))
    per.agg(count(lit(1)).as("subjects"),
        sum(col("y1")).as("c1"), sum(col("y2")).as("c2"),
        sum(col("y3")).as("c3"),
        sum((col("y1") + col("y2") + col("y3")) *
          (col("y1") + col("y2") + col("y3"))).as("sr2"))
      .select(col("subjects"),
        (dd(lit(2) * (lit(3) * (col("c1") * col("c1") +
          col("c2") * col("c2") + col("c3") * col("c3")) -
          (col("c1") + col("c2") + col("c3")) *
            (col("c1") + col("c2") + col("c3")))) /
          dd(lit(3) * (col("c1") + col("c2") + col("c3")) - col("sr2")))
          .as("q"),
        lit(2).as("dof"))
  }

  private def cochranQOracle: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |         max(CASE WHEN year(o_orderdate) = 1996
      |                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y1,
      |         max(CASE WHEN year(o_orderdate) = 1997
      |                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y2,
      |         max(CASE WHEN year(o_orderdate) = 1998
      |                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y3
      |  FROM orders GROUP BY 1),
      |agg AS (
      |  SELECT count(*) AS subjects, sum(y1) AS c1, sum(y2) AS c2,
      |         sum(y3) AS c3,
      |         sum((y1 + y2 + y3) * (y1 + y2 + y3)) AS sr2
      |  FROM per)
      |SELECT CAST(subjects AS BIGINT) AS subjects,
      |       CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
      |            - (c1 + c2 + c3) * (c1 + c2 + c3)) AS DOUBLE)
      |         / CAST(3 * (c1 + c2 + c3) - sr2 AS DOUBLE) AS q,
      |       2 AS dof
      |FROM agg""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_cochran_q" -> cochranQ,
    "stats_kendall_tau" -> kendallTau,
    "stats_wilcoxon_signed" -> wilcoxonSigned,
    "stats_kruskal_wallis" -> kruskalWallis,
    "stats_mcnemar" -> mcnemar,
    "stats_friedman" -> friedman,
    "stats_brown_forsythe" -> brownForsythe)

  def oracles: Map[String, String] = Map(
    "stats_cochran_q" -> cochranQOracle,
    "stats_kendall_tau" -> kendallTauOracle,
    "stats_wilcoxon_signed" -> wilcoxonSignedOracle,
    "stats_kruskal_wallis" -> kruskalWallisOracle,
    "stats_mcnemar" -> mcnemarOracle,
    "stats_friedman" -> friedmanOracle,
    "stats_brown_forsythe" -> brownForsytheOracle)
}

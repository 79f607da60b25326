package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Retail-analytics operators [N] — market-basket association rules, a
  * grid-bucketed geo radius join, and an A/B Welch t-test. No reference
  * anchor (the reference pipeline has no analytics engine); these are
  * warehouse-parity rows per BASELINE.json's mandate, nearest SURVEY
  * anchors §2.C/§2.D.
  *
  * Float discipline (graft-verify-protocol): every measure here is a
  * ratio or statistic of EXACT integer aggregates — counts, BIGINT
  * cents bins, integer grid coordinates — combined in doubles with the
  * expression order mirrored verbatim in the DuckDB oracle. IEEE
  * +,-,*,/,sqrt on identical inputs are bit-identical across engines,
  * so nothing here is rounded (rounding a quotient is the step that
  * CAN diverge on trailing-5 ties).
  */
object Retail extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  /** Market-basket association rules [N] — support / confidence / lift
    * for co-purchased part pairs, the classic retail-warehouse query
    * (Agrawal & Srikant's Apriori output format, frequent-pair level).
    *
    * Scale shape: pairs are generated ROW-LOCALLY from each order's
    * sorted part set (quadratic only in order size, ≤7 in TPC-H —
    * never in part popularity), then hash-aggregated; per-item counts
    * live in the part domain (dimension-bounded) and the basket total
    * is one row. At 100 TB the only wide stage is the pair hash-agg,
    * exactly like [[graft.ext.Graph.coPurchaseEdges]]. Lift is
    * computed as ONE division of two exact BIGINT products
    * (n_ab·N < 2^53 and n_a·n_b < 2^53 at any plausible SF — both
    * factors are order/item counts, not data values). */
  private def basketRules(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val total = baskets.agg(countDistinct(col("l_orderkey")).as("n"))
    val items = baskets.groupBy(col("l_partkey").as("p"))
      .agg(count(lit(1)).as("cnt"))
    val pairs = baskets
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(broadcast(items.withColumnRenamed("cnt", "n_a")),
        col("a") === col("p")).drop("p")
      .join(broadcast(items.withColumnRenamed("cnt", "n_b")),
        col("b") === col("p")).drop("p")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (dd(col("n_ab")) / dd(col("n"))).as("support"),
        (dd(col("n_ab")) / dd(col("n_a"))).as("confidence"),
        (dd(col("n_ab") * col("n")) / dd(col("n_a") * col("n_b"))).as("lift"))
      .orderBy("a", "b")
  }

  /** Geo radius join [N] — all (customer, supplier) pairs within
    * distance R, the point-radius spatial join. Coordinates are
    * DETERMINISTIC synthetic projections of the keys (LCG-style
    * multiplier mod 100 000 — exact BIGINT arithmetic on both
    * engines; the testdata carries no lat/lon).
    *
    * Scale shape: each point lands in one R×R grid cell; the probe
    * side fans out to its 3×3 cell neighborhood (9 rows, constant)
    * and the join is a plain EQUI-join on the cell id — candidate
    * pairs are neighborhood-local, never the |C|×|S| cross product
    * the oracle runs. Cell width = R guarantees the neighborhood
    * covers the radius. Squared distance in BIGINT (coords < 10⁵ so
    * diff² < 10¹⁰) — no sqrt, no floats anywhere. */
  private def geoRadius(s: SparkSession, d: String): DataFrame = {
    val R = 2000L
    val cust = Tables.customer(s, d).select(col("c_custkey"),
      (col("c_custkey").cast("long") * 48271 % 100000).as("cx"),
      (col("c_custkey").cast("long") * 69621 % 100000).as("cy"))
      .withColumn("gx", expr(s"cx div $R"))
      .withColumn("gy", expr(s"cy div $R"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"),
      (col("s_suppkey").cast("long") * 16807 % 100000).as("sx"),
      (col("s_suppkey").cast("long") * 37489 % 100000).as("sy"))
      .withColumn("dx", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("dy", explode(expr("array(-1L, 0L, 1L)")))
      .select(col("s_suppkey"), col("sx"), col("sy"),
        (expr(s"sx div $R") + col("dx")).as("gx"),
        (expr(s"sy div $R") + col("dy")).as("gy"))
    val dist2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
      (col("cy") - col("sy")) * (col("cy") - col("sy"))
    cust.join(supp, Seq("gx", "gy"))
      .filter(dist2 <= lit(R * R))
      .select(col("c_custkey"), col("s_suppkey"), dist2.as("dist2"))
      .orderBy("c_custkey", "s_suppkey")
  }

  /** Welch two-sample t-test [N] — the A/B-test statistic, per
    * linestatus: returned lineitems ('R') vs the rest, on the price
    * binned to exact $10 BIGINT units (`cents div 1000`). The t
    * statistic is invariant under the affine part of that transform;
    * the binning itself is part of the key's declared semantics, so
    * the oracle mirrors it exactly.
    *
    * Scale shape: ONE hash aggregate with conditional integer sums
    * (map-side combine; |y|² ≤ 10⁸ so even sf 1's 6 M rows keep
    * Σy² < 2⁵³ — exact BIGINT, and exact again after the single
    * cast to double). All downstream arithmetic is double-IEEE with
    * the operation order mirrored in the oracle; sqrt is IEEE-exact. */
  private def welchTtest(s: SparkSession, d: String): DataFrame = {
    val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val r = col("l_returnflag") === "R"
    val agg = Tables.lineitem(s, d)
      .select(col("l_linestatus"), col("l_returnflag"),
        cents.as("cents"))
      .select(col("l_linestatus"), col("l_returnflag"),
        expr("cents div 1000").as("y"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(r, 1L).otherwise(0L)).as("n1"),
        sum(when(r, col("y")).otherwise(0L)).as("s1"),
        sum(when(r, col("y") * col("y")).otherwise(0L)).as("q1"),
        sum(when(!r, 1L).otherwise(0L)).as("n2"),
        sum(when(!r, col("y")).otherwise(0L)).as("s2"),
        sum(when(!r, col("y") * col("y")).otherwise(0L)).as("q2"))
      .filter(col("n1") >= 2 && col("n2") >= 2)
    agg
      .withColumn("m1", dd(col("s1")) / dd(col("n1")))
      .withColumn("m2", dd(col("s2")) / dd(col("n2")))
      .withColumn("v1",
        (dd(col("q1")) - dd(col("s1")) * dd(col("s1")) / dd(col("n1"))) /
          (dd(col("n1")) - lit(1.0)))
      .withColumn("v2",
        (dd(col("q2")) - dd(col("s2")) * dd(col("s2")) / dd(col("n2"))) /
          (dd(col("n2")) - lit(1.0)))
      .select(col("l_linestatus"), col("n1"), col("n2"),
        col("m1"), col("m2"),
        ((col("m1") - col("m2")) /
          sqrt(col("v1") / dd(col("n1")) + col("v2") / dd(col("n2"))))
          .as("t"))
      .orderBy("l_linestatus")
  }

  /** Two-sample Kolmogorov-Smirnov statistic [N] — the distribution-
    * drift test (did prices shift between open and fulfilled orders?):
    * D = max |ECDF_F(v) − ECDF_O(v)| over the pooled value domain.
    * Entirely deterministic: per-value counts are exact integers, the
    * two running counts are exact window sums over the same total
    * order, and each ECDF step is ONE IEEE division — both engines
    * produce bit-identical step values, and max over identical doubles
    * is exact. Values bin to exact $100 BIGINT units FIRST (declared
    * semantics, mirrored by the oracle), so the single ECDF window runs
    * over a BOUNDED bin domain — the `win_skyline` domain-sized-window
    * class — never the raw value count; the heavy work is the map-side-
    * combinable per-bin hash agg. */
  private def ksTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(expr(
        "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 10000"
      ).as("v"))
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c1"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("c2"))
    counts
      .select(col("v"), sum(col("c1")).over(w).as("r1"),
        sum(col("c2")).over(w).as("r2"),
        sum(col("c1")).over(Window.partitionBy()).as("n1"),
        sum(col("c2")).over(Window.partitionBy()).as("n2"))
      .select(col("n1"), col("n2"),
        abs(dd(col("r1")) / dd(col("n1")) - dd(col("r2")) / dd(col("n2")))
          .as("d"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("d")).as("ks_d"))
      .select(col("n1"), col("n2"), col("ks_d"))
  }

  /** Mann-Whitney U (rank-sum) statistic [N] — the nonparametric
    * two-sample test, tie-aware: each distinct binned value's AVERAGE
    * rank is (ranks-before + (count+1)/2), an exact half-integer, so
    * rank sums are exact decimal(.,1) arithmetic; U₁ = R₁ − n₁(n₁+1)/2
    * stays exact, and only the final normal-approximation z (with the
    * standard tie correction) touches IEEE — one sqrt, one division,
    * operation order mirrored by the oracle. Same bounded $100-bin
    * domain and window shape as [[ksTest]]. */
  private def mannWhitney(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val counts = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(expr(
        "(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 10000"
      ).as("v"))
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c1"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
    val ranked = counts
      .withColumn("before", coalesce(sum(col("c")).over(w), lit(0L)))
      // average rank of this value's block: exact half-integer
      .withColumn("avgrank",
        (col("before").cast("decimal(20,1)") * 2 + col("c") + 1) / 2)
      .withColumn("tie3", col("c") * col("c") * col("c") - col("c"))
    val agg = ranked.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum((col("avgrank") * col("c1")).cast("decimal(28,1)")).as("r1"),
      sum(col("tie3")).as("t3"))
    agg.select(col("n1"), col("n2"),
        (col("r1") - (col("n1").cast("decimal(20,1)") * (col("n1") + 1)) / 2)
          .cast("decimal(28,1)").as("u1"),
        col("t3"))
      // u1/u2 leave as double (exact: half-integers far below 2^53) —
      // decimals stay internal per the boundary convention
      .select(col("n1"), col("n2"), col("u1").cast("double").as("u1"),
        ((col("n1") * col("n2")).cast("decimal(28,1)") - col("u1"))
          .cast("decimal(28,1)").cast("double").as("u2"),
        bround((dd(col("u1")) - dd(col("n1")) * dd(col("n2")) / lit(2.0)) /
          sqrt(dd(col("n1")) * dd(col("n2")) / lit(12.0) *
            ((dd(col("n1")) + dd(col("n2")) + 1.0) -
              dd(col("t3")) / ((dd(col("n1")) + dd(col("n2"))) *
                (dd(col("n1")) + dd(col("n2")) - 1.0)))), 8).as("z"))
  }

  /** Spearman rank correlation [N] — the monotone-association statistic
    * (quantity vs price bin), tie-aware via average ranks. Works in
    * DOUBLED ranks so every rank is an exact integer (avg rank of a tie
    * block is a half-integer; 2·rank = 2·before + cnt + 1), and ρ is
    * invariant under the common ×2. All five power sums accumulate as
    * decimal(38,0) — exact integers at any SF (the skewKurt
    * discipline; their DuckDB mirror is HUGEINT, since DuckDB decimal
    * arithmetic degrades to DOUBLE past width 38) — and only the final
    * ρ assembly touches IEEE, in mirrored operation order.
    *
    * Scale shape: one hash agg into the bounded (quantity × $1000-bin)
    * cell domain, two domain-sized rank windows over the cell MARGINS,
    * broadcast rank dims back onto cells, one global agg. The raw
    * rows are touched exactly once. */
  private def spearman(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val cells = Tables.lineitem(s, d)
      .select(col("l_quantity").cast("long").as("x"),
        expr("(cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint))" +
          " div 100000").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    def doubledRank(margin: DataFrame, key: String, out: String): DataFrame = {
      val w = Window.orderBy(col(key)).rowsBetween(Window.unboundedPreceding, -1)
      margin
        .withColumn("before", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col(key), (col("before") * 2 + col("cnt") + 1).as(out))
    }
    val rx = doubledRank(cells.groupBy(col("x")).agg(sum(col("c")).as("cnt")),
      "x", "tx")
    val ry = doubledRank(cells.groupBy(col("y")).agg(sum(col("c")).as("cnt")),
      "y", "ty")
    val sums = cells.join(broadcast(rx), "x").join(broadcast(ry), "y")
      .agg(sum(col("c")).as("n"),
        sum(dec(col("c")) * dec(col("tx"))).as("sx"),
        sum(dec(col("c")) * dec(col("ty"))).as("sy"),
        sum(dec(col("c")) * dec(col("tx")) * dec(col("tx"))).as("sxx"),
        sum(dec(col("c")) * dec(col("ty")) * dec(col("ty"))).as("syy"),
        sum(dec(col("c")) * dec(col("tx")) * dec(col("ty"))).as("sxy"))
    sums.select(col("n"),
      (dd(dec(col("n")) * col("sxy") - col("sx") * col("sy")) /
        sqrt(dd(dec(col("n")) * col("sxx") - col("sx") * col("sx")) *
          dd(dec(col("n")) * col("syy") - col("sy") * col("sy"))))
        .as("rho"))
  }

  /** MAD outlier screen [N] — the robust complement to
    * `agg_zscore_outliers`: flag values more than 3 median-absolute-
    * deviations from the group median (the Hampel rule; mean/stddev
    * screens are themselves dragged by the outliers they hunt).
    * Medians are LOWER medians over the exact $100-bin domain (declared
    * semantics: first bin whose cumulative count reaches ⌈n/2⌉) — all
    * integer, nothing to pin.
    *
    * Scale shape: one hash agg into (priority × bin) cells, then every
    * median/MAD/outlier tally runs in the bounded bin domain (two
    * domain-sized windows, one broadcast of the 5-row median dim) —
    * the KS/Mann-Whitney posture; raw rows are touched once. */
  private def madOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"),
        expr("(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint))" +
          " div 10000").as("v"))
      .agg(count(lit(1)).as("c"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("grp")).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy(col("grp"))
      df.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(all))
        .filter(col("cum") * 2 >= col("n") + 1)
        .groupBy(col("grp"))
        .agg(min(col(valueCol)).as(out), max(col("n")).as(s"${out}_n"))
    }
    val med = lowerMedian(cells, "v", "med")
    val dev = cells.join(broadcast(med), "grp")
      .groupBy(col("grp"), abs(col("v") - col("med")).as("dv"))
      .agg(sum(col("c")).as("c"))
    val mad = lowerMedian(dev, "dv", "mad")
    cells.join(broadcast(med), "grp").join(broadcast(mad), "grp")
      .groupBy(col("grp"))
      .agg(max(col("med_n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(abs(col("v") - col("med")) > col("mad") * 3, col("c"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy("grp")
  }

  // ---- multi-feature OLS: shared formula text, both engines ----
  // Cramer's rule over the 3x3 normal equations; every matrix entry is
  // an EXACT integer sum (decimal(38,0) / HUGEINT — 3-factor determinant
  // products would blow past width 38, so determinants assemble in
  // doubles from identical exact inputs). The formula STRINGS below are
  // interpolated into BOTH the Spark selectExpr and the DuckDB oracle,
  // so the IEEE evaluation order cannot drift between engines.
  private val olsDet =
    "(nn * (s11d * s22d - s12d * s12d) - sx1d * (sx1d * s22d - s12d * sx2d)" +
      " + sx2d * (sx1d * s12d - s11d * sx2d))"
  private val olsDet0 =
    "(syd * (s11d * s22d - s12d * s12d) - sx1d * (s1yd * s22d - s12d * s2yd)" +
      " + sx2d * (s1yd * s12d - s11d * s2yd))"
  private val olsDet1 =
    "(nn * (s1yd * s22d - s12d * s2yd) - syd * (sx1d * s22d - s12d * sx2d)" +
      " + sx2d * (sx1d * s2yd - s1yd * sx2d))"
  private val olsDet2 =
    "(nn * (s11d * s2yd - s1yd * s12d) - sx1d * (sx1d * s2yd - s1yd * sx2d)" +
      " + syd * (sx1d * s12d - s11d * sx2d))"
  private val olsR2 =
    "1.0 - (syyd - (b0 * syd + b1 * s1yd + b2 * s2yd))" +
      " / (syyd - syd * syd / nn)"
  private val olsDoubles = Seq("nn" -> "n", "sx1d" -> "sx1", "sx2d" -> "sx2",
    "s11d" -> "s11", "s12d" -> "s12", "s22d" -> "s22", "syd" -> "sy",
    "s1yd" -> "s1y", "s2yd" -> "s2y", "syyd" -> "syy")

  /** Multivariate OLS [N] — price ~ quantity + discount-percent by the
    * normal equations: ONE map-side-combinable hash agg collects the
    * ten exact power sums, then Cramer's rule assembles β and R² on the
    * 1-row result. The 100 TB shape for closed-form regression: the
    * data is touched once, everything after is constant work. */
  private def olsMulti(s: SparkSession, d: String): DataFrame = {
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
      sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
    a.selectExpr("cast(n as bigint) as n" +:
        olsDoubles.map { case (d2, src) => s"cast($src as double) as $d2" }: _*)
      .selectExpr("n", "nn", "syd", "s1yd", "s2yd", "syyd",
        s"$olsDet0 / $olsDet as b0",
        s"$olsDet1 / $olsDet as b1",
        s"$olsDet2 / $olsDet as b2")
      .selectExpr("n", "b0", "b1", "b2", s"$olsR2 as r2")
  }

  /** Train-and-APPLY [N]: fit the [[olsMulti]] model, then score every
    * lineitem row and report per-returnflag residual diagnostics
    * (RMSE / MAE / mean bias) — the batch-inference half of the
    * closed-form-training story (one broadcast of the 1-row model onto
    * the fact scan; predictions never leave the executors). Residual
    * reductions are order-invariant: resid² pins to the integer grid
    * (magnitude ~10¹⁰, ULP ~10⁻⁵ — same trade as stats_anova), |resid|
    * and resid pin at 6dp, all three sum as exact decimals. */
  private def olsResiduals(s: SparkSession, d: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val base = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
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
      sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val model = a
      .selectExpr(olsDoubles.map { case (d2, src) =>
        s"cast($src as double) as $d2" }: _*)
      .selectExpr(s"$olsDet0 / $olsDet as b0",
        s"$olsDet1 / $olsDet as b1", s"$olsDet2 / $olsDet as b2")
    base.crossJoin(broadcast(model))
      .selectExpr("flag",
        "cast(y as double) - (b0 + b1 * cast(x1 as double)" +
          " + b2 * cast(x2 as double)) as resid")
      .selectExpr("flag",
        "cast(bround(resid * resid, 0) as decimal(38,0)) as r2i",
        "cast(bround(abs(resid), 6) as decimal(24,6)) as ra",
        "cast(bround(resid, 6) as decimal(24,6)) as rs")
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("r2i")).as("sq"),
        sum(col("ra")).as("sa"), sum(col("rs")).as("sb"))
      .selectExpr("flag", "cast(n as bigint) as n",
        "sqrt(cast(sq as double) / cast(n as double)) as rmse",
        "cast(sa as double) / cast(n as double) as mae",
        "cast(sb as double) / cast(n as double) as mean_bias")
      .orderBy("flag")
  }

  private def olsResidualsOracle: String = {
    val dbls = olsDoubles
      .map { case (d2, src) => s"CAST($src AS DOUBLE) AS $d2" }
      .mkString(",\n|         ")
    s"""WITH base AS (
       |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x1,
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
       |         sum(CAST(x2 AS HUGEINT) * y) AS s2y,
       |         sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM base),
       |v AS (
       |  SELECT $dbls
       |  FROM a),
       |m AS (
       |  SELECT $olsDet0 / $olsDet AS b0,
       |         $olsDet1 / $olsDet AS b1,
       |         $olsDet2 / $olsDet AS b2
       |  FROM v),
       |r AS (
       |  SELECT flag,
       |         CAST(y AS DOUBLE) - (b0 + b1 * CAST(x1 AS DOUBLE)
       |           + b2 * CAST(x2 AS DOUBLE)) AS resid
       |  FROM base CROSS JOIN m),
       |p AS (
       |  SELECT flag,
       |         CAST(round_even(resid * resid, 0) AS HUGEINT) AS r2i,
       |         CAST(round_even(abs(resid), 6) AS DECIMAL(24,6)) AS ra,
       |         CAST(round_even(resid, 6) AS DECIMAL(24,6)) AS rs
       |  FROM r),
       |g AS (
       |  SELECT flag, count(*) AS n, sum(r2i) AS sq, sum(ra) AS sa,
       |         sum(rs) AS sb
       |  FROM p GROUP BY flag)
       |SELECT flag, CAST(n AS BIGINT) AS n,
       |       sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) AS rmse,
       |       CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS mae,
       |       CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS mean_bias
       |FROM g ORDER BY flag""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_ols_residuals" -> olsResiduals,
    "stats_ols_multi" -> olsMulti,
    "stats_mad_outliers" -> madOutliers,
    "stats_spearman" -> spearman,
    "stats_mann_whitney" -> mannWhitney,
    "stats_ks_test" -> ksTest,
    "basket_rules" -> basketRules,
    "join_geo_radius" -> geoRadius,
    "stats_welch_ttest" -> welchTtest)

  private def olsOracle: String = {
    val dbls = olsDoubles
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
       |         sum(CAST(x2 AS HUGEINT) * y) AS s2y,
       |         sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM base),
       |v AS (
       |  SELECT CAST(n AS BIGINT) AS n,
       |         $dbls
       |  FROM a),
       |c AS (
       |  SELECT n, nn, syd, s1yd, s2yd, syyd,
       |         $olsDet0 / $olsDet AS b0,
       |         $olsDet1 / $olsDet AS b1,
       |         $olsDet2 / $olsDet AS b2
       |  FROM v)
       |SELECT n, b0, b1, b2, $olsR2 AS r2 FROM c""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "stats_ols_residuals" -> olsResidualsOracle,
    "stats_ols_multi" -> olsOracle,
    "stats_mad_outliers" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |           // 10000 AS v,
        |         count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |medt AS (
        |  SELECT grp, min(v) AS med, CAST(max(n) AS BIGINT) AS med_n FROM (
        |    SELECT grp, v, c,
        |           sum(c) OVER (PARTITION BY grp ORDER BY v
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |           sum(c) OVER (PARTITION BY grp) AS n
        |    FROM cells)
        |  WHERE cum * 2 >= n + 1 GROUP BY grp),
        |dev AS (
        |  SELECT cells.grp, abs(v - med) AS dv, sum(c) AS c
        |  FROM cells JOIN medt USING (grp) GROUP BY 1, 2),
        |madt AS (
        |  SELECT grp, min(dv) AS mad FROM (
        |    SELECT grp, dv, c,
        |           sum(c) OVER (PARTITION BY grp ORDER BY dv
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |           sum(c) OVER (PARTITION BY grp) AS n
        |    FROM dev)
        |  WHERE cum * 2 >= n + 1 GROUP BY grp)
        |SELECT cells.grp, max(med_n) AS n, max(med) AS med, max(mad) AS mad,
        |       CAST(sum(CASE WHEN abs(v - med) > mad * 3 THEN c ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM cells JOIN medt USING (grp) JOIN madt USING (grp)
        |GROUP BY cells.grp ORDER BY grp""".stripMargin,
    // doubled average ranks (2r = 2·before + cnt + 1) are exact
    // integers; HUGEINT mirrors Spark's decimal(38,0) power sums
    "stats_spearman" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |           // 100000 AS y,
        |         count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |mx AS (
        |  SELECT x, coalesce(sum(cnt) OVER (ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
        |           + cnt + 1 AS tx
        |  FROM (SELECT x, sum(c) AS cnt FROM cells GROUP BY 1)),
        |my AS (
        |  SELECT y, coalesce(sum(cnt) OVER (ORDER BY y
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
        |           + cnt + 1 AS ty
        |  FROM (SELECT y, sum(c) AS cnt FROM cells GROUP BY 1)),
        |a AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |         sum(CAST(c AS HUGEINT) * tx) AS sx,
        |         sum(CAST(c AS HUGEINT) * ty) AS sy,
        |         sum(CAST(c AS HUGEINT) * tx * tx) AS sxx,
        |         sum(CAST(c AS HUGEINT) * ty * ty) AS syy,
        |         sum(CAST(c AS HUGEINT) * tx * ty) AS sxy
        |  FROM cells JOIN mx USING (x) JOIN my USING (y))
        |SELECT n,
        |       CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
        |       sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
        |            CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))
        |         AS rho
        |FROM a""".stripMargin,
    "stats_mann_whitney" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |           // 10000 AS v,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c2
        |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
        |r AS (
        |  SELECT v, c1, c2, c1 + c2 AS c,
        |         coalesce(sum(c1 + c2) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS before
        |  FROM c),
        |k AS (
        |  SELECT c1, c2, c,
        |         (CAST(before AS DECIMAL(20,1)) * 2 + c + 1) / 2 AS avgrank,
        |         c * c * c - c AS tie3
        |  FROM r),
        |a AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |         CAST(sum(c2) AS BIGINT) AS n2,
        |         CAST(sum(CAST(avgrank * c1 AS DECIMAL(28,1)))
        |              AS DECIMAL(28,1)) AS r1,
        |         CAST(sum(tie3) AS BIGINT) AS t3
        |  FROM k),
        |u AS (
        |  SELECT n1, n2, t3,
        |         CAST(r1 - (CAST(n1 AS DECIMAL(20,1)) * (n1 + 1)) / 2
        |              AS DECIMAL(28,1)) AS u1
        |  FROM a)
        |SELECT n1, n2, CAST(u1 AS DOUBLE) AS u1,
        |       CAST(CAST(CAST(n1 * n2 AS DECIMAL(28,1)) - u1 AS DECIMAL(28,1))
        |            AS DOUBLE) AS u2,
        |       round_even(
        |         (CAST(u1 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |            / 2.0) /
        |         sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |           ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) -
        |             CAST(t3 AS DOUBLE) /
        |               ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
        |                (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))),
        |         8) AS z
        |FROM u""".stripMargin,
    "stats_ks_test" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |           // 10000 AS v,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c2
        |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
        |r AS (
        |  SELECT v,
        |         CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS r1,
        |         CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS r2,
        |         CAST(sum(c1) OVER () AS BIGINT) AS n1,
        |         CAST(sum(c2) OVER () AS BIGINT) AS n2
        |  FROM c)
        |SELECT n1, n2,
        |       max(abs(CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |               - CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_d
        |FROM r GROUP BY n1, n2""".stripMargin,
    // pairs via self-join — quadratic but fine at oracle scale; the
    // Spark side generates them row-locally from the order's part set
    "basket_rules" ->
      """WITH bk AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM bk),
        |item AS (SELECT l_partkey AS p, count(*) AS cnt FROM bk GROUP BY 1),
        |pair AS (
        |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS n_ab
        |  FROM bk x JOIN bk y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2)
        |SELECT a, b, n_ab, ia.cnt AS n_a, ib.cnt AS n_b,
        |       CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE) AS support,
        |       CAST(n_ab AS DOUBLE) / CAST(ia.cnt AS DOUBLE) AS confidence,
        |       CAST(n_ab * n AS DOUBLE) / CAST(ia.cnt * ib.cnt AS DOUBLE)
        |         AS lift
        |FROM pair
        |CROSS JOIN tot
        |JOIN item ia ON ia.p = pair.a
        |JOIN item ib ON ib.p = pair.b
        |WHERE n_ab >= 2
        |ORDER BY a, b""".stripMargin,
    // cross join + distance filter — the naive plan the grid join
    // refuses to run; equality proves the 3x3 neighborhood loses
    // nothing (cell width = R)
    "join_geo_radius" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |         CAST(c_custkey AS BIGINT) * 48271 % 100000 AS cx,
        |         CAST(c_custkey AS BIGINT) * 69621 % 100000 AS cy
        |  FROM customer),
        |s AS (
        |  SELECT s_suppkey,
        |         CAST(s_suppkey AS BIGINT) * 16807 % 100000 AS sx,
        |         CAST(s_suppkey AS BIGINT) * 37489 % 100000 AS sy
        |  FROM supplier)
        |SELECT c_custkey, s_suppkey,
        |       (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
        |FROM c CROSS JOIN s
        |WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
        |        <= 2000 * 2000
        |ORDER BY c_custkey, s_suppkey""".stripMargin,
    "stats_welch_ttest" ->
      """WITH y AS (
        |  SELECT l_linestatus, l_returnflag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |           // 1000 AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT l_linestatus,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN y ELSE 0 END)
        |              AS BIGINT) AS s1,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN y * y ELSE 0 END)
        |              AS BIGINT) AS q1,
        |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n2,
        |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN y ELSE 0 END)
        |              AS BIGINT) AS s2,
        |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN y * y ELSE 0 END)
        |              AS BIGINT) AS q2
        |  FROM y GROUP BY 1),
        |m AS (
        |  SELECT l_linestatus, n1, n2,
        |         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |         (CAST(q1 AS DOUBLE)
        |            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |              / CAST(n1 AS DOUBLE))
        |           / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |         (CAST(q2 AS DOUBLE)
        |            - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |              / CAST(n2 AS DOUBLE))
        |           / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |  FROM a WHERE n1 >= 2 AND n2 >= 2)
        |SELECT l_linestatus, n1, n2, m1, m2,
        |       (m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE)
        |                        + v2 / CAST(n2 AS DOUBLE)) AS t
        |FROM m ORDER BY l_linestatus""".stripMargin)
}

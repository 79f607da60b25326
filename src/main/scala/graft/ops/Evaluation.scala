package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Model-evaluation analytics [N] — the metrics a training-data /
  * model-eval warehouse computes over scored examples: ROC AUC,
  * thresholded confusion matrices, NDCG@k ranking quality, calibration
  * (reliability) bins, and inter-annotator agreement (Cohen's kappa).
  * No reference anchor (the reference pipeline has no analytics
  * engine); warehouse-parity rows per BASELINE.json's mandate, nearest
  * SURVEY anchors §2.C and the §L stats battery.
  *
  * Scores/labels are DERIVED deterministically from the TPC-H columns
  * (price bins, status flags, md5 coins) so every metric is a pure
  * function of the testdata — the established synthesis discipline
  * (`stats_welch_ttest`, `text_split_assign`).
  *
  * Float discipline (graft-verify-protocol): every statistic is
  * assembled from EXACT integer/decimal aggregates with the IEEE
  * operation order mirrored token-for-token in the DuckDB oracle;
  * transcendental discounts (NDCG's 1/log2(i+1)) are pinned 6dp
  * DECIMAL LITERALS in both engines (the `text_logprob` acceptance —
  * never computed at runtime where libm rounding could diverge). */
object Evaluation extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")
  private def dec(c: Column): Column = c.cast("decimal(19,0)")

  /** Exact ROC AUC per segment [N] — via the rank-sum identity
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with tie-aware AVERAGE ranks
    * (the Mann-Whitney machinery re-used for the classifier-eval
    * quantity). Scores bin to exact $1000 BIGINT units (declared
    * semantics, mirrored by the oracle), so ranks live in DOUBLED
    * integers (ties average two integers — doubling keeps every rank
    * exact; `stats_spearman`'s trick) and the whole statistic is ONE
    * IEEE division of exact integer aggregates.
    *
    * Scale shape: one hash agg into the (priority × $1000-bin) cell
    * domain (map-side combine), rank windows over cell MARGINS only
    * (bounded domain — the `win_skyline` class), never a window over
    * raw rows. */
  private def aucRank(s: SparkSession, d: String): DataFrame = {
    val cells = Synth.scoreCells(s, d)
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
      // doubled average rank of the tie-block at score bin v
      .withColumn("t", col("before") * 2 + col("n") + 1)
      .groupBy(col("g"))
      .agg(sum(dec(col("np")) * dec(col("t"))).as("s2"),
        sum(col("np")).as("npos"),
        sum(col("n") - col("np")).as("nneg"))
      .filter(col("npos") > 0 && col("nneg") > 0)
      // doubled ranks: AUC = (S₂ − n⁺(n⁺+1)) / (2·n⁺·n⁻); denominator
      // assembled in doubles (2.0·n⁺·n⁻, mirrored order) so no decimal
      // width crosses 38 on either engine
      .select(col("g"), col("npos"), col("nneg"),
        (dd(col("s2") - dec(col("npos")) * dec(col("npos") + 1)) /
          (lit(2.0) * dd(col("npos")) * dd(col("nneg")))).as("auc"))
      .orderBy("g")
  }

  /** Thresholded confusion matrix + precision/recall/F1 per segment
    * [N]: predicted positive = price ≥ $150k (exact cents compare),
    * actual = order fulfilled. One conditional hash agg (map-side
    * combine); P/R/F1 are IEEE divisions of exact counts, zero
    * denominators guarded by mirrored CASE. */
  private def confusion(s: SparkSession, d: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val agg = Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"),
        (cents >= 15000000L).as("pred"),
        (col("o_orderstatus") === "F").as("act"))
      .groupBy(col("g"))
      .agg(sum(when(col("pred") && col("act"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("act"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("act"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("act"), 1L).otherwise(0L)).as("tn"))
    val p = when(col("tp") + col("fp") > 0,
      dd(col("tp")) / dd(col("tp") + col("fp")))
    val r = when(col("tp") + col("fn") > 0,
      dd(col("tp")) / dd(col("tp") + col("fn")))
    agg
      .withColumn("precision", p)
      .withColumn("recall", r)
      .select(col("g"), col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision"), col("recall"),
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).as("f1"))
      .orderBy("g")
  }

  /** NDCG@10 per query [N] — ranking quality of the price-ordered list
    * against md5-derived relevance grades (0..3). Gains 2^rel − 1 are
    * exact integers; positional discounts 1/log2(i+1) are pinned 6dp
    * decimal literals (identical in the oracle — log2 is never
    * evaluated at runtime), so DCG/IDCG are exact decimal sums and
    * NDCG is ONE IEEE division.
    *
    * Scale shape: two per-query top-10 ranking windows (the
    * `win_rank_topk` TakeOrdered class — partitions are independent at
    * any scale) over ~200 query groups, then a query-domain hash agg. */
  private def ndcgAt10(s: SparkSession, d: String): DataFrame = {
    // position → pinned 6dp discount, positions 1..10
    val discounts = Seq("1.000000", "0.630930", "0.500000", "0.430677",
      "0.386853", "0.356207", "0.333333", "0.315465", "0.301030", "0.289065")
    val discCol = expr(
      s"element_at(array(${discounts.map(x => s"CAST($x AS DECIMAL(8,6))").mkString(",")}), pos)")
    val base = Synth.queryRelevance(s, d)
    // gain 2^rel − 1 over rel ∈ {0..3}: exact BIGINT lookup
    val gain = expr("element_at(array(0L, 1L, 3L, 7L), rel + 1)").as("gain")
    val wSys = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc"))
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("doc"))
    def dcgOf(ranked: DataFrame): DataFrame = ranked
      .filter(col("pos") <= 10)
      .select(col("qid"),
        (dec(col("gain")).cast("decimal(19,6)") * discCol).as("c"))
      .groupBy(col("qid")).agg(sum(col("c")).as("dcg"))
    val sys = dcgOf(base.select(col("qid"), gain,
      row_number().over(wSys).as("pos")))
    val ideal = dcgOf(base.select(col("qid"), gain,
      row_number().over(wIdeal).as("pos")))
      .withColumnRenamed("dcg", "idcg")
    sys.join(ideal, "qid")
      .select(col("qid"), dd(col("dcg")).as("dcg"), dd(col("idcg")).as("idcg"),
        when(col("idcg") > 0, dd(col("dcg")) / dd(col("idcg")))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("qid")
  }

  /** Calibration (reliability) bins [N]: predicted probability
    * p = min(cents, 6e7)/6e7 against observed fulfillment rate, in 10
    * equal-width probability bins. One hash agg into the 10-bin
    * domain; mean-predicted and observed rates are each ONE IEEE
    * division of exact BIGINT sums (numerators stay < 2⁵³ far past
    * sf 100; decimal(38,0) would be the next stop). */
  private def calibration(s: SparkSession, d: String): DataFrame = {
    Synth.calibrationBins(s, d)
      .select(col("bin"), col("n"),
        (dd(col("sp")) / (dd(col("n")) * lit(6.0e7))).as("mean_pred"),
        (dd(col("npos")) / dd(col("n"))).as("observed"))
      .withColumn("gap", col("observed") - col("mean_pred"))
      .orderBy("bin")
  }

  /** Cohen's kappa per order-year [N] — chance-corrected agreement
    * between two derived annotators (A: priority rule, B: price rule).
    * One conditional hash agg into the 7-year domain; po/pe/kappa are
    * IEEE arithmetic over exact BIGINT counts and products (mirrored
    * order; products < 2⁵³ far past sf 100). */
  private def cohensKappa(s: SparkSession, d: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
      .cast("long")
    val agg = Tables.orders(s, d)
      .select(year(col("o_orderdate")).as("yr"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("a"),
        (cents >= 15000000L).as("b"))
      .groupBy(col("yr"))
      .agg(sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
    val n = col("n11") + col("n10") + col("n01") + col("n00")
    val po = dd(col("n11") + col("n00")) / dd(n)
    val pe = dd((col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n01") + col("n00")) * (col("n10") + col("n00"))) /
      (dd(n) * dd(n))
    agg
      .withColumn("po", po)
      .withColumn("pe", pe)
      .select(col("yr"), col("n11"), col("n10"), col("n01"), col("n00"),
        col("po"), col("pe"),
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .as("kappa"))
      .orderBy("yr")
  }

  /** Brier score with the Murphy decomposition [N] — the proper-score
    * companion to `eval_calibration`: over the same 10 probability
    * bins, REL = Σ n_k(p̄_k − ō_k)²/N (calibration error),
    * RES = Σ n_k(ō_k − ō)²/N (discrimination), UNC = ō(1 − ō), and
    * the bin-level Brier = REL − RES + UNC. Per-bin terms re-pin at
    * 12dp and sum as decimal(24,12) (order-invariant); everything
    * else is IEEE over exact BIGINT sums in mirrored order. One hash
    * agg into the 10-bin domain + a 1-row global broadcast. */
  private def brier(s: SparkSession, d: String): DataFrame = {
    val bins = Synth.calibrationBins(s, d) // the SAME bins eval_calibration reports
    val tot = bins.agg(sum(col("n")).as("nt"), sum(col("npos")).as("post"))
    val mp = dd(col("sp")) / (dd(col("n")) * lit(6.0e7))   // mean predicted
    val ob = dd(col("npos")) / dd(col("n"))                // observed rate
    val obar = dd(col("post")) / dd(col("nt"))             // base rate
    bins.crossJoin(broadcast(tot))
      .select(col("nt"), col("post"),
        bround(dd(col("n")) * (mp - ob) * (mp - ob), 12)
          .cast("decimal(24,12)").as("rel_t"),
        bround(dd(col("n")) * (ob - obar) * (ob - obar), 12)
          .cast("decimal(24,12)").as("res_t"))
      .groupBy(col("nt"), col("post"))
      .agg(sum(col("rel_t")).as("rel_s"), sum(col("res_t")).as("res_s"))
      // outputs pinned at 10dp: the exact-decimal sums cast to double
      // 1-ULP-differently across engines (DuckDB's int128-scaled
      // conversion vs BigDecimal.doubleValue), so the unrounded
      // quotient is the one place drift can enter — measured at sf0.1
      .select(
        bround(dd(col("rel_s")) / dd(col("nt")), 10).as("reliability"),
        bround(dd(col("res_s")) / dd(col("nt")), 10).as("resolution"),
        bround((dd(col("post")) / dd(col("nt"))) *
          (lit(1.0) - dd(col("post")) / dd(col("nt"))), 10).as("uncertainty"))
      .withColumn("brier",
        col("reliability") - col("resolution") + col("uncertainty"))
  }

  /** Mean reciprocal rank [N] — the third standard ranking metric
    * beside NDCG and AP: per query, 1/rank of the FIRST relevant
    * (rel ≥ 2) document in the score-ordered list; queries with no
    * relevant document contribute 0. Each reciprocal pins at 12dp and
    * averages as exact decimal, so the corpus MRR is order-invariant.
    * Same per-query ranking-window shape as `eval_ndcg`. */
  private def mrr(s: SparkSession, d: String): DataFrame = {
    val wSys = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc"))
    // one pass: the conditional min over the ranked rows is null for
    // hit-less queries — no second scan, no reinstatement join
    Synth.queryRelevance(s, d)
      .withColumn("pos", row_number().over(wSys))
      .groupBy(col("qid"))
      .agg(min(when(col("rel") >= 2, col("pos"))).as("first_rank"))
      .select(when(col("first_rank").isNotNull,
        bround(lit(1.0) / dd(col("first_rank")), 12))
        .otherwise(lit(0.0)).cast("decimal(14,12)").as("rr"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("rr") > 0, 1L).otherwise(0L)).as("n_hit"),
        (dd(sum(col("rr"))) / dd(count(lit(1)))).as("mrr"))
  }

  /** Qini (uplift) curve [N] — the causal-targeting evaluation: a
    * deterministic md5-coin experiment assigns treatment and biases
    * the outcome (+15pp conversion when treated), and the curve
    * reports, per cumulative score decile, the incremental
    * conversions over the control baseline:
    * Q(d) = Y_t(d) − Y_c(d)·N_t(d)/N_c(d). One conditional hash agg
    * into the 10-decile domain, cumulative windows over it, IEEE
    * assembly of exact counts in mirrored order. */
  private def qini(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def coin(salt: String, chars: Int): Column =
      Synth.hexCoin(col("o_orderkey"), salt, chars)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        least(expr("(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint))" +
          " div 6000000"), lit(9L)).as("decile"),
        (coin("t", 1) % 2).as("t"),
        coin("y", 2).as("coin"))
      .select(col("decile"), col("t"),
        (col("coin") < lit(102) + lit(38) * col("t")).as("y"))
      .groupBy(col("decile"))
      .agg(sum(when(col("t") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("t") === 1 && col("y"), 1L).otherwise(0L)).as("yt"),
        sum(when(col("t") === 0 && col("y"), 1L).otherwise(0L)).as("yc"))
      .withColumn("cnt", sum(col("nt")).over(w))
      .withColumn("cnc", sum(col("nc")).over(w))
      .withColumn("cyt", sum(col("yt")).over(w))
      .withColumn("cyc", sum(col("yc")).over(w))
      // zero-denominator guards mirrored in the oracle: a decile slice
      // with no control (or no treated) rows yields NULL, not Inf/NaN
      // (DuckDB's divide-by-zero behavior is settings-dependent)
      .select(col("decile"), col("nt"), col("nc"),
        when(col("cnc") > 0,
          dd(col("cyt")) - dd(col("cyc")) * dd(col("cnt")) / dd(col("cnc")))
          .as("qini"),
        when(col("cnt") > 0 && col("cnc") > 0,
          dd(col("cyt")) / dd(col("cnt")) - dd(col("cyc")) / dd(col("cnc")))
          .as("uplift"))
      .orderBy("decile")
  }

  /** Model scorecard [N] — the one-row dashboard summary composing
    * FOUR registered metrics in one declarative plan (the eval
    * family's `corpus_clean_pipeline`): macro-averaged segment AUC,
    * the Brier score, MRR, and the PSI drift monitor. Built from the
    * registered query functions themselves — and the oracle nests the
    * same four oracle SQL texts — so scorecard and components CANNOT
    * drift apart. Four domain-sized one-row relations crossJoined;
    * the macro average is an exact decimal mean of 12dp-pinned AUCs. */
  private def scorecard(s: SparkSession, d: String): DataFrame = {
    val q = graft.SparkEntry.queries
    val macroAuc = q("eval_auc")(s, d)
      .select(bround(col("auc"), 12).cast("decimal(14,12)").as("a"))
      .agg((dd(sum(col("a"))) / dd(count(lit(1)))).as("macro_auc"))
    val b = q("eval_brier")(s, d).select(col("brier"))
    val m = q("eval_mrr")(s, d).select(col("mrr"))
    val p = q("stats_psi")(s, d).select(col("psi"))
    macroAuc.crossJoin(broadcast(b)).crossJoin(broadcast(m))
      .crossJoin(broadcast(p))
  }

  /** Unbiased pass@k [N] (Chen et al. 2021, the HumanEval estimator) —
    * the LLM-eval staple for "n samples per task, c correct, what's the
    * chance k draws contain a success": pass@k = 1 − C(n−c,k)/C(n,k),
    * computed in the numerically-stable product form
    * 1 − Π_{i<k} (n−c−i)/(n−i) (never raw binomials, which overflow).
    * Tasks are synthesized from orders (task = customer, sample =
    * order, correct = status 'F' — the established synthesis
    * discipline); tasks with n ≥ 5 report pass@1 and pass@5.
    *
    * Float discipline: each product factor is ONE division of exact
    * BIGINTs; the k-term fold is a LEFT fold in both engines (Spark
    * `aggregate` HOF from 1.0 — the leading 1.0·r₀ is exact — and
    * DuckDB `list_reduce` seeded with r₀), so the IEEE sequence mirrors
    * token for token. The n−c < k degenerate case pins to 1.0 before
    * any division can go negative. Scale shape: one hash agg into the
    * task domain; the fold is per-row, k-bounded, codegen'd. */
  private def passAtK(s: SparkSession, d: String): DataFrame = {
    def passK(k: Int) = expr(
      s"""CASE WHEN n - c < $k THEN CAST(1.0 AS DOUBLE) ELSE
         |  1.0D - aggregate(sequence(0, ${k - 1}), CAST(1.0 AS DOUBLE),
         |    (acc, i) -> acc * (CAST(n - c - i AS DOUBLE)
         |                       / CAST(n - i AS DOUBLE))) END""".stripMargin)
    Tables.orders(s, d)
      .groupBy(col("o_custkey").as("task_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= 5)
      .select(col("task_id"), col("n"), col("c"),
        passK(1).as("pass_at_1"), passK(5).as("pass_at_5"))
      .orderBy("task_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_pass_at_k" -> passAtK,
    "eval_scorecard" -> scorecard,
    "eval_auc" -> aucRank,
    "eval_confusion" -> confusion,
    "eval_ndcg" -> ndcgAt10,
    "eval_calibration" -> calibration,
    "eval_brier" -> brier,
    "eval_qini" -> qini,
    "eval_mrr" -> mrr,
    "stats_cohens_kappa" -> cohensKappa)

  /** Component oracles; the scorecard oracle below NESTS four of these
    * texts verbatim, so a component-oracle fix propagates. */
  private lazy val baseOracles: Map[String, String] = Map(
    "eval_pass_at_k" ->
      """WITH t AS (
        |  SELECT o_custkey AS task_id, count(*) AS n,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 5)
        |SELECT task_id, n, c,
        |       CASE WHEN n - c < 1 THEN CAST(1.0 AS DOUBLE) ELSE
        |         1.0 - list_reduce(list_transform(range(0, 1), i ->
        |           CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
        |           (acc, x) -> acc * x) END AS pass_at_1,
        |       CASE WHEN n - c < 5 THEN CAST(1.0 AS DOUBLE) ELSE
        |         1.0 - list_reduce(list_transform(range(0, 5), i ->
        |           CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
        |           (acc, x) -> acc * x) END AS pass_at_5
        |FROM t ORDER BY task_id""".stripMargin,
    "eval_auc" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS g,
        |         (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 100000 AS v,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np,
        |         count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT g, v, np, n,
        |         coalesce(sum(n) OVER (PARTITION BY g ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM cells),
        |sums AS (
        |  SELECT g,
        |         sum(CAST(np AS DECIMAL(19,0)) *
        |             CAST(before * 2 + n + 1 AS DECIMAL(19,0))) AS s2,
        |         CAST(sum(np) AS BIGINT) AS npos,
        |         CAST(sum(n - np) AS BIGINT) AS nneg
        |  FROM ranked GROUP BY g)
        |SELECT g, npos, nneg,
        |       CAST(s2 - CAST(npos AS DECIMAL(19,0)) * CAST(npos + 1 AS DECIMAL(19,0)) AS DOUBLE)
        |         / (2.0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)) AS auc
        |FROM sums WHERE npos > 0 AND nneg > 0 ORDER BY g""".stripMargin,
    "eval_confusion" ->
      """WITH agg AS (
        |  SELECT o_orderpriority AS g,
        |    sum(CASE WHEN (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) >= 15000000
        |              AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS tp,
        |    sum(CASE WHEN (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) >= 15000000
        |              AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS fp,
        |    sum(CASE WHEN (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) < 15000000
        |              AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS fn,
        |    sum(CASE WHEN (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) < 15000000
        |              AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS tn
        |  FROM orders GROUP BY 1),
        |pr AS (
        |  SELECT g, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |         CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
        |    CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
        |    CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
        |  FROM agg)
        |SELECT g, tp, fp, fn, tn, precision, recall,
        |  CASE WHEN precision + recall > 0
        |       THEN 2.0 * precision * recall / (precision + recall) END AS f1
        |FROM pr ORDER BY g""".stripMargin,
    "eval_ndcg" ->
      """WITH base AS (
        |  SELECT o_custkey % 200 AS qid, o_orderkey AS doc,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS score,
        |         (strpos('0123456789abcdef',
        |            substr(md5(CAST(o_orderkey AS VARCHAR) || ':rel'), 1, 1)) - 1) % 4 AS rel
        |  FROM orders),
        |disc AS (
        |  SELECT * FROM (VALUES
        |    (1, CAST(1.000000 AS DECIMAL(8,6))), (2, CAST(0.630930 AS DECIMAL(8,6))),
        |    (3, CAST(0.500000 AS DECIMAL(8,6))), (4, CAST(0.430677 AS DECIMAL(8,6))),
        |    (5, CAST(0.386853 AS DECIMAL(8,6))), (6, CAST(0.356207 AS DECIMAL(8,6))),
        |    (7, CAST(0.333333 AS DECIMAL(8,6))), (8, CAST(0.315465 AS DECIMAL(8,6))),
        |    (9, CAST(0.301030 AS DECIMAL(8,6))), (10, CAST(0.289065 AS DECIMAL(8,6)))
        |  ) t(pos, d)),
        |sys AS (
        |  SELECT qid, sum(CAST(CAST((1 << rel) - 1 AS DECIMAL(19,0)) AS DECIMAL(19,6)) * d) AS dcg
        |  FROM (SELECT qid, rel,
        |          row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc) AS pos
        |        FROM base) r JOIN disc USING (pos)
        |  WHERE pos <= 10 GROUP BY qid),
        |ideal AS (
        |  SELECT qid, sum(CAST(CAST((1 << rel) - 1 AS DECIMAL(19,0)) AS DECIMAL(19,6)) * d) AS idcg
        |  FROM (SELECT qid, rel,
        |          row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc) AS pos
        |        FROM base) r JOIN disc USING (pos)
        |  WHERE pos <= 10 GROUP BY qid)
        |SELECT qid, CAST(dcg AS DOUBLE) AS dcg, CAST(idcg AS DOUBLE) AS idcg,
        |       CASE WHEN idcg > 0 THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
        |            ELSE 0.0 END AS ndcg
        |FROM sys JOIN ideal USING (qid) ORDER BY qid""".stripMargin,
    "eval_calibration" ->
      """WITH b AS (
        |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 60000000) AS pc,
        |         o_orderstatus = 'F' AS pos
        |  FROM orders),
        |agg AS (
        |  SELECT least(pc, 59999999) // 6000000 AS bin, count(*) AS n,
        |         sum(pc) AS sp,
        |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM b GROUP BY 1)
        |SELECT bin, n,
        |       CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 6e7) AS mean_pred,
        |       CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS observed,
        |       CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
        |         - CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 6e7) AS gap
        |FROM agg ORDER BY bin""".stripMargin,
    "eval_brier" ->
      """WITH b AS (
        |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 60000000) AS pc,
        |         o_orderstatus = 'F' AS pos
        |  FROM orders),
        |bins AS (
        |  SELECT least(pc, 59999999) // 6000000 AS bin, count(*) AS n,
        |         sum(pc) AS sp, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |               CAST(sum(npos) AS BIGINT) AS post FROM bins),
        |t AS (
        |  SELECT nt, post,
        |    CAST(round_even(CAST(n AS DOUBLE)
        |      * (CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 6e7)
        |         - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 6e7)
        |         - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)), 12) AS DECIMAL(24,12)) AS rel_t,
        |    CAST(round_even(CAST(n AS DOUBLE)
        |      * (CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
        |         - CAST(post AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
        |         - CAST(post AS DOUBLE) / CAST(nt AS DOUBLE)), 12) AS DECIMAL(24,12)) AS res_t
        |  FROM bins, tot),
        |agg AS (
        |  SELECT nt, post, sum(rel_t) AS rel_s, sum(res_t) AS res_s
        |  FROM t GROUP BY nt, post),
        |f AS (
        |  SELECT round_even(CAST(rel_s AS DOUBLE) / CAST(nt AS DOUBLE), 10) AS reliability,
        |         round_even(CAST(res_s AS DOUBLE) / CAST(nt AS DOUBLE), 10) AS resolution,
        |         round_even((CAST(post AS DOUBLE) / CAST(nt AS DOUBLE))
        |           * (1.0 - CAST(post AS DOUBLE) / CAST(nt AS DOUBLE)), 10) AS uncertainty
        |  FROM agg)
        |SELECT reliability, resolution, uncertainty,
        |       reliability - resolution + uncertainty AS brier
        |FROM f""".stripMargin,
    "eval_mrr" ->
      """WITH base AS (
        |  SELECT o_custkey % 200 AS qid, o_orderkey AS doc,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS score,
        |         (strpos('0123456789abcdef',
        |            substr(md5(CAST(o_orderkey AS VARCHAR) || ':rel'), 1, 1)) - 1) % 4 AS rel
        |  FROM orders),
        |ranked AS (
        |  SELECT qid, rel,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc) AS pos
        |  FROM base),
        |fr AS (
        |  SELECT qid, min(CASE WHEN rel >= 2 THEN pos END) AS first_rank
        |  FROM ranked GROUP BY qid),
        |rr AS (
        |  SELECT CAST(CASE WHEN first_rank IS NOT NULL
        |                   THEN round_even(1.0 / CAST(first_rank AS DOUBLE), 12)
        |                   ELSE 0.0 END AS DECIMAL(14,12)) AS rr
        |  FROM fr)
        |SELECT count(*) AS n_queries,
        |       CAST(sum(CASE WHEN rr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |       CAST(sum(rr) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mrr
        |FROM rr""".stripMargin,
    "eval_qini" ->
      """WITH base AS (
        |  SELECT least((CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 6000000, 9) AS decile,
        |         (strpos('0123456789abcdef',
        |            substr(md5(CAST(o_orderkey AS VARCHAR) || ':t'), 1, 1)) - 1) % 2 AS t,
        |         (strpos('0123456789abcdef',
        |            substr(md5(CAST(o_orderkey AS VARCHAR) || ':y'), 1, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef',
        |            substr(md5(CAST(o_orderkey AS VARCHAR) || ':y'), 2, 1)) - 1) AS coin
        |  FROM orders),
        |agg AS (
        |  SELECT decile,
        |         sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS nt,
        |         sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS nc,
        |         sum(CASE WHEN t = 1 AND coin < 102 + 38 * t THEN 1 ELSE 0 END) AS yt,
        |         sum(CASE WHEN t = 0 AND coin < 102 + 38 * t THEN 1 ELSE 0 END) AS yc
        |  FROM base GROUP BY 1),
        |c AS (
        |  SELECT decile, CAST(nt AS BIGINT) AS nt, CAST(nc AS BIGINT) AS nc,
        |         sum(yt) OVER (ORDER BY decile
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cyt,
        |         sum(yc) OVER (ORDER BY decile
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cyc,
        |         sum(nt) OVER (ORDER BY decile
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt,
        |         sum(nc) OVER (ORDER BY decile
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnc
        |  FROM agg)
        |SELECT decile, nt, nc,
        |       CASE WHEN cnc > 0 THEN
        |         CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE) * CAST(cnt AS DOUBLE)
        |           / CAST(cnc AS DOUBLE) END AS qini,
        |       CASE WHEN cnt > 0 AND cnc > 0 THEN
        |         CAST(cyt AS DOUBLE) / CAST(cnt AS DOUBLE)
        |           - CAST(cyc AS DOUBLE) / CAST(cnc AS DOUBLE) END AS uplift
        |FROM c ORDER BY decile""".stripMargin,
    "stats_cohens_kappa" ->
      """WITH agg AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |              AND (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) >= 15000000
        |             THEN 1 ELSE 0 END) AS n11,
        |    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |              AND (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) < 15000000
        |             THEN 1 ELSE 0 END) AS n10,
        |    sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |              AND (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) >= 15000000
        |             THEN 1 ELSE 0 END) AS n01,
        |    sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |              AND (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) < 15000000
        |             THEN 1 ELSE 0 END) AS n00
        |  FROM orders GROUP BY 1),
        |k AS (
        |  SELECT yr, CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
        |         CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
        |    CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
        |    CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
        |      / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
        |         * CAST(n11 + n10 + n01 + n00 AS DOUBLE)) AS pe
        |  FROM agg)
        |SELECT yr, n11, n10, n01, n00, po, pe,
        |       CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) END AS kappa
        |FROM k ORDER BY yr""".stripMargin)

  lazy val oracles: Map[String, String] = baseOracles +
    ("eval_scorecard" ->
      s"""SELECT a.macro_auc, b.brier, m.mrr, p.psi
         |FROM (SELECT CAST(sum(CAST(round_even(auc, 12) AS DECIMAL(14,12))) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE) AS macro_auc
         |      FROM (${baseOracles("eval_auc")}) x) a,
         |     (SELECT brier FROM (${baseOracles("eval_brier")}) y) b,
         |     (SELECT mrr FROM (${baseOracles("eval_mrr")}) z) m,
         |     (SELECT psi FROM (${Features.oracles("stats_psi")}) w) p""".stripMargin)
}

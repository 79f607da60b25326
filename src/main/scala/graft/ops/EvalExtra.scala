package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second evaluation/semantics batch [N]: average precision (PR-AUC),
  * true null-aware NOT IN anti-join semantics, a corpus bigram
  * language-model quality score, and l-diversity — rounding out the
  * eval, join-semantics, privacy, and text-quality families. */
object EvalExtra extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  /** Average precision (the PR-AUC summary) per segment [N] — block-
    * tie definition over the bounded $1000 score-bin domain: bins are
    * visited in DESCENDING score order; a bin contributes
    * (pos_in_bin / total_pos) · (cumTP / cumN), i.e. recall gained
    * times precision at the block end — the deterministic tie
    * handling a bounded-bin AP needs (row-level AP is ill-defined
    * under ties). Each term re-pins at 12dp and sums as
    * decimal(24,12) (order-invariant); cum counts are exact window
    * sums over the bin domain, never raw rows. */
  private def averagePrecision(s: SparkSession, d: String): DataFrame = {
    val cells = Synth.scoreCells(s, d) // the SAME domain eval_auc ranks over
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col("g"))
    cells
      .withColumn("ctp", sum(col("np")).over(w))
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("ptot", sum(col("np")).over(wtot))
      .filter(col("ptot") > 0)
      .select(col("g"), col("ptot"),
        bround((dd(col("np")) / dd(col("ptot"))) *
          (dd(col("ctp")) / dd(col("cn"))), 12)
          .cast("decimal(24,12)").as("t"))
      .groupBy(col("g"))
      .agg(max(col("ptot")).as("npos"),
        bround(dd(sum(col("t"))), 6).as("avg_precision"))
      .orderBy("g")
  }

  /** True NOT IN (null-aware anti join) semantics [N]: customers whose
    * possibly-NULL key is NOT IN a non-empty subquery list. NULL probe
    * keys are dropped (NULL NOT IN (...) is never TRUE) — the exact
    * SQL semantics a plain left_anti rewrite gets wrong (the Q16
    * precondition, here exercised rather than assumed). Declared
    * through `spark.sql` so Catalyst plans its single-column
    * null-aware anti join (broadcast-able at any corpus scale: the
    * list side is dimension-bounded). */
  private def nullAwareAnti(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_naaj_customer")
    Tables.supplier(s, d).createOrReplaceTempView("graft_naaj_supplier")
    s.sql(
      """SELECT c_custkey, c_nationkey
        |FROM (SELECT c_custkey, c_nationkey,
        |             nullif(c_nationkey, 5) AS k
        |      FROM graft_naaj_customer)
        |WHERE k NOT IN (SELECT s_nationkey FROM graft_naaj_supplier
        |                WHERE s_nationkey < 10)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Corpus bigram language model score [N] (the CCNet-style LM
    * quality filter, one level up from `text_logprob`'s unigram):
    * p(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V) with add-one smoothing
    * over the observed vocabulary V; each conditional log prob pins
    * at 6dp, the per-doc mean rounds at 4dp (the `text_logprob`
    * acceptance). Scale shape: one explode into adjacent pairs, one
    * equi-join against the bigram count relation (vocabulary-scale,
    * not corpus-scale), unigram totals and V as broadcasts. */
  private def bigramLm(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      // guard: Spark's sequence(1, 0) counts DOWN, so a 1-word doc
      // would fabricate a pair — DuckDB's generate_series is empty there
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
      )).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val uni = pairs.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    pairs
      .join(big, Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        bround(log(dd(col("cb") + 1) / dd(col("cu") + col("v"))), 6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        bround(sum(col("lp").cast("decimal(12,6)")).cast("double") / count(lit(1)), 4).as("mean_lp"))
      .orderBy("doc_id")
  }

  /** l-diversity audit [N] — the companion to `quality_k_anonymity`:
    * per quasi-identifier group (segment × nation), the number of
    * DISTINCT sensitive values (account-balance $100 bins); groups
    * with fewer than l = 3 distinct values are flagged (a k-anonymous
    * group can still leak if every member shares the sensitive
    * value). One distinct-agg into the bounded group domain. */
  private def lDiversity(s: SparkSession, d: String): DataFrame = {
    val l = 3L
    Tables.customer(s, d)
      .select(col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("string").as("nation"),
        expr("(cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)) div 10000")
          .as("sens"))
      .groupBy(col("seg"), col("nation"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("sens")).as("l_distinct"))
      .withColumn("diverse", col("l_distinct") >= l)
      .orderBy("seg", "nation")
  }

  /** t-closeness audit [N] — completes the k-anonymity / l-diversity
    * privacy battery (Li, Li & Venkatasubramanian 2007): a
    * quasi-identifier group leaks if its SENSITIVE-value distribution
    * diverges from the global one, measured by Earth Mover's Distance.
    * For an ordered attribute with m distinct values, EMD is the
    * normalized sum of absolute cumulative differences:
    * (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)|. Everything stays RATIONAL:
    * per-value cumulative residuals r_i = Σ(cnt_gj·N − cnt_j·n_g) are
    * exact bigints (|r| ≤ n_g·N, ~2·10¹⁴ even at SF100 — inside
    * int64), the t ≤ 0.2 flag is the cross-multiplied integer compare
    * 5·Σ|r_i| ≤ n_g·N·(m−1), and the reported emd is ONE double
    * division of identical exact operands — bit-equal on both engines.
    *
    * Scale shape: two hash aggs into bounded domains (groups × values;
    * the sensitive bins are $1000 buckets, ≤ a dozen values), then all
    * arithmetic on dimension-sized relations via broadcast. The only
    * corpus-scale work is the counting scan. */
  private def tCloseness(s: SparkSession, d: String): DataFrame = {
    val sens =
      expr("(cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint)) div 100000")
    val rows = Tables.customer(s, d)
      .select(col("c_mktsegment").as("seg"),
        col("c_nationkey").cast("string").as("nation"), sens.as("sens"))
    val glob = rows.groupBy(col("sens")).agg(count(lit(1)).as("cnt_all"))
    val tot = rows.agg(count(lit(1)).as("n_all"),
      countDistinct(col("sens")).as("m"))
    val grp = rows.groupBy(col("seg"), col("nation"))
      .agg(count(lit(1)).as("n_g"))
    val gsv = rows.groupBy(col("seg"), col("nation"), col("sens"))
      .agg(count(lit(1)).as("cnt_g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seg"), col("nation")).orderBy(col("sens"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grp.crossJoin(broadcast(glob))
      .join(gsv, Seq("seg", "nation", "sens"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("diff",
        coalesce(col("cnt_g"), lit(0L)) * col("n_all")
          - col("cnt_all") * col("n_g"))
      .withColumn("r", sum(col("diff")).over(w))
      .groupBy(col("seg"), col("nation"))
      .agg(max(col("n_g")).as("n"), max(col("n_all")).as("n_all"),
        max(col("m")).as("m"), sum(abs(col("r"))).as("num"))
      .select(col("seg"), col("nation"), col("n"),
        (col("num").cast("double") /
          (col("n") * col("n_all") * (col("m") - 1)).cast("double"))
          .as("emd"),
        (col("num") * 5 <= col("n") * col("n_all") * (col("m") - 1))
          .as("t_close"))
      .orderBy("seg", "nation")
  }

  private val tClosenessOracle =
    """WITH rows_ AS (
      |  SELECT c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nation,
      |         (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
      |           // 100000 AS sens
      |  FROM customer),
      |gdist AS (SELECT sens, count(*) AS cnt_all FROM rows_ GROUP BY sens),
      |tot AS (SELECT count(*) AS n_all, count(DISTINCT sens) AS m FROM rows_),
      |grp AS (SELECT seg, nation, count(*) AS n_g FROM rows_ GROUP BY 1, 2),
      |gsv AS (SELECT seg, nation, sens, count(*) AS cnt_g
      |        FROM rows_ GROUP BY 1, 2, 3),
      |dom AS (
      |  SELECT g.seg, g.nation, g.n_g, gl.sens, gl.cnt_all,
      |         COALESCE(v.cnt_g, 0) AS cnt_g, t.n_all, t.m
      |  FROM grp g CROSS JOIN gdist gl
      |  LEFT JOIN gsv v ON v.seg = g.seg AND v.nation = g.nation
      |                 AND v.sens = gl.sens
      |  CROSS JOIN tot t),
      |cum AS (
      |  SELECT seg, nation, n_g, n_all, m,
      |         sum(cnt_g * n_all - cnt_all * n_g) OVER (
      |           PARTITION BY seg, nation ORDER BY sens
      |           ROWS UNBOUNDED PRECEDING) AS r
      |  FROM dom)
      |SELECT seg, nation, max(n_g) AS n,
      |       CAST(sum(abs(r)) AS DOUBLE) /
      |         CAST(max(n_g) * max(n_all) * (max(m) - 1) AS DOUBLE) AS emd,
      |       sum(abs(r)) * 5 <= max(n_g) * max(n_all) * (max(m) - 1)
      |         AS t_close
      |FROM cum GROUP BY seg, nation
      |ORDER BY seg, nation""".stripMargin

  /** Kaplan-Meier survival estimator [N] — fulfillment "survival" per
    * ship-delay day: subjects are lineitems, survival time is the
    * order→ship gap in days, a death is a fulfilled line ('F'), other
    * lines censor at their gap. Per day t: at-risk n_t = N − Σ_{u<t}
    * (deaths+censored), hazard factor 1 − d_t/n_t pinned at 12dp, and
    * S(t) = Π factors via the repo's `graft_product` window aggregate
    * over the CALENDAR-BOUNDED day domain (DuckDB's `product()` window
    * mirrors the strict ordered fold — the `fin_compound_return`
    * acceptance). One orders⋈lineitem equi-join + one hash agg into
    * the day-gap domain (≈4.7k distinct days across the synthetic
    * 13-year calendar — bounded by calendar span, not data volume);
    * everything after is domain-sized. */
  private def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSurv = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val days = Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("t"),
        (col("l_linestatus") === "F").as("death"))
      .groupBy(col("t"))
      .agg(sum(when(col("death"), 1L).otherwise(0L)).as("dt"),
        count(lit(1)).as("et"))
    val total = days.agg(sum(col("et")).as("n"))
    days.crossJoin(broadcast(total))
      .withColumn("n_t", col("n") - coalesce(sum(col("et")).over(wRisk), lit(0L)))
      .withColumn("f", bround(lit(1.0) - dd(col("dt")) / dd(col("n_t")), 12))
      .select(col("t"), col("n_t"), col("dt"),
        bround(call_function("graft_product", col("f")).over(wSurv), 8)
          .as("survival"))
      .orderBy("t")
  }

  /** Nelson-Aalen cumulative-hazard estimator [N] — the counting-
    * process companion to `stats_kaplan_meier` over the SAME
    * fulfillment relation: H(t) = Σ_{u≤t} d_u/n_u (Aalen 1978), the
    * estimator survival analysis prefers when the hazard itself (not
    * the survival curve) is the quantity of interest. Each increment
    * pins at 12dp and accumulates as DECIMAL(16,12) — an EXACT
    * order-invariant window sum (the `stats_sprt` LLR discipline),
    * unlike a raw double cumsum whose value would depend on frame
    * evaluation order; one cast to double + 8dp at the boundary.
    * Same scale shape as KM: one equi-join + hash agg into the
    * calendar-bounded day domain. */
  private def nelsonAalen(s: SparkSession, d: String): DataFrame = {
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val days = Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("t"),
        (col("l_linestatus") === "F").as("death"))
      .groupBy(col("t"))
      .agg(sum(when(col("death"), 1L).otherwise(0L)).as("dt"),
        count(lit(1)).as("et"))
    val total = days.agg(sum(col("et")).as("n"))
    days.crossJoin(broadcast(total))
      .withColumn("n_t", col("n") - coalesce(sum(col("et")).over(wRisk), lit(0L)))
      .withColumn("h", bround(dd(col("dt")) / dd(col("n_t")), 12)
        .cast("decimal(16,12)"))
      .select(col("t"), col("n_t"), col("dt"),
        bround(sum(col("h")).over(wCum).cast("double"), 8).as("cum_hazard"))
      .orderBy("t")
  }

  /** BM25 ranking [N] (Robertson/Lucene form, k1=1.2, b=0.75) for a
    * fixed 3-term query over the documents corpus — the standard
    * full-text relevance scorer the inverted-index family serves.
    * idf = ln(1 + (N−df+0.5)/(df+0.5)) pinned at 6dp; each term's
    * contribution re-pins at 8dp and sums as decimal(18,8) so the
    * per-doc score is order-invariant; top 20 by (score, doc_id).
    * Scale shape: one explode → (doc,term) tf hash agg filtered to the
    * 3 probe terms (map-side), df/avgdl/N as 1-row broadcasts. */
  private def bm25(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("w").isin(bm25Terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    bm25Score(dl, tf)
  }

  private val bm25Terms = Seq("stream", "query", "filter")

  /** The BM25(k1=1.2, b=0.75) scorer over prepared (doc_id, dl) and
    * (doc_id, w, tf) relations — shared by the batch key and the
    * incremental index's serve, so the two can never drift. */
  private def bm25Score(dl: DataFrame, tf: DataFrame): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("toktot"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", dd(col("toktot")) / dd(col("nd")))
      .withColumn("idf",
        bround(log(lit(1.0) + (dd(col("nd")) - dd(col("df")) + lit(0.5)) /
          (dd(col("df")) + lit(0.5))), 6))
      .withColumn("c", bround(col("idf") * (dd(col("tf")) * lit(2.2)) /
        (dd(col("tf")) + lit(1.2) *
          (lit(0.25) + lit(0.75) * dd(col("dl")) / col("avgdl"))), 8)
        .cast("decimal(18,8)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), dd(sum(col("c"))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** One micro-batch of INCREMENTAL BM25 index maintenance [N] (r14) —
    * the lexical-retrieval lifecycle leg: tokenization (the expensive
    * map over raw text) runs ONCE per document at its arrival epoch,
    * persisting per-epoch doc lengths and full postings; serving
    * recomputes the global statistics BM25 needs (N, avgdl, per-term
    * df) from the aggregate sub-tables at query time, so scores are
    * always consistent with the corpus as of the latest epoch — no
    * reach-back rewrite is ever needed (the reason search engines
    * structure their indexes this way: postings are immutable per doc,
    * collection stats are cheap serve-time folds). Store: `dl`
    * (doc_id, dl), `tf` (doc_id, w, tf) — epoch-partitioned,
    * replay-idempotent, cross-epoch re-delivery anti-joined out.
    * Serve = [[bm25Score]] over the folded store, so incremental ≡
    * batch by construction and the full-recompute oracle certifies it
    * by hash. */
  def bm25Delta(batchIn: DataFrame, storeDir: String, epoch: Long): DataFrame = {
    graft.pipeline.StoreCompact.assertNotCompacting(storeDir)
    import graft.Ckpt.CutOps
    val s = batchIn.sparkSession
    val batch = batchIn.select(col("doc_id"), col("text")).cut()
    val seen =
      if (graft.Hfs.exists(s"$storeDir/dl"))
        s.read.parquet(s"$storeDir/dl")
          .filter(col("epoch").cast("long") =!= epoch).select("doc_id")
      else batch.select("doc_id").limit(0)
    val fresh = batch.join(seen, Seq("doc_id"), "left_anti").cut()
    val toks = fresh
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    def writeEpoch(df: DataFrame, sub: String): Unit =
      df.write.mode("overwrite").parquet(s"$storeDir/$sub/epoch=$epoch")
    writeEpoch(toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")), "dl")
    writeEpoch(toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf")), "tf")
    bm25ServeFromStore(s, storeDir)
  }

  /** Serve the pinned query terms from a [[bm25Delta]] store. */
  def bm25ServeFromStore(s: SparkSession, storeDir: String): DataFrame =
    bm25Score(
      s.read.parquet(s"$storeDir/dl").select("doc_id", "dl"),
      s.read.parquet(s"$storeDir/tf").select("doc_id", "w", "tf")
        .filter(col("w").isin(bm25Terms: _*)))

  /** Registered lifecycle key: two delta epochs (80/20 doc-id split),
    * served after the second; oracle = the batch `text_bm25` SQL, so
    * hash equality proves the incremental index serves exactly the
    * full-corpus scores. */
  private def bm25Incremental(s: SparkSession, d: String): DataFrame = {
    val docsDf = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val split =
      (docsDf.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 4L / 5L
    val dir = graft.Scratch.dir(
      s"bm25_incr-${java.util.UUID.randomUUID()}")
    bm25Delta(docsDf.filter(col("doc_id") < split), dir, 0L): Unit
    bm25Delta(docsDf.filter(col("doc_id") >= split), dir, 1L)
  }

  /** Sequential probability ratio test [N] (Wald's SPRT) — the
    * always-valid A/B monitor: per order-day, the cumulative
    * log-likelihood ratio for H1: P(fulfilled) = 0.55 vs H0: 0.5,
    * with Wald boundaries ±ln(19) (α = β = 0.05). ENTIRELY exact:
    * the two per-observation log terms and the boundary are pinned
    * 9dp DECIMAL LITERALS (no runtime ln anywhere), so
    * LLR = K·ln(p1/p0) + (N−K)·ln((1−p1)/(1−p0)) is exact decimal
    * arithmetic over exact cumulative counts. Day-domain windows
    * (calendar-bounded); one hash agg over the scan. */
  private def sprt(s: SparkSession, d: String): DataFrame = {
    val c1 = "CAST(0.095310180 AS DECIMAL(12,9))"   // ln(0.55/0.5)
    val c2 = "CAST(-0.105360516 AS DECIMAL(12,9))"  // ln(0.45/0.5)
    val bound = "CAST(2.944438979 AS DECIMAL(12,9))" // ln((1-0.05)/0.05)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f"),
        count(lit(1)).as("n"))
      .withColumn("k", sum(col("f")).over(w))
      .withColumn("nn", sum(col("n")).over(w))
      .withColumn("llr", expr(s"k * $c1 + (nn - k) * $c2"))
      .select(col("day"), col("nn").as("n_seen"), col("k").as("k_pos"),
        dd(col("llr")).as("llr"),
        expr(s"""CASE WHEN llr >= $bound THEN 'accept_h1'
                 |     WHEN llr <= -$bound THEN 'accept_h0'
                 |     ELSE 'continue' END""".stripMargin).as("decision"))
      .orderBy("day")
  }

  /** Benjamini-Hochberg FDR control [N] — the multiple-testing
    * correction every metrics warehouse needs once it tests hundreds
    * of segments at once. m = 100 hypotheses derived from the customer
    * domain; the null p-values are md5-uniform on a 2^16 grid and a
    * PLANTED 20-hypothesis signal block draws p-values 1000× smaller
    * (the spec checks the procedure finds mostly planted signals).
    * ENTIRELY exact: p-values are rationals num/den on known
    * denominators, the sort key is num·(LCM/den), and the BH
    * condition p_(k) ≤ k·α/m with α = 1/20 becomes the INTEGER
    * comparison num·m·20 ≤ k·den — no float decision anywhere; the
    * reported double p-value is one mirrored IEEE division. Domain-
    * sized windows over m = 100 rows. */
  private def benjaminiHochberg(s: SparkSession, d: String): DataFrame = {
    val m = 100
    val hyp = Tables.customer(s, d)
      .select(pmod(col("c_custkey"), lit(m)).as("hid")).distinct()
      .withColumn("planted", col("hid") < 20)
      .withColumn("num",
        Synth.hexCoin(col("hid"), "p", 4) + 1) // 1..65536
      .withColumn("den",
        when(col("planted"), lit(65536000L)).otherwise(lit(65536L)))
    val wRank = Window.orderBy(col("okey"), col("hid"))
    val ranked = hyp
      // exact fraction ordering: num/den ASC == num*(LCM/den) ASC
      .withColumn("okey", col("num") * expr("65536000 div den"))
      .withColumn("k", row_number().over(wRank))
      // BH: p_(k) <= k*alpha/m  <=>  num*m*20 <= k*den (alpha = 1/20)
      .withColumn("cond",
        col("num") * lit(m.toLong * 20) <= col("k") * col("den"))
    val kmax = ranked.agg(
      coalesce(max(when(col("cond"), col("k"))), lit(0)).as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("hid"), col("planted"),
        (dd(col("num")) / dd(col("den"))).as("pval"),
        col("k"), (col("k") <= col("kmax")).as("rejected"))
      .orderBy("k")
  }

  /** Benjamini–Yekutieli FDR control [N] (Benjamini & Yekutieli 2001) —
    * the arbitrary-dependence-safe sibling of [[benjaminiHochberg]] on
    * the SAME 100-hypothesis battery: the step-up threshold shrinks by
    * the harmonic factor c(m) = Σ_{i≤m} 1/i, valid under ANY p-value
    * correlation (BH assumes independence/PRDS). c(100) is pinned as
    * the exact rational 5187378/10⁶ (⌈c·10⁶⌉ — rounding UP keeps the
    * procedure conservative, never anti-conservative), so the step-up
    * comparison stays pure int64: num·2000·5187378 ≤ k·den·10⁶. Both
    * decisions ship side by side — BY rejections ⊆ BH rejections by
    * construction (asserted in Round9bSpec). */
  private def benjaminiYekutieli(s: SparkSession, d: String): DataFrame = {
    val m = 100
    val hyp = Tables.customer(s, d)
      .select(pmod(col("c_custkey"), lit(m)).as("hid")).distinct()
      .withColumn("planted", col("hid") < 20)
      .withColumn("num", Synth.hexCoin(col("hid"), "p", 4) + 1)
      .withColumn("den",
        when(col("planted"), lit(65536000L)).otherwise(lit(65536L)))
    val wRank = Window.orderBy(col("okey"), col("hid"))
    val ranked = hyp
      .withColumn("okey", col("num") * expr("65536000 div den"))
      .withColumn("k", row_number().over(wRank))
      .withColumn("cond_bh",
        col("num") * lit(m.toLong * 20) <= col("k") * col("den"))
      .withColumn("cond_by",
        col("num") * lit(m.toLong * 20) * lit(5187378L) <=
          col("k") * col("den") * lit(1000000L))
    val kmax = ranked.agg(
      coalesce(max(when(col("cond_bh"), col("k"))), lit(0)).as("kmax_bh"),
      coalesce(max(when(col("cond_by"), col("k"))), lit(0)).as("kmax_by"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("hid"), col("planted"),
        (dd(col("num")) / dd(col("den"))).as("pval"), col("k"),
        (col("k") <= col("kmax_bh")).as("rejected_bh"),
        (col("k") <= col("kmax_by")).as("rejected_by"))
      .orderBy("k")
  }

  private val benjaminiYekutieliOracle =
    """WITH hyp AS (
      |  SELECT hid, hid < 20 AS planted,
      |         (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
      |         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
      |         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
      |         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) + 1 AS num,
      |         CASE WHEN hid < 20 THEN 65536000 ELSE 65536 END AS den
      |  FROM (SELECT hid, substr(md5(CAST(hid AS VARCHAR) || ':p'), 1, 4) AS h
      |        FROM (SELECT DISTINCT c_custkey % 100 AS hid FROM customer))),
      |ranked AS (
      |  SELECT hid, planted, num, den,
      |         CAST(row_number() OVER (ORDER BY num * (65536000 // den), hid)
      |              AS INTEGER) AS k
      |  FROM hyp),
      |c AS (SELECT *,
      |        num * 2000 <= k * den AS cond_bh,
      |        CAST(num AS BIGINT) * 2000 * 5187378
      |          <= CAST(k AS BIGINT) * den * 1000000 AS cond_by
      |      FROM ranked),
      |km AS (SELECT coalesce(max(CASE WHEN cond_bh THEN k END), 0) AS kmax_bh,
      |              coalesce(max(CASE WHEN cond_by THEN k END), 0) AS kmax_by
      |       FROM c)
      |SELECT hid, planted,
      |       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pval,
      |       k, k <= km.kmax_bh AS rejected_bh, k <= km.kmax_by AS rejected_by
      |FROM c, km ORDER BY k""".stripMargin

  /** The full precision/recall operating curve per segment [N] — one
    * row per distinct score threshold (descending $1000 bin), with the
    * exact confusion counts at "predict positive iff score ≥ t". The
    * materialized form of what `eval_avg_precision` summarizes: window
    * cumsums over the bounded bin domain, ratios of exact ints — no
    * pinning needed. */
  private def prCurve(s: SparkSession, d: String): DataFrame = {
    val cells = Synth.scoreCells(s, d)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col("g"))
    cells
      .withColumn("tp", sum(col("np")).over(w))
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("ptot", sum(col("np")).over(wtot))
      .filter(col("ptot") > 0)
      .select(col("g"), col("v").as("threshold"),
        col("tp"), (col("cn") - col("tp")).as("fp"),
        (col("ptot") - col("tp")).as("fn"),
        (dd(col("tp")) / dd(col("cn"))).as("precision"),
        (dd(col("tp")) / dd(col("ptot"))).as("recall"))
      .orderBy(col("g"), col("threshold").desc)
  }

  private val prCurveOracle =
    """WITH cells AS (
      |  SELECT o_orderpriority AS g,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |           // 100000 AS v,
      |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np,
      |         count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |c AS (
      |  SELECT g, v,
      |         sum(np) OVER (PARTITION BY g ORDER BY v DESC
      |                       ROWS UNBOUNDED PRECEDING) AS tp,
      |         sum(n) OVER (PARTITION BY g ORDER BY v DESC
      |                      ROWS UNBOUNDED PRECEDING) AS cn,
      |         sum(np) OVER (PARTITION BY g) AS ptot
      |  FROM cells)
      |SELECT g, v AS threshold, CAST(tp AS BIGINT) AS tp,
      |       CAST(cn - tp AS BIGINT) AS fp,
      |       CAST(ptot - tp AS BIGINT) AS fn,
      |       CAST(tp AS DOUBLE) / CAST(cn AS DOUBLE) AS precision,
      |       CAST(tp AS DOUBLE) / CAST(ptot AS DOUBLE) AS recall
      |FROM c WHERE ptot > 0
      |ORDER BY g, threshold DESC""".stripMargin

  /** Group-fairness audit [N] — demographic parity over the market
    * segments: selection rate of the "high-value order" decision per
    * segment, statistical parity difference vs the overall rate, and
    * the disparate-impact ratio vs the best-treated segment (the
    * EEOC four-fifths-rule denominator, chosen deterministically by
    * (rate, segment)). Exact counts through one broadcast dim join +
    * hash agg; every rate is ONE IEEE division. */
  private def demographicParity(s: SparkSession, d: String): DataFrame = {
    val dec = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"),
        (col("o_totalprice").cast("decimal(12,2)") >= 250000).as("pos"))
    val per = dec.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("np"))
    val tot = per.agg(sum(col("n")).as("tn"), sum(col("np")).as("tnp"))
    val best = per
      .select(max(struct((col("np").cast("double") / col("n").cast("double"))
        .as("rate"), col("seg"))).as("b"))
      .select(col("b.rate").as("best_rate"))
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(best))
      .selectExpr("seg", "cast(n as bigint) as n", "cast(np as bigint) as n_pos",
        "cast(np as double) / cast(n as double) as rate",
        "cast(np as double) / cast(n as double)" +
          " - cast(tnp as double) / cast(tn as double) as parity_diff",
        "(cast(np as double) / cast(n as double)) / best_rate" +
          " as disparate_impact")
      .orderBy("seg")
  }

  private val demographicParityOracle =
    """WITH dec AS (
      |  SELECT c.c_mktsegment AS seg,
      |         CAST(o_totalprice AS DECIMAL(12,2)) >= 250000 AS pos
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |per AS (
      |  SELECT seg, count(*) AS n,
      |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np
      |  FROM dec GROUP BY seg),
      |tot AS (SELECT sum(n) AS tn, sum(np) AS tnp FROM per),
      |best AS (
      |  SELECT max(struct_pack(rate := CAST(np AS DOUBLE) / CAST(n AS DOUBLE),
      |                         seg := seg)).rate AS best_rate
      |  FROM per)
      |SELECT seg, CAST(n AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos,
      |       CAST(np AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
      |       CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
      |         - CAST(tnp AS DOUBLE) / CAST(tn AS DOUBLE) AS parity_diff,
      |       (CAST(np AS DOUBLE) / CAST(n AS DOUBLE)) / best_rate
      |         AS disparate_impact
      |FROM per CROSS JOIN tot CROSS JOIN best
      |ORDER BY seg""".stripMargin

  /** Interpolated Kneser-Ney bigram LM [N] (Kneser-Ney 1995; Chen-
    * Goodman 1998 interpolated form) — the LM-quality scorer a CCNet-
    * style filter actually ships (absolute discounting + continuation
    * probability), one level up from `text_bigram_lm`'s add-one:
    * p(w2|w1) = (c(w1w2) − D)/c(w1·)
    *          + (D·N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··), D = 0.75.
    * Every count is an exact integer (bigram counts, per-context
    * continuation fan-out N1+(w1·), left-context type count N1+(·w2),
    * total bigram types); D = 3/4 is exact in binary, so the single
    * IEEE expression per bigram is the same shape both engines and
    * the per-term 6dp pinning plus the exact
    * decimal(12,6) sum (order-invariant — the r13 fix after a 4dp
    * boundary flip at sf0.1) is the `text_logprob` acceptance. Scale shape: one explode into adjacent pairs, then
    * VOCABULARY-scale hash aggs; the per-doc scoring join is an
    * equi-join on the bigram. */
  private def kneserNey(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
      )).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val uni = pairs.groupBy(col("w1"))
      .agg(count(lit(1)).as("cu"), countDistinct(col("w2")).as("n1"))
    val cont = big.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val types = big.agg(count(lit(1)).as("nt"))
    pairs
      .join(big, Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .join(broadcast(cont), Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("lp", bround(log(
        (dd(col("cb")) - 0.75) / dd(col("cu"))
          + (lit(0.75) * dd(col("n1")) / dd(col("cu")))
            * (dd(col("nc")) / dd(col("nt")))), 6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        bround(sum(col("lp").cast("decimal(12,6)")).cast("double") / count(lit(1)), 4).as("mean_lp"))
      .orderBy("doc_id")
  }

  /** Corpus BLEU-2 [N] (Papineni et al. 2002) — the canonical
    * generation-eval metric, here as the corpus-level pipeline shape:
    * candidates (odd doc_id) scored against references (the preceding
    * even doc_id), grouped by the candidate's source. Modified n-gram
    * precision = Σ clipped matches / Σ candidate n-grams (clip =
    * min(cand count, ref count) per n-gram type per pair — all exact
    * integers via one explode + per-pair hash aggs and a left join);
    * brevity penalty and the geometric mean are the only IEEE ops,
    * same shape both engines. Scale: everything is equi-join +
    * hash-agg on (pair × n-gram type); no quadratic stage. */
  private def bleu(s: SparkSession, d: String): DataFrame = {
    def grams(side: DataFrame, cnt: String): DataFrame = side
      .select(col("pid"), col("source"), split(col("text"), " ").as("ws"))
      .select(col("pid"), col("source"), explode(expr(
        """concat(
          |  transform(sequence(1, size(ws)), i -> struct(1 AS n, ws[i - 1] AS g)),
          |  CASE WHEN size(ws) >= 2 THEN
          |    transform(sequence(1, size(ws) - 1),
          |              i -> struct(2 AS n, concat(ws[i - 1], ' ', ws[i]) AS g))
          |  ELSE CAST(array() AS ARRAY<STRUCT<n: INT, g: STRING>>) END)"""
        .stripMargin)).as("t"))
      .groupBy(col("pid"), col("source"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as(cnt))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
    val cand = docs.filter(col("doc_id") % 2 === 1)
      .select(expr("doc_id div 2").as("pid"), col("text"), col("source"))
    val ref = docs.filter(col("doc_id") % 2 === 0)
      .select(expr("doc_id div 2").as("pid"), col("text"), col("source"))
    // pairs must exist on both sides: clip ref counts into cand grams
    val cg = grams(cand.join(ref.select(col("pid")), Seq("pid")), "cc")
    val rg = grams(ref.join(cand.select(col("pid")), Seq("pid")), "rc")
      .drop("source")
    val per = cg.join(rg, Seq("pid", "n", "g"), "left")
      .groupBy(col("source"), col("n"))
      .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("m"),
        sum(col("cc")).as("t"))
    val prec = per.groupBy(col("source"))
      .agg(max(when(col("n") === 1, col("m"))).as("m1"),
        max(when(col("n") === 1, col("t"))).as("t1"),
        max(when(col("n") === 2, col("m"))).as("m2"),
        max(when(col("n") === 2, col("t"))).as("t2"))
    val lens = cg.filter(col("n") === 1)
      .groupBy(col("source")).agg(sum(col("cc")).as("clen"))
      .join(rg.join(cg.select(col("pid"), col("source")).distinct(), Seq("pid"))
          .filter(col("n") === 1)
          .groupBy(col("source")).agg(sum(col("rc")).as("rlen")),
        Seq("source"))
    prec.join(lens, Seq("source"))
      .select(col("source"),
        bround(dd(col("m1")) / dd(col("t1")), 8).as("p1"),
        bround(dd(col("m2")) / dd(col("t2")), 8).as("p2"),
        bround(when(col("clen") > col("rlen"), lit(1.0))
          .otherwise(exp(lit(1.0) - dd(col("rlen")) / dd(col("clen")))), 8)
          .as("bp"),
        bround(
          when(col("clen") > col("rlen"), lit(1.0))
            .otherwise(exp(lit(1.0) - dd(col("rlen")) / dd(col("clen"))))
            * exp(lit(0.5) * (log(dd(col("m1")) / dd(col("t1")))
              + log(dd(col("m2")) / dd(col("t2"))))), 8).as("bleu"))
      .orderBy("source")
  }

  /** ROUGE-1/ROUGE-2 [N] (Lin 2004) per source over the same odd/even
    * candidate↔reference pairing as [[bleu]] — the recall-oriented
    * counterpart BLEU's precision misses: clipped n-gram overlap
    * m = Σ_g min(count_cand, count_ref) over BOTH totals,
    * precision = m/Σcand, recall = m/Σref, F1 = 2PR/(P+R).
    * Counts are exact longs; each ratio is one mirrored double
    * division, F1 one mirrored double expression (0 when m = 0, so no
    * 0/0). Scale shape identical to BLEU: two corpus-scale explodes
    * into per-pair gram counts, one equi-join on (pid, n, gram), one
    * hash agg into the bounded source domain. */
  private def rouge(s: SparkSession, d: String): DataFrame = {
    def grams(side: DataFrame, cnt: String): DataFrame = side
      .select(col("pid"), col("source"), split(col("text"), " ").as("ws"))
      .select(col("pid"), col("source"), explode(expr(
        """concat(
          |  transform(sequence(1, size(ws)), i -> struct(1 AS n, ws[i - 1] AS g)),
          |  CASE WHEN size(ws) >= 2 THEN
          |    transform(sequence(1, size(ws) - 1),
          |              i -> struct(2 AS n, concat(ws[i - 1], ' ', ws[i]) AS g))
          |  ELSE CAST(array() AS ARRAY<STRUCT<n: INT, g: STRING>>) END)"""
        .stripMargin)).as("t"))
      .groupBy(col("pid"), col("source"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as(cnt))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
    val cand = docs.filter(col("doc_id") % 2 === 1)
      .select(expr("doc_id div 2").as("pid"), col("text"), col("source"))
    val ref = docs.filter(col("doc_id") % 2 === 0)
      .select(expr("doc_id div 2").as("pid"), col("text"), col("source"))
    val cg = grams(cand.join(ref.select(col("pid")), Seq("pid")), "cc")
    // group ref grams under the CANDIDATE's source (the metric is
    // reported per candidate segment, exactly like eval_bleu)
    val rg = grams(ref.drop("source")
      .join(cand.select(col("pid"), col("source")), Seq("pid")), "rc")
    // full outer on the gram key: precision needs every cand gram,
    // recall every ref gram — a one-sided join would drop the
    // unmatched side's mass from its own total
    val per = cg.join(rg, Seq("pid", "source", "n", "g"), "full_outer")
      .groupBy(col("source"), col("n"))
      .agg(sum(least(coalesce(col("cc"), lit(0L)),
          coalesce(col("rc"), lit(0L)))).as("m"),
        sum(coalesce(col("cc"), lit(0L))).as("tc"),
        sum(coalesce(col("rc"), lit(0L))).as("tr"))
    per
      .select(col("source"), col("n"), col("m"), col("tc"), col("tr"),
        (dd(col("m")) / dd(col("tc"))).as("p"),
        (dd(col("m")) / dd(col("tr"))).as("r"))
      .withColumn("f1",
        when(col("m") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("p") * col("r") / (col("p") + col("r"))))
      .orderBy("source", "n")
  }

  private val rougeOracle =
    """WITH cand AS (
      |  SELECT doc_id // 2 AS pid, text, source FROM documents
      |  WHERE doc_id % 2 = 1),
      |ref AS (
      |  SELECT doc_id // 2 AS pid, text FROM documents WHERE doc_id % 2 = 0),
      |pairs AS (
      |  SELECT c.pid, c.source, c.text AS ct, r.text AS rt
      |  FROM cand c JOIN ref r USING (pid)),
      |cg AS (
      |  SELECT pid, source, n, g, count(*) AS cc FROM (
      |    SELECT pid, source, 1 AS n, ws[i] AS g
      |    FROM (SELECT pid, source, string_split(ct, ' ') AS ws FROM pairs),
      |         LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
      |    UNION ALL
      |    SELECT pid, source, 2 AS n, ws[i] || ' ' || ws[i + 1] AS g
      |    FROM (SELECT pid, source, string_split(ct, ' ') AS ws FROM pairs),
      |         LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i))
      |  GROUP BY 1, 2, 3, 4),
      |rg AS (
      |  SELECT pid, source, n, g, count(*) AS rc FROM (
      |    SELECT pid, source, 1 AS n, ws[i] AS g
      |    FROM (SELECT pid, source, string_split(rt, ' ') AS ws FROM pairs),
      |         LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
      |    UNION ALL
      |    SELECT pid, source, 2 AS n, ws[i] || ' ' || ws[i + 1] AS g
      |    FROM (SELECT pid, source, string_split(rt, ' ') AS ws FROM pairs),
      |         LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i))
      |  GROUP BY 1, 2, 3, 4),
      |per AS (
      |  SELECT source, n,
      |         sum(least(coalesce(cc, 0), coalesce(rc, 0))) AS m,
      |         sum(coalesce(cc, 0)) AS tc, sum(coalesce(rc, 0)) AS tr
      |  FROM cg FULL OUTER JOIN rg USING (pid, source, n, g)
      |  GROUP BY 1, 2),
      |pr AS (
      |  SELECT source, n, m, tc, tr,
      |         CAST(m AS DOUBLE) / CAST(tc AS DOUBLE) AS p,
      |         CAST(m AS DOUBLE) / CAST(tr AS DOUBLE) AS r
      |  FROM per)
      |SELECT source, n, CAST(m AS BIGINT) AS m, CAST(tc AS BIGINT) AS tc,
      |       CAST(tr AS BIGINT) AS tr, p, r,
      |       CASE WHEN m = 0 THEN 0.0
      |            ELSE 2.0 * p * r / (p + r) END AS f1
      |FROM pr ORDER BY source, n""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_kneser_ney" -> kneserNey,
    "eval_bleu" -> bleu,
    "eval_rouge" -> rouge,
    "eval_demographic_parity" -> demographicParity,
    "eval_pr_curve" -> prCurve,
    "stats_bh_fdr" -> benjaminiHochberg,
    "stats_by_fdr" -> benjaminiYekutieli,
    "eval_avg_precision" -> averagePrecision,
    "join_null_aware_anti" -> nullAwareAnti,
    "text_bigram_lm" -> bigramLm,
    "quality_l_diversity" -> lDiversity,
    "quality_t_closeness" -> tCloseness,
    "stats_kaplan_meier" -> kaplanMeier,
    "stats_nelson_aalen" -> nelsonAalen,
    "text_bm25" -> bm25,
    "text_bm25_incremental" -> bm25Incremental,
    "stats_sprt" -> sprt)

  private val bm25OracleSql =
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |                 CAST(sum(dl) AS BIGINT) AS toktot FROM dl),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
        |       WHERE w IN ('stream', 'query', 'filter') GROUP BY 1, 2),
        |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |c AS (
        |  SELECT tf.doc_id,
        |         CAST(round_even(
        |           round_even(ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |                              / (CAST(df AS DOUBLE) + 0.5)), 6)
        |           * (CAST(tf AS DOUBLE) * 2.2)
        |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |              / (CAST(toktot AS DOUBLE) / CAST(nd AS DOUBLE)))), 8)
        |         AS DECIMAL(18,8)) AS c
        |  FROM tf JOIN df USING (w) JOIN dl USING (doc_id), stats)
        |SELECT doc_id, count(*) AS n_terms, CAST(sum(c) AS DOUBLE) AS score
        |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "eval_demographic_parity" -> demographicParityOracle,
    "eval_pr_curve" -> prCurveOracle,
    "stats_by_fdr" -> benjaminiYekutieliOracle,
    "stats_bh_fdr" ->
      """WITH hyp AS (
        |  SELECT hid, hid < 20 AS planted,
        |         (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |         + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |         + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) + 1 AS num,
        |         CASE WHEN hid < 20 THEN 65536000 ELSE 65536 END AS den
        |  FROM (SELECT hid, substr(md5(CAST(hid AS VARCHAR) || ':p'), 1, 4) AS h
        |        FROM (SELECT DISTINCT c_custkey % 100 AS hid FROM customer))),
        |ranked AS (
        |  SELECT hid, planted, num, den,
        |         CAST(row_number() OVER (ORDER BY num * (65536000 // den), hid)
        |              AS INTEGER) AS k
        |  FROM hyp),
        |c AS (SELECT *, num * 2000 <= k * den AS cond FROM ranked),
        |km AS (SELECT coalesce(max(CASE WHEN cond THEN k END), 0) AS kmax FROM c)
        |SELECT hid, planted,
        |       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pval,
        |       k, k <= km.kmax AS rejected
        |FROM c, km ORDER BY k""".stripMargin,
    "eval_avg_precision" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS g,
        |         (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) // 100000 AS v,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np,
        |         count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT g, np,
        |         sum(np) OVER (PARTITION BY g ORDER BY v DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
        |         sum(n) OVER (PARTITION BY g ORDER BY v DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |         sum(np) OVER (PARTITION BY g) AS ptot
        |  FROM cells),
        |t AS (
        |  SELECT g, CAST(ptot AS BIGINT) AS ptot,
        |         CAST(round_even((CAST(np AS DOUBLE) / CAST(ptot AS DOUBLE))
        |                * (CAST(ctp AS DOUBLE) / CAST(cn AS DOUBLE)), 12)
        |              AS DECIMAL(24,12)) AS t
        |  FROM r WHERE ptot > 0)
        |SELECT g, max(ptot) AS npos,
        |       round_even(CAST(sum(t) AS DOUBLE), 6) AS avg_precision
        |FROM t GROUP BY g ORDER BY g""".stripMargin,
    "join_null_aware_anti" ->
      """SELECT c_custkey, c_nationkey
        |FROM (SELECT c_custkey, c_nationkey,
        |             nullif(c_nationkey, 5) AS k
        |      FROM customer)
        |WHERE k NOT IN (SELECT s_nationkey FROM supplier
        |                WHERE s_nationkey < 10)
        |ORDER BY c_custkey""".stripMargin,
    "text_bigram_lm" ->
      """WITH pairs AS (
        |  SELECT doc_id, w1, w2 FROM (
        |    SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |         LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i))),
        |big AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS cu FROM pairs GROUP BY 1),
        |vocab AS (
        |  SELECT count(DISTINCT w) AS v FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents))
        |SELECT p.doc_id, count(*) AS n_bigrams,
        |       round_even(CAST(sum(CAST(round_even(ln(CAST(b.cb + 1 AS DOUBLE)
        |                 / CAST(u.cu + vocab.v AS DOUBLE)), 6)
        |                 AS DECIMAL(12,6))) AS DOUBLE) / count(*), 4) AS mean_lp
        |FROM pairs p JOIN big b USING (w1, w2) JOIN uni u USING (w1), vocab
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "quality_t_closeness" -> tClosenessOracle,
    "quality_l_diversity" ->
      """SELECT c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nation,
        |       count(*) AS n,
        |       CAST(count(DISTINCT (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) // 10000) AS BIGINT) AS l_distinct,
        |       count(DISTINCT (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) // 10000) >= 3 AS diverse
        |FROM customer GROUP BY 1, 2 ORDER BY seg, nation""".stripMargin,
    "stats_kaplan_meier" ->
      """WITH days AS (
        |  SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS t,
        |         sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS dt,
        |         count(*) AS et
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(et) AS BIGINT) AS n FROM days),
        |r AS (
        |  SELECT t, CAST(dt AS BIGINT) AS dt,
        |         CAST(n - coalesce(sum(et) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_t
        |  FROM days, tot),
        |f AS (
        |  SELECT t, n_t, dt,
        |         round_even(1.0 - CAST(dt AS DOUBLE) / CAST(n_t AS DOUBLE), 12) AS f
        |  FROM r)
        |SELECT t, n_t, dt,
        |       round_even(product(f) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 8) AS survival
        |FROM f ORDER BY t""".stripMargin,
    "text_bm25" -> bm25OracleSql,
    "text_bm25_incremental" -> bm25OracleSql,
    "stats_sprt" ->
      """WITH days AS (
        |  SELECT o_orderdate AS day,
        |         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f,
        |         count(*) AS n
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT day,
        |         CAST(sum(f) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS k,
        |         CAST(sum(n) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nn
        |  FROM days),
        |l AS (
        |  SELECT day, nn, k,
        |         k * CAST(0.095310180 AS DECIMAL(12,9))
        |           + (nn - k) * CAST(-0.105360516 AS DECIMAL(12,9)) AS llr
        |  FROM c)
        |SELECT day, nn AS n_seen, k AS k_pos, CAST(llr AS DOUBLE) AS llr,
        |       CASE WHEN llr >= CAST(2.944438979 AS DECIMAL(12,9)) THEN 'accept_h1'
        |            WHEN llr <= -CAST(2.944438979 AS DECIMAL(12,9)) THEN 'accept_h0'
        |            ELSE 'continue' END AS decision
        |FROM l ORDER BY day""".stripMargin,
    "stats_nelson_aalen" ->
      """WITH days AS (
        |  SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS t,
        |         sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS dt,
        |         count(*) AS et
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(et) AS BIGINT) AS n FROM days),
        |r AS (
        |  SELECT t, CAST(dt AS BIGINT) AS dt,
        |         CAST(n - coalesce(sum(et) OVER (ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_t
        |  FROM days, tot),
        |h AS (
        |  SELECT t, n_t, dt,
        |         CAST(round_even(CAST(dt AS DOUBLE) / CAST(n_t AS DOUBLE), 12)
        |              AS DECIMAL(16,12)) AS h
        |  FROM r)
        |SELECT t, n_t, dt,
        |       round_even(CAST(sum(h) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 8)
        |         AS cum_hazard
        |FROM h ORDER BY t""".stripMargin,
    "text_kneser_ney" ->
      """WITH pairs AS (
        |  SELECT doc_id, w1, w2 FROM (
        |    SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |         LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i))),
        |big AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS cu, count(DISTINCT w2) AS n1
        |        FROM pairs GROUP BY 1),
        |cont AS (SELECT w2, count(*) AS nc FROM big GROUP BY 1),
        |types AS (SELECT count(*) AS nt FROM big)
        |SELECT p.doc_id, count(*) AS n_bigrams,
        |       round_even(CAST(sum(CAST(round_even(ln(
        |         (CAST(b.cb AS DOUBLE) - 0.75) / CAST(u.cu AS DOUBLE)
        |         + (0.75 * CAST(u.n1 AS DOUBLE) / CAST(u.cu AS DOUBLE))
        |         * (CAST(c.nc AS DOUBLE) / CAST(t.nt AS DOUBLE))), 6)
        |         AS DECIMAL(12,6))) AS DOUBLE) / count(*), 4) AS mean_lp
        |FROM pairs p JOIN big b USING (w1, w2) JOIN uni u USING (w1)
        |     JOIN cont c USING (w2), types t
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "eval_rouge" -> rougeOracle,
    "eval_bleu" ->
      """WITH cand AS (
        |  SELECT doc_id // 2 AS pid, text, source FROM documents
        |  WHERE doc_id % 2 = 1),
        |ref AS (
        |  SELECT doc_id // 2 AS pid, text FROM documents WHERE doc_id % 2 = 0),
        |pairs AS (
        |  SELECT c.pid, c.source, c.text AS ct, r.text AS rt
        |  FROM cand c JOIN ref r USING (pid)),
        |cg AS (
        |  SELECT pid, source, n, g, count(*) AS cc FROM (
        |    SELECT pid, source, 1 AS n, ws[i] AS g
        |    FROM (SELECT pid, source, string_split(ct, ' ') AS ws FROM pairs),
        |         LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
        |    UNION ALL
        |    SELECT pid, source, 2 AS n, ws[i] || ' ' || ws[i + 1] AS g
        |    FROM (SELECT pid, source, string_split(ct, ' ') AS ws FROM pairs),
        |         LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i))
        |  GROUP BY 1, 2, 3, 4),
        |rg AS (
        |  SELECT pid, n, g, count(*) AS rc FROM (
        |    SELECT pid, 1 AS n, ws[i] AS g
        |    FROM (SELECT pid, string_split(rt, ' ') AS ws FROM pairs),
        |         LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
        |    UNION ALL
        |    SELECT pid, 2 AS n, ws[i] || ' ' || ws[i + 1] AS g
        |    FROM (SELECT pid, string_split(rt, ' ') AS ws FROM pairs),
        |         LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i))
        |  GROUP BY 1, 2, 3),
        |per AS (
        |  SELECT source, n, sum(least(cc, coalesce(rc, 0))) AS m,
        |         sum(cc) AS t
        |  FROM cg LEFT JOIN rg USING (pid, n, g)
        |  GROUP BY 1, 2),
        |prec AS (
        |  SELECT source,
        |         max(CASE WHEN n = 1 THEN m END) AS m1,
        |         max(CASE WHEN n = 1 THEN t END) AS t1,
        |         max(CASE WHEN n = 2 THEN m END) AS m2,
        |         max(CASE WHEN n = 2 THEN t END) AS t2
        |  FROM per GROUP BY 1),
        |lens AS (
        |  SELECT source, sum(clen) AS clen, sum(rlen) AS rlen FROM (
        |    SELECT pid, source, len(string_split(ct, ' ')) AS clen,
        |           len(string_split(rt, ' ')) AS rlen
        |    FROM pairs) GROUP BY 1)
        |SELECT p.source,
        |       round_even(CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE), 8) AS p1,
        |       round_even(CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE), 8) AS p2,
        |       round_even(CASE WHEN clen > rlen THEN 1.0
        |         ELSE exp(1.0 - CAST(rlen AS DOUBLE) / CAST(clen AS DOUBLE))
        |         END, 8) AS bp,
        |       round_even(CASE WHEN clen > rlen THEN 1.0
        |         ELSE exp(1.0 - CAST(rlen AS DOUBLE) / CAST(clen AS DOUBLE))
        |         END
        |         * exp(0.5 * (ln(CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE))
        |           + ln(CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE)))), 8) AS bleu
        |FROM prec p JOIN lens USING (source)
        |ORDER BY source""".stripMargin)
}

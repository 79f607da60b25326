package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide plan hygiene: NO registered query may plan a nested-loop
  * or cartesian join unless its key is explicitly allowlisted with the
  * reason the shape is intentional and bounded. This is the regression
  * gate for "a refactor quietly turned a hash join into a nested loop"
  * — at 100 TB that plan change is an outage, and no per-key oracle
  * would notice (the result stays correct). */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Keys whose nested-loop/cross shape is deliberate AND bounded: one
    * side is a literal, a single-row probe, a k-row centroid/grid table,
    * or the key exists to DEMONSTRATE the naive plan. */
  private val allowed: Map[String, String] = Map(
    "join_range_interval" -> "the deliberate BNL demo (bounded build side)",
    "sim_search_cosine" -> "single-row probe crossJoin",
    "sim_search_ivf_kmeans" -> "k-row centroid broadcast",
    "sim_search_ivf_batch" -> "k-row centroid broadcast",
    "sim_search_ivf_saved" -> "k-row centroid broadcast",
    "sim_search_ivf_pq" -> "k-row centroid + m*k ADC table broadcasts",
    "sim_search_pq" -> "m*k-row ADC table broadcast",
    "sim_search_pq_served" -> "same ADC/probe broadcasts served from the store",
    "sim_search_quantized" -> "single-row probe crossJoin",
    "sim_search_batch" -> "bounded 20-probe broadcast",
    "sim_search_mips" -> "bounded 20-probe broadcast (batchTopK twin)",
    "sim_search_mips_augmented" -> ("bounded 20-probe + 1-row max-norm " +
      "broadcasts (norm-augmentation reduction)"),
    "dedup_jarowinkler" -> "bounded 50-probe broadcast",
    "join_scd2_pit" -> "4-row probe-grid crossJoin",
    "text_mix_temperature" -> "1-row cmax crossJoin",
    "agg_q22_opportunity" -> "1-row scalar-average broadcast (Q22's avg subquery)",
    "agg_q11_value" -> "1-row scalar-threshold broadcast (Q11's HAVING total)",
    "sim_search_kmeans_assign" -> "k-row pinned-centroid broadcast per Lloyd round",
    "sim_search_ivf_pinned" -> "k-row centroid + single-probe broadcasts",
    "sim_search_ivf_multi" -> ("k-row centroid + single-probe broadcasts " +
      "(2-assignment replica variant)"),
    "emb_knn_classify" -> "bounded 20-probe broadcast (batchTopK twin)",
    "sim_search_ivf_append" -> ("k-row saved-centroid broadcasts (build, " +
      "delta assign, and serve phases)"),
    "graph_triangles" -> "three 1-row count crossJoins at the root",
    "text_tfidf" -> "1-row corpus-doc-count crossJoin",
    "text_kneser_ney" -> "1-row bigram-type-count crossJoin",
    "text_logprob" -> "1-row corpus-total crossJoin",
    "agg_chisq" -> "1-row grand-total crossJoin over the r*c cell table",
    "basket_rules" -> "1-row basket-total crossJoin",
    "emb_hard_negatives" -> ("20-row probe broadcast with a label-" +
      "disequality condition (bounded: probes x corpus scan, like " +
      "sim_search_batch)"),
    "win_interval_diff" -> ("month-domain blackout broadcast, two bounded " +
      "non-equi joins (|A| x overlapping months)"),
    "graph_hits" -> ("1-row max-score normalization crossJoins (the raw " +
      "aggregates are checkpointed; the final normalize stays lazy)"),
    "graph_modularity" -> "1-row edge-count crossJoin at the root",
    "text_dsir_weights" -> "1-row corpus-total crossJoin",
    "feat_target_encode" -> "1-row global-prior crossJoin",
    "feat_woe_iv" -> "1-row class-totals crossJoin",
    "feat_quantile_bucket" -> "1-row row-total crossJoin over the bin domain",
    "stats_psi" -> "1-row bin/population-totals crossJoin",
    "text_bigram_lm" -> "1-row vocabulary-size crossJoin",
    "stats_kaplan_meier" -> "1-row subject-total crossJoin over the day domain",
    "stats_nelson_aalen" -> "1-row subject-total crossJoin over the day domain",
    "stats_bh_fdr" -> "1-row kmax crossJoin over the 100-hypothesis domain",
    "eval_brier" -> "1-row base-rate crossJoin over the 10-bin domain",
    "ts_changepoint" -> "1-row grand-total crossJoin over the day domain",
    "stats_runs_test" -> "1-row median/day-count crossJoins over the day domain",
    "agg_abc_pareto" -> "1-row revenue-total crossJoin over the part domain",
    "stats_mutual_info" -> "1-row total/entropy crossJoins over the 15-cell domain",
    "eval_scorecard" -> ("1-row metric crossJoins (composes eval_auc/brier/" +
      "mrr/psi, inheriting brier's and psi's allowlisted 1-row joins)"),
    "text_bm25" -> "1-row corpus-stats crossJoin",
    "text_bm25_incremental" ->
      "1-row corpus-stats crossJoin (the shared bm25Score scorer)",
    "stats_theil_sen" -> ("calendar-bounded day-domain pair join (t1 < t2," +
      " ~2.9M pairs at ANY SF) + 1-row median-slope crossJoin"),
    "stats_randomization" -> "1-row observed-diff crossJoin over the B-replicate domain",
    "stats_cramers_v" -> "1-row grand-total crossJoin over the r*c cell table (chisq twin)",
    "ts_anomaly" -> "1-row median/MAD crossJoins over the bounded month domain",
    "stats_ols_residuals" -> "1-row model-coefficients crossJoin (train + apply)",
    "eval_demographic_parity" -> "1-row overall/best-rate crossJoins over the 5-segment domain",
    "stats_naive_bayes" -> ("|classes|-row classDim broadcast over test " +
      "tokens + 1-row doc-count crossJoin (lang domain is bounded)"),
    "stats_tree_stump" -> "1-row total crossJoin over the threshold grid",
    "stats_logistic_gd" -> "1-row pinned-weights crossJoin per GD round",
    "quality_t_closeness" -> ("1-row global-distribution/total crossJoins " +
      "over the bounded sensitive-value domain"),
    "ts_mann_kendall" -> ("calendar-bounded month-domain pair join " +
      "(~84^2/2 pairs at ANY SF) + 1-row n/tie-term crossJoins"),
    "stats_kendall_tau" -> ("bounded cell-domain pair join (price bins x " +
      "months, ≤ ~2.6k cells at ANY SF — the mann_kendall/theil_sen " +
      "pattern) + 1-row margin/total crossJoins"),
    "stats_kruskal_wallis" -> ("1-row N crossJoins over the bounded " +
      "(group x price-bin) rank domain"),
    "stats_friedman" -> "1-row block-count crossJoin over the 5-treatment domain",
    "stats_isotonic" -> ("10-bin PAV: 1-row first-violator crossJoin per " +
      "merge round + the bounded pool<=bin map-back join"),
    "attr_shapley" -> ("16-subset lattice mask joins ((m & st) = m — " +
      "domain fixed at 2^k regardless of SF) + channel-bit join"),
    "sim_search_truncated" -> "single-row probe crossJoin (cosineTopK twin)",
    "agg_time_decay" -> ("1-row max-date crossJoins over the calendar-" +
      "bounded day domain (the decay-weight dim itself broadcasts)"),
    "text_rag_retrieve" -> "1-row corpus-stats crossJoin (text_bm25 twin)",
    "fin_cointegration" -> ("1-row hedge-model crossJoin over the bounded " +
      "month domain (Engle-Granger second stage)"),
    "ts_ljung_box" -> "1-row diff-stats crossJoin over the bounded month domain",
    "eval_conformal" -> ("1-row margin/total crossJoins (calibration " +
      "quantile + coverage totals, same class as stats_kruskal_wallis)"),
    "stats_cuped" -> ("1-row pooled-theta broadcast crossJoin over the " +
      "2-row variant relation"),
    "sim_search_radius" -> ("bounded 20-probe broadcast with a " +
      "disequality condition (batchTopK twin minus the top-k state)"),
    "stats_by_fdr" -> ("1-row kmax crossJoin over the 100-hypothesis " +
      "domain (stats_bh_fdr twin)"),
    "stats_tukey_hsd" -> ("5-row group self-join (g1 < g2, 10 pairs) " +
      "+ 1-row MSE broadcast crossJoin"),
    "stats_g_test" -> "1-row grand-total crossJoin over the r*c cell table (chisq twin)",
    "dedup_minhash" -> ("1-row edge-touched-doc-count band_ok crossJoin " +
      "(r10 promoted driver gate)"),
    "dedup_simhash" -> "1-row pair-count band_ok crossJoin (r10 promoted driver gate)",
    "dedup_minhash_mllib" -> ("1-row pair-count band_ok crossJoin (r10 " +
      "promoted driver gate)"))
  // pref_bradley_terry normalizes via a 1-row broadcast crossJoin per MM
  // round, but each round ends in a localCheckpoint, so the declared plan
  // the sweep sees is checkpoint-cut and clean — no allowlist entry needed.
  // text_bpe_train / sim_search_mmr also use 1-row best-pick crossJoins,
  // but those run during per-round localCheckpoint materialization — the
  // final plans the sweep sees are clean, like emb_pca_*.
  // emb_pca_* also normalizes via 1-row broadcast crossJoins, but those
  // sit above localCheckpoint lineage cuts, so the final plans the
  // sweep sees are clean — no allowlist entry needed.

  test("nested-loop/cartesian plans == the allowlist, exactly (sf0.001)") {
    val looping = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val loops = plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")
        if (loops) Some(name) else None
    }.toSet
    val unlisted = looping -- allowed.keySet
    assert(unlisted.isEmpty,
      s"unlisted nested-loop/cartesian plans: ${unlisted.mkString(", ")}")
    // both directions: an allowlist entry whose loop disappeared (or
    // whose key was dropped) is stale and must be removed, so the list
    // always documents exactly the current deliberate exceptions
    val stale = allowed.keySet -- looping
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }

  /** Keys whose UNPARTITIONED window runs over a relation with no
    * Aggregate/Distinct/Limit below it in the optimized plan, with the
    * reason the domain is still bounded. (The general rule — VERDICT r8
    * #7 — is that a global window is fine exactly when its input is a
    * domain-bounded post-agg relation: price bins, months, the k-row
    * grids. That boundedness is usually visible as an Aggregate under
    * the Window; these keys bound it another way.) */
  private val allowedGlobalWindows: Map[String, String] = Map(
    "stats_theil_sen" -> ("global median-rank window over the calendar-" +
      "bounded day-pair slope relation (~2.9M rows at ANY SF — same " +
      "boundedness documented in the cartesian allowlist entry)"))

  test("every unpartitioned Window sits above a bounded (aggregated) domain") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate,
      Distinct, GlobalLimit, LocalRelation, LogicalPlan, Window => LWindow}
    def bounded(p: LogicalPlan): Boolean =
      p.collectFirst {
        case _: Aggregate     => ()
        case _: Distinct      => ()
        case _: Deduplicate   => ()
        case _: GlobalLimit   => ()
        case _: LocalRelation => ()
      }.isDefined
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, TestSpark.sf0001).queryExecution.optimizedPlan
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val global = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty && !bounded(w.child) => w
        }
        if (global.nonEmpty) Some(name) else None
    }.toSet
    val unlisted = offenders -- allowedGlobalWindows.keySet
    assert(unlisted.isEmpty,
      s"unpartitioned Window over an unbounded relation: ${unlisted.mkString(", ")}")
    val stale = allowedGlobalWindows.keySet -- offenders
    assert(stale.isEmpty, s"stale global-window allowlist entries: $stale")
  }

}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shapley attribution + Cochran's Q + truncated serving invariants. */
class ShapleySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("attr_shapley: efficiency axiom — credits sum to v(all) - v(empty)") {
    val rows = SparkEntry.queries("attr_shapley")(spark, sf).collect()
    assert(rows.length == 4)
    val phiSum = rows.map(_.getAs[Long]("phi24")).sum
    // v(all channels) = all converted users; v(empty) = converted users
    // who touched no channel at all
    val per = Tables.events(spark, sf)
      .filter("user_id is not null")
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.expr(
          "max(case when event_type = 'purchase' then 1 else 0 end)")
          .as("conv"),
        org.apache.spark.sql.functions.expr(
          "max(case when event_type in ('click','error','signup','view')" +
            " then 1 else 0 end)").as("touched"))
    val vAll = per.filter("conv = 1").count()
    val vEmpty = per.filter("conv = 1 and touched = 0").count()
    assert(phiSum == 24L * (vAll - vEmpty),
      s"sum(phi24)=$phiSum vs 24*(v(C)-v(empty))=${24 * (vAll - vEmpty)}")
  }

  test("stats_capture_recapture: Chapman estimate lands within 3 SE of" +
    " the true population") {
    val r = SparkEntry.queries("stats_capture_recapture")(spark, sf)
      .collect().head
    val (nTrue, est, v) = (r.getAs[Long]("n_true"),
      r.getAs[Double]("chapman"), r.getAs[Double]("variance"))
    assert(est > 0 && v > 0)
    // customers order near-independently across years, so the
    // capture-recapture assumptions hold and the estimator is tight
    assert(math.abs(est - nTrue) <= 3 * math.sqrt(v) + 1,
      s"Chapman $est vs true $nTrue (se=${math.sqrt(v)})")
  }

  test("stats_prop_ztest: group counts partition the orders") {
    val r = SparkEntry.queries("stats_prop_ztest")(spark, sf).collect().head
    val total = r.getAs[Long]("n1") + r.getAs[Long]("n2")
    assert(total == Tables.orders(spark, sf).count())
    assert(!r.getAs[Double]("z").isNaN)
    // priorities are independent of status: |z| small
    assert(math.abs(r.getAs[Double]("z")) < 5.0)
  }

  test("stats_krippendorff: alpha in (0,1) — better than chance, worse" +
    " than perfect (noise + missing are planted)") {
    val r = SparkEntry.queries("stats_krippendorff")(spark, sf)
      .collect().head
    val alpha = r.getAs[Double]("alpha")
    assert(alpha > 0.3 && alpha < 0.95, s"alpha=$alpha")
    // ~1/7 of ratings missing: n well below 3x items but above 2x
    val items = Tables.orders(spark, sf).count()
    val n = r.getAs[Long]("n")
    assert(n < 3 * items && n > 2 * items)
  }

  test("eval_auc_ci: interval brackets the null AUC of an uninformative" +
    " score") {
    val r = SparkEntry.queries("eval_auc_ci")(spark, sf).collect().head
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < hi && r.getAs[Double]("ci_width") > 0)
    // price is independent of fulfillment: the CI must cover 0.5
    assert(lo <= 0.5 && hi >= 0.5, s"null AUC outside [$lo, $hi]")
    assert(hi - lo < 0.15, s"implausibly wide CI: ${hi - lo}")
  }

  test("stats_cochran_q: Q >= 0, dof = k - 1") {
    val r = SparkEntry.queries("stats_cochran_q")(spark, sf).collect().head
    assert(r.getAs[Long]("subjects") > 1000)
    assert(r.getAs[Int]("dof") == 2)
    assert(r.getAs[Double]("q") >= 0.0)
  }

  test("sim_search_truncated: top-10 over the 16-dim prefix overlaps the" +
    " full-space top-10 (matryoshka serving recall)") {
    val full = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val trunc = SparkEntry.queries("sim_search_truncated")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(trunc.size == 10)
    // the synthetic embeddings are NOT MRL-trained (no front-loading),
    // so a 16-of-64 prefix keeps only weak signal — measured 0.1 on the
    // fixed sf0.01 corpus. The operator's claim is the serving shape +
    // exact truncated-space math (oracle-checked); this floor only
    // catches a broken slice (wrong dims/norm → disjoint sets, ~0)
    val recall = (full & trunc).size.toDouble / full.size
    info(s"truncated recall@10 = $recall")
    assert(recall >= 0.1, s"prefix serving lost the neighborhood: $recall")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the model-evaluation and preference-
  * analytics families (`ops.Evaluation`, `ops.Preference`) — the
  * cross-engine hash equality lives in the driver's oracle gate;
  * here we pin the METRIC laws the synthesized data must satisfy. */
class EvaluationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("eval_auc: every segment AUC is a proper probability") {
    val rows = SparkEntry.queries("eval_auc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val auc = r.getAs[Double]("auc")
      assert(auc > 0.0 && auc < 1.0, s"AUC out of range: $r")
      assert(r.getAs[Long]("npos") > 0 && r.getAs[Long]("nneg") > 0)
    }
  }

  test("eval_confusion: counts partition the segment; F1 between min and max of P/R") {
    val byPriority = graft.Tables.orders(spark, sf)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("eval_confusion")(spark, sf).collect().foreach { r =>
      val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn")
      assert(total == byPriority(r.getAs[String]("g")))
      val p = r.getAs[Double]("precision")
      val rc = r.getAs[Double]("recall")
      val f1 = r.getAs[Double]("f1")
      assert(f1 >= math.min(p, rc) - 1e-12 && f1 <= math.max(p, rc) + 1e-12,
        s"F1 not between P and R: $r")
    }
  }

  test("eval_ndcg: system DCG never exceeds ideal DCG; NDCG in [0,1]") {
    val rows = SparkEntry.queries("eval_ndcg")(spark, sf).collect()
    assert(rows.length == 200) // one row per query bucket
    rows.foreach { r =>
      assert(r.getAs[Double]("dcg") <= r.getAs[Double]("idcg") + 1e-12, r.toString)
      val n = r.getAs[Double]("ndcg")
      assert(n >= 0.0 && n <= 1.0 + 1e-12, r.toString)
    }
  }

  test("eval_calibration: bins cover all orders; rates are probabilities") {
    val rows = SparkEntry.queries("eval_calibration")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_pred") >= 0.0 && r.getAs[Double]("mean_pred") <= 1.0)
      assert(r.getAs[Double]("observed") >= 0.0 && r.getAs[Double]("observed") <= 1.0)
    }
  }

  test("stats_cohens_kappa: kappa within [-1, 1] for every year") {
    val rows = SparkEntry.queries("stats_cohens_kappa")(spark, sf).collect()
    assert(rows.length == 7) // o_orderdate spans 1992..1998
    rows.foreach { r =>
      val k = r.getAs[Double]("kappa")
      assert(k >= -1.0 && k <= 1.0, r.toString)
    }
  }

  test("pref_winrate: the lower-indexed (weaker) model loses every pairing") {
    val rows = SparkEntry.queries("pref_winrate")(spark, sf).collect()
    assert(rows.length == 6) // C(4,2) unordered pairs
    rows.foreach { r =>
      assert(r.getAs[Double]("winrate_1") < 0.5,
        s"weaker model should lose the majority: $r")
    }
  }

  test("stats_kaplan_meier: survival is monotone non-increasing from 1; risk set shrinks") {
    val rows = SparkEntry.queries("stats_kaplan_meier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.head <= 1.0 && surv.forall(v => v > 0.0 && v <= 1.0))
    assert(surv.sliding(2).forall(w => w.length < 2 || w(1) <= w(0) + 1e-12),
      "survival must be non-increasing in t")
    val nt = rows.map(_.getAs[Long]("n_t"))
    assert(nt.sliding(2).forall(w => w.length < 2 || w(1) < w(0)),
      "risk set must strictly shrink at every observed day")
  }

  test("text_bm25: top-20 scores are positive and sorted; term counts bounded by the query") {
    val rows = SparkEntry.queries("text_bm25")(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)))
    assert(rows.forall(r => r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= 3))
  }

  test("stats_sprt: the monitor reaches a decision and LLR matches the closed form") {
    val rows = SparkEntry.queries("stats_sprt")(spark, sf).collect()
    val last = rows.last
    // fulfilled share in the synthetic orders is ~1/3 < 0.5, so the
    // sequential test must end firmly in accept_h0
    assert(last.getAs[String]("decision") == "accept_h0", last.toString)
    val k = last.getAs[Long]("k_pos").toDouble
    val n = last.getAs[Long]("n_seen").toDouble
    val expected = k * 0.095310180 + (n - k) * -0.105360516
    assert(math.abs(last.getAs[Double]("llr") - expected) < 1e-6)
    // decisions are consistent with the boundary at every day
    rows.foreach { r =>
      val (llr, dec) = (r.getAs[Double]("llr"), r.getAs[String]("decision"))
      val want = if (llr >= 2.944438979) "accept_h1"
        else if (llr <= -2.944438979) "accept_h0" else "continue"
      assert(dec == want, r.toString)
    }
  }

  test("eval_qini: the planted +15pp treatment effect is recovered; curve accumulates") {
    val rows = SparkEntry.queries("eval_qini")(spark, sf).collect()
    rows.foreach { r =>
      val u = r.getAs[Double]("uplift")
      assert(u > 0.10 && u < 0.22, s"cumulative uplift should sit near the planted 15pp: $r")
    }
    val q = rows.map(_.getAs[Double]("qini"))
    assert(q.sliding(2).forall(w => w.length < 2 || w(1) > w(0)),
      "Qini must accumulate with every decile under a uniform positive effect")
  }

  test("emb_knn_graph: 3 neighbors per vector, ranked by descending cosine, no self-loops") {
    val rows = SparkEntry.queries("emb_knn_graph")(spark, sf).collect()
    val byI = rows.groupBy(_.getAs[Long]("i"))
    assert(byI.values.forall(_.length == 3))
    byI.foreach { case (i, ns) =>
      val sorted = ns.sortBy(_.getAs[Int]("rnk"))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.sliding(2).forall(w => w.length < 2 || w(1) <= w(0)), s"vec $i")
      assert(ns.forall(_.getAs[Long]("j") != i), s"self-loop at $i")
    }
  }

  test("dedup_semantic: clusters are multi-member, labeled by their min member") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(members.length == r.getAs[Long]("cluster_size"))
      assert(members.length >= 2)
      assert(members.min == r.getAs[Long]("cluster_id"),
        s"cluster label must be the min member id: $r")
      assert(members.sorted.sameElements(members), s"members not sorted: $r")
    }
  }

  test("eval_brier: Murphy terms are non-negative and recompose the score") {
    val r = SparkEntry.queries("eval_brier")(spark, sf).collect().head
    val (rel, res, unc, br) = (r.getAs[Double]("reliability"),
      r.getAs[Double]("resolution"), r.getAs[Double]("uncertainty"),
      r.getAs[Double]("brier"))
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
    assert(math.abs(br - (rel - res + unc)) < 1e-12)
    assert(br >= 0 && br <= 1, s"Brier out of range: $br")
  }

  test("eval_mrr: reciprocal-rank mean is a probability; every query found a relevant doc") {
    val r = SparkEntry.queries("eval_mrr")(spark, sf).collect().head
    assert(r.getAs[Long]("n_queries") == 200)
    assert(r.getAs[Long]("n_hit") == r.getAs[Long]("n_queries"),
      "with ~half the docs relevant, every query bucket must have a hit")
    val mrr = r.getAs[Double]("mrr")
    assert(mrr > 0.0 && mrr <= 1.0)
    // ~half the docs are relevant (rel>=2), so the first hit comes early
    assert(mrr > 0.3, s"MRR suspiciously low for a dense relevance draw: $mrr")
  }

  test("stats_bh_fdr: step-up boundary is consistent and the planted block is found") {
    val rows = SparkEntry.queries("stats_bh_fdr")(spark, sf).collect()
      .sortBy(_.getAs[Int]("k"))
    assert(rows.length == 100)
    // rejected == k <= kmax: the rejected set is a prefix of the p-ordering
    val rejected = rows.takeWhile(_.getAs[Boolean]("rejected"))
    assert(rows.drop(rejected.length).forall(!_.getAs[Boolean]("rejected")))
    // all 20 planted signals are 1000x smaller: the procedure must find most
    val plantedFound = rejected.count(_.getAs[Boolean]("planted"))
    assert(plantedFound >= 15, s"only $plantedFound/20 planted signals rejected")
    // FDR control: false discoveries stay a small share of rejections
    val fd = rejected.count(!_.getAs[Boolean]("planted"))
    assert(rejected.isEmpty || fd.toDouble / rejected.length <= 0.25,
      s"false-discovery share too high: $fd/${rejected.length}")
    // p-values nondecreasing in k
    val ps = rows.map(_.getAs[Double]("pval"))
    assert(ps.sliding(2).forall(w => w.length < 2 || w(1) >= w(0)))
  }

  test("stats_ipf_rake: column margins hit the target exactly; rows converge") {
    val rows = SparkEntry.queries("stats_ipf_rake")(spark, sf).collect()
    assert(rows.length == 15) // 5 priorities x 3 statuses
    assert(rows.forall(_.getAs[Double]("weight") > 0))
    val total = rows.map(_.getAs[Long]("n")).sum.toDouble
    val byCol = rows.groupBy(_.getAs[String]("c"))
      .view.mapValues(_.map(_.getAs[Double]("weight")).sum)
    byCol.values.foreach(cs =>
      assert(math.abs(cs - total / 3.0) < 1e-4,
        s"column margin off target after the final column step: $cs"))
    val byRow = rows.groupBy(_.getAs[String]("p"))
      .view.mapValues(_.map(_.getAs[Double]("weight")).sum)
    byRow.values.foreach(rs =>
      assert(math.abs(rs - total / 5.0) / (total / 5.0) < 1e-3,
        s"row margin did not converge: $rs vs ${total / 5.0}"))
  }

  test("text_zipf_fit: slope is negative (frequency decays with rank)") {
    val r = SparkEntry.queries("text_zipf_fit")(spark, sf).collect().head
    assert(r.getAs[Long]("n") >= 10, "need a non-trivial vocabulary to fit")
    assert(r.getAs[Double]("zipf_slope") < 0.0,
      s"frequency must decay with rank: $r")
  }

  test("stats_hoeffding_ci: intervals cover the rate and shrink with n") {
    val rows = SparkEntry.queries("stats_hoeffding_ci")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (rate, lo, hi) = (r.getAs[Double]("rate"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo <= rate && rate <= hi)
      assert(lo >= 0.0 && hi <= 1.0)
      // at sf0.01 each segment has ~3000 orders -> hw ~ 0.025
      val hw = math.sqrt(3.688879454 / (2.0 * r.getAs[Long]("n")))
      assert(math.abs((hi - lo) - 2 * hw) < 1e-12 || hi == 1.0 || lo == 0.0)
    }
  }

  test("pref_bradley_terry: strengths recover the planted order and sum to 1") {
    val rows = SparkEntry.queries("pref_bradley_terry")(spark, sf).collect()
    assert(rows.length == 4)
    val s = rows.sortBy(_.getAs[Long]("model")).map(_.getAs[Double]("strength"))
    assert(s.sliding(2).forall(w => w(0) < w(1)),
      s"strengths must increase with the planted model index: ${s.toSeq}")
    // each normalization re-pins at 12dp, so the sum is 1 ± 4 ulp-ish
    assert(math.abs(s.sum - 1.0) < 1e-9, s"strengths should normalize: ${s.sum}")
  }
}

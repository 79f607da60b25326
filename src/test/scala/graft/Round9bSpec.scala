package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 second batch: semantic sanity for the new evaluation /
  * experimentation / time-series / graph / crawl keys. The cross-engine
  * hash gate lives in the driver's DuckDB compare; these assertions pin
  * the properties a hash can't see (bounds, mass conservation, the
  * CUPED contract) plus partition-count invariance for the keys whose
  * determinism claim is load-bearing at 1000 executors. */
class Round9bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ts_yule_walker: autocorrelations bounded, noise ratio in (0, 1]") {
    val rows = SparkEntry.queries("ts_yule_walker")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 5, "one row per order priority")
    rows.foreach { r =>
      val (r1, r2) = (r.getAs[Double]("r1"), r.getAs[Double]("r2"))
      assert(math.abs(r1) <= 1.0 && math.abs(r2) <= 1.0,
        s"sample ACF out of [-1,1]: $r")
      val nr = r.getAs[Double]("noise_ratio")
      assert(nr > 0.0 && nr <= 1.0 + 1e-12,
        s"innovation-variance ratio outside (0,1]: $r")
    }
  }

  test("eval_rouge: P/R/F1 in [0,1], F1 between min and max of P,R") {
    val rows = SparkEntry.queries("eval_rouge")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, rc, f1) = (r.getAs[Double]("p"), r.getAs[Double]("r"),
        r.getAs[Double]("f1"))
      assert(p >= 0 && p <= 1 && rc >= 0 && rc <= 1 && f1 >= 0 && f1 <= 1,
        s"metric out of [0,1]: $r")
      if (r.getAs[Long]("m") > 0)
        assert(f1 >= math.min(p, rc) - 1e-12 && f1 <= math.max(p, rc) + 1e-12,
          s"F1 not between P and R: $r")
    }
    // unigram overlap can never be smaller than bigram overlap on the
    // same pair set (a matched bigram implies two matched unigrams)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      assert(rs.length == 2, s"$src: expected n=1 and n=2 rows")
      val m1 = rs.find(_.getAs[Int]("n") == 1).get.getAs[Long]("m")
      val m2 = rs.find(_.getAs[Int]("n") == 2).get.getAs[Long]("m")
      assert(m1 >= m2, s"$src: unigram matches $m1 < bigram matches $m2")
    }
  }

  test("stats_jarque_bera: JB nonnegative, decision consistent") {
    val rows = SparkEntry.queries("stats_jarque_bera")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val jb = r.getAs[Double]("jb")
      assert(jb >= 0.0, s"JB statistic negative: $r")
      assert(r.getAs[Boolean]("reject_normal") == (jb > 5.991),
        s"decision inconsistent with statistic: $r")
    }
  }

  test("stats_cuped: adjusted means shift by theta, variances positive") {
    val rows = SparkEntry.queries("stats_cuped")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 2, "one row per variant")
    rows.foreach { r =>
      assert(r.getAs[Double]("var_y") > 0 && r.getAs[Double]("var_y_cuped") > 0,
        s"non-positive variance: $r")
      assert(!r.getAs[Double]("theta").isNaN, s"theta NaN: $r")
      assert(math.abs(r.getAs[Double]("var_reduction")) < 1.0,
        s"implausible variance reduction: $r")
    }
    // the pooled-theta adjustment preserves the overall mean up to the
    // between-variant X imbalance: the two shifts are opposite in sign
    val shifts = rows.map(r =>
      r.getAs[Double]("mean_y_cuped") - r.getAs[Double]("mean_y"))
    assert(shifts.product <= 1e-12,
      s"CUPED shifts should oppose (X̄_v straddles X̄): ${shifts.toSeq}")
  }

  test("stats_cohens_d: both arms populated, g shrinks d") {
    val rows = SparkEntry.queries("stats_cohens_d")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    val d = r.getAs[Double]("cohens_d")
    val g = r.getAs[Double]("hedges_g")
    assert(!d.isNaN && math.abs(g) <= math.abs(d),
      s"Hedges' g must shrink toward 0: $r")
  }

  test("graph_ppr: mass conserved, seeds rank above non-seeds") {
    val rows = SparkEntry.queries("graph_ppr")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Double]("rank")).sum
    assert(math.abs(mass - 1.0) < 0.05,
      s"PPR mass not conserved: $mass (undirected graph, no dangling)")
    val (seeds, rest) = rows.partition(_.getAs[Boolean]("is_seed"))
    assert(seeds.nonEmpty && rest.nonEmpty)
    val seedAvg = seeds.map(_.getAs[Double]("rank")).sum / seeds.length
    val restAvg = rest.map(_.getAs[Double]("rank")).sum / rest.length
    assert(seedAvg > restAvg,
      s"seed proximity must dominate: seed avg $seedAvg vs rest $restAvg")
  }

  test("text_url_normalize: canonical form is clean, doc mass conserved") {
    val df = SparkEntry.queries("text_url_normalize")(spark, TestSpark.sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(!u.contains("utm_") && !u.contains("#") && !u.contains("www."),
        s"noise survived canonicalization: $u")
      assert(u == u.toLowerCase, s"uppercase survived: $u")
      assert(!u.endsWith("/"), s"trailing slash survived: $u")
      assert(u.startsWith("https://site"), s"unexpected shape: $u")
      assert(r.getAs[Long]("n_dups") >= 1)
    }
    val total = rows.map(_.getAs[Long]("n_dups")).sum
    val docs = Tables.documents(spark, TestSpark.sf0001).count()
    assert(total == docs, s"dedup mass $total != corpus size $docs")
  }

  test("graph_random_walks: every step follows an edge, walks never die") {
    val spark0 = spark
    import spark0.implicits._
    val rows = SparkEntry.queries("graph_random_walks")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    val bySeed = rows.groupBy(_.getAs[Long]("seed"))
    bySeed.foreach { case (seed, ws) =>
      assert(ws.map(_.getAs[Int]("step")).sorted.toSeq == (0 to 4),
        s"walk from $seed missing steps")
      assert(ws.find(_.getAs[Int]("step") == 0).get.getAs[Long]("node") == seed)
    }
    // every consecutive (node, next) pair must be a real edge
    val edges = Tables.lineitem(spark, TestSpark.sf0001)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .groupBy(_._1).values.toSeq
      .flatMap { g =>
        val ps = g.map(_._2).toSeq
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.toSet
    bySeed.foreach { case (seed, ws) =>
      val path = ws.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("node"))
      path.sliding(2).foreach { case Array(u, v) =>
        assert(edges.contains((u, v)), s"walk from $seed hops $u->$v off-graph")
      }
    }
  }

  test("fin_omega: omega positive, consistent with win rate bounds") {
    val rows = SparkEntry.queries("fin_omega")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("omega") > 0, s"omega not positive: $r")
      val wr = r.getAs[Double]("win_rate")
      assert(wr > 0 && wr < 1, s"degenerate win rate: $r")
      assert(r.getAs[Long]("gains") >= 0 && r.getAs[Long]("losses") >= 0)
    }
  }

  test("stats_by_fdr: BY rejections are a subset of BH rejections") {
    val rows = SparkEntry.queries("stats_by_fdr")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      if (r.getAs[Boolean]("rejected_by"))
        assert(r.getAs[Boolean]("rejected_bh"),
          s"BY rejected where BH did not (impossible — BY is stricter): $r")
    }
    // the planted block (p ~ 1/1000 of null scale) must survive BY
    assert(rows.count(_.getAs[Boolean]("rejected_by")) > 0,
      "BY rejected nothing — planted signal lost")
  }

  test("sim_search_radius: all matches clear tau, none are the probe") {
    val rows = SparkEntry.queries("sim_search_radius")(spark, TestSpark.sf001)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("cosine") >= 0.35, s"below threshold: $r")
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("probe_id"))
    }
  }

  test("ts_ewma_control: z stays between raw extremes, limits widen to asymptote") {
    val rows = SparkEntry.queries("ts_ewma_control")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    val byG = rows.groupBy(_.getAs[String]("g"))
    byG.foreach { case (g, rs) =>
      val bands = rs.sortBy(_.getAs[Int]("t"))
        .map(r => r.getAs[Double]("ucl") - r.getAs[Double]("lcl"))
      // time-varying limits are monotone non-decreasing toward the
      // asymptote (1 - 4^-t is increasing in t)
      bands.sliding(2).foreach { case Array(a, b) =>
        assert(b >= a - 1e-9, s"$g: control band narrowed: $a -> $b")
      }
    }
  }

  test("fin_parkinson: nonnegative, zero iff flat range") {
    val rows = SparkEntry.queries("fin_parkinson")(spark, TestSpark.sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("parkinson_vol") >= 0.0)
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("graph_node2vec: walks follow edges, step-1 matches uniform walks") {
    val rows = SparkEntry.queries("graph_node2vec")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    val bySeed = rows.groupBy(_.getAs[Long]("seed"))
    bySeed.foreach { case (seed, ws) =>
      assert(ws.map(_.getAs[Int]("step")).sorted.toSeq == (0 to 4),
        s"biased walk from $seed missing steps")
      assert(ws.find(_.getAs[Int]("step") == 0).get.getAs[Long]("node") == seed)
    }
    // the uniform and biased samplers share the step-1 distribution
    // mechanics but use different salts — both must produce a full walk
    // set over the same seeds
    val uni = SparkEntry.queries("graph_random_walks")(spark, TestSpark.sf0001)
      .collect().groupBy(_.getAs[Long]("seed"))
    assert(bySeed.keySet == uni.keySet,
      "biased and uniform walks must start from the same seed set")
  }

  test("fin_hurst: H in (0,1), R/S means grow with block size") {
    val rows = SparkEntry.queries("fin_hurst")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val h = r.getAs[Double]("hurst")
      assert(h > 0.0 && h < 1.0, s"Hurst exponent out of (0,1): $r")
      // E[R/S] ~ c*w^H with H > 0: the mean rescaled range must grow
      assert(r.getAs[Double]("m32") > r.getAs[Double]("m8"),
        s"R/S failed to grow with block size: $r")
    }
  }

  test("stats_cmh: chi2 nonnegative, decision consistent, OR positive") {
    val rows = SparkEntry.queries("stats_cmh")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val chi2 = r.getAs[Double]("cmh_chi2")
    assert(chi2 >= 0.0)
    assert(r.getAs[Boolean]("reject_5pct") == (chi2 > 3.841))
    assert(r.getAs[Double]("mh_odds_ratio") > 0.0)
    // custkey parity is independent of order status by construction:
    // the stratified test must NOT reject (a rejection = a false
    // positive on a known-null treatment)
    assert(!r.getAs[Boolean]("reject_5pct"),
      s"CMH rejected a known-null association: $r")
  }

  test("stats_tukey_hsd: all 10 pairs, q nonnegative, symmetric means") {
    val rows = SparkEntry.queries("stats_tukey_hsd")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 10, "C(5,2) priority pairs")
    rows.foreach { r =>
      assert(r.getAs[Double]("q") >= 0.0)
      assert(r.getAs[Boolean]("significant") == (r.getAs[Double]("q") > 3.858))
    }
  }

  test("ts_adf: gamma negative on a mean-reverting diff, decision consistent") {
    val rows = SparkEntry.queries("ts_adf")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    // revenue LEVELS fluctuate around a stable mean in the synthetic
    // data, so the AR coefficient on the level must pull back (gamma<0)
    assert(r.getAs[Double]("gamma") < 0.0, s"no mean reversion: $r")
    assert(r.getAs[Boolean]("stationary") == (r.getAs[Double]("adf_t") < -2.86))
  }

  test("stats_wilson_ci: interval inside [0,1] and contains p_hat") {
    val rows = SparkEntry.queries("stats_wilson_ci")(spark, TestSpark.sf001)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("p_hat"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo >= 0.0 && hi <= 1.0, s"Wilson left [0,1]: $r")
      assert(lo <= p && p <= hi, s"interval excludes p_hat: $r")
    }
  }

  test("text_skipgram_negsample: labels well-formed, positives symmetric") {
    val rows = SparkEntry.queries("text_skipgram_negsample")(
      spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val pos = rows.filter(_.getAs[Int]("label") == 1)
    val neg = rows.filter(_.getAs[Int]("label") == 0)
    assert(pos.nonEmpty && neg.nonEmpty)
    // the symmetric window makes the positive pair-count relation
    // symmetric: (a, b, n) present iff (b, a, n) present
    val posMap = pos.map(r => (r.getAs[String]("center"),
      r.getAs[String]("sample")) -> r.getAs[Long]("n")).toMap
    posMap.foreach { case ((a, b), n) =>
      assert(posMap.get((b, a)).contains(n),
        s"positive skipgrams not symmetric at ($a, $b)")
    }
    // SGNS negative mass: K=2 slots per positive pair type, so total
    // negative n is exactly twice the positive total
    assert(neg.map(_.getAs[Long]("n")).sum == 2 * pos.map(_.getAs[Long]("n")).sum,
      "negative mass != 2x positive mass")
  }

  test("mm_scene_cuts: hamming in [0,64], decision consistent") {
    val rows = SparkEntry.queries("mm_scene_cuts")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 64, s"bit distance out of range: $r")
      assert(r.getAs[Boolean]("is_cut") == (h > 16))
    }
    // near-random frame hashes differ in ~32 bits, so cuts must fire
    assert(rows.exists(_.getAs[Boolean]("is_cut")),
      "no scene cut detected on maximally-dissimilar synthetic frames")
  }

  test("dedup_cdc_chunks: chunk mass conserved, duplicates detected") {
    val rows = SparkEntry.queries("dedup_cdc_chunks")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Boolean]("is_dup") == (r.getAs[Long]("n_occ") > 1))
      assert(r.getAs[Int]("chunk_len") > 0)
    }
    // total chunk characters must reassemble the corpus exactly
    val chunkChars = rows.map(r =>
      r.getAs[Int]("chunk_len") * r.getAs[Long]("n_occ")).sum
    val corpusChars = Tables.documents(spark, TestSpark.sf0001)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text"))))
      .collect().head.getLong(0)
    assert(chunkChars == corpusChars,
      s"chunking lost bytes: $chunkChars != $corpusChars")
    assert(rows.exists(_.getAs[Boolean]("is_dup")),
      "no duplicate chunks in a corpus with repeated vocabulary")
  }

  test("stats_g_test: G close to Pearson chi2 on the same table") {
    val g = SparkEntry.queries("stats_g_test")(spark, TestSpark.sf001)
      .collect().head
    assert(g.getAs[Int]("dof") == 8)
    assert(g.getAs[Boolean]("reject_5pct") == (g.getAs[Double]("g_stat") > 15.507))
    val chi = SparkEntry.queries("agg_chisq")(spark, TestSpark.sf001)
      .collect().head.getAs[Double]("chi2")
    // G and Pearson are asymptotically equal under H0; on a null-ish
    // table they agree to first order
    assert(math.abs(g.getAs[Double]("g_stat") - chi) <
      0.2 * math.max(1.0, chi),
      s"G ${g.getAs[Double]("g_stat")} far from chi2 $chi")
  }

  test("r9b deterministic keys are partition-count invariant (4 vs 13)") {
    val keys = Seq("ts_yule_walker", "stats_cuped", "graph_ppr",
      "eval_rouge", "text_url_normalize", "graph_random_walks", "fin_omega",
      "sim_search_radius", "fin_parkinson", "stats_by_fdr", "ts_ewma_control",
      "fin_hurst", "stats_cmh", "graph_node2vec", "stats_tukey_hsd",
      "ts_adf", "text_skipgram_negsample", "stats_wilson_ci",
      "mm_scene_cuts", "dedup_cdc_chunks", "stats_g_test")
    val ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "13")
    keys.foreach { k =>
      val base = SparkEntry.queries(k)(spark, TestSpark.sf0001)
        .collect().map(_.toString).toSeq
      val other = SparkEntry.queries(k)(ns, TestSpark.sf0001)
        .collect().map(_.toString).toSeq
      assert(base.nonEmpty, s"$k returned no rows")
      assert(base == other, s"$k differs across partition counts")
    }
  }
}

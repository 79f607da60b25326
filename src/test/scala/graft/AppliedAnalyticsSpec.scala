package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic laws for the applied-analytics batch: item-item CF,
  * CAPM beta, RAKE keywords, and the PR operating curve. */
class AppliedAnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("rec_item_cosine: cosine in (0,1]; at most 3 neighbors per item; symmetric pairs agree") {
    val rows = SparkEntry.queries("rec_item_cosine")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perItem = rows.groupBy(_.getAs[Long]("item"))
    perItem.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to rs.length))
    }
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0, r.toString)
      assert(r.getAs[Long]("cooc") >= 1)
    }
  }

  test("fin_beta: segment betas average to ~1 under the market definition") {
    val rows = SparkEntry.queries("fin_beta")(spark, sf).collect()
    assert(rows.length == 5)
    // the market is the SUM of the segments measured on the same days;
    // betas of parts against their own sum must be positive and O(1/5)
    rows.foreach { r =>
      val b = r.getAs[Double]("beta")
      assert(b > 0.0 && b < 1.0, s"implausible beta: $r")
    }
  }

  test("text_rake: degree >= freq * min phrase len 1; stopwords absent; score = degree/freq") {
    val rows = SparkEntry.queries("text_rake")(spark, sf).collect()
    assert(rows.nonEmpty)
    val words = rows.map(_.getAs[String]("word")).toSet
    assert(!words.contains("a") && !words.contains("the"))
    rows.foreach { r =>
      val f = r.getAs[Long]("freq"); val deg = r.getAs[Long]("degree")
      assert(deg >= f, s"degree below freq: $r") // every phrase has len >= 1
      assert(math.abs(r.getAs[Double]("score") - deg.toDouble / f) < 1e-12)
    }
  }

  test("fin_sharpe: sortino magnitude at least sharpe's when mean is positive") {
    val rows = SparkEntry.queries("fin_sharpe")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val sh = r.getAs[Double]("sharpe"); val so = r.getAs[Double]("sortino")
      assert(!sh.isNaN && !so.isNaN, r.toString)
      // downside deviation <= full stddev only when downside mass is
      // smaller; both ratios share the numerator, so signs agree
      assert(sh * so >= 0.0, s"sign mismatch: $r")
    }
  }

  test("stats_cramers_v: V in [0,1] and consistent with agg_chisq") {
    val v = SparkEntry.queries("stats_cramers_v")(spark, sf).collect().head
    val chi = SparkEntry.queries("agg_chisq")(spark, sf).collect().head
    assert(math.abs(v.getAs[Double]("chi2") - chi.getAs[Double]("chi2")) < 1e-9)
    val cv = v.getAs[Double]("cramers_v")
    assert(cv >= 0.0 && cv <= 1.0)
    assert(v.getAs[Long]("kmin") == 3)
  }

  test("text_textrank: scores positive, mass ~1, high-degree words rank high") {
    val rows = SparkEntry.queries("text_textrank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    // damped PageRank conserves mass up to quantization: sum ~ 1
    assert(math.abs(scores.sum - 1.0) < 0.01, s"mass ${scores.sum}")
    // stopwords never appear as nodes
    assert(!rows.exists(r => Seq("a", "the").contains(r.getAs[String]("word"))))
  }

  test("ts_anomaly: flags exactly the months beyond 3 MAD; med/mad constant") {
    val rows = SparkEntry.queries("ts_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    val med = rows.head.getAs[Double]("med")
    val mad = rows.head.getAs[Double]("mad")
    assert(mad >= 0.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("med") == med && r.getAs[Double]("mad") == mad)
      val dev = math.abs(r.getAs[Double]("remainder") - med)
      assert(r.getAs[Boolean]("is_anomaly") == (dev > 3 * mad), r.toString)
    }
  }

  test("quality_table_checksum: group checksums XOR into the ALL row; order-invariant") {
    val rows = SparkEntry.queries("quality_table_checksum")(spark, sf).collect()
    val (all, per) = rows.partition(_.getAs[String]("grp") == "ALL")
    assert(all.length == 1 && per.length == 3)
    assert(all.head.getAs[Long]("n_rows") == per.map(_.getAs[Long]("n_rows")).sum)
    assert(all.head.getAs[Long]("checksum") ==
      per.map(_.getAs[Long]("checksum")).reduce(_ ^ _))
    // rerun on a different partitioning: fingerprints must not move
    val again = SparkEntry.queries("quality_table_checksum")(spark, sf)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("checksum")).toMap
    rows.foreach(r => assert(again(r.getAs[String]("grp")) == r.getAs[Long]("checksum")))
  }

  test("eval_demographic_parity: rates proper, parity diffs sum to ~0 weighted, DI <= 1") {
    val rows = SparkEntry.queries("eval_demographic_parity")(spark, sf).collect()
    assert(rows.length == 5)
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val wsum = rows.map(r => r.getAs[Double]("parity_diff") * r.getAs[Long]("n")).sum / n
    assert(math.abs(wsum) < 1e-12, s"weighted parity diffs must cancel: $wsum")
    rows.foreach { r =>
      val di = r.getAs[Double]("disparate_impact")
      assert(di > 0.0 && di <= 1.0 + 1e-12, r.toString)
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    assert(rows.exists(r => math.abs(r.getAs[Double]("disparate_impact") - 1.0) < 1e-12))
  }

  test("stats_tost: t statistics consistent with diff/se and the margin") {
    val r = SparkEntry.queries("stats_tost")(spark, sf).collect().head
    val diff = r.getAs[Double]("diff"); val se = r.getAs[Double]("se")
    assert(se > 0.0)
    assert(math.abs(r.getAs[Double]("t_lower") - (diff + 5.0) / se) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_upper") - (5.0 - diff) / se) < 1e-12)
    assert(r.getAs[Boolean]("equivalent") ==
      (r.getAs[Double]("t_lower") > 1.645 && r.getAs[Double]("t_upper") > 1.645))
  }

  test("feat_hashing_trick: indices in [0,64); values bounded by doc word count") {
    val rows = SparkEntry.queries("feat_hashing_trick")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("idx") >= 0 && r.getAs[Long]("idx") < 64))
    // one row per (doc, bucket): at most D rows per doc, and signed
    // counts can never exceed the doc's word count in magnitude
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(_.length <= 64))
    val nChars = Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) as nw")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("nw")).toMap
    perDoc.foreach { case (doc, rs) =>
      assert(rs.map(r => math.abs(r.getAs[Long]("val"))).sum <= nChars(doc))
    }
  }

  test("expr_surrogate_key: 60-bit keys positive and collision-free on the dim") {
    val rows = SparkEntry.queries("expr_surrogate_key")(spark, sf).collect()
    val sks = rows.map(_.getAs[Long]("sk"))
    assert(sks.forall(_ >= 0))
    assert(sks.distinct.length == sks.length, "surrogate collision on customer dim")
  }

  test("eval_pr_curve: recall monotone non-decreasing as threshold falls; ends at 1") {
    val rows = SparkEntry.queries("eval_pr_curve")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("g")).values.foreach { rs =>
      val sorted = rs.sortBy(-_.getAs[Long]("threshold"))
      val recalls = sorted.map(_.getAs[Double]("recall"))
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-15 })
      assert(math.abs(recalls.last - 1.0) < 1e-15) // lowest threshold captures all positives
      sorted.foreach { r =>
        assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") ==
          sorted.head.getAs[Long]("tp") + sorted.head.getAs[Long]("fn"))
      }
    }
  }
}

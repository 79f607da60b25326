package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: the ANN-family pinning and the bounded-error
  * sketch keys claim ORDER-INVARIANCE (exact integer/decimal sums,
  * floor-pinned means, md5 coins) — the property that makes them safe
  * on 1000 executors. This suite actually varies the partitioning and
  * asserts bit-identical output, the same discipline GraphSpec applies
  * to the fixpoint keys. */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("r9 pinned/bounded keys are partition-count invariant (4 vs 13)") {
    val keys = Seq(
      "sim_search_pq", "sim_search_ivf_pq", "sim_search_ivf",
      "sim_search_ivf_multi", "sim_search_ivf_batch",
      "sim_search_ivf_kmeans", "sim_search_ivf_saved",
      "emb_knn_classify", "text_global_shuffle",
      "sim_search_ivf_append", "emb_drift",
      "agg_approx_distinct", "agg_approx_percentile",
      "agg_hll_reaggregate")
    val ns = spark.newSession()
    // 13 : odd, not a divisor or multiple of 4 — maximally different
    // partition boundaries for the same data
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

  test("lsh weight matrix: literal derivation == SQL md5 derivation") {
    // the driver-computed literal matrix (SimSearch.lshWeights) must
    // equal what conv(substring(md5(...))) computes in SQL — the same
    // derivation the DuckDB oracle uses
    val fromSql = spark.sql(
      """SELECT p, i,
        |  cast(conv(substring(md5(concat(cast(p as string), '_',
        |    cast(i as string), ':lsh13')), 1, 8), 16, 10) as bigint)
        |    % 2001 - 1000 AS w
        |FROM (SELECT explode(sequence(0, 3)) AS p)
        |LATERAL VIEW explode(sequence(0, 63)) AS i""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (p <- 0 until 4; i <- 0 until 64) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${p}_$i:lsh13".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val lit = java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2001L - 1000L
      assert(fromSql((p, i)) == lit, s"weight ($p,$i) diverges")
    }
  }

  test("text_global_shuffle: positions are a permutation, shards balanced") {
    val rows = SparkEntry.queries("text_global_shuffle")(spark, TestSpark.sf001)
      .collect()
    val n = rows.length
    assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to n).toSeq,
      "pos must be an exact 1..n permutation")
    val byShard = rows.groupBy(_.getInt(2)).view.mapValues(_.length)
    assert(byShard.keySet == (0 until 64).toSet)
    // round-robin by construction: shard sizes differ by at most 1
    assert(byShard.values.max - byShard.values.min <= 1)
  }

  test("norm-augmentation reduction preserves the exact MIPS ranking") {
    // the identity sim_search_mips_augmented serves: augmented cosine
    // = dot/(M·‖q‖) is MONOTONE in the raw dot, so per-probe (rnk →
    // vec_id) must agree with sim_search_mips exactly — on both SFs
    for (sf <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val mips = SparkEntry.queries("sim_search_mips")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val aug = SparkEntry.queries("sim_search_mips_augmented")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(mips.nonEmpty, "mips returned no rows")
      assert(mips == aug, s"rankings diverge at $sf")
    }
  }
}

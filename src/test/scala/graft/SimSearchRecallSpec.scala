package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quality gate for the approximate NN path: IVF/LSH answers are only
  * useful if they actually recover most of the exact top-k. Recall is
  * deterministic here (fixed data, hash-derived hyperplanes), so a drop
  * below the recorded floor means the bucketing scheme regressed. */
class SimSearchRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF top-10 recall vs exact top-10 on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("sim_search_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall")
    // r7: scored multiprobe (margin-ranked bucket visits) — measured 0.9
    assert(recall >= 0.8, s"recall@10 regressed: $recall")
  }

  test("k-means IVF top-10 recall vs exact top-10 on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("sim_search_ivf_kmeans")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"k-means IVF recall@10 = $recall")
    assert(recall >= 0.5, s"recall@10 regressed: $recall")
  }

  test("int8-quantized serving recall@10 vs full precision on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val quant = SparkEntry.queries("sim_search_quantized")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    info(s"int8 recall@10 = $recall")
    assert(recall >= 0.7, s"quantized recall@10 regressed: $recall")
  }

  test("PQ + exact rerank recall@10 vs exact top-10 on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val pq = SparkEntry.queries("sim_search_pq")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(pq.size == 10)
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@10 = $recall")
    assert(recall >= 0.6, s"PQ recall@10 regressed: $recall")
  }

  test("IVF+PQ two-stage recall@10 vs exact top-10 on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val twoStage = SparkEntry.queries("sim_search_ivf_pq")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & twoStage).size.toDouble / exact.size
    info(s"IVF+PQ recall@10 = $recall")
    // r9: measured at the shipped config — nprobe 12 of 16, rerank 200
    // (SimSearch.ivfPqTopKPinned). This corpus is near-random in cosine
    // space, so recall tracks the probed corpus fraction almost
    // linearly; 12 cells is where it crosses 0.9 (sweep documented at
    // the ivfPqTopKPinned Scaladoc).
    assert(recall >= 0.9, s"IVF+PQ recall@10 regressed: $recall")
  }

  test("multi-assignment IVF recall vs exact top-10 on sf0.01") {
    // 2-assignment / 6-probed-cells: the better coverage-per-cell curve
    // (single assignment needs 12 cells for the same recall here)
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val multi = SparkEntry.queries("sim_search_ivf_multi")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & multi).size.toDouble / exact.size
    info(s"multi-assignment IVF recall@10 = $recall")
    assert(recall >= 0.8, s"multi-assign recall regressed: $recall")
  }

  test("graph-ANN beam search recall vs exact top-10 on sf0.01") {
    // r10: greedy beam over the symmetrized within-label k-NN graph
    // (HNSW layer-0 shape). The synthetic embeddings are ISOTROPIC —
    // the exact top-10 spans 8 of 10 labels at max cosine 0.37, so
    // graph navigation (which exploits neighbor-of-neighbor
    // correlation) saturates at 0.4 however the walk is sized (a
    // python sweep over degree 6-8 / beam 8-16 / steps 3-10 never
    // exceeded 0.5). 0.4 is therefore the DATA's measured ceiling-ish
    // floor, not a weak walk — the clustered-vectors test below proves
    // the same code path navigates to recall 1.0 when structure exists.
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val beam = SparkEntry.queries("sim_search_knn_graph")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(beam.size == 10)
    val recall = (exact & beam).size.toDouble / exact.size
    info(s"graph-ANN recall@10 = $recall")
    assert(recall >= 0.4, s"graph-ANN recall@10 regressed: $recall")
  }

  test("graph-ANN navigates clustered vectors to recall 1.0") {
    // the workload graph ANN exists for: 10 well-separated clusters of
    // 20 (deterministic integer-grid perturbations around one-hot-ish
    // centers), probe inside cluster 3 — the beam must walk from the
    // arbitrary min-id entry to ALL of the exact top-10
    graft.functions.VectorFunctions.register(spark)
    val dim = 16
    val rows = for (g <- 0 until 10; m <- 0 until 20) yield {
      val id = (g * 20 + m + 1).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d == g) 10.0f else 0.0f
        center + ((id * 31 + d * 17) % 7 - 3).toFloat / 10.0f
      }
      (id, g, v)
    }
    val corpus = spark.createDataFrame(rows)
      .toDF("vec_id", "label", "embedding")
    val probeVec = Array.tabulate(dim)(d => if (d == 3) 10.0f else 0.05f)
    val probe = spark.createDataFrame(Seq(Tuple1(probeVec))).toDF("embedding")
    // exact top-10 by brute force on the driver (200 rows)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val exact = rows.map { case (id, _, v) => (id, cos(v, probeVec)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val got = graft.ext.SimSearch.graphBeamSearch(
        corpus, probe, degree = 6, beamW = 10, steps = 6, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(s"clustered graph-ANN recall@10 = $recall")
    assert(recall == 1.0, s"beam failed to navigate clustered data: $recall")
  }

  test("emb_knn_classify: every probe classified, votes bounded by k") {
    val rows = SparkEntry.queries("emb_knn_classify")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.map(_.getLong(0)).toSet == (0L until 20L).toSet)
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 10L))
  }

  test("single-probe batch slice equals the single-probe exact answer") {
    // sim_search_batch is oracle-checked; additionally pin its probe_id=0
    // slice to the independently-built sim_search_cosine plan (different
    // operator shape, same answer)
    val sf = "/root/testdata/sf0.01"
    val single = SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val batch0 = SparkEntry.queries("sim_search_batch")(spark, sf)
      .filter("probe_id = 0")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(batch0.toSeq == single.toSeq)
  }

  test("saved IVF index: served batch answers floor recall vs exact") {
    val sf = "/root/testdata/sf0.01"
    def perProbe(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val exact = perProbe(SparkEntry.queries("sim_search_batch")(spark, sf).collect())
    val served = perProbe(SparkEntry.queries("sim_search_ivf_saved")(spark, sf).collect())
    assert(served.keySet == exact.keySet, "every probe must get a served answer")
    val recalls = exact.map { case (p, ex) => (ex & served(p)).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(s"saved-index mean recall@10 = $mean")
    assert(mean >= 0.5, s"saved-index recall regressed: $mean")
    // and the index round-trips: serving the persisted tables again is
    // deterministic (parquet floats are exact)
    val again = perProbe(
      graft.ext.SimSearch.servedTopKPinned(spark, "target/tmp/ivf_index_pinned",
        graft.Tables.embeddings(spark, sf).filter("vec_id < 20")
          .selectExpr("vec_id AS probe_id", "embedding AS probe")).collect())
    assert(again == served)
  }

  test("batch k-means IVF mean recall@10 vs exact batch on sf0.01") {
    val sf = "/root/testdata/sf0.01"
    def perProbe(key: String): Map[Long, Set[Long]] =
      SparkEntry.queries(key)(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val exact = perProbe("sim_search_batch")
    val approx = perProbe("sim_search_ivf_batch")
    assert(exact.keySet == (0L until 20L).toSet)
    assert(approx.keySet == exact.keySet, "every probe must get an answer")
    val recalls = exact.map { case (p, ex) =>
      (ex & approx(p)).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(s"batch IVF mean recall@10 = $mean")
    assert(mean >= 0.5, s"batch recall@10 regressed: $mean")
  }
}

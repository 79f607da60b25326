package graft

import org.scalatest.funsuite.AnyFunSuite

/** Near-dup operator guarantees on real testdata: MinHash candidates are
  * verified with exact Jaccard, so the output must be a SUBSET of the
  * exact all-pairs result (perfect precision; recall is the LSH
  * trade-off). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("minhash output ⊆ exact word-set Jaccard pairs (precision = 1.0)") {
    // exact pairs on the ngram query's bounded probe set (doc_id < 150)
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("dedup_minhash")(spark, TestSpark.sf0001)
      .filter("i < 150 AND j < 150")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty)
    assert(mh.subsetOf(exact), s"false positives: ${mh -- exact}")
  }

  test("minhash recall >= 0.8 vs exact ground truth (b=4/r=4 banding)") {
    // VERDICT r2: b=2/r=8 caught only ~31% of J=0.8 pairs. With b=4/r=4,
    // P(candidate) = 1-(1-J^4)^4 >= 0.88 at J=0.8 and rises steeply with
    // J, so recall against the oracle-checked exact pair set must clear
    // 0.8. Run on sf0.01 for a non-trivial pair population.
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("dedup_minhash")(spark, TestSpark.sf001)
      .filter("i < 150 AND j < 150")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & mh).size.toDouble / exact.size
    info(s"minhash recall vs exact = $recall (${exact.size} true pairs)")
    assert(recall >= 0.8, s"LSH recall regressed: $recall")
  }

  test("md5-signature minhash twin: precision 1.0 and recall >= 0.8") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = SparkEntry.queries("dedup_minhash_md5")(spark, TestSpark.sf001)
      .filter("i < 150 AND j < 150")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact), s"false positives: ${mh -- exact}")
    val recall = (exact & mh).size.toDouble / exact.size
    info(s"md5 minhash recall vs exact = $recall")
    assert(recall >= 0.8, s"LSH recall regressed: $recall")
  }

  test("md5 simhash twin pairs are symmetric-free and above-threshold") {
    val rows = SparkEntry.queries("dedup_simhash_md5")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getInt(2) <= 8))
  }

  test("connectedComponents: path graph needs multi-round propagation") {
    import spark.implicits._
    import graft.ext.Dedup
    // 1-2-3-4 is a path (label 1 must travel 3 hops), {5,6} a pair, 7 isolated
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("i", "j")
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("simhash pairs are symmetric-free and above-threshold") {
    val rows = SparkEntry.queries("dedup_simhash")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getInt(2) <= 8))
  }
}

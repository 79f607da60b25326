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

  test("simhash pairs are symmetric-free and above-threshold") {
    val rows = SparkEntry.queries("dedup_simhash")(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getInt(2) <= 8))
  }
}

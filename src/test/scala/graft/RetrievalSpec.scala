package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval compositions: CCNet bucketing + RAG top-k invariants. */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("text_ccnet_buckets: tertiles are balanced within each language" +
    " and head scores dominate tail scores") {
    val out = SparkEntry.queries("text_ccnet_buckets")(spark, sf)
    val byLang = out.groupBy("lang", "ppl_bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val langs = byLang.keys.map(_._1).toSet
    langs.foreach { l =>
      val h = byLang.getOrElse((l, "head"), 0L)
      val t = byLang.getOrElse((l, "tail"), 0L)
      // ntile keeps the three cuts within 1 of each other
      assert(math.abs(h - t) <= 1, s"unbalanced tertiles for $l: $h vs $t")
      // every head doc scores >= every tail doc within the language
      val minHead = out.filter(col("lang") === l &&
        col("ppl_bucket") === "head").agg(min("score")).collect().head
        .getDouble(0)
      val maxTail = out.filter(col("lang") === l &&
        col("ppl_bucket") === "tail").agg(max("score")).collect().head
        .getDouble(0)
      assert(minHead >= maxTail, s"$l: head min $minHead < tail max $maxTail")
    }
  }

  test("text_rag_retrieve: 5 ranked chunks per query, scores descend," +
    " retrieved chunks actually contain a query term") {
    val out = SparkEntry.queries("text_rag_retrieve")(spark, sf)
      .orderBy("qid", "rank").collect()
    assert(out.length == 15)
    out.groupBy(_.getAs[Int]("qid")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5))
      rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
        .sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    }
    out.foreach(r => assert(r.getAs[Double]("score") > 0.0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The token-vs-character granularity contract of the ExactSubstr pair
  * (VERDICT r12 #6): templated boilerplate whose duplication does not
  * align to >= K whole tokens is invisible to the token K-gram pass and
  * MUST be cut by the character-level suffix-ranking pass. */
class SubstrDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("char-level pass cuts planted boilerplate the token pass misses") {
    import spark.implicits._
    // a 44-char legal footer of only 6 tokens, shared verbatim by two
    // docs whose remaining text is unique: the token pass needs 8
    // consecutive shared tokens (K=8) and finds none; the char pass
    // needs a 32-char shared run (C=32) and cuts the footer
    val footer = "all rights reserved by the example registry" // 43 chars
    assert(footer.length >= 32 && footer.split(" ").length < 8)
    val docs = Seq(
      (1L, s"alpha widget report unique first body text $footer"),
      (2L, s"totally different second document content here $footer"),
      (3L, "a third document sharing nothing with the others at all"))
      .toDF("doc_id", "text")

    val token = graft.ext.SubstrDedup
      .removeDuplicatedSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(token.values.forall(_ == 0L),
      s"token K-grams must MISS the 6-token footer: $token")

    val chars = graft.ext.SubstrDedup
      .removeDuplicatedCharSpans(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toList
    val removed = chars.map(c => c._1 -> c._2).toMap
    assert(removed(1L) >= 32 && removed(2L) >= 32,
      s"char pass must cut the >=32-char footer from both docs: $removed")
    assert(removed(3L) == 0L, s"unique doc must be untouched: $removed")
    // the two containing docs keep DIFFERENT remainders (the cut is the
    // shared span, not whole-doc dedup)
    val md5s = chars.filter(_._1 != 3L).map(_._3)
    assert(md5s.distinct.size == 2)
  }

  test("a doc repeating a span internally cuts it everywhere it occurs") {
    import spark.implicits._
    val span = "0123456789abcdefghijklmnopqrstuv" // exactly 32 chars
    val docs = Seq(
      (1L, s"prefix one $span middle part $span suffix end")) // 2x in ONE doc
      .toDF("doc_id", "text")
    val r = graft.ext.SubstrDedup
      .removeDuplicatedCharSpans(docs, "doc_id", "text")
      .collect().head
    assert(r.getLong(2) >= 64, s"both in-doc occurrences must cut: $r")
  }
}

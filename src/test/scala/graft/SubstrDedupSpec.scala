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

  test("incremental: a later epoch's duplicate reaches back to prior docs") {
    import spark.implicits._
    // 9 shared tokens (K=8): unique to doc 1 in epoch 0 (nothing cut),
    // duplicated by doc 2 in epoch 1 — the epoch-1 delta must re-clean
    // doc 1, and the served rows must equal the batch pass over both
    val span = "zero one two three four five six seven eight"
    assert(span.split(" ").length == 9)
    val d1 = (1L, s"first document body $span and a unique tail")
    val d2 = (2L, s"second doc other words $span completely different end")
    val store = java.nio.file.Files
      .createTempDirectory("graft_substr_incr").toString
    val serve0 = graft.ext.SubstrDedup.substrDedupDelta(
      Seq(d1).toDF("doc_id", "text"), store, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(serve0(1L) == 0L, s"epoch 0 must cut nothing: $serve0")
    val serve1 = graft.ext.SubstrDedup.substrDedupDelta(
      Seq(d2).toDF("doc_id", "text"), store, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val byId = serve1.map(t => t._1 -> t._2).toMap
    assert(byId(1L) >= 9 && byId(2L) >= 9,
      s"the now-duplicated span must be cut from BOTH docs: $serve1")
    // serve == the batch pass over the union corpus, row for row
    val batch = graft.ext.SubstrDedup.removeDuplicatedSpans(
      Seq(d1, d2).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(serve1.sortBy(_._1).toSeq == batch,
      "incremental serve diverged from the batch pass")
    // same-epoch replay is a no-op on the served rows
    val replay = graft.ext.SubstrDedup.substrDedupDelta(
      Seq(d2).toDF("doc_id", "text"), store, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(replay.sortBy(_._1).toSeq == batch, "replay diverged")
  }

  test("char incremental: reach-back at character granularity") {
    import spark.implicits._
    // the 43-char footer unique to doc 1 in epoch 0; duplicated by the
    // epoch-1 doc across DIFFERENT token boundaries (the case the token
    // twin cannot see) — the delta must re-clean doc 1
    val footer = "all rights reserved by the example registry" // 43 chars
    val d1 = (1L, s"first unique document body text $footer")
    val d2 = (2L, s"second-completely-different! $footer")
    val store = java.nio.file.Files
      .createTempDirectory("graft_substr_chars_incr").toString
    val serve0 = graft.ext.SubstrDedup.substrCharsDelta(
      Seq(d1).toDF("doc_id", "text"), store, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(serve0(1L) == 0L, s"epoch 0 must cut nothing: $serve0")
    val serve1 = graft.ext.SubstrDedup.substrCharsDelta(
      Seq(d2).toDF("doc_id", "text"), store, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val byId = serve1.map(t => t._1 -> t._2).toMap
    assert(byId(1L) >= 32 && byId(2L) >= 32,
      s"the footer must be cut from BOTH docs: $serve1")
    val batch = graft.ext.SubstrDedup.removeDuplicatedCharSpans(
      Seq(d1, d2).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(serve1.sortBy(_._1).toSeq == batch,
      "char incremental serve diverged from the batch pass")
  }

  test("segment-local ranking is exact: oversized doc, straddling dup") {
    import spark.implicits._
    // one doc far larger than the segment size, whose duplicated
    // 40-char span is planted to STRADDLE a segment boundary (segChars
    // = 64 -> boundaries at 64, 128, ...): a segment-local rank that
    // were merely approximate would miss the straddling occurrence.
    val span = "THE-DUPLICATED-BOILERPLATE-SPAN-40-CHARS" // 40 chars
    assert(span.length == 40)
    val filler = (0 until 120).map(i => f"q$i%03d!").mkString // 600 unique
    val big = filler.take(50) + span + filler.slice(50, 450) +
      span + filler.drop(450) // occurrences at 51-90 and 491-530
    assert(big.length > 3 * 64, s"doc must span >3 segments: ${big.length}")
    val docs = Seq((1L, big),
      (2L, "short unique second document with nothing shared at all"))
      .toDF("doc_id", "text")
    def run(seg: Int) = graft.ext.SubstrDedup
      .removeDuplicatedCharSpans(docs, "doc_id", "text", segChars = seg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val unsegmented = run(1 << 20) // one segment: the r13 plan, verbatim
    val segmented = run(64)        // per-task bound 64 + C - 1 rows
    assert(segmented == unsegmented,
      s"segmented must equal unsegmented:\n$segmented\nvs\n$unsegmented")
    // and the dup was actually found (both occurrences cut >= 2*40 - eps)
    val removed = segmented.find(_._1 == 1L).get._3
    assert(removed >= 64L, s"straddling dup must be cut: $removed")
  }

  test("segmented == unsegmented across randomized docs and seg sizes") {
    import spark.implicits._
    // fixed-seed randomized corpus: duplicated spans planted at random
    // offsets (including segment-boundary straddles at every tested seg
    // size), doc lengths from sub-C to many segments, alphabet small
    // enough to force incidental C-char repeats too
    val rnd = new scala.util.Random(20260816L)
    val spans = Seq(
      "AAAABBBBCCCCDDDDEEEEFFFFGGGGHHHH",          // exactly C=32
      "the same forty-character boilerplate x!!")   // 40 chars
    val docs = (1L to 24L).map { id =>
      val len = rnd.nextInt(600)
      val base = (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
      val withSpan =
        if (id % 3 == 0 && base.length > 10) {
          val sp = spans((id % 2).toInt)
          val at = rnd.nextInt(base.length)
          base.take(at) + sp + base.drop(at)
        } else base
      (id, withSpan)
    }.toDF("doc_id", "text")
    def run(seg: Int) = graft.ext.SubstrDedup
      .removeDuplicatedCharSpans(docs, "doc_id", "text", segChars = seg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val reference = run(1 << 20)
    Seq(32, 50, 64, 100, 333).foreach { seg =>
      assert(run(seg) == reference,
        s"segChars=$seg diverged from the unsegmented reference")
    }
    // sanity: the 4-letter alphabet corpus actually produced cuts
    assert(reference.exists(_._3 > 0), "no duplicated span was ever cut")
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

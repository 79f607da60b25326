package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

/** Ingest-boundary policy (`src_api_fetch`): retry-once, backoff,
  * rate limit, skip-and-continue — tested offline with injected clocks. */
class IngestSpec extends AnyFunSuite {

  test("fetchWithRetry: one retry after backoff, then success") {
    var calls = 0
    val sleeps = collection.mutable.Buffer[Long]()
    val fetch = (id: String) => {
      calls += 1
      if (calls == 1) throw new RuntimeException("flaky") else s"ok-$id"
    }
    val r = Ingest.fetchWithRetry(fetch, backoffMs = 1000, sleep = sleeps += _)("AAPL")
    assert(r == Right("ok-AAPL"))
    assert(calls == 2)
    assert(sleeps.toSeq == Seq(1000L))
  }

  test("fetchWithRetry: two failures -> Left") {
    val r = Ingest.fetchWithRetry(
      (_: String) => throw new RuntimeException("down"),
      backoffMs = 1, sleep = _ => ())("MSFT")
    assert(r.isLeft)
  }

  test("fetchAll: skip-and-continue, failures collected, rate limited") {
    val sleeps = collection.mutable.Buffer[Long]()
    val (ok, bad) = Ingest.fetchAll(
      Seq("A", "B", "C"),
      (id: String) => if (id == "B") throw new RuntimeException("nope") else id.toLowerCase,
      rateLimitMs = 1000, sleep = sleeps += _)
    assert(ok == Seq("A" -> "a", "C" -> "c"))
    assert(bad == Seq("B"))
    // one rate-limit sleep per entity (+2 retry backoffs for B)
    assert(sleeps.count(_ == 1000L) >= 3)
  }
}

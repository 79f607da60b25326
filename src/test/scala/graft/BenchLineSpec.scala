package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only ~2 KB of stdout tail and parses the ONE
  * bench JSON line out of it — r01 lost its whole bench to an oversized
  * line (`parsed: null`). This pins the worst-case line length at build
  * time so key additions can't silently overflow the budget again. */
class BenchLineSpec extends AnyFunSuite {

  test("headline keys all exist in SparkEntry.queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline references unknown keys: $missing")
  }

  test("worst-case bench line stays within 1600 bytes (~20% tail headroom)") {
    // mirror Bench's line format exactly, with every value at its widest
    // plausible rendering ("999.99" — a 2dp sweep value under 1000 s)
    val qs = Bench.headline.map(k => "\"" + k + "\":999.99")
      .mkString("{", ",", "}")
    val sf = "/root/testdata/sf0.1"
    val line =
      s"""{"metric":"headline_total","value":99999.99,"unit":"sec","n":${Bench.headline.size},"calib":[999.99,999.99],"calibMax":999.99,"rerun":8,"queries":$qs,"sf":"$sf"}"""
    info(s"worst-case line: ${line.length} bytes for ${Bench.headline.size} keys")
    assert(line.length <= 1600,
      s"bench line budget exceeded: ${line.length} > 1600 bytes — " +
        "drop a thin family duplicate from Bench.headline")
  }

  test("no duplicate headline keys") {
    assert(Bench.headline.distinct.size == Bench.headline.size)
  }

  test("rerun candidates: spiked-window keys only, worst-first, capped") {
    // 40 keys a..; probes [start, @15, @30, end]; window 1 (keys 15-29)
    // spiked on its opening probe, window 2 (keys 30-39) on the end probe
    val keys = (0 until 40).map(i => f"k$i%02d")
    val times = keys.zipWithIndex.map { case (k, i) =>
      k -> (if (i == 16) None else Some(i.toDouble)) // one failed key
    }
    val calibs = Seq(0.3, 0.9, 0.31, 0.8)
    val got = Bench.rerunCandidates(times, calibs)
    // eligible: keys 15-39 (both enclosing-probe windows spiked) minus
    // the failed k16 = 24 keys; capped at 8, worst recorded time first
    assert(got == Seq("k39", "k38", "k37", "k36", "k35", "k34", "k33", "k32"))
    // calm sweep: nothing re-runs
    assert(Bench.rerunCandidates(times, Seq(0.3, 0.31, 0.29, 0.3)).isEmpty)
    // spike localized to window 0 only: keys 0-14 eligible (k14 worst)
    val got0 = Bench.rerunCandidates(times, Seq(0.9, 0.3, 0.31, 0.3))
    assert(got0.head == "k14" && got0.size == 8 &&
      got0.forall(_.drop(1).toInt <= 14))
  }
}

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
      s"""{"metric":"headline_total","value":99999.99,"unit":"sec","n":${Bench.headline.size},"calib":[999.99,999.99],"calibMax":999.99,"queries":$qs,"sf":"$sf"}"""
    info(s"worst-case line: ${line.length} bytes for ${Bench.headline.size} keys")
    assert(line.length <= 1600,
      s"bench line budget exceeded: ${line.length} > 1600 bytes — " +
        "drop a thin family duplicate from Bench.headline")
  }

  test("no duplicate headline keys") {
    assert(Bench.headline.distinct.size == Bench.headline.size)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** graft_hex_long(s, pos, len) must equal
  * cast(conv(substring(s, pos, len), 16, 10) as bigint) on every input
  * the md5-coin paths feed it — md5 hex digests at every window the
  * call sites use — plus the edge shapes (short strings, uppercase,
  * invalid tail, null). The r14 optimization swaps the conv form for
  * this expression in the hot paths; value equality here is what keeps
  * every DuckDB oracle hash exact. */
class HexToLongSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def both(s: String, pos: Int, len: Int): (Any, Any) = {
    VectorFunctions.register(spark)
    val row = spark.sql(
      s"SELECT graft_hex_long('$s', $pos, $len) AS a, " +
        s"cast(conv(substring('$s', $pos, $len), 16, 10) as bigint) AS b")
      .collect()(0)
    (row.get(0), row.get(1))
  }

  test("equals conv on md5 digests at every call-site window") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val windows = Seq((1, 8), (9, 8), (17, 8), (25, 8), (1, 15), (1, 12),
      (5, 8), (16, 8))
    val rows = (1 to 2000).map(i => s"probe:$i")
    val df = rows.toDF("k").select(md5(col("k")).as("h"))
    windows.foreach { case (pos, len) =>
      val bad = df.select(
        VectorFunctions.hex_long(col("h"), pos, len).as("a"),
        expr(s"cast(conv(substring(h, $pos, $len), 16, 10) as bigint)").as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0L, s"window ($pos, $len)")
    }
  }

  test("uppercase hex, short windows past end, invalid tail, empty") {
    assert(both("DEADBEEF", 1, 8) == (3735928559L, 3735928559L))
    // window extends past the end: both parse what exists
    assert(both("ab", 1, 8) == (171L, 171L))
    // window starts past the end: conv('',16,10) is NULL — mirror it
    assert(both("ab", 5, 8) == (null, null))
    // parsing stops at the first non-hex byte
    assert(both("12g4", 1, 4) == (18L, 18L))
    // window STARTS at a non-hex byte: zero digits consumed
    val (a, b) = both("g123", 1, 4)
    assert(a == b, s"g123: got $a vs conv $b")
  }

  test("null input yields null; bad args fail at analysis time") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_hex_long(cast(null as string), 1, 8) AS a").collect()(0)
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT graft_hex_long('ab', 1, 16)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_hex_long('ab', 0, 8)").collect()
    }
  }
}

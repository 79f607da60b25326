package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Incremental

/** The incremental fold must equal a from-scratch groupBy over the
  * union for every batch boundary shape: keys only in the base, only in
  * a delta, spread over several deltas, and null values in the mix. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("state + deltas == direct groupBy over the union") {
    import spark.implicits._
    val base = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(5.0)),
      ("gone", None)).toDF("k", "v")
    val d1 = Seq(("a", Some(2.0)), ("c", Some(7.0)), ("c", None)).toDF("k", "v")
    val d2 = Seq(("b", Some(-1.0)), ("d", Some(0.0))).toDF("k", "v")
    var st = Incremental.state(base, Seq("k"), "v")
    st = Incremental.mergeDelta(st, d1, Seq("k"), "v")
    st = Incremental.mergeDelta(st, d2, Seq("k"), "v")
    val got = st.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toDouble),
        Option(r.get(3)).map(_.toString.toDouble),
        Option(r.get(4)).map(_.toString.toDouble)))
    val want = base.union(d1).union(d2)
      .groupBy("k")
      .agg(count(col("v")).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toDouble),
        Option(r.get(3)).map(_.toString.toDouble),
        Option(r.get(4)).map(_.toString.toDouble)))
    assert(got.toSeq == want.toSeq)
    // the all-null key's state row survives with n=0 and null s/mn/mx
    val gone = got.find(_._1 == "gone").get
    assert(gone._2 == 0L && gone._3.isEmpty && gone._4.isEmpty && gone._5.isEmpty)
  }

  test("decimal sums stay exact through repeated merges") {
    import spark.implicits._
    // 0.01 + 0.02 + ... would drift in binary doubles; decimals must not
    val rows = (1 to 1000).map(i => ("k", BigDecimal(i) / 100))
    val (base, delta) = rows.splitAt(500)
    var st = Incremental.state(
      base.toDF("k", "v").select(col("k"), col("v").cast("decimal(12,2)").as("v")),
      Seq("k"), "v")
    st = Incremental.mergeDelta(st,
      delta.toDF("k", "v").select(col("k"), col("v").cast("decimal(12,2)").as("v")),
      Seq("k"), "v")
    val s = st.select(col("s").cast("string")).collect().head.getString(0)
    assert(BigDecimal(s) == (BigDecimal(1000) * 1001 / 2) / 100)
  }

  test("state validates empty keys") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Incremental.state(Seq(("a", 1.0)).toDF("k", "v"), Seq.empty, "v"))
  }

  test("changelog fold: deletes retract, updates shift, emptied groups vanish") {
    import spark.implicits._
    def dec(v: Double) = BigDecimal(v).setScale(2)
    // base view state over {a: 1.00+2.00, b: 5.00, c: 9.00}
    val st = Seq(("a", 2L, dec(3.0)), ("b", 1L, dec(5.0)), ("c", 1L, dec(9.0)))
      .toDF("k", "n", "s")
      .select(col("k"), col("n"), col("s").cast("decimal(12,2)").as("s"))
    // changelog: delete BOTH of a's rows (group must vanish), update b
    // 5.00→7.50, insert d 4.25, and an insert+delete churn on c
    val log = Seq(
      ("D", "a", Some(1.0), None), ("D", "a", Some(2.0), None),
      ("U", "b", Some(5.0), Some(7.5)),
      ("I", "d", None, Some(4.25)),
      ("I", "c", None, Some(1.0)), ("D", "c", Some(9.0), None))
      .toDF("op", "k", "old_v", "new_v")
      .select(col("op"), col("k"),
        col("old_v").cast("decimal(12,2)").as("old_v"),
        col("new_v").cast("decimal(12,2)").as("new_v"))
    val got = Incremental.mergeChangelog(st, log, Seq("k"), "old_v", "new_v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue))
    assert(got.toSeq == Seq(("b", 1L, 7.5), ("c", 1L, 1.0), ("d", 1L, 4.25)),
      s"got ${got.toSeq}")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimSearch
import graft.functions.VectorFunctions

/** Native codegen'd vector expressions: bit-exact equivalence with the
  * HOF reference formulation, SQL registration, null behavior. */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("DotProduct/CosineSimilarity are bit-identical to the HOF formulation") {
    VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(100)
    val cmp = e.select(
      SimSearch.dot(col("embedding"), col("embedding")).as("native_dot"),
      SimSearch.dotHof(col("embedding"), col("embedding")).as("hof_dot"),
      VectorFunctions.cosine_similarity(col("embedding"), col("embedding")).as("native_cos"),
      (SimSearch.dotHof(col("embedding"), col("embedding")) /
        (sqrt(SimSearch.dotHof(col("embedding"), col("embedding"))) *
          sqrt(SimSearch.dotHof(col("embedding"), col("embedding"))))).as("hof_cos"))
    val bad = cmp.filter(col("native_dot") =!= col("hof_dot") ||
      col("native_cos") =!= col("hof_cos")).count()
    assert(bad == 0)
    // self-cosine is exactly 1.0 up to fp division
    val offOne = cmp.filter(abs(col("native_cos") - 1.0) > 1e-12).count()
    assert(offOne == 0)
  }

  test("JaroWinkler matches the oracle engine's published values exactly") {
    // expected values probed from DuckDB jaro_winkler_similarity —
    // window clamp, integer-halved transpositions, 0.7 boost threshold,
    // prefix cap 4, empty → 0.0, all in evidence
    val cases = Seq(
      ("", "", 0.0), ("a", "", 0.0), ("abc", "abc", 1.0),
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("duane", "dwayne", 0.8400000000000001),
      ("ab", "ba", 0.0),
      ("abcdefgh", "hgfedcba", 0.5),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcdxxxxxx", "abcdyyyyyyyyyy", 0.5619047619047619), // no boost <= 0.7
      ("ab", "abcdefghij", 0.7866666666666667))
    cases.foreach { case (a, b, want) =>
      val got = graft.functions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw($a, $b): got $got want $want")
      // symmetry
      val rev = graft.functions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(rev == got, s"jw not symmetric on ($a, $b)")
    }
  }

  test("JaroWinkler codegen path == interpreted eval, null-safe") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Tables.part(spark, TestSpark.sf0001)
      .select(col("p_name").as("a"),
        reverse(col("p_name")).as("b"))
    // codegen (projection over rows) vs direct interpreted compute
    val rows = df.select(col("a"), col("b"),
      VectorFunctions.jaro_winkler(col("a"), col("b")).as("jw")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = graft.functions.JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      assert(r.getDouble(2) == want)
    }
    val n = Seq(("x", null: String)).toDF("a", "b")
      .select(VectorFunctions.jaro_winkler(col("a"), col("b")).as("jw"))
      .collect()
    assert(n.head.isNullAt(0), "null input must yield null, not 0")
  }

  test("SQL registration: graft_cosine usable from spark.sql") {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, TestSpark.sf0001).limit(5)
      .createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d, " +
        "graft_cosine(embedding, embedding) AS c FROM emb_v")
      .collect()
    assert(r.length == 5)
    assert(r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-12))
  }

  test("GraftExtensions injects the functions into a SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register both builders cleanly
  }

  test("graft_minhash rejects a non-foldable num_hashes with a named error") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 42L)).toDF("id", "h").createOrReplaceTempView("mh_bad")
    // column reference instead of a literal: must be an analysis-time
    // error with a message naming the argument, not a ClassCastException
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(h, id) FROM mh_bad GROUP BY id").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("num_hashes"), s"unhelpful error: $e")
  }

  test("graft_minhash accepts a BIGINT literal num_hashes") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 42L), (1L, 7L)).toDF("id", "h").createOrReplaceTempView("mh_ok")
    val r = spark.sql(
      "SELECT graft_minhash(h, CAST(4 AS BIGINT)) AS sig FROM mh_ok GROUP BY id").head()
    assert(r.getSeq[Long](0).length == 4)
  }

  test("graft_intersect_count: sorted-merge count matches array_intersect size") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)), // partial overlap -> 2
      (Seq.empty[Long], Seq(1L, 2L)),               // empty side -> 0
      (Seq(4L, 7L), Seq(4L, 7L)),                   // identical -> 2
      (Seq(-5L, 0L, 8L), Seq(-5L, 8L, 12L))         // negatives sort first -> 2
    ).toDF("a", "b")
    val got = df.select(
      VectorFunctions.intersect_count(col("a"), col("b")).as("c"),
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("null input propagates null") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.dot_product(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [N] Distributed PCA over `embeddings.embedding` (array<float>, 64-dim)
  * with CROSS-ENGINE-DETERMINISTIC pinned arithmetic — the
  * training-data-pipeline primitive behind embedding whitening, drift
  * detection, and low-rank compression.
  *
  * Scale shape (the MLlib RowMatrix pattern, re-expressed declaratively):
  *   1. per-dimension means: one n·dim explode + a 64-group hash agg
  *      (map-side combined — the shuffle carries 64 rows per partition);
  *   2. the dim×dim Gram matrix of the CENTERED data: ROW-LOCAL upper-
  *      triangle outer products (nested `transform` + one `explode`, no
  *      self-join, no shuffle of pair rows) into a C(dim+1,2)=2080-group
  *      hash agg — the only wide stage, and its width is dim²-bounded,
  *      independent of row count;
  *   3. power iteration on the 2080-row Gram RELATION — dim²-scale
  *      DataFrame joins per round (broadcast of the 64-row iterate), so
  *      the "driver-side eigensolve" of the classic design never even
  *      needs a collect; at 100 TB nothing here grows with n.
  *
  * Determinism discipline (the [[Graph.pageRank]] pinning, taken one
  * step further): after the inputs pin to 5dp decimals, EVERYTHING up
  * to the per-round normalization is EXACT decimal arithmetic — the
  * centering is a decimal subtraction (no rounding at all), Gram
  * products are decimal(9,5)×decimal(9,5) → decimal(19,10) exact, the
  * Gram pins only by PRECISION-tightening to decimal(14,10) (same
  * scale, no digit dropped), and the matvec `gv·v` is a
  * decimal(14,10)×decimal(13,12) → decimal(28,22) exact multiply into
  * an exact decimal sum. Scale-DROPPING decimal casts are never left
  * implicit: Spark's decimal downcast rounds HALF_UP while DuckDB's
  * truncates (measured: 9.5343410681 → 9.53434107 vs 9.53434106), so
  * every re-pin goes through an explicit decimal-native `round(x, s)`
  * first — half-away-from-zero in BOTH engines — making the following
  * cast exact. The sole float operation per round is the normalization
  * `bround(w/mw, 12)` of a magnitude-≤1 quotient — the regime
  * [[Graph.pageRank]] already proved hash-exact cross-engine — after
  * `w` re-pins to decimal(18,8) so its double cast stays under 2^53
  * (exactly rounded identically in both engines). The oracle
  * unrolls the identical iteration as chained MATERIALIZED CTEs
  * (materialization matters: `w_k` is referenced twice per round — inlined,
  * the expansion is exponential in rounds).
  *
  * Fixed [[PcaRounds]] rounds: deterministic work, no convergence action.
  * On this near-isotropic synthetic data the iterate still moves ~4e-2
  * per round at 12 rounds (tight eigengap); the operator's contract is
  * the pinned fixed-round estimate, and EmbPcaSpec asserts the REAL
  * invariant — the Rayleigh quotient is non-decreasing across rounds on a
  * PSD Gram — rather than a convergence tolerance the spectrum can't
  * honor.
  */
object EmbPca extends graft.QueryModule {

  private val PcaRounds = 12

  /** Centered pinned values (vec_id, d, c: decimal(9,5) EXACT) and the
    * per-dim means join shape: means are 64 rows → broadcast; the
    * explode is row-local. The mean pins to decimal(8,5) (its double is
    * within 1e-15 of the 5dp grid, so both engines land the same cell)
    * and the centering is an exact decimal subtraction — no rounding. */
  private def centered(s: SparkSession, d: String): DataFrame = {
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xf")))
    val px = ex.select(col("vec_id"), col("d"),
      bround(col("xf").cast("double"), 5).cast("decimal(8,5)").as("x"))
    val mu = px.groupBy(col("d"))
      .agg(bround(sum(col("x")).cast("double") /
        count(lit(1)).cast("double"), 5).cast("decimal(8,5)").as("md"))
    px.join(broadcast(mu), "d")
      .select(col("vec_id"), col("d"), (col("x") - col("md")).as("c"))
  }

  /** The full (mirrored) Gram relation + the final pinned iterate.
    * Gram products are ROW-LOCAL: the centered array is rebuilt per row
    * against a 1-row broadcast means array, upper-triangle pairs come
    * from a nested transform (no self-join), and the single shuffle is
    * the dim²-group agg. */
  private[graft] def gramAndComponent(s: SparkSession, d: String)
      : (DataFrame, IndexedSeq[DataFrame]) = {
    val emb = Tables.embeddings(s, d)
    val ex = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("d", "xf")))
    val mu = ex
      .select(col("d"),
        bround(col("xf").cast("double"), 5).cast("decimal(8,5)").as("x"))
      .groupBy(col("d"))
      .agg(bround(sum(col("x")).cast("double") /
        count(lit(1)).cast("double"), 5).cast("decimal(8,5)").as("md"))
    val marr = mu.agg(expr(
      "transform(sort_array(collect_list(struct(d, md))), s -> s.md)")
      .as("marr"))
    val carrDf = emb.crossJoin(broadcast(marr))
      .select(col("vec_id"), expr(
        """transform(embedding, (xf, i) ->
          |  cast(bround(cast(xf as double), 5) as decimal(8,5))
          |    - element_at(marr, i + 1))""".stripMargin).as("carr"))
    val g = carrDf
      .select(explode(expr(
        """flatten(transform(carr, (xi, i) ->
          |  transform(slice(carr, i + 1, size(carr) - i), (xj, jj) ->
          |    struct(i as i, i + jj as j, xi * xj as p))))""".stripMargin))
        .as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("p")).cast("decimal(14,10)").as("gv"))
    val gf = g.unionAll(g.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("gv")))
      .localCheckpoint()
    var v = mu.select(col("d").as("j"),
      lit(1).cast("decimal(13,12)").as("v")).localCheckpoint()
    val vs = IndexedSeq.newBuilder[DataFrame]
    vs += v
    for (_ <- 1 to PcaRounds) {
      val w = gf.join(broadcast(v), "j")
        .groupBy(col("i"))
        .agg(round(sum(col("gv") * col("v")), 8).cast("decimal(18,8)").as("w"))
      val m = w.orderBy(abs(col("w")).desc, col("i").asc).limit(1)
        .select(col("w").as("mw"))
      v = w.crossJoin(broadcast(m))
        .select(col("i").as("j"),
          bround(col("w").cast("double") / col("mw").cast("double"), 12)
            .cast("decimal(13,12)").as("v"))
        .localCheckpoint()
      vs += v
    }
    (gf, vs.result())
  }

  /** Top principal component (loadings per dim, max-|component| = 1). */
  private def pcaPower(s: SparkSession, d: String): DataFrame = {
    val (_, vs) = gramAndComponent(s, d)
    vs.last.select(col("j").cast("bigint").as("dim"),
        col("v").cast("double").as("loading"))
      .orderBy("dim")
  }

  /** Top-20 rows by |projection| onto the component — the "most extreme
    * along the dominant direction" drift probe. The projection join is
    * n·dim rows against the 64-row broadcast iterate; top-k is a
    * TakeOrdered, no global sort. */
  private def pcaScores(s: SparkSession, d: String): DataFrame = {
    val (_, vs) = gramAndComponent(s, d)
    centered(s, d)
      .join(broadcast(vs.last), col("d") === col("j"))
      .groupBy(col("vec_id"))
      .agg(round(sum(col("c") * col("v")), 10).cast("decimal(18,10)").as("s"))
      .select(col("vec_id"), col("s").cast("double").as("score"))
      .orderBy(abs(col("score")).desc, col("vec_id").asc)
      .limit(20)
  }

  /** Shared oracle prefix: pinned explode, means, centering, Gram,
    * mirror, v0 — every CTE MATERIALIZED (w_k is referenced twice per
    * round; inlining would expand exponentially and re-read the parquet
    * thousands of times). */
  private def oracleBase: String =
    """WITH ex AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
      |         unnest(embedding) AS xf
      |  FROM embeddings),
      |px AS MATERIALIZED (
      |  SELECT vec_id, d,
      |         CAST(round_even(CAST(xf AS DOUBLE), 5) AS DECIMAL(8,5)) AS x
      |  FROM ex),
      |mu AS MATERIALIZED (
      |  SELECT d, CAST(round_even(CAST(sum(x) AS DOUBLE)
      |                            / CAST(count(*) AS DOUBLE), 5)
      |                 AS DECIMAL(8,5)) AS md
      |  FROM px GROUP BY d),
      |cx AS MATERIALIZED (
      |  SELECT vec_id, px.d, x - md AS c
      |  FROM px JOIN mu ON px.d = mu.d),
      |g AS MATERIALIZED (
      |  SELECT a.d AS i, b.d AS j, CAST(sum(a.c * b.c) AS DECIMAL(14,10)) AS gv
      |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id AND a.d <= b.d
      |  GROUP BY a.d, b.d),
      |gf AS MATERIALIZED (
      |  SELECT i, j, gv FROM g
      |  UNION ALL SELECT j, i, gv FROM g WHERE i < j),
      |v0 AS MATERIALIZED (
      |  SELECT d AS j, CAST(1.000000000000 AS DECIMAL(13,12)) AS v FROM mu)""".stripMargin

  private def oracleIters: String =
    (1 to PcaRounds).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT gf.i, CAST(round(sum(gv * v), 8) AS DECIMAL(18,8)) AS w
         |  FROM gf JOIN v${k - 1} ON gf.j = v${k - 1}.j GROUP BY gf.i),
         |v$k AS MATERIALIZED (
         |  SELECT i AS j,
         |         CAST(round_even(CAST(w AS DOUBLE) /
         |              CAST((SELECT w FROM w$k
         |                    ORDER BY abs(w) DESC, i ASC LIMIT 1) AS DOUBLE),
         |              12) AS DECIMAL(13,12)) AS v
         |  FROM w$k)""".stripMargin
    }.mkString(",\n")

  private def pcaPowerOracle: String =
    s"""$oracleBase,
       |$oracleIters
       |SELECT j AS dim, CAST(v AS DOUBLE) AS loading
       |FROM v$PcaRounds ORDER BY dim""".stripMargin

  private def pcaScoresOracle: String =
    s"""$oracleBase,
       |$oracleIters,
       |sc AS MATERIALIZED (
       |  SELECT cx.vec_id, CAST(round(sum(c * v), 10) AS DECIMAL(18,10)) AS s
       |  FROM cx JOIN v$PcaRounds ON cx.d = v$PcaRounds.j
       |  GROUP BY cx.vec_id)
       |SELECT vec_id, CAST(s AS DOUBLE) AS score FROM sc
       |ORDER BY abs(s) DESC, vec_id LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_pca_power" -> pcaPower,
    "emb_pca_scores" -> pcaScores)

  val oracles: Map[String, String] = Map(
    "emb_pca_power" -> pcaPowerOracle,
    "emb_pca_scores" -> pcaScoresOracle)
}

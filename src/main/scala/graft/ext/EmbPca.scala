package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Ckpt.CutOps
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
  private[graft] def centered(s: SparkSession, d: String): DataFrame = {
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
  /** Memoized per (session, dir) — `emb_pca_power`/`_scores`/`_deflate`
    * all start from the same Gram and first-component chain (the
    * [[Graph.coPurchaseEdges]] shared-relation discipline; everything
    * cached is checkpointed, so reuse is exact). */
  private val gramCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, IndexedSeq[DataFrame])]()

  private[graft] def gramAndComponent(s: SparkSession, d: String)
      : (DataFrame, IndexedSeq[DataFrame]) = {
    gramCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    gramCache.computeIfAbsent((s, d), _ => gramAndComponentBuild(s, d))
  }

  private def gramAndComponentBuild(s: SparkSession, d: String)
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
      .cut()
    val v0 = mu.select(col("d").as("j"),
      lit(1).cast("decimal(13,12)").as("v")).cut()
    (gf, iterate(gf, v0, PcaRounds))
  }

  /** The pinned power-iteration loop on any mirrored Gram relation
    * (i, j, gv: decimal(14,10)): matvec as exact decimal sum re-pinned
    * via decimal-native round, max-|w| normalization as the one IEEE
    * division per round. Returns every iterate (v0 included) so specs
    * can trace the Rayleigh ascent. */
  private def iterate(gf: DataFrame, v0: DataFrame, rounds: Int)
      : IndexedSeq[DataFrame] = {
    var v = v0
    val vs = IndexedSeq.newBuilder[DataFrame]
    vs += v
    for (_ <- 1 to rounds) {
      val w = gf.join(broadcast(v), "j")
        .groupBy(col("i"))
        .agg(round(sum(col("gv") * col("v")), 8).cast("decimal(18,8)").as("w"))
      val m = w.orderBy(abs(col("w")).desc, col("i").asc).limit(1)
        .select(col("w").as("mw"))
      v = w.crossJoin(broadcast(m))
        .select(col("i").as("j"),
          bround(col("w").cast("double") / col("mw").cast("double"), 12)
            .cast("decimal(13,12)").as("v"))
        .cut()
      vs += v
    }
    vs.result()
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

  private val DeflateRounds = 8

  /** Top-2 principal components via Hotelling deflation [N]: after the
    * 12-round first component v1, pin its Rayleigh quotient λ =
    * (v1ᵀGv1)/(v1ᵀv1), subtract the rank-1 term (λ/v1ᵀv1)·v1·v1ᵀ — the
    * extra v1ᵀv1 because the max-normalized iterate is NOT unit — from
    * the Gram RELATION (stepwise pinned decimal products — never a 3-factor
    * multiply, whose precision would blow past decimal(38)), and run
    * [[DeflateRounds]] more pinned rounds on the deflated relation.
    * Everything stays dim²-scale: the deflate is one pass over the
    * 64²-row Gram with two 64-row broadcast lookups. The contract is
    * the pinned fixed-round estimate (like component 1); EmbPcaSpec
    * asserts near-orthogonality and the Rayleigh ordering λ1 ≥ λ2. */
  private def pcaDeflate(s: SparkSession, d: String): DataFrame = {
    val (gf, vs) = gramAndComponent(s, d)
    val v1 = vs.last
    val gv1 = gf.join(broadcast(v1), "j")
      .groupBy(col("i"))
      .agg(round(sum(col("gv") * col("v")), 8).cast("decimal(18,8)").as("w"))
    val num = gv1.join(broadcast(v1), col("i") === col("j"))
      .agg(round(sum(col("w") * col("v")), 8).cast("decimal(18,8)").as("num"))
    val den = v1
      .agg(round(sum(col("v") * col("v")), 12).cast("decimal(16,12)").as("den"))
    // the rank-1 term for a NON-UNIT iterate is (λ/v1ᵀv1)·v1·v1ᵀ =
    // num/den²·v1·v1ᵀ — two chained IEEE divisions, operand order
    // mirrored verbatim in the oracle, pinned once at 8dp
    val lam = num.crossJoin(broadcast(den))
      .select(bround(col("num").cast("double") / col("den").cast("double")
          / col("den").cast("double"), 8)
        .cast("decimal(18,8)").as("lam"))
    val vi = v1.select(col("j").as("i"), col("v").as("vi"))
    val vj = v1.select(col("j"), col("v").as("vj"))
    val g2 = gf.crossJoin(broadcast(lam))
      .join(broadcast(vi), "i")
      .join(broadcast(vj), "j")
      .select(col("i"), col("j"),
        (col("gv") -
          round(round(col("lam") * col("vi"), 10).cast("decimal(18,10)")
            * col("vj"), 10).cast("decimal(18,10)"))
          .cast("decimal(16,10)").as("gv"))
      .cut()
    val v0 = v1.select(col("j"), lit(1).cast("decimal(13,12)").as("v"))
      .cut()
    val v2 = iterate(g2, v0, DeflateRounds).last
    v1.select(col("j").as("dim"), col("v").as("l1"))
      .join(v2.select(col("j").as("dim"), col("v").as("l2")), "dim")
      .select(col("dim").cast("bigint").as("dim"),
        col("l1").cast("double").as("loading1"),
        col("l2").cast("double").as("loading2"))
      .orderBy("dim")
  }

  private def pcaDeflateOracle: String =
    s"""$oracleBase,
       |$oracleIters,
       |gv1 AS MATERIALIZED (
       |  SELECT gf.i, CAST(round(sum(gv * v), 8) AS DECIMAL(18,8)) AS w
       |  FROM gf JOIN v$PcaRounds ON gf.j = v$PcaRounds.j GROUP BY gf.i),
       |num AS MATERIALIZED (
       |  SELECT CAST(round(sum(w * v), 8) AS DECIMAL(18,8)) AS num
       |  FROM gv1 JOIN v$PcaRounds ON gv1.i = v$PcaRounds.j),
       |den AS MATERIALIZED (
       |  SELECT CAST(round(sum(v * v), 12) AS DECIMAL(16,12)) AS den
       |  FROM v$PcaRounds),
       |lam AS MATERIALIZED (
       |  SELECT CAST(round_even(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       |                         / CAST(den AS DOUBLE), 8)
       |              AS DECIMAL(18,8)) AS lam
       |  FROM num, den),
       |g2 AS MATERIALIZED (
       |  SELECT gf.i, gf.j,
       |         CAST(gv - CAST(round(CAST(round(lam * vi.v, 10)
       |                  AS DECIMAL(18,10)) * vj.v, 10) AS DECIMAL(18,10))
       |              AS DECIMAL(16,10)) AS gv
       |  FROM gf CROSS JOIN lam
       |  JOIN v$PcaRounds vi ON gf.i = vi.j
       |  JOIN v$PcaRounds vj ON gf.j = vj.j),
       |${oracleIterChain("g2", "u", "x", DeflateRounds, start = "v0")}
       |SELECT a.j AS dim, CAST(a.v AS DOUBLE) AS loading1,
       |       CAST(b.v AS DOUBLE) AS loading2
       |FROM v$PcaRounds a JOIN u$DeflateRounds b ON a.j = b.j
       |ORDER BY dim""".stripMargin

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

  /** One pinned power-iteration chain as MATERIALIZED CTEs: `rounds`
    * rounds on gram relation `g`, iterates named `$vp{k}` starting from
    * the existing CTE `$vp0` (or `start` when given). */
  private def oracleIterChain(g: String, vp: String, wp: String,
                              rounds: Int, start: String = ""): String =
    (1 to rounds).map { k =>
      val prev = if (k == 1 && start.nonEmpty) start else s"$vp${k - 1}"
      s"""$wp$k AS MATERIALIZED (
         |  SELECT $g.i, CAST(round(sum(gv * v), 8) AS DECIMAL(18,8)) AS w
         |  FROM $g JOIN $prev ON $g.j = $prev.j GROUP BY $g.i),
         |$vp$k AS MATERIALIZED (
         |  SELECT i AS j,
         |         CAST(round_even(CAST(w AS DOUBLE) /
         |              CAST((SELECT w FROM $wp$k
         |                    ORDER BY abs(w) DESC, i ASC LIMIT 1) AS DOUBLE),
         |              12) AS DECIMAL(13,12)) AS v
         |  FROM $wp$k)""".stripMargin
    }.mkString(",\n")

  private def oracleIters: String = oracleIterChain("gf", "v", "w", PcaRounds)

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
    "emb_pca_scores" -> pcaScores,
    "emb_pca_deflate" -> pcaDeflate)

  val oracles: Map[String, String] = Map(
    "emb_pca_power" -> pcaPowerOracle,
    "emb_pca_scores" -> pcaScoresOracle,
    "emb_pca_deflate" -> pcaDeflateOracle)
}

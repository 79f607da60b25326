package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Preference-data analytics [N] — pairwise win rates and Bradley-Terry
  * strength fitting, the statistics an RLHF / preference-dataset
  * pipeline computes over A-vs-B comparison logs. No reference anchor;
  * warehouse-parity rows per BASELINE.json's mandate, nearest SURVEY
  * anchors the §L stats battery and `graph_pagerank` (pinned iterative
  * fixpoint discipline).
  *
  * The comparison log is DERIVED deterministically from `orders`: each
  * order is one A-vs-B matchup between 4 synthetic "models" drawn from
  * md5 coins, with the outcome coin biased by the model-index gap so
  * stronger indices genuinely win more — the fit has a known ground
  * truth (strengths must come out ordered 0 < 1 < 2 < 3;
  * EvaluationSpec asserts it).
  *
  * Float discipline: win rates are ONE IEEE division of exact counts;
  * the Bradley-Terry minorization-maximization iteration re-pins every
  * quotient at 12dp (`bround` ↔ `round_even`) and accumulates pinned
  * terms as decimal(24,12) — the `graph_pagerank` determinism
  * discipline applied to preference fitting. */
object Preference extends graft.QueryModule {

  private def dd(c: Column): Column = c.cast("double")

  private val btIters = 3

  /** The synthetic comparison log: (a, b, a_wins) per order.
    * a ∈ 0..3; b is drawn from the OTHER three via the +1+coin%3 trick
    * (near-uniform: the nibble%3 draw weights residues 6/5/5 over 16
    * hex values, a ~4% skew toward rb=0); outcome coin (0..255 from
    * two md5 hex chars) compared against 128 + 24·(a − b), so
    * P(a wins) ≈ 0.5 + 0.094·(a − b). */
  private def matches(s: SparkSession, d: String): DataFrame = {
    def hexCoin(salt: String, chars: Int): Column =
      Synth.hexCoin(col("o_orderkey"), salt, chars)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        (hexCoin("a", 1) % 4).as("a"),
        (hexCoin("b", 1) % 3).as("rb"),
        hexCoin("w", 2).as("coin"))
      .select(col("o_orderkey"), col("a"),
        ((col("a") + 1 + col("rb")) % 4).as("b"), col("coin"))
      .select(col("a"), col("b"),
        (col("coin") < lit(128) + lit(24) * (col("a") - col("b")))
          .as("a_wins"))
  }

  /** Pairwise win-rate matrix [N]: per unordered model pair (m1 < m2),
    * matchup count and m1's win share. One conditional hash agg into
    * the 6-pair domain (map-side combine); the rate is ONE IEEE
    * division of exact BIGINT counts. */
  private def winrate(s: SparkSession, d: String): DataFrame =
    matches(s, d)
      .select(least(col("a"), col("b")).as("m1"),
        greatest(col("a"), col("b")).as("m2"),
        // m1's win: a won and a is the smaller index, or b "won" (a
        // lost) and b is the smaller index
        when(col("a") < col("b"), col("a_wins"))
          .otherwise(!col("a_wins")).as("w1"))
      .groupBy(col("m1"), col("m2"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("w1"), 1L).otherwise(0L)).as("wins_1"))
      .select(col("m1"), col("m2"), col("n"), col("wins_1"),
        (dd(col("wins_1")) / dd(col("n"))).as("winrate_1"))
      .orderBy("m1", "m2")

  /** Bradley-Terry strengths [N] via minorization-maximization
    * (Hunter 2004): p_i ← w_i / Σ_j n_ij/(p_i+p_j), renormalized to
    * Σp = 1, with every quotient re-pinned at 12dp and pinned terms
    * summed as decimal(24,12) — bit-identical on any partitioning and
    * in DuckDB's unrolled-CTE restatement (the `graph_pagerank`
    * discipline; float algebra is confined to IEEE-mirrored single
    * ops between pins).
    *
    * Scale shape: ONE data-scale hash agg builds the (model, opponent)
    * matchup matrix; the iteration then runs entirely in the
    * 4-model × 3-opponent domain (broadcast joins, dimension-bounded)
    * — at 100 TB the comparison log is huge but the model domain is
    * not, which is exactly how a preference-fit over a production log
    * should decompose. */
  private def bradleyTerry(s: SparkSession, d: String): DataFrame = {
    val m = matches(s, d)
    // both orientations: games n and wins w of i against each j
    val dir = m.select(col("a").as("i"), col("b").as("j"),
        when(col("a_wins"), 1L).otherwise(0L).as("wi"))
      .unionAll(m.select(col("b").as("i"), col("a").as("j"),
        when(col("a_wins"), 0L).otherwise(1L).as("wi")))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("wi")).as("w"))
      .localCheckpoint()
    val wins = dir.groupBy(col("i")).agg(sum(col("w")).as("wins"))
      .localCheckpoint()
    var p = wins.select(col("i"), lit(0.25).as("p"))
    for (_ <- 1 to btIters) {
      val pj = p.select(col("i").as("j"), col("p").as("pj"))
      val denom = dir
        .join(broadcast(p), "i")
        .join(broadcast(pj), "j")
        .select(col("i"),
          bround(dd(col("n")) / (col("p") + col("pj")), 12)
            .cast("decimal(24,12)").as("c"))
        .groupBy(col("i")).agg(sum(col("c")).as("s"))
      val raw = wins.join(broadcast(denom), "i")
        .select(col("i"),
          bround(dd(col("wins")) / dd(col("s")), 12).as("q"))
      val tot = raw.agg(sum(col("q").cast("decimal(24,12)")).as("tot"))
      p = raw.crossJoin(broadcast(tot))
        .select(col("i"), bround(col("q") / dd(col("tot")), 12).as("p"))
        .localCheckpoint()
    }
    wins.join(broadcast(p), "i")
      .select(col("i").as("model"), col("wins"), col("p").as("strength"))
      .orderBy("model")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pref_winrate" -> winrate,
    "pref_bradley_terry" -> bradleyTerry)

  /** Shared oracle CTEs: the md5-coin matchup log (hex decoded by the
    * strpos polynomial — DuckDB has no conv) and the orientation-
    * expanded matchup matrix. */
  private val matchesSql =
    """m AS MATERIALIZED (
      |  SELECT a, (a + 1 + rb) % 4 AS b,
      |         coin < 128 + 24 * (a - (a + 1 + rb) % 4) AS a_wins
      |  FROM (
      |    SELECT
      |      (strpos('0123456789abcdef',
      |         substr(md5(CAST(o_orderkey AS VARCHAR) || ':a'), 1, 1)) - 1) % 4 AS a,
      |      (strpos('0123456789abcdef',
      |         substr(md5(CAST(o_orderkey AS VARCHAR) || ':b'), 1, 1)) - 1) % 3 AS rb,
      |      (strpos('0123456789abcdef',
      |         substr(md5(CAST(o_orderkey AS VARCHAR) || ':w'), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef',
      |         substr(md5(CAST(o_orderkey AS VARCHAR) || ':w'), 2, 1)) - 1) AS coin
      |    FROM orders))""".stripMargin

  private def bradleyTerryOracle: String = {
    val iters = (1 to btIters).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT dir.i,
         |         sum(CAST(round_even(CAST(dir.n AS DOUBLE) / (pi.p + pj.p), 12)
         |                  AS DECIMAL(24,12))) AS s
         |  FROM dir JOIN p${k - 1} pi ON dir.i = pi.i
         |           JOIN p${k - 1} pj ON dir.j = pj.i
         |  GROUP BY dir.i),
         |raw$k AS MATERIALIZED (
         |  SELECT w.i, round_even(CAST(w.wins AS DOUBLE) / CAST(d$k.s AS DOUBLE), 12) AS q
         |  FROM wins w JOIN d$k ON w.i = d$k.i),
         |t$k AS MATERIALIZED (
         |  SELECT sum(CAST(q AS DECIMAL(24,12))) AS tot FROM raw$k),
         |p$k AS MATERIALIZED (
         |  SELECT i, round_even(q / CAST(t$k.tot AS DOUBLE), 12) AS p
         |  FROM raw$k, t$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $matchesSql,
       |dir AS MATERIALIZED (
       |  SELECT i, j, count(*) AS n, sum(wi) AS w FROM (
       |    SELECT a AS i, b AS j, CASE WHEN a_wins THEN 1 ELSE 0 END AS wi FROM m
       |    UNION ALL
       |    SELECT b, a, CASE WHEN a_wins THEN 0 ELSE 1 END FROM m) x
       |  GROUP BY i, j),
       |wins AS MATERIALIZED (
       |  SELECT i, CAST(sum(w) AS BIGINT) AS wins FROM dir GROUP BY i),
       |p0 AS MATERIALIZED (SELECT i, CAST(0.25 AS DOUBLE) AS p FROM wins),
       |$iters
       |SELECT w.i AS model, w.wins, p.p AS strength
       |FROM wins w JOIN p$btIters p ON w.i = p.i ORDER BY model""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "pref_winrate" ->
      s"""WITH $matchesSql
         |SELECT least(a, b) AS m1, greatest(a, b) AS m2,
         |       count(*) AS n,
         |       CAST(sum(CASE WHEN (a < b) = a_wins THEN 1 ELSE 0 END) AS BIGINT) AS wins_1,
         |       CAST(sum(CASE WHEN (a < b) = a_wins THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS winrate_1
         |FROM m GROUP BY 1, 2 ORDER BY m1, m2""".stripMargin,
    "pref_bradley_terry" -> bradleyTerryOracle)
}

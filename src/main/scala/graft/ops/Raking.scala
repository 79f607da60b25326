package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative proportional fitting (raking) [N] — Deming & Stephan 1940,
  * the survey-weighting workhorse: rescale the observed
  * (priority × status) contingency table until its margins match
  * target margins (uniform here: total/5 per priority row, total/3 per
  * status column). Three full row+column rounds with every scaled cell
  * re-pinned at 6dp and every margin summed as decimal(24,12) — the
  * `graph_pagerank` pinned-fixpoint discipline on a 2-D problem. The
  * pin is 6dp (not the usual 12) because the cells are COUNT-scale: a
  * 12dp grid sits below the double ULP at magnitude ~10³⁺, where the
  * two engines' round-even implementations stop agreeing — the pin
  * precision must stay coarser than ULP at the value's magnitude
  * (measured: 12dp drifted 10/15 cells at sf0.01).
  *
  * Scale shape: ONE data-scale hash agg builds the 15-cell table; the
  * iteration is entirely domain-sized (broadcast margin joins). A
  * production rake over billions of rows has exactly this decomposition
  * — the data is touched once, the fit runs on the margins. */
object Raking extends graft.QueryModule {

  private val ipfRounds = 3

  private def ipf(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = cells.agg(sum(col("n")).as("t")).collect().head.getLong(0)
    val rowTarget = tot.toDouble / 5.0
    val colTarget = tot.toDouble / 3.0
    var w = cells.select(col("p"), col("c"), col("n"),
      col("n").cast("double").as("w"))
    for (_ <- 1 to ipfRounds) {
      val rows = w.groupBy(col("p"))
        .agg(sum(col("w").cast("decimal(24,12)")).as("rs"))
      val afterRow = w.join(broadcast(rows), "p")
        .select(col("p"), col("c"), col("n"),
          bround(col("w") * (lit(rowTarget) / col("rs").cast("double")), 6)
            .as("w"))
      val cols = afterRow.groupBy(col("c"))
        .agg(sum(col("w").cast("decimal(24,12)")).as("cs"))
      w = afterRow.join(broadcast(cols), "c")
        .select(col("p"), col("c"), col("n"),
          bround(col("w") * (lit(colTarget) / col("cs").cast("double")), 6)
            .as("w"))
        .localCheckpoint()
    }
    w.select(col("p"), col("c"), col("n"),
      col("w").as("weight"),
      bround(col("w") / col("n").cast("double"), 8).as("rake_factor"))
      .orderBy("p", "c")
  }

  /** The fit's margins after the final column step: columns match the
    * target EXACTLY (the last step scaled them); rows are near-target
    * (IPF converges geometrically). Spec asserts both. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_ipf_rake" -> ipf)

  private def ipfOracle: String = {
    val steps = (1 to ipfRounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT w.p, w.c, w.n,
         |         round_even(w.w * (tt.t / 5.0 / CAST(m.rs AS DOUBLE)), 6) AS w
         |  FROM w${k - 1} w
         |  JOIN (SELECT p, sum(CAST(w AS DECIMAL(24,12))) AS rs
         |        FROM w${k - 1} GROUP BY p) m ON w.p = m.p
         |  CROSS JOIN tt),
         |w$k AS MATERIALIZED (
         |  SELECT r.p, r.c, r.n,
         |         round_even(r.w * (tt.t / 3.0 / CAST(m.cs AS DOUBLE)), 6) AS w
         |  FROM r$k r
         |  JOIN (SELECT c, sum(CAST(w AS DECIMAL(24,12))) AS cs
         |        FROM r$k GROUP BY c) m ON r.c = m.c
         |  CROSS JOIN tt)""".stripMargin
    }.mkString(",\n")
    s"""WITH cells AS MATERIALIZED (
       |  SELECT o_orderpriority AS p, o_orderstatus AS c, count(*) AS n
       |  FROM orders GROUP BY 1, 2),
       |tt AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM cells),
       |w0 AS MATERIALIZED (
       |  SELECT p, c, n, CAST(n AS DOUBLE) AS w FROM cells),
       |$steps
       |SELECT p, c, CAST(n AS BIGINT) AS n, w AS weight,
       |       round_even(w / CAST(n AS DOUBLE), 8) AS rake_factor
       |FROM w$ipfRounds ORDER BY p, c""".stripMargin
  }

  val oracles: Map[String, String] = Map("stats_ipf_rake" -> ipfOracle)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expr.Metrics

/** Flagship end-to-end snapshot query (SURVEY.md §7 step 1): the reference's
  * core dataflow — per-entity latest-row selection + trailing-4 aggregation
  * (`fetch_data.py:29-36,197-198`) → broadcast config-dim join
  * (`fetch_data.py:72-82`) → classifier + growth clamp + banker's rounding
  * (`fetch_data.py:53-108`) → ordered snapshot projection
  * (`fetch_data.py:246-273`) — rebound onto the driver testdata
  * (events ⋈ customer).
  *
  * Scale notes: one shuffle for the per-user window (hash-partitioned by
  * user_id, reused by the aggregate since partial aggregation happens
  * map-side on the already-partitioned stream); the config dim is a 5-row
  * literal broadcast; customer join shuffles on the (already windowed) key.
  */
object Flagship extends graft.QueryModule {

  def snapshot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val cfg = Dims.segmentConfigDF(spark)

    // Recency rank per user (ts already µs in Spark; event_id tie-break for
    // full determinism — SURVEY §7 hard parts).
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val ranked = events.withColumn("rn", row_number().over(w))

    // One hash-agg pass: latest row fields + trailing-4 sum (TTM shape).
    val perUser = ranked
      .filter($"rn" <= 4)
      .groupBy($"user_id")
      .agg(
        max(when($"rn" === 1, $"event_type")).as("latest_type"),
        max(when($"rn" === 1, $"value")).as("latest_value"),
        sum(coalesce($"value", lit(0.0))).as("ttm"))

    val joined = perUser
      .join(customer, perUser("user_id") === customer("c_custkey"))
      .join(cfg, $"c_mktsegment" === $"seg")

    val implied = $"ttm" / 7  // prime divisor: no decimal-tie structure under bround
    val marketCap = $"c_acctbal" * 1e8
    joined.select(
      $"user_id",
      $"latest_type",
      bround($"latest_value", 2).as("latest_value"),
      bround($"ttm", 2).as("ttm_value"),
      Metrics.clampGrowth(implied, $"ming", $"maxg", $"cyc", marketCap).as("growth"),
      when($"latest_type" === "purchase" || $"c_mktsegment" === "BUILDING", "Commerce")
        .when($"latest_type" === "error", "Ops")
        .when($"c_mktsegment" === "MACHINERY", "Industrial")
        .otherwise("General").as("sector_type"),
      lit("USD").as("currency_code")
    ).orderBy($"user_id")
  }

  val oracle: String =
    """WITH r AS (
      |  SELECT user_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
      |  FROM events
      |), s AS (
      |  SELECT user_id,
      |         max(CASE WHEN rn = 1 THEN event_type END) AS latest_type,
      |         max(CASE WHEN rn = 1 THEN value END) AS latest_value,
      |         sum(CASE WHEN rn <= 4 THEN coalesce(value, 0) ELSE 0 END) AS ttm
      |  FROM r WHERE rn <= 4 GROUP BY user_id
      |), """.stripMargin + Dims.segmentConfigSql + """, j AS (
      |  SELECT s.*, c.c_mktsegment, c.c_acctbal, cfg.maxg, cfg.ming, cfg.cyc,
      |         CASE WHEN s.ttm / 7 < cfg.ming THEN (CASE WHEN cfg.cyc THEN 3.0 ELSE cfg.ming END)
      |              WHEN s.ttm / 7 > cfg.maxg THEN cfg.maxg
      |              ELSE s.ttm / 7 END AS clamped
      |  FROM s JOIN customer c ON s.user_id = c.c_custkey
      |         JOIN cfg ON c.c_mktsegment = cfg.seg
      |)
      |SELECT user_id, latest_type,
      |       round_even(latest_value, 2) AS latest_value,
      |       round_even(ttm, 2) AS ttm_value,
      |       round_even(CASE WHEN c_acctbal * 1e8 > 5e11 AND clamped > 30 THEN 30.0
      |                       ELSE clamped END, 2) AS growth,
      |       CASE WHEN latest_type = 'purchase' OR c_mktsegment = 'BUILDING' THEN 'Commerce'
      |            WHEN latest_type = 'error' THEN 'Ops'
      |            WHEN c_mktsegment = 'MACHINERY' THEN 'Industrial'
      |            ELSE 'General' END AS sector_type,
      |       'USD' AS currency_code
      |FROM j ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("pipeline_snapshot" -> snapshot)
  val oracles: Map[String, String] = Map("pipeline_snapshot" -> oracle)
}

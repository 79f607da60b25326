package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Shared deterministic-synthesis helpers for the [N] analytics modules
  * (evaluation / preference / features). Each has ONE definition here so
  * the Spark expression and every oracle mirror change in lockstep —
  * duplicated copies of these derivations were the drift surface the r8
  * self-review flagged. */
private[ops] object Synth {

  /** md5-coin in [0, 16^chars): the cross-engine deterministic RNG
    * (DuckDB mirrors via the strpos hex polynomial — `text_split_assign`
    * precedent). */
  def hexCoin(key: Column, salt: String, chars: Int): Column =
    graft.functions.VectorFunctions.hex_long(
      md5(concat(key.cast("string"), lit(":" + salt))), 1, chars)

  /** o_totalprice as exact BIGINT cents. */
  def orderCents: Column =
    (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")

  /** Shared (segment g, $1000-bin v) → (npos, n) cell relation over
    * orders — the binned score domain both `eval_auc` and
    * `eval_avg_precision` rank over (label: fulfilled). A single
    * definition keeps the two metrics on one domain. */
  def scoreCells(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("g"),
        col("o_orderstatus"), orderCents.as("cents"))
      .select(col("g"), expr("cents div 100000").as("v"),
        (col("o_orderstatus") === "F").as("pos"))
      .groupBy(col("g"), col("v"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        count(lit(1)).as("n"))

  /** Shared ranking corpus for `eval_ndcg` and `eval_mrr`: 200 query
    * buckets, price as the system score, md5-derived relevance grades
    * 0..3 — ONE definition so the two ranking metrics judge the same
    * corpus by construction. */
  def queryRelevance(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(pmod(col("o_custkey"), lit(200)).as("qid"),
        col("o_orderkey").as("doc"),
        orderCents.as("score"),
        (graft.functions.VectorFunctions.hex_long(
          md5(concat(col("o_orderkey").cast("string"), lit(":rel"))), 1, 1)
          .cast("int") % 4).as("rel"))

  /** Shared 10-probability-bin relation for `eval_calibration` and
    * `eval_brier` — p = min(cents, 6e7)/6e7, bins of width 0.1. A
    * single definition makes "the same bins" structural, not
    * copy-paste. */
  def calibrationBins(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(least(orderCents, lit(60000000L)).as("pc"),
        (col("o_orderstatus") === "F").as("pos"))
      .groupBy(expr("least(pc, 59999999) div 6000000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pc")).as("sp"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
}

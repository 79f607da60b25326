package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * query key; keys with DuckDB-expressible semantics also carry oracle SQL
  * (hash-compared by the driver at sf0.01). Keys are assembled from the
  * per-category objects under `graft.ops` / `graft.ext`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Flagship.snapshot(spark, "/root/testdata/sf0.001")

  private lazy val modules: Seq[QueryModule] = Seq(
    ops.Flagship, ops.Scans, ops.Exprs, ops.Aggs, ops.Joins,
    ops.Windows, ops.SetOps, ops.Funcs, ops.StreamBatch, ops.SqlSurface,
    ops.Statements, ops.TpchDeep, ops.TpchClose, ops.Warehouse, ops.Finance,
    ops.Technicals, ops.Autocorr, ops.TsTests,
    ops.Retail, ops.Evaluation, ops.Preference, ops.Features, ops.EvalExtra,
    ops.StatsExtra, ops.StatsLearn, ops.StatsRank, ops.Calibration,
    ops.Resampling, ops.Recommender,
    ops.Attribution, ops.EntityResolution,
    ext.Dedup, ext.SimSearch, ext.TextAnalysis, ext.Multimodal, ext.Audio,
    ext.Corpus, ext.Graph, ext.EmbPca, ext.Rake, ext.SubstrDedup,
    ext.Retrieval)

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every binding registers the graft SQL functions first (idempotent,
    * microseconds): the r14 optimization pass moved hot md5-coin sites
    * onto `graft_hex_long`, and SQL-string call sites (expr("...")) need
    * the name resolvable on whatever session the driver supplies —
    * registering here removes the per-module choreography. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap.map { case (k, f) =>
      k -> { (s: SparkSession, d: String) =>
        functions.VectorFunctions.register(s)
        f(s, d)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

/** A category of SURVEY §2 operators: its query bindings + oracle SQL. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps [N] — the data-skipping layer Delta/Iceberg
  * manifests provide, re-expressed as two plain parquet tables: `data/`
  * (the rows, range-clustered so per-file value bands are tight) and
  * `manifest/` (one row per data file: min/max of each tracked column).
  *
  * A predicate on a tracked column prunes at the FILE level before any
  * scan task launches: the manifest (thousands of rows at 100 TB — file
  * count, not row count) is filtered for files whose [min, max] band
  * overlaps the predicate, and only those files are handed to the
  * reader. This composes with, and acts earlier than, parquet row-group
  * stats: row-group pruning still opens every footer; manifest pruning
  * never lists the excluded files at all — on object storage that is the
  * difference between a 1000-file LIST+HEAD storm and reading one
  * manifest table.
  *
  * The manifest collect is driver-side METADATA (like a Delta log read),
  * bounded by file count — never row data.
  */
object ZoneMap {

  /** Write `df` under `dir/data` range-clustered into `nFiles` files by
    * `clusterCol`, then build `dir/manifest` with per-file min/max for
    * every column in `statsCols` (one read-back scan of only those
    * columns — columnar, cheap). */
  def write(df: DataFrame, dir: String, clusterCol: String,
            statsCols: Seq[String], nFiles: Int = 8): Unit = {
    require(statsCols.nonEmpty, "zone map needs at least one stats column")
    df.repartitionByRange(nFiles, col(clusterCol))
      .write.mode("overwrite").parquet(s"$dir/data")
    val spark = df.sparkSession
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(s"$dir/data")
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** Files whose [min, max] band for `statCol` overlaps [lo, hi] — the
    * candidate set a band-overlap predicate cannot exclude. */
  def prunedFiles(spark: SparkSession, dir: String, statCol: String,
                  lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(s"$dir/manifest")
      .filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select(col("file"))
      .collect().map(_.getString(0)).toIndexedSeq

  /** Total file count in the manifest (for pruning-ratio assertions). */
  def fileCount(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/manifest").count()

  /** Manifest-pruned read: scan ONLY the overlapping files, then apply
    * the exact predicate as a residual filter (zone bands admit false
    * positives at the file edges; the residual keeps the answer exact
    * for any band layout). */
  def read(spark: SparkSession, dir: String, statCol: String,
           lo: Column, hi: Column): DataFrame = {
    val files = prunedFiles(spark, dir, statCol, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(s"$dir/data").limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(statCol) >= lo && col(statCol) <= hi)
  }
}

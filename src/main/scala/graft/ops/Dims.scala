package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Literal dimension tables (role of SECTOR_CONFIG `fetch_data.py:72-80`):
  * tiny driver-side Seqs turned into broadcast DataFrames, so every lookup
  * is a broadcast hash join — no shuffle at any scale.
  */
object Dims {

  /** Per-mktsegment growth config `(seg, maxg, ming, cyc)` — the testdata
    * rebinding of the reference's 7-row sector config. */
  val segmentConfig: Seq[(String, Double, Double, Boolean)] = Seq(
    ("BUILDING", 45.0, 0.0, false),
    ("AUTOMOBILE", 60.0, -5.0, true),
    ("MACHINERY", 15.0, 0.0, true),
    ("HOUSEHOLD", 10.0, 0.0, false),
    ("FURNITURE", 20.0, -2.0, false))

  def segmentConfigDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    broadcast(segmentConfig.toDF("seg", "maxg", "ming", "cyc"))
  }

  /** The same dim as DuckDB VALUES SQL, for oracle queries. */
  val segmentConfigSql: String =
    """cfg(seg, maxg, ming, cyc) AS (
      |  VALUES ('BUILDING', 45.0, 0.0, false), ('AUTOMOBILE', 60.0, -5.0, true),
      |         ('MACHINERY', 15.0, 0.0, true), ('HOUSEHOLD', 10.0, 0.0, false),
      |         ('FURNITURE', 20.0, -2.0, false)
      |)""".stripMargin
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.Metrics
import graft.model.Schemas

/** The reference's EP1 dataflow (`fetch_data.py:301-321`, SURVEY §3)
  * re-expressed as one declarative Spark job: glob-scan ticker lists →
  * trim/upper/dedup → join the fetched-snapshot landing zone → per-entity
  * JSON sink + nested manifest.
  *
  * The per-entity network fetch is an ingest-boundary concern
  * ([[graft.sources.Ingest]]); here the landing zone is a directory of
  * snapshot JSONs (the golden reference data corpus in tests).
  *
  * Scale: the list scan is tiny and broadcast; snapshots scan is the fact
  * side; the membership join never shuffles the fact side (broadcast hash
  * join on the normalized ticker).
  */
object Refresh {

  /** `load_tickers_from_lists` (`fetch_data.py:281-299`): glob scan,
    * list name from file basename, strip/upper, drop blanks. */
  def loadLists(spark: SparkSession, listsDir: String): DataFrame =
    spark.read.textFile(s"$listsDir/*.txt").toDF("value")
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.txt", 1).as("list_name"),
        upper(trim(col("value"))).as("ticker"))
      .filter(length(col("ticker")) > 0)

  /** Unique tickers across lists (`fetch_data.py:282,296`). */
  def uniqueTickers(lists: DataFrame): DataFrame =
    lists.select(col("ticker")).distinct()

  /** Snapshot landing zone, schema-on-read (`fetch_data.py:313-314`'s
    * records, read back). */
  def loadSnapshots(spark: SparkSession, dataDir: String): DataFrame =
    spark.read.schema(Schemas.snapshot)
      .option("multiLine", true) // records are pretty-printed (indent=2)
      .json(s"$dataDir/*.json")
      .filter(col("ticker").isNotNull)

  /** Manifest doc (`fetch_data.py:318-319`): original (un-normalized)
    * ticker identity, per-list arrays, single JSON row. */
  def manifest(lists: DataFrame, asOf: String): DataFrame =
    lists.groupBy(col("list_name"))
      .agg(sort_array(collect_list(col("ticker"))).as("members"))
      .agg(
        map_from_entries(sort_array(collect_list(struct(col("list_name"), col("members")))))
          .as("lists"))
      .withColumn("last_updated", lit(asOf))

  /** Requested-but-failed entities (`fetch_data.py:311-316`): list
    * tickers with no snapshot, minding the `.`/`-` dual identity
    * (SURVEY §1 — `BRK.B` in lists, `BRK-B` in data). */
  def failures(lists: DataFrame, snapshots: DataFrame): DataFrame =
    uniqueTickers(lists)
      .withColumn("norm", Metrics.normalizeTicker(col("ticker")))
      .join(snapshots.select(col("ticker").as("norm")), Seq("norm"), "left_anti")
      .select(col("ticker"))

  /** The reference's compact manifest file (`fetch_data.py:318-319`):
    * `json.dump` default separators (`", "` / `": "`), one literal
    * `_manifest.json`. Driver-side render — the manifest is one tiny row.
    *
    * Key order is rendered SORTED, never Scala Map iteration order
    * (ADVICE r3: with >4 lists the backing HashMap reorders keys
    * run-to-run, silently breaking manifest byte stability). The
    * reference's own order is `glob.glob` readdir order
    * (`fetch_data.py:290`) — machine-dependent, so not reproducible;
    * sorted is the deterministic choice and matches [[manifest]]'s
    * sorted entry construction. */
  def writeManifestFile(manifestDf: DataFrame, path: String): Unit = {
    val row = manifestDf.head()
    val listMap = row.getMap[String, scala.collection.Seq[String]](0)
    val inner = listMap.toSeq.sortBy(_._1).map { case (k, vs) =>
      "\"" + EntitySink.jsonEscape(k) + "\": " +
        vs.map(v => "\"" + EntitySink.jsonEscape(v) + "\"").mkString("[", ", ", "]")
    }.mkString("{", ", ", "}")
    val json = "{\"lists\": " + inner +
      ", \"last_updated\": \"" + EntitySink.jsonEscape(row.getString(1)) + "\"}"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Per-file int-ness of double-typed snapshot fields: `json.dump`
    * writes a Python int as `0`, a float as `0.0`; schema-on-read widens
    * both to double and loses the difference (the FISV `forward_eps`
    * byte-fidelity edge — the upstream API returned int 0 there,
    * `fetch_data.py:312-314` dumped it bare). Recover it from the RAW
    * text: one wholetext scan, one regex per double field, emitted as the
    * [[EntitySink.IntFieldsCol]] marker keyed by source file name. */
  private def intFieldMarkers(spark: SparkSession, dataDir: String): DataFrame = {
    val doubleFields = Schemas.snapshot.fields
      .filter(_.dataType == org.apache.spark.sql.types.DoubleType).map(_.name).toSeq
    val flags = doubleFields.map { f =>
      // anchored to the top-level field line (indent=2 => two leading
      // spaces) so a STRING value whose text contains `"field": 5,`
      // can't falsely mark the field int-like for that file
      when(col("value").rlike("(?m)^  \"" + f + "\": -?[0-9]+,?$"), lit(f))
    }
    spark.read.option("wholetext", "true").text(s"$dataDir/*.json")
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("__src_file"),
        filter(array(flags: _*), x => x.isNotNull).as(EntitySink.IntFieldsCol))
  }

  /** Full refresh, matching the reference's publishing layout exactly
    * (`fetch_data.py:301-321`): one literal `data/<TICKER>.json` per
    * entity (indent=2, [[EntitySink]]) + compact `data/_manifest.json`,
    * plus a Spark-native newline-JSON manifest dir for downstream jobs. */
  def run(spark: SparkSession, listsDir: String, dataDir: String,
          outDir: String, asOf: String): Unit = {
    val lists = loadLists(spark, listsDir)
    val snaps = spark.read.schema(Schemas.snapshot)
      .option("multiLine", true)
      .json(s"$dataDir/*.json")
      .withColumn("__src_file", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .filter(col("ticker").isNotNull)
    val members = lists
      .withColumn("norm", Metrics.normalizeTicker(col("ticker")))
      .select(col("norm")).distinct()
    val kept = snaps.join(broadcast(members),
        snaps("ticker") === members("norm"), "left_semi")
      .join(intFieldMarkers(spark, dataDir), Seq("__src_file"), "left")
      .drop("__src_file")
    EntitySink.writePerEntity(kept, s"$outDir/data")
    val m = manifest(lists, asOf)
    m.select(to_json(struct(col("lists"), col("last_updated"))).as("value"))
      .write.mode("overwrite").text(s"$outDir/manifest")
    writeManifestFile(m, s"$outDir/data/_manifest.json")
  }
}

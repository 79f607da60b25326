package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Refresh

/** Golden replay of the reference corpus (SURVEY §5.2, FIXTURES §2):
  * fixtures copied from the reference's `lists/` + `data/` outputs. */
class GoldenReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val listsDir = "src/test/resources/golden/lists"
  private val dataDir = "src/test/resources/golden/data"

  private lazy val lists = Refresh.loadLists(spark, listsDir).cache()
  private lazy val snaps = Refresh.loadSnapshots(spark, dataDir).cache()

  test("list scan: 5 lists, 203 unique tickers, normalized casing") {
    assert(lists.select("list_name").distinct().count() == 5)
    assert(Refresh.uniqueTickers(lists).count() == 203)
    val bad = lists.filter(col("ticker") =!= upper(trim(col("ticker")))).count()
    assert(bad == 0)
    // dotted identity present in list form
    assert(lists.filter(col("ticker") === "BRK.B").count() >= 1)
  }

  test("snapshot corpus: 199 records, 22-field schema, domains hold") {
    assert(snaps.count() == 199)
    assert(snaps.schema.fields.length == 22)
    val sectors = snaps.select("sector_type").distinct()
      .collect().map(_.getString(0)).toSet
    val domain = Set("Semiconductor", "SaaS", "Hardware", "BioTech",
      "Financial", "Energy/Utility", "REIT", "General")
    assert(sectors.subsetOf(domain), s"unexpected sectors: ${sectors -- domain}")
    assert(snaps.filter(col("currency_code") =!= "USD").count() == 0)
    assert(snaps.filter(
      !col("last_updated").rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z$")).count() == 0)
    // normalized identity in data files: no dots in tickers
    assert(snaps.filter(col("ticker").contains(".")).count() == 0)
  }

  test("manifest round-trip keeps ORIGINAL ticker identity (SURVEY §1)") {
    val m = Refresh.manifest(lists, "2026-01-01T00:00:00Z").head()
    val listMap = m.getMap[String, scala.collection.Seq[String]](0)
    assert(listMap.keySet == Set("hot_stocks", "NASDAQ-100", "Dow_Jones", "Dividend", "BRK"))
    // hot_stocks carries the dotted form, BRK the dashed — both survive
    // un-normalized in the manifest (normalization happens only at fetch/
    // file naming, fetch_data.py:130,312-314)
    assert(listMap("hot_stocks").contains("BRK.B"))
    assert(listMap("BRK").contains("BRK-B"))
    // arrays deterministically sorted
    assert(listMap("Dow_Jones").toSeq == listMap("Dow_Jones").toSeq.sorted)
  }

  test("failures = requested minus produced across the dual identity") {
    // 203 unique raw tickers collapse to 202 normalized (BRK.B == BRK-B);
    // 199 snapshots exist => exactly 3 true fetch failures
    val f = Refresh.failures(lists, snaps).collect().map(_.getString(0)).toSet
    assert(f == Set("ANSS", "TSMC", "REALTY"), s"got $f")
  }

  test("refresh end-to-end: per-entity JSON sink + manifest") {
    val out = Files.createTempDirectory("graft_refresh").toString
    Refresh.run(spark, listsDir, dataDir, out, "2026-01-01T00:00:00Z")
    val written = spark.read.schema(graft.model.Schemas.snapshot)
      .option("multiLine", true)
      .json(s"$out/data/*.json")
      .filter(col("ticker").isNotNull) // _manifest.json parses ticker-less
    assert(written.count() == 199)
    val manifestJson = spark.read.textFile(s"$out/manifest").collect().mkString
    assert(manifestJson.contains("\"BRK.B\""))
    assert(manifestJson.contains("\"last_updated\":\"2026-01-01T00:00:00Z\""))
    // _manifest.json keys render in sorted order — deterministic across
    // JVMs, never Scala Map iteration order (ADVICE r3)
    val mf = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/data/_manifest.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val keyPos = Seq("BRK", "Dividend", "Dow_Jones", "NASDAQ-100", "hot_stocks")
      .map(k => mf.indexOf("\"" + k + "\""))
    assert(keyPos.forall(_ >= 0), s"missing list keys: $keyPos")
    assert(keyPos == keyPos.sorted, s"list keys not in sorted order: $keyPos")
  }

  test("per-entity sink reproduces the reference files byte-for-byte") {
    val out = Files.createTempDirectory("graft_sink").toString
    Refresh.run(spark, listsDir, dataDir, out, "2026-01-01T00:00:00Z")
    // the consumer's contract (SURVEY §3 EP3): data/<TICKER>.json by name
    val brkb = java.nio.file.Paths.get(s"$out/data/BRK-B.json")
    assert(Files.exists(brkb), "literal BRK-B.json missing")
    assert(Files.exists(java.nio.file.Paths.get(s"$out/data/_manifest.json")))
    val names = new java.io.File(s"$dataDir").listFiles()
      .map(_.getName).filter(n => n.endsWith(".json") && n != "_manifest.json")
    assert(names.length == 199)
    // json.dump(indent=2) fidelity: EVERY golden file must round-trip
    // byte-identically — including FISV.json, whose forward_eps came back
    // from the upstream API as Python int 0 (json.dump wrote `0`, not
    // `0.0`); the raw-text int-ness markers in Refresh recover that
    // through the schema-on-read double widening
    val notIdentical = names.filter { n =>
      !java.util.Arrays.equals(
        Files.readAllBytes(java.nio.file.Paths.get(s"$dataDir/$n")),
        Files.readAllBytes(java.nio.file.Paths.get(s"$out/data/$n")))
    }.toSet
    assert(notIdentical.isEmpty, s"byte drift: $notIdentical")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 ↔ `SparkEntry.queries` bijection, pinned mechanically.
  *
  * Round 8 shipped three registered keys (`fin_cointegration`,
  * `ts_ljung_box`, `dedup_simhash`) with no §2 row — the doc and the
  * registry drifted silently because nothing compared them. This spec
  * parses §2's tables (first cell, backticked `[a-z0-9_]+` tokens) and
  * asserts both directions, so either drift fails the suite.
  */
class SurveySyncSpec extends AnyFunSuite {

  /** §2 rows that are real implementations but deliberately NOT in
    * `SparkEntry.queries` — each is driver-side/streaming machinery a
    * DuckDB oracle cannot express; each is covered by its own spec. */
  private val notSqlExpressible = Set(
    "src_api_fetch",          // sources/Ingest.scala — IngestSpec, V2SourceSpec
    "stream_scheduled_refresh", // streaming/Streams.scala — StreamingSpec
    "stream_late_data")       // streaming/Streams.scala — StreamingSpec

  private lazy val surveyKeys: Set[String] = {
    // explicit UTF-8: the forked test JVM's default charset is ASCII and
    // SURVEY.md carries em-dashes etc.
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val start = lines.indexWhere(_.startsWith("## 2."))
    val end = lines.indexWhere(_.startsWith("## 3."))
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 headers not found")
    val token = "`([a-z0-9_]+)`".r
    lines.slice(start, end).iterator
      .filter(_.startsWith("|"))
      .map(_.split("\\|")(1)) // first table cell only
      .flatMap(cell => token.findAllMatchIn(cell).map(_.group(1)))
      .toSet
  }

  test("every registered query key has a SURVEY §2 row") {
    val undocumented = SparkEntry.queries.keySet -- surveyKeys
    assert(undocumented.isEmpty,
      s"registered but not rowed in SURVEY §2: ${undocumented.toSeq.sorted.mkString(", ")}")
  }

  test("every SURVEY §2 key is registered or explicitly not-SQL-expressible") {
    val phantom = surveyKeys -- SparkEntry.queries.keySet -- notSqlExpressible
    assert(phantom.isEmpty,
      s"rowed in SURVEY §2 but not registered: ${phantom.toSeq.sorted.mkString(", ")}")
    val stale = notSqlExpressible -- surveyKeys
    assert(stale.isEmpty, s"allowlist entries missing from §2: $stale")
    val overlap = notSqlExpressible.intersect(SparkEntry.queries.keySet)
    assert(overlap.isEmpty,
      s"allowlisted as not-SQL-expressible but actually registered: $overlap")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 connector's three scale contracts, pinned at the
  * plan level: partition-per-entity planning, filter pushdown that
  * prunes partitions before any fetch, and column pruning that narrows
  * the reader's schema. */
class V2SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def load() = spark.read
    .format("graft.sources.v2.EntityApiSource")
    .option("entities", "ALPHA,BRAVO,CHARLIE,DELTA,ECHO")
    .option("periods", "4")
    .load()

  test("one input partition per entity; pushed IN-filter prunes them") {
    assert(load().rdd.getNumPartitions == 5)
    val pruned = load().filter(col("entity").isin("ALPHA", "ECHO"))
    assert(pruned.rdd.getNumPartitions == 2,
      "IN filter must prune partitions at planning time")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(entity"),
      s"filter not pushed:\n$plan")
    // pushdown is exact, not advisory: only the two entities survive
    assert(pruned.select("entity").distinct().collect()
      .map(_.getString(0)).sorted.toSeq == Seq("ALPHA", "ECHO"))
    // equality pushdown too
    assert(load().filter(col("entity") === "BRAVO").rdd.getNumPartitions == 1)
  }

  test("column pruning reaches the reader's schema") {
    val qe = load().select(col("value")).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<value:double>"),
      s"reader schema not pruned:\n$plan")
    // the V2 scan node itself emits only the pruned column
    val scanOut = qe.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.output.map(_.name)
    }.flatten
    assert(scanOut == Seq("value"), s"scan output $scanOut")
  }

  test("rows are the deterministic payload, complete per partition") {
    val rows = load().collect()
    assert(rows.length == 5 * 3 * 4) // entities x metrics x periods
    rows.foreach { r =>
      val mi = graft.sources.v2.EntityApiSource.metrics.indexOf(r.getString(1))
      assert(r.getDouble(3) ==
        graft.sources.v2.EntityApiSource.valueFor(r.getString(0), mi, r.getInt(2)))
    }
  }
}

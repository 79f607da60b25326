package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** md5-coin retry determinism (r10, VERDICT #7): the engine's randomness
  * discipline — every "random" draw is a pure md5 function of row
  * identity, never `rand()` — exists precisely so that TASK RETRIES
  * cannot change results (a retried task re-derives the same coins; a
  * retried `rand()` task draws new ones and silently corrupts sampling /
  * shuffling / bootstrap outputs on any real cluster, where retries are
  * routine). This spec proves the claim under the failure mode it exists
  * for: a `mapPartitions` stage that THROWS on every first task attempt
  * of partition 0 is spliced under the operator; the scheduler retries
  * it (TestSpark runs `local[4, 2]` = 2 task attempts) and the output
  * must be BIT-IDENTICAL to the never-failing run. */
object RetryDeterminismSpec {
  /** Visible to tasks (local mode shares the JVM): counts injected
    * throws so the spec can assert the failure actually fired. */
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)
}

class RetryDeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Every FIRST attempt of partition 0 throws; the retry passes. */
  private def flakyOnce(df: DataFrame): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetryDeterminismSpec.injected.incrementAndGet()
        throw new RuntimeException("injected first-attempt task failure")
      }
      it
    }(Encoders.row(df.schema))

  private def docsKeyed: DataFrame =
    Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))

  test("GlobalRank.withRank is bit-identical under a retried task") {
    // the text_global_shuffle engine: md5 shuffle key + range-partitioned
    // exact global rank (sampled bounds + per-partition offsets — the
    // machinery MOST exposed to retry nondeterminism, since a naive
    // implementation's ranks depend on which attempt's partitioning won)
    val keyed = docsKeyed.select(col("doc_id"),
      md5(concat(col("doc_id").cast("string"), lit(":shuffle"))).as("k"))
    val sortCols = Seq(col("k"), col("doc_id"))
    val before = RetryDeterminismSpec.injected.get
    val flaky = ops.GlobalRank.withRank(flakyOnce(keyed), sortCols, "pos")
      .orderBy("doc_id").collect().toSeq
    val clean = ops.GlobalRank.withRank(keyed, sortCols, "pos")
      .orderBy("doc_id").collect().toSeq
    assert(RetryDeterminismSpec.injected.get > before,
      "injection never fired — the flaky stage was not executed")
    assert(flaky == clean, "global rank changed under a retried task")
  }

  test("md5 near-dup cluster assignment is bit-identical under a retried task") {
    // multi-stage pipeline (signatures -> banding -> windows -> verify ->
    // iterative CC with localCheckpoints): a retry under ANY of those
    // stages must not move a single doc between clusters
    val before = RetryDeterminismSpec.injected.get
    val flaky = ext.Dedup.md5ClusterAssign(flakyOnce(docsKeyed))
      .orderBy("doc_id").collect().toSeq
    val clean = ext.Dedup.md5ClusterAssign(docsKeyed)
      .orderBy("doc_id").collect().toSeq
    assert(RetryDeterminismSpec.injected.get > before,
      "injection never fired — the flaky stage was not executed")
    assert(flaky == clean, "cluster assignment changed under a retried task")
  }

  test("md5-coin draws themselves are retry-invariant (bootstrap-style)") {
    // the stats_bootstrap draw discipline inline: u = first 8 md5 hex
    // chars of (row identity # replicate) as a 32-bit uniform, folded
    // into an exact integer sum per replicate — the same aggregate
    // twice, once over a flaky lineage, must match to the last bit
    def draws(df: DataFrame): Seq[org.apache.spark.sql.Row] = {
      df.select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("b"))
        .select(col("b"),
          expr("cast(conv(substring(md5(concat(cast(doc_id as string), '#', " +
            "cast(b as string), ':boot')), 1, 8), 16, 10) as bigint)").as("u"))
        .groupBy(col("b")).agg(sum(col("u")).as("su"), count(lit(1)).as("n"))
        .orderBy("b").collect().toSeq
    }
    val before = RetryDeterminismSpec.injected.get
    val flaky = draws(flakyOnce(docsKeyed))
    val clean = draws(docsKeyed)
    assert(RetryDeterminismSpec.injected.get > before,
      "injection never fired — the flaky stage was not executed")
    assert(flaky == clean, "md5-coin draws changed under a retried task")
  }
}

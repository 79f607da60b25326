package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for the operators whose PERFORMANCE claim
  * is a plan property (not just a timing): if a refactor silently
  * changes the shape — a pushed filter lost, a partial aggregate
  * dropped, the native exec replaced by a rewrite — these fail before
  * any benchmark notices. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString

  test("sim_search_batch: probe filter pushed, top-k partial-aggregates before the exchange") {
    val p = plan("sim_search_batch")
    // probe bound reaches the parquet scan
    assert(p.contains("LessThan(vec_id,20)"), p)
    // the scored rows meet a partial ObjectHashAggregate BEFORE any
    // exchange: the shuffle carries k-row buffers, not probes×corpus
    val partialIdx = p.indexOf("ObjectHashAggregate")
    assert(partialIdx >= 0, p)
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    assert(firstExchange < 0 || p.lastIndexOf("ObjectHashAggregate") > firstExchange,
      "no final aggregate after the exchange")
    assert(p.indexOf("BroadcastNestedLoopJoin") >= 0, "probe table not broadcast")
    // and the partial agg sits below the exchange in the tree (partial
    // first in bottom-up string order means it appears AFTER the final
    // in top-down print): two ObjectHashAggregate nodes total
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2, p)
  }

  test("sink_bucketed_window: window runs with no hash exchange and no sort below it") {
    val p = plan("sink_bucketed_window")
    // the only exchange is the FINAL output orderBy's range partitioning;
    // the window itself is fed by the bucketed layout
    assert(!p.contains("Exchange hashpartitioning"),
      s"window shuffled despite bucketed layout:\n$p")
    // the scan's sortBy satisfies the window's required ordering: the
    // only Sort node is the output orderBy ABOVE the window
    val winIdx = p.indexOf("Window")
    val sorts = "Sort ".r.findAllMatchIn(p).map(_.start).toList
    assert(winIdx >= 0, p)
    assert(sorts.forall(_ < winIdx),
      s"a Sort sits below the window — bucket sort order not used:\n$p")
  }

  test("src_agg_pushdown: count/min/max served from parquet footers") {
    val p = plan("src_agg_pushdown")
    assert(p.contains("PushedAggregation"),
      s"aggregate not pushed into the v2 parquet scan:\n$p")
    assert(p.contains("COUNT(*)") &&
      p.contains("MIN(o_orderkey)") && p.contains("MAX(o_totalprice)"),
      s"pushed aggregate list incomplete:\n$p")
  }

  test("join_range_bucketed: equi-join on the bucket, never a nested loop") {
    val p = plan("join_range_bucketed")
    // the whole point: the BETWEEN join runs as a bucket equi-join
    // (shuffled hash / sort-merge / broadcast HASH at this SF) with a
    // residual filter — a BroadcastNestedLoopJoin here means the binning
    // silently stopped reaching the planner
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("stream_topk: null filter pushed, two-phase bounded aggregate") {
    val p = plan("stream_topk")
    assert(p.contains("IsNotNull(value)"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2, p)
  }

  test("sql_asof: SQL text plans through the native AsOfJoinExec") {
    val p = plan("sql_asof")
    assert(p.contains("AsOfJoin"), p)
  }

  test("join_bloom_pruned: bloom test sits below a real shuffle join") {
    val p = plan("join_bloom_pruned")
    // the map-side bloom probe survives into the physical plan...
    assert(p.contains("might_contain"), p)
    // ...and the join it prunes is the hinted sort-merge (an exchange
    // actually exists for the bloom to shrink — broadcast would hide it)
    assert(p.contains("SortMergeJoin"), p)
    // the bloom filter is applied BEFORE the join in the tree (appears
    // after it in top-down print order)
    assert(p.indexOf("might_contain") > p.indexOf("SortMergeJoin"), p)
  }

  test("sink_sorted_scan: range predicate pushed into the sorted read-back scan") {
    val p = plan("sink_sorted_scan")
    // the PushedFilters list itself gets truncated in toString, so
    // assert on the Filter node's predicate (plan-stable) plus the
    // leading pushed entry
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert("""l_shipdate#\d+ <= """.r.findFirstIn(p).isDefined, p)
  }

  test("dedup_minhash output is linear: exactly one labeled row per document") {
    // the r4 contract: cluster assignment, never the pair set (which is
    // quadratic inside near-dup cliques). r10: the library surface keeps
    // the (doc_id, cluster_id) shape; the registered key is the promoted
    // per-doc invariant view — BOTH must stay one-row-per-doc.
    val docsDf = graft.Tables.documents(spark, TestSpark.sf0001)
    val n = docsDf.count()
    val lib = graft.ext.Dedup.minhashClusters(docsDf, "doc_id", "text")
    assert(lib.count() == n)
    assert(lib.columns.toSeq == Seq("doc_id", "cluster_id"))
    val out = SparkEntry.queries("dedup_minhash")(spark, TestSpark.sf0001)
    assert(out.count() == n)
    assert(out.columns.toSeq ==
      Seq("doc_id", "label_ok", "setdup_ok", "band_ok"))
  }

  test("join_scd2_pit: equi-join on the key with the interval residual inside") {
    val p = plan("join_scd2_pit")
    // the PIT lookup itself must be a hash/merge join carrying the
    // interval residual — never a nested loop over all versions
    val pitJoinLine = p.linesIterator
      .find(l => l.contains("valid_from") &&
        (l.contains("HashJoin") || l.contains("SortMergeJoin")))
    assert(pitJoinLine.isDefined, p)
    assert(!p.linesIterator.exists(l =>
      l.contains("NestedLoop") && l.contains("valid_from")), p)
    // the only nested loop allowed is the 4-row probe-grid cross join
    assert("NestedLoop".r.findAllIn(p).size <= 1, p)
  }

  test("src_dpp_pruned: partition filter is a runtime dynamicpruning subquery") {
    val p = plan("src_dpp_pruned")
    assert(p.contains("dynamicpruning"), p)
    // and the fact side still reads through a partitioned scan, not a
    // post-scan filter on yr
    assert(p.contains("PartitionFilters"), p)
  }

  test("sql_lateral: correlated LIMIT decorrelates to a window rank + one join") {
    val p = plan("sql_lateral")
    // no per-outer-row re-execution: the lateral subquery must not
    // survive as a nested-loop over customers
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("agg_q17_small_qty: correlated avg decorrelates to a per-part aggregate join") {
    val p = plan("agg_q17_small_qty")
    // RewriteCorrelatedScalarSubquery: the per-part average is ONE
    // aggregate joined back on l_partkey — no per-row subquery loop
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    // the 20%-of-average predicate survives as a post-join filter/cond
    assert(p.contains("0.2"), p)
  }

  test("join_q20_excess: correlated half-volume subquery becomes aggregate + semi join") {
    val p = plan("join_q20_excess")
    assert(!p.contains("NestedLoop"), p)
    // the IN(...) membership runs as a LEFT SEMI hash join
    assert(p.contains("LeftSemi"), p)
    // the correlated scalar aggregate is a real per-part aggregate
    assert(p.contains("0.5"), p)
  }

  test("join_q2_mincost: correlated min decorrelates, no per-row re-execution") {
    val p = plan("join_q2_mincost")
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("min(unit_cost") || p.contains("min(") , p)
  }

  test("text_line_dedup: first-occurrence resolved by aggregate, not a window sort") {
    val p = plan("text_line_dedup")
    // min(struct) keeps the exploded corpus out of any window sort: the
    // only Window-free path is partial agg -> exchange on line -> final
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("emb_pca: embeddings scan prunes the unused label column") {
    // the registered keys' final plans sit above localCheckpoint cuts,
    // so inspect the pre-checkpoint centering stage: it touches
    // (vec_id, embedding) only — a scan that also decodes `label` drags
    // a dead column through the n*dim explode, real read+decode volume
    // at 100 TB
    val p = ext.EmbPca.centered(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && p.contains("embedding"), p)
    assert(!p.contains("label"), s"centered stage reads the label column:\n$p")
  }

  test("win_sessionize_native: ONE window node hosts the session labeling") {
    val p = plan("win_sessionize_native")
    assert("Window".r.findAllIn(p).size == 1,
      s"expected exactly one Window exec:\n$p")
    assert(p.contains("graft_session_id") || p.contains("sessionid"),
      s"native window function not in plan:\n$p")
  }

  test("join_null_aware_anti: Catalyst plans the NULL-aware single-column anti join") {
    val p = plan("join_null_aware_anti")
    // NOT IN must become BroadcastHashJoin LeftAnti with the
    // isNullAwareAntiJoin flag (the trailing `true`), NOT a
    // BroadcastNestedLoopJoin — the nested-loop fallback re-scans the
    // list per row and is the 100x-scale failure mode of NOT IN
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"null-aware anti join flag missing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"NOT IN fell back to a nested loop:\n$p")
  }

  test("feat_training_set: ONE history shuffle drives all features, the" +
    " label, and the split") {
    val p = plan("feat_training_set")
    // the scale claim: every feature window + lead/lag label hangs off
    // a single hashpartitioning(o_custkey) exchange — a per-feature
    // point-join formulation would add one exchange per feature
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(p).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange (the custkey history shuffle)," +
        s" got $hashExchanges:\n$p")
    // no join anywhere: features come from window frames, not lookups
    assert(!p.contains("Join"), s"training set should not join:\n$p")
  }
}

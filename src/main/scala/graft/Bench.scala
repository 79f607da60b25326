package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract: ONE JSON line).
  *
  * The driver captures only the tail of sbt's stdout (~2 KB) and parses the
  * JSON line out of it — so the line must stay SHORT. We therefore time a
  * curated HEADLINE subset (one representative per operator family, biased
  * toward the heavy ones) and round seconds to 3 dp. `SPARK_GRAFT_FULL=1`
  * times every declared query instead (local use); `SPARK_GRAFT_ONLY=k1,k2`
  * times just those keys (local iteration).
  */
object Bench {

  /** One representative per SURVEY §2 family; the heavy operators (dedup
    * family, as-of join, bucketed sink, star join, streams) are all in. */
  val headline: Seq[String] = Seq(
    "filter_positive",      // scan+filter pushdown
    "proj_snapshot",        // wide projection
    "agg_group_stats",      // hash agg
    "agg_grouping_sets",    // rollup/cube
    "agg_salted_skew",      // skew mitigation
    "agg_ttm_rolling4",     // window-limit + agg
    "join_star_q5",         // multi-way star join
    "join_equi_large",      // fact-fact shuffle join
    "join_asof_native",     // custom AsOfJoinExec
    "join_range_interval",  // range join
    "join_bloom_pruned",    // runtime bloom semi-join pruning
    "sink_bucketed_join",   // bucketed write + co-located join
    "sink_partitioned_scan",// partitioned write + pruned read-back
    "sink_sorted_scan",     // range-clustered layout + min/max skipping
    "win_rank_topk",        // ranking window (TakeOrderedAndProject inside)
    "win_rolling_frame",    // rows-frame window
    "setop_except",         // set op
    "stmt_pivot_wide",      // pivot
    "sql_correlated_subquery",
    "expr_fx_normalize",    // expression-heavy projection
    "fn_math",              // scalar function battery
    "agg_q1_pricing",       // TPC-H Q1, exact-decimal
    "join_q10_returns",     // TPC-H Q10
    "agg_q18_large_orders", // TPC-H Q18 group-having-topk
    "quality_checks",       // fused expectation scan + FK anti-join
    "scd2_intervals",       // SCD2 window pass
    "merge_upsert",         // full-outer MERGE shape
    "text_pack_sequences",  // corpus packing window
    "text_pack_shards",     // 64-way bounded-shard packing
    "text_decontaminate",   // zero-shuffle 3-gram scan
    "text_repetition",      // Gopher-style repetition signals (HOF scan)
    "dedup_keep_best",      // map-side representative selection
    "dedup_clusters",       // iterative min-label connected components
    "src_orc_roundtrip",    // ORC write + pushed read
    "dedup_exact",
    "dedup_minhash",        // LSH band join
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_search_ivf",       // IVF ANN scale path
    "sim_search_batch",     // batch-probe serving (map-side bounded top-k)
    "stream_topk",          // bounded per-key leaderboard aggregate
    "sink_commit_partitions", // dynamic partition overwrite publish
    "sql_asof",             // native as-of through the SQL TVF surface
    "text_tfidf",           // text analysis
    "mm_binary",            // multimodal binary ops
    "stream_sliding_agg",   // streaming (batch-replay) agg
    "join_salted_skew",     // salted skew join (r5)
    "src_zonemap_pruned",   // manifest file pruning (r5)
    "sink_zorder_scan",     // z-order clustered layout (r5)
    "agg_incremental",      // incremental agg maintenance (r5)
    "join_q7_volume",       // TPC-H Q7 (r5)
    "fin_twap",             // time-weighted average price (r5)
    "dedup_editdist",       // deletion-neighborhood edit-distance join (r5)
    "win_sessionize",       // labeled gap sessionization (r5)
    "sim_search_pq",        // product-quantization ANN (r5)
    "join_q3_shipping",     // TPC-H Q3 semi-join form (r6)
    "join_q19_disjunct",    // OR-of-ANDs disjunctive hash join (r6)
    "agg_q12_late",         // Q12-shape one-pass conditional counts (r6)
    "join_range_bucketed",  // binned interval join, no nested loop (r6)
    "join_incremental",     // delta-join view maintenance (r6)
    "sink_time_travel",     // snapshot commits + as-of reads (r6)
    "text_chunk",           // sliding-window chunking (r6)
    "text_mix_temperature", // temperature language rebalancing (r6)
    "fin_ohlc",             // one-pass OHLC candles (r6)
    "cdc_capture",          // snapshot-diff changelog (r6)
    "win_sweep_concurrency",// sweep-line interval concurrency (r6)
    "src_dpp_pruned",       // dynamic partition pruning (r6)
    "graph_triangles",      // degree-oriented triangle counting (r6)
    "text_line_dedup",      // corpus-global line dedup (r6)
    "corpus_clean_pipeline", // 5-stage cleaning pipeline, one plan (r6)
    "dedup_jarowinkler",    // native codegen JW probe scan (r6)
    "win_interval_merge",   // interval coalescing window pass (r6)
    "win_skyline",          // domain-sized Pareto frontier (r6)
    "graph_pagerank",       // 5 pinned iterations, broadcast rank (r6)
    "fin_ewma",             // dyadic-decay Horner fold (r6)
    "src_v2_pushdown")      // DataSourceV2 partition/filter pushdown (r6)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local A/B harness: SPARK_GRAFT_CONF=key=value,key=value applies
    // session confs before the sweep (e.g. the graph broadcast toggle)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k.trim, v.trim)
        case _ => ()
      }
    })
    // Warmup outside the timed loop: JVM/codegen baseline + parquet
    // footer/file-index reads + the noop write path, so per-query numbers
    // reflect steady state rather than whichever key happens to run first.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try { if (t == "events") graft.Tables.events(spark, sfDir).limit(1).count()
            else spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count() }
      catch { case _: Throwable => () }
    }
    val keys: Seq[String] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(
          if (sys.env.get("SPARK_GRAFT_FULL").contains("1")) SparkEntry.queries.keys.toSeq.sorted
          else headline.filter(SparkEntry.queries.contains))
    // two timed runs per query, report the min: first-run planning/codegen
    // overhead and shared-box noise spikes (one sweep saw a 20x outlier
    // under external load) would otherwise be indistinguishable from the
    // operator's real cost
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timeOnce(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink forces FULL evaluation of the declared plan; a count()
      // would let Catalyst prune the projections/sorts being measured
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case t: Throwable =>
        failed += name
        System.err.println(s"bench: $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = keys.map { name =>
      val t1 = timeOnce(name)
      val t2 = timeOnce(name)
      name -> math.min(t1, t2)
    }
    // 2 dp: 10 ms resolution is ample for multi-second keys, and the
    // driver's ~2 KB stdout-tail capture must fit the whole line — at 66
    // keys the line is ~1.8 KB, so every char per key matters
    def r3(v: Double): String = f"$v%.2f"
    // a failed query must not masquerade as a latency number
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (failed(k)) "null" else r3(v))
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed(k) => v }.sum
    val errs = if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    println(s"""{"metric":"headline_total","value":${r3(total)},"unit":"sec","n":${results.size},"queries":$qs$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

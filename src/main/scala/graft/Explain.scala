package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for query keys — the
  * pushdown/broadcast/codegen audit loop (SURVEY §4).
  * Usage: runMain graft.Explain <sfDir> [key ...]  (default: a core set)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("pipeline_snapshot", "join_equi_large", "agg_ttm_rolling4",
        "join_fx_rate", "agg_group_stats", "sim_search_cosine", "sort_limit",
        "agg_q1_pricing", "join_q10_returns", "quality_checks",
        "scd2_intervals", "merge_upsert", "dedup_keep_best",
        "text_decontaminate", "sink_bucketed_join",
        "dedup_minhash", "text_repetition", "text_pack_shards")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

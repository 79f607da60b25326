package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 optimization scratch harness: time named sub-plan variants with
  * the noop sink (guide §1.4) to localize where a hot key's seconds go.
  * Variants live in code (edited per investigation); each is timed
  * thrice, min reported. Not part of any query path.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    graft.functions.VectorFunctions.register(spark)

    def time(name: String)(f: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = once(); val t2 = once(); val t3 = once()
      println(f"[probe] $name%-40s ${Seq(t1, t2, t3).min}%.2f s  (runs $t1%.2f / $t2%.2f / $t3%.2f)")
    }

    val s = spark
    val d = sfDir

    // ---- corpus_clean_pipeline phase decomposition ----
    val docs = graft.Tables.documents(s, d)
      .filter(col("n_chars") >= 100 &&
        size(split(col("text"), " ")) >= 20 &&
        col("lang").isin("en", "fr", "de"))
    def exact() = docs
      .withColumn("h", md5(col("text")))
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("lang"), col("text"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.lang").as("lang"),
        col("w.text").as("text"))
    time("cc_exact")(exact())
    time("cc_md5assign") {
      graft.ext.Dedup.md5ClusterAssign(exact().select(col("doc_id"), col("text")))
    }
    def nearDeduped() = {
      val reps = graft.ext.Dedup.md5ClusterAssign(exact().select(col("doc_id"), col("text")))
        .filter(col("doc_id") === col("cluster_id")).select(col("doc_id"))
      exact().join(reps, Seq("doc_id"), "left_semi")
    }
    def lines() = nearDeduped()
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("lang"), posexplode(expr(
        """transform(sequence(0, CAST(ceil(size(ws) / 10.0) AS INT) - 1),
          |  i -> array_join(slice(ws, i * 10 + 1, 10), ' '))""".stripMargin))
        .as(Seq("line_idx", "line")))
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("line_idx"), col("lang"))).as("w"))
    time("cc_lines")(lines())
    // inside md5ClusterAssign: band rows / candidates / verify / CC
    def exDocs() = exact().select(col("doc_id"), col("text"))
    time("mca_bandrows")(graft.ext.Dedup.md5SlotBandRows(exDocs()))
    time("mca_cand") {
      graft.ext.Dedup.starChainCandidates(
        graft.ext.Dedup.md5SlotBandRows(exDocs()))
        .select(col("i"), col("j")).distinct()
    }
    time("mca_verify") {
      graft.ext.Dedup.verifyExactJaccard(
        graft.ext.Dedup.starChainCandidates(
          graft.ext.Dedup.md5SlotBandRows(exDocs()))
          .select(col("i"), col("j")).distinct(),
        exDocs(), 0.8)
    }
    time("cc_full")(graft.SparkEntry.queries("corpus_clean_pipeline")(s, d))
    // CC pass census on the corpus pipeline's actual pair graph
    locally {
      val pairs = graft.ext.Dedup.md5StarChainPairs(exDocs())
      val nodes = exDocs().select(col("doc_id"))
      println("[probe] corpus pair edges = " + pairs.count() +
        ", nodes = " + nodes.count())
      for (k <- Seq(1, 2, 3, 4)) {
        val t0 = System.nanoTime()
        val (_, conv) = graft.ext.Dedup.connectedComponentsWithStatus(
          nodes, pairs, "doc_id", maxIter = k)
        // force labels
        graft.ext.Dedup.connectedComponents(nodes, pairs, "doc_id", maxIter = k)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] cc_pass k=$k conv=$conv ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // ---- hnsw served job census ----
    time("hnsw_served")(graft.SparkEntry.queries("sim_search_hnsw_served")(s, d))
    time("substr_chars")(graft.SparkEntry.queries("text_substring_dedup_chars")(s, d))

    spark.stop()
  }
}

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
    val docs = graft.Tables.documents(s, d)

    // ---- dedup_minhash phase decomposition ----
    // phase A: xx fingerprint projection (interpreted transform lambda?)
    def withSet() = docs.select(col("doc_id").as("id"),
      array_sort(transform(array_distinct(split(col("text"), " ")),
        w => xxhash64(w))).as("hs"))
    time("mh_withSet_transform")(withSet())
    // alt: explode + codegen xxhash64 + collect back
    def withSetExplode() = docs
      .select(col("doc_id").as("id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .select(col("id"), xxhash64(col("w")).as("h"))
      .groupBy(col("id")).agg(array_sort(collect_list(col("h"))).as("hs"))
    time("mh_withSet_explode")(withSetExplode())
    def withFp() = withSet().withColumn("fp", xxhash64(col("hs")))
    time("mh_withFp")(withFp())
    def reps() = withFp().groupBy(col("fp"))
      .agg(min(col("id")).as("rid"), min_by(col("hs"), col("id")).as("hs"))
      .withColumn("n", size(col("hs")))
    time("mh_reps")(reps())
    time("mh_clusters_full") {
      graft.ext.Dedup.minhashClusters(docs, "doc_id", "text")
    }
    time("mh_clusters_iter1") {
      graft.ext.Dedup.minhashClusters(docs, "doc_id", "text", maxIter = 1)
    }
    // the md5 star/chain twin (second pipeline in the key)
    time("mh_md5twin") {
      graft.ext.Dedup.md5StarChainPairs(docs)
    }
    time("mh_key_full")(graft.SparkEntry.queries("dedup_minhash")(s, d))

    // CC in isolation: 110k nodes, 25k star edges (the dedup shape)
    val nodes = spark.range(110000L).select(col("id"))
    val edges = spark.range(25000L).select(
      (col("id") * 4).as("i"), (col("id") * 4 + 1 + col("id") % 3).as("j"))
    def ccOnly() = graft.ext.Dedup.connectedComponents(nodes, edges)
    val t0 = System.nanoTime()
    ccOnly().write.format("noop").mode("overwrite").save()
    println(f"[probe] cc_isolated ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    ccOnly().write.format("noop").mode("overwrite").save()
    println(f"[probe] cc_isolated2 ${(System.nanoTime() - t1) / 1e9}%.2f s")

    spark.stop()
  }
}

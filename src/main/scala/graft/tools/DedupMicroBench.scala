package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local tuning/validation tool for the minhashClusters pipeline (not part
  * of the query surface): times the registered `dedup_minhash` key and
  * checks cluster-level recall against the exact all-pairs ground truth at
  * the chosen scale (SPARK_GRAFT_SF_DIR). The sf0.01 recall floor is also
  * asserted in DedupSpec; this tool exists to re-measure at sf0.1, where
  * the spec's exact ground truth would be too slow for the test suite. */
object DedupMicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val labels = graft.SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"dedup_minhash: ${labels.size} docs labeled in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val docsDf = graft.Tables.documents(spark, sfDir)
    val t1 = System.nanoTime()
    val truth = graft.ext.Dedup.jaccardPairs(docsDf, "doc_id", "text")
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(f"exact ground truth: ${truth.length} true pairs in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val found = truth.count { case (i, j) => labels(i) == labels(j) }
    println(f"cluster recall = ${found.toDouble / truth.length}%.4f")
    spark.stop()
  }
}

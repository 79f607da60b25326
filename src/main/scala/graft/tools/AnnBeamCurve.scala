package graft.tools

import org.apache.spark.sql.SparkSession

/** Local measurement harness for the graph-ANN serving-quality knobs
  * (r13, VERDICT #3): seeds the persisted HNSW store once, then serves
  * the probe at widening beam widths and prints recall@10 against the
  * exact brute-force answer (`sim_search_cosine`). The ef-style curve
  * this records is the dial a production user turns — the numbers live
  * in PERF.md r13.
  *
  * `runMain graft.tools.AnnBeamCurve [sfDir] [beam,beam,...]`
  */
object AnnBeamCurve {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val beams = args.lift(1).getOrElse("10,20,40").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sf)
    val exact = graft.SparkEntry.queries("sim_search_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_beam_curve").toString
    graft.ext.SimSearch.hnswStoreSeed(e.filter("vec_id <> 0"), dir)
    val probe = e.filter("vec_id = 0").select("embedding")
    beams.foreach { b =>
      val t0 = System.nanoTime()
      val got = graft.ext.SimSearch
        .serveHnswFromStore(spark, dir, probe, k = 10, beamW = b)
        .collect().map(_.getLong(0)).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"beamcurve sf=$sf%s beam=$b%d recall@10=${
        got.intersect(exact).size / 10.0}%.2f serve_sec=$sec%.2f")
    }
    graft.Hfs.deleteRecursive(dir)
    spark.stop()
  }
}

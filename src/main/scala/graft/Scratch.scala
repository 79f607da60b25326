package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("dedup_editdist")
    def time[T](tag: String)(f: => T): T = { val t0=System.nanoTime; val r=f; println(s"[scratch] $tag ${(System.nanoTime-t0)/1e9}s"); r }
    (1 to 3).foreach { i => time(s"run$i")(println("[scratch] n=" + q(spark, "/root/testdata/sf0.1").count())) }
    spark.stop()
  }
}

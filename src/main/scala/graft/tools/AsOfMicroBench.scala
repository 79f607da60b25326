package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the AsOfJoinExec merge loop at row counts where
  * per-row cost dominates the fixed shuffle/sort overhead (the sf0.1
  * bench key has too few rows to see it). Synthetic: `keys` hot keys,
  * `nSeries` series rows, `nProbes` probes, all longs.
  *
  * Run: `sbt "runMain graft.tools.AsOfMicroBench [nSeries] [nProbes]"`
  * — prints per-run seconds for 3 timed runs (trust the min).
  */
object AsOfMicroBench {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nProbes = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val keys = 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val series = spark.range(nSeries).select(
      (col("id") % keys).as("key"), (col("id") / keys).as("time"),
      col("id").as("tie"), (col("id") * 2).cast("double").as("value"))
    val probes = spark.range(nProbes).select(
      (col("id") % keys).as("key"), (col("id") / keys + 1).as("time"))

    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      graft.plans.AsOf.joinBackward(probes, series, "key", "time", "tie", "value")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"asof_micro run$i: $dt%.3f s  (series=$nSeries probes=$nProbes)")
    }
    spark.stop()
  }
}

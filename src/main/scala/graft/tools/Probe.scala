package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 optimization scratch harness: time named sub-plan variants with
  * the noop sink (guide §1.4) to localize where a hot key's seconds go.
  * Variants live in code (edited per investigation); each is timed
  * twice, min reported. Not part of any query path.
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

    // ---- stats_randomization decomposition ----
    def base() = graft.Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)) div 100000").as("v"))
    def expl() = base()
      .repartition(col("o_orderkey"))
      .select(col("v"), explode(sequence(lit(0), lit(127))).as("b"),
        col("o_orderkey"))
    time("rand_explode128")(expl())
    def md5d() = expl()
      .select(col("b"), col("v"),
        expr("md5(concat(cast(o_orderkey as string), '#', cast(b as string), ':perm'))").as("h"))
    time("rand_md5")(md5d())
    def parsed() = md5d()
      .select(col("b"), col("v"), expr("graft_hex_long(h, 1, 8)").as("u"))
    time("rand_hex")(parsed())
    def aggd() = parsed()
      .select(col("b"), col("v"),
        expr(s"case when u < ${1L << 31} then 1 else 0 end").as("pg"))
      .groupBy(col("b"))
      .agg(sum(when(col("pg") === 1, col("v"))).as("s1"),
        sum(when(col("pg") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("pg") === 0, col("v"))).as("s0"),
        sum(when(col("pg") === 0, 1L).otherwise(0L)).as("n0"))
    time("rand_agg")(aggd())
    time("rand_full")(graft.SparkEntry.queries("stats_randomization")(s, d))

    // md5 theoretical floor: 19.2M md5s of the same shape, nothing else
    time("md5_floor_19M")(
      spark.range(19200000L).select(
        expr("md5(concat(cast(id as string), '#', cast(id % 128 as string), ':perm'))").as("h"))
        .select(sum(length(col("h"))).as("s")))
    // same md5s but rows written to the noop sink (no reduction)
    time("md5_floor_noop_rows")(
      spark.range(19200000L).select(
        expr("md5(concat(cast(id as string), '#', cast(id % 128 as string), ':perm'))").as("h")))
    // query-shaped source, but reduce instead of emitting rows
    time("rand_md5_reduced")(md5d().select(sum(length(col("h"))).as("s")))
    // fixed-N repartition: AQE cannot coalesce REPARTITION_BY_NUM
    time("rand_md5_fixedN")(
      base().repartition(s.sparkContext.defaultParallelism, col("o_orderkey"))
        .select(col("v"), explode(sequence(lit(0), lit(127))).as("b"),
          col("o_orderkey"))
        .select(col("b"), col("v"),
          expr("md5(concat(cast(o_orderkey as string), '#', cast(b as string), ':perm'))").as("h"))
        .select(sum(length(col("h"))).as("s")))
    // explode from range (no parquet scan, no repartition)
    time("rand_md5_rangesrc")(
      spark.range(150000L).select(col("id").as("o_orderkey"), (col("id") % 17).as("v"))
        .select(col("v"), explode(sequence(lit(0), lit(127))).as("b"), col("o_orderkey"))
        .select(col("b"), col("v"),
          expr("md5(concat(cast(o_orderkey as string), '#', cast(b as string), ':perm'))").as("h"))
        .select(sum(length(col("h"))).as("s")))

    spark.stop()
  }
}

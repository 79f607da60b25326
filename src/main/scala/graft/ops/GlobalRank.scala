package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL row rank without the single-partition sort.
  *
  * `Window.orderBy(...)` with no partition key moves the whole relation
  * to ONE partition — the classic 100 TB scale killer hiding inside
  * every "global ntile / global row_number" query. The scalable
  * construction is the one Spark's own `orderBy` uses for output
  * (RangePartitioning) plus per-partition offsets:
  *
  *   1. range-partition + in-partition sort on the full sort key
  *      (which must end in a unique tiebreak column, so no key spans a
  *      partition boundary and the result is deterministic no matter
  *      where the sampled bounds fall);
  *   2. pin the partitioning (`localCheckpoint` — the bounds come from
  *      sampling, so the count action and the consumer action must see
  *      the SAME partitions);
  *   3. count rows per partition — a P-row driver collect
  *      (metadata-scale, like the zone-map file list), cumulated into
  *      offsets and broadcast back;
  *   4. rank = partition offset + partition-local `row_number` (a
  *      partition-keyed window — no global exchange anywhere).
  *
  * [[ntileFromRank]] then reproduces ANSI `ntile` arithmetic from the
  * exact rank, so quantile scoring needs no global window at all.
  */
object GlobalRank {

  /** Attach `rankCol` (1-based exact global rank in `sortCols` order).
    * `sortCols` MUST end with a unique tiebreak column. */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankCol: String,
               partitions: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    ranged.join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") +
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
      .drop("__pid", "__off")
  }

  /** ANSI `ntile(k)` bucket from an exact 1-based rank over `n` rows:
    * the first `n mod k` buckets take `n div k + 1` rows, the rest
    * `n div k` — all integer arithmetic, bit-identical to the window
    * function on both engines. */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    // exact integer division: (a - a mod b) is an exact multiple, so
    // the double division is exact (Column API has no integer `div`)
    def idiv(a: Column, b: Long): Column =
      ((a - pmod(a, lit(b))) / lit(b)).cast("long")
    if (q == 0) rank.cast("int") // fewer rows than buckets: bucket == rank
    else {
      val headRows = r * (q + 1)
      when(rank <= lit(headRows),
        idiv(rank + lit(q), q + 1)) // = ceil(rank / (q+1))
        .otherwise(lit(r) + idiv(rank - lit(headRows) + lit(q - 1), q))
        .cast("int")
    }
  }
}

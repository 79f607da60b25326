package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable two-phase salted aggregation (VERDICT r3 #8): the skew
  * pattern `agg_salted_skew` demonstrates, promoted to a helper any
  * pipeline can apply to a hot-keyed groupBy.
  *
  * Phase 1 groups by (keys..., salt) so a hot key's rows spread over up
  * to `saltN` reducers; phase 2 merges the partials per key. Only
  * algebraically decomposable aggregates are offered — the partial/merge
  * pair is what makes the two-phase result EXACTLY equal the direct
  * groupBy (count→sum, sum→sum, min→min, max→max, avg→(sum,count) with
  * ONE final division, the cross-engine-stable formulation).
  *
  * The default salt is the input partition id — zero compute, no RNG
  * nondeterminism, and rows of one key spread across however many input
  * partitions carry them. Pass an explicit `salt` column (e.g.
  * `pmod(col("event_id"), 16)`) when input partitioning is itself
  * key-clustered or a deterministic replay matters.
  *
  * At 100 TB note the honest boundary: Spark's hash aggregate already
  * partial-aggregates map-side, which defuses most sum/count skew on its
  * own; salting earns its keep when the per-key state is too wide for
  * map-side combine to hold (collect-like, huge distinct maps) or when
  * AQE skew handling is unavailable (it does not split aggregations,
  * only joins). The helper exists so that case is a one-liner, and
  * SkewSpec proves the hot partition actually splits.
  */
object Skew {

  sealed trait Agg { def out: String }
  final case class Count(out: String) extends Agg
  final case class Sum(in: String, out: String) extends Agg
  final case class Min(in: String, out: String) extends Agg
  final case class Max(in: String, out: String) extends Agg
  final case class Avg(in: String, out: String) extends Agg

  /** Default salt: the input partition id folded to [0, saltN). */
  def saltColumn(saltN: Int): Column =
    pmod(spark_partition_id().cast("long"), lit(saltN.toLong))

  /** Salted equi-join for skewed keys when the small side is too large
    * to broadcast and AQE's skew split is unavailable or insufficient:
    * the big side gets a per-row salt in [0, saltN), the small side is
    * REPLICATED once per salt value (explode over `sequence(0, saltN-1)`),
    * and the join runs on (keys..., salt) — a hot key's rows land on up
    * to `saltN` reducers instead of one. Exactly equal to the unsalted
    * join: every big row carries one salt and meets the one replica of
    * its key with that salt.
    *
    * Inner and left-outer only — a right/full outer join would surface
    * each UNMATCHED small-side replica `saltN` times. Cost model: the
    * small side shuffles ×saltN; pick saltN ≈ the factor you need the
    * hot reducer split by, not more. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 joinType: String = "inner", saltN: Int = 16,
                 salt: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    require(saltN > 0, s"saltN must be positive, got $saltN")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(outer small-side rows would duplicate per salt replica)")
    val b = big.withColumn("__salt",
      salt.getOrElse(saltColumn(saltN)).cast("int"))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    b.join(sm, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted groupBy: exact same result as
    * `df.groupBy(keys).agg(...)`, skew-resistant shuffle shape. */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
                saltN: Int = 16, salt: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "saltedAgg needs at least one grouping key")
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    require(saltN > 0, s"saltN must be positive, got $saltN")
    val partials = aggs.zipWithIndex.flatMap {
      case (Count(_), i) => Seq(count(lit(1)).as(s"__p$i"))
      case (Sum(c, _), i) => Seq(sum(col(c)).as(s"__p$i"))
      case (Min(c, _), i) => Seq(min(col(c)).as(s"__p$i"))
      case (Max(c, _), i) => Seq(max(col(c)).as(s"__p$i"))
      case (Avg(c, _), i) => Seq(sum(col(c)).as(s"__p$i"), count(col(c)).as(s"__pc$i"))
    }
    val finals = aggs.zipWithIndex.map {
      case (Count(o), i) => sum(col(s"__p$i")).cast("bigint").as(o)
      case (Sum(_, o), i) => sum(col(s"__p$i")).as(o)
      case (Min(_, o), i) => min(col(s"__p$i")).as(o)
      case (Max(_, o), i) => max(col(s"__p$i")).as(o)
      case (Avg(_, o), i) => (sum(col(s"__p$i")) / sum(col(s"__pc$i"))).as(o)
    }
    val phase1 = df.withColumn("__salt", salt.getOrElse(saltColumn(saltN)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}

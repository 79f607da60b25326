package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite an equi-key-less `BETWEEN` join into the
  * binned equi-join the `join_range_bucketed` operator builds by hand —
  * so the NAIVE SQL (`... FROM points p JOIN ivals i ON p.v BETWEEN
  * i.lo AND i.hi`) gets the scalable plan automatically.
  *
  * Without this rule Spark can only plan that join as a broadcast
  * nested loop — one side must fit in memory and every (point,
  * interval) pair is compared; at 100 TB that plan simply does not run.
  * The rewrite explodes each interval into the fixed-width buckets it
  * overlaps (`sequence(floor(lo/w), floor(hi/w))`), joins on
  * `floor(v/w) = bucket` (a plain shuffle hash join: partitionable,
  * AQE-skew-splittable), and keeps the original predicate as the
  * residual, so the result is EXACT for any width.
  *
  * The bucket width carries data-dependent meaning (≈ typical interval
  * length), so the rule only fires when the session opts in via
  * `spark.graft.rangejoin.bucketWidth`; widths that undershoot inflate
  * the interval-side explode (cost, not correctness). Fires only on
  * INNER joins whose condition has NO usable equi conjunct (if one
  * exists Spark already hash-joins on it — and this guard also makes
  * the rule idempotent, since the rewritten join gains an equi key).
  */
object RewriteRangeJoin extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangejoin.bucketWidth"

  private def widthOpt: Option[Double] = {
    val raw = Option(SQLConf.get.getConfString(WidthConf, null))
    val parsed = raw.flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
      .filter(_ > 0)
    // a set-but-unparsable width silently disabling the rewrite is the
    // worst failure mode (cost, not correctness) — make it loud
    if (raw.isDefined && parsed.isEmpty)
      logWarning(s"$WidthConf='${raw.get}' is not a positive number; " +
        "range-join rewrite disabled")
    parsed
  }

  private def refsWithin(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  /** (point, bound, pointOnLeftSide) for `point >= bound` conjuncts. */
  private def lowerBound(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Boolean)] = c match {
    case GreaterThanOrEqual(a, b) => oriented(a, b, l, r)
    case GreaterThan(a, b) => oriented(a, b, l, r)
    case LessThanOrEqual(b, a) => oriented(a, b, l, r)
    case LessThan(b, a) => oriented(a, b, l, r)
    case _ => None
  }

  private def oriented(point: Expression, bound: Expression,
                       l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Boolean)] =
    if (refsWithin(point, l) && refsWithin(bound, r) &&
      numeric(point) && numeric(bound)) Some((point, bound, true))
    else if (refsWithin(point, r) && refsWithin(bound, l) &&
      numeric(point) && numeric(bound)) Some((point, bound, false))
    else None

  private def hasEquiKey(conjuncts: Seq[Expression],
                         l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (refsWithin(a, l) && refsWithin(b, r)) ||
          (refsWithin(a, r) && refsWithin(b, l))
      case EqualNullSafe(a, b) =>
        (refsWithin(a, l) && refsWithin(b, r)) ||
          (refsWithin(a, r) && refsWithin(b, l))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = widthOpt match {
    case None => plan
    case Some(w) => plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else {
          // try EVERY lower-bound candidate for a matching upper bound
          // (x <= hi is a lower bound for hi over x) — a BETWEEN written
          // upper-bound-first (hi >= x AND x >= lo) pairs on the second
          // candidate, which headOption used to miss (ADVICE r6)
          val lowers = conjuncts.flatMap(lowerBound(_, left, right))
          val pair = lowers.view.flatMap { case (v, lo, pointOnLeft) =>
            lowers.collectFirst {
              case (hi, v2, p2) if p2 != pointOnLeft && v2.semanticEquals(v) =>
                (v, lo, hi, pointOnLeft)
            }
          }.headOption
          pair match {
            case None => j
            case Some((v, lo, hi, pointOnLeft)) =>
              val bAttr = AttributeReference("__graft_bucket", LongType)()
              val ivalSide = if (pointOnLeft) right else left
              val gen = Generate(
                // Sequence is TimeZoneAwareExpression: without an
                // explicit zone the node stays unresolved post-analysis
                Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w), None,
                  Some(conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(bAttr), child = ivalSide)
              val newCond = And(EqualTo(bucketOf(v, w), bAttr), cond)
              val newJoin =
                if (pointOnLeft) Join(left, gen, Inner, Some(newCond), hint)
                else Join(gen, right, Inner, Some(newCond), hint)
              Project(j.output, newJoin)
          }
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(a, b) =>
        splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
      case other => Seq(other)
    }
}

package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DecimalType

/** Optimizer rule: answer an aggregate over the lineitem FACT TABLE
  * from its materialized summary instead — the materialized-view
  * rewrite every serious warehouse performs. A 100 TB fact scan for
  * `GROUP BY l_returnflag` reads ~10⁰ rows per group out of 10¹¹; the
  * summary (grouped by (l_returnflag, l_linestatus)) holds the SAME
  * information in a handful of rows, and any aggregate whose keys are
  * a subset of the summary's keys and whose measures are re-aggregable
  * partials (decimal SUMs merge by SUM, COUNT merges by SUM of counts)
  * can be served from it exactly. Decimal partials make the rewrite
  * EXACT, not approximately-equal: decimal addition is associative, so
  * re-aggregating partial sums is bit-identical to the direct sum —
  * this is why the summary contract stores decimals, never doubles.
  *
  * Opt-in via two confs (summary path + source path). Matching is
  * deliberately conservative: Aggregate → (optional Project of
  * aliases) → parquet scan of the source path, grouping keys ⊆
  * {l_returnflag, l_linestatus}, every measure one of
  * sum(cast(l_quantity as decimal(18,2))),
  * sum(cast(l_extendedprice as decimal(18,2))), count(*)/count(1).
  * Anything else leaves the plan untouched. Output attributes keep
  * their original exprIds (an outer Project re-aliases, casting the
  * widened re-aggregated decimals back to the original types), so
  * consumers of the rewritten node never notice.
  */
object RewriteAggregateToSummary extends Rule[LogicalPlan] {

  val PathConf = "spark.graft.mv.summaryPath"
  val SourceConf = "spark.graft.mv.sourcePath"

  /** Summary schema contract: keys + these measure columns. */
  val SumQty = "sum_qty"      // sum(cast(l_quantity as decimal(18,2)))
  val SumBase = "sum_base"    // sum(cast(l_extendedprice as decimal(18,2)))
  val Cnt = "cnt"             // count(*)
  private val Keys = Set("l_returnflag", "l_linestatus")

  private def confOpt(key: String): Option[String] =
    Option(SQLConf.get.getConfString(key, null)).map(_.trim).filter(_.nonEmpty)

  private def scansSource(plan: LogicalPlan, source: String): Boolean =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.exists(_.toString.contains(source))
      case Project(projList, child) =>
        // only look through pure attribute/alias projections
        projList.forall {
          case _: AttributeReference => true
          case Alias(_, _) => true
          case _ => false
        } && scansSource(child, source)
      case _ => false
    }

  /** Inline one level of Project aliases so measures written as
    * `sum(qd)` over `Project(qd = cast(l_quantity as decimal), scan)`
    * match the same shapes as the direct form. */
  private def inlined(e: Expression, child: LogicalPlan): Expression =
    child match {
      case Project(projList, _) =>
        val byId = projList.collect { case a @ Alias(c, _) => a.exprId -> c }
          .toMap
        e.transformUp {
          case ar: AttributeReference if byId.contains(ar.exprId) =>
            byId(ar.exprId)
        }
      case _ => e
    }

  private def isKey(e: Expression, name: String): Boolean = e match {
    case ar: AttributeReference => ar.name == name
    case _ => false
  }

  private sealed trait Measure
  private case object MQty extends Measure
  private case object MBase extends Measure
  private case object MCount extends Measure

  private def measureOf(e: Expression): Option[Measure] = e match {
    case AggregateExpression(Sum(arg, _), Complete, false, None, _) =>
      arg match {
        case Cast(ar: AttributeReference, _: DecimalType, _, _)
          if ar.name == "l_quantity" => Some(MQty)
        case Cast(ar: AttributeReference, _: DecimalType, _, _)
          if ar.name == "l_extendedprice" => Some(MBase)
        case _ => None
      }
    case AggregateExpression(Count(args), Complete, false, None, _)
      if args.forall(_.foldable) => Some(MCount)
    case _ => None
  }

  /** True iff `plan` reads the summary parquet (used by the key's
    * fired-assertion and the spec — LogicalRelation.toString does NOT
    * print file paths, so a string check cannot see the rewrite). */
  def servesFrom(plan: LogicalPlan, path: String): Boolean =
    plan.collectLeaves().exists {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.exists(_.toString.contains(path))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    (confOpt(PathConf), confOpt(SourceConf)) match {
      case (Some(path), Some(source)) => plan.transformUp {
        case agg @ Aggregate(groups, _, child, _)
          if scansSource(child, source) &&
            groups.forall(g => Keys.exists(isKey(g, _))) =>
          rewrite(agg, path).getOrElse(agg)
      }
      case _ => plan
    }

  private def rewrite(agg: Aggregate, path: String): Option[LogicalPlan] = {
    // classify every output BEFORE building anything: all-or-nothing
    val classified: Seq[Option[scala.util.Either[String, (Measure, Alias)]]] =
      agg.aggregateExpressions.map {
        case ar: AttributeReference if Keys.contains(ar.name) =>
          Some(scala.util.Left(ar.name))
        case al @ Alias(child, _) =>
          inlined(child, agg.child) match {
            case ae if measureOf(ae).isDefined =>
              Some(scala.util.Right((measureOf(ae).get, al)))
            case ar: AttributeReference if Keys.contains(ar.name) =>
              Some(scala.util.Left(ar.name))
            case _ => None
          }
        case _ => None
      }
    if (classified.exists(_.isEmpty)) return None

    val spark = SparkSession.active
    val mvPlan = spark.read.parquet(path).queryExecution.analyzed
    val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
    if (!Keys.forall(mvAttr.contains) ||
      !Seq(SumQty, SumBase, Cnt).forall(mvAttr.contains)) return None

    val newGroups = agg.groupingExpressions.map {
      case ar: AttributeReference => mvAttr(ar.name)
      case _ => return None // unreachable: the apply() guard filtered
    }
    def merged(m: Measure): Expression = m match {
      case MQty => AggregateExpression(
        Sum(mvAttr(SumQty)), Complete, isDistinct = false)
      case MBase => AggregateExpression(
        Sum(mvAttr(SumBase)), Complete, isDistinct = false)
      case MCount => AggregateExpression(
        Sum(mvAttr(Cnt)), Complete, isDistinct = false)
    }
    val newAggOut: Seq[NamedExpression] = classified.map {
      case Some(scala.util.Left(name)) => mvAttr(name)
      case Some(scala.util.Right((m, al))) => Alias(merged(m), al.name)()
      case None => return None
    }
    val newAgg = Aggregate(newGroups, newAggOut, mvPlan)
    // restore the original output attributes (names, exprIds, types)
    val restored = agg.output.zip(newAgg.output).map { case (orig, fresh) =>
      Alias(Cast(fresh, orig.dataType), orig.name)(exprId = orig.exprId)
    }
    Some(Project(restored, newAgg))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** `graft_session_id(ts, gap_micros)` — gap-based session labeling as a
  * NATIVE window function (an [[AggregateWindowFunction]], the running-
  * frame machinery behind rank/lag — the seventh distinct Catalyst
  * extension shape in the repo).
  *
  * The stock idiom needs TWO window expressions over the ordered
  * partition (`lag` to flag breaks, then a running `sum` of flags —
  * `win_sessionize`); this folds both into ONE running buffer pass:
  * the buffer carries (previous timestamp, session counter) and each
  * row advances the counter when its gap from the previous row exceeds
  * `gap_micros`. Same total order ⇒ same labels, bit-for-bit.
  *
  * Session ids are 0-based per partition (matching the cumsum-of-breaks
  * formulation, so the two forms share one oracle). `gap_micros` must
  * be a foldable literal — it participates in the update expression.
  *
  * Scale: one sort per partition (the window's), ZERO extra shuffles or
  * buffers vs the two-expression form — and at 100 TB the win is that
  * downstream session aggregation keys on (partition, sid) straight out
  * of the single pass. */
case class SessionId(ts: Expression, gap: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(ts, gap)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_session_id"

  private lazy val prevTs = AttributeReference("prevTs", LongType)()
  private lazy val sid = AttributeReference("sid", LongType)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    prevTs :: sid :: Nil

  private def micros: Expression = ts.dataType match {
    case TimestampType | TimestampNTZType => UnixMicros(ts)
    case _ => Cast(ts, LongType)
  }

  override val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(-1L))

  // all update expressions evaluate against the PRE-update buffer (one
  // projection), so `sid`/`prevTs` here are the previous row's state
  override lazy val updateExpressions: Seq[Expression] = Seq(
    micros,
    If(Or(IsNull(prevTs), GreaterThan(Subtract(micros, prevTs), gap)),
      Add(sid, Literal(1L)), sid))

  override lazy val evaluateExpression: Expression = sid

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SessionId =
    copy(ts = newChildren(0), gap = newChildren(1))
}

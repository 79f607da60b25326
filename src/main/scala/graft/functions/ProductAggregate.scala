package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `graft_product` — the product aggregate Spark never shipped (DuckDB
  * and Postgres have `product()` / `exp(sum(ln))` idioms; Spark users
  * fall back to log-sum tricks that break on zeros/negatives and
  * diverge across libm implementations).
  *
  * A [[DeclarativeAggregate]]: the whole update/merge protocol is
  * EXPRESSIONS, so it rides whole-stage codegen in both hash-aggregate
  * and window paths — no imperative buffer (de)serialization like the
  * repo's TypedImperativeAggregates (minhash/simhash/topk), which makes
  * it the sixth distinct Catalyst extension shape in the repo and the
  * right one for a scalar fold.
  *
  * Null semantics mirror `sum`: null inputs are skipped, an all-null or
  * empty group yields null.
  *
  * DETERMINISM: IEEE multiplication is commutative but NOT associative,
  * so the grouped-aggregate form is merge-order-dependent exactly like
  * the built-in `sum(double)` — use it where tolerance allows. The
  * WINDOW form over a cumulative or short bounded frame with a TOTAL
  * order evaluates strictly left-to-right (update-only, no merge), so
  * its result is plan-stable; `fin_compound_return` pins operands to
  * short decimals and FinanceSpec cross-checks a driver-side fold. */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_product"

  private lazy val product = AttributeReference("product", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    product :: Nil

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType))

  private def childD: Expression = child.dataType match {
    case DoubleType => child
    case _ => Cast(child, DoubleType)
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(childD), product,
      If(IsNull(product), childD, Multiply(product, childD))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(product.right), product.left,
      If(IsNull(product.left), product.right,
        Multiply(product.left, product.right))))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}

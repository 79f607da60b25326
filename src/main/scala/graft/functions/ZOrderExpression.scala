package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave [N] — the multi-dimensional clustering
  * key behind Delta/Iceberg `ZORDER BY`: bit i of `x` lands at bit 2i of
  * the result, bit i of `y` at bit 2i+1, so sorting by the z-value keeps
  * rows close in BOTH dimensions close on the curve. Clustering a table
  * by `graft_zorder(a, b)` + range partitioning gives file-level min/max
  * bands that stay tight on a and on b simultaneously — a predicate on
  * EITHER column prunes files ([[graft.ops.ZoneMap]]), where a linear
  * sort by a leaves b's bands full-width.
  *
  * Total and deterministic over all int inputs (the raw 32 two's
  * complement bits interleave); the dimension-monotonicity property that
  * makes clustering useful holds on NON-NEGATIVE inputs — normalize
  * dimensions first (epoch days, bucket ids, dictionary codes), which is
  * what every z-order implementation requires. Codegen: two magic-mask
  * spreads, no branches, stays inside whole-stage codegen.
  */
case class ZOrderValue(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "graft_zorder"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two INT arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderValue.interleave($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrderValue {
  /** Spread the 32 bits of `v` to the even bit positions of a long
    * (standard magic-mask doubling, public-domain bit trick). */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: x on even bits, y on odd bits. Non-negative inputs
    * yield a non-negative long (top two bits clear), so plain signed
    * ordering of the z-value is curve order. */
  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve index [N] — the space-filling clustering key Delta Lake
  * moved to after Z-order (`OPTIMIZE ... CLUSTER BY` liquid clustering):
  * unlike the Morton curve, every step along the Hilbert curve moves to
  * an ADJACENT cell, so it has no Z-order "seams" (the long diagonal
  * jumps where one curve step teleports across half the key space and
  * drags a file's min/max band wide). Same contract as
  * [[ZOrderValue]]: two non-negative INT dimensions in, one
  * monotonically-clusterable LONG out, sorted+range-partitioned for
  * file-skipping scans ([[graft.ops.ZoneMap]]).
  *
  * The transform is the classical top-down quadrant walk (Wikipedia's
  * public-domain xy2d): at each of the 31 bit levels, the quadrant
  * index contributes `s² · (3rx ⊕ ry)` curve cells and the remaining
  * sub-square is rotated/reflected into canonical orientation. Pure
  * integer arithmetic — total, deterministic, and codegen-friendly (one
  * static call, no allocation); 31 levels × 2 dims tops out at 2^62,
  * comfortably inside a signed long.
  */
case class HilbertValue(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "graft_hilbert"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two INT arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertValue.index(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertValue.index($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertValue {
  /** xy → distance along the order-31 Hilbert curve. Inputs are taken
    * as non-negative (negative ints clamp to 0 — the same "normalize
    * your dimensions first" contract as z-order, degraded locally
    * instead of curve-destroying). */
  def index(x0: Int, y0: Int): Long = {
    var x: Long = if (x0 < 0) 0L else x0.toLong
    var y: Long = if (y0 < 0) 0L else y0.toLong
    var d = 0L
    var s: Long = 1L << 30
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the sub-square into canonical orientation
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

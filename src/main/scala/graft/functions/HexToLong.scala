package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen fixed-radix hex-window parser for the md5-coin discipline
  * (r14 optimization round, guide §4 "expressions and codegen").
  *
  * `graft_hex_long(s, pos, len)` == `cast(conv(substring(s, pos, len),
  * 16, 10) as bigint)` for every input the md5-coin paths feed it (a
  * 32-char lowercase-hex md5 digest; uppercase also accepted) — but
  * where `conv` allocates a substring UTF8String, walks a generic
  * any-radix loop, formats a DECIMAL STRING, and the enclosing cast
  * parses that string back to a long (~5 µs/call measured), this is a
  * direct byte-window accumulate (`v = v*16 + digit`), no allocation,
  * fully codegen. The draws-per-second difference is material: the
  * resampling keys evaluate it 10-20M times per run.
  *
  * Semantics mirrored from `conv` on its VALID-hex prefix behavior:
  * parsing stops at the first non-hex byte (conv's NumberConverter
  * likewise accumulates the leading valid digits), and a window that
  * starts past the end of the string yields 0 (`conv('',16,10) = '0'`).
  * `pos` is 1-based (substring convention); `len` ≤ 15 is enforced at
  * analysis time so the unsigned value always fits a signed long —
  * exactly the precondition every md5-coin call site already holds
  * (8-char 32-bit draws, 15-char 60-bit word ids).
  *
  * The DuckDB oracles are untouched: they derive the SAME integer via
  * the strpos polynomial, and the hash gate certifies value equality.
  */
case class HexToLong(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {
  override def prettyName: String = "graft_hex_long"
  override def dataType: DataType = LongType
  // can yield null (zero digits consumed) even for a non-null child —
  // without this, codegen on a non-nullable child compiles ev.isNull to
  // the `false` literal and the null branch is unreachable
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType =>
      if (pos < 1) TypeCheckResult.TypeCheckFailure(
        s"$prettyName: pos must be >= 1 (1-based substring convention), got $pos")
      else if (len < 1 || len > 15) TypeCheckResult.TypeCheckFailure(
        s"$prettyName: len must be in [1, 15] so the value fits a signed " +
          s"long, got $len")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def nullSafeEval(s: Any): Any = {
    val v = HexToLong.parse(s.asInstanceOf[UTF8String], pos - 1, len)
    if (v < 0) null else v
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HexToLong.parse($c, ${pos - 1}, $len);
         |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = 0L; }
         |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HexToLong {
  /** Accumulate up to `len` hex digits of `s` from 0-based `from`;
    * stops at end-of-string or the first non-hex byte. Mirrors `conv`
    * exactly (HexToLongSpec pins it): an EMPTY window (start past the
    * string end) is NULL — `conv('', 16, 10)` is NULL — returned as the
    * −1 sentinel (unreachable for valid results: len ≤ 15 keeps them
    * below 2^60); a non-empty window that starts at an invalid byte is
    * 0, conv's leading-valid-prefix value. */
  def parse(s: UTF8String, from: Int, len: Int): Long = {
    val bytes = s.getBytes
    if (from >= bytes.length) return -1L
    val end0 = from + len
    val end = if (end0 > bytes.length) bytes.length else end0
    var v = 0L
    var i = from
    while (i < end) {
      val b = bytes(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else return v
      v = v * 16 + d
      i += 1
    }
    v
  }
}

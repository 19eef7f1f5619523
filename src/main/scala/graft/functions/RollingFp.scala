package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst polynomial rolling-hash fingerprint — the codegen'd
  * twin of the `split("")`/`transform(ascii)`/`aggregate` higher-order
  * chain in [[TextFns.rollingFingerprint]] (guide §4 / builder brief:
  * per-element lambda dispatch on the hot path becomes one tight
  * primitive loop; the HOF spelling allocates a one-char UTF8String
  * per character plus an ArrayData per row and interprets three
  * lambdas per element).
  *
  * Bit-exact contract with the HOF chain (pinned by RollingFpSpec,
  * probe-verified including supplementary planes):
  *   - NULL text → NULL;
  *   - empty text → 0 (split("") of "" yields [""], ascii("") = 0, and
  *     the fold over the empty tail returns the 0 seed);
  *   - else fold over CODE POINTS (split("") keeps surrogate pairs
  *     whole and ascii() returns the code point): acc starts at the
  *     first code point un-modded, then acc = (acc*131 + cp) mod
  *     1e9+7. All values stay nonnegative, so % == pmod, and
  *     acc*131 + cp < 2^37 never overflows a long. */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fp needs a string input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"

  override def nullSafeEval(input: Any): Any =
    RollingFp.fold(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFp.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFp {
  def fold(u: UTF8String): Long = {
    val s = u.toString
    val n = s.length
    if (n == 0) return 0L
    var acc = 0L
    var i = 0
    var first = true
    while (i < n) {
      val cp = s.codePointAt(i)
      if (first) { acc = cp.toLong; first = false }
      else acc = (acc * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}

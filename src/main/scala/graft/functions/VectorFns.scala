package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two double arrays, with
  * whole-stage codegen (preference order (b) from the builder brief:
  * a custom `Expression` with `doGenCode` beats a Scala UDF and the
  * interpreted higher-order-function fold for the ANN hot path —
  * per-element lambda dispatch becomes a tight primitive loop).
  *
  * Summation is the same left-to-right order as the
  * `aggregate(zip_with(...))` formulation, so results are
  * bit-identical to the portable SQL twin the oracles use.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  // Length mismatch -> NULL, matching the aggregate(zip_with(...))
  // twin exactly (zip_with pads the shorter side with NULLs, which
  // nulls the product and therefore the whole sum).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFns {
  private def toDouble(c: Column): Column = transform(c, v => v.cast("double"))

  /** Codegen'd dot product of two numeric arrays (cast to double). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(toDouble(a)),
      ColumnBridge.expression(toDouble(b))))

  /** Cosine similarity on the codegen'd dot path, rounded so
    * last-ulp summation differences across engines vanish.
    * Zero-norm vectors yield NULL (not NaN — Spark sorts NaN ABOVE
    * every number, so a NaN would rank #1 in top-k and pass `>= tau`
    * filters; NULL sorts last and fails predicates, the safe
    * degenerate behavior). */
  def cosine(a: Column, b: Column, digits: Int = 4): Column = {
    val da = toDouble(a); val db = toDouble(b)
    val denom = sqrt(dot(da, da)) * sqrt(dot(db, db))
    round(when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dot(da, db) / denom), digits)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Compiled kernel behind [[DotProduct]]. Left-to-right accumulation —
  * the same order as the `aggregate(zip_with(...))` fold it replaces and
  * as DuckDB's `list_sum(list_transform(...))`, so results are
  * bit-identical to the oracle. */
object DotProductImpl {
  /** Returns null (boxed) when the arrays differ in length or any element
    * is null — the same cases where `aggregate(zip_with(...))` yields NULL,
    * so the native kernel never silently truncates mismatched vectors. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native Σ aᵢ·bᵢ over two `array<double>` columns (SURVEY §7.3 custom-
  * Expression tier). The higher-order-function formulation walks an
  * interpreted expression tree per element *per pair* — on O(pairs)
  * similarity operators (cosine NN join, ANN, embedding near-dup) this
  * compiled loop is the hot kernel. Registered as SQL `graft_dot` by
  * [[GraftFunctions]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got $other")
  }
  // May produce null even for non-null inputs (length mismatch / null element).
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $boxed = graft.functions.DotProductImpl.dot($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

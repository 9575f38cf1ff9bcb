package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `ArrayDotProduct(a: array<double>, b: array<double>): double` — the hot
 * kernel of cosine similarity search.
 *
 * A native Catalyst expression instead of `aggregate(zip_with(...))`: the
 * higher-order-function form allocates an intermediate array and evaluates
 * a lambda per element; this runs a primitive loop over the two unsafe
 * arrays, stays inside whole-stage codegen, and allocates nothing. On an
 * n²-pair similarity join this is the difference between scan-speed and
 * GC-bound.
 */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ArrayDotProduct expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ArrayDotProduct.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Primitive-loop kernel shared by interpreted and generated code.
   * Mismatched lengths throw: a silent partial dot product would make
   * similarity results quietly wrong under schema drift or bad upstream
   * data, matching the strictness of the type check. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"ArrayDotProduct: dimension mismatch (${n} vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(ArrayDotProduct(GraftShims.expression(a), GraftShims.expression(b)))
  }
}

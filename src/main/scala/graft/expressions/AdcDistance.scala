package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * `AdcDistance(codes: array<int>, qtab: array<array<double>>): double` —
 * the asymmetric-distance kernel of IVF-PQ search: sum over subspaces j of
 * the query's distance table entry at the candidate's code,
 * `Σ_j qtab[j][codes[j]]`.
 *
 * This is THE per-candidate cost of a product-quantized scan (everything
 * else in IVF-PQ is per-row or per-query), so it gets the same treatment
 * as [[ArrayDotProduct]]: a native expression with a primitive loop over
 * unsafe arrays instead of `aggregate(zip_with(...))`, which allocates a
 * zipped intermediate array and evaluates two lambdas per subspace for
 * every (query, candidate) pair. Stays inside whole-stage codegen.
 */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"AdcDistance expects (array<int>, array<array<double>>), got (${left.dataType}, ${right.dataType})")
    }

  override def nullSafeEval(codes: Any, qtab: Any): Any =
    AdcDistance.adc(codes.asInstanceOf[ArrayData], qtab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, qtab) =>
      s"${ev.value} = graft.expressions.AdcDistance.adc($codes, $qtab);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  /** Primitive-loop kernel shared by interpreted and generated code.
   * A code outside its subspace table (index width drift between a
   * persisted codes index and the model) throws instead of silently
   * reading a wrong entry — same strictness as [[ArrayDotProduct.dot]]. */
  def adc(codes: ArrayData, qtab: ArrayData): Double = {
    val m = codes.numElements()
    if (m != qtab.numElements())
      throw new IllegalArgumentException(
        s"AdcDistance: $m codes but ${qtab.numElements()} table subspaces — " +
          "codes index and model built with different m?")
    var s = 0.0
    var j = 0
    while (j < m) {
      // null entries (a dim-drifted build let zip_with pad with nulls)
      // would read as 0.0 garbage on UnsafeArrayData — raise instead,
      // keeping the kernel's fail-loudly contract for drifted indexes
      if (codes.isNullAt(j) || qtab.isNullAt(j))
        throw new IllegalArgumentException(
          s"AdcDistance: null code or table row at subspace $j — " +
            "codes index and model built with different parameters?")
      val row = qtab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"AdcDistance: code $c out of range for ksub=${row.numElements()} at subspace $j — " +
            "codes index and model built with different ksub?")
      if (row.isNullAt(c))
        throw new IllegalArgumentException(
          s"AdcDistance: null table entry at subspace $j code $c — " +
            "codes index and model built with different parameters?")
      s += row.getDouble(c)
      j += 1
    }
    s
  }

  def adcDistance(codes: Column, qtab: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(AdcDistance(GraftShims.expression(codes), GraftShims.expression(qtab)))
  }
}

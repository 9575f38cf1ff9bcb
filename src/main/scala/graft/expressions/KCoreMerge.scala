package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * `KCoreMerge(nbrCores: array<int>, core: int): int` — the k-core update
 * step (an h-index computation capped at the current core estimate):
 * the largest k <= core such that at least k neighbors report core >= k.
 *
 * Native Catalyst expression (role mirrors reference
 * expressions/KCoreMerge.scala:22-101): interpreted `nullSafeEval` plus
 * `doGenCode` that stays inside whole-stage codegen by calling the shared
 * static kernel — no boxing, no UDF serialization.
 */
case class KCoreMerge(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"KCoreMerge expects (array<int>, int), got (${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(nbrCores: Any, core: Any): Any =
    KCoreMerge.merge(nbrCores.asInstanceOf[ArrayData], core.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, core) =>
      s"${ev.value} = graft.expressions.KCoreMerge.merge($arr, $core);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KCoreMerge {
  /** Shared kernel for both interpreted and generated code paths. */
  def merge(nbrCores: ArrayData, core: Int): Int = {
    val arr = nbrCores.toIntArray()
    java.util.Arrays.sort(arr)
    val n = arr.length
    var h = 0
    var i = n - 1
    // descending scan: position (n-1-i) from the top; h-index with cap
    while (i >= 0) {
      val rank = n - i
      val c = math.min(arr(i), core)
      if (c >= rank) h = math.max(h, math.min(c, rank))
      i -= 1
    }
    math.min(h, core)
  }

  def kcoreMerge(nbrCores: Column, core: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(KCoreMerge(GraftShims.expression(nbrCores), GraftShims.expression(core)))
  }
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * `FiniteAXPlusB(a, x, b): long` — the affine map a·x + b over GF(2^64)
 * (carry-less multiply, XOR add). A pairwise-independent hash family used
 * by randomized-contraction connected components: each round draws (a, b)
 * and every vertex is re-keyed by an invertible mixing of its id
 * (role of reference expressions/FiniteAXPlusB.scala:12-85).
 *
 * Native expression with codegen via the shared static kernel.
 */
case class FiniteAXPlusB(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"FiniteAXPlusB expects (long, long, long)")

  override def nullSafeEval(a: Any, x: Any, b: Any): Any =
    FiniteAXPlusB.axpb(a.asInstanceOf[Long], x.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, x, b) =>
      s"${ev.value} = graft.expressions.FiniteAXPlusB.axpb($a, $x, $b);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object FiniteAXPlusB {
  /** x^64 + x^4 + x^3 + x + 1 — the low 64 bits of the reduction poly. */
  private val POLY = 0x1BL

  /** Carry-less a·x mod the GF(2^64) reduction polynomial, then XOR b. */
  def axpb(a: Long, x: Long, b: Long): Long = {
    var acc = 0L
    var aa = a
    var xx = x
    var i = 0
    while (i < 64 && aa != 0) {
      if ((aa & 1L) != 0) acc ^= xx
      aa >>>= 1
      // xx = xx * z mod poly
      val hi = xx < 0 // top bit set
      xx <<= 1
      if (hi) xx ^= POLY
      i += 1
    }
    acc ^ b
  }

  def finiteAxpb(a: Column, x: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(FiniteAXPlusB(
      GraftShims.expression(a), GraftShims.expression(x), GraftShims.expression(b)))
  }
}

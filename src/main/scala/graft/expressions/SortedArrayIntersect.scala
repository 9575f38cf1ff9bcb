package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `SortedArrayIntersect(a, b): array<T>` — common elements of two SORTED,
 * duplicate-free arrays by a single merge walk.
 *
 * The hot kernel of per-vertex triangle counting: `array_intersect` builds a
 * hash set per evaluated row (boxed inserts + probes over both inputs —
 * measured ~1M element-ops/s/thread on long ids), which made the
 * adjacency-intersection stage the dominant cost on dense graphs. The merge
 * walk does one pass of primitive comparisons with no per-element hashing
 * and no intermediate set, and stays inside whole-stage codegen.
 *
 * Contract: both inputs ascending-sorted with distinct, non-null elements
 * (exactly what `sort_array(collect_set(...))` produces). Unsorted input
 * yields an undefined subset — callers own the contract, which is why this
 * is not exposed as a general SQL function replacement for array_intersect.
 */
case class SortedArrayIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"SortedArrayIntersect expects two arrays of the same orderable type, " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = elemType match {
    case LongType =>
      SortedArrayIntersect.intersectLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case t =>
      SortedArrayIntersect.intersectOrd(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t, ordering)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    elemType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.expressions.SortedArrayIntersect.intersectLong($a, $b);")
      case t =>
        val ordRef = ctx.addReferenceObj("saiOrdering", ordering,
          classOf[Ordering[Any]].getName)
        val dtRef = ctx.addReferenceObj("saiElemType", t,
          classOf[DataType].getName)
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.expressions.SortedArrayIntersect.intersectOrd(" +
            s"$a, $b, $dtRef, $ordRef);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * `SortedArrayIntersectSize(a, b): int` — |a ∩ b| for two SORTED,
 * duplicate-free arrays; the counting-only sibling of
 * [[SortedArrayIntersect]] that allocates nothing at all. Used where only
 * the common-neighbor COUNT is needed (per-edge triangle credits), which
 * skips materializing the member array entirely.
 */
case class SortedArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"SortedArrayIntersectSize expects two arrays of the same orderable type, " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = elemType match {
    case LongType =>
      SortedArrayIntersect.sizeLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case t =>
      SortedArrayIntersect.sizeOrd(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t, ordering)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    elemType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.expressions.SortedArrayIntersect.sizeLong($a, $b);")
      case t =>
        val ordRef = ctx.addReferenceObj("saiOrdering", ordering,
          classOf[Ordering[Any]].getName)
        val dtRef = ctx.addReferenceObj("saiElemType", t,
          classOf[DataType].getName)
        nullSafeCodeGen(ctx, ev, (a, b) =>
          s"${ev.value} = graft.expressions.SortedArrayIntersect.sizeOrd(" +
            s"$a, $b, $dtRef, $ordRef);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedArrayIntersect {
  /** Primitive merge-walk count for long element arrays. */
  def sizeLong(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { k += 1; i += 1; j += 1 }
    }
    k
  }

  /** Merge-walk count for any orderable atomic element type. */
  def sizeOrd(a: ArrayData, b: ArrayData, t: DataType, ord: Ordering[Any]): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val c = ord.compare(a.get(i, t), b.get(j, t))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { k += 1; i += 1; j += 1 }
    }
    k
  }

  def sortedIntersectSize(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(SortedArrayIntersectSize(GraftShims.expression(a), GraftShims.expression(b)))
  }

  /** Primitive merge walk for long element arrays — zero boxing. */
  def intersectLong(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements(); val m = b.numElements()
    val out = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Merge walk for any orderable atomic element type. */
  def intersectOrd(a: ArrayData, b: ArrayData, t: DataType,
      ord: Ordering[Any]): ArrayData = {
    val n = a.numElements(); val m = b.numElements()
    val out = new Array[Any](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val x = a.get(i, t); val y = b.get(j, t)
      val c = ord.compare(x, y)
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }

  def sortedIntersect(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(SortedArrayIntersect(GraftShims.expression(a), GraftShims.expression(b)))
  }
}

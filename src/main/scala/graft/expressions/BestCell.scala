package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * `BestCell(vec: array<double>, norm: double, cells: array<struct<id, v:
 * array<double>, n: double>>): int` — the 0-based index of the centroid
 * with the highest cosine similarity to `vec`, ties broken by the struct's
 * first field (cell id) ascending; zero-norm entries score the `-2.0`
 * sentinel (below any cosine), exactly the order the previous
 * `transform`+`array_sort`(comparator)+`slice(1)` pipeline produced — so
 * every persisted oracle hash is unchanged.
 *
 * This is the per-row hot loop of every IVF cell ASSIGNMENT: Lloyd
 * reassignment, the hierarchical quantizer's top-1 routing, and PQ index
 * cell selection each evaluate it once per (row × centroid). The HOF
 * form allocates a scored struct array per row and runs an interpreted
 * TimSort comparator per element pair; this kernel is one primitive loop
 * over the packed unsafe structs with no allocation, inside whole-stage
 * codegen — the same treatment as [[AdcDistance]] and [[PqNearestCode]].
 * Top-R probing (R > 1) keeps the sort pipeline: a full ranking needs the
 * sort anyway and R is small there.
 *
 * Cell ids may be any orderable atomic type (long, string, ...): the
 * interpreted path uses Catalyst's ordering, codegen uses `ctx.genComp`.
 * NaN similarities, null/empty cells, and malformed structs throw —
 * fail-loudly like the rest of the kernel family.
 */
case class BestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType

  private def cellStruct: Option[StructType] = third.dataType match {
    case ArrayType(s: StructType, _) if s.length == 3 => Some(s)
    case _ => None
  }
  private def idType: DataType = cellStruct.get.fields(0).dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, cellStruct) match {
      case (ArrayType(DoubleType, _), DoubleType, Some(s))
        if s.fields(1).dataType.isInstanceOf[ArrayType] &&
          s.fields(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          s.fields(2).dataType == DoubleType &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s.fields(0).dataType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BestCell expects (array<double>, double, array<struct<id, array<double>, double>>), " +
          s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
    }

  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idType)

  override def nullSafeEval(v: Any, n: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val norm = n.asInstanceOf[Double]
    val cells = cs.asInstanceOf[ArrayData]
    val m = cells.numElements()
    if (m == 0)
      throw new IllegalArgumentException("BestCell: empty centroid array")
    var best = -1
    var bestSim = 0.0
    var bestId: Any = null
    var c = 0
    while (c < m) {
      if (cells.isNullAt(c))
        throw new IllegalArgumentException(s"BestCell: null centroid struct at $c")
      val cell = cells.getStruct(c, 3)
      if (cell.isNullAt(0) || cell.isNullAt(1) || cell.isNullAt(2))
        throw new IllegalArgumentException(s"BestCell: null field in centroid $c")
      val sim = BestCell.sim(vec, norm, cell.getArray(1), cell.getDouble(2), c)
      val id = cell.get(0, idType)
      if (best < 0 || sim > bestSim ||
          (sim == bestSim && idOrdering.compare(id, bestId) < 0)) {
        best = c; bestSim = sim; bestId = id
      }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, norm, cells) => {
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cell = ctx.freshName("cell")
      val sim = ctx.freshName("sim")
      val id = ctx.freshName("id")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val bestId = ctx.freshName("bestId")
      val idJava = CodeGenerator.javaType(idType)
      val getId = CodeGenerator.getValue(cell, idType, "0")
      s"""
         |int $m = $cells.numElements();
         |if ($m == 0)
         |  throw new IllegalArgumentException("BestCell: empty centroid array");
         |int $best = -1;
         |double $bestSim = 0.0;
         |$idJava $bestId = ${CodeGenerator.defaultValue(idType)};
         |for (int $c = 0; $c < $m; $c++) {
         |  if ($cells.isNullAt($c))
         |    throw new IllegalArgumentException("BestCell: null centroid struct at " + $c);
         |  InternalRow $cell = $cells.getStruct($c, 3);
         |  if ($cell.isNullAt(0) || $cell.isNullAt(1) || $cell.isNullAt(2))
         |    throw new IllegalArgumentException("BestCell: null field in centroid " + $c);
         |  double $sim = graft.expressions.BestCell.sim(
         |    $vec, $norm, $cell.getArray(1), $cell.getDouble(2), $c);
         |  $idJava $id = $getId;
         |  if ($best < 0 || $sim > $bestSim ||
         |      ($sim == $bestSim && ${ctx.genComp(idType, id, bestId)} < 0)) {
         |    $best = $c; $bestSim = $sim; $bestId = $id;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BestCell {
  /** Cosine of `vec` against centroid `cv` with precomputed norms —
   * identical arithmetic (and summation order, via [[ArrayDotProduct
   * .dot]]) to the `cosineOf(dotProduct(...))` column pipeline it
   * replaces; zero/negative norm products score the same `-2.0` sentinel
   * the sort comparator used. NaN throws instead of silently losing the
   * argmax. */
  def sim(vec: ArrayData, norm: Double, cv: ArrayData, cn: Double, c: Int): Double = {
    val dn = norm * cn
    val s = if (dn > 0) ArrayDotProduct.dot(vec, cv) / dn else -2.0
    if (s != s)
      throw new IllegalArgumentException(
        s"BestCell: NaN similarity at centroid $c — NaN in the vector or centroid?")
    s
  }

  def bestCellIndex(vec: Column, norm: Column, cells: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(BestCell(GraftShims.expression(vec),
      GraftShims.expression(norm), GraftShims.expression(cells)))
  }
}

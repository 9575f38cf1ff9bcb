package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * `PqNearestCode(vec: array<double>, codebook: array<array<array<double>>>)
 * : array<int>` — the product-quantization CODING kernel: for each
 * subspace j of the codebook (`codebook[j][c]` = centroid c's subvector),
 * the 0-based index of the nearest centroid to the vector's j-th
 * subvector by squared L2, ties to the lowest code.
 *
 * Coding is the per-row cost of every index build ([[graft.pipeline
 * .Similarity.pqCodes]] / `ivfPqIndex` / `ivfPqTopK` data side), and the
 * HOF formulation (`transform` over subspaces of an `array_sort` over a
 * tagged `transform`+`aggregate`+`zip_with` distance sweep) allocates
 * several intermediate arrays per (row, subspace) and evaluates
 * interpreted lambdas in the innermost loop. Same treatment as
 * [[AdcDistance]]: one primitive triple loop over unsafe arrays, inside
 * whole-stage codegen.
 *
 * Summation order over subvector elements is i = 0..dsub-1, identical to
 * the HOF `aggregate(zip_with(...))` it replaces, so distances — and
 * therefore argmin ties — are bit-identical and every persisted oracle
 * hash is unchanged.
 */
case class PqNearestCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PqNearestCode expects (array<double>, array<array<array<double>>>), " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override def nullSafeEval(vec: Any, cb: Any): Any =
    PqNearestCode.code(vec.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cb) =>
      s"${ev.value} = graft.expressions.PqNearestCode.code($vec, $cb);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqNearestCode {
  /** Primitive-loop kernel shared by interpreted and generated code.
   * Width drift (vector length not m × dsub) or null entries throw
   * instead of silently mis-coding — same fail-loudly contract as
   * [[AdcDistance.adc]]. */
  def code(vec: ArrayData, cb: ArrayData): ArrayData = {
    val m = cb.numElements()
    val dim = vec.numElements()
    if (m == 0 || dim % m != 0)
      throw new IllegalArgumentException(
        s"PqNearestCode: vector dim $dim not divisible into $m codebook subspaces — " +
          "vectors and codebook built with different parameters?")
    val dsub = dim / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      if (cb.isNullAt(j))
        throw new IllegalArgumentException(
          s"PqNearestCode: null codebook subspace $j")
      val cents = cb.getArray(j)
      val ksub = cents.numElements()
      if (ksub == 0)
        throw new IllegalArgumentException(
          s"PqNearestCode: empty codebook subspace $j")
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        if (cents.isNullAt(c))
          throw new IllegalArgumentException(
            s"PqNearestCode: null centroid $c in subspace $j")
        val cent = cents.getArray(c)
        if (cent.numElements() != dsub)
          throw new IllegalArgumentException(
            s"PqNearestCode: centroid width ${cent.numElements()} != dsub $dsub " +
              s"at subspace $j code $c — codebook built with different parameters?")
        var d = 0.0
        var i = 0
        while (i < dsub) {
          if (vec.isNullAt(j * dsub + i) || cent.isNullAt(i))
            throw new IllegalArgumentException(
              s"PqNearestCode: null element at subspace $j code $c dim $i")
          val diff = vec.getDouble(j * dsub + i) - cent.getDouble(i)
          d += diff * diff
          i += 1
        }
        // strict < keeps the first (lowest) code on exact ties — the same
        // order the struct-lexicographic (distance, code) min produced
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      // all-NaN distances (a NaN in the vector) never beat +Inf; surface
      // that here instead of emitting -1 and failing far away inside
      // AdcDistance with a misleading "different ksub?" range error
      if (best < 0)
        throw new IllegalArgumentException(
          s"PqNearestCode: no finite distance in subspace $j — NaN in the " +
            "input vector or codebook?")
      out(j) = best
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  def pqNearestCode(vec: Column, cb: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShims
    GraftShims.column(PqNearestCode(GraftShims.expression(vec), GraftShims.expression(cb)))
  }
}

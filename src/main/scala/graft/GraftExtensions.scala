package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{AdcDistance, ArraySumAgg, ArrayDotProduct, FiniteAXPlusB, HIndexAgg, KCoreMerge, MapMinAgg}

/**
 * Spark SQL extension that registers graft's native Catalyst expressions as
 * SQL functions, so `spark.sql("SELECT graft_kcore_merge(...)")` works in any
 * session started with
 *
 * {{{
 *   spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * The algorithm internals register narrower session-temp functions on their
 * own (`_kcoreMerge`, `_axpb` — see lib/KCore.scala, lib/RandomizedContraction
 * .scala); this class is the public, catalog-visible surface for SQL users and
 * for pure-SQL clients (JDBC/Thrift, spark-sql shell) that never touch the
 * Scala API. Functions are injected into the FunctionRegistry at session build
 * time — before any query — which is the supported way to add expressions that
 * participate in whole-stage codegen (unlike UDFs). The reference's equivalent
 * surface is Scala-only; exposing the kernels to SQL is a Spark-first bonus.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** (identifier, doc, builder) for every public native expression. */
  val functionDescriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    desc(
      "graft_kcore_merge",
      usage = "graft_kcore_merge(nbr_cores: array<int>, core: int) - h-index-style k-core update: " +
        "largest k <= core with at least k neighbors reporting core >= k.",
      arity = 2) { args => KCoreMerge(args(0), args(1)) },
    desc(
      "graft_axpb",
      usage = "graft_axpb(a: bigint, x: bigint, b: bigint) - invertible affine map a*x + b over " +
        "GF(2^64) (carry-less multiply, XOR add); a pairwise-independent hash family.",
      arity = 3) { args => FiniteAXPlusB(args(0), args(1), args(2)) },
    desc(
      "graft_array_dot",
      usage = "graft_array_dot(a: array<double>, b: array<double>) - dot product as a primitive " +
        "loop over unsafe arrays (no intermediate allocation, stays in whole-stage codegen).",
      arity = 2) { args => ArrayDotProduct(args(0), args(1)) },
    desc(
      "graft_adc_distance",
      usage = "graft_adc_distance(codes: array<int>, qtab: array<array<double>>) - IVF-PQ " +
        "asymmetric distance: sum over subspaces j of qtab[j][codes[j]] (0-based codes); " +
        "the per-candidate kernel of a product-quantized scan.",
      arity = 2) { args => AdcDistance(args(0), args(1)) },
    desc(
      "graft_array_sum",
      usage = "graft_array_sum(v: array<double>) - aggregate: elementwise sum of equal-length " +
        "arrays with a constant-size combine buffer (one double per lane).",
      arity = 1) { args => ArraySumAgg(args(0)) },
    desc(
      "graft_map_min",
      usage = "graft_map_min(m: map<K,int>) - aggregate: key-union with the minimum value per " +
        "key; buffer bounded by the distinct-key count, not the row count.",
      arity = 1) { args => MapMinAgg(args(0)) },
    desc(
      "graft_hindex",
      usage = "graft_hindex(v: int) - aggregate: h-index of the values (largest h with at least " +
        "h values >= h), combined as a value->count histogram.",
      arity = 1) { args => HIndexAgg(args(0)) },
    desc(
      "graft_lane_sum",
      usage = "graft_lane_sum(lane: int, v: double, dim: int) - aggregate: scatter-add of " +
        "(lane, value) pairs into a dense double[dim]; dim must be a literal.",
      arity = 3) { args =>
      val dim = args(2) match {
        case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"graft_lane_sum: dim must be an int literal, got $other")
      }
      graft.expressions.LaneSumAgg(args(0), args(1), dim)
    }
  )

  private def desc(name: String, usage: String, arity: Int)(
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder: Seq[Expression] => Expression = { args =>
      if (args.length != arity) {
        throw new IllegalArgumentException(
          s"$name expects $arity arguments, got ${args.length}")
      }
      build(args)
    }
    // 5-arg constructor: (className, db, name, usage, examples). The 3-arg
    // form is (className, db, name) and would garble DESCRIBE FUNCTION output.
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""),
      builder)
  }

  /**
   * Imperative fallback for sessions that were not started with the
   * extension: registers the same functions as session-temp functions.
   * Useful in notebooks where the session already exists.
   */
  def register(spark: SparkSession): Unit =
    functionDescriptions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}

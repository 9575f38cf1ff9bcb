package graft.expressions

import scala.collection.mutable
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Stable uniform neighbor sampling: keep the `k` values with the smallest
 * hash weights (role of reference expressions/KMinSampling.scala:21-165).
 *
 * A typed `Aggregator` whose buffer never exceeds `2k` entries — unlike
 * `slice(array_sort(collect_list(...)), 1, k)`, a 10^7-degree hub vertex
 * costs O(k) memory in the partial aggregate, not O(degree), and the
 * map-side combine ships only k pairs per key. Weight with
 * `xxhash64(src, dst, seed)` for deterministic, retry-safe samples.
 */
abstract class KMinSampling[T](k: Int)(implicit ord: Ordering[T])
    extends Aggregator[(Long, T), mutable.ArrayBuffer[(Long, T)], Seq[T]] {

  private implicit val pairOrd: Ordering[(Long, T)] = Ordering.Tuple2(Ordering.Long, ord)

  override def zero: mutable.ArrayBuffer[(Long, T)] = mutable.ArrayBuffer.empty

  private def trim(b: mutable.ArrayBuffer[(Long, T)]): mutable.ArrayBuffer[(Long, T)] = {
    val sorted = b.sorted.take(k)
    b.clear(); b ++= sorted
    b
  }

  override def reduce(b: mutable.ArrayBuffer[(Long, T)], a: (Long, T)): mutable.ArrayBuffer[(Long, T)] = {
    b += a; if (b.size > 2 * k) trim(b) else b
  }
  override def merge(x: mutable.ArrayBuffer[(Long, T)], y: mutable.ArrayBuffer[(Long, T)]): mutable.ArrayBuffer[(Long, T)] = {
    x ++= y; if (x.size > 2 * k) trim(x) else x
  }
  override def finish(b: mutable.ArrayBuffer[(Long, T)]): Seq[T] =
    b.sorted.take(k).map(_._2).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Long, T)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Long, T)]]
}

private class KMinSamplingLong(k: Int) extends KMinSampling[Long](k) {
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
private class KMinSamplingString(k: Int) extends KMinSampling[String](k) {
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

/** The k smallest DISTINCT Long values — the duplicate-insensitive KMV
 * buffer streaming aggregations need: a pre-aggregation `distinct()` is
 * a second stateful operator there, while this buffer dedups internally.
 * Eviction is safe: `trim` keeps the k smallest distinct values seen, and
 * any evicted value v has k distinct values below it, so v can never be
 * among the k smallest distinct values of the full input. O(k) state per
 * group however many rows arrive. */
private class KMinDistinctLong(k: Int)
    extends Aggregator[Long, mutable.ArrayBuffer[Long], Seq[Long]] {
  override def zero: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty
  private def trim(b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val kept = b.distinct.sorted.take(k)
    b.clear(); b ++= kept
    b
  }
  override def reduce(b: mutable.ArrayBuffer[Long], a: Long): mutable.ArrayBuffer[Long] = {
    b += a; if (b.size > 2 * k) trim(b) else b
  }
  override def merge(x: mutable.ArrayBuffer[Long], y: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    x ++= y; if (x.size > 2 * k) trim(x) else x
  }
  override def finish(b: mutable.ArrayBuffer[Long]): Seq[Long] =
    b.distinct.sorted.take(k).toSeq
  override def bufferEncoder: Encoder[mutable.ArrayBuffer[Long]] =
    Encoders.kryo[mutable.ArrayBuffer[Long]]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object KMinSampling {
  /** k-min sample of Long values: usage `sampleLong(k)(weightCol, valueCol)`. */
  def sampleLong(k: Int): (Column, Column) => Column = {
    val agg = udaf(new KMinSamplingLong(k))
    (w, v) => agg(w, v)
  }
  /** k-min sample of String values. */
  def sampleString(k: Int): (Column, Column) => Column = {
    val agg = udaf(new KMinSamplingString(k))
    (w, v) => agg(w, v)
  }
  /** k smallest DISTINCT Long values (KMV sketch buffer): usage
   * `distinctLong(k)(valueCol)`. Safe inside streaming aggregations —
   * one stateful operator, O(k) state per group. */
  def distinctLong(k: Int): Column => Column = {
    val agg = udaf(new KMinDistinctLong(k))
    v => agg(v)
  }
}

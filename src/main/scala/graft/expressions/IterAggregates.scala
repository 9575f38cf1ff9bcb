package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.GraftShims

/**
 * Bounded-buffer aggregates for the Pregel message-combine step.
 *
 * The reference's vendored GraphX combines messages with a user
 * `mergeMsg: (A, A) => A` inside its shuffle, so a 10^7-degree hub never
 * materializes its inbox (graphx/.../GraphOps.scala aggregateMessages).
 * The DataFrame translation `groupBy(id).agg(collect_list(msg))` loses
 * exactly that property: the ObjectHashAggregate buffer grows with the
 * hub's in-degree before the fold even starts — fine at sf0.1, an
 * executor OOM at 100 TB. These [[TypedImperativeAggregate]]s restore the
 * constant-size combine buffer while keeping map-side partial
 * aggregation (ObjectHashAggregateExec merges partials per shuffle
 * side), so the per-hub shuffle volume is O(partitions × buffer), not
 * O(degree).
 *
 *  - [[ArraySumAgg]]  — elementwise sum of equal-length `array<double>`
 *    messages (parallel personalized PageRank: buffer = one lane per
 *    source, replaces `aggregate(collect_list(...), zip_with(+))`).
 *  - [[MapMinAgg]]    — per-key minimum over `map<K, int>` messages
 *    (shortest paths: buffer bounded by the landmark count, not the
 *    in-degree).
 *  - [[HIndexAgg]]    — h-index of `int` messages via a value→count
 *    histogram (k-core: messages are clamped to the receiver's current
 *    core by the sender, so the histogram holds ≤ core+1 distinct keys).
 */
case class ArraySumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_array_sum expects array<double>, got $other")
  }

  // null until the first non-null input fixes the width
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    if (buffer == null) arr
    else {
      require(buffer.length == arr.length,
        s"graft_array_sum: mixed widths ${buffer.length} vs ${arr.length}")
      var i = 0
      while (i < arr.length) { buffer(i) += arr(i); i += 1 }
      buffer
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other == null) buffer
    else if (buffer == null) other
    else {
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 * buffer.length)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Double] = {
    if (storage.isEmpty) return null
    val out = new Array[Double](storage.length / 8)
    ByteBuffer.wrap(storage).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_array_sum"
}

/**
 * Per-key minimum over `map<K, V>` inputs (V int, long or double);
 * result is the key-union with the minimum value per key. Buffer size is
 * bounded by the number of distinct keys (landmarks), independent of how
 * many messages arrive. Key type is any atomic type; serialization
 * round-trips through an UnsafeProjection of the map type itself.
 */
case class MapMinAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Any]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(_, IntegerType | LongType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_map_min expects map<_, int|bigint|double>, got $other")
  }

  private lazy val keyType = child.dataType.asInstanceOf[MapType].keyType
  private lazy val valueType = child.dataType.asInstanceOf[MapType].valueType
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  private def less(a: Any, b: Any): Boolean = valueType match {
    case IntegerType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case LongType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case DoubleType => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Any] =
    mutable.HashMap.empty

  /** UTF8String values coming out of unsafe rows are pointers into reused
   * buffers — copy before retaining across rows. */
  private def own(k: Any): Any = k match {
    case s: UTF8String => s.copy()
    case other => other
  }

  private def mergeMapData(buffer: mutable.HashMap[Any, Any], m: MapData): Unit = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    var i = 0
    val n = m.numElements()
    while (i < n) {
      val k = own(keys.get(i, keyType))
      val v = vals.get(i, valueType)
      buffer.get(k) match {
        case Some(prev) => if (less(v, prev)) buffer.update(k, v)
        case None => buffer.update(k, v)
      }
      i += 1
    }
  }

  override def update(
      buffer: mutable.HashMap[Any, Any], input: InternalRow): mutable.HashMap[Any, Any] = {
    val v = child.eval(input)
    if (v != null) mergeMapData(buffer, v.asInstanceOf[MapData])
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[Any, Any],
      other: mutable.HashMap[Any, Any]): mutable.HashMap[Any, Any] = {
    other.foreach { case (k, v) =>
      buffer.get(k) match {
        case Some(prev) => if (less(v, prev)) buffer.update(k, v)
        case None => buffer.update(k, v)
      }
    }
    buffer
  }

  private def toMapData(buffer: mutable.HashMap[Any, Any]): MapData = {
    val ks = new Array[Any](buffer.size)
    val vs = new Array[Any](buffer.size)
    var i = 0
    buffer.foreach { case (k, v) => ks(i) = k; vs(i) = v; i += 1 }
    ArrayBasedMapData(ks, vs)
  }

  override def eval(buffer: mutable.HashMap[Any, Any]): Any = toMapData(buffer)

  override def serialize(buffer: mutable.HashMap[Any, Any]): Array[Byte] =
    serProj(InternalRow(toMapData(buffer))).getBytes

  override def deserialize(storage: Array[Byte]): mutable.HashMap[Any, Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(storage, storage.length)
    val out = mutable.HashMap.empty[Any, Any]
    mergeMapData(out, row.getMap(0))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_map_min"
}

/**
 * H-index of the `int` inputs: the largest h such that at least h inputs
 * are ≥ h. Aggregated as a value→count histogram, so the buffer holds one
 * entry per distinct value — in the k-core use the sender clamps each
 * message to the receiver's current core, bounding the histogram at
 * core+1 entries where `collect_list` held one entry per neighbor.
 */
case class HIndexAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Int, Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hindex expects int, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[Int, Int] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[Int, Int], input: InternalRow): mutable.HashMap[Int, Int] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Int]
      buffer.update(k, buffer.getOrElse(k, 0) + 1)
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[Int, Int],
      other: mutable.HashMap[Int, Int]): mutable.HashMap[Int, Int] = {
    other.foreach { case (k, c) => buffer.update(k, buffer.getOrElse(k, 0) + c) }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Int, Int]): Any = {
    if (buffer.isEmpty) return null
    // descending value order; h = max h with (count of values >= v) >= h
    val entries = buffer.toArray.sortBy(-_._1)
    var seen = 0
    var h = 0
    entries.foreach { case (v, c) =>
      seen += c
      h = math.max(h, math.min(v, seen))
    }
    h
  }

  override def serialize(buffer: mutable.HashMap[Int, Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size)
    buffer.foreach { case (k, c) => bb.putInt(k); bb.putInt(c) }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[Int, Int] = {
    val bb = ByteBuffer.wrap(storage)
    val out = mutable.HashMap.empty[Int, Int]
    while (bb.remaining() >= 8) out.update(bb.getInt(), bb.getInt())
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HIndexAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HIndexAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hindex"
}

/**
 * Scatter-add of (lane, value) pairs into a dense `double[dim]` buffer:
 * `buffer[lane] += value`. One aggregation replaces the two-stage
 * groupBy(id, lane) → sum → groupBy(id) → re-pack pipeline (one shuffle
 * instead of two), and the result is already the dense vector. Lanes
 * outside [0, dim) fail loudly.
 */
case class LaneSumAgg(
    lane: Expression,
    value: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = lane :: value :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (lane.dataType, value.dataType) match {
      case (IntegerType, DoubleType) if dim > 0 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lane_sum expects (int, double) with dim > 0, got $other (dim=$dim)")
    }

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val l = lane.eval(input)
    val v = value.eval(input)
    if (l == null || v == null) return buffer
    val b = if (buffer == null) new Array[Double](dim) else buffer
    val i = l.asInstanceOf[Int]
    require(i >= 0 && i < dim, s"graft_lane_sum: lane $i outside [0, $dim)")
    b(i) += v.asInstanceOf[Double]
    b
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other == null) buffer
    else if (buffer == null) other
    else {
      var i = 0
      while (i < dim) { buffer(i) += other(i); i += 1 }
      buffer
    }
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 * dim)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Double] = {
    if (storage.isEmpty) return null
    val out = new Array[Double](dim)
    ByteBuffer.wrap(storage).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LaneSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LaneSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lane = newChildren(0), value = newChildren(1))
  override def prettyName: String = "graft_lane_sum"
}

object IterAggregates {
  /** Elementwise sum of `array<double>` values (null when no input). */
  def arraySum(c: Column): Column =
    GraftShims.column(ArraySumAgg(GraftShims.expression(c)).toAggregateExpression())
  /** Key-union minimum over `map<K,int>` values. */
  def mapMin(c: Column): Column =
    GraftShims.column(MapMinAgg(GraftShims.expression(c)).toAggregateExpression())
  /** H-index of `int` values (null when no input). */
  def hIndex(c: Column): Column =
    GraftShims.column(HIndexAgg(GraftShims.expression(c)).toAggregateExpression())
  /** Scatter-add of (lane, value) into a dense double[dim]. */
  def laneSum(lane: Column, value: Column, dim: Int): Column =
    GraftShims.column(LaneSumAgg(GraftShims.expression(lane),
      GraftShims.expression(value), dim).toAggregateExpression())
}

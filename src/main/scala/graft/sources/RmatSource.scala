package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DataSource V2 batch source generating R-MAT graphs:
 * `spark.read.format("graft.rmat").option("scale", 6)
 * .option("numEdges", 200).load()` → (edge_id, src, dst), the exact
 * rows of [[GraphGenerators.rmat]] (same md5 draws keyed (seed, edge,
 * level), same 60-bit thresholds — the two paths are cross-checked in
 * the test suite and share one SQL oracle).
 *
 * Why a V2 source and not just the projection: a table-shaped generator
 * composes with everything that consumes tables — SQL (`CREATE TABLE …
 * USING graft.rmat`), Python clients, multi-source unions — and its
 * scan PLANS like a table: `planInputPartitions` splits the edge-id
 * range into `numPartitions` independent slices (each reader replays
 * only its own ids — generation scales out linearly with executors,
 * nothing is shuffled, no driver state), and column pruning is pushed
 * into the reader (`SupportsPushDownRequiredColumns`), so
 * `select(count(*))` never computes a single md5 draw.
 *
 * Options: scale (vertices = 2^scale), numEdges, seed, pA/pB/pC
 * quadrant probabilities, numPartitions (default
 * `spark.default.parallelism` at plan time is unavailable here, so 8).
 */
class RmatSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft.rmat"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RmatSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RmatTable(new CaseInsensitiveStringMap(properties))
}

object RmatSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("edge_id", LongType, nullable = false),
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** First 60 bits of md5("seed|edge|level") — bit-identical to Spark's
   * `conv(substring(md5(concat_ws("|", …)), 1, 15), 16, 10)` and to the
   * unrolled SQL oracle. */
  private[sources] def draw(seed: Int, edge: Long, level: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val bytes = d.digest(s"$seed|$edge|$level".getBytes("UTF-8"))
    // 15 hex chars = 60 bits = first 7.5 bytes
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >> 4)
  }
}

private[sources] class RmatTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val scale = options.getInt("scale", 10)
  private val numEdges = options.getLong("numEdges", 1000L)
  private val seed = options.getInt("seed", 42)
  private val pA = options.getDouble("pA", 0.57)
  private val pB = options.getDouble("pB", 0.19)
  private val pC = options.getDouble("pC", 0.19)
  private val numPartitions = options.getInt("numPartitions", 8)
  require(scale >= 1 && scale <= 40, s"scale out of [1, 40]: $scale")
  require(numEdges >= 1, s"numEdges must be >= 1: $numEdges")
  require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
  // validates the probabilities and fixes the thresholds once at plan time
  private val (ta, tab, tabc) = GraphGenerators.rmatThresholds(pA, pB, pC)

  override def name(): String =
    s"graft.rmat(scale=$scale, numEdges=$numEdges, seed=$seed)"
  override def schema(): StructType = RmatSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new RmatScanBuilder(scale, numEdges, seed, ta, tab, tabc, numPartitions)
}

private[sources] class RmatScanBuilder(scale: Int, numEdges: Long, seed: Int,
    ta: Long, tab: Long, tabc: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = RmatSource.SCHEMA
  // edge_id range narrowed by pushed predicates: [lo, hi)
  private var lo = 0L
  private var hi = numEdges
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** edge_id IS the row index, so range predicates on it prune the
   * GENERATION itself — `edge_id < 10` plans 10 rows, not numEdges
   * filtered down. Every filter is also returned as residual (Spark
   * re-applies it — pruning here is a performance contract only, so an
   * unhandled comparison shape can never produce wrong rows). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asLong(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }
    val consumed = filters.filter {
      case GreaterThan("edge_id", v) =>
        asLong(v).exists { x => lo = math.max(lo, x + 1); true }
      case GreaterThanOrEqual("edge_id", v) =>
        asLong(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("edge_id", v) =>
        asLong(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("edge_id", v) =>
        asLong(v).exists { x => hi = math.min(hi, x + 1); true }
      case EqualTo("edge_id", v) =>
        asLong(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x + 1); true }
      case _ => false
    }
    pushed = consumed
    filters // all residual: Spark re-applies, pruning stays safe
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    private val first = math.max(0L, lo)
    private val bound = math.max(first, math.min(hi, numEdges))
    override def readSchema(): StructType = required
    override def description(): String =
      s"graft.rmat scale=$scale numEdges=$numEdges range=[$first,$bound) " +
        s"cols=${required.fieldNames.mkString(",")}"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val total = bound - first
      if (total <= 0) return Array.empty
      val n = math.min(numPartitions.toLong, total).toInt
      (0 until n).map { i =>
        // contiguous slices of the (pruned) edge-id range; each reader
        // replays only its own ids — no coordination, no shuffle
        val start = first + total * i / n
        val end = first + total * (i + 1) / n
        RmatPartition(start, end): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new RmatReaderFactory(scale, seed, ta, tab, tabc, required.fieldNames)
  }
}

private[sources] case class RmatPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class RmatReaderFactory(scale: Int, seed: Int, ta: Long,
    tab: Long, tabc: Long, cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RmatPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      private val needBits = cols.exists(c => c == "src" || c == "dst")
      override def next(): Boolean = { id += 1; id < part.end }
      override def get(): InternalRow = {
        var src = 0L
        var dst = 0L
        if (needBits) { // pruned scans (edge_id only / count(*)) skip md5
          var l = 0
          while (l < scale) {
            val d = RmatSource.draw(seed, id, l)
            val bit = 1L << (scale - 1 - l)
            if (d >= tab) src |= bit
            if ((d >= ta && d < tab) || d >= tabc) dst |= bit
            l += 1
          }
        }
        InternalRow.fromSeq(cols.toSeq.map {
          case "edge_id" => id
          case "src" => src
          case "dst" => dst
        })
      }
      override def close(): Unit = ()
    }
  }
}

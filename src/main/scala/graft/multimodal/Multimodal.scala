package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata structs; decode / feature-extract
 * run per-partition over iterator batches (the Scala analog of batched
 * Python UDFs).
 *
 * The actual codec step is a STUB — media libraries are not available in
 * this environment — implemented as a deterministic fake derived from the
 * payload bytes, clearly marked below. Everything around it (schema,
 * partitioning, batch iteration, column pruning) is real and tested, so
 * swapping in a real decoder is a one-function change.
 */
object Multimodal {

  case class MediaMeta(format: String, n_bytes: Long, width: Int, height: Int)
  case class MediaFeature(id: Long, feature: Array[Float])

  /** Sniff cheap metadata from the payload without decoding: real format
   * dispatch on magic bytes, STUB dimensions (hash-derived — a real
   * implementation reads the codec header). */
  def attachMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val magic = substring(hex(col(binCol)), 1, 8)
    val format = when(magic.startsWith("FFD8"), "jpeg")
      .when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("52494646"), "riff")
      .otherwise("unknown")
    // STUB: width/height from a payload hash; a real decoder parses headers
    val fakeW = (pmod(xxhash64(col(binCol)), lit(1920L)) + 1).cast("int")
    val fakeH = (pmod(xxhash64(col(binCol), lit(1L)), lit(1080L)) + 1).cast("int")
    df.select(col(idCol), col(binCol),
      struct(format.as("format"), length(col(binCol)).cast("long").as("n_bytes"),
        fakeW.as("width"), fakeH.as("height")).as("media_meta"))
  }

  /** Sample every `everyK`-th fixed-size frame from a binary payload:
   * one output row per kept frame, (id, frame_idx, frame: binary). The
   * fixed-size split is the STUB standing in for real container
   * demuxing (a codec reads frame boundaries from the container); the
   * Spark side — per-row bounded explode, byte slicing, column pruning —
   * is real and fully codegen'd (no UDF). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameSize: Int, everyK: Int): DataFrame = {
    require(frameSize > 0 && everyK > 0, "frameSize and everyK must be positive")
    val nFrames = ceil(length(col(binCol)) / lit(frameSize.toDouble)).cast("long")
    val idxs = when(length(col(binCol)) > 0,
        filter(sequence(lit(0L), nFrames - 1), i => i % everyK === 0))
      .otherwise(array().cast("array<bigint>"))
    df.select(col(idCol), col(binCol), explode(idxs).as("frame_idx"))
      .select(col(idCol), col("frame_idx").cast("int").as("frame_idx"),
        col(binCol).substr((col("frame_idx") * frameSize + 1).cast("int"),
          lit(frameSize)).as("frame"))
  }

  /** Batched resize: (id, resized: binary) at `targetBytes` per payload.
   * The kernel is a STUB (truncate/cycle-pad — a real implementation
   * decodes, scales, re-encodes); the iterator-batched per-partition
   * shape mirrors how a real image library would be driven. */
  def resize(df: DataFrame, idCol: String, binCol: String,
      targetBytes: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real pipeline: initialize the codec once per partition here
        batch.map { case (id, bytes) =>
          val out = new Array[Byte](targetBytes)
          if (bytes.nonEmpty) {
            var i = 0
            while (i < targetBytes) { out(i) = bytes(i % bytes.length); i += 1 }
          }
          (id, out)
        }
      }.toDF(idCol, "resized")
  }

  /** Per-partition batched feature extraction over binary payloads:
   * iterator-in/iterator-out so a real model could be loaded once per
   * partition and fed batches. The featurizer itself is a STUB
   * (deterministic bytes→float projection standing in for a decoder +
   * encoder). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 16): Dataset[MediaFeature] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real pipeline: load model once per partition here
        batch.map { case (id, bytes) =>
          // STUB featurizer: stable per-payload pseudo-embedding
          val f = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            f(i % dim) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          MediaFeature(id, f)
        }
      }
  }
}

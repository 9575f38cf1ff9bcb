package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata structs; decode / feature-extract
 * run per-partition over iterator batches (the Scala analog of batched
 * Python UDFs).
 *
 * Header parsing (format sniff, PNG/JPEG/GIF dimensions) is REAL — plain
 * byte arithmetic over the binary column, no codec library. Only the
 * decode kernels (resize, frame demux, featurize) are STUBs —
 * deterministic fakes clearly marked below — because no media codec
 * exists in this environment; the Spark-side shape around them (schema,
 * partitioning, batch iteration, column pruning) is real and tested, so
 * swapping in a real decoder is a one-function change.
 */
object Multimodal {

  case class MediaMeta(format: String, n_bytes: Long,
      width: Option[Int], height: Option[Int])
  case class MediaFeature(id: Long, feature: Array[Float])

  /** Bytes of header hex-decoded per row for dimension parsing. JPEG APPn
   * segments (EXIF etc.) max out at 64 KiB each; 256 KiB of prefix covers
   * any realistic pre-SOF segment run while keeping per-row work bounded
   * on multi-GB video payloads. */
  private val HeaderPrefixBytes = 256 * 1024

  private val nullInt = lit(null).cast("int")

  /** Big-endian unsigned int of `nBytes` bytes at 0-based byte offset
   * `off` of hex string `h`. */
  private def beInt(h: Column, off: Column, nBytes: Int): Column =
    conv(h.substr(off * 2 + 1, lit(nBytes * 2)), 16, 10).cast("int")

  /** JPEG dimensions via a bounded marker-segment walk: skip APPn/COM/...
   * segments ([0xFF marker][2-byte length][payload]) until a SOFn frame
   * header (C0-CF except the non-frame C4/C8/CC), whose payload is
   * [precision:1][height:2][width:2]. The walk is an `aggregate` over a
   * fixed step budget with (pos, w, h) struct state — per-row, bounded,
   * codegen'd; no UDF. Returns a (w, h) struct with null fields when no
   * SOF is found within budget/prefix (truncated or exotic stream). */
  private def jpegDims(h: Column, prefLen: Column): Column = {
    val maxSegs = 32
    def byteAt(p: Column): Column = beInt(h, p, 1)
    val none = struct(lit(-1).as("pos"), nullInt.as("w"), nullInt.as("h"))
    val walked = aggregate(sequence(lit(1), lit(maxSegs)),
      struct(lit(2).as("pos"), nullInt.as("w"), nullInt.as("h")),
      (st, _) => {
        val pos = st.getField("pos")
        val code = byteAt(pos + 1)
        val isSof = code >= 0xC0 && code <= 0xCF &&
          code =!= lit(0xC4) && code =!= lit(0xC8) && code =!= lit(0xCC)
        when(pos < 0 || st.getField("w").isNotNull, st)
          // need marker+length+5 payload bytes readable; FF prefix required
          .when(pos + 9 > prefLen || byteAt(pos) =!= lit(0xFF), none)
          .when(isSof, struct(lit(-1).as("pos"),
            beInt(h, pos + 7, 2).as("w"), beInt(h, pos + 5, 2).as("h")))
          // entropy-coded data (SOS) or EOI before any SOF: give up
          .when(code === lit(0xDA) || code === lit(0xD9), none)
          .otherwise(struct((pos + 2 + beInt(h, pos + 2, 2)).as("pos"),
            nullInt.as("w"), nullInt.as("h")))
      })
    struct(walked.getField("w").as("w"), walked.getField("h").as("h"))
  }

  /** Sniff metadata from the payload without decoding: format dispatch on
   * magic bytes, REAL dimension parses from the codec headers — PNG IHDR
   * (big-endian u32 pair at bytes 16-23, tag checked), JPEG SOFn (marker
   * walk, see [[jpegDims]]), GIF logical screen (little-endian u16 pair at
   * bytes 6-9). Unknown/truncated/dimension-less formats (e.g. RIFF
   * audio) get null width/height. Pure byte arithmetic over a bounded
   * header prefix — per-row, codegen'd, scan-friendly. */
  def attachMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    // hex of a bounded prefix: dimension offsets are all near the head;
    // hexing a multi-GB video payload would double its memory for nothing
    val h = hex(substring(col(binCol), 1, HeaderPrefixBytes))
    val nb = length(col(binCol)).cast("long")
    val prefLen = least(nb, lit(HeaderPrefixBytes.toLong)).cast("int")
    val format = when(h.startsWith("FFD8"), "jpeg")
      .when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("52494646"), "riff")
      .otherwise("unknown")
    // PNG: 8-byte signature, 4-byte chunk length, "IHDR", w u32, h u32
    val pngOk = prefLen >= 24 && h.substr(lit(25), lit(8)) === "49484452"
    // GIF: w/h are LITTLE-endian u16 at bytes 6-9 — swap the byte pairs
    def le16(off: Int): Column = conv(concat(
      h.substr(lit(off * 2 + 3), lit(2)), h.substr(lit(off * 2 + 1), lit(2))),
      16, 10).cast("int")
    val jd = jpegDims(h, prefLen)
    val width = when(format === "png" && pngOk, beInt(h, lit(16), 4))
      .when(format === "jpeg", jd.getField("w"))
      .when(format === "gif" && prefLen >= 10, le16(6))
      .otherwise(nullInt)
    val height = when(format === "png" && pngOk, beInt(h, lit(20), 4))
      .when(format === "jpeg", jd.getField("h"))
      .when(format === "gif" && prefLen >= 10, le16(8))
      .otherwise(nullInt)
    df.select(col(idCol), col(binCol),
      struct(format.as("format"), nb.as("n_bytes"),
        width.as("width"), height.as("height")).as("media_meta"))
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

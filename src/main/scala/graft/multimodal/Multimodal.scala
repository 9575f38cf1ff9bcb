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
 * byte arithmetic over the binary column, no codec library. IMAGE decode,
 * resize and featurize are also REAL — the JDK's own `javax.imageio`
 * (PNG/JPEG/GIF/BMP readers, part of `java.desktop`, zero external
 * dependencies) behind the per-partition batch seam: [[decodeImageStats]]
 * (dimensions + exact per-channel pixel sums), [[resizeImage]]
 * (deterministic nearest-neighbor resample, PNG re-encode),
 * [[imageHistogram]] (integer-luma histogram feature). AUDIO decode is
 * REAL via `javax.sound.sampled` ([[decodeAudioStats]] — WAV/AIFF/AU,
 * exact 16-bit-PCM aggregates), and VIDEO container demux is REAL for
 * RIFF/AVI ([[demuxRiffFrames]] — plain chunk walking; MJPEG frame
 * payloads then decode for real through [[decodeImageStats]]). Only the
 * byte-level [[sampleFrames]]/[[resize]]/[[extractFeatures]] fallbacks
 * for formats with no JDK parser remain deterministic STUBs; the
 * Spark-side shape around them is real and tested.
 */
object Multimodal {

  case class MediaMeta(format: String, n_bytes: Long,
      width: Option[Int], height: Option[Int])
  case class MediaFeature(id: Long, feature: Array[Float])
  /** Decoded-image statistics: exact integer channel sums make lossless
   * formats (PNG/BMP/GIF) hash-oracleable with no rounding hazard;
   * `decoded=false` rows carry nulls (undecodable/corrupt payloads must
   * not kill a 100 TB job — they surface as a filterable flag). */
  case class ImageStats(id: Long, width: Option[Int], height: Option[Int],
      n_pixels: Option[Long], sum_r: Option[Long], sum_g: Option[Long],
      sum_b: Option[Long], decoded: Boolean)
  case class ImageHistogram(id: Long, histogram: Option[Array[Long]],
      decoded: Boolean)
  /** Decoded-audio statistics: format fields are real parses; the sample
   * aggregates (exact integer sum of |sample| and peak) are computed only
   * for 16-bit PCM — the overwhelmingly common WAV layout — and are null
   * for other encodings (meta stays real). */
  case class AudioStats(id: Long, sample_rate: Option[Int],
      channels: Option[Int], bits: Option[Int], n_frames: Option[Long],
      sum_abs: Option[Long], peak: Option[Int], decoded: Boolean)

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

  /** One demuxed media frame: `stream` is the two-char AVI stream id
   * ("00", "01", ...), `kind` the chunk-type suffix ("dc" compressed
   * video, "db" uncompressed video, "wb" audio). */
  case class RiffFrame(id: Long, stream: String, kind: String,
      frame_idx: Int, frame: Array[Byte])

  /** REAL video-container demux for RIFF/AVI payloads — plain chunk
   * walking, no codec: frames live in the `movi` LIST as `##dc`/`##db`/
   * `##wb` chunks ([fourcc][le-u32 size][payload][pad to even]), so
   * SPLITTING a video into per-frame rows needs only byte arithmetic.
   * Returns one row per frame chunk in container order (frame_idx
   * numbered per stream); non-RIFF/non-AVI or truncated payloads yield
   * zero rows rather than failing — at 100 TB a corrupt container is
   * data, not an exception. Decoding the frame PAYLOADS is then real for
   * MJPEG (each `##dc` chunk is a JPEG — feed to [[decodeImageStats]]);
   * other codecs have no JDK decoder. */
  def demuxRiffFrames(df: DataFrame, idCol: String,
      binCol: String): Dataset[RiffFrame] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        def le32(p: Int): Long =
          (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
            ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
        def fourcc(p: Int): String =
          new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val out = scala.collection.mutable.ArrayBuffer.empty[RiffFrame]
        if (bytes != null && bytes.length >= 12 &&
            fourcc(0) == "RIFF" && fourcc(8) == "AVI ") {
          val riffEnd = math.min(bytes.length.toLong, 8L + le32(4)).toInt
          val perStream = scala.collection.mutable.Map.empty[String, Int]
          // walk top-level chunks; recurse one level into LIST 'movi'
          var p = 12
          while (p + 8 <= riffEnd) {
            val cc = fourcc(p)
            val sz = le32(p + 4)
            val body = p + 8
            val end = math.min(riffEnd.toLong, body + sz).toInt
            if (cc == "LIST" && sz >= 4 && body + 4 <= riffEnd &&
                fourcc(body) == "movi") {
              var q = body + 4
              while (q + 8 <= end) {
                val fcc = fourcc(q)
                val fsz = le32(q + 4)
                val fbody = q + 8
                val fend = fbody + fsz // Long: an absurd size must not wrap
                val kind = fcc.substring(2)
                if (fend <= end &&
                    (kind == "dc" || kind == "db" || kind == "wb") &&
                    fcc.take(2).forall(_.isDigit)) {
                  val stream = fcc.take(2)
                  val idx = perStream.getOrElse(stream, 0)
                  perStream(stream) = idx + 1
                  out += RiffFrame(id, stream, kind, idx,
                    java.util.Arrays.copyOfRange(bytes, fbody, fend.toInt))
                }
                // chunks pad to even sizes; advance in Long — a crafted
                // le32 size with the top bit set must not wrap the Int
                // cursor (zero advance = infinite loop, negative = crash).
                // Corrupt sizes end the walk: truncated input yields what
                // was parsed so far, never a hung or killed task.
                val next = fbody.toLong + fsz + (fsz & 1L)
                q = if (next <= q || next > end) end else next.toInt
              }
            }
            val nextP = body.toLong + sz + (sz & 1L)
            p = if (nextP <= p || nextP > riffEnd) riffEnd else nextP.toInt
          }
        }
        out
      }
  }

  /** Sample every `everyK`-th fixed-size frame from a binary payload:
   * one output row per kept frame, (id, frame_idx, frame: binary). The
   * fixed-size split is the STUB fallback for containers this engine
   * cannot parse — for RIFF/AVI use the real [[demuxRiffFrames]]; the
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

  /** Decodes `bytes` with the JDK's ImageIO, None when the payload is not
   * a decodable image (wrong format, truncated, or empty) — per-row
   * failures are data, not exceptions, at 100 TB. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else try {
      // ImageIO.read returns null (not an exception) for unknown formats
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Average-hash (aHash) perceptual image fingerprint: REAL decode, then
   * a `grid`×`grid` block partition (block (by,bx) covers pixel columns
   * ⌊bx·w/grid⌋ until ⌊(bx+1)·w/grid⌋ — pure integer bounds, identical on
   * every platform) and one bit per block: is the block's mean luma
   * (r+g+b) above the image mean? The compare is the exact integer
   * cross-multiplication `blockLuma·totalPix > totalLuma·blockPix` — NO
   * float anywhere, so the fingerprint is bit-exact and an analytic SQL
   * oracle replays it. Returns (id, ahash: grid²-char '0'/'1' string,
   * decoded); undecodable payloads get a null hash.
   *
   * Semantics note (stated, not hidden): aHash is deliberately COARSE —
   * structurally similar images collide, which is the point for near-dup
   * sweeps of re-encoded/resized copies; follow with an exact-bytes or
   * embedding pass when false merges matter. Images narrower than the
   * grid leave the uncovered blocks at bit 0. */
  def imageAHash(df: DataFrame, idCol: String, binCol: String,
      grid: Int = 8): DataFrame = {
    require(grid >= 2 && grid <= 64, s"aHash grid out of [2,64]: $grid")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          readImage(bytes) match {
            case None => (id, null: String, false)
            case Some(img) =>
              val w = img.getWidth.toLong
              val h = img.getHeight.toLong
              val sums = Array.ofDim[Long](grid * grid)
              val npix = Array.ofDim[Long](grid * grid)
              var totalLuma = 0L
              var by = 0
              while (by < grid) {
                val y0 = (by * h / grid).toInt; val y1 = ((by + 1) * h / grid).toInt
                var bx = 0
                while (bx < grid) {
                  val x0 = (bx * w / grid).toInt; val x1 = ((bx + 1) * w / grid).toInt
                  var s = 0L
                  var y = y0
                  while (y < y1) {
                    var x = x0
                    while (x < x1) {
                      val rgb = img.getRGB(x, y)
                      s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                      x += 1
                    }
                    y += 1
                  }
                  val j = by * grid + bx
                  sums(j) = s
                  npix(j) = (x1 - x0).toLong * (y1 - y0)
                  totalLuma += s
                  bx += 1
                }
                by += 1
              }
              val totalPix = w * h
              // exact integer compare; BigInt only when the cross products
              // could pass Long range. The bound must include the block
              // size: sums(j) ≤ 765·blockPix and totalLuma ≤ 765·totalPix,
              // so both products are ≤ 765·totalPix·maxBlockPix — a fixed
              // totalPix cutoff under-guards small grids (grid=2 overflows
              // from ~2.2e8 pixels, below 2^28). Conservative double
              // compare against 9e18 (< Long.MaxValue) so rounding can only
              // send borderline images down the exact BigInt path.
              var maxBlockPix = 0L
              var jj = 0
              while (jj < grid * grid) {
                if (npix(jj) > maxBlockPix) maxBlockPix = npix(jj); jj += 1
              }
              val big = 765.0 * totalPix * maxBlockPix > 9.0e18
              val sb = new java.lang.StringBuilder(grid * grid)
              var j = 0
              while (j < grid * grid) {
                val bit =
                  if (big) BigInt(sums(j)) * totalPix > BigInt(totalLuma) * npix(j)
                  else sums(j) * totalPix > totalLuma * npix(j)
                sb.append(if (bit) '1' else '0')
                j += 1
              }
              (id, sb.toString, true)
          }
        }
      }.toDF(idCol, "ahash", "decoded")
  }

  /** Difference-hash (dHash) perceptual image fingerprint — the GRADIENT
   * sibling of [[imageAHash]]: REAL decode, a `grid`×`(grid+1)` block
   * partition (same pure-integer bounds: column bx covers
   * ⌊bx·w/(grid+1)⌋ until ⌊(bx+1)·w/(grid+1)⌋), and one bit per ADJACENT
   * column pair: is block (by,bx)'s mean luma above block (by,bx+1)'s?
   * The compare is the exact integer cross-multiplication
   * `luma(bx)·npix(bx+1) > luma(bx+1)·npix(bx)` — no float anywhere, so
   * the hash is bit-exact and an analytic SQL oracle replays it. dHash
   * is robust where aHash is weakest (global brightness/contrast shifts
   * cancel out of the adjacent-block compare). Returns (id, dhash:
   * grid²-char '0'/'1' string row-major by (by,bx), decoded); empty
   * blocks (images narrower than grid+1 columns) compare 0>0 = bit 0. */
  def imageDHash(df: DataFrame, idCol: String, binCol: String,
      grid: Int = 8): DataFrame = {
    require(grid >= 2 && grid <= 64, s"dHash grid out of [2,64]: $grid")
    import df.sparkSession.implicits._
    val cols = grid + 1
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          readImage(bytes) match {
            case None => (id, null: String, false)
            case Some(img) =>
              val w = img.getWidth.toLong
              val h = img.getHeight.toLong
              val sums = Array.ofDim[Long](grid * cols)
              val npix = Array.ofDim[Long](grid * cols)
              var by = 0
              while (by < grid) {
                val y0 = (by * h / grid).toInt; val y1 = ((by + 1) * h / grid).toInt
                var bx = 0
                while (bx < cols) {
                  val x0 = (bx * w / cols).toInt; val x1 = ((bx + 1) * w / cols).toInt
                  var s = 0L
                  var y = y0
                  while (y < y1) {
                    var x = x0
                    while (x < x1) {
                      val rgb = img.getRGB(x, y)
                      s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                      x += 1
                    }
                    y += 1
                  }
                  val j = by * cols + bx
                  sums(j) = s
                  npix(j) = (x1 - x0).toLong * (y1 - y0)
                  bx += 1
                }
                by += 1
              }
              // same overflow stance as aHash: sums ≤ 765·blockPix, so the
              // cross products are ≤ 765·maxBlockPix² — conservative double
              // compare routes borderline images to exact BigInt
              var maxBlockPix = 0L
              var jj = 0
              while (jj < grid * cols) {
                if (npix(jj) > maxBlockPix) maxBlockPix = npix(jj); jj += 1
              }
              val big = 765.0 * maxBlockPix * maxBlockPix > 9.0e18
              val sb = new java.lang.StringBuilder(grid * grid)
              by = 0
              while (by < grid) {
                var bx = 0
                while (bx < grid) {
                  val a = by * cols + bx
                  val b = a + 1
                  val bit =
                    if (big) BigInt(sums(a)) * npix(b) > BigInt(sums(b)) * npix(a)
                    else sums(a) * npix(b) > sums(b) * npix(a)
                  sb.append(if (bit) '1' else '0')
                  bx += 1
                }
                by += 1
              }
              (id, sb.toString, true)
          }
        }
      }.toDF(idCol, "dhash", "decoded")
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
   * no external codec library): (id, width, height, n_pixels, sum_r,
   * sum_g, sum_b, decoded). Channel sums are exact integers, so a
   * losslessly-encoded fixture is hash-oracleable by computing the sums
   * analytically — no rounding, no tolerance. Undecodable payloads get
   * `decoded=false` with null stats instead of failing the job. Runs
   * per-partition over iterator batches; per-row cost is O(pixels). */
  def decodeImageStats(df: DataFrame, idCol: String,
      binCol: String): Dataset[ImageStats] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          readImage(bytes) match {
            case None => ImageStats(id, None, None, None, None, None, None, decoded = false)
            case Some(img) =>
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              ImageStats(id, Some(w), Some(h), Some(w.toLong * h),
                Some(sr), Some(sg), Some(sb), decoded = true)
          }
        }
      }
  }

  /** REAL image resize: decode (ImageIO), deterministic nearest-neighbor
   * resample (`srcX = x*w/targetW` in integer arithmetic — identical on
   * every platform, unlike Graphics2D interpolation), re-encode as PNG
   * (lossless, so the output round-trips through [[decodeImageStats]]
   * exactly). Undecodable payloads yield a null `resized` column. */
  def resizeImage(df: DataFrame, idCol: String, binCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val out = readImage(bytes).map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val dst = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < targetH) {
              val sy = (y.toLong * h / targetH).toInt
              var x = 0
              while (x < targetW) {
                val sx = (x.toLong * w / targetW).toInt
                dst.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          }.orNull
          (id, out)
        }
      }.toDF(idCol, "resized")
  }

  /** REAL image featurizer: `bins`-bucket histogram of integer luma
   * (`(299r + 587g + 114b) / 1000` — BT.601 weights in exact integer
   * arithmetic, so the feature replays bit-for-bit anywhere). The
   * histogram is the classic cheap image descriptor for dedup/similarity
   * blocking; undecodable payloads get `decoded=false`. */
  def imageHistogram(df: DataFrame, idCol: String, binCol: String,
      bins: Int = 16): Dataset[ImageHistogram] = {
    require(bins > 0 && bins <= 256, s"bins must be in [1,256]: $bins")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          readImage(bytes) match {
            case None => ImageHistogram(id, None, decoded = false)
            case Some(img) =>
              val hist = new Array[Long](bins)
              val w = img.getWidth
              val h = img.getHeight
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                    114 * (rgb & 0xff)) / 1000
                  hist(luma * bins / 256) += 1
                  x += 1
                }
                y += 1
              }
              ImageHistogram(id, Some(hist), decoded = true)
          }
        }
      }
  }

  /** Batched BYTE-level resize: (id, resized: binary) at `targetBytes` per
   * payload. The kernel is a STUB (truncate/cycle-pad) standing in for
   * media types with no JDK codec (video/audio) — for images use the real
   * [[resizeImage]]; the iterator-batched per-partition shape mirrors how
   * a real library would be driven. */
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

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU —
   * no external codec library): (id, sample_rate, channels, bits,
   * n_frames, sum_abs, peak, decoded). For 16-bit PCM the amplitude
   * aggregates are exact integer sums, so a PCM fixture is
   * hash-oracleable by computing them analytically; other encodings keep
   * the real format fields with null aggregates. Undecodable payloads get
   * `decoded=false` instead of failing the job. */
  def decodeAudioStats(df: DataFrame, idCol: String,
      binCol: String): Dataset[AudioStats] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val none = AudioStats(id, None, None, None, None, None, None, decoded = false)
          if (bytes == null || bytes.length == 0) none
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val f = ais.getFormat
              val frames = ais.getFrameLength
              val is16 = f.getSampleSizeInBits == 16 &&
                (f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              val (sumAbs, peak) = if (!is16) (None, None) else {
                val data = ais.readAllBytes()
                val be = f.isBigEndian
                var s = 0L; var p = 0
                var i = 0
                while (i + 1 < data.length) {
                  val v = if (be) (data(i) << 8) | (data(i + 1) & 0xff)
                    else (data(i + 1) << 8) | (data(i) & 0xff)
                  val a = math.abs(v)
                  s += a
                  if (a > p) p = a
                  i += 2
                }
                (Some(s), Some(p))
              }
              AudioStats(id, Some(f.getSampleRate.toInt), Some(f.getChannels),
                Some(f.getSampleSizeInBits),
                if (frames >= 0) Some(frames) else None, sumAbs, peak,
                decoded = true)
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => none }
        }
      }
  }

  /** Per-partition batched feature extraction over arbitrary binary
   * payloads: iterator-in/iterator-out so a real model could be loaded
   * once per partition and fed batches. The featurizer itself is a STUB
   * (deterministic bytes→float projection) for payloads with no JDK
   * codec (video/audio); for images use the real [[imageHistogram]]. */
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

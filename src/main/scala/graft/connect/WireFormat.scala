package graft.connect

import java.nio.charset.StandardCharsets.UTF_8

/**
 * The decoded `graft.GraftRelation` Spark Connect extension message.
 *
 * Wire-compatible proto3 definition (client side; mirrors the surface of
 * reference connect/src/main/protobuf/graphframes.proto:13-44, collapsed to
 * one algorithm-name + JSON-params pair instead of a 24-way oneof):
 *
 * {{{
 * syntax = "proto3";
 * package graft;
 * message GraftRelation {
 *   string algorithm   = 1; // e.g. "page_rank", "connected_components"
 *   bytes  vertices    = 2; // serialized spark.connect.Relation (optional)
 *   bytes  edges       = 3; // serialized spark.connect.Relation
 *   string params_json = 4; // algorithm parameters as a JSON object
 * }
 * }}}
 *
 * An embedded message field and a `bytes` field holding that message's
 * serialization are identical on the wire, so a protoc-generated client
 * that declares `spark.connect.Relation vertices = 2` interoperates with
 * this hand-rolled decoder byte-for-byte.
 */
final case class GraftRelation(
    algorithm: String,
    vertices: Option[Array[Byte]],
    edges: Option[Array[Byte]],
    paramsJson: String)

/**
 * Minimal proto3 wire codec for [[GraftRelation]] — no protoc, no codegen,
 * no added dependency. Only the length-delimited wire type is used by the
 * message itself; unknown fields of every wire type are skipped so a newer
 * client can add fields without breaking an older server.
 */
object WireFormat {
  private val ALGORITHM = 1
  private val VERTICES = 2
  private val EDGES = 3
  private val PARAMS_JSON = 4

  def decode(bytes: Array[Byte]): GraftRelation = {
    var pos = 0
    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      var b = 0
      do {
        require(pos < bytes.length, "truncated varint")
        require(shift < 64, "malformed varint: more than 10 bytes")
        b = bytes(pos) & 0xff
        pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint()
      // compare as longs: a near-Int.MaxValue length would wrap `pos + len`
      // negative and sneak past an Int comparison into copyOfRange
      require(len >= 0 && pos.toLong + len <= bytes.length,
        "truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      out
    }
    var algorithm = ""
    var vertices: Option[Array[Byte]] = None
    var edges: Option[Array[Byte]] = None
    var params = ""
    while (pos < bytes.length) {
      val tag = readVarint()
      val field = (tag >>> 3).toInt
      (field, (tag & 7).toInt) match {
        case (ALGORITHM, 2) => algorithm = new String(readBytes(), UTF_8)
        case (VERTICES, 2) => vertices = Some(readBytes())
        case (EDGES, 2) => edges = Some(readBytes())
        case (PARAMS_JSON, 2) => params = new String(readBytes(), UTF_8)
        case (_, 2) => readBytes() // unknown length-delimited: skip
        case (_, 0) => readVarint() // unknown varint: skip
        case (_, 1) => pos += 8 // unknown fixed64: skip
        case (_, 5) => pos += 4 // unknown fixed32: skip
        case (f, w) =>
          throw new IllegalArgumentException(s"unsupported wire type $w for field $f")
      }
    }
    GraftRelation(algorithm, vertices, edges, params)
  }

  /** Inverse of [[decode]]; used by tests and by JVM-side clients. Fields
   * with proto3 default values (empty string/absent bytes) are omitted,
   * as proto3 serializers do. */
  def encode(msg: GraftRelation): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7f).toInt
        v >>>= 7
        out.write(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def writeField(field: Int, payload: Array[Byte]): Unit = {
      writeVarint((field.toLong << 3) | 2L)
      writeVarint(payload.length.toLong)
      out.write(payload)
    }
    if (msg.algorithm.nonEmpty) writeField(ALGORITHM, msg.algorithm.getBytes(UTF_8))
    msg.vertices.foreach(writeField(VERTICES, _))
    msg.edges.foreach(writeField(EDGES, _))
    if (msg.paramsJson.nonEmpty) writeField(PARAMS_JSON, msg.paramsJson.getBytes(UTF_8))
    out.toByteArray
  }
}

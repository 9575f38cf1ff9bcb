package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.connect.{GraftRelation, WireFormat}

/** Hand-rolled proto3 wire codec for the Connect extension message. */
class ConnectWireSpec extends AnyFunSuite {

  test("golden bytes: encoding matches the proto3 wire format exactly") {
    val msg = GraftRelation("pr", Some(Array[Byte](1, 2)), None, "{}")
    // field 1 (string "pr"):   tag 0x0A, len 2, 'p' 'r'
    // field 2 (bytes 01 02):   tag 0x12, len 2, 0x01 0x02
    // field 4 (string "{}"):   tag 0x22, len 2, '{' '}'
    val expected = Array[Byte](
      0x0A, 0x02, 'p', 'r',
      0x12, 0x02, 0x01, 0x02,
      0x22, 0x02, '{', '}')
    assert(WireFormat.encode(msg).toSeq == expected.toSeq)
  }

  test("roundtrip: decode(encode(msg)) == msg for every field combination") {
    val cases = Seq(
      GraftRelation("connected_components", Some(Array[Byte](9, 8, 7)),
        Some(Array[Byte](1)), """{"maxIter": 3}"""),
      GraftRelation("page_rank", None, Some(Array.fill[Byte](300)(42)),
        """{"resetProb": 0.15, "sourceId": "a"}"""),
      GraftRelation("", None, None, ""))
    cases.foreach { m =>
      val d = WireFormat.decode(WireFormat.encode(m))
      assert(d.algorithm == m.algorithm)
      assert(d.paramsJson == m.paramsJson)
      assert(d.vertices.map(_.toSeq) == m.vertices.map(_.toSeq))
      assert(d.edges.map(_.toSeq) == m.edges.map(_.toSeq))
    }
  }

  test("varint lengths beyond one byte decode correctly") {
    val big = GraftRelation("x", Some(Array.fill[Byte](1000)(7)), None, "")
    val d = WireFormat.decode(WireFormat.encode(big))
    assert(d.vertices.get.length == 1000 && d.vertices.get.forall(_ == 7))
  }

  test("unknown fields of every wire type are skipped, not fatal") {
    // field 9 varint 5; field 10 fixed64; field 11 fixed32; field 12 bytes
    val unknown = Array[Byte](
      (9 << 3) | 0, 0x05,
      (10 << 3) | 1, 1, 2, 3, 4, 5, 6, 7, 8,
      (11 << 3) | 5, 1, 2, 3, 4,
      (12 << 3) | 2, 0x01, 0x63)
    val known = WireFormat.encode(GraftRelation("deg", None, None, ""))
    val d = WireFormat.decode(unknown ++ known)
    assert(d.algorithm == "deg" && d.vertices.isEmpty && d.edges.isEmpty)
  }

  test("truncated input fails loudly") {
    val bytes = WireFormat.encode(GraftRelation("page_rank", None, None, "{}"))
    intercept[IllegalArgumentException] {
      WireFormat.decode(bytes.dropRight(1))
    }
  }

  // ------------------------------------------------------------------
  // Cross-language conformance vs the dependency-free Python codec
  // (python/graft/wire.py) shipped with the Connect client. Skipped (not
  // failed) when no python3 is on PATH.
  // ------------------------------------------------------------------

  private def python(args: String*): Option[Seq[String]] =
    try {
      val p = new ProcessBuilder(
        (Seq("python3", "python/graft/wire.py") ++ args): _*)
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toSeq
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: java.io.IOException => None }

  private def hexToBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def jsonStr(line: String, key: String): Option[String] = {
    // fixture lines are flat JSON objects of strings/nulls — json4s parse
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(line) \ key match {
      case JString(s) => Some(s)
      case _ => None
    }
  }

  test("python wire codec: python-encoded fixtures decode identically here") {
    python("--emit") match {
      case None => cancel("python3 not available")
      case Some(lines) =>
        assert(lines.nonEmpty)
        lines.foreach { line =>
          val anyBytes = hexToBytes(jsonStr(line, "any_hex").get)
          // the Any envelope: type_url field 1, value field 2 — decode by
          // the same skip-tolerant field walk the plugin uses
          val any = org.sparkproject.connect.protobuf.Any.parseFrom(anyBytes)
          assert(any.getTypeUrl == "type.googleapis.com/graft.GraftRelation")
          val m = WireFormat.decode(any.getValue.toByteArray)
          assert(m.algorithm == jsonStr(line, "algorithm").get)
          assert(m.paramsJson == jsonStr(line, "params_json").getOrElse(""))
          assert(m.vertices.map(_.map("%02x".format(_)).mkString) ==
            jsonStr(line, "vertices_hex"))
          assert(m.edges.map(_.map("%02x".format(_)).mkString) ==
            jsonStr(line, "edges_hex"))
        }
    }
  }

  test("python wire codec: scala-encoded message decodes identically there") {
    val msg = GraftRelation("shortest_paths", Some(Array[Byte](0, 1, -1)),
      Some(Array.fill[Byte](300)(61)), """{"landmarks":[0,5]}""")
    val any = org.sparkproject.connect.protobuf.Any.newBuilder()
      .setTypeUrl("type.googleapis.com/graft.GraftRelation")
      .setValue(org.sparkproject.connect.protobuf.ByteString.copyFrom(
        WireFormat.encode(msg)))
      .build()
    val hex = any.toByteArray.map("%02x".format(_)).mkString
    python("--decode", hex) match {
      case None => cancel("python3 not available")
      case Some(lines) =>
        val line = lines.last
        assert(jsonStr(line, "type_url").contains("type.googleapis.com/graft.GraftRelation"))
        assert(jsonStr(line, "algorithm").contains("shortest_paths"))
        assert(jsonStr(line, "params_json").contains("""{"landmarks":[0,5]}"""))
        assert(jsonStr(line, "vertices_hex").contains("0001ff"))
        assert(jsonStr(line, "edges_hex").contains("3d" * 300))
    }
  }
}

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
}

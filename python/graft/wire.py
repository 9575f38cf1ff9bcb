"""Hand-rolled proto3 wire codec for the `graft.GraftRelation` Spark
Connect extension message — zero dependencies (no protobuf, no
pyspark), byte-for-byte compatible with the server decoder in
src/main/scala/graft/connect/WireFormat.scala:

    syntax = "proto3";
    package graft;
    message GraftRelation {
      string algorithm   = 1;  // e.g. "page_rank", "connected_components"
      bytes  vertices    = 2;  // serialized spark.connect.Relation (optional)
      bytes  edges       = 3;  // serialized spark.connect.Relation
      string params_json = 4;  // algorithm parameters as a JSON object
    }

The message rides inside a `google.protobuf.Any` in
`spark.connect.Relation.extension`; `encode_any`/`decode_any` cover that
envelope (two length-delimited fields) so neither side needs protobuf
codegen.

Run as a script for the cross-language conformance harness used by the
Scala test suite:

    python3 wire.py --emit          # print fixture messages as JSON+hex
    python3 wire.py --decode HEX    # decode an Any-wrapped message, print JSON
    python3 wire.py --wrap ALGO PARAMS_JSON VERTICES_HEX EDGES_HEX
                                    # build the Any a client would send
                                    # ("-" = absent vertices), print hex
    python3 wire.py --selftest      # pure-python round-trip checks
"""

from __future__ import annotations

TYPE_NAME = "graft.GraftRelation"
TYPE_URL = "type.googleapis.com/" + TYPE_NAME

_ALGORITHM = 1
_VERTICES = 2
_EDGES = 3
_PARAMS_JSON = 4

_ANY_TYPE_URL = 1
_ANY_VALUE = 2


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("negative varint")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _field(field: int, payload: bytes) -> bytes:
    # wire type 2 (length-delimited) is the only one the message uses
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_graft_relation(
    algorithm: str,
    edges: bytes,
    vertices: bytes | None = None,
    params_json: str = "",
) -> bytes:
    """Serialize a GraftRelation. proto3 convention: fields at their
    default value (empty string / absent bytes) are omitted."""
    out = b""
    if algorithm:
        out += _field(_ALGORITHM, algorithm.encode("utf-8"))
    if vertices is not None:
        out += _field(_VERTICES, vertices)
    if edges is not None:
        out += _field(_EDGES, edges)
    if params_json:
        out += _field(_PARAMS_JSON, params_json.encode("utf-8"))
    return out


def encode_any(value: bytes, type_url: str = TYPE_URL) -> bytes:
    """Wrap message bytes in a `google.protobuf.Any` envelope."""
    return _field(_ANY_TYPE_URL, type_url.encode("utf-8")) + _field(_ANY_VALUE, value)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        if shift >= 64:
            raise ValueError("malformed varint: more than 10 bytes")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return out, pos


def _read_fields(data: bytes):
    """Yield (field_number, wire_type, payload) triples, skipping unknown
    wire types the same way the Scala decoder does."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("truncated length-delimited field")
            yield field, wt, data[pos : pos + ln]
            pos += ln
        elif wt == 0:
            v, pos = _read_varint(data, pos)
            yield field, wt, v
        elif wt == 1:
            if pos + 8 > len(data):
                raise ValueError("truncated fixed64 field")
            yield field, wt, data[pos : pos + 8]
            pos += 8
        elif wt == 5:
            if pos + 4 > len(data):
                raise ValueError("truncated fixed32 field")
            yield field, wt, data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} for field {field}")


def decode_graft_relation(data: bytes) -> dict:
    """Inverse of encode_graft_relation: dict with keys algorithm,
    vertices (bytes|None), edges (bytes|None), params_json. Unknown
    fields are skipped (forward compatibility)."""
    msg = {"algorithm": "", "vertices": None, "edges": None, "params_json": ""}
    for field, wt, payload in _read_fields(data):
        if wt != 2:
            continue  # unknown non-length-delimited field: skipped
        if field == _ALGORITHM:
            msg["algorithm"] = payload.decode("utf-8")
        elif field == _VERTICES:
            msg["vertices"] = payload
        elif field == _EDGES:
            msg["edges"] = payload
        elif field == _PARAMS_JSON:
            msg["params_json"] = payload.decode("utf-8")
    return msg


def decode_any(data: bytes) -> tuple[str, bytes]:
    type_url, value = "", b""
    for field, wt, payload in _read_fields(data):
        if wt != 2:
            continue
        if field == _ANY_TYPE_URL:
            type_url = payload.decode("utf-8")
        elif field == _ANY_VALUE:
            value = payload
    return type_url, value


# ---------------------------------------------------------------------
# Cross-language conformance harness (consumed by ConnectWireSpec)
# ---------------------------------------------------------------------

_FIXTURES = [
    dict(algorithm="page_rank", vertices=b"\x01\x02\xffV", edges=b"\x00E",
         params_json='{"maxIter":10,"resetProb":0.15}'),
    dict(algorithm="connected_components", vertices=None, edges=b"",
         params_json=""),
    dict(algorithm="find", vertices=bytes(range(256)), edges=b"\x7f" * 300,
         params_json='{"pattern":"(a)-[e]->(b)"}'),
]


def _emit() -> None:
    import json

    for f in _FIXTURES:
        wire = encode_graft_relation(
            f["algorithm"], f["edges"], f["vertices"], f["params_json"])
        print(json.dumps({
            "algorithm": f["algorithm"],
            "vertices_hex": None if f["vertices"] is None else f["vertices"].hex(),
            "edges_hex": None if f["edges"] is None else f["edges"].hex(),
            "params_json": f["params_json"],
            "any_hex": encode_any(wire).hex(),
        }))


def _decode_cli(hex_str: str) -> None:
    import json

    type_url, value = decode_any(bytes.fromhex(hex_str))
    msg = decode_graft_relation(value)
    print(json.dumps({
        "type_url": type_url,
        "algorithm": msg["algorithm"],
        "vertices_hex": None if msg["vertices"] is None else msg["vertices"].hex(),
        "edges_hex": None if msg["edges"] is None else msg["edges"].hex(),
        "params_json": msg["params_json"],
    }))


def _selftest() -> None:
    for f in _FIXTURES:
        wire = encode_graft_relation(
            f["algorithm"], f["edges"], f["vertices"], f["params_json"])
        url, value = decode_any(encode_any(wire))
        assert url == TYPE_URL, url
        m = decode_graft_relation(value)
        assert m["algorithm"] == f["algorithm"]
        assert m["vertices"] == f["vertices"]
        # absent bytes decode as None; present-but-empty stays absent on
        # the wire only when None was passed — empty b"" IS serialized
        assert m["edges"] == f["edges"]
        assert m["params_json"] == f["params_json"]
    # unknown-field skip: prepend a varint field 9 and a fixed32 field 10
    extra = _varint((9 << 3) | 0) + _varint(12345) + _varint((10 << 3) | 5) + b"\x01\x02\x03\x04"
    m = decode_graft_relation(extra + encode_graft_relation("bfs", b"E"))
    assert m["algorithm"] == "bfs" and m["edges"] == b"E"
    print("wire selftest ok")


if __name__ == "__main__":
    import sys

    if "--emit" in sys.argv:
        _emit()
    elif "--decode" in sys.argv:
        _decode_cli(sys.argv[sys.argv.index("--decode") + 1])
    elif "--wrap" in sys.argv:
        i = sys.argv.index("--wrap")
        algo, params, vhex, ehex = sys.argv[i + 1 : i + 5]
        wire = encode_graft_relation(
            algo,
            bytes.fromhex(ehex) if ehex != "-" else None,
            bytes.fromhex(vhex) if vhex != "-" else None,
            params if params != "-" else "",
        )
        print(encode_any(wire).hex())
    else:
        _selftest()

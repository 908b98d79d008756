"""Protocol Buffers WIRE FORMAT codec (EXT source) — pure Python.

Event logs, ML feature stores, and RPC dumps ship as protobuf far more
often than Avro; ingesting them at 100 TB needs exactly two things this
module provides with zero libraries:

* :func:`encode_message` / :func:`decode_message` — the proto3 wire
  format (https://protobuf.dev/programming-guides/encoding/): base-128
  varints, ZigZag for sint fields, length-delimited strings/bytes/
  sub-messages, and PACKED repeated scalars.  Schema-less decode returns
  ``{field_number: [values]}`` with wire-type tags — the shape a schema
  registry then names (same two-phase design as real protobuf dynamic
  parsing).
* :func:`decode_events` — Arrow-batched ``mapInPandas`` ingestion of a
  binary payload column into typed columns, the same blob-per-row scale
  shape as the WARC/Avro/WebDataset sources (embarrassingly parallel,
  no shuffle).

Unknown wire types raise ``ValueError`` (data rejection, not task
crashes); groups (wire types 3/4, deprecated in proto3) are rejected
explicitly.
"""

from __future__ import annotations


def write_varint(n: int) -> bytes:
    """Base-128 little-endian varint (non-negative)."""
    if n < 0:
        raise ValueError("varint must be non-negative (use zigzag for sint)")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one varint at ``pos``; returns (value, next_pos)."""
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("varint truncated")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint exceeds 64 bits")


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return write_varint((field << 3) | wire)


def encode_message(fields: dict) -> bytes:
    """Encode ``{field_number: value}`` to proto3 wire bytes.

    Value dispatch: ``int`` -> varint (wire 0); ``("sint", int)`` ->
    ZigZag varint; ``str``/``bytes`` -> length-delimited (wire 2);
    ``list[int]`` -> PACKED varints (wire 2); ``dict`` -> nested
    message (wire 2).  Fields emit in ascending field-number order, so
    encoding is byte-deterministic."""
    out = bytearray()
    for field in sorted(fields):
        v = fields[field]
        if isinstance(v, tuple) and v[0] == "sint":
            out += _tag(field, 0) + write_varint(zigzag_encode(int(v[1])))
        elif isinstance(v, bool):
            raise ValueError("encode bools as int 0/1 explicitly")
        elif isinstance(v, int):
            out += _tag(field, 0) + write_varint(v)
        elif isinstance(v, str):
            raw = v.encode("utf-8")
            out += _tag(field, 2) + write_varint(len(raw)) + raw
        elif isinstance(v, bytes):
            out += _tag(field, 2) + write_varint(len(v)) + v
        elif isinstance(v, list):
            packed = b"".join(write_varint(int(x)) for x in v)
            out += _tag(field, 2) + write_varint(len(packed)) + packed
        elif isinstance(v, dict):
            raw = encode_message(v)
            out += _tag(field, 2) + write_varint(len(raw)) + raw
        else:
            raise ValueError(f"unsupported field value type: {type(v)}")
    return bytes(out)


def decode_message(buf: bytes) -> dict:
    """Schema-less wire decode: ``{field: [(wire_type, raw_value)]}``.

    Wire 0 values are ints (caller applies zigzag if the schema says
    sint); wire 2 values are the raw bytes (caller interprets as string,
    packed list, or nested message); wire 1/5 are 8/4-byte blobs."""
    fields: dict = {}
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 0:
            raise ValueError("field number 0 is reserved")
        if wire == 0:
            v, pos = read_varint(buf, pos)
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("length-delimited field truncated")
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == 1 or wire == 5:
            ln = 8 if wire == 1 else 4
            if pos + ln > len(buf):
                raise ValueError("fixed field truncated")
            v = buf[pos:pos + ln]
            pos += ln
        elif wire in (3, 4):
            raise ValueError("proto2 groups are not supported")
        else:
            raise ValueError(f"unknown wire type {wire}")
        fields.setdefault(field, []).append((wire, v))
    return fields


def decode_packed_varints(raw: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(raw):
        v, pos = read_varint(raw, pos)
        out.append(v)
    return out


def decode_events(df, binary_col: str = "payload", id_col: str = "doc_id"):
    """Arrow-batched ingestion of the q318 Event message shape:
    field 1 = id (varint), 2 = name (string), 3 = delta (sint zigzag),
    4 = packed int32 list, 5 = nested {1: w, 2: h}.  Returns typed
    columns; malformed payloads raise (reject, don't crash)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = {
                "doc_id": [], "msg_id": [], "name": [], "delta": [],
                "vals_sum": [], "w": [], "h": [],
            }
            for did, payload in zip(pdf[id_col], pdf[binary_col]):
                m = decode_message(bytes(payload))
                nested = decode_message(m[5][0][1])
                rows["doc_id"].append(int(did))
                rows["msg_id"].append(int(m[1][0][1]))
                rows["name"].append(m[2][0][1].decode("utf-8"))
                rows["delta"].append(zigzag_decode(int(m[3][0][1])))
                rows["vals_sum"].append(
                    sum(decode_packed_varints(m[4][0][1]))
                )
                rows["w"].append(int(nested[1][0][1]))
                rows["h"].append(int(nested[2][0][1]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        gen,
        "doc_id long, msg_id long, name string, delta long,"
        " vals_sum long, w int, h int",
    )

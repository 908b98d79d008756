"""Protocol-Buffers wire-format codec conformance (published spec
vectors from protobuf.dev/programming-guides/encoding)."""

from __future__ import annotations

import pytest

from pr2_transformation_spark.sources import protowire as pw


def test_varint_spec_vectors():
    assert pw.write_varint(1) == b"\x01"
    assert pw.write_varint(150) == b"\x96\x01"
    assert pw.write_varint(300) == b"\xac\x02"
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        assert pw.read_varint(pw.write_varint(n), 0) == (n, len(pw.write_varint(n)))
    with pytest.raises(ValueError):
        pw.read_varint(b"\x80", 0)  # truncated continuation
    with pytest.raises(ValueError):
        pw.write_varint(-1)


def test_zigzag_spec_vectors():
    table = [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294),
             (-2147483648, 4294967295)]
    for orig, enc in table:
        assert pw.zigzag_encode(orig) == enc
        assert pw.zigzag_decode(enc) == orig


def test_message_roundtrip_and_field1_150_vector():
    msg = {1: 150, 2: "testing", 3: ("sint", -73),
           4: [3, 270, 86942], 5: {1: 9, 2: 7}}
    enc = pw.encode_message(msg)
    assert enc[:3] == b"\x08\x96\x01"  # the canonical docs example
    dec = pw.decode_message(enc)
    assert dec[1][0][1] == 150
    assert dec[2][0][1] == b"testing"
    assert pw.zigzag_decode(dec[3][0][1]) == -73
    assert pw.decode_packed_varints(dec[4][0][1]) == [3, 270, 86942]
    nested = pw.decode_message(dec[5][0][1])
    assert nested[1][0][1] == 9 and nested[2][0][1] == 7


def test_decode_rejects_malformed():
    for bad in [b"\x08", b"\x12\x05ab", b"\x0b", b"\x07",
                b"\x00\x01",  # field number 0
                b"\x09" + b"\x00" * 4]:  # fixed64 truncated
        with pytest.raises(ValueError):
            pw.decode_message(bad)


def test_fixed_width_wires_pass_through():
    # wire 5 (fixed32) and wire 1 (fixed64) round-trip as raw blobs
    buf = b"\x0d" + b"\x01\x02\x03\x04" + b"\x11" + b"\x00" * 8
    dec = pw.decode_message(buf)
    assert dec[1][0] == (5, b"\x01\x02\x03\x04")
    assert dec[2][0] == (1, b"\x00" * 8)


def test_spark_ingestion_path(spark):
    import pandas as pd

    payload = pw.encode_message(
        {1: 42, 2: "hello", 3: ("sint", -5), 4: [1, 2, 3], 5: {1: 3, 2: 4}}
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "payload": [payload]})
    )
    row = pw.decode_events(df).first()
    assert (row["msg_id"], row["name"], row["delta"]) == (42, "hello", -5)
    assert (row["vals_sum"], row["w"], row["h"]) == (6, 3, 4)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    msg_id=st.integers(0, 2**62),
    name=st.text(max_size=40),
    delta=st.integers(-(2**62), 2**62),
    vals=st.lists(st.integers(0, 2**40), max_size=20),
    w=st.integers(0, 2**30),
    h=st.integers(0, 2**30),
)
def test_protowire_roundtrip_property(msg_id, name, delta, vals, w, h):
    """Any Event-shaped message round-trips: varint widths, zigzag
    sign handling, packed lists (incl. empty), nested messages, and
    arbitrary unicode strings."""
    msg = {1: msg_id, 2: name, 3: ("sint", delta), 4: vals, 5: {1: w, 2: h}}
    dec = pw.decode_message(pw.encode_message(msg))
    assert dec[1][0][1] == msg_id
    assert dec[2][0][1].decode("utf-8") == name
    assert pw.zigzag_decode(dec[3][0][1]) == delta
    assert pw.decode_packed_varints(dec[4][0][1]) == vals
    nested = pw.decode_message(dec[5][0][1])
    assert nested[1][0][1] == w and nested[2][0][1] == h


@settings(max_examples=150, deadline=None)
@given(junk=st.binary(max_size=60))
def test_protowire_decode_rejects_or_parses_junk(junk):
    """Arbitrary bytes either decode (wire format is dense — many byte
    strings are valid) or raise ValueError; never an uncontrolled
    crash."""
    try:
        pw.decode_message(junk)
    except ValueError:
        pass

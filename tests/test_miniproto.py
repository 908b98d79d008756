"""From-scratch protobuf runtime (vendor/miniproto): wire conformance
against the REAL generated StateMessage_pb2 shapes, descriptor
parsing, and the activation contract."""

from __future__ import annotations

import sys

import pytest

from pr2_transformation_spark.streaming.protoshim import (
    _SHIM_ROOT,
    ensure_protobuf,
    have_real_protobuf,
)


@pytest.fixture(scope="module")
def sm():
    if not have_real_protobuf() and _SHIM_ROOT not in sys.path:
        sys.path.insert(0, _SHIM_ROOT)
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_request_shapes_roundtrip(sm):
    req = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)))
    raw = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(raw)
    assert back.statefulProcessorCall.setHandleState.state \
        == sm.DATA_PROCESSED
    # oneof presence: only the set branch serializes
    assert b"ValueState" not in raw
    scc = sm.StateCallCommand()
    scc.stateName = "stats"
    scc.schema = "n long, s double"
    m = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall(
        getValueState=scc))
    b2 = sm.StateRequest()
    b2.ParseFromString(m.SerializeToString())
    got = b2.statefulProcessorCall.getValueState
    assert (got.stateName, got.schema) == ("stats", "n long, s double")


def test_scalar_types_and_defaults(sm):
    r = sm.StateResponseWithListGet(
        statusCode=3, errorMessage="boom", value=[b"a", b"", b"xyz"],
        requireNextFetch=True)
    back = sm.StateResponseWithListGet()
    back.ParseFromString(r.SerializeToString())
    assert back.statusCode == 3 and back.errorMessage == "boom"
    assert list(back.value) == [b"a", b"", b"xyz"]
    assert back.requireNextFetch is True
    # unset fields read proto3 defaults
    empty = sm.StateResponse()
    empty.ParseFromString(b"")
    assert (empty.statusCode, empty.errorMessage, empty.value) \
        == (0, "", b"")
    # negative int64 (two's-complement varint)
    t = sm.RegisterTimer(expiryTimestampMs=-123456789)
    back2 = sm.RegisterTimer()
    back2.ParseFromString(t.SerializeToString())
    assert back2.expiryTimestampMs == -123456789


def test_repeated_messages(sm):
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[sm.TimerInfo(key=b"u1", timestampMs=1000),
               sm.TimerInfo(key=b"u2", timestampMs=2000)],
        requireNextFetch=False)
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(x.key, x.timestampMs) for x in back.timer] == [
        (b"u1", 1000), (b"u2", 2000)]
    kv = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=b"k", value=b"v")])
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(kv.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [(b"k", b"v")]


def test_wire_bytes_canonical_shape(sm):
    """Hand-check one frame against the protobuf encoding spec: field 1
    varint, field 2 length-delimited UTF-8, field 3 bytes."""
    r = sm.StateResponse(statusCode=5, errorMessage="e", value=b"\x01")
    raw = r.SerializeToString()
    assert raw == b"\x08\x05\x12\x01e\x1a\x01\x01"
    # unknown fields are skipped, known ones still land
    with_unknown = b"\xaa\x06\x02zz" + raw   # field 101 LD + our frame
    back = sm.StateResponse()
    back.ParseFromString(with_unknown)
    assert back.statusCode == 5 and back.value == b"\x01"


def test_activation_contract(spark):
    mode = ensure_protobuf(spark)
    assert mode in ("real", "shim")
    import google.protobuf  # noqa: F401
    if mode == "shim":
        import google.protobuf.descriptor as d
        assert _SHIM_ROOT in d.__file__

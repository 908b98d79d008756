"""Roaring bitmaps (sources/roaring.py): RoaringFormatSpec portable
serialization, byte-level spec vectors + set-semantics properties."""

from __future__ import annotations

import random
import struct

import pytest

from pr2_transformation_spark.sources.roaring import Roaring32, Roaring64


def test_spec_vector_bytes():
    # two containers: key 0 holds {0, 2, 1000}, key 1 holds {5} —
    # every byte below is hand-derived from the RoaringFormatSpec
    r = Roaring32()
    for v in (0, 2, 1000, (1 << 16) + 5):
        r.add(v)
    expected = (
        struct.pack("<II", 12346, 2)           # cookie, container count
        + struct.pack("<HH", 0, 2)             # key 0, cardinality-1
        + struct.pack("<HH", 1, 0)             # key 1, cardinality-1
        + struct.pack("<II", 24, 30)           # offset table
        + struct.pack("<HHH", 0, 2, 1000)      # array container 0
        + struct.pack("<H", 5)                 # array container 1
    )
    assert r.to_bytes() == expected
    back, end = Roaring32.from_bytes(expected)
    assert end == len(expected)
    assert list(back.values()) == [0, 2, 1000, (1 << 16) + 5]


def test_array_to_bitmap_promotion_and_membership():
    r = Roaring32()
    vals = set(range(0, 10000, 2))  # 5000 > 4096 -> bitmap container
    for v in vals:
        r.add(v)
    assert isinstance(r.containers[0], bytearray)
    assert len(r) == 5000
    buf = r.to_bytes()
    back, _ = Roaring32.from_bytes(buf)
    assert set(back.values()) == vals
    assert 4096 in back and 4097 not in back


def test_run_container_read():
    # hand-crafted SERIAL_COOKIE stream: 1 container flagged as runs,
    # runs [10,59] and [100,149]
    buf = (struct.pack("<I", ((1 - 1) << 16) | 12347)
           + bytes([0x01])
           + struct.pack("<HH", 0, 99)
           + struct.pack("<H", 2)
           + struct.pack("<HHHH", 10, 49, 100, 49))
    back, end = Roaring32.from_bytes(buf)
    assert end == len(buf)
    assert set(back.values()) == set(range(10, 60)) | set(range(100, 150))


def test_run_container_with_offset_table():
    # >= 4 containers under cookie 12347 -> the offset table is present
    n = 4
    cookie = struct.pack("<I", ((n - 1) << 16) | 12347) + bytes([0x0F])
    hdr = b"".join(struct.pack("<HH", k, 9) for k in range(n))
    offsets_pos = len(cookie) + len(hdr) + 4 * n
    bodies, offs = b"", b""
    for k in range(n):
        offs += struct.pack("<I", offsets_pos + len(bodies))
        bodies += struct.pack("<HHH", 1, k, 9)  # one run [k, k+9]
    back, end = Roaring32.from_bytes(cookie + hdr + offs + bodies)
    assert end == len(cookie + hdr + offs + bodies)
    assert set(back.values()) == {
        (k << 16) | v for k in range(4) for v in range(k, k + 10)}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_property_roundtrip_vs_set(seed):
    rnd = random.Random(seed)
    vals = set(rnd.randrange(1 << 20) for _ in range(rnd.choice([0, 5, 8000])))
    if seed == 3:
        vals |= set(range(123456, 123456 + 5000))  # dense stretch
    r = Roaring32()
    for v in vals:
        r.add(v)
    buf = r.to_bytes()
    back, end = Roaring32.from_bytes(buf)
    assert end == len(buf)
    assert set(back.values()) == vals and len(back) == len(vals)
    for _ in range(200):
        p = rnd.randrange(1 << 20)
        assert (p in back) == (p in vals)


def test_roaring64_buckets_and_bounds():
    vals = {0, 1, (5 << 32) + 7, (5 << 32) + 8, (1 << 40) + 123}
    r = Roaring64.from_values(vals)
    buf = r.to_bytes()
    back, end = Roaring64.from_bytes(buf)
    assert end == len(buf) and set(back.values()) == vals
    assert (5 << 32) + 7 in back and (5 << 32) + 9 not in back
    with pytest.raises(ValueError):
        r.add(1 << 64)
    with pytest.raises(ValueError):
        Roaring32().add(1 << 32)
    with pytest.raises(ValueError):
        Roaring32.from_bytes(struct.pack("<I", 9999))

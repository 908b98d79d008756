"""xxHash64 from scratch — the hash zstd checksums and Spark's
``xxhash64()`` both speak.

Two consumers: (1) `sources/zstd.py` verifies frame content checksums
(XXH64 of the decoded payload, seed 0, low 32 bits) instead of
skipping them; (2) pure-python paths that want SPARK-COMPATIBLE
hashing without a JVM round trip — Spark's ``xxhash64`` expression is
XXH64 with seed 42 over the raw bytes for binary/string columns, and
the conformance test pins this implementation against the JVM one on
random inputs.

Spec: github.com/Cyan4973/xxHash xxhash_spec.md (XXH64).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — unsigned 64-bit.

    The stripe loop is hand-inlined (no _round/_rotl calls) and reads
    all lanes with one ``struct.unpack_from`` — this hash sits on the
    CDC chunker's and the zstd checksum verifier's per-chunk path, and
    the call-per-lane form was 1.8x slower (r10, guide §1.2).  Output
    is pinned against the JVM's xxhash64 by the conformance tests."""
    import struct

    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        nstripes = n // 32
        lanes = struct.unpack_from("<%dQ" % (nstripes * 4), data)
        i = 0
        for _ in range(nstripes):
            x = (a1 + lanes[i] * _P2) & _M
            x = ((x << 31) | (x >> 33)) & _M
            a1 = (x * _P1) & _M
            x = (a2 + lanes[i + 1] * _P2) & _M
            x = ((x << 31) | (x >> 33)) & _M
            a2 = (x * _P1) & _M
            x = (a3 + lanes[i + 2] * _P2) & _M
            x = ((x << 31) | (x >> 33)) & _M
            a3 = (x * _P1) & _M
            x = (a4 + lanes[i + 3] * _P2) & _M
            x = ((x << 31) | (x >> 33)) & _M
            a4 = (x * _P1) & _M
            i += 4
        pos = nstripes * 32
        h = (((a1 << 1) | (a1 >> 63)) + ((a2 << 7) | (a2 >> 57))
             + ((a3 << 12) | (a3 >> 52))
             + ((a4 << 18) | (a4 >> 46))) & _M
        for acc in (a1, a2, a3, a4):
            h = _merge(h, acc)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while pos + 8 <= n:
        h ^= _round(0, int.from_bytes(data[pos:pos + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos:pos + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


_P32_1 = 0x9E3779B1
_P32_2 = 0x85EBCA77
_P32_3 = 0xC2B2AE3D
_P32_4 = 0x27D4EB2F
_P32_5 = 0x165667B1
_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _round32(acc: int, lane: int) -> int:
    return (_rotl32((acc + lane * _P32_2) & _M32, 13) * _P32_1) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 of ``data`` — unsigned 32-bit (LZ4 frame checksums)."""
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _P32_1 + _P32_2) & _M32
        a2 = (seed + _P32_2) & _M32
        a3 = seed & _M32
        a4 = (seed - _P32_1) & _M32
        while pos + 16 <= n:
            a1 = _round32(a1, int.from_bytes(data[pos:pos + 4], "little"))
            a2 = _round32(a2, int.from_bytes(data[pos + 4:pos + 8], "little"))
            a3 = _round32(a3, int.from_bytes(data[pos + 8:pos + 12], "little"))
            a4 = _round32(a4, int.from_bytes(data[pos + 12:pos + 16], "little"))
            pos += 16
        h = (_rotl32(a1, 1) + _rotl32(a2, 7)
             + _rotl32(a3, 12) + _rotl32(a4, 18)) & _M32
    else:
        h = (seed + _P32_5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        h = (h + int.from_bytes(data[pos:pos + 4], "little") * _P32_3) & _M32
        h = (_rotl32(h, 17) * _P32_4) & _M32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P32_5) & _M32
        h = (_rotl32(h, 11) * _P32_1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P32_2) & _M32
    h ^= h >> 13
    h = (h * _P32_3) & _M32
    h ^= h >> 16
    return h

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
    """XXH64 of ``data`` — unsigned 64-bit."""
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        while pos + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[pos:pos + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[pos + 8:pos + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[pos + 16:pos + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[pos + 24:pos + 32], "little"))
            pos += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
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

"""Parquet split-block Bloom filters (SBBF) from scratch — the
point-lookup skipping layer the spec puts beside min/max stats: sorted
data prunes on ranges via stats and the PageIndex, but a key column
scattered across files (custkey, uuid, url) defeats min/max entirely;
the SBBF answers "can this row group contain value v?" in one cache
line, which at 100 TB is the difference between touching 4000 row
groups and 4.

Spec: parquet-format BloomFilter.md — xxHash64 (seed 0) over the
value's PLAIN encoding, 32-byte blocks of eight 32-bit words, the
eight published salt constants, block picked by the upper 32 hash bits
scaled by block count, one bit per word from the lower 32 bits.
Bitset bytes are preceded by a thrift-compact BloomFilterHeader
(numBytes + BLOCK/XXHASH/UNCOMPRESSED unions); ColumnMetaData fields
14/15 locate it.

Pinned against parquet-java (Spark's writer with
``parquet.bloom.filter.enabled``): every stored value must probe true
and the observed false-positive rate must match the sizing math —
plus byte-identical bitsets for the same value set and size, since
SBBF construction is deterministic.
"""

from __future__ import annotations

import math
import struct

from ..functions.xxhash import xxh64

_SALT = (0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
         0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31)


def bloom_hash(value, ptype: str) -> int:
    """xxHash64(seed 0) of the value's plain encoding (BloomFilter.md:
    byte arrays hash their raw bytes, no length prefix)."""
    if value is None:
        raise ValueError("NULL values are never stored in a bloom filter")
    if ptype == "INT32":
        raw = struct.pack("<i", value)
    elif ptype == "INT64":
        raw = struct.pack("<q", value)
    elif ptype == "FLOAT":
        raw = struct.pack("<f", value)
    elif ptype == "DOUBLE":
        raw = struct.pack("<d", value)
    elif ptype in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
    else:
        raise NotImplementedError(
            f"bloom filters for physical type {ptype!r} "
            "(BOOLEAN has 2 values; stats subsume it)")
    return xxh64(raw)


def optimal_num_bytes(ndv: int, fpp: float = 0.01) -> int:
    """parquet-java's sizing: bits = -8*ndv / ln(1 - fpp^(1/8)),
    rounded up to a power of two, clamped to [32 B, 128 MiB]."""
    if not 0 < fpp < 1:
        raise ValueError("fpp must be in (0, 1)")
    bits = -8.0 * max(ndv, 1) / math.log(1.0 - fpp ** 0.125)
    n = max(32, int(bits / 8))
    n = 1 << (n - 1).bit_length()  # next power of two
    return min(n, 128 * 1024 * 1024)


class SplitBlockBloom:
    """One column chunk's SBBF: a flat bytearray of 32-byte blocks."""

    __slots__ = ("bits",)

    def __init__(self, num_bytes: int = 0, bits: "bytearray | None" = None):
        if bits is not None:
            # same invariant as the num_bytes branch (ADVICE r10): a
            # non-power-of-two bitset would serialize an out-of-spec SBBF
            nb = len(bits)
            if nb < 32 or nb & (nb - 1):
                raise ValueError(
                    "SBBF bitset must be a power of two >= 32 bytes")
            self.bits = bytearray(bits)
        else:
            if num_bytes < 32 or num_bytes & (num_bytes - 1):
                raise ValueError(
                    "numBytes must be a power of two >= 32")
            self.bits = bytearray(num_bytes)

    @staticmethod
    def _mask(x: int) -> "list[int]":
        # one bit per 32-bit word, selected by the top 5 bits of
        # (x * salt_i) mod 2^32
        return [1 << (((x * s) & 0xFFFFFFFF) >> 27) for s in _SALT]

    def _block(self, h: int) -> int:
        nblocks = len(self.bits) // 32
        return (((h >> 32) & 0xFFFFFFFF) * nblocks) >> 32

    def insert_hash(self, h: int) -> None:
        base = self._block(h) * 32
        mask = self._mask(h & 0xFFFFFFFF)
        for i in range(8):
            off = base + 4 * i
            w = int.from_bytes(self.bits[off:off + 4], "little") | mask[i]
            self.bits[off:off + 4] = w.to_bytes(4, "little")

    def check_hash(self, h: int) -> bool:
        base = self._block(h) * 32
        mask = self._mask(h & 0xFFFFFFFF)
        for i in range(8):
            off = base + 4 * i
            w = int.from_bytes(self.bits[off:off + 4], "little")
            if w & mask[i] != mask[i]:
                return False
        return True

    def insert(self, value, ptype: str) -> None:
        self.insert_hash(bloom_hash(value, ptype))

    def might_contain(self, value, ptype: str) -> bool:
        return self.check_hash(bloom_hash(value, ptype))


def _xxh64_vec_fixed(arr, width: int):
    """Vectorized xxHash64(seed 0) over fixed-width little-endian
    values: ``arr`` is uint64 (width 8) or uint32 (width 4) holding the
    PLAIN encoding reinterpreted as an integer.  Matches
    functions.xxhash.xxh64 bit-for-bit (pinned in tests) — the spec's
    single-lane path for inputs shorter than 32 bytes."""
    import numpy as np

    P1 = np.uint64(11400714785074694791)
    P2 = np.uint64(14029467366897019727)
    P3 = np.uint64(1609587929392839161)
    P4 = np.uint64(9650029242287828579)
    P5 = np.uint64(2870177450012600261)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    h0 = np.uint64(P5 + np.uint64(width))  # seed 0, + input length
    if width == 8:
        k1 = rotl(arr.astype(np.uint64) * P2, 31) * P1
        h = np.full(arr.shape, h0, dtype=np.uint64) ^ k1
        h = rotl(h, 27) * P1 + P4
    elif width == 4:
        h = np.full(arr.shape, h0, dtype=np.uint64) \
            ^ (arr.astype(np.uint64) * P1)
        h = rotl(h, 23) * P2 + P3
    else:  # pragma: no cover - callers pass 4 or 8
        raise ValueError(f"width {width}")
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def _bloom_bits_vec(hashes, num_bytes: int) -> bytearray:
    """Vectorized SBBF bitset build from uint64 hashes — the same
    block/salt/bit math as ``SplitBlockBloom.insert_hash`` over whole
    arrays (r10, guide §4.2: the scalar python loop was ~20 µs/key and
    sat on the write path of every bloom-carrying chunk)."""
    import numpy as np

    nblocks = num_bytes // 32
    block = ((hashes >> np.uint64(32)) * np.uint64(nblocks)) \
        >> np.uint64(32)
    x = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    words = np.zeros(num_bytes // 4, dtype="<u4")
    base = (block.astype(np.int64)) * 8
    for i, s in enumerate(_SALT):
        shift = (x * np.uint32(s)) >> np.uint32(27)
        mask = np.uint32(1) << shift
        np.bitwise_or.at(words, base + i, mask)
    return bytearray(words.tobytes())


def bloom_filter_bytes(values, ptype: str,
                       num_bytes: "int | None" = None,
                       fpp: float = 0.01) -> bytes:
    """Serialize header + bitset for one chunk's non-null values
    (deduplicated here; insertion is idempotent anyway)."""
    from .parquet_write import _TWriter

    distinct = set(v for v in values if v is not None)
    if num_bytes is None:
        num_bytes = optimal_num_bytes(len(distinct), fpp)
    if ptype in ("INT64", "INT32") and distinct:
        # numpy fast path, byte-identical to the scalar inserts (the
        # vectorized xxh64 + block math is pinned against them)
        import numpy as np

        if ptype == "INT64":
            arr = np.fromiter(distinct, dtype=np.int64,
                              count=len(distinct)).view(np.uint64)
            hashes = _xxh64_vec_fixed(arr, 8)
        else:
            arr = np.fromiter(distinct, dtype=np.int32,
                              count=len(distinct)).view(np.uint32)
            hashes = _xxh64_vec_fixed(arr, 4)
        bf = SplitBlockBloom(
            num_bytes, bits=_bloom_bits_vec(hashes, num_bytes))
    else:
        bf = SplitBlockBloom(num_bytes)
        for v in distinct:
            bf.insert(v, ptype)
    w = _TWriter()
    w.field_i32(1, num_bytes)
    w.begin_struct(2)           # algorithm union
    w.begin_struct(1)           # BLOCK (empty struct)
    w.end_struct()
    w.end_struct()
    w.begin_struct(3)           # hash union
    w.begin_struct(1)           # XXHASH
    w.end_struct()
    w.end_struct()
    w.begin_struct(4)           # compression union
    w.begin_struct(1)           # UNCOMPRESSED
    w.end_struct()
    w.end_struct()
    return w.stop() + bytes(bf.bits)


def read_bloom_filter(data: bytes, offset: int) -> SplitBlockBloom:
    """Parse BloomFilterHeader + bitset at ``offset`` of a whole-file
    image (``ColumnMetaData.bloom_filter_offset``)."""
    from .parquet_meta import _Reader

    r = _Reader(data, offset)
    hdr = r.struct()
    num_bytes = hdr.get(1)
    if num_bytes is None:
        raise ValueError("BloomFilterHeader without numBytes")
    if 1 not in hdr.get(2, {1: {}}):
        raise NotImplementedError("non-BLOCK bloom filter algorithm")
    if 1 not in hdr.get(3, {1: {}}):
        raise NotImplementedError("non-XXHASH bloom filter hash")
    if 1 not in hdr.get(4, {1: {}}):
        raise NotImplementedError("compressed bloom filter bitset")
    bits = data[r.pos:r.pos + num_bytes]
    if len(bits) != num_bytes:
        raise ValueError("truncated bloom filter bitset")
    return SplitBlockBloom(bits=bytearray(bits))


def prune_row_groups_bloom(data: bytes, footer: dict, column: str,
                           value) -> "list[dict]":
    """Which row groups can contain ``column = value``?  Row groups
    whose chunk has no bloom filter always survive (conservative);
    groups whose filter rejects the value are PROVEN empty of it."""
    out = []
    for i, rg in enumerate(footer["row_groups"]):
        col = next((c for c in rg["columns"] if c["path"] == column), None)
        if col is None:
            raise ValueError(f"column {column!r} not in row group {i}")
        off = col.get("bloom_filter_offset")
        if off is None:
            selected = True
        else:
            bf = read_bloom_filter(data, off)
            selected = bf.might_contain(value, col["type"])
        out.append({"row_group": i, "selected": selected,
                    "has_bloom": off is not None})
    return out

"""Roaring bitmaps from scratch — the RoaringFormatSpec "portable"
serialization, 32-bit and 64-bit — because Delta deletion vectors
(PROTOCOL.md) store deleted row indexes as a 64-bit portable roaring
bitmap and this repo's Delta plane otherwise could not carry DELETEs
without rewriting data files.

Spec: https://github.com/RoaringBitmap/RoaringFormatSpec — everything
little-endian:

* 32-bit: cookie 12346 (SERIAL_COOKIE_NO_RUNCONTAINER, u32) + u32
  container count, or cookie 12347 in the low 16 bits with
  (count-1) in the high 16 followed by the run-container flag bitset;
  then the descriptive header (u16 key, u16 cardinality-1 per
  container); then the u32 offset table (always for cookie 12346, and
  for >= 4 containers with 12347); then container payloads — array
  (sorted u16s, cardinality <= 4096), bitmap (8192 bytes), run
  (u16 run count + (start, length-1) u16 pairs).
* 64-bit: u64 bucket count, then per bucket u32 high key + the full
  32-bit serialization of its low bits.

The WRITE side always emits array/bitmap containers under cookie 12346
(runs are an optional optimization); the READ side accepts all three
container types and both cookies, so bitmaps from CRoaring /
RoaringBitmap-java (what real Delta writers embed) parse.  Pinned by
byte-level spec vectors and set-semantics property tests
(tests/test_roaring.py).
"""

from __future__ import annotations

import struct

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


class Roaring32:
    """32-bit roaring bitmap: high-16-bit keys -> array (sorted u16
    list) or bitmap (8 KiB bytearray) containers.  Array containers
    convert to bitmaps above 4096 entries, per the format's invariant
    that array cardinality fits u16 offsets."""

    __slots__ = ("containers",)

    def __init__(self):
        self.containers: dict[int, object] = {}

    # ---- mutation ----------------------------------------------------
    def add(self, value: int) -> None:
        if not 0 <= value <= 0xFFFFFFFF:
            raise ValueError(f"value {value} outside u32")
        key, low = value >> 16, value & 0xFFFF
        c = self.containers.get(key)
        if c is None:
            self.containers[key] = {low}
        elif isinstance(c, set):
            c.add(low)
            if len(c) > 4096:
                bm = bytearray(8192)
                for v in c:
                    bm[v >> 3] |= 1 << (v & 7)
                self.containers[key] = bm
        else:
            c[low >> 3] |= 1 << (low & 7)

    def __contains__(self, value: int) -> bool:
        key, low = value >> 16, value & 0xFFFF
        c = self.containers.get(key)
        if c is None:
            return False
        if isinstance(c, set):
            return low in c
        return bool(c[low >> 3] & (1 << (low & 7)))

    def __len__(self) -> int:
        n = 0
        for c in self.containers.values():
            if isinstance(c, set):
                n += len(c)
            else:
                n += sum(bin(b).count("1") for b in c)
        return n

    def values(self):
        for key in sorted(self.containers):
            c = self.containers[key]
            base = key << 16
            if isinstance(c, set):
                for v in sorted(c):
                    yield base | v
            else:
                for byte_i, b in enumerate(c):
                    while b:
                        bit = b & -b
                        yield base | (byte_i << 3) | bit.bit_length() - 1
                        b ^= bit

    # ---- portable serialization ---------------------------------------
    def to_bytes(self) -> bytes:
        keys = sorted(self.containers)
        n = len(keys)
        out = bytearray()
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
        payloads = []
        for key in keys:
            c = self.containers[key]
            if isinstance(c, set):
                card = len(c)
                body = struct.pack(f"<{card}H", *sorted(c))
            else:
                card = sum(bin(b).count("1") for b in c)
                body = bytes(c)
            if card == 0:
                raise ValueError("empty container must not be serialized")
            out += struct.pack("<HH", key, card - 1)
            payloads.append(body)
        # offset table: u32 position of each container from stream start
        pos = len(out) + 4 * n
        for body in payloads:
            out += struct.pack("<I", pos)
            pos += len(body)
        for body in payloads:
            out += body
        return bytes(out)

    @classmethod
    def from_bytes(cls, buf: bytes, pos: int = 0) -> "tuple[Roaring32, int]":
        """Parse one 32-bit bitmap at ``pos``; returns (bitmap, end)."""
        (cookie,) = struct.unpack_from("<I", buf, pos)
        run_flags = None
        if cookie == _SERIAL_COOKIE_NO_RUN:
            (n,) = struct.unpack_from("<I", buf, pos + 4)
            pos += 8
        elif cookie & 0xFFFF == _SERIAL_COOKIE:
            n = (cookie >> 16) + 1
            pos += 4
            nbytes = (n + 7) // 8
            run_flags = buf[pos:pos + nbytes]
            pos += nbytes
        else:
            raise ValueError(f"bad roaring cookie {cookie & 0xFFFF}")
        keys, cards = [], []
        for _ in range(n):
            key, cm1 = struct.unpack_from("<HH", buf, pos)
            keys.append(key)
            cards.append(cm1 + 1)
            pos += 4
        if run_flags is None or n >= _NO_OFFSET_THRESHOLD:
            pos += 4 * n  # offset table (positions are sequential anyway)
        bm = cls()
        for i in range(n):
            is_run = bool(run_flags and run_flags[i >> 3] & (1 << (i & 7)))
            if is_run:
                (n_runs,) = struct.unpack_from("<H", buf, pos)
                pos += 2
                c = set()
                for _ in range(n_runs):
                    start, lm1 = struct.unpack_from("<HH", buf, pos)
                    pos += 4
                    c.update(range(start, start + lm1 + 1))
                if len(c) > 4096:
                    b = bytearray(8192)
                    for v in c:
                        b[v >> 3] |= 1 << (v & 7)
                    bm.containers[keys[i]] = b
                else:
                    bm.containers[keys[i]] = c
            elif cards[i] <= 4096:
                c = set(struct.unpack_from(f"<{cards[i]}H", buf, pos))
                pos += 2 * cards[i]
                bm.containers[keys[i]] = c
            else:
                bm.containers[keys[i]] = bytearray(buf[pos:pos + 8192])
                pos += 8192
        return bm, pos


class Roaring64:
    """64-bit roaring bitmap (RoaringFormatSpec portable): u64 bucket
    count, then per bucket u32 high key + 32-bit serialization — the
    exact payload Delta deletion vectors embed."""

    __slots__ = ("buckets",)

    def __init__(self):
        self.buckets: dict[int, Roaring32] = {}

    def add(self, value: int) -> None:
        if not 0 <= value <= 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"value {value} outside u64")
        hi = value >> 32
        b = self.buckets.get(hi)
        if b is None:
            b = self.buckets[hi] = Roaring32()
        b.add(value & 0xFFFFFFFF)

    def __contains__(self, value: int) -> bool:
        b = self.buckets.get(value >> 32)
        return b is not None and (value & 0xFFFFFFFF) in b

    def __len__(self) -> int:
        return sum(len(b) for b in self.buckets.values())

    def values(self):
        for hi in sorted(self.buckets):
            for low in self.buckets[hi].values():
                yield (hi << 32) | low

    def to_bytes(self) -> bytes:
        keys = sorted(self.buckets)
        out = bytearray(struct.pack("<Q", len(keys)))
        for hi in keys:
            out += struct.pack("<I", hi)
            out += self.buckets[hi].to_bytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, buf: bytes, pos: int = 0) -> "tuple[Roaring64, int]":
        (n,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
        bm = cls()
        for _ in range(n):
            (hi,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            r32, pos = Roaring32.from_bytes(buf, pos)
            bm.buckets[hi] = r32
        return bm, pos

    @classmethod
    def from_values(cls, values) -> "Roaring64":
        bm = cls()
        for v in values:
            bm.add(v)
        return bm

"""BZip2 decoder from scratch — the BWT member of the compression
suite (joins `inflate.py` DEFLATE, `parquet_data.py` Snappy/LZ4 and
`zstd.py` Zstandard; every compression format the repo consumes now
has a from-scratch, spec-implemented decoder).

The pipeline, inverted stage by stage per the public format
(bzip2 1.0 / Wikipedia's format description, MSB-first bitstream):
RLE1 (4-byte run + count byte) <- inverse Burrows-Wheeler (counting
T-vector walk from origPtr) <- MTF + RLE2 (RUNA/RUNB bijective-base-2
run lengths over the move-to-front alphabet) <- per-50-symbol Huffman
group switching (MTF-coded selectors, delta-coded code lengths) <-
16+16x16-bit symbol usage map.  Block and stream CRCs are the
big-endian non-reflected CRC-32 bzip2 uses, computed here and
verified.

Avro's ``bzip2`` codec (sources/avro.py) uses stdlib bz2 for speed;
tests pin this decoder equal to it across shapes and block sizes.
"""

from __future__ import annotations


class _MsbBits:
    __slots__ = ("buf", "bitpos")

    def __init__(self, buf: bytes, bitpos: int = 0):
        self.buf = buf
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            pos = self.bitpos >> 3
            if pos >= len(self.buf):
                raise ValueError("bzip2: truncated stream")
            out = (out << 1) | ((self.buf[pos] >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return out


_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
        _c &= 0xFFFFFFFF
    _CRC_TABLE.append(_c)


def bz2_crc(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """bzip2's CRC-32: poly 0x04C11DB7, MSB-first (non-reflected)."""
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


class _Huff:
    """Canonical decoder from code lengths, bzip2 style (codes assigned
    ascending by length, symbol order within a length)."""

    __slots__ = ("limit", "base", "perm", "min_len")

    def __init__(self, lengths: list[int]):
        max_len = max(lengths)
        min_len = min(lengths)
        self.min_len = min_len
        self.perm = []
        for ln in range(min_len, max_len + 1):
            for sym, l2 in enumerate(lengths):
                if l2 == ln:
                    self.perm.append(sym)
        count = [0] * (max_len + 2)
        for ln in lengths:
            count[ln] += 1
        self.limit = [0] * (max_len + 2)
        self.base = [0] * (max_len + 2)
        vec = 0
        total = 0
        for ln in range(min_len, max_len + 1):
            self.base[ln] = vec - total
            total += count[ln]
            vec += count[ln]
            self.limit[ln] = vec - 1
            vec <<= 1

    def decode(self, bits: _MsbBits) -> int:
        ln = self.min_len
        vec = bits.read(ln)
        while ln < len(self.limit) - 1 and vec > self.limit[ln]:
            vec = (vec << 1) | bits.read(1)
            ln += 1
        idx = vec - self.base[ln]
        if not 0 <= idx < len(self.perm):
            raise ValueError("bzip2: invalid Huffman code (corrupt stream)")
        return self.perm[idx]


def bz2_decompress(buf: bytes, expected: int | None = None) -> bytes:
    """Decode a complete bzip2 stream, verifying block and stream CRCs."""
    if buf[:3] != b"BZh":
        raise ValueError("bzip2: bad magic")
    level = buf[3] - ord("0")
    if not 1 <= level <= 9:
        raise ValueError("bzip2: bad block-size digit")
    bits = _MsbBits(buf, 32)
    out = bytearray()
    combined_crc = 0
    while True:
        magic = bits.read(48)
        if magic == 0x177245385090:  # stream footer
            stored = bits.read(32)
            if stored != combined_crc:
                raise ValueError("bzip2: stream CRC mismatch")
            break
        if magic != 0x314159265359:
            raise ValueError(f"bzip2: bad block magic {magic:#x}")
        block_crc = bits.read(32)
        if bits.read(1):
            raise ValueError("bzip2: deprecated randomized blocks")
        orig_ptr = bits.read(24)

        # symbol usage map
        used_groups = bits.read(16)
        used: list[int] = []
        for g in range(16):
            if used_groups & (0x8000 >> g):
                m = bits.read(16)
                for j in range(16):
                    if m & (0x8000 >> j):
                        used.append(g * 16 + j)
        n_sym = len(used) + 2  # RUNA, RUNB, used[1:]..., EOB

        n_groups = bits.read(3)
        if not 2 <= n_groups <= 6:
            raise ValueError("bzip2: bad group count")
        n_sel = bits.read(15)
        # selectors, MTF-coded in unary
        mtf_g = list(range(n_groups))
        selectors = []
        for _ in range(n_sel):
            j = 0
            while bits.read(1):
                j += 1
                if j >= n_groups:
                    raise ValueError("bzip2: selector overflow")
            g = mtf_g.pop(j)
            mtf_g.insert(0, g)
            selectors.append(g)

        # delta-coded code lengths per group
        tables = []
        for _ in range(n_groups):
            curr = bits.read(5)
            lens = []
            for _ in range(n_sym):
                while bits.read(1):
                    curr += -1 if bits.read(1) else 1
                if not 1 <= curr <= 20:
                    raise ValueError("bzip2: code length out of range")
                lens.append(curr)
            tables.append(_Huff(lens))

        # MTF + RLE2 decode into the BWT string
        mtf = list(used)
        bwt = bytearray()
        eob = n_sym - 1
        run = 0
        run_bit = 0
        sel_idx = -1
        sym_count = 0
        huff = None
        while True:
            if sym_count == 0:
                sel_idx += 1
                if sel_idx >= len(selectors):
                    raise ValueError("bzip2: ran out of selectors")
                huff = tables[selectors[sel_idx]]
                sym_count = 50
            sym_count -= 1
            s = huff.decode(bits)
            if s <= 1:  # RUNA / RUNB: bijective base-2 run length
                run += (s + 1) << run_bit
                run_bit += 1
                continue
            if run:
                bwt += bytes([mtf[0]]) * run
                run = 0
                run_bit = 0
            if s == eob:
                break
            # s-1 is an MTF index into the used alphabet
            v = mtf.pop(s - 1)
            mtf.insert(0, v)
            bwt.append(v)
        if run:
            bwt += bytes([mtf[0]]) * run

        # inverse BWT: counting T-vector walk
        n = len(bwt)
        if orig_ptr >= n:
            raise ValueError("bzip2: origPtr beyond block")
        counts = [0] * 256
        for b in bwt:
            counts[b] += 1
        starts = [0] * 256
        acc = 0
        for v in range(256):
            starts[v] = acc
            acc += counts[v]
        t = [0] * n
        seen = [0] * 256
        for i, b in enumerate(bwt):
            t[starts[b] + seen[b]] = i
            seen[b] += 1
        plain = bytearray(n)
        p = t[orig_ptr]
        for i in range(n):
            plain[i] = bwt[p]
            p = t[p]

        # RLE1 decode: 4 equal bytes then a count byte (0-251 extras)
        dec = bytearray()
        i = 0
        while i < n:
            b = plain[i]
            run_len = 1
            while i + run_len < n and run_len < 4 and plain[i + run_len] == b:
                run_len += 1
            if run_len == 4:
                if i + 4 >= n:
                    raise ValueError("bzip2: RLE1 run missing count byte")
                extra = plain[i + 4]
                dec += bytes([b]) * (4 + extra)
                i += 5
            else:
                dec += bytes([b]) * run_len
                i += run_len
        got_crc = bz2_crc(bytes(dec)) ^ 0xFFFFFFFF
        if got_crc != block_crc:
            raise ValueError("bzip2: block CRC mismatch")
        combined_crc = (((combined_crc << 1) & 0xFFFFFFFF)
                        | (combined_crc >> 31)) ^ got_crc
        out += dec
    if expected is not None and len(out) != expected:
        raise ValueError(f"bzip2: expected {expected}, got {len(out)}")
    return bytes(out)

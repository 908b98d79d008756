"""DEFLATE decoder from scratch — RFC 1951, with the RFC 1952 gzip and
RFC 1950 zlib wrappers.

The last compression format the repo consumed only through a library:
Snappy, LZ4 (block + frame) and Zstandard are already decoded from
their specs (`parquet_data.py`, `zstd.py`); this module does the same
for DEFLATE — stored blocks, fixed Huffman, dynamic Huffman (the
code-length code with its 16/17/18 repeat operators), the 32 KiB LZ77
window — so every byte of a gzip parquet page, a PNG IDAT stream, a
deflate Avro block, or a `.warc.gz` member is inspectable without
zlib.  The stdlib zlib stays the HOT path (C speed); this is the
conformance twin, pinned equal to zlib on every shape the tests
generate plus real container bytes.

Checksums: gzip CRC32 and zlib Adler-32 are verified (Adler computed
here; CRC via binascii, a table lookup, not a decompressor).
"""

from __future__ import annotations

# length codes 257-285: (base, extra bits)
_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
             51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
              4, 4, 4, 4, 5, 5, 5, 5, 0]
# distance codes 0-29
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
              257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
              12289, 16385, 24577]
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
               9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1,
              15]


class _Bits:
    __slots__ = ("buf", "pos", "bit")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.buf[self.pos]
            out |= ((byte >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _Huff:
    """Canonical Huffman decoder from a code-length list (RFC 1951
    3.2.2): codes assigned in symbol order within each length, read
    MSB-first bit by bit."""

    __slots__ = ("by_len",)

    def __init__(self, lengths: list[int]):
        # by_len[l] = (first_code, first_symbol_index_map)
        self.by_len: dict[int, dict[int, int]] = {}
        max_len = max(lengths, default=0)
        code = 0
        bl_count = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                bl_count[ln] += 1
        next_code = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        for sym, ln in enumerate(lengths):
            if ln:
                self.by_len.setdefault(ln, {})[next_code[ln]] = sym
                next_code[ln] += 1

    def decode(self, bits: _Bits) -> int:
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | bits.read(1)
            table = self.by_len.get(ln)
            if table is not None and code in table:
                return table[code]
        raise ValueError("inflate: invalid Huffman code")


_FIXED_LIT = _Huff([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_FIXED_DIST = _Huff([5] * 30)


def inflate(buf: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Raw DEFLATE stream -> (payload, end position in buf)."""
    bits = _Bits(buf, pos)
    out = bytearray()
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        if btype == 0:  # stored
            bits.align()
            ln = int.from_bytes(buf[bits.pos:bits.pos + 2], "little")
            nln = int.from_bytes(buf[bits.pos + 2:bits.pos + 4], "little")
            if ln ^ nln != 0xFFFF:
                raise ValueError("inflate: stored block LEN/NLEN mismatch")
            bits.pos += 4
            out += buf[bits.pos:bits.pos + ln]
            bits.pos += ln
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT, _FIXED_DIST
            else:
                hlit = bits.read(5) + 257
                hdist = bits.read(5) + 1
                hclen = bits.read(4) + 4
                cl_lens = [0] * 19
                for i in range(hclen):
                    cl_lens[_CLC_ORDER[i]] = bits.read(3)
                clc = _Huff(cl_lens)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = clc.decode(bits)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        if not lens:
                            raise ValueError("inflate: repeat with no prior")
                        lens.extend([lens[-1]] * (3 + bits.read(2)))
                    elif sym == 17:
                        lens.extend([0] * (3 + bits.read(3)))
                    else:
                        lens.extend([0] * (11 + bits.read(7)))
                if len(lens) != hlit + hdist:
                    raise ValueError("inflate: code-length overrun")
                lit = _Huff(lens[:hlit])
                dist = _Huff(lens[hlit:])
            while True:
                sym = lit.decode(bits)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    li = sym - 257
                    length = _LEN_BASE[li] + bits.read(_LEN_EXTRA[li])
                    ds = dist.decode(bits)
                    distance = _DIST_BASE[ds] + bits.read(_DIST_EXTRA[ds])
                    start = len(out) - distance
                    if start < 0:
                        raise ValueError("inflate: distance beyond window")
                    if distance >= length:
                        out += out[start:start + length]
                    else:
                        for i in range(length):
                            out.append(out[start + i])
        else:
            raise ValueError("inflate: reserved block type")
        if bfinal:
            break
    bits.align()
    return bytes(out), bits.pos


def _adler32(data: bytes) -> int:
    a, b = 1, 0
    for chunk_start in range(0, len(data), 5552):  # mod deferral bound
        for byte in data[chunk_start:chunk_start + 5552]:
            a += byte
            b += a
        a %= 65521
        b %= 65521
    return (b << 16) | a


def zlib_decompress(buf: bytes) -> bytes:
    """RFC 1950 wrapper: CMF/FLG header + deflate + Adler-32."""
    cmf, flg = buf[0], buf[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib: method is not deflate")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib: FCHECK failed")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionaries unsupported")
    payload, end = inflate(buf, 2)
    stored = int.from_bytes(buf[end:end + 4], "big")
    if _adler32(payload) != stored:
        raise ValueError("zlib: Adler-32 mismatch")
    return payload


def gunzip(buf: bytes) -> bytes:
    """RFC 1952 member(s): header (FLG-gated fields), deflate, CRC32 +
    ISIZE verified.  Concatenated members decode to the concatenation
    (the .warc.gz shape)."""
    import binascii

    out = bytearray()
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic")
        if buf[pos + 2] != 8:
            raise ValueError("gzip: method is not deflate")
        flg = buf[pos + 3]
        pos += 10
        if flg & 4:  # FEXTRA
            xlen = int.from_bytes(buf[pos:pos + 2], "little")
            pos += 2 + xlen
        if flg & 8:  # FNAME
            pos = buf.index(b"\x00", pos) + 1
        if flg & 16:  # FCOMMENT
            pos = buf.index(b"\x00", pos) + 1
        if flg & 2:  # FHCRC
            pos += 2
        payload, pos = inflate(buf, pos)
        crc = int.from_bytes(buf[pos:pos + 4], "little")
        isize = int.from_bytes(buf[pos + 4:pos + 8], "little")
        pos += 8
        if binascii.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError("gzip: CRC32 mismatch")
        if len(payload) % (1 << 32) != isize:
            raise ValueError("gzip: ISIZE mismatch")
        out += payload
    return bytes(out)


# ------------------------------------------------------------- encoder

_FIXED_LIT_CODE = {}
for _s in range(144):
    _FIXED_LIT_CODE[_s] = (0x30 + _s, 8)
for _s in range(144, 256):
    _FIXED_LIT_CODE[_s] = (0x190 + (_s - 144), 9)
for _s in range(256, 280):
    _FIXED_LIT_CODE[_s] = (_s - 256, 7)
for _s in range(280, 288):
    _FIXED_LIT_CODE[_s] = (0xC0 + (_s - 280), 8)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """LSB-first bit packing (deflate's order)."""
        self.acc |= value << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, n: int) -> None:
        """Huffman codes go MSB-first: reverse before packing."""
        rev = 0
        for _ in range(n):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, n)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def deflate_fixed(raw: bytes) -> bytes:
    """DEFLATE ENCODE — one fixed-Huffman block with greedy hash-match
    LZ77 (the write-side twin of :func:`inflate`, same shape as
    `parquet_data.snappy_compress`): any conformant inflater, stdlib
    zlib included, accepts the output."""
    w = _BitWriter()
    w.write(1, 1)  # BFINAL
    w.write(1, 2)  # BTYPE = fixed huffman

    def emit_len(length: int) -> None:
        for i in range(len(_LEN_BASE) - 1, -1, -1):
            if length >= _LEN_BASE[i]:
                code, n = _FIXED_LIT_CODE[257 + i]
                w.write_code(code, n)
                w.write(length - _LEN_BASE[i], _LEN_EXTRA[i])
                return

    def emit_dist(dist: int) -> None:
        for i in range(len(_DIST_BASE) - 1, -1, -1):
            if dist >= _DIST_BASE[i]:
                w.write_code(i, 5)
                w.write(dist - _DIST_BASE[i], _DIST_EXTRA[i])
                return

    table: dict[int, int] = {}
    n = len(raw)
    i = 0
    while i < n:
        if i + 3 <= n:
            # deterministic key (not salted hash()): output bytes must be
            # identical across processes for the writer's determinism
            # contract
            key = int.from_bytes(raw[i:i + 3], "little")
            cand = table.get(key)
            table[key] = i
            if (cand is not None and i - cand <= 32768
                    and raw[cand:cand + 3] == raw[i:i + 3]):
                m = 3
                while (i + m < n and m < 258
                       and raw[cand + m] == raw[i + m]):
                    m += 1
                emit_len(m)
                emit_dist(i - cand)
                i += m
                continue
        code, bits_n = _FIXED_LIT_CODE[raw[i]]
        w.write_code(code, bits_n)
        i += 1
    code, bits_n = _FIXED_LIT_CODE[256]
    w.write_code(code, bits_n)
    return w.finish()


def zlib_compress(raw: bytes) -> bytes:
    """RFC 1950 wrapper around :func:`deflate_fixed` (CMF 0x78, a valid
    FLG, trailing Adler-32)."""
    flg = 31 - (0x78 * 256) % 31
    return bytes([0x78, flg]) + deflate_fixed(raw) + _adler32(raw).to_bytes(4, "big")


def gzip_compress(raw: bytes) -> bytes:
    """RFC 1952 member around :func:`deflate_fixed` (mtime 0, CRC32 +
    ISIZE trailer) — deterministic bytes for a given input."""
    import binascii

    return (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
            + deflate_fixed(raw)
            + (binascii.crc32(raw) & 0xFFFFFFFF).to_bytes(4, "little")
            + (len(raw) % (1 << 32)).to_bytes(4, "little"))

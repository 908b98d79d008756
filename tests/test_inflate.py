"""From-scratch DEFLATE/zlib/gzip decoder (sources/inflate.py) vs the
stdlib zlib across block types, levels, and container wrappers."""

from __future__ import annotations

import gzip
import random
import zlib

import pytest

from pr2_transformation_spark.sources.inflate import (
    gunzip,
    inflate,
    zlib_decompress,
)


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("kind", ["random", "text", "ternary", "zeros"])
def test_inflate_matches_zlib(level, kind):
    """level 0 = stored blocks, 1 = mostly fixed Huffman, 6/9 = dynamic
    Huffman with long matches — all three block types covered."""
    rng = random.Random(hash((level, kind)) & 0xFFFF)
    for n in [0, 1, 100, 5000, 120000]:
        if kind == "random":
            raw = bytes(rng.randint(0, 255) for _ in range(n))
        elif kind == "text":
            raw = (b"deflate dynamic huffman " * (n // 24 + 1))[:n]
        elif kind == "ternary":
            raw = bytes(rng.choice(b"abc") for _ in range(n))
        else:
            raw = b"\x00" * n
        assert zlib_decompress(zlib.compress(raw, level)) == raw
        c = zlib.compressobj(level, wbits=-15)
        s = c.compress(raw) + c.flush()
        got, end = inflate(s)
        assert got == raw and end == len(s)


def test_gzip_wrappers_and_multimember():
    raw = b"gzip payload " * 500
    assert gunzip(gzip.compress(raw)) == raw
    members = gzip.compress(b"one") + gzip.compress(b"two")
    assert gunzip(members) == b"onetwo"
    # warc.gz members decode through the from-scratch path too
    from pr2_transformation_spark.sources import warc
    gz = warc.build_warc_gz([("response", "u", "id-0", b"payload")])
    assert gunzip(gz) == warc.build_warc([("response", "u", "id-0", b"payload")])


def test_corruption_trips():
    raw = b"check me " * 100
    z = bytearray(zlib.compress(raw))
    z[-2] ^= 0xFF
    with pytest.raises(ValueError, match="Adler"):
        zlib_decompress(bytes(z))
    g = bytearray(gzip.compress(raw))
    g[len(g) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        gunzip(bytes(g))


def test_parquet_gzip_page_through_from_scratch_inflate(tmp_path):
    """A gzip parquet page body decodes identically via stdlib zlib and
    the from-scratch gunzip — the conformance-twin claim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources import parquet_data as P
    from pr2_transformation_spark.sources.parquet_meta import read_footer

    path = str(tmp_path / "g.parquet")
    pq.write_table(pa.table({"v": list(range(4000))}), path,
                   compression="gzip", use_dictionary=False,
                   row_group_size=4000)
    footer = read_footer(path)
    chunk = footer["row_groups"][0]["columns"][0]
    buf = open(path, "rb").read()
    header, pos = P._read_page_header(buf, chunk["data_page_offset"])
    body = buf[pos:pos + header[3]]
    assert gunzip(body) == zlib.decompress(body, 16 + zlib.MAX_WBITS)


def test_property_random_roundtrips():
    """Hypothesis: arbitrary bytes at arbitrary levels round-trip through
    the from-scratch inflate/zlib/gzip paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=4000), st.integers(min_value=0, max_value=9))
    def roundtrip(raw, level):
        assert zlib_decompress(zlib.compress(raw, level)) == raw
        assert gunzip(gzip.compress(raw, compresslevel=level)) == raw

    roundtrip()


def test_deflate_encoder_both_directions():
    """deflate_fixed / zlib_compress / gzip_compress are accepted by
    stdlib zlib AND the in-repo inflater, with real compression."""
    import random

    from pr2_transformation_spark.sources.inflate import (
        deflate_fixed,
        gzip_compress,
        zlib_compress,
    )

    rng = random.Random(13)
    for trial in range(12):
        n = rng.randint(0, 50000)
        raw = ((b"encoder " * (n // 8 + 1))[:n] if trial % 2
               else bytes(rng.randint(0, 255) for _ in range(n)))
        assert zlib.decompress(deflate_fixed(raw), -15) == raw
        assert inflate(deflate_fixed(raw))[0] == raw
        assert zlib.decompress(zlib_compress(raw)) == raw
        assert gzip.decompress(gzip_compress(raw)) == raw
        assert zlib_decompress(zlib_compress(raw)) == raw
        assert gunzip(gzip_compress(raw)) == raw
    big = b"the quick brown fox " * 3000
    assert len(deflate_fixed(big)) < len(big) // 20


def test_dynamic_huffman_encoder_conformance():
    """deflate_dynamic (RFC 1951 3.2.7: package-merge length-limited
    codes, 16/17/18 code-length run operators) is accepted by stdlib
    zlib AND the repo's own inflater, beats the fixed encoding on
    skewed data, and deflate_encode picks the smaller block type."""
    import random
    import zlib

    from pr2_transformation_spark.sources.inflate import (
        deflate_dynamic, deflate_encode, deflate_fixed, inflate)

    rnd = random.Random(7)
    cases = [
        b"",
        b"x",
        b"abcabcabc" * 5000,
        b"a" * 40000 + b"b" * 100 + bytes(range(256)),
        bytes(rnd.randrange(256) for _ in range(50000)),  # incompressible
        open("/root/repo/SURVEY.md", "rb").read()[:100000],
        bytes(rnd.randrange(4) for _ in range(30000)),  # tiny alphabet
        # exponential byte skew: the shape that exposed the
        # package-merge off-by-one-level (length-16 codes) in round 8
        bytes(min(255, int(rnd.expovariate(0.03))) for _ in range(40000)),
    ]
    for raw in cases:
        dyn = deflate_dynamic(raw)
        assert zlib.decompressobj(-15).decompress(dyn) == raw
        assert inflate(dyn)[0] == raw
        assert deflate_dynamic(raw) == dyn  # deterministic
        best = deflate_encode(raw)
        assert len(best) <= min(len(dyn), len(deflate_fixed(raw)))
        assert zlib.decompressobj(-15).decompress(best) == raw
    # the entropy gap: dynamic strictly beats fixed on skewed text
    text = cases[5]
    assert len(deflate_dynamic(text)) < 0.85 * len(deflate_fixed(text))


def test_package_merge_is_length_limited_and_optimal_shapes():
    from pr2_transformation_spark.sources.inflate import (
        _canonical_codes, _huffman_lengths)

    # fibonacci-ish frequencies force >15-bit codes in a naive Huffman
    freqs = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610,
             987, 1597, 2584, 4181, 6765]
    lens = _huffman_lengths(freqs, 15)
    assert max(lens) <= 15 and all(lens)
    # Kraft equality for a complete code
    assert sum(2 ** (15 - ln) for ln in lens) <= 2 ** 15
    # single-symbol alphabet gets a 1-bit code, empty gets none
    assert _huffman_lengths([0, 7, 0], 15) == [0, 1, 0]
    assert _huffman_lengths([0, 0], 15) == [0, 0]
    # canonical assignment is the RFC example shape
    codes = _canonical_codes([2, 1, 3, 3])
    assert codes == [0b10, 0b0, 0b110, 0b111]

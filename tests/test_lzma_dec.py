"""From-scratch LZMA/LZMA2/XZ decoder (sources/lzma_dec.py) vs stdlib
lzma: the range decoder, the 12-state machine, distance model, LZMA2
chunking, and the XZ container with CRC32/CRC64 verification."""

from __future__ import annotations

import lzma
import random

import pytest

from pr2_transformation_spark.sources.lzma_dec import (
    crc64_xz,
    lzma2_decompress,
    lzma_alone_decompress,
    xz_decompress,
)


def _cases(seed):
    rng = random.Random(seed)
    return [
        b"", b"a", b"lzma corpus " * 400,
        bytes(rng.randint(0, 255) for _ in range(30000)),
        b"\x00" * 9000,
        bytes(rng.choice(b"xyz") for _ in range(20000)),
    ]


@pytest.mark.parametrize("preset", [0, 6, 9])
def test_alone_format(preset):
    for raw in _cases(preset):
        comp = lzma.compress(raw, format=lzma.FORMAT_ALONE, preset=preset)
        assert lzma_alone_decompress(comp, len(raw)) == raw


@pytest.mark.parametrize("check", [lzma.CHECK_NONE, lzma.CHECK_CRC32,
                                   lzma.CHECK_CRC64])
def test_xz_container(check):
    for raw in _cases(check) + [b"block " * 50000]:
        comp = lzma.compress(raw, format=lzma.FORMAT_XZ, preset=6,
                             check=check)
        assert xz_decompress(comp, len(raw)) == raw


def test_raw_lzma2():
    for raw in _cases(3):
        comp = lzma.compress(raw, format=lzma.FORMAT_RAW,
                             filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
        assert lzma2_decompress(comp) == raw


def test_crc64_and_corruption():
    # CRC64-XZ reference vector (public): crc64("123456789")
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    comp = bytearray(lzma.compress(b"payload " * 200, format=lzma.FORMAT_XZ,
                                   check=lzma.CHECK_CRC64))
    # flip a payload byte: CRC64 check must trip (or the decode itself)
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        xz_decompress(bytes(comp))
    with pytest.raises(ValueError, match="magic"):
        xz_decompress(b"NOTXZ" + bytes(20))


def test_property_random_roundtrips():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.binary(max_size=3000), st.sampled_from([0, 6]))
    def roundtrip(raw, preset):
        comp = lzma.compress(raw, format=lzma.FORMAT_XZ, preset=preset)
        assert xz_decompress(comp, len(raw)) == raw

    roundtrip()

"""VP8 intra decoder conformance — against libwebp itself, via ctypes.

These tests break the encoder/decoder circularity a round-trip test
cannot: libwebp (the RFC 6386 reference implementation shipped as a
system library) both CONSUMES our fixture-grade encoder's streams and
PRODUCES real rate-distortion streams our pure-Python decoder must
decode bit-exactly, YUV-plane for YUV-plane.  Skipped wholesale where
no libwebp shared library is loadable (the decoder itself has no
dependency on it).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from pr2_transformation_spark.functions import multimodal, vp8


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LIB = _load_libwebp()
pytestmark = pytest.mark.skipif(_LIB is None, reason="no libwebp on this host")

if _LIB is not None:
    _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]


def _ref_encode(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3,
                           ctypes.c_float(quality), ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    data = bytes(np.ctypeslib.as_array(out, (n,)))
    _LIB.WebPFree(out)
    return data


def _ref_decode_yuv(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = _LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(u), ctypes.byref(v),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "libwebp decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    out = (
        np.ctypeslib.as_array(y, (H, S))[:, :W].copy(),
        np.ctypeslib.as_array(u, (ch, US))[:, :cw].copy(),
        np.ctypeslib.as_array(v, (ch, US))[:, :cw].copy(),
    )
    _LIB.WebPFree(y)
    return out


def _test_image(h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 5 + yy * 3 + (xx * yy) // 5) % 256
    rgb = np.stack([base, 255 - base, (base * 2) % 256], axis=-1).astype(int)
    return np.clip(rgb + rng.integers(-25, 25, rgb.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [10, 40, 75, 95])
@pytest.mark.parametrize("size", [(16, 16), (32, 16), (48, 64), (33, 17), (31, 47)])
def test_decode_real_libwebp_streams_bit_exact(size, quality):
    """Real rate-distortion encodes (all intra modes, token categories,
    segmentation, loop filter) decode to libwebp's exact YUV planes —
    including non-MB-multiple dimensions."""
    h, w = size
    data = _ref_encode(_test_image(h, w, seed=h * 31 + w), quality)
    Yr, Ur, Vr = _ref_decode_yuv(data)
    Ym, Um, Vm = vp8.vp8_decode_yuv(data)
    assert (Ym == Yr).all() and (Um == Ur).all() and (Vm == Vr).all()


def test_libwebp_accepts_and_matches_own_encoder_streams():
    """The fixture-grade DC encoder emits VALID VP8: libwebp decodes the
    stream and produces exactly what our decoder and the closed-form
    recurrence both produce."""
    levels = np.array(
        [[(r * 13 + c * 5 + r * c) % 31 - 15 for c in range(12)] for r in range(8)]
    )
    payload = vp8.vp8_encode_dc(levels, qindex=23)
    Yr, Ur, Vr = _ref_decode_yuv(payload)
    Ym, Um, Vm = vp8.vp8_decode_yuv(payload)
    assert (Ym == Yr).all() and (Um == Ur).all() and (Vm == Vr).all()
    grid = vp8.expected_dc_decode(levels, qindex=23)
    assert (Ym[::4, ::4] == grid).all()
    assert (Um == 128).all() and (Vm == 128).all()


def test_own_encoder_filtered_streams_match_libwebp():
    """With the loop filter ON, the controlled DC streams still decode
    bit-exactly — pinning the normal filter (MB + subblock edges, every
    hev branch) against the reference at several levels/sharpnesses."""
    rng = np.random.default_rng(42)
    for fl, sh in [(6, 0), (16, 0), (31, 3), (63, 7), (40, 5)]:
        levels = rng.integers(-9, 10, (8, 4))
        data = vp8.vp8_encode_dc(levels, qindex=60, filter_level=fl, sharpness=sh)
        Yr, Ur, Vr = _ref_decode_yuv(data)
        Ym, Um, Vm = vp8.vp8_decode_yuv(data)
        assert (Ym == Yr).all() and (Um == Ur).all() and (Vm == Vr).all(), (fl, sh)


def test_multimodal_dispatch_and_rejects():
    levels = np.arange(16).reshape(4, 4) % 9 - 4
    payload = vp8.vp8_encode_dc(levels, qindex=30)
    meta = multimodal.webp_decode(payload)
    assert meta["format"] == "webp-lossy" and meta["width"] == 16
    px = multimodal.webp_pixels(payload)
    assert px.shape == (16, 16, 4)
    with pytest.raises(ValueError):
        vp8.vp8_decode(b"RIFF\x00\x00\x00\x00WEBPJUNK")
    with pytest.raises(ValueError):
        vp8.decode_frame(b"\x00" * 9)  # too short
    bad = bytearray(vp8.find_vp8_chunk(payload))
    bad[3] = 0xFF  # break the keyframe start code
    with pytest.raises(ValueError):
        vp8.decode_frame(bytes(bad))

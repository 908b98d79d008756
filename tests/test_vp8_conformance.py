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


def test_alpha_channel_bit_exact_vs_libwebp():
    """VP8X+ALPH stills (the transparency path: headless VP8L alpha
    plane + row unfiltering) must reproduce libwebp's alpha channel
    exactly — alpha is lossless, so this holds bit-for-bit even though
    RGB conversion conventions differ."""
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]

    for seed, (h, w), q in [(1, (24, 40), 75), (3, (33, 17), 90)]:
        rng = np.random.default_rng(seed)
        rgba = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        rgba[..., 3] = (np.arange(w)[None, :] * 6
                        + np.arange(h)[:, None] * 3) % 256
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = _LIB.WebPEncodeRGBA(rgba.tobytes(), w, h, w * 4,
                                ctypes.c_float(q), ctypes.byref(out))
        data = bytes(np.ctypeslib.as_array(out, (n,)))
        _LIB.WebPFree(out)

        ww, hh = ctypes.c_int(), ctypes.c_int()
        p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
        ref = np.ctypeslib.as_array(p, (hh.value, ww.value, 4)).copy()
        _LIB.WebPFree(p)

        mine = vp8.vp8_pixels(data)
        assert (mine[..., 3] == ref[..., 3]).all(), (h, w, q)
        meta = multimodal.webp_decode(data)
        assert meta["has_alpha"] and meta["width"] == w

        # the YUV planes under the alpha still conform too
        Yr, Ur, Vr = _ref_decode_yuv(data)
        Ym, Um, Vm = vp8.vp8_decode_yuv(data)
        assert (Ym == Yr).all() and (Um == Ur).all() and (Vm == Vr).all()


def test_alpha_unfilter_conventions():
    """Raw-compression ALPH with each filter method round-trips through
    the documented edge conventions (top-left 0, first-row/-column
    fallbacks, modulo-256 accumulation)."""
    rng = np.random.default_rng(5)
    plane = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    for method in (0, 1, 2, 3):
        # forward-filter with the same conventions, then invert
        h, w = plane.shape
        filt = np.zeros_like(plane, dtype=np.int32)
        out = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif method == 0:
                    pred = 0
                elif method == 1:
                    pred = out[y, x - 1] if x > 0 else out[y - 1, x]
                elif method == 2:
                    pred = out[y - 1, x] if y > 0 else out[y, x - 1]
                else:
                    a = out[y, x - 1] if x > 0 else (out[y - 1, x] if y > 0 else 0)
                    b = out[y - 1, x] if y > 0 else (out[y, x - 1] if x > 0 else 0)
                    c = out[y - 1, x - 1] if (x > 0 and y > 0) else 0
                    pred = min(255, max(0, a + b - c))
                filt[y, x] = (out[y, x] - pred) & 0xFF
        head = bytes([method << 2])  # compression 0, filter=method
        payload = head + filt.astype(np.uint8).tobytes()
        got = vp8.decode_alpha(payload, w, h)
        assert (got == plane).all(), method

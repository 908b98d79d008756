"""Property-based round-trip invariants for the pure-numpy media codecs.

Encoders here are *test-side* (struct-packed RIFF/BMP writers); the
decoders under test are the production seam (`wav_decode`/`pcm_samples`,
`bmp_decode`/`bmp_pixels`).  encode(decode(x)) == x over random payload
shapes exercises the padding/alignment/row-order corners that fixed
fixtures miss (odd-size RIFF chunks, BMP stride padding at w % 4 != 0,
top-down vs bottom-up row order).  Driver-side only — no SparkSession.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

# Palette/dimension values biased to the 2^n boundaries where variable-width
# codecs (GIF LZW, prefix codes) reset or widen their dictionaries — the
# round-3 GIF end-of-stream bug lived exactly on such a boundary and was
# invisible to fixed fixtures and uniform-random draws alike.
_pow2_boundaries = st.sampled_from(
    [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65,
     127, 128, 129, 255, 256]
)
_palette_sizes = st.one_of(_pow2_boundaries, st.integers(1, 256))
_boundary_dims = st.one_of(
    st.sampled_from([1, 2, 3, 4, 7, 8, 9, 12, 15, 16, 17, 24, 31, 32]),
    st.integers(1, 32),
)

from pr2_transformation_spark.functions import multimodal


def wav_bytes(samples: np.ndarray, sample_rate: int, n_channels: int) -> bytes:
    pcm = samples.astype("<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:  # RIFF chunks are 2-byte aligned: odd data gets a pad byte
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def bmp_bytes(img: np.ndarray, top_down: bool) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype="uint8")
    bgr = img[:, :, ::-1] if top_down else img[::-1, :, ::-1]
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    data = rows.tobytes()
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(data), 0, 0, 0, 0
    )
    return file_header + info_header + data


@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    n_frames=st.integers(0, 64),
    n_channels=st.integers(1, 4),
    sample_rate=st.integers(1, 96_000),
)
def test_wav_roundtrip(data, n_frames, n_channels, sample_rate):
    samples = np.array(
        data.draw(
            st.lists(
                st.integers(-(2**15), 2**15 - 1),
                min_size=n_frames * n_channels,
                max_size=n_frames * n_channels,
            )
        ),
        dtype=np.int64,
    ).reshape(n_frames, n_channels)
    raw = wav_bytes(samples, sample_rate, n_channels)
    meta = multimodal.wav_decode(raw)
    assert meta["n_frames"] == n_frames
    assert meta["n_channels"] == n_channels
    assert meta["sample_rate_hz"] == sample_rate
    assert meta["duration_ms"] == int(round(n_frames * 1000 / sample_rate))
    got = multimodal.pcm_samples(raw)
    assert got.shape == (n_frames, n_channels)
    assert np.array_equal(got, samples)


@settings(max_examples=100, deadline=None)
@given(
    data=st.data(),
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    top_down=st.booleans(),
)
def test_bmp_pixel_roundtrip(data, w, h, top_down):
    flat = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
    )
    img = np.array(flat, dtype="uint8").reshape(h, w, 3)
    raw = bmp_bytes(img, top_down)
    meta = multimodal.bmp_decode(raw)
    assert (meta["width"], meta["height"]) == (w, h)
    assert np.array_equal(multimodal.bmp_pixels(raw), img)


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(max_size=80))
def test_decoders_reject_or_parse_never_crash(junk):
    """Arbitrary bytes either parse (if they happen to be valid headers) or
    raise ValueError — never IndexError/struct.error, since at 100 TB
    decode errors must be catchable data, not executor crashes."""
    for decode in (
        multimodal.wav_decode,
        multimodal.bmp_decode,
        multimodal.pcm_samples,
        multimodal.bmp_pixels,
    ):
        try:
            decode(junk)
        except ValueError:
            pass


def test_truncated_headers_raise_value_error_not_struct_error():
    """Headers whose declared sizes lie about the actual payload length are
    the adversarial case random fuzzing rarely hits: a fmt chunk claiming
    16 bytes with 4 present, a BMP cut off mid-info-header, a pixel array
    shorter than stride*height."""
    import pytest

    fmt_lies = b"RIFF" + struct.pack("<I", 16) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    with pytest.raises(ValueError):
        multimodal.wav_decode(fmt_lies)

    img = np.zeros((2, 2, 3), dtype="uint8")
    full = bmp_bytes(img, top_down=False)
    with pytest.raises(ValueError):
        multimodal.bmp_pixels(full[:30])  # mid-info-header cut
    with pytest.raises(ValueError):
        multimodal.bmp_pixels(full[:-5])  # pixel array short of stride*h


@settings(max_examples=200, deadline=None)
@given(
    w=_boundary_dims,
    h=_boundary_dims,
    channels=st.sampled_from([1, 2, 3, 4]),
    mode=st.sampled_from(["none", "sub", "up", "average", "paeth", "mixed"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, channels, mode, seed):
    """png_encode -> png_pixels is the identity over random shapes,
    channel counts, and every filter mode."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels), dtype="uint8")
    assert np.array_equal(
        multimodal.png_pixels(multimodal.png_encode(img, filters=mode)), img
    )


@settings(max_examples=250, deadline=None)
@given(
    w=_boundary_dims,
    h=_boundary_dims,
    ncolors=_palette_sizes,
    seed=st.integers(0, 2**31 - 1),
)
@example(w=12, h=17, ncolors=36, seed=0)  # round-3 EOI code-width desync
@example(w=8, h=8, ncolors=5, seed=0)     # q133 ':b' boundary fixture shape
def test_gif_roundtrip_property(w, h, ncolors, seed):
    """gif_encode -> gif_pixels is the identity for any palette size,
    including depths that force width growth mid-stream AND the
    end-of-stream phantom-add widening (the round-3 bug, pinned by the
    explicit @example)."""
    rng = np.random.default_rng(seed)
    pal = np.unique(
        rng.integers(0, 256, size=(ncolors, 3), dtype="uint8"), axis=0
    )
    img = pal[rng.integers(0, len(pal), size=(h, w))]
    assert np.array_equal(multimodal.gif_pixels(multimodal.gif_encode(img)), img)


@settings(max_examples=200, deadline=None)
@given(
    w=_boundary_dims,
    h=_boundary_dims,
    rgba=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_webp_roundtrip_property(w, h, rgba, seed):
    """webp_encode -> webp_pixels is the identity over random RGB(A)
    content — exercises canonical prefix-code assignment across wildly
    different channel histograms."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 4 if rgba else 3), dtype="uint8")
    dec = multimodal.webp_pixels(multimodal.webp_encode(img))
    want = img if rgba else np.concatenate(
        [img, np.full((h, w, 1), 255, "uint8")], axis=2
    )
    assert np.array_equal(dec, want)


@settings(max_examples=200, deadline=None)
@given(
    bw=st.integers(1, 5),
    bh=st.integers(1, 5),
    ri=st.sampled_from([0, 1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_flat_blocks_property(bw, bh, ri, seed):
    """Block-flat grayscale at quality=100 is BIT-exact through the full
    baseline JPEG pipeline for any block grid and restart interval."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(bh, bw), dtype="uint8")
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = multimodal.jpeg_pixels(
        multimodal.jpeg_encode(img, quality=100, restart_interval=ri)
    )
    assert np.array_equal(dec[:, :, 0], img)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 41),
    h=st.integers(1, 41),
    color=st.booleans(),
    sub=st.booleans(),
    quality=st.sampled_from([25, 60, 90, 100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_property(w, h, color, sub, quality, seed):
    """Progressive (SOF2) encode of ANY image decodes bit-identically to
    decoding the baseline encode of the same pixels — the two entropy
    layerings carry the same quantized coefficients, so the multi-scan
    accumulator (spectral selection + successive approximation + EOB
    runs) must reconstruct them exactly at every shape/quality."""
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype="uint8")
    sub = sub and color
    base = multimodal.jpeg_pixels(
        multimodal.jpeg_encode(img, quality=quality, subsample=sub)
    )
    prog = multimodal.jpeg_pixels(
        multimodal.jpeg_encode_progressive(img, quality=quality, subsample=sub)
    )
    assert np.array_equal(base, prog)


@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    n=st.one_of(st.sampled_from([0, 1, 2, 255, 256, 257]), st.integers(0, 512)),
)
def test_mulaw_roundtrip_property(data, n):
    """G.711 mu-law canonical identities over arbitrary PCM: byte identity
    encode(decode(b)) == b (modulo the documented -0 -> +0 collapse at
    0x7F) and quantization error bounded by half the top-segment step."""
    samples = np.array(
        data.draw(st.lists(st.integers(-(2**15), 2**15 - 1), min_size=n, max_size=n)),
        dtype=np.int16,
    )
    enc = multimodal.mulaw_encode(samples)
    assert len(enc) == n
    dec = multimodal.mulaw_decode(enc).astype(np.int64)
    clamped = np.clip(samples.astype(np.int64), -32635, 32635)
    assert np.abs(dec - clamped).max(initial=0) <= 512
    rt = multimodal.mulaw_encode(dec.astype(np.int16))
    # byte identity except the documented -0 (0x7F) -> +0 (0xFF) collapse
    assert all((a == b) or (b == 0x7F and a == 0xFF) for a, b in zip(rt, enc))


@settings(max_examples=200, deadline=None)
@given(
    amp=st.integers(0, 8000),
    period=st.integers(15, 200),
    phase=st.integers(0, 628),
    n=st.integers(1, 800),
)
def test_ima_adpcm_tracking_property(amp, period, phase, n):
    """IMA ADPCM over band-limited content: exact 4:1 nibble packing and
    the decoder tracks the encoder's predictor with bounded RMS error —
    the adaptive step size must converge for ANY slow signal, not just
    the fixed sine mixture in the example test."""
    t = np.arange(n, dtype=np.float64)
    s = (amp * np.sin(t / period + phase / 100.0)).astype(np.int16)
    enc = multimodal.ima_adpcm_encode(s)
    assert len(enc) == (n + 1) // 2
    dec = multimodal.ima_adpcm_decode(enc, n)
    err = dec.astype(np.int64) - s.astype(np.int64)
    # the predictor starts at 0 with the minimum step, so the first ~dozen
    # samples are a documented startup transient (step index climbs <=8 per
    # sample); grade RMS after a 64-sample warm-up, like a real decoder would
    if n > 64:
        tail = err[64:]
        assert float(np.sqrt((tail * tail).mean())) < 800


@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    n_frames=st.integers(1, 3),
    bw=st.integers(1, 2),
    bh=st.integers(1, 2),
    container=st.sampled_from(["mp4", "avi"]),
)
def test_container_flat_frames_roundtrip_property(data, n_frames, bw, bh, container):
    """MP4 sample-table navigation and AVI movi-chunk walks return every
    frame bit-exactly for block-flat MJPEG content at quality 100, for
    any frame count and block grid (stsz/stco arithmetic and RIFF chunk
    padding are the parts fixed fixtures under-exercise)."""
    frames = []
    for _ in range(n_frames):
        vals = data.draw(
            st.lists(st.integers(0, 255), min_size=bh * bw, max_size=bh * bw)
        )
        blocks = np.array(vals, dtype="uint8").reshape(bh, bw)
        frames.append(np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1))
    if container == "mp4":
        blob = multimodal.mp4_encode(frames, fps=25)
        got = multimodal.mp4_frames(blob)
        assert multimodal.mp4_decode(blob)["n_frames"] == n_frames
    else:
        blob = multimodal.avi_encode(frames, fps=25)
        got = multimodal.avi_frames(blob)
    assert len(got) == n_frames
    for want, have in zip(frames, got):
        assert np.array_equal(have[:, :, 0], want)


@settings(max_examples=60, deadline=None)
@given(payload=st.binary(min_size=0, max_size=400), seed=st.integers(0, 3))
def test_decoders_reject_garbage_with_valueerror(payload, seed):
    """Every decoder either decodes or raises ValueError — never an
    IndexError/struct.error/KeyError crash — on arbitrary bytes,
    including bytes that START with a valid magic (seed-selected prefix)
    but are garbage after it.  Decode errors are data, not job failures:
    a fuzzed payload must land in the documented exception contract."""
    prefix = [b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"RIFF\xff\xff\xff\xffWEBP"][seed]
    data = prefix + payload
    for fn in (
        multimodal.image_decode,
        multimodal.image_pixels,
        multimodal.wav_decode,
        multimodal.avi_decode,
        multimodal.webp_decode,
        multimodal.jpeg_decode,
    ):
        try:
            fn(data)
        except ValueError:
            pass  # the documented contract


@settings(max_examples=30, deadline=None)
@given(payload=st.binary(min_size=0, max_size=300))
def test_frame_and_pixel_walkers_reject_garbage(payload):
    """The chunk walkers with internal loops (GIF LZW, AVI movi, VP8L
    prefix trees, JPEG scan) also honor the ValueError-only contract on
    truncated/garbage streams behind valid headers."""
    img = np.zeros((2, 2, 3), dtype="uint8")
    half_gif = multimodal.gif_encode(img)[: 13 + 12] + payload
    half_avi = multimodal.avi_encode([np.zeros((8, 8), "uint8")])[:64] + payload
    half_webp = multimodal.webp_encode(img)[:24] + payload
    half_jpeg = multimodal.jpeg_encode(img)[:40] + payload
    for fn, data in (
        (multimodal.gif_pixels, half_gif),
        (multimodal.avi_frames, half_avi),
        (multimodal.webp_pixels, half_webp),
        (multimodal.jpeg_pixels, half_jpeg),
    ):
        try:
            fn(data)
        except ValueError:
            pass


@given(
    bw=st.integers(1, 6),
    bh=st.integers(1, 6),
    n_frames=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    mode=st.sampled_from(["uniform", "quad", "busy"]),
)
@settings(max_examples=120, deadline=None)
def test_msvideo1_roundtrip_property(bw, bh, n_frames, seed, mode):
    """MS Video 1 invariants over random clips: frames whose 2x2
    quadrants each hold <= 2 distinct RGB555 colors round-trip exactly
    (uniform/quad modes); busy frames still decode to the encoder's own
    reconstruction deterministically; an appended identical frame always
    costs exactly one 2-byte skip code; every stream passes the
    wire-format conformance walk."""
    from tests.test_multimodal import _msv1_validate_stream

    rng = np.random.RandomState(seed)
    h, w = bh * 4, bw * 4
    frames = []
    for _ in range(n_frames):
        if mode == "uniform":
            f = np.repeat(np.repeat(
                rng.randint(0, 256, (bh, bw, 3), dtype=np.uint8), 4, 0), 4, 1)
        elif mode == "quad":
            f = np.repeat(np.repeat(
                rng.randint(0, 256, (bh * 2, bw * 2, 3), dtype=np.uint8), 2, 0), 2, 1)
        else:
            f = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        frames.append(f)
    frames.append(frames[-1].copy())  # identical tail frame
    avi = multimodal.msvideo1_encode(frames, sse_8color=-1.0)
    bodies = list(multimodal._avi_chunk_bodies(avi))
    for body in bodies:
        _msv1_validate_stream(body, bw * bh)
    assert len(bodies[-1]) == 2  # pure skip
    decoded = multimodal.msvideo1_frames(avi)
    assert len(decoded) == len(frames)
    assert np.array_equal(decoded[-1], decoded[-2])
    if mode in ("uniform", "quad"):
        for f, d in zip(frames, decoded):
            expected = multimodal._rgb555_expand(multimodal._rgb555_quantize(f))
            assert np.array_equal(d, expected)
    # determinism: a second encode/decode cycle is bit-identical
    assert multimodal.msvideo1_encode(frames, sse_8color=-1.0) == avi


@given(
    n=st.one_of(st.sampled_from([1, 2, 15, 16, 17, 31, 32, 33, 512]),
                st.integers(1, 700)),
    block_size=st.sampled_from([16, 17, 32, 64, 192, 333, 512]),
    channels=st.integers(1, 3),
    use_lpc=st.booleans(),
    kind=st.sampled_from(["noise", "tone", "ramp", "const", "alt"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_flac_lossless_property(n, block_size, channels, use_lpc, kind, seed):
    """decode(encode(x)) == x bit-exactly for every content class,
    channel count, and block/tail-size combination — including the
    full-range extremes where residual folding and warmup signs bite."""
    rng = np.random.RandomState(seed)
    if kind == "noise":
        s = rng.randint(-32768, 32768, (n, channels)).astype(np.int16)
    elif kind == "tone":
        t = np.arange(n)[:, None] + np.arange(channels)[None, :] * 7
        s = (9000 * np.sin(t / (3 + seed % 40))).astype(np.int16)
    elif kind == "ramp":
        s = ((np.arange(n)[:, None] * (1 + seed % 97)) % 65536 - 32768).astype(np.int16)
        s = np.repeat(s, channels, axis=1)[:, :channels]
    elif kind == "const":
        s = np.full((n, channels), (seed % 65536) - 32768, dtype=np.int16)
    else:  # alternating extremes
        s = np.where(np.arange(n)[:, None] % 2 == 0, 32767, -32768).astype(np.int16)
        s = np.repeat(s, channels, axis=1)[:, :channels]
    enc = multimodal.flac_encode(s, 16000, block_size=block_size, use_lpc=use_lpc)
    dec, sr = multimodal.flac_decode(enc)
    assert sr == 16000
    assert dec.shape == s.shape
    assert np.array_equal(dec, s)
    # determinism
    assert multimodal.flac_encode(s, 16000, block_size=block_size, use_lpc=use_lpc) == enc


@settings(max_examples=150, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 200),
    style=st.sampled_from(["random", "runs", "mixed", "constant"]),
    comp=st.sampled_from(["packbits", "none"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, style, comp, seed):
    """Any gray-8 array round-trips through the TIFF codec under both
    compressions — run-heavy content (the PackBits boundary-case
    generator: exact 128-byte runs, 2-byte almost-runs) included."""
    import numpy as np

    from pr2_transformation_spark.functions import multimodal as mm

    rng = np.random.RandomState(seed % 2**32)
    if style == "random":
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    elif style == "constant":
        px = np.full((h, w), seed % 256, dtype=np.uint8)
    elif style == "runs":
        row = np.repeat(
            rng.randint(0, 256, size=max(1, w // 7 + 1)), 7
        )[:w].astype(np.uint8)
        px = np.tile(row, (h, 1))
    else:  # mixed: alternate literal rows and run rows
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        px[::2] = (seed % 251)
    enc = mm.tiff_encode(px, compression=comp)
    assert (mm.tiff_pixels(enc) == px).all()
    meta = mm.tiff_decode(enc)
    assert (meta["width"], meta["height"]) == (w, h)


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(max_size=60))
def test_tiff_decode_rejects_or_parses_junk(junk):
    """Arbitrary bytes either parse (if they happen to be a valid
    header chain) or raise ValueError — never a struct/index crash."""
    from pr2_transformation_spark.functions import multimodal as mm

    try:
        mm.tiff_decode(junk)
    except ValueError:
        pass

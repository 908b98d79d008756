"""Multimodal column plumbing: metadata structs, the Arrow decode seam
(real BMP header decoder + stub), and the frame-sample fan-out."""

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from pr2_transformation_spark.functions import multimodal


def _bmp_bytes(width: int, height: int) -> bytes:
    """Minimal valid BMP: 14-byte file header + 40-byte BITMAPINFOHEADER."""
    file_header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    return file_header + info_header


def test_bmp_decode_pure_python():
    meta = multimodal.bmp_decode(_bmp_bytes(640, 480))
    assert meta == {"media_type": "image", "format": "bmp", "width": 640, "height": 480}
    # top-down BMPs carry negative height; dimensions are absolute
    assert multimodal.bmp_decode(_bmp_bytes(16, -32))["height"] == 32
    with pytest.raises(ValueError):
        multimodal.bmp_decode(b"not a bitmap")


def test_decode_media_populates_dimensions(spark):
    """The decoder seam carries REAL decode results end-to-end: a genuine
    BMP fixture comes back with its parsed width/height, a non-media payload
    yields NULL media fields (decode errors are data, not job failures)."""
    rows = [
        ("img1", _bmp_bytes(640, 480)),
        ("img2", _bmp_bytes(31, 7)),
        ("junk", b"plain text, not an image"),
    ]
    df = spark.createDataFrame(rows, "asset string, payload binary")
    out = {
        r["asset_id"]: r
        for r in multimodal.decode_media(df, "payload", "asset", decoder=multimodal.bmp_decode).collect()
    }
    assert (out["img1"]["width"], out["img1"]["height"]) == (640, 480)
    assert (out["img2"]["width"], out["img2"]["height"]) == (31, 7)
    assert out["img1"]["format"] == "bmp" and out["img1"]["media_type"] == "image"
    assert out["junk"]["width"] is None and out["junk"]["format"] is None
    assert out["junk"]["n_bytes"] == len(b"plain text, not an image")


def test_decode_media_requires_decoder(spark):
    df = spark.createDataFrame([("a", b"x")], "asset string, payload binary")
    with pytest.raises(NotImplementedError, match="decoder callable"):
        multimodal.decode_media(df, "payload", "asset", decoder=None)


def test_extract_features_stub_and_none_paths(spark):
    df = spark.createDataFrame([("a", b"hello"), ("b", None)], "asset string, payload binary")
    feats = {r["asset_id"]: r for r in multimodal.extract_features(df, "payload", "asset").collect()}
    assert feats["a"]["sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert feats["a"]["n_bytes"] == 5
    assert feats["b"]["sha256"] == hashlib.sha256(b"").hexdigest()  # NULL payload -> empty
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(df, "payload", "asset", decoder=None)


def test_attach_media_metadata_struct(spark):
    df = spark.createDataFrame([("a", b"xyz")], "asset string, payload binary")
    out = multimodal.attach_media_metadata(df, "payload", "image", "bmp").first()
    meta = out["payload_meta"]
    assert meta["media_type"] == "image" and meta["format"] == "bmp"
    assert meta["width"] is None and meta["n_bytes"] == 3


def test_sample_frames_fanout_and_determinism(spark):
    payload = b"v" * 200  # 200 // 64 = 3 fake frames
    df = spark.createDataFrame([("vid", payload)], "asset string, payload binary")
    rows = multimodal.sample_frames(df, "payload", "asset", every_nth=64).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    expect0 = hashlib.sha256(payload + b"#0").hexdigest()[:12]
    assert rows[0]["frame_crc"] == expect0


def _wav_bytes(samples, sample_rate=8000, n_channels=1):
    """Minimal valid RIFF/WAVE: fmt chunk + 16-bit PCM data chunk."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _full_bmp_bytes(pixels_rgb) -> bytes:
    """Valid 24-bit BMP with a pixel array (bottom-up rows, 4-byte pad)."""
    import numpy as np

    img = np.asarray(pixels_rgb, dtype="uint8")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype="uint8")
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = rows.tobytes()
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return file_header + info_header + data


def test_wav_decode_and_samples_pure_numpy():
    import numpy as np

    samples = [0, 1000, -1000, 500, -500, 0, 2000, -2000]
    raw = _wav_bytes(samples, sample_rate=4000)
    meta = multimodal.wav_decode(raw)
    assert (meta["n_channels"], meta["sample_rate_hz"], meta["bit_depth"]) == (1, 4000, 16)
    assert meta["n_frames"] == len(samples)
    assert meta["duration_ms"] == 2  # 8 frames / 4000 Hz
    assert np.array_equal(multimodal.pcm_samples(raw).ravel(), np.array(samples))
    for bad in (b"", b"RIFFxxxxNOPE", b"plain text"):
        with pytest.raises(ValueError):
            multimodal.wav_decode(bad)


def test_audio_features_end_to_end(spark):
    import numpy as np

    samples = [1000, -1000] * 50  # alternating: zcr ~ 1, rms = 1000
    rows = [("a1", _wav_bytes(samples)), ("junk", b"not audio")]
    df = spark.createDataFrame(rows, "asset string, payload binary")
    out = {r["asset_id"]: r for r in
           multimodal.audio_features(df, "payload", "asset").collect()}
    a1 = out["a1"]
    assert a1["sample_rate_hz"] == 8000 and a1["n_channels"] == 1
    assert a1["rms"] == "1000.0000"
    assert float(a1["zero_cross_rate"]) > 0.98
    assert a1["peak"] == 1000
    assert out["junk"]["rms"] is None  # undecodable -> NULL features, row kept


def test_bmp_pixels_roundtrip_and_resize(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype="uint8")
    raw = _full_bmp_bytes(img)
    assert np.array_equal(multimodal.bmp_pixels(raw), img)  # exact pixel roundtrip

    rows = [("i1", raw), ("junk", b"nope")]
    df = spark.createDataFrame(rows, "asset string, payload binary")
    out = {r["asset_id"]: r for r in
           multimodal.resize_images(df, "payload", "asset", 2, 3).collect()}
    got = np.frombuffer(out["i1"]["rgb"], dtype="uint8").reshape(3, 2, 3)
    yi = (np.arange(3) * 6 // 3).clip(0, 5)
    xi = (np.arange(2) * 5 // 2).clip(0, 4)
    assert np.array_equal(got, img[yi][:, xi])  # nearest-neighbor exactness
    assert out["junk"]["rgb"] is None


def test_wav_multiple_data_chunks_use_first_chunk_consistently():
    """A RIFF file with TWO data chunks: frame count and samples must both
    come from the FIRST chunk (regression: wav_decode used to keep the last
    chunk's size while pcm_samples read the first chunk's bytes)."""
    import numpy as np

    first = [100, -100, 200, -200]
    second = [9, 9]  # different length AND content than the first chunk
    raw = _wav_bytes(first, sample_rate=4000)
    pcm2 = np.asarray(second, dtype="<i2").tobytes()
    raw2 = raw + b"data" + struct.pack("<I", len(pcm2)) + pcm2
    raw2 = raw2[:4] + struct.pack("<I", len(raw2) - 8) + raw2[8:]  # fix RIFF size

    meta = multimodal.wav_decode(raw2)
    assert meta["n_frames"] == len(first)  # first chunk's frame count
    assert np.array_equal(multimodal.pcm_samples(raw2).ravel(), np.array(first))


def _png_bytes(img, color_type, filters=None):
    """Minimal PNG encoder for fixtures: 8-bit, non-interlaced, one IDAT,
    per-row filter type taken from ``filters`` (cycled) so every decoder
    filter path (None/Sub/Up/Average/Paeth) gets exercised."""
    import zlib

    import numpy as np

    img = np.asarray(img, dtype="uint8")
    h, w = img.shape[:2]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    flat = img.reshape(h, w * channels).astype(np.int32)
    filters = filters or [0]
    bpp = channels
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        line = flat[y]
        if ft == 0:
            enc = line.copy()
        elif ft == 1:
            enc = line.copy()
            enc[bpp:] = (line[bpp:] - line[:-bpp]) % 256
        elif ft == 2:
            enc = (line - prev) % 256
        elif ft == 3:
            enc = line.copy()
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) % 256
        elif ft == 4:
            enc = line.copy()
            for i in range(len(line)):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) % 256
        raw.append(ft)
        raw.extend(enc.astype("uint8").tobytes())
        prev = line

    def chunk(ctype, data):
        import zlib as _z
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_and_pixels_all_filters():
    import numpy as np

    rng = np.random.default_rng(11)
    for color_type, shape in [(0, (9, 7, 1)), (2, (10, 5, 3)),
                              (4, (6, 6, 2)), (6, (7, 4, 4))]:
        img = rng.integers(0, 256, size=shape, dtype="uint8")
        raw = _png_bytes(img, color_type, filters=[0, 1, 2, 3, 4])
        meta = multimodal.png_decode(raw)
        assert (meta["width"], meta["height"]) == (shape[1], shape[0])
        assert meta["format"] == "png" and meta["bit_depth"] == 8
        got = multimodal.png_pixels(raw)
        assert np.array_equal(got, img), f"color_type={color_type}"

    for bad in (b"", b"\x89PNG\r\n\x1a\njunk", b"BMnot a png", b"plain"):
        with pytest.raises(ValueError):
            multimodal.png_decode(bad)


def test_png_decode_single_filter_each():
    """Each filter type alone, full image — catches a filter whose bug
    cancels out when mixed with others."""
    import numpy as np

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(8, 9, 3), dtype="uint8")
    for ft in range(5):
        raw = _png_bytes(img, 2, filters=[ft])
        assert np.array_equal(multimodal.png_pixels(raw), img), f"filter={ft}"


def test_image_dispatch_and_resize_png(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype="uint8")
    png = _png_bytes(img, 2, filters=[4])
    bmp = _full_bmp_bytes(img)
    assert np.array_equal(multimodal.image_pixels(png), img)
    assert np.array_equal(multimodal.image_pixels(bmp), img)
    assert multimodal.image_decode(png)["format"] == "png"
    assert multimodal.image_decode(bmp)["format"] == "bmp"

    gray = rng.integers(0, 256, size=(6, 5, 1), dtype="uint8")
    rows = [("p1", png), ("g1", _png_bytes(gray, 0)), ("junk", b"\xff\xd8jpeg?")]
    df = spark.createDataFrame(rows, "asset string, payload binary")
    out = {r["asset_id"]: r for r in
           multimodal.resize_images(df, "payload", "asset", 2, 3).collect()}
    got = np.frombuffer(out["p1"]["rgb"], dtype="uint8").reshape(3, 2, 3)
    yi = (np.arange(3) * 6 // 3).clip(0, 5)
    xi = (np.arange(2) * 5 // 2).clip(0, 4)
    assert np.array_equal(got, img[yi][:, xi])
    gotg = np.frombuffer(out["g1"]["rgb"], dtype="uint8").reshape(3, 2, 3)
    assert np.array_equal(gotg, np.repeat(gray, 3, axis=2)[yi][:, xi])
    assert out["junk"]["rgb"] is None  # jpeg stays at the injection seam

    # decode_media with the dispatching decoder fills real dimensions
    meta = {r["asset_id"]: r for r in multimodal.decode_media(
        df, "payload", "asset", decoder=multimodal.image_decode
    ).collect()}
    assert (meta["p1"]["width"], meta["p1"]["height"]) == (5, 6)
    assert meta["junk"]["width"] is None


def test_png_encode_roundtrip_all_modes():
    """png_encode -> png_pixels is the identity for every channel count and
    every filter mode; the test-local _png_bytes encoder (independently
    written) decodes our encoder's exact pixels too, cross-checking both."""
    import numpy as np

    rng = np.random.default_rng(23)
    for channels in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(9, 6, channels), dtype="uint8")
        for mode in ("none", "sub", "up", "average", "paeth", "mixed"):
            raw = multimodal.png_encode(img, filters=mode)
            assert np.array_equal(multimodal.png_pixels(raw), img), (
                channels, mode)
    # 2-D grayscale input gains the trailing channel axis on decode
    g = rng.integers(0, 256, size=(4, 8), dtype="uint8")
    assert np.array_equal(multimodal.png_pixels(multimodal.png_encode(g)),
                          g[:, :, None])
    with pytest.raises(ValueError):
        multimodal.png_encode(g, filters="adaptive")
    with pytest.raises(ValueError):
        multimodal.png_encode(g[:0])


def test_image_checksums_values_and_corruption_sensitivity(spark):
    """image_checksums emits exact position-weighted sums over decoded
    pixels (computed independently here), and pixel_wsum distinguishes a
    row-flipped image whose pixel_sum is identical."""
    import numpy as np

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    flipped = img[::-1]
    df = spark.createDataFrame(
        [(1, multimodal.png_encode(img)), (2, multimodal.png_encode(flipped))],
        "asset long, payload binary",
    )
    rows = {r["asset_id"]: r
            for r in multimodal.image_checksums(df, "payload", "asset").collect()}
    flat = img.reshape(-1).astype(np.int64)
    assert rows["1"]["pixel_sum"] == int(flat.sum())
    assert rows["1"]["pixel_wsum"] == int((flat * (np.arange(24) + 1)).sum())
    assert (rows["1"]["height"], rows["1"]["width"], rows["1"]["channels"]) == (2, 4, 3)
    assert rows["2"]["pixel_sum"] == rows["1"]["pixel_sum"]
    assert rows["2"]["pixel_wsum"] != rows["1"]["pixel_wsum"]


def test_gif_hand_built_fixture_decodes_exact_pixels():
    """A 2x2 GIF87a assembled by hand (palette, descriptor, and the
    LSB-first variable-width LZW codes packed byte-by-byte in this repo's
    history — NOT via gif_encode) decodes to the exact palette colors;
    pins the decoder against an encoder-independent byte stream."""
    import numpy as np

    gif = bytes.fromhex(
        "474946383761020002008100000a141e28323c46505ac8d2dc"
        "2c0000000002000200000203443405003b"
    )
    meta = multimodal.gif_decode(gif)
    assert (meta["width"], meta["height"], meta["version"]) == (2, 2, "87a")
    assert meta["has_gct"] and meta["gct_size"] == 4
    expect = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [200, 210, 220]]],
        dtype=np.uint8,
    )
    assert np.array_equal(multimodal.gif_pixels(gif), expect)


def test_gif_encode_roundtrip_including_table_overflow():
    """gif_encode -> gif_pixels is the identity: small palettes, a
    single-color run (KwKwK codes), and a 200x300 random 256-color image
    whose LZW table overflows 12 bits and forces the mid-stream CLEAR."""
    import numpy as np

    rng = np.random.default_rng(31)
    pal = np.unique(rng.integers(0, 256, size=(256, 3), dtype="uint8"), axis=0)
    for shape, ncol in [((7, 9), 5), ((1, 1), 1), ((3, 50), 2), ((200, 300), len(pal))]:
        img = pal[: max(ncol, 1)][rng.integers(0, ncol, size=shape)]
        assert np.array_equal(multimodal.gif_pixels(multimodal.gif_encode(img)), img), shape
    run = pal[np.zeros((40, 40), dtype=int)]
    assert np.array_equal(multimodal.gif_pixels(multimodal.gif_encode(run)), run)
    with pytest.raises(ValueError):
        multimodal.gif_encode(np.zeros((2, 2, 4), dtype="uint8"))
    with pytest.raises(ValueError):
        multimodal.gif_decode(b"GIF89a")  # truncated
    with pytest.raises(ValueError):
        multimodal.gif_decode(b"not a gif at all....")


def test_gif_dispatch_and_checksums(spark):
    """image_decode/image_pixels dispatch GIF; image_checksums flows GIF
    payloads through the same audit path as PNG/BMP."""
    import numpy as np

    img = np.array([[[9, 8, 7], [6, 5, 4]]], dtype=np.uint8)
    gif = multimodal.gif_encode(img)
    assert multimodal.image_decode(gif)["format"] == "gif"
    assert np.array_equal(multimodal.image_pixels(gif), img)
    df = spark.createDataFrame([(5, gif)], "asset long, payload binary")
    (row,) = multimodal.image_checksums(df, "payload", "asset").collect()
    assert row["pixel_sum"] == int(img.astype("int64").sum())
    assert (row["height"], row["width"], row["channels"]) == (1, 2, 3)


def test_jpeg_flat_blocks_bit_exact_at_q100():
    """Block-flat images round-trip BIT-exactly through the real baseline
    JPEG codec at quality=100 (all-ones quant => integer DC, zero AC) —
    grayscale and RGB 4:4:4, with and without restart markers."""
    import numpy as np

    rng = np.random.default_rng(41)
    blocks = rng.integers(0, 256, size=(3, 5), dtype="uint8")
    gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    for ri in (0, 1, 3):
        dec = multimodal.jpeg_pixels(
            multimodal.jpeg_encode(gray, quality=100, restart_interval=ri))
        assert dec.shape == (24, 40, 1)
        assert np.array_equal(dec[:, :, 0], gray), f"restart_interval={ri}"
    rgb = np.repeat(np.repeat(
        rng.integers(0, 256, size=(2, 3, 3), dtype="uint8"), 8, axis=0), 8, axis=1)
    assert np.array_equal(
        multimodal.jpeg_pixels(multimodal.jpeg_encode(rgb, quality=100)), rgb)


def test_jpeg_lossy_modes_bounded_error():
    """Non-flat content and lossy settings stay within tight error bounds:
    the decoder's Huffman/dequant/IDCT agree with the encoder's inverse
    to rounding, 4:2:0 mean-pool/upsample round-trips 16px-aligned color,
    and ragged (non-multiple-of-8) dimensions crop correctly."""
    import numpy as np

    rng = np.random.default_rng(43)
    noise = rng.integers(0, 256, size=(32, 40, 3), dtype="uint8")
    dec = multimodal.jpeg_pixels(multimodal.jpeg_encode(noise, quality=100))
    assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 3
    grad = np.outer(np.ones(48), np.linspace(0, 255, 64)).astype("uint8")
    dec2 = multimodal.jpeg_pixels(multimodal.jpeg_encode(grad, quality=95))
    assert np.abs(dec2[:, :, 0].astype(int) - grad.astype(int)).max() <= 2
    col = np.repeat(np.repeat(
        rng.integers(0, 256, size=(3, 2, 3), dtype="uint8"), 16, axis=0), 16, axis=1)
    ragged = col[:41, :27]
    dec3 = multimodal.jpeg_pixels(
        multimodal.jpeg_encode(ragged, quality=100, subsample=True, restart_interval=2))
    assert dec3.shape == ragged.shape
    assert np.abs(dec3.astype(int) - ragged.astype(int)).max() <= 1


def test_jpeg_header_decode_and_rejection():
    import numpy as np

    img = np.zeros((10, 18, 3), dtype="uint8")
    meta = multimodal.jpeg_decode(multimodal.jpeg_encode(img, subsample=True))
    assert (meta["width"], meta["height"], meta["n_components"]) == (18, 10, 3)
    assert meta["sampling"][1] == (2, 2)  # luma 2x2 when subsampled
    assert multimodal.image_decode(
        multimodal.jpeg_encode(img))["format"] == "jpeg"
    with pytest.raises(ValueError):
        multimodal.jpeg_decode(b"\xff\xd8\x00\x00junk")
    with pytest.raises(ValueError):
        multimodal.jpeg_decode(b"PNG?")
    with pytest.raises(ValueError):
        multimodal.jpeg_encode(img, quality=0)


def test_jpeg_progressive_decodes_identical_to_baseline():
    """A progressive (SOF2) stream carrying the SAME quantized coefficients
    as the baseline encoding — libjpeg's standard multi-scan script with
    spectral selection, successive approximation, and cross-block EOB runs
    — must decode to the BIT-identical pixel array, for grayscale, RGB
    4:4:4, 4:2:0, and ragged dimensions, across quality levels."""
    import numpy as np

    rng = np.random.default_rng(47)
    base = np.add.outer(np.linspace(0, 200, 37), np.linspace(0, 55, 29))
    gray = np.clip(base + rng.normal(0, 35, (37, 29)), 0, 255).astype("uint8")
    rgb = np.stack([gray, np.roll(gray, 3, 0), np.roll(gray, 5, 1)], axis=-1)
    for img, sub in [(gray, False), (rgb, False), (rgb, True)]:
        for q in (35, 90, 100):
            b = multimodal.jpeg_pixels(
                multimodal.jpeg_encode(img, quality=q, subsample=sub))
            p = multimodal.jpeg_pixels(
                multimodal.jpeg_encode_progressive(img, quality=q, subsample=sub))
            assert np.array_equal(b, p), f"sub={sub} q={q}"


def test_jpeg_progressive_flat_blocks_bit_exact_and_meta():
    """Block-flat images round-trip BIT-exactly through the progressive
    codec at quality=100 (the same all-ones-quant identity the baseline
    pins), maximal EOB runs included; the header decoder reports the
    progressive flag and dimensions from SOF2."""
    import numpy as np

    rng = np.random.default_rng(48)
    blocks = rng.integers(0, 256, size=(4, 6), dtype="uint8")
    gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    payload = multimodal.jpeg_encode_progressive(gray, quality=100)
    assert np.array_equal(multimodal.jpeg_pixels(payload)[:, :, 0], gray)
    meta = multimodal.jpeg_decode(payload)
    assert meta["progressive"] is True
    assert (meta["width"], meta["height"], meta["n_components"]) == (48, 32, 1)
    assert multimodal.jpeg_decode(
        multimodal.jpeg_encode(gray))["progressive"] is False
    # dispatch path decodes progressive payloads too
    assert np.array_equal(
        multimodal.image_pixels(payload)[:, :, 0], gray)
    # payload truncated inside the header segments is a data rejection
    # (ValueError), not a struct/index crash
    with pytest.raises(ValueError):
        multimodal.jpeg_pixels(payload[:30])


def _vp8l_container(payload_bits_writer):
    import struct

    payload = b"\x2f" + payload_bits_writer.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _vp8l_emit_coded_image(bw, argb, main=False):
    """Test-local literal writer for VP8L entropy-coded (sub-)images.
    Main-image position also carries the meta-prefix bit; sub-images
    (transform tiles, palettes) carry only the cache bit."""
    from pr2_transformation_spark.functions import multimodal as m

    bw.bits(0, 1)      # no color cache
    if main:
        bw.bits(0, 1)  # no meta prefix codes
    chans = [[(p >> 8) & 0xFF for p in argb], [(p >> 16) & 0xFF for p in argb],
             [p & 0xFF for p in argb], [(p >> 24) & 0xFF for p in argb]]
    tables = []
    for vals, alphabet in zip(chans, (256 + 24, 256, 256, 256)):
        freqs = {}
        for v in vals:
            freqs[v] = freqs.get(v, 0) + 1
        lengths = m._canonical_lengths(freqs)
        m._vp8l_write_prefix_code(bw, lengths, alphabet)
        tables.append(
            {next(iter(lengths)): (0, 0)}
            if len(lengths) == 1 else m._canonical_codes(lengths)
        )
    m._vp8l_write_prefix_code(bw, {1: 1}, 40)  # unused distance tree
    for i in range(len(argb)):
        for ch, tab in zip(chans, tables):
            c, ln = tab[ch[i]]
            bw.code(c, ln)


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_webp_encode_roundtrip():
    """webp_encode -> webp_pixels is the identity for RGB and RGBA,
    random and constant content (single-symbol zero-bit codes)."""
    import numpy as np

    rng = np.random.default_rng(51)
    for shape in [(5, 9, 3), (1, 1, 3), (16, 16, 4), (7, 3, 4)]:
        img = rng.integers(0, 256, size=shape, dtype="uint8")
        dec = multimodal.webp_pixels(multimodal.webp_encode(img))
        want = img if shape[2] == 4 else np.concatenate(
            [img, np.full(shape[:2] + (1,), 255, "uint8")], axis=2)
        assert np.array_equal(dec, want), shape
    flat = np.full((6, 4, 3), 77, "uint8")
    assert (multimodal.webp_pixels(multimodal.webp_encode(flat))[:, :, :3] == 77).all()
    meta = multimodal.webp_decode(multimodal.webp_encode(flat))
    assert (meta["width"], meta["height"], meta["format"]) == (4, 6, "webp-lossless")
    with pytest.raises(ValueError):
        multimodal.webp_decode(b"RIFF\x00\x00\x00\x00WAVE")


def test_webp_decodes_lz77_backward_reference():
    """Hand-built stream: one literal + a (length 3, distance 1) backward
    reference fills a 4x1 row — pins the prefix-value transform and the
    neighbor distance map, which the literal-only encoder never emits."""
    from pr2_transformation_spark.functions import multimodal as m

    bw = m._Vp8lBitWriter()
    bw.bits(3, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no cache
    bw.bits(0, 1)  # no meta
    m._vp8l_write_prefix_code(bw, {10: 1, 258: 1}, 256 + 24)  # literal g + len code 2
    for lengths, n in (({200: 1}, 256), ({30: 1}, 256), ({255: 1}, 256), ({1: 1}, 40)):
        m._vp8l_write_prefix_code(bw, lengths, n)
    gc = m._canonical_codes({10: 1, 258: 1})
    bw.code(*gc[10])   # literal pixel (r/b/a read zero-bit single codes)
    bw.code(*gc[258])  # length code 2 -> 3 px; distance tree single -> code 1 -> (1,0)
    px = m.webp_pixels(_vp8l_container(bw))
    assert px.shape == (1, 4, 4)
    assert px.tolist()[0] == [[200, 10, 30, 255]] * 4


def test_webp_decodes_color_cache_hits():
    """Hand-built stream with a 2^4 color cache: two literals, then cache
    references re-emit them — pins the 0x1e35a7bd hash indexing."""
    from pr2_transformation_spark.functions import multimodal as m

    bits = 4
    p1, p2 = _argb(255, 9, 200, 33), _argb(255, 77, 5, 210)
    idx = [(0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - bits) for p in (p1, p2)]
    assert idx[0] != idx[1], "fixture colors must hash apart"
    cache_syms = [256 + 24 + i for i in idx]
    bw = m._Vp8lBitWriter()
    bw.bits(3, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(0, 1)          # no transforms
    bw.bits(1, 1)          # color cache present
    bw.bits(bits, 4)
    bw.bits(0, 1)          # no meta
    g_l = {200: 2, 5: 2, cache_syms[0]: 2, cache_syms[1]: 2}
    m._vp8l_write_prefix_code(bw, g_l, 256 + 24 + (1 << bits))
    for lengths, n in (({9: 1, 77: 1}, 256), ({33: 1, 210: 1}, 256),
                       ({255: 1}, 256), ({1: 1}, 40)):
        m._vp8l_write_prefix_code(bw, lengths, n)
    gc = m._canonical_codes(g_l)
    rc = m._canonical_codes({9: 1, 77: 1})
    bc = m._canonical_codes({33: 1, 210: 1})
    bw.code(*gc[200]); bw.code(*rc[9]); bw.code(*bc[33])     # literal p1
    bw.code(*gc[5]); bw.code(*rc[77]); bw.code(*bc[210])     # literal p2
    bw.code(*gc[cache_syms[0]])                              # cache hit p1
    bw.code(*gc[cache_syms[1]])                              # cache hit p2
    px = m.webp_pixels(_vp8l_container(bw))
    assert px.tolist()[0] == [[9, 200, 33, 255], [77, 5, 210, 255],
                              [9, 200, 33, 255], [77, 5, 210, 255]]


def test_webp_decodes_subtract_green_transform():
    """Hand-built stream with the subtract-green transform: stored
    residuals r-g, b-g reconstruct to the true channels."""
    from pr2_transformation_spark.functions import multimodal as m

    bw = m._Vp8lBitWriter()
    bw.bits(0, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)  # 1x1
    bw.bits(1, 1); bw.bits(2, 2)   # transform: subtract-green
    bw.bits(0, 1)                  # end of transforms
    # true pixel (a=255, r=100, g=40, b=50) stored as (r-g, g, b-g)
    _vp8l_emit_coded_image(bw, [_argb(255, (100 - 40) % 256, 40, (50 - 40) % 256)],
                           main=True)
    px = m.webp_pixels(_vp8l_container(bw))
    assert px.tolist() == [[[100, 40, 50, 255]]]


def test_webp_decodes_predictor_transform_left():
    """Hand-built stream with the predictor transform (mode 1 = left):
    stored deltas accumulate across the row."""
    from pr2_transformation_spark.functions import multimodal as m

    bw = m._Vp8lBitWriter()
    w = 4
    bw.bits(w - 1, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(1, 1); bw.bits(0, 2)   # transform: predictor
    bw.bits(0, 3)                  # size_bits = 2 -> 4px tiles -> 1 tile
    _vp8l_emit_coded_image(bw, [_argb(0, 0, 1, 0)])  # tile mode 1 in GREEN (sub-image)
    bw.bits(0, 1)                  # end of transforms
    # residuals: row0 col0 predicts BLACK (0xff000000); others predict L.
    # true pixels: (255,10,20,30), (255,11,22,33), (255,12,24,36), (255,12,24,36)
    res = [
        _argb(0, 10, 20, 30),      # minus 0xff000000 -> alpha byte 0
        _argb(0, 1, 2, 3),
        _argb(0, 1, 2, 3),
        _argb(0, 0, 0, 0),
    ]
    _vp8l_emit_coded_image(bw, res, main=True)
    px = m.webp_pixels(_vp8l_container(bw))
    assert px.tolist()[0] == [[10, 20, 30, 255], [11, 22, 33, 255],
                              [12, 24, 36, 255], [12, 24, 36, 255]]


def test_webp_decodes_color_indexing_with_bundling():
    """Hand-built stream with a 2-color palette: 8 one-bit indices bundle
    into each green byte (packed width 1) and expand through the
    delta-decoded palette."""
    from pr2_transformation_spark.functions import multimodal as m

    bw = m._Vp8lBitWriter()
    w = 8
    bw.bits(w - 1, 14); bw.bits(0, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(1, 1); bw.bits(3, 2)   # transform: color indexing
    bw.bits(1, 8)                  # palette size - 1 = 1 -> 2 colors
    # palette image (2 x 1), DELTA coded: first entry absolute, second
    # entry stored as (second - first) per channel
    c0, c1 = _argb(255, 250, 0, 10), _argb(255, 0, 128, 64)
    delta = 0
    for shift in (0, 8, 16, 24):
        delta |= (((c1 >> shift) - (c0 >> shift)) & 0xFF) << shift
    _vp8l_emit_coded_image(bw, [c0, delta])
    bw.bits(0, 1)                  # end of transforms
    # main image is 1 packed pixel wide: indices 1,0,1,1,0,0,1,0 LSB-first
    packed = 0b01001101
    _vp8l_emit_coded_image(bw, [_argb(0, 0, packed, 0)], main=True)
    px = m.webp_pixels(_vp8l_container(bw))
    want = [c1, c0, c1, c1, c0, c0, c1, c0]
    got = px.reshape(8, 4)
    for i, c in enumerate(want):
        assert got[i].tolist() == [(c >> 16) & 255, (c >> 8) & 255, c & 255, 255], i


def test_wav_encode_roundtrip_mono_and_stereo():
    """wav_encode -> wav_decode/pcm_samples is the identity for mono and
    multi-channel int16 PCM, with correct header-derived frame counts."""
    import numpy as np

    x = (np.arange(100) * 331 % 65536 - 32768).astype("int16")
    wav = multimodal.wav_encode(x, 8000)
    meta = multimodal.wav_decode(wav)
    assert (meta["n_frames"], meta["sample_rate_hz"], meta["n_channels"],
            meta["bit_depth"]) == (100, 8000, 1, 16)
    assert np.array_equal(multimodal.pcm_samples(wav)[:, 0], x)
    st = np.stack([x, -x]).T.astype("int16")
    got = multimodal.pcm_samples(multimodal.wav_encode(st, 44100))
    assert got.shape == (100, 2) and np.array_equal(got, st)
    with pytest.raises(ValueError):
        multimodal.wav_encode(np.zeros((0, 0), "int16"))


def test_spectral_features_find_pure_tones(spark):
    """A pure sine at an exact FFT bin is recovered as the dominant
    frequency and (single-tone) centroid; a higher tone separates; junk
    payloads yield NULLs."""
    import numpy as np

    rate, n = 8000, 1024

    def tone(hz):
        t = np.arange(n) / rate
        return (np.sin(2 * np.pi * hz * t) * 20000).astype("int16")

    hz_a = 437.5   # bin 56 exactly (8000/1024 = 7.8125 Hz/bin)
    hz_b = 1250.0  # bin 160
    df = spark.createDataFrame(
        [
            (1, multimodal.wav_encode(tone(hz_a), rate)),
            (2, multimodal.wav_encode(tone(hz_b), rate)),
            (3, b"not audio"),
        ],
        "asset long, payload binary",
    )
    rows = {r["asset_id"]: r
            for r in multimodal.spectral_features(df, "payload", "asset").collect()}
    assert rows["1"]["dominant_hz"] == 438 and rows["2"]["dominant_hz"] == 1250
    assert abs(rows["1"]["spectral_centroid_hz"] - 438) <= 10
    assert rows["1"]["spectral_rolloff_hz"] <= 450
    assert rows["3"]["dominant_hz"] is None


def test_avi_mjpeg_roundtrip_and_header():
    """avi_encode -> avi_decode/avi_frames: container fields match, every
    block-flat frame decodes bit-exactly through the real JPEG path, and
    non-AVI payloads are rejected."""
    import numpy as np

    rng = np.random.default_rng(61)
    frames = [
        np.repeat(np.repeat(rng.integers(0, 256, (3, 2), dtype="uint8"), 8, 0), 8, 1)
        for _ in range(5)
    ]
    avi = multimodal.avi_encode(frames, fps=24)
    meta = multimodal.avi_decode(avi)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 24, 5)
    assert meta["fps"] == pytest.approx(24.0, abs=0.1)
    got = multimodal.avi_frames(avi)
    assert len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(b[:, :, 0], a)
    with pytest.raises(ValueError):
        multimodal.avi_decode(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        multimodal.avi_encode([])


def test_mp4_mjpeg_roundtrip_and_header():
    """mp4_encode -> mp4_decode/mp4_frames: sample-table navigation
    recovers every block-flat frame bit-exactly, header fields match,
    and non-MP4 payloads are rejected."""
    import numpy as np

    rng = np.random.default_rng(67)
    frames = [
        np.repeat(np.repeat(rng.integers(0, 256, (3, 2), dtype="uint8"), 8, 0), 8, 1)
        for _ in range(5)
    ]
    mp4 = multimodal.mp4_encode(frames, fps=25)
    meta = multimodal.mp4_decode(mp4)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 24, 5)
    assert meta["fps"] == pytest.approx(25.0, abs=0.1)
    got = multimodal.mp4_frames(mp4)
    assert len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(b[:, :, 0], a)
    with pytest.raises(ValueError):
        multimodal.mp4_decode(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError):
        multimodal.mp4_decode(multimodal.mp4_encode(frames)[: 40])
    with pytest.raises(ValueError):
        multimodal.mp4_encode([])


def test_mp4_corrupt_sample_table_rejected():
    """A lying stsz (sample runs past EOF) must raise, not truncate."""
    import struct

    import numpy as np

    frames = [np.full((8, 8), 128, dtype=np.uint8)]
    mp4 = bytearray(multimodal.mp4_encode(frames))
    idx = bytes(mp4).find(b"stsz")
    # inflate the one sample size to 10x
    (size,) = struct.unpack_from(">I", mp4, idx + 16)
    struct.pack_into(">I", mp4, idx + 16, size * 10)
    with pytest.raises(ValueError):
        multimodal.mp4_frames(bytes(mp4))


def test_mulaw_codec_invariants():
    """G.711 canonical properties: byte identity enc(dec(b)) == b for
    every byte except the +0/-0 collapse at 0x7F, and quantization error
    bounded by half the top segment step over ALL 65536 sample values."""
    import numpy as np

    allb = bytes(range(256))
    rt = multimodal.mulaw_encode(multimodal.mulaw_decode(allb))
    diffs = [i for i in range(256) if rt[i] != i]
    assert diffs == [0x7F]  # -0 re-encodes as +0

    s = np.arange(-32768, 32768, dtype=np.int64).astype(np.int16)
    d = multimodal.mulaw_decode(multimodal.mulaw_encode(s)).astype(np.int64)
    clamped = np.clip(s.astype(np.int64), -32635, 32635)
    assert np.abs(d - clamped).max() <= 512
    with pytest.raises(ValueError):
        multimodal.mulaw_encode(np.zeros((2, 2)))


def test_mp3_frame_walk_and_rejects():
    blob = multimodal.mp3_build_frames([(9, 0, 0), (9, 0, 1), (11, 1, 0)])
    frames = multimodal.mp3_frame_headers(blob)
    assert [f["bitrate"] for f in frames] == [128000, 128000, 192000]
    assert frames[0]["frame_bytes"] == 144 * 128000 // 44100
    assert frames[1]["frame_bytes"] == frames[0]["frame_bytes"] + 1  # padding
    st = multimodal.mp3_stats(blob)
    assert st["n_frames"] == 3 and st["sample_rate"] == 44100
    with pytest.raises(ValueError):
        multimodal.mp3_frame_headers(b"\x00" + blob)  # desync
    with pytest.raises(ValueError):
        multimodal.mp3_frame_headers(blob[:-4])  # truncated final frame
    with pytest.raises(ValueError):
        multimodal.mp3_build_frames([(15, 0, 0)])  # reserved index


def test_ima_adpcm_roundtrip_properties():
    """4-bit IMA ADPCM: exact 4:1 ratio (pairs pack per byte), decoder
    tracks the encoder's predictor (bounded RMS error on band-limited
    content), and pinned first-nibble values guard the step tables."""
    import numpy as np

    t = np.arange(2000)
    s = (12000 * np.sin(t / 20) + 3000 * np.sin(t / 7)).astype(np.int16)
    enc = multimodal.ima_adpcm_encode(s)
    assert len(enc) * 4 == 2 * len(s)
    dec = multimodal.ima_adpcm_decode(enc, len(s))
    err = dec.astype(np.int64) - s.astype(np.int64)
    assert float(np.sqrt((err * err).mean())) < 600
    # silence encodes to near-zero deltas and decodes to silence-ish
    z = multimodal.ima_adpcm_decode(
        multimodal.ima_adpcm_encode(np.zeros(100, dtype=np.int16)), 100
    )
    assert np.abs(z.astype(int)).max() <= 2
    with pytest.raises(ValueError):
        multimodal.ima_adpcm_encode(np.zeros((4, 4)))


def _msv1_validate_stream(data: bytes, n_blocks: int):
    """Wire-format conformance walk of one CRAM frame stream: classify
    every code word, enforce the public-format constraints (skip codes in
    0x8401..0x87FF, flag words with bit15 clear, 8-color marker on the
    first color only), and return per-mode counts."""
    import struct

    pos, blocks = 0, 0
    counts = {"skip": 0, "fill": 0, "two": 0, "eight": 0}
    while blocks < n_blocks:
        code = struct.unpack_from("<H", data, pos)[0]
        pos += 2
        hi = code >> 8
        if (hi & 0xFC) == 0x84:
            n = code - 0x8400
            assert 1 <= n <= 0x3FF
            blocks += n
            counts["skip"] += n
        elif hi < 0x80:
            assert code & 0x8000 == 0  # flags bit15 must be clear
            c0, c1 = struct.unpack_from("<HH", data, pos)
            pos += 4
            if c0 & 0x8000:
                rest = struct.unpack_from("<6H", data, pos)
                pos += 12
                assert all(c & 0x8000 == 0 for c in (c1,) + rest)
                counts["eight"] += 1
            else:
                assert c1 & 0x8000 == 0
                counts["two"] += 1
            blocks += 1
        else:
            assert code & 0x8000  # fill colors carry bit15
            assert (hi & 0xFC) != 0x84
            counts["fill"] += 1
            blocks += 1
    assert blocks == n_blocks and pos == len(data)
    return counts


def test_msvideo1_intra_quantized_blocks_exact():
    """Uniform and 2-color 4x4 blocks survive the lossy path exactly
    after RGB555 quantization (the VQ only loses on >2-color blocks)."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    f0 = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
    f1 = np.zeros((16, 24, 3), np.uint8)
    f1[::2, :, 0] = 200
    f1[1::2, :, 2] = 100
    for frame in (f0, f1):
        dec = multimodal.msvideo1_frames(multimodal.msvideo1_encode([frame]))
        expected = multimodal._rgb555_expand(multimodal._rgb555_quantize(frame))
        assert np.array_equal(dec[0], expected)


def test_msvideo1_skip_and_delta_streams():
    """Interframe property: an identical frame is ONE skip code (2
    bytes); a one-block change is skip + fill + skip (6 bytes), and
    decoded frames thread previous-frame pixels through the skips."""
    import numpy as np

    f0 = np.zeros((16, 16, 3), np.uint8)
    f0[:, :, 1] = 160
    f2 = f0.copy()
    f2[0:4, 0:4] = [255, 255, 0]  # true-image top-left block
    avi = multimodal.msvideo1_encode([f0, f0, f2])
    bodies = list(multimodal._avi_chunk_bodies(avi))
    assert len(bodies[1]) == 2
    _msv1_validate_stream(bodies[1], 16)
    # top-left (true) = LAST block row bottom-up: skip 12, code, skip 3
    assert len(bodies[2]) == 6
    c = _msv1_validate_stream(bodies[2], 16)
    assert c == {"skip": 15, "fill": 1, "two": 0, "eight": 0}
    dec = multimodal.msvideo1_frames(avi)
    assert np.array_equal(dec[0], dec[1])
    assert np.array_equal(dec[2][0:4, 0:4], np.full((4, 4, 3), [255, 255, 0], np.uint8) >> 3 << 3 | (np.full((4, 4, 3), [255, 255, 0], np.uint8) >> 3 >> 2))
    assert np.array_equal(dec[2][4:, :], dec[0][4:, :])


def test_msvideo1_red1_fill_collision_degrades_to_two_color():
    """An RGB555 fill whose red component is 1 would collide with the
    0x84xx skip range; the encoder must spend 6 bytes on an equal-pair
    2-color block instead and still decode exactly."""
    import numpy as np

    f = np.zeros((4, 4, 3), np.uint8)
    f[:, :] = [12, 77, 230]  # red 12 >> 3 == 1
    avi = multimodal.msvideo1_encode([f])
    body = next(iter(multimodal._avi_chunk_bodies(avi)))
    counts = _msv1_validate_stream(body, 1)
    assert counts == {"skip": 0, "fill": 0, "two": 1, "eight": 0}
    dec = multimodal.msvideo1_frames(avi)
    assert np.array_equal(
        dec[0], multimodal._rgb555_expand(multimodal._rgb555_quantize(f))
    )


def test_msvideo1_eight_color_quadrants_exact():
    """A block whose every 2x2 quadrant holds <= 2 distinct colors (but
    > 2 overall) upgrades to 8-color mode under a zero 2-color budget and
    round-trips exactly."""
    import numpy as np

    f = np.zeros((4, 4, 3), np.uint8)
    quad_colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    for q, (qy, qx) in enumerate([(0, 0), (0, 2), (2, 0), (2, 2)]):
        f[qy : qy + 2, qx : qx + 2] = quad_colors[q]
        f[qy, qx] = (16, 32, 48)  # second color per quadrant
    avi = multimodal.msvideo1_encode([f], sse_8color=-1.0)
    body = next(iter(multimodal._avi_chunk_bodies(avi)))
    counts = _msv1_validate_stream(body, 1)
    assert counts["eight"] == 1
    dec = multimodal.msvideo1_frames(avi)
    assert np.array_equal(
        dec[0], multimodal._rgb555_expand(multimodal._rgb555_quantize(f))
    )


def test_msvideo1_validation_and_dispatch():
    import numpy as np
    import pytest

    with pytest.raises(ValueError):
        multimodal.msvideo1_encode([])
    with pytest.raises(ValueError):
        multimodal.msvideo1_encode([np.zeros((5, 4, 3), np.uint8)])
    f = np.full((8, 8, 3), 99, np.uint8)
    avi = multimodal.msvideo1_encode([f, f])
    # generic avi_frames dispatches on the strf fourcc
    frames = multimodal.avi_frames(avi)
    assert len(frames) == 2 and frames[0].shape == (8, 8, 3)
    meta = multimodal.avi_decode(avi)
    assert meta["n_frames"] == 2 and meta["width"] == 8


def test_flac_roundtrip_mono_and_stereo():
    """FLAC is lossless by construction: encode->decode is bit-exact for
    mono and stereo, fixed and LPC predictors, across frame boundaries
    and a short tail frame."""
    import numpy as np

    rng = np.random.RandomState(11)
    s = (6000 * np.sin(np.arange(3000) / 23) + rng.randint(-200, 200, 3000)).astype(np.int16)
    enc = multimodal.flac_encode(s, sample_rate=22050, block_size=512)
    dec, sr = multimodal.flac_decode(enc)
    assert sr == 22050 and np.array_equal(dec[:, 0], s)
    assert len(enc) < 2 * len(s)  # actually compresses tonal content
    st = np.stack([s, -s], axis=1)
    enc2 = multimodal.flac_encode(st, 8000, block_size=333, use_lpc=True)
    dec2, _ = multimodal.flac_decode(enc2)
    assert np.array_equal(dec2, st)


def test_flac_constant_and_verbatim_paths():
    import numpy as np

    c = np.full(5000, 1234, dtype=np.int16)
    enc = multimodal.flac_encode(c, 16000)
    assert len(enc) < 120  # CONSTANT subframes collapse the stream
    assert np.array_equal(multimodal.flac_decode(enc)[0][:, 0], c)
    rng = np.random.RandomState(5)
    w = rng.randint(-32768, 32768, 2048).astype(np.int16)
    encw = multimodal.flac_encode(w, 16000, block_size=256)
    assert np.array_equal(multimodal.flac_decode(encw)[0][:, 0], w)
    assert len(encw) < 2 * len(w) * 1.1  # VERBATIM caps the blowup


def test_flac_checksums_reject_corruption():
    import numpy as np
    import pytest

    s = (np.arange(2000) % 977).astype(np.int16)
    enc = multimodal.flac_encode(s, 16000, block_size=512)
    # frame-body flip -> CRC-16; STREAMINFO MD5 flip -> MD5 check
    bad = bytearray(enc)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(ValueError):
        multimodal.flac_decode(bytes(bad))
    bad2 = bytearray(enc)
    bad2[25] ^= 0x01  # inside the 16-byte MD5 field
    with pytest.raises(ValueError):
        multimodal.flac_decode(bytes(bad2))
    with pytest.raises(ValueError):
        multimodal.flac_decode(b"fLaX" + enc[4:])
    with pytest.raises(ValueError):
        multimodal.flac_encode(np.zeros(0, dtype=np.int16))


def test_flac_utf8_frame_numbers_and_many_frames():
    """Frame indexes >= 128 exercise the multi-byte extended-UTF-8
    coding in both directions."""
    import numpy as np

    s = (np.arange(16 * 140) % 251 - 125).astype(np.int16)
    enc = multimodal.flac_encode(s, 16000, block_size=16)  # 140 frames
    dec, _ = multimodal.flac_decode(enc)
    assert np.array_equal(dec[:, 0], s)
    for n in (0, 127, 128, 2047, 2048, 65535, 1 << 20):
        b = multimodal._flac_utf8_encode(n)
        assert multimodal._flac_utf8_decode(multimodal._FlacBitReader(b)) == n


def test_alaw_codec_invariants():
    """G.711 A-law: full-16-bit-range sweep round-trips within the
    per-segment quantization step, decoded values are codec fixed
    points, and the canonical small-value behaviors hold (0 -> +8,
    -1 -> -8, alternate-bit inversion makes silence encode to 0xD5)."""
    import numpy as np
    import pytest

    s = np.arange(-32768, 32768, dtype=np.int16)
    enc = multimodal.alaw_encode(s)
    dec = multimodal.alaw_decode(enc)
    err = np.abs(dec.astype(np.int64) - s.astype(np.int64))
    assert err.max() <= 512  # top-segment step is 1024, mid-rise -> 512
    assert np.array_equal(multimodal.alaw_decode(multimodal.alaw_encode(dec)), dec)
    assert multimodal.alaw_decode(multimodal.alaw_encode(np.zeros(1, np.int16)))[0] == 8
    assert multimodal.alaw_decode(multimodal.alaw_encode(np.array([-1], np.int16)))[0] == -8
    assert multimodal.alaw_encode(np.zeros(3, np.int16)) == b"\xd5\xd5\xd5"
    # small samples land in segment 0 where the step is 16
    small = np.arange(-256, 256, dtype=np.int16)
    errs = np.abs(multimodal.alaw_decode(multimodal.alaw_encode(small)).astype(int) - small.astype(int))
    assert errs.max() <= 8
    with pytest.raises(ValueError):
        multimodal.alaw_encode(np.zeros((2, 2)))


def test_audio_samples_dispatcher():
    """audio_samples routes WAV to the PCM parser and FLAC to the full
    decoder, returning identical (samples, rate) for the same content."""
    import numpy as np
    import pytest

    s = (4000 * np.sin(np.arange(500) / 9)).astype(np.int16)
    wav = multimodal.wav_encode(s, sample_rate=8000)
    flac = multimodal.flac_encode(s, sample_rate=8000)
    ws, wr = multimodal.audio_samples(wav)
    fs, fr = multimodal.audio_samples(flac)
    assert wr == fr == 8000
    assert np.array_equal(ws[:, 0], s) and np.array_equal(fs[:, 0], s)
    with pytest.raises(ValueError):
        multimodal.audio_samples(b"ID3\x04mp3-ish bytes")


def test_flac_crc_known_vectors():
    """INDEPENDENT verification of the checksum algorithms (a symmetric
    encoder/decoder bug would survive round-trip tests): the published
    check values for CRC-8 poly 0x07 init 0 (SMBUS) and CRC-16 poly
    0x8005 init 0 non-reflected (BUYPASS) over the standard '123456789'
    test message — the exact parameterizations the FLAC spec mandates."""
    assert multimodal._flac_crc8(b"123456789") == 0xF4
    assert multimodal._flac_crc16(b"123456789") == 0xFEE8
    assert multimodal._flac_crc8(b"") == 0
    assert multimodal._flac_crc16(b"") == 0


def test_image_dhash_brightness_invariant_content_sensitive(spark):
    import numpy as np
    from pr2_transformation_spark.functions import multimodal

    r = np.arange(16, dtype=np.int64)[:, None]
    c = np.arange(16, dtype=np.int64)[None, :]

    def img(base, bright):
        v = (10 + (base * 7 + 13 * r + 29 * c) % 180 + bright).astype(np.uint8)
        return np.repeat(v[:, :, None], 3, axis=2)

    rows = [
        ("a0", multimodal.png_encode(img(3, 0))),
        ("a1", multimodal.png_encode(img(3, 20))),   # brightness shift
        ("a2", multimodal.png_encode(img(3, 40))),
        ("b0", multimodal.png_encode(img(4, 0))),    # different content
        # same pixels through a DIFFERENT codec: hash must not care
        ("a3", multimodal.gif_encode(img(3, 0))),
    ]
    df = spark.createDataFrame(rows, ["asset_id", "payload"])
    got = {
        x["asset_id"]: x["dhash"]
        for x in multimodal.image_dhash(df, "payload", "asset_id").collect()
    }
    assert got["a0"] == got["a1"] == got["a2"] == got["a3"]
    assert got["b0"] != got["a0"]


def test_image_dhash_uneven_grid_cross_multiplied_means(spark):
    """Non-divisible dims: the area-normalized compare must behave as a
    mean comparison, not a raw-sum comparison."""
    import numpy as np
    from pr2_transformation_spark.functions import multimodal

    # 10 px wide, grid_cols=4 -> region widths 2,3,2,3.  A constant image
    # must hash to 0 (no strict mean increase anywhere) even though raw
    # region sums differ by width.
    px = np.full((8, 10, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [("const", multimodal.png_encode(px))], ["asset_id", "payload"]
    )
    row = multimodal.image_dhash(
        df, "payload", "asset_id", grid_rows=4, grid_cols=4
    ).collect()[0]
    assert row["dhash"] == 0
    assert (row["width"], row["height"]) == (10, 8)


def test_audio_fingerprint_gain_and_container_invariant(spark):
    import numpy as np
    from pr2_transformation_spark.functions import multimodal

    i = np.arange(570, dtype=np.int64)

    def clip(base, gain):
        raw = (base * 31 + 17 * i) % 257 - 128
        return (gain * raw * 64).astype(np.int16).reshape(-1, 1)

    rows = [
        ("w1", multimodal.wav_encode(clip(7, 1), 8000)),
        ("w2", multimodal.wav_encode(clip(7, 2), 8000)),   # louder master
        ("f1", multimodal.flac_encode(clip(7, 3), 8000)),  # other container
        ("x1", multimodal.wav_encode(clip(8, 1), 8000)),   # different content
    ]
    df = spark.createDataFrame(rows, ["asset_id", "payload"])
    got = {
        r["asset_id"]: r["fingerprint"]
        for r in multimodal.audio_fingerprint(
            df, "payload", "asset_id", frames=57
        ).collect()
    }
    assert got["w1"] == got["w2"] == got["f1"]
    assert got["x1"] != got["w1"]


def test_audio_fingerprint_frame_bounds(spark):
    import numpy as np
    import pytest as _pytest
    from pr2_transformation_spark.functions import multimodal

    clip = np.zeros((10, 1), dtype=np.int16)
    d = spark.createDataFrame(
        [("a", multimodal.wav_encode(clip, 8000))], ["asset_id", "payload"]
    )
    # > 63 frames would overflow the int64 bit packing; < 2 is degenerate
    with _pytest.raises(ValueError):
        multimodal.audio_fingerprint(d, "payload", "asset_id", frames=64)
    with _pytest.raises(ValueError):
        multimodal.audio_fingerprint(d, "payload", "asset_id", frames=1)
    # constant silence: no frame out-powers its neighbor -> fingerprint 0
    row = multimodal.audio_fingerprint(
        d, "payload", "asset_id", frames=5
    ).collect()[0]
    assert row["fingerprint"] == 0 and row["n_samples"] == 10


def test_video_fingerprint_retiming_invariant_content_sensitive(spark):
    import numpy as np
    from pr2_transformation_spark.functions import multimodal

    def bitrep(q):
        return q * 8 + q // 4

    def clip(base, tweak_last=False):
        frames = []
        for t in range(3):
            fr = np.zeros((16, 16, 3), dtype=np.uint8)
            for i in range(4):
                for j in range(4):
                    for ch in range(3):
                        if tweak_last and t == 2 and i == 0 and j == 0:
                            q = (base * 5 + ch + 11) % 32
                        else:
                            q = (base * 3 + (i * 4 + j) * 2 + ch + t * 7) % 32
                        fr[4 * i : 4 * i + 4, 4 * j : 4 * j + 4, ch] = bitrep(q)
            frames.append(fr)
        return frames

    rows = [
        ("a10", multimodal.msvideo1_encode(clip(7), fps=10)),
        ("a30", multimodal.msvideo1_encode(clip(7), fps=30)),   # re-timed
        ("tw", multimodal.msvideo1_encode(clip(7, True), fps=10)),
        ("b", multimodal.msvideo1_encode(clip(8), fps=10)),
    ]
    df = spark.createDataFrame(rows, ["asset_id", "payload"])
    got = {
        r["asset_id"]: (r["clip_fp"], r["n_frames"])
        for r in multimodal.video_fingerprint(df, "payload", "asset_id").collect()
    }
    assert got["a10"] == got["a30"]            # fps is container metadata
    assert got["a10"][1] == 3
    assert got["tw"][0] != got["a10"][0]       # one changed block splits
    assert got["b"][0] != got["a10"][0]

    # RGB555-aligned inputs round-trip the lossy codec bit-exactly —
    # the property the q260 oracle's formula replay stands on
    dec = multimodal.avi_frames(rows[0][1])
    for t in range(3):
        assert np.array_equal(dec[t], clip(7)[t])


def test_pdf_roundtrip_and_parser_robustness(spark):
    from pr2_transformation_spark.functions import multimodal

    pages = [
        "plain first page",
        "second (page) with \\ escapes\nand a newline",
        "",  # empty page stays a page
    ]
    pdf = multimodal.pdf_encode(pages, compress=(1,))
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    assert multimodal.pdf_text(pdf) == pages

    # compressed stream whose deflate bytes end in EOL-looking bytes must
    # survive (the /Length-exact slice, not rstrip)
    for filler in range(300):
        p2 = multimodal.pdf_encode([f"x{filler} " * 11], compress=(0,))
        assert multimodal.pdf_text(p2) == [f"x{filler} " * 11]
        if filler > 40:
            break

    import pytest as _pytest
    with _pytest.raises(ValueError):
        multimodal.pdf_text(b"not a pdf at all")
    with _pytest.raises(ValueError):
        multimodal.pdf_text(b"%PDF-1.4\nno objects here")


def test_extract_pdf_text_spark_path(spark):
    from pr2_transformation_spark.functions import multimodal

    rows = [
        ("d1", multimodal.pdf_encode(["alpha beta", "gamma"], compress=(0, 1))),
        ("d2", multimodal.pdf_encode(["single"])),
    ]
    df = spark.createDataFrame(rows, ["asset_id", "payload"])
    got = {
        (r["asset_id"], r["page"]): r["text"]
        for r in multimodal.extract_pdf_text(df, "payload", "asset_id").collect()
    }
    assert got == {
        ("d1", 0): "alpha beta",
        ("d1", 1): "gamma",
        ("d2", 0): "single",
    }


def test_tiff_roundtrip_both_compressions_and_dispatch():
    import numpy as np

    from pr2_transformation_spark.functions import multimodal as mm

    rng = np.random.RandomState(11)
    for shape in [(1, 1), (9, 7), (16, 33), (5, 130)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for comp in ("packbits", "none"):
            enc = mm.tiff_encode(px, compression=comp)
            assert (mm.tiff_pixels(enc) == px).all()
            meta = mm.tiff_decode(enc)
            assert (meta["width"], meta["height"]) == (shape[1], shape[0])
            assert meta["compression"] == comp
    # runs actually compress; dispatcher routes by magic
    flat = np.full((8, 64), 7, dtype=np.uint8)
    enc = mm.tiff_encode(flat)
    assert len(enc) < 8 + 64 * 8
    assert mm.image_decode(enc)["format"] == "tiff"
    assert (mm.image_pixels(enc) == flat).all()


def test_tiff_packbits_spec_cases_and_rejects():
    import pytest

    from pr2_transformation_spark.functions import multimodal as mm

    # 128-literal batching and >128 runs split correctly
    lit = bytes(range(200))
    assert mm._packbits_decode(mm._packbits_encode(lit), 200) == lit
    run = bytes([5]) * 300
    enc = mm._packbits_encode(run)
    assert len(enc) == 6  # 128+128+44 -> three (header, byte) pairs
    assert mm._packbits_decode(enc, 300) == run
    # canonical corner: run of exactly 2 stays literal
    two = b"aab"
    assert mm._packbits_encode(two) == bytes([2]) + two
    # rejects
    with pytest.raises(ValueError):
        mm.tiff_decode(b"II*")  # truncated header
    with pytest.raises(ValueError):
        mm.tiff_decode(b"XX\x2a\x00" + b"\x00" * 8)
    with pytest.raises(ValueError):
        mm._packbits_decode(bytes([10]), 5)  # literal overruns stream

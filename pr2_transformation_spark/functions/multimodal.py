"""Multimodal column plumbing (EXT).

Images / audio / video ride through the engine as opaque ``binary`` columns
with a typed metadata struct.  Everything Spark-side is real — schemas,
Arrow-batched ``mapInPandas`` plumbing, partition sizing.  Codec coverage is
split by what this environment can honestly do (no PIL/torchaudio/libav):

* REAL, pure-stdlib/numpy codecs: uncompressed BMP (:func:`bmp_decode`
  headers, :func:`bmp_pixels` pixel arrays), PNG (:func:`png_decode`
  headers, :func:`png_pixels` — zlib inflate + all five scanline filters —
  and :func:`png_encode`, the write half), GIF (:func:`gif_decode`
  headers, :func:`gif_pixels` — true variable-width LZW — and
  :func:`gif_encode`),
  :func:`resize_images` nearest-neighbor resample over either format via
  the :func:`image_pixels` dispatcher, and RIFF/WAVE PCM
  (:func:`wav_decode` headers, :func:`pcm_samples` sample arrays +
  :func:`audio_features` RMS/ZCR/peak).
* STUBBED: formats needing codec libraries this environment lacks
  (jpeg/webp/mp3/mp4).  The feature extractor's default decoder is a
  clearly-marked deterministic fake, and passing ``decoder=None`` raises
  ``NotImplementedError`` at the seam where a ``PIL``/``torchaudio``
  wrapper would plug into the same callable signature the real decoders
  use.

Scale notes: binary payloads dominate row size, so `maxPartitionBytes`-driven
splits keep tasks balanced; the mapInPandas batch size is rows-per-Arrow-batch
(`spark.sql.execution.arrow.maxRecordsPerBatch`) — tune it down for large
assets so a batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Metadata carried beside every media payload.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image | audio | video
        StructField("format", StringType()),       # png, wav, mp4, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feat_dim", IntegerType()),
        StructField("feature_crc", StringType()),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (width/height
    unknown until decode -> NULL)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(binary_col)).cast("int").alias("n_bytes"),
        ),
    )


def bmp_decode(payload: bytes) -> dict:
    """REAL (non-stub) image decoder for BMP headers — pure Python.

    Parses the BITMAPINFOHEADER width/height fields (offset 18, two
    little-endian int32) with no codec library, proving the decoder seam
    carries genuine decode results end-to-end; PIL/libav decoders plug into
    the same callable signature.  Raises ``ValueError`` for non-BMP bytes
    (mirrors how a real decoder rejects corrupt payloads).
    """
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    # negative height encodes top-down row order; dimensions are |values|
    return {
        "media_type": "image",
        "format": "bmp",
        "width": abs(width),
        "height": abs(height),
    }


def wav_decode(payload: bytes) -> dict:
    """REAL (non-stub) audio decoder for RIFF/WAVE PCM — pure Python.

    Walks the RIFF chunk list for ``fmt `` and ``data``, returning channel
    count, sample rate, bit depth, and sample/duration counts with no codec
    library.  Together with :func:`pcm_samples` this makes the audio path
    genuinely decode-capable (header *and* sample access); a torchaudio/
    soundfile wrapper plugs into the same ``bytes -> dict`` seam for
    compressed formats.  Raises ``ValueError`` for non-WAV bytes.
    """
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_size, data_offset = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            if body + 16 > len(payload):  # declared size lies about the payload
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, body)
        elif cid == b"data" and data_size is None:
            # FIRST data chunk only — a multi-data RIFF must not mix one
            # chunk's frame count with another chunk's bytes; the returned
            # data_offset is what pcm_samples reads from, keeping both
            # functions pinned to the same chunk.
            data_size = min(size, len(payload) - body)
            data_offset = body
        if fmt is not None and data_size is not None:
            break
        pos = body + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or n_channels == 0 or block_align == 0:
        raise ValueError("only uncompressed PCM is decodable without codecs")
    n_frames = data_size // block_align
    return {
        "media_type": "audio",
        "format": "wav",
        "n_channels": int(n_channels),
        "sample_rate_hz": int(sample_rate),
        "bit_depth": int(bits),
        "n_frames": int(n_frames),
        "duration_ms": int(round(n_frames * 1000 / sample_rate)) if sample_rate else 0,
        "data_offset": int(data_offset),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: 8-bit channel counts per PNG color type (grayscale, RGB, gray+alpha, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(payload: bytes) -> dict:
    """REAL (non-stub) image decoder for PNG headers — pure stdlib.

    Parses the IHDR chunk (width, height, bit depth, color type) with no
    codec library; :func:`png_pixels` completes the path with zlib inflate +
    filter reconstruction.  Raises ``ValueError`` for non-PNG bytes or a
    malformed chunk stream.
    """
    import struct

    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    length, ctype = struct.unpack_from(">I4s", payload, 8)
    if ctype != b"IHDR" or length != 13:
        raise ValueError("PNG missing leading IHDR chunk")
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack_from(
        ">IIBBBBB", payload, 16
    )
    if w == 0 or h == 0:
        raise ValueError("PNG with zero dimension")
    return {
        "media_type": "image",
        "format": "png",
        "width": int(w),
        "height": int(h),
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
        "interlace": int(interlace),
    }


def png_encode(pixels, filters: str = "mixed") -> bytes:
    """REAL pure-stdlib PNG encoder — the write half of :func:`png_pixels`.

    Takes an ``(h, w)`` or ``(h, w, channels)`` uint8 array (1/2/3/4
    channels -> gray / gray+alpha / RGB / RGBA), emits a standard
    non-interlaced 8-bit PNG: IHDR + one zlib IDAT + IEND, CRCs via
    ``zlib.crc32``.  ``filters`` picks the per-scanline predictor:
    ``"none"``/``"sub"``/``"up"``/``"average"``/``"paeth"`` force one
    type, ``"mixed"`` cycles through all five (row ``y`` uses ``y % 5``)
    — an encode->decode round trip then exercises every reconstruction
    branch of the decoder, which is exactly what the oracle-gated
    round-trip query does.

    Encoding is the closed-form inverse of reconstruction: the stored
    byte is ``(raw - predictor) & 0xFF`` with the predictor computed from
    already-RAW neighbors, so each filtered line is vectorizable (unlike
    decode, where Sub/Average/Paeth chain along the row).
    """
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError("png_encode expects (h, w[, 1|2|3|4]) uint8 pixels")
    h, w, channels = arr.shape
    if h == 0 or w == 0:
        raise ValueError("png_encode: zero dimension")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ftype_by_name = {"none": 0, "sub": 1, "up": 2, "average": 3, "paeth": 4}
    if filters != "mixed" and filters not in ftype_by_name:
        raise ValueError(f"unknown filter mode {filters!r}")

    raw = arr.reshape(h, w * channels).astype(np.int32)
    zeros = np.zeros(w * channels, dtype=np.int32)
    lines = []
    for y in range(h):
        ftype = (y % 5) if filters == "mixed" else ftype_by_name[filters]
        cur, prev = raw[y], (raw[y - 1] if y > 0 else zeros)
        left = np.concatenate([zeros[:channels], cur[:-channels]])
        upleft = np.concatenate([zeros[:channels], prev[:-channels]])
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        lines.append(bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def png_pixels(payload: bytes):
    """Decode an 8-bit PNG to an ``(h, w, channels)`` numpy uint8 array —
    REAL pixel access with zero codec libraries: stdlib ``zlib`` inflate of
    the concatenated IDAT stream, then per-scanline reconstruction of all
    five PNG filters (None/Sub/Up/Average/Paeth).

    Supports bit depth 8 and color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA), non-interlaced — i.e. what standard encoders emit for
    truecolor/grayscale.  Palette (3), 16-bit, and Adam7 interlacing raise
    ``ValueError`` (decode errors are data, not job failures).

    Scale note: Sub/Average/Paeth have a sequential along-row dependency, so
    reconstruction is a Python loop over bytes — fine for fixtures and small
    assets; a production cluster with heavy image traffic should inject a
    PIL/turbojpeg decoder into the same ``bytes -> array`` seam.
    """
    import struct
    import zlib

    import numpy as np

    meta = png_decode(payload)
    if meta["bit_depth"] != 8:
        raise ValueError("png_pixels supports 8-bit channels")
    if meta["color_type"] not in _PNG_CHANNELS:
        raise ValueError("png_pixels supports gray/RGB/gray+alpha/RGBA")
    if meta["interlace"] != 0:
        raise ValueError("png_pixels does not support Adam7 interlacing")
    w, h = meta["width"], meta["height"]
    channels = _PNG_CHANNELS[meta["color_type"]]

    idat, pos = [], 8
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = pos + 8
        if body + length > len(payload):
            raise ValueError("truncated PNG chunk")
        if ctype == b"IDAT":
            idat.append(payload[body : body + length])
        elif ctype == b"IEND":
            break
        pos = body + length + 4  # skip CRC
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None

    stride = w * channels  # bytes per scanline (8-bit), bpp = channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data shorter than dimensions imply")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += stride + 1
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — no along-row dependency: vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, channels)


# ---------------------------------------------------------------------------
# GIF — REAL pure-stdlib LZW codec (decode + encode)
# ---------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def gif_decode(payload: bytes) -> dict:
    """REAL GIF header decoder — pure stdlib: logical screen descriptor
    (width, height), version, global-color-table presence/size.  Raises
    ``ValueError`` for non-GIF bytes."""
    import struct

    if len(payload) < 13 or payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("GIF with zero dimension")
    return {
        "media_type": "image",
        "format": "gif",
        "version": payload[3:6].decode("ascii"),
        "width": int(w),
        "height": int(h),
        "has_gct": bool(packed & 0x80),
        "gct_size": 2 << (packed & 0x07) if packed & 0x80 else 0,
    }


def _gif_lzw_decompress(data: bytes, min_code_size: int) -> list:
    """GIF-flavor LZW: variable-width codes LSB-first, CLEAR/EOI codes,
    dictionary capped at 12 bits.  Returns the palette-index stream."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    code_size = min_code_size + 1
    next_code = eoi + 1
    out: list = []
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table, code_size, next_code, prev = fresh(), min_code_size + 1, eoi + 1, None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:  # 12-bit cap: table freezes when full
                    table[next_code] = prev + (entry[0],)
                    next_code += 1
            elif code == next_code and next_code < 4096:  # the KwKwK case
                entry = prev + (prev[0],)
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream: code out of range")
            out.extend(entry)
            prev = entry
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
    raise ValueError("GIF LZW stream ended without EOI")


def gif_pixels(payload: bytes):
    """Decode the first frame of a GIF to ``(h, w, 3)`` uint8 RGB — REAL
    LZW decompression with zero codec libraries.  Supports global or local
    color tables, skips extension blocks; Adam-style interlaced frames
    raise ``ValueError`` (decode errors are data, not job failures)."""
    import struct

    import numpy as np

    meta = gif_decode(payload)
    pos = 13
    palette = None
    if meta["has_gct"]:
        n = meta["gct_size"] * 3
        palette = np.frombuffer(payload, np.uint8, n, pos).reshape(-1, 3)
        pos += n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, packed = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if packed & 0x40:
                raise ValueError("gif_pixels does not support interlaced frames")
            if packed & 0x80:  # local color table wins
                n = (2 << (packed & 0x07)) * 3
                palette = np.frombuffer(payload, np.uint8, n, pos).reshape(-1, 3)
                pos += n
            if palette is None:
                raise ValueError("GIF frame without any color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            indices = _gif_lzw_decompress(b"".join(chunks), min_code_size)
            if len(indices) < w * h:
                raise ValueError("GIF pixel data shorter than frame implies")
            idx = np.array(indices[: w * h], dtype=np.int32)
            if idx.max(initial=0) >= len(palette):
                raise ValueError("GIF index outside color table")
            return palette[idx].reshape(h, w, 3)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def gif_encode(pixels, version: bytes = b"GIF89a") -> bytes:
    """REAL pure-stdlib GIF encoder — the write half of :func:`gif_pixels`.

    Takes ``(h, w, 3)`` uint8 RGB with at most 256 distinct colors, builds
    the palette from the image, and emits a single-frame non-interlaced
    GIF with true dictionary LZW compression (CLEAR on table overflow,
    variable-width codes LSB-first) — not the emit-clear-per-symbol
    shortcut, so an encode->decode round trip exercises the decoder's
    dictionary growth and the KwKwK corner for real.
    """
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("gif_encode expects (h, w, 3) uint8 RGB")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("gif_encode: zero dimension")
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode: more than 256 distinct colors")
    depth = max(2, int(len(colors) - 1).bit_length())  # GIF minimum is 2
    table_n = 1 << depth
    palette = np.zeros((table_n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors

    min_code_size = depth
    clear, eoi = 1 << depth, (1 << depth) + 1
    codes, bits = [], []

    def emit(code: int, size: int):
        codes.append((code, size))

    table = {(i,): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = eoi + 1
    emit(clear, code_size)
    prev: tuple = ()
    for sym in inverse.tolist():
        cand = prev + (sym,)
        if cand in table:
            prev = cand
            continue
        emit(table[prev], code_size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the encoder's counter leads the decoder's by one add, so it
            # widens at 2^n + 1 where the decoder widens at 2^n — the two
            # then switch width at the same code position
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # table full: decoder's table froze too — reset both
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            code_size, next_code = min_code_size + 1, eoi + 1
        prev = (sym,)
    if prev:
        emit(table[prev], code_size)
    emit(eoi, code_size)

    acc = nbits = 0
    out = bytearray()
    for code, size in codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)

    header = version + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    descriptor = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    return (
        header
        + palette.tobytes()
        + descriptor
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


IMAGE_CHECKSUM_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_wsum", LongType()),
    ]
)


def image_checksums(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Decode every image payload (BMP/PNG via :func:`image_pixels`) and
    emit order-sensitive pixel checksums — the integrity/audit pass a media
    corpus runs after ingest or transcode: ``pixel_sum`` (sum of all
    channel bytes) catches value corruption, ``pixel_wsum``
    (position-weighted ``sum((i+1) * byte_i)`` over the flattened
    row-major array) additionally catches any reordering that preserves
    the multiset (flipped rows, swapped channels).

    Arrow-batched ``mapInPandas``, narrow (no shuffle); checksums are
    exact int64 (bounded by 255 * n² — fine up to ~2 gigapixel assets).
    Decode failures raise: run behind a format filter, or extend the
    dispatcher, rather than silently skipping corrupt assets.
    """
    import numpy as np

    cols = df.select(F.col(id_col).cast("string"), F.col(binary_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("asset_id", "width", "height", "channels",
                    "pixel_sum", "pixel_wsum")}
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                px = image_pixels(bytes(payload))
                flat = px.reshape(-1).astype(np.int64)
                out["asset_id"].append(asset_id)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["channels"].append(px.shape[2])
                out["pixel_sum"].append(int(flat.sum()))
                out["pixel_wsum"].append(
                    int((flat * (np.arange(flat.size, dtype=np.int64) + 1)).sum())
                )
            yield pd.DataFrame(out)

    return cols.mapInPandas(run, IMAGE_CHECKSUM_SCHEMA)


def image_decode(payload: bytes) -> dict:
    """Format-dispatching image header decoder: BMP and PNG are decoded for
    real (pure stdlib/numpy); other magics raise ``ValueError``.  This is
    the natural default for :func:`decode_media` on mixed image corpora."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    if payload[:6] in _GIF_SIGS:
        return gif_decode(payload)
    raise ValueError("unrecognized image payload (BMP/PNG/GIF are decodable)")


def image_pixels(payload: bytes):
    """Format-dispatching pixel decoder (BMP 24-bit -> RGB, PNG 8-bit ->
    native channels, GIF -> palette RGB).  Same ``bytes -> (h, w, c) uint8`` seam a PIL wrapper
    would fill for jpeg/webp."""
    if payload[:2] == b"BM":
        return bmp_pixels(payload)
    if payload[:8] == _PNG_SIG:
        return png_pixels(payload)
    if payload[:6] in _GIF_SIGS:
        return gif_pixels(payload)
    raise ValueError("unrecognized image payload (BMP/PNG/GIF are decodable)")


def pcm_samples(payload: bytes):
    """Decode a 16-bit PCM WAV payload to a ``(n_frames, n_channels)``
    numpy int16 array (REAL sample access, numpy only)."""
    import numpy as np

    meta = wav_decode(payload)
    if meta["bit_depth"] != 16:
        raise ValueError("pcm_samples supports 16-bit PCM")
    # wav_decode already located the first data chunk; read from ITS offset so
    # frame count and sample bytes always come from the same chunk.
    n = meta["n_frames"] * meta["n_channels"]
    samples = np.frombuffer(payload, dtype="<i2", count=n, offset=meta["data_offset"])
    return samples.reshape(meta["n_frames"], meta["n_channels"])


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate_hz", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", StringType()),        # fixed-4dp string: exact cross-engine compare
        StructField("zero_cross_rate", StringType()),
        StructField("peak", IntegerType()),
    ]
)


def audio_features(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """REAL audio feature extraction: RMS energy, zero-crossing rate, and
    peak amplitude over decoded PCM samples — numpy inside Arrow-batched
    ``mapInPandas``, no audio library.  Undecodable payloads yield NULL
    features (decode errors are data, not job failures)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    meta = wav_decode(raw)
                    mono = pcm_samples(raw).astype(np.float64).mean(axis=1)
                    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
                    zcr = (
                        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        if len(mono) > 1
                        else 0.0
                    )
                    rows.append(
                        {
                            "asset_id": str(asset_id),
                            "n_channels": meta["n_channels"],
                            "sample_rate_hz": meta["sample_rate_hz"],
                            "duration_ms": meta["duration_ms"],
                            "rms": f"{rms:.4f}",
                            "zero_cross_rate": f"{zcr:.4f}",
                            "peak": int(np.max(np.abs(mono))) if len(mono) else 0,
                        }
                    )
                except ValueError:
                    rows.append({"asset_id": str(asset_id), "n_channels": None,
                                 "sample_rate_hz": None, "duration_ms": None,
                                 "rms": None, "zero_cross_rate": None, "peak": None})
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return df.select(id_col, binary_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def bmp_pixels(payload: bytes):
    """Decode an uncompressed 24-bit BMP to an ``(h, w, 3)`` RGB numpy
    array (REAL pixel access: data-offset lookup, 4-byte row padding,
    bottom-up vs top-down row order).  numpy only."""
    import struct

    import numpy as np

    meta = bmp_decode(payload)  # validates the BM magic + header
    if len(payload) < 34:  # bmp_decode only guarantees the dimension fields
        raise ValueError("truncated BMP info header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width_raw, height_raw = struct.unpack_from("<ii", payload, 18)
    bits = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bits != 24 or compression != 0:
        raise ValueError("bmp_pixels supports uncompressed 24-bit BMP")
    w, h = meta["width"], meta["height"]
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if data_offset + stride * h > len(payload):
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if height_raw > 0:  # positive height = bottom-up row order
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("rgb", BinaryType()),  # row-major h*w*3 RGB bytes
    ]
)


def resize_images(
    df: DataFrame, binary_col: str, id_col: str, out_w: int, out_h: int
) -> DataFrame:
    """REAL image resize: nearest-neighbor resample of decoded BMP/PNG
    pixels via numpy index gather, emitted as raw RGB bytes + final
    dimensions.  The standard training-data preprocessing shape (decode ->
    resize -> feature model); swap :func:`image_pixels` for a PIL decode to
    cover jpeg/webp.  Undecodable payloads yield NULL rgb."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    img = image_pixels(raw)
                    if img.shape[2] <= 2:  # gray / gray+alpha -> replicate to RGB
                        img = np.repeat(img[:, :, :1], 3, axis=2)
                    else:  # RGB / RGBA -> drop alpha
                        img = img[:, :, :3]
                    h, w = img.shape[:2]
                    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                    resized = img[yi][:, xi]
                    rows.append({"asset_id": str(asset_id), "width": out_w,
                                 "height": out_h, "rgb": resized.tobytes()})
                except ValueError:
                    rows.append({"asset_id": str(asset_id), "width": None,
                                 "height": None, "rgb": None})
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select(id_col, binary_col).mapInPandas(run, RESIZE_SCHEMA)


#: Output schema of :func:`decode_media` — MEDIA_META_SCHEMA flattened
#: beside the asset id, with width/height now populated by a decoder.
DECODED_META_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("media_type", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def decode_media(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: Optional[Callable[[bytes], dict]] = None,
) -> DataFrame:
    """Arrow-batched media decode: fill the metadata struct's width/height
    from the payload bytes via ``decoder`` (e.g. :func:`bmp_decode`, or an
    injected PIL/torchaudio wrapper).  Payloads the decoder rejects
    (``ValueError``) yield NULL media fields, keeping the row — decode
    errors are data, not job failures, at 100 TB.

    There is no stub default here: ``decoder=None`` raises
    ``NotImplementedError`` at the seam where a real codec is required.
    """
    if decoder is None:
        raise NotImplementedError(
            "media decoding requires a decoder callable (image_decode for "
            "BMP/PNG, wav_decode for PCM audio, or a PIL/torchaudio wrapper "
            "for jpeg/webp/mp3/mp4 in environments that ship codecs)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    meta = decoder(raw)
                except ValueError:
                    meta = {}
                rows.append(
                    {
                        "asset_id": str(asset_id),
                        "media_type": meta.get("media_type"),
                        "format": meta.get("format"),
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_bytes": len(raw),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_META_SCHEMA.fields])

    return df.select(id_col, binary_col).mapInPandas(run, DECODED_META_SCHEMA)


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder — deterministic fake standing in for PIL/libav.

    Produces a pseudo feature vector fingerprint from the payload bytes so
    the distributed plumbing (batching, schema, shuffle) is fully exercised
    and testable without codec libraries.
    """
    digest = hashlib.sha256(payload or b"").hexdigest()
    return {
        "sha256": digest,
        "feat_dim": 8,
        "feature_crc": digest[:16],
    }


def extract_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: Optional[Callable[[bytes], dict]] = _fake_decode,
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads via mapInPandas.

    ``decoder`` maps raw bytes -> feature dict; the default is the marked
    stub.  Pass ``decoder=None`` to assert the real-codec path, which raises
    ``NotImplementedError`` (no image/audio libraries in this environment).
    """
    if decoder is None:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/libav; not available "
            "in this environment — supply a decoder callable or use the stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                feats = decoder(raw)
                out.append(
                    {
                        "asset_id": str(asset_id),
                        "sha256": feats["sha256"],
                        "n_bytes": len(raw),
                        "feat_dim": feats["feat_dim"],
                        "feature_crc": feats["feature_crc"],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, binary_col).mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, binary_col: str, id_col: str, every_nth: int = 10
) -> DataFrame:
    """STUB frame sampler: emits (asset_id, frame_idx, frame_crc) rows for a
    video payload — frame decode is faked deterministically from the bytes
    (sha256 of payload + ASCII ``#<idx>`` suffix, replayable in any engine
    with sha256 over strings); the explode/fan-out shape (1 row -> many
    frames) is the real part."""
    schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_crc", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                n_fake_frames = max(1, len(raw) // max(every_nth, 1))
                for i in range(min(n_fake_frames, 32)):
                    crc = hashlib.sha256(raw + f"#{i}".encode()).hexdigest()[:12]
                    rows.append({"asset_id": str(asset_id), "frame_idx": i, "frame_crc": crc})
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_crc"])

    return df.select(id_col, binary_col).mapInPandas(run, schema)

"""Multimodal column plumbing (EXT).

Images / audio / video ride through the engine as opaque ``binary`` columns
with a typed metadata struct.  Everything Spark-side is real — schemas,
Arrow-batched ``mapInPandas`` plumbing, partition sizing.  Codec coverage is
split by what this environment can honestly do (no PIL/torchaudio/libav):

* REAL, pure-numpy decoders: uncompressed BMP (:func:`bmp_decode` headers,
  :func:`bmp_pixels` pixel arrays + :func:`resize_images` nearest-neighbor
  resample) and RIFF/WAVE PCM (:func:`wav_decode` headers,
  :func:`pcm_samples` sample arrays + :func:`audio_features` RMS/ZCR/peak).
* STUBBED: compressed formats (png/jpeg/mp3/mp4).  The feature extractor's
  default decoder is a clearly-marked deterministic fake, and passing
  ``decoder=None`` raises ``NotImplementedError`` at the seam where a
  ``PIL``/``torchaudio`` wrapper would plug into the same callable
  signature the real decoders use.

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
    """REAL image resize: nearest-neighbor resample of decoded BMP pixels
    via numpy index gather, emitted as raw RGB bytes + final dimensions.
    The standard training-data preprocessing shape (decode -> resize ->
    feature model); swap :func:`bmp_pixels` for a PIL decode to cover
    compressed formats.  Undecodable payloads yield NULL rgb."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    img = bmp_pixels(raw)
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
            "media decoding requires a decoder callable (bmp_decode, or a "
            "PIL/torchaudio wrapper in environments that ship codecs)"
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

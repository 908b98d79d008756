"""Multimodal column plumbing (EXT).

Images / audio / video ride through the engine as opaque ``binary`` columns
with a typed metadata struct.  Everything Spark-side is real — schemas,
Arrow-batched ``mapInPandas`` plumbing, partition sizing — while the actual
codec work is STUBBED (this environment ships no image/audio libraries): the
default decoder is a clearly-marked deterministic fake, and passing
``decoder=None`` raises ``NotImplementedError`` at the call site where a real
``PIL``/``torchaudio`` decoder would plug in.

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

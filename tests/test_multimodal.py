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

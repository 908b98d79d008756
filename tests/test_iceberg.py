"""Iceberg v1 source (sources/iceberg.py): snapshot commits, manifest
layout, time travel."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pr2_transformation_spark.sources.avro import avro_read
from pr2_transformation_spark.sources.iceberg import IcebergTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_commits_and_time_travel(spark, tmp_path):
    t = IcebergTable(str(tmp_path / "tbl"))
    assert t.write(_df(spark, 0, 5), mode="overwrite", now_ms=1_000) == 1
    assert t.write(_df(spark, 5, 8), mode="append", now_ms=2_000) == 2
    assert t.write(_df(spark, 50, 52), mode="overwrite", now_ms=3_000) == 3
    assert sorted(r["k"] for r in t.read(spark, snapshot_id=1).collect()) == [0, 1, 2, 3, 4]
    assert sorted(r["k"] for r in t.read(spark, snapshot_id=2).collect()) == list(range(8))
    assert sorted(r["k"] for r in t.read(spark).collect()) == [50, 51]
    assert t.current_snapshot_id() == 3
    assert [s["operation"] for s in t.snapshots()] == [
        "overwrite", "append", "overwrite",
    ]
    with pytest.raises(ValueError, match="snapshot 9"):
        t.read(spark, snapshot_id=9)


def test_metadata_layout_is_spec_shaped(spark, tmp_path):
    """version-hint + vN.metadata.json + snap-*.avro manifest lists +
    m-*.avro manifests, with the spec's field names — the layout any
    Iceberg reader walks."""
    t = IcebergTable(str(tmp_path / "tbl"))
    t.write(_df(spark, 0, 4), mode="overwrite", now_ms=1_000)
    t.write(_df(spark, 4, 6), mode="append", now_ms=2_000)
    md = str(tmp_path / "tbl" / "metadata")
    assert open(os.path.join(md, "version-hint.text")).read() == "2"
    meta = json.load(open(os.path.join(md, "v2.metadata.json")))
    assert meta["format-version"] == 1
    assert meta["current-snapshot-id"] == 2
    assert [f["name"] for f in meta["schema"]["fields"]] == ["k", "v"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == 2)
    _, manifests = avro_read(
        open(str(tmp_path / "tbl" / snap["manifest-list"]), "rb").read()
    )
    # append carries the first snapshot's manifest forward
    assert len(manifests) == 2
    assert {m["added_snapshot_id"] for m in manifests} == {1, 2}
    assert all(m["manifest_path"].startswith("metadata/m-") for m in manifests)
    _, entries = avro_read(
        open(str(tmp_path / "tbl" / manifests[0]["manifest_path"]), "rb").read()
    )
    e = entries[0]
    assert e["status"] == 1 and e["data_file"]["file_format"] == "PARQUET"
    assert e["data_file"]["file_path"].startswith("data/part-")
    assert e["data_file"]["file_size_in_bytes"] > 0


def test_errors(spark, tmp_path):
    with pytest.raises(ValueError, match="not an Iceberg table"):
        IcebergTable(str(tmp_path / "nope")).read(spark)
    t = IcebergTable(str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="mode"):
        t.write(_df(spark, 0, 1), mode="merge")


def test_positional_deletes_merge_on_read(spark, tmp_path):
    """v2 delete_where: tombstoned rows vanish from the new snapshot,
    prior snapshots are untouched, deletes compose, appends after a
    delete keep the tombstones, and format-version bumps to 2."""
    t = IcebergTable(str(tmp_path / "tbl"))
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    s1 = t.write(df.filter("k < 60"), mode="overwrite", now_ms=1000)
    s2 = t.write(df.filter("k >= 60"), mode="append", now_ms=2000)
    s3 = t.delete_where(spark, "k % 10 = 3", now_ms=3000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(100) if k % 10 != 3]
    # time travel: the pre-delete snapshot still has every row
    assert len(t.read(spark, snapshot_id=s2).collect()) == 100
    # a second delete composes with the first
    t.delete_where(spark, "k % 10 = 7", now_ms=4000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(100) if k % 10 not in (3, 7)]
    # append after deletes: tombstones still apply to the old files
    t.write(df.filter("k < 5").select((F.col("k") + 1000).alias("k")),
            mode="append", now_ms=5000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(100) if k % 10 not in (3, 7)] + [
        1000, 1001, 1002, 1003, 1004]
    meta = t._load_metadata()
    assert meta["format-version"] == 2
    assert t._delete_files()  # content=1 manifests present


def test_equality_deletes_sequence_scoped(spark, tmp_path):
    """Equality deletes tombstone by column value but ONLY against data
    files older than the delete: later appends matching the values
    survive — the spec's sequence semantics."""
    t = IcebergTable(str(tmp_path / "tbl"))
    df = spark.range(0, 40).select(F.col("id").alias("k"),
                                   (F.col("id") % 4).alias("g"))
    t.write(df, mode="overwrite", now_ms=1000)
    t.delete_where_equality(spark, "g = 1", ["g"], now_ms=2000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(40) if k % 4 != 1]
    # append rows with the SAME deleted value g=1: they must survive
    t.write(spark.range(100, 104).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("g")),
        mode="append", now_ms=3000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(40) if k % 4 != 1] + [100, 101, 102, 103]
    # composes with a positional delete
    t.delete_where(spark, "k = 102", now_ms=4000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(40) if k % 4 != 1] + [100, 101, 103]
    # a second equality delete catches the survivors it postdates
    t.delete_where_equality(spark, "g = 1", ["g"], now_ms=5000)
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [k for k in range(40) if k % 4 != 1]

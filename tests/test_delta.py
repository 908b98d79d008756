"""Minimal Delta-protocol source (sources/delta.py): log replay,
time travel, history, vacuum semantics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pr2_transformation_spark.sources.delta import DeltaTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_append_overwrite_time_travel(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "tbl"))
    assert t.write(_df(spark, 0, 5), mode="overwrite") == 0
    assert t.write(_df(spark, 5, 8), mode="append") == 1
    assert t.write(_df(spark, 100, 102), mode="overwrite") == 2

    assert sorted(r["k"] for r in t.read(spark, version=0).collect()) == [0, 1, 2, 3, 4]
    assert sorted(r["k"] for r in t.read(spark, version=1).collect()) == list(range(8))
    assert sorted(r["k"] for r in t.read(spark).collect()) == [100, 101]
    assert t.versions() == [0, 1, 2]

    hist = t.history()
    assert [h["version"] for h in hist] == [2, 1, 0]
    assert [h["mode"] for h in hist] == ["overwrite", "append", "overwrite"]


def test_log_layout_is_the_public_protocol(spark, tmp_path):
    """The on-disk layout must be what any delta reader replays:
    zero-padded json commits of newline-delimited actions with
    protocol/metaData/add/remove/commitInfo keys."""
    t = DeltaTable(str(tmp_path / "tbl"))
    t.write(_df(spark, 0, 3), mode="overwrite")
    t.write(_df(spark, 3, 4), mode="overwrite")
    log = os.path.join(str(tmp_path / "tbl"), "_delta_log")
    assert sorted(os.listdir(log)) == [
        "00000000000000000000.json", "00000000000000000001.json",
    ]
    acts0 = [json.loads(x) for x in open(os.path.join(
        log, "00000000000000000000.json")) if x.strip()]
    kinds0 = [next(iter(a)) for a in acts0]
    assert kinds0[0] == "protocol" and "metaData" in kinds0
    assert any("add" in a for a in acts0) and kinds0[-1] == "commitInfo"
    acts1 = [json.loads(x) for x in open(os.path.join(
        log, "00000000000000000001.json")) if x.strip()]
    # overwrite tombstones every previously-live file
    removed = [a["remove"]["path"] for a in acts1 if "remove" in a]
    added0 = [a["add"]["path"] for a in acts0 if "add" in a]
    assert sorted(removed) == sorted(added0)
    for a in acts1:
        if "add" in a:
            assert a["add"]["dataChange"] is True
            assert a["add"]["size"] > 0


def test_vacuum_respects_live_set_and_horizon(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "tbl"))
    t.write(_df(spark, 0, 5), mode="overwrite", now_ms=1_000)
    t.write(_df(spark, 50, 52), mode="overwrite", now_ms=2_000)

    # horizon not reached: nothing deleted, v0 still readable
    assert t.vacuum(retain_ms=10_000, now_ms=5_000) == []
    assert t.read(spark, version=0).count() == 5

    deleted = t.vacuum(retain_ms=10_000, now_ms=20_000)
    assert deleted  # v0's tombstoned files are gone
    for p in deleted:
        assert not os.path.exists(os.path.join(str(tmp_path / "tbl"), p))
    # latest snapshot untouched
    assert sorted(r["k"] for r in t.read(spark).collect()) == [50, 51]
    # time travel to the vacuumed version now fails at scan time
    with pytest.raises(Exception):
        t.read(spark, version=0).collect()


def test_errors(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="not a Delta table"):
        t.read(spark)
    t2 = DeltaTable(str(tmp_path / "tbl"))
    t2.write(_df(spark, 0, 2), mode="overwrite")
    with pytest.raises(ValueError, match="version 9"):
        t2.read(spark, version=9)
    with pytest.raises(ValueError, match="mode"):
        t2.write(_df(spark, 0, 1), mode="merge")


def test_schema_evolution_append(spark, tmp_path):
    """An append with an added column: the snapshot uses the LATEST
    metaData schema and old files surface NULLs for the new column."""
    from pyspark.sql import functions as F2

    t = DeltaTable(str(tmp_path / "tbl"))
    t.write(_df(spark, 0, 3), mode="overwrite")
    t.write(
        _df(spark, 3, 5).withColumn("tag", F2.lit("new")), mode="append"
    )
    got = t.read(spark)
    assert set(got.columns) == {"k", "v", "tag"}
    vals = {r["k"]: r["tag"] for r in got.collect()}
    assert vals[0] is None and vals[4] == "new"
    # time travel to v0 keeps the old 2-column schema
    assert set(t.read(spark, version=0).columns) == {"k", "v"}


def test_checkpoint_replay_and_log_expiry(spark, tmp_path):
    """checkpoint(): replay seeds from the reconciled parquet + JSON
    tail; expire_log() removes covered commits; time travel below the
    checkpoint fails with a clear error; writes continue after expiry."""
    import os

    import pytest as _pytest

    t = DeltaTable(str(tmp_path / "tbl"))
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    t.write(df.filter("k % 5 = 0"), mode="overwrite", now_ms=1000)
    t.write(df.filter("k % 5 = 1"), mode="append", now_ms=2000)
    t.write(df.filter("k % 5 = 2"), mode="append", now_ms=3000)
    v = t.checkpoint()
    assert v == 2
    lc = os.path.join(t.path, "_delta_log", "_last_checkpoint")
    assert os.path.exists(lc)
    t.write(df.filter("k % 5 = 3"), mode="append", now_ms=4000)

    # pre-expiry: both replay routes agree
    keys = sorted(r["k"] for r in t.read(spark).collect())
    assert keys == sorted(k for k in range(100) if k % 5 <= 3)

    gone = t.expire_log()
    assert gone == [0, 1, 2]
    # latest still reconstructs from checkpoint + tail
    assert sorted(r["k"] for r in t.read(spark).collect()) == keys
    # version at the checkpoint itself works (pure checkpoint read)
    v2 = sorted(r["k"] for r in t.read(spark, version=2).collect())
    assert v2 == sorted(k for k in range(100) if k % 5 <= 2)
    # below the checkpoint: expired
    with _pytest.raises(ValueError, match="missing from _delta_log"):
        t.read(spark, version=1)
    # version numbering survives expiry
    assert t.write(df.filter("k % 5 = 4"), mode="overwrite",
                   now_ms=5000) == 4
    assert sorted(r["k"] for r in t.read(spark).collect()) == sorted(
        k for k in range(100) if k % 5 == 4)


def test_checkpoint_preserves_tombstones_for_vacuum(spark, tmp_path):
    """Remove tombstones survive the checkpoint round trip so a
    post-expiry vacuum still finds them."""
    t = DeltaTable(str(tmp_path / "tbl"))
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t.write(df.filter("k < 25"), mode="overwrite", now_ms=1000)
    t.write(df.filter("k >= 25"), mode="overwrite", now_ms=2000)  # tombstones v0
    t.checkpoint()
    t.expire_log()
    deleted = t.vacuum(retain_ms=10_000, now_ms=1_000_000)
    assert deleted  # v0 files found via checkpoint tombstones and removed
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(25, 50))


def test_two_writer_conflict_append_rebases_overwrite_raises(spark, tmp_path):
    """Optimistic concurrency: version files are minted create-exclusive,
    so a racing writer CANNOT clobber the winner's commit.  Simulate the
    race by pre-creating the version the writer is about to claim: a
    blind append must rebase onto the new head and retry (both commits
    land, snapshot = union); an overwrite that read a now-stale snapshot
    must raise ConcurrentWriteError and leave the log consistent."""
    from pr2_transformation_spark.sources.delta import (
        ConcurrentWriteError,
        _commit_path,
    )

    t = DeltaTable(str(tmp_path / "tbl"))
    t.write(_df(spark, 0, 5), mode="overwrite")  # version 0

    # Interleave a competing commit between the appender's snapshot read
    # and its publish: patch _latest_version to return the stale head
    # once, while a real version-1 commit (another appender's) exists.
    t2 = DeltaTable(t.path)
    t2.write(_df(spark, 100, 103), mode="append")  # version 1 (the winner)
    real_latest = DeltaTable._latest_version
    calls = {"n": 0}

    def stale_once(self):
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real_latest(self)

    DeltaTable._latest_version = stale_once
    try:
        v = t.write(_df(spark, 5, 8), mode="append")
    finally:
        DeltaTable._latest_version = real_latest
    assert v == 2  # rebased past the winner
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4, 5, 6, 7, 100, 101, 102]
    # both commit files intact — nothing was clobbered
    assert t.versions() == [0, 1, 2]
    assert os.path.getsize(_commit_path(t.path, 1)) > 0

    # overwrite racing a data-changing commit must refuse
    t3 = DeltaTable(t.path)
    calls["n"] = 0

    def stale_then_real(self):
        # write() probes _latest_version three times before minting:
        # read_version, the column-mapping replay's validation, and the
        # publish-loop mint — all three must see the stale head for the
        # simulated race to line up
        calls["n"] += 1
        return 2 if calls["n"] <= 3 else real_latest(self)

    DeltaTable._latest_version = stale_then_real
    try:
        t3.write(_df(spark, 200, 203), mode="append")  # winner -> version 3
        DeltaTable._latest_version = real_latest
        calls["n"] = 0
        DeltaTable._latest_version = stale_then_real
        with pytest.raises(ConcurrentWriteError):
            t.write(_df(spark, 300, 303), mode="overwrite")
    finally:
        DeltaTable._latest_version = real_latest
    # loser's staged files are unreferenced; snapshot stays consistent
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4, 5, 6, 7, 100, 101, 102, 200, 201, 202]


def test_add_stats_and_data_skipping(spark, tmp_path):
    """Per-file footer stats ride add.stats; a skipping read prunes files
    whose min/max prove no match, keeps stats-less files, and survives a
    checkpoint + log expiry round trip."""
    t = DeltaTable(str(tmp_path / "tbl"))
    t.write(_df(spark, 0, 10).coalesce(1), mode="overwrite")
    t.write(_df(spark, 10, 20).coalesce(1), mode="append")
    t.write(_df(spark, 20, 30).coalesce(1), mode="append")

    # stats present and correct in the raw log
    acts = [json.loads(line) for line in open(
        os.path.join(t.path, "_delta_log",
                     "%020d.json" % 1)) if line.strip()]
    [add] = [a["add"] for a in acts if "add" in a]
    st = json.loads(add["stats"])
    assert st["numRecords"] == 10
    assert st["minValues"]["k"] == 10 and st["maxValues"]["k"] == 19

    kept, total = t.files_matching([("k", "<=", 5)])
    assert (kept, total) == (1, 3)
    got = t.read(spark, skipping=[("k", "<=", 5)])
    assert sorted(r["k"] for r in got.collect()) == list(range(10))
    # skipping drops provably-irrelevant FILES; the caller still filters
    # rows (each predicate of a conjunction prunes independently)
    part = t.read(spark, skipping=[("k", ">", 5), ("k", "<", 3)])
    assert part.count() == 10  # only file0 survives both per-file tests
    assert part.filter("k > 5 and k < 3").count() == 0
    # a predicate no file can satisfy -> zero files, schema intact
    empty = t.read(spark, skipping=[("k", ">", 1000)])
    assert empty.count() == 0 and empty.columns == ["k", "v"]
    # equality in the middle file only
    assert t.files_matching([("k", "=", 15)]) == (1, 3)

    # skipping survives checkpoint + expiry (stats live in the checkpoint)
    t.checkpoint()
    t.expire_log()
    assert t.files_matching([("k", ">=", 25)]) == (1, 3)
    assert sorted(
        r["k"] for r in t.read(spark, skipping=[("k", ">=", 25)]).collect()
    ) == list(range(20, 30))


# ---- deletion vectors --------------------------------------------------

def test_deletion_vector_delete_read_and_merge(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "dv"))
    df = spark.range(1000).selectExpr(
        "id as k", "id % 7 as m", "cast(id * 1.5 as double) as v"
    ).repartition(3)
    t.write(df, mode="overwrite")
    v1 = t.delete_where(spark, "m = 3")
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [i for i in range(1000) if i % 7 != 3]
    # data files untouched on disk: DELETE wrote only a DV sidecar
    parquets = [f for f in os.listdir(t.path) if f.endswith(".parquet")]
    assert len(parquets) == 3
    dvs = [f for f in os.listdir(t.path)
           if f.startswith("deletion_vector_") and f.endswith(".bin")]
    assert len(dvs) == 1
    # second DELETE on already-DV'd files UNIONS the bitmaps
    t.delete_where(spark, "k < 10")
    got2 = sorted(r["k"] for r in t.read(spark).collect())
    assert got2 == [i for i in range(1000) if i % 7 != 3 and i >= 10]
    # time travel: pre-DELETE snapshot is intact
    assert t.read(spark, version=0).count() == 1000
    assert t.read(spark, version=v1).count() == 857


def test_deletion_vector_log_shape_and_protocol_upgrade(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "dv2"))
    t.write(spark.range(100).selectExpr("id as k"), mode="overwrite")
    t.delete_where(spark, "k % 10 = 0")
    actions = [json.loads(line) for line in open(
        os.path.join(t.path, "_delta_log", f"{1:020d}.json"))]
    prot = next(a["protocol"] for a in actions if "protocol" in a)
    assert prot["minReaderVersion"] == 3 and prot["minWriterVersion"] == 7
    assert "deletionVectors" in prot["readerFeatures"]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all("deletionVector" in a for a in adds)
    dv = adds[0]["deletionVector"]
    assert dv["storageType"] == "u"
    assert len(dv["pathOrInlineDv"]) == 20  # z85 of a 16-byte uuid
    assert dv["cardinality"] >= 1 and dv["sizeInBytes"] > 4
    # descriptor materializes through the verified read path
    from pr2_transformation_spark.sources.delta import _dv_read
    bm = _dv_read(t.path, dv)
    assert len(bm) == dv["cardinality"]


def test_deletion_vector_file_format_checksums(spark, tmp_path):
    from pr2_transformation_spark.sources.delta import (
        _dv_blob, _dv_pack, _dv_read, _z85_decode, _z85_encode)
    from pr2_transformation_spark.sources.roaring import Roaring64

    # z85 vector from the ZeroMQ spec: "HelloWorld" encodes these bytes
    assert _z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F,
                              0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert _z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])

    bm = Roaring64.from_values([1, 5, 70000, (3 << 32) + 2])
    blob = _dv_blob(bm)
    data, locs = _dv_pack([blob])
    assert data[0] == 1  # format version byte
    fn = tmp_path / "deletion_vector_x.bin"
    fn.write_bytes(data)
    desc = {"storageType": "p", "pathOrInlineDv": str(fn),
            "offset": locs[0][0], "sizeInBytes": locs[0][1],
            "cardinality": 4}
    back = _dv_read(str(tmp_path), desc)
    assert set(back.values()) == {1, 5, 70000, (3 << 32) + 2}
    # corrupt one bitmap byte -> checksum verification must trip
    bad = bytearray(data)
    bad[7] ^= 0xFF
    fn.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="checksum|magic|cardinality"):
        _dv_read(str(tmp_path), desc)
    # inline storage round-trips when padded to the z85 alignment
    pad = blob + b"\x00" * (-len(blob) % 4)
    desc_i = {"storageType": "i",
              "pathOrInlineDv": __import__(
                  "pr2_transformation_spark.sources.delta",
                  fromlist=["_z85_encode"])._z85_encode(pad),
              "cardinality": 4}
    assert set(_dv_read(str(tmp_path), desc_i).values()) == set(bm.values())


def test_deletion_vector_checkpoint_roundtrip_and_empty_delete(spark, tmp_path):
    """Round-8 closes its own seam: the typed checkpoint carries the
    2-level nested add.deletionVector struct (written by the
    from-scratch nested parquet writer) and a replay SEEDED from the
    checkpoint still applies the DVs."""
    t = DeltaTable(str(tmp_path / "dv3"))
    t.write(spark.range(50).selectExpr("id as k"), mode="overwrite")
    with pytest.raises(ValueError, match="matched no rows"):
        t.delete_where(spark, "k > 1000")
    t.delete_where(spark, "k % 10 = 7")
    expected = [i for i in range(50) if i % 10 != 7]
    t.checkpoint()
    t.expire_log()  # force the replay to seed from the checkpoint
    live = t._replay(None)[0]
    assert any(a.get("deletionVector") for a in live.values())
    dv = next(a["deletionVector"] for a in live.values()
              if a.get("deletionVector"))
    assert dv["storageType"] == "u" and dv["cardinality"] >= 1
    assert sorted(r["k"] for r in t.read(spark).collect()) == expected
    # and a DELETE on top of the checkpointed snapshot still merges
    t.delete_where(spark, "k = 4")
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        i for i in expected if i != 4]


def test_optimize_binpacks_and_purges_deletion_vectors(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "opt"))
    df = spark.range(2000).selectExpr("id as k", "id * 2 as v")
    t.write(df.repartition(8), mode="overwrite")   # 8 small files
    t.delete_where(spark, "k % 5 = 0")
    before = [f for f in os.listdir(t.path) if f.endswith(".parquet")]
    v_pre = t._latest_version()
    res = t.optimize(spark, target_bytes=128 * 1024 * 1024)
    assert res["version"] == v_pre + 1
    assert sorted(res["compacted"]) == sorted(before)
    live = t._replay(None)[0]
    assert len(live) < len(before)
    assert not any(a.get("deletionVector") for a in live.values())  # purged
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [i for i in range(2000) if i % 5 != 0]
    # logical content unchanged -> dataChange=False everywhere
    acts = [json.loads(line) for line in open(os.path.join(
        t.path, "_delta_log", f"{res['version']:020d}.json"))]
    assert all(not a["add"]["dataChange"] for a in acts if "add" in a)
    assert all(not a["remove"]["dataChange"] for a in acts if "remove" in a)
    # pre-optimize snapshot still time-travels (inputs not vacuumed)
    assert t.read(spark, version=v_pre).count() == 1600
    # idempotent-ish: nothing small left -> no-op
    assert t.optimize(spark, target_bytes=1)["version"] == -1


def test_delete_and_optimize_collide_with_interleaved_commit(spark, tmp_path):
    """delete_where/optimize mint their commit version from the READ
    snapshot, so a data-changing commit that lands during the long
    distributed scan/rewrite collides on the create-exclusive publish
    instead of being silently built over (resurrecting files the winner
    removed).  Simulated by pinning _latest_version to the stale head
    while a real winner commit occupies stale+1."""
    from pr2_transformation_spark.sources.delta import ConcurrentWriteError

    t = DeltaTable(str(tmp_path / "race"))
    t.write(_df(spark, 0, 100), mode="overwrite")          # version 0
    DeltaTable(t.path).write(_df(spark, 100, 103), "append")  # version 1 wins
    real_latest = DeltaTable._latest_version
    DeltaTable._latest_version = lambda self: 0  # reader saw only v0
    try:
        with pytest.raises(ConcurrentWriteError, match="DELETE read version 0"):
            t.delete_where(spark, "k < 10")
    finally:
        DeltaTable._latest_version = real_latest
    # optimize race on its own fixture: 8 small files at v0, winner at v1
    t2 = DeltaTable(str(tmp_path / "race2"))
    t2.write(_df(spark, 0, 200).repartition(8), mode="overwrite")
    DeltaTable(t2.path).write(_df(spark, 200, 203), "append")
    DeltaTable._latest_version = lambda self: 0
    try:
        with pytest.raises(ConcurrentWriteError, match="optimize lost"):
            t2.optimize(spark, target_bytes=128 * 1024 * 1024)
    finally:
        DeltaTable._latest_version = real_latest
    # both logs still replay to the winner's snapshot
    assert t.read(spark).count() == 103
    assert t2.read(spark).count() == 203


def test_column_mapping_evolution(spark, tmp_path):
    """Schema evolution via column mapping mode=name: metadata-only
    rename/add/drop, old files resolve by physical name, added columns
    read NULL from old generations, re-added names don't resurrect,
    DELETE/OPTIMIZE/skipping/checkpoint all work on the mapped table."""
    t = DeltaTable(str(tmp_path / "evo"))
    t.write(_df(spark, 0, 10).coalesce(1), mode="overwrite")
    v = t.evolve(renames={"v": "value"}, adds=[("tag", "string")])
    assert v == 1
    got = t.read(spark).orderBy("k").collect()
    assert [r["value"] for r in got] == [i * 10 for i in range(10)]
    assert all(r["tag"] is None for r in got)
    # protocol upgraded, mapping recorded
    acts = [json.loads(line) for line in open(_cp(t, v))]
    prot = next(a["protocol"] for a in acts if "protocol" in a)
    assert prot["minReaderVersion"] >= 2 and prot["minWriterVersion"] >= 5
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    f_val = next(f for f in json.loads(meta["schemaString"])["fields"]
                 if f["name"] == "value")
    assert f_val["metadata"]["delta.columnMapping.physicalName"] == "v"
    # append in the new logical shape; physical file carries mapped names
    df2 = spark.range(10, 15).selectExpr(
        "id as k", "id * 10 as value", "'new' as tag")
    t.write(df2.coalesce(1), mode="append")
    assert t.read(spark).count() == 15
    # old logical shape rejected loudly
    with pytest.raises(ValueError, match="current logical schema"):
        t.write(_df(spark, 0, 1), mode="append")
    # drop + re-add same name: fresh physical name, no resurrection
    t.evolve(drops=["tag"])
    t.evolve(adds=[("tag", "string")])
    assert all(r["tag"] is None for r in t.read(spark).collect())
    # skipping resolves logical -> physical stats keys
    kept, total = t.files_matching([("value", ">=", 100)])
    assert 0 < kept < total
    # DELETE + OPTIMIZE on the mapped table
    t.delete_where(spark, "value = 30")
    res = t.optimize(spark, target_bytes=128 * 1024 * 1024)
    assert res["version"] >= 1
    rows = t.read(spark).orderBy("k").collect()
    assert [r["value"] for r in rows] == [
        i * 10 for i in range(15) if i != 3]
    # pre-evolution time travel unaffected; checkpoint replays mapped
    assert sorted(r["v"] for r in t.read(spark, version=0).collect()) \
        == [i * 10 for i in range(10)]
    t.checkpoint()
    assert DeltaTable(t.path).read(spark).count() == 14


def _cp(t, v):
    from pr2_transformation_spark.sources.delta import _commit_path
    return _commit_path(t.path, v)


def test_evolution_occ_two_writers(spark, tmp_path):
    """Concurrent evolution loses the create-exclusive race loudly."""
    from pr2_transformation_spark.sources.delta import ConcurrentWriteError

    t = DeltaTable(str(tmp_path / "race"))
    t.write(_df(spark, 0, 5), mode="overwrite")           # v0
    DeltaTable(t.path).write(_df(spark, 5, 8), "append")  # v1 wins
    real = DeltaTable._latest_version
    DeltaTable._latest_version = lambda self: 0
    try:
        with pytest.raises(ConcurrentWriteError, match="schema evolution"):
            t.evolve(renames={"v": "value"})
    finally:
        DeltaTable._latest_version = real
    # the winner's log is intact; evolution retried on the head works
    assert t.evolve(renames={"v": "value"}) == 2
    assert t.read(spark).columns == ["k", "value"]


def test_change_data_feed_lifecycle(spark, tmp_path):
    """Log-derived CDF: inserts from adds, deletes from removes (old DV
    applied) and from DV diffs; OPTIMIZE contributes nothing; range
    slicing; column-mapped tables feed logical names."""
    t = DeltaTable(str(tmp_path / "cdf"))
    df = spark.range(100).selectExpr("id as k", "id * 10 as v")
    t.write(df.filter("k < 60"), mode="overwrite")       # v0
    t.write(df.filter("k >= 60"), mode="append")         # v1
    t.delete_where(spark, "k % 10 = 3")                  # v2 (DV)
    opt_v = t.optimize(spark, target_bytes=128 * 1024 * 1024)["version"]
    t.write(df.filter("k < 5"), mode="overwrite")        # v4
    ch = t.changes(spark, 0)
    counts = {(r["_commit_version"], r["_change_type"]): r["n"]
              for r in ch.groupBy("_commit_version", "_change_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[(0, "insert")] == 60 and counts[(1, "insert")] == 40
    assert counts[(2, "delete")] == 10
    assert not any(v == opt_v for v, _ in counts)
    assert counts[(4, "delete")] == 90 and counts[(4, "insert")] == 5
    # DV diff exactness: v2's deleted keys are exactly k%10==3
    assert sorted(r["k"] for r in ch.filter(
        "_commit_version = 2").collect()) == [
        k for k in range(100) if k % 10 == 3]
    # DV-diff exactness on REPEATED deletes: tombstone k=0, then a
    # wider predicate — only the NEWLY tombstoned row (3) feeds
    t.delete_where(spark, "k = 0")                       # v5
    t.delete_where(spark, "k = 0 or k = 3")              # v6: only 3 new
    assert [(r["k"], r["_change_type"])
            for r in t.changes(spark, 5, 5).collect()] == [(0, "delete")]
    assert [(r["k"], r["_change_type"])
            for r in t.changes(spark, 6, 6).collect()] == [(3, "delete")]
    # range slicing + empty range
    assert t.changes(spark, 2, 2).count() == 10
    assert t.changes(spark, 3, 3).count() == 0
    # mapped table: feed under logical names
    t2 = DeltaTable(str(tmp_path / "cdfmap"))
    t2.write(df.filter("k < 10"), mode="overwrite")
    t2.evolve(renames={"v": "value"})
    t2.delete_where(spark, "value = 30")
    ch2 = t2.changes(spark, 0)
    assert "value" in ch2.columns
    assert ch2.filter("_change_type = 'delete'").collect()[0]["k"] == 3


def test_optimize_zorder_prunes_both_dims(spark, tmp_path):
    """OPTIMIZE ZORDER BY: every output file a bounded rectangle, both
    clustered dims prune, the conjunction prunes harder, content is
    intact, and the rewrite stays CDF-silent (dataChange=False)."""
    t = DeltaTable(str(tmp_path / "zo"))
    df = spark.range(40000).selectExpr(
        "id as k",
        "cast(hash(id) % 1000 + 1000 as long) as a",
        "cast(hash(id + 7) % 1000 + 1000 as long) as b")
    t.write(df.repartition(8), mode="overwrite")
    probe = [("a", ">=", 1400), ("a", "<", 1460),
             ("b", ">=", 1400), ("b", "<", 1460)]
    assert t.files_matching(probe) == (8, 8)  # scattered: nothing prunes
    before = t.read(spark).agg(F.count("*"), F.sum("a")).collect()[0]
    res = t.optimize(spark, zorder_by=["a", "b"], zorder_files=16)
    assert len(res["added"]) == 16
    kept, total = t.files_matching(probe)
    assert kept * 2 <= total
    a_kept, _ = t.files_matching(probe[:2])
    b_kept, _ = t.files_matching(probe[2:])
    assert a_kept < total and b_kept < total
    after = t.read(spark).agg(F.count("*"), F.sum("a")).collect()[0]
    assert tuple(before) == tuple(after)
    # skipping read over the rectangle is lossless vs the residual
    band = t.read(spark, skipping=probe).filter(
        "a >= 1400 and a < 1460 and b >= 1400 and b < 1460").count()
    full = t.read(spark).filter(
        "a >= 1400 and a < 1460 and b >= 1400 and b < 1460").count()
    assert band == full > 0
    # CDF-silent: the zorder version feeds no changes
    assert t.changes(spark, res["version"], res["version"]).count() == 0
    with pytest.raises(ValueError, match="exceeds 63"):
        t.optimize(spark, zorder_by=["a", "b"], zorder_bits=40)


def test_merge_upsert_surgical(spark, tmp_path):
    """MERGE: update/insert/delete modes, only affected files
    rewritten, schema/mode validation, no-op short circuit, OCC race,
    column-mapped tables."""
    from pr2_transformation_spark.sources.delta import ConcurrentWriteError

    t = DeltaTable(str(tmp_path / "mg"))
    df = spark.range(1000).selectExpr("id as k", "id * 10 as v")
    t.write(df.repartitionByRange(10, "k").sortWithinPartitions("k"),
            mode="overwrite")
    src = spark.range(5).selectExpr("id + 100 as k", "99999 as v") \
        .union(spark.range(2000, 2005).selectExpr("id as k", "id as v"))
    res = t.merge(spark, src, on=["k"])
    assert res["rows_updated"] == 5 and res["rows_inserted"] == 5
    assert 0 < res["files_rewritten"] < 10  # only the 100-band file(s)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(got) == 1005
    assert got[102] == 99999 and got[2003] == 2003 and got[99] == 990
    # delete mode
    r2 = t.merge(spark, spark.range(3).selectExpr("id as k", "0 as v"),
                 on=["k"], when_matched="delete",
                 when_not_matched="ignore")
    assert r2["rows_deleted"] == 3 and t.read(spark).count() == 1002
    # ignore matched + insert new: matched target rows must be KEPT
    # as-is (regression: the rewrite used to anti-join them away)
    r3 = t.merge(
        spark,
        spark.range(3).selectExpr("id + 103 as k", "11111 as v")
        .union(spark.range(3000, 3002).selectExpr("id as k", "id as v")),
        on=["k"], when_matched="ignore")
    assert r3["rows_updated"] == 0 and r3["rows_deleted"] == 0
    assert r3["rows_inserted"] == 2 and r3["files_rewritten"] == 0
    got3 = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(got3) == 1004
    assert got3[103] == 99999 and got3[105] == 1050  # untouched
    assert got3[3001] == 3001
    # no-op
    assert t.merge(spark, df.limit(0), on=["k"])["version"] == -1
    # validation
    with pytest.raises(ValueError, match="target schema"):
        t.merge(spark, spark.range(1).selectExpr("id as wrong"), on=["k"])
    with pytest.raises(ValueError, match="when_matched"):
        t.merge(spark, df.limit(1), on=["k"], when_matched="upsert")
    # OCC: a commit landing mid-merge collides
    DeltaTable(t.path).write(df.filter("k > 990").limit(1), "append")
    real = DeltaTable._latest_version
    DeltaTable._latest_version = lambda self: 2  # stale (pre-append)
    try:
        with pytest.raises(ConcurrentWriteError, match="MERGE read"):
            t.merge(spark, spark.range(1).selectExpr("id as k",
                                                     "5 as v"), on=["k"])
    finally:
        DeltaTable._latest_version = real
    # mapped table merge
    t2 = DeltaTable(str(tmp_path / "mgmap"))
    t2.write(df.filter("k < 10"), mode="overwrite")
    t2.evolve(renames={"v": "value"})
    r3 = t2.merge(spark, spark.range(2).selectExpr(
        "id as k", "7 as value"), on=["k"])
    assert r3["rows_updated"] == 2
    vals = {r["k"]: r["value"] for r in t2.read(spark).collect()}
    assert vals[0] == 7 and vals[1] == 7 and vals[2] == 20


def test_cdf_cursor_exactly_once(spark, tmp_path):
    """CDFCursor: uncommitted batches re-deliver identically, commit
    advances durably, caught-up returns None, position survives a new
    cursor instance (the checkpoint is the state, not the object)."""
    t = DeltaTable(str(tmp_path / "tbl"))
    ck = str(tmp_path / "ckpt")
    cur = t.cdf_cursor(ck)
    assert cur.position() == -1
    t.write(_df(spark, 0, 50), mode="overwrite")          # v0
    df1, v1 = cur.next(spark)
    assert v1 == 0 and df1.count() == 50
    # replay before commit: identical batch
    df1b, v1b = cur.next(spark)
    assert v1b == v1 and df1b.count() == 50
    cur.commit(v1)
    assert cur.position() == 0
    # caught up
    assert cur.next(spark)[0] is None
    t.write(_df(spark, 50, 60), mode="append")            # v1
    t.delete_where(spark, "k < 5")                        # v2
    # a FRESH cursor on the same checkpoint resumes correctly
    cur2 = t.cdf_cursor(ck)
    df2, v2 = cur2.next(spark)
    assert v2 == 2
    counts = {r["_change_type"]: r["n"] for r in df2.groupBy(
        "_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"insert": 10, "delete": 5}
    cur2.commit(v2)
    assert t.cdf_cursor(ck).position() == 2


def test_restore_rollback(spark, tmp_path):
    """RESTORE: forward metadata-only rollback, history intact, writes
    continue, vacuumed targets and bad ranges fail loudly."""
    t = DeltaTable(str(tmp_path / "rs"))
    df = spark.range(100).selectExpr("id as k", "id * 10 as v")
    t.write(df.filter("k < 50"), mode="overwrite")     # v0
    t.write(df.filter("k >= 50"), mode="append")       # v1
    t.delete_where(spark, "k % 10 = 0")                # v2 (the oops)
    v = t.restore(1)
    assert v == 3
    assert t.read(spark).count() == 100
    assert t.read(spark, version=2).count() == 90      # history intact
    t.write(df.filter("k < 3").selectExpr("k + 1000 as k", "v"),
            mode="append")
    assert t.read(spark).count() == 103
    with pytest.raises(ValueError, match="not in 0"):
        t.restore(99)
    # vacuumed target: restore to v0 after the overwrite+vacuum fails
    t2 = DeltaTable(str(tmp_path / "rs2"))
    t2.write(df.filter("k < 10"), mode="overwrite", now_ms=1_000)
    t2.write(df.filter("k >= 90"), mode="overwrite", now_ms=2_000)
    t2.vacuum(retain_ms=10_000, now_ms=1_000_000)
    with pytest.raises(ValueError, match="vacuumed"):
        t2.restore(0)

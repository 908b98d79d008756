"""FastCDC content-defined chunking (functions/dedup.py): coverage,
bounds, determinism, the shift-invariance property that is the whole
point, and the distributed chunk table."""

from __future__ import annotations

import random

import pytest

from pr2_transformation_spark.functions.dedup import (
    cdc_chunk_table,
    cdc_dedup_stats,
    fastcdc_chunks,
)


def test_coverage_bounds_and_determinism():
    rnd = random.Random(9)
    data = bytes(rnd.randrange(256) for _ in range(300_000))
    chunks = fastcdc_chunks(data)
    pos = 0
    for off, ln, _h in chunks:
        assert off == pos and ln > 0
        pos += ln
    assert pos == len(data)
    lens = [c[1] for c in chunks]
    assert max(lens) <= 65536
    assert all(ln >= 2048 for ln in lens[:-1])  # only the tail undershoots
    # normalized chunking keeps the mean near avg_size
    assert 4096 < sum(lens) / len(lens) < 16384
    assert fastcdc_chunks(data) == chunks  # deterministic
    assert fastcdc_chunks(b"") == []
    tiny = fastcdc_chunks(b"ab")
    assert tiny == [(0, 2, tiny[0][2])]


def test_shift_invariance_and_shared_regions():
    rnd = random.Random(9)
    data = bytes(rnd.randrange(256) for _ in range(300_000))
    h0 = {h for _, _, h in fastcdc_chunks(data)}
    h1 = {h for _, _, h in fastcdc_chunks(b"X" + data)}
    assert len(h0 & h1) / len(h0) > 0.9  # boundaries re-synchronize
    common = bytes(rnd.randrange(256) for _ in range(50_000))
    a = bytes(rnd.randrange(256) for _ in range(30_000)) + common
    b = common + bytes(rnd.randrange(256) for _ in range(40_000))
    ha = {h for _, _, h in fastcdc_chunks(a)}
    hb = {h for _, _, h in fastcdc_chunks(b)}
    assert len(ha & hb) >= 3  # the shared region dedups at any offset


def test_parameter_validation():
    with pytest.raises(ValueError, match="power of two"):
        fastcdc_chunks(b"x" * 100, 64, 1000, 2000)
    with pytest.raises(ValueError, match="min_size"):
        fastcdc_chunks(b"x" * 100, 32, 1024, 4096)
    with pytest.raises(ValueError, match="min_size"):
        fastcdc_chunks(b"x" * 100, 8192, 1024, 4096)


def test_distributed_chunk_table_and_stats(spark):
    import random as _r

    from pyspark.sql import functions as F

    rnd = _r.Random(4)
    snippet = bytes(rnd.randrange(256) for _ in range(20_000))
    rows = []
    for i in range(12):
        own = bytes(rnd.randrange(256) for _ in range(10_000))
        rows.append((i, own + snippet if i % 3 == 0 else own))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    chunks = cdc_chunk_table(df, "payload", "doc_id",
                             min_size=256, avg_size=1024, max_size=8192)
    # reassembly invariant: per-doc chunk lengths sum to payload bytes
    got = {r["id"]: r["b"] for r in chunks.groupBy("id").agg(
        F.sum("length").alias("b")).collect()}
    assert got == {i: len(p) for i, p in rows}
    stats = cdc_dedup_stats(chunks).collect()[0]
    assert stats["total_bytes"] == sum(len(p) for _, p in rows)
    # the shared snippet dedups: unique bytes strictly below total
    assert stats["unique_bytes"] < stats["total_bytes"]
    assert stats["unique_chunks"] < stats["total_chunks"]

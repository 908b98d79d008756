"""Parquet split-block Bloom filters (sources/parquet_bloom.py):
xxHash64 SBBF per BloomFilter.md, pinned against parquet-java (Spark's
writer) — including BYTE-IDENTICAL bitsets for the same value set and
size, since SBBF construction is order-independent and deterministic."""

from __future__ import annotations

import glob
import io
import random

import pytest

from pr2_transformation_spark.sources.parquet_bloom import (
    SplitBlockBloom,
    bloom_filter_bytes,
    bloom_hash,
    optimal_num_bytes,
    prune_row_groups_bloom,
    read_bloom_filter,
)
from pr2_transformation_spark.sources.parquet_meta import read_footer_bytes
from pr2_transformation_spark.sources.parquet_write import write_parquet_bytes


def test_insert_check_and_fpp_sizing():
    rnd = random.Random(5)
    vals = [rnd.randrange(10**12) for _ in range(5000)]
    nb = optimal_num_bytes(5000, 0.01)
    bf = SplitBlockBloom(nb)
    for v in vals:
        bf.insert(v, "INT64")
    assert all(bf.might_contain(v, "INT64") for v in vals)  # no false negs
    fps = sum(bf.might_contain(10**13 + i, "INT64") for i in range(10000))
    assert fps < 300  # fpp=0.01 sizing: ~1% plus slack


def test_header_roundtrip_and_seams():
    blob = bloom_filter_bytes(["a", "b", None, "c"], "BYTE_ARRAY",
                              num_bytes=64)
    bf = read_bloom_filter(blob, 0)
    assert len(bf.bits) == 64
    assert bf.might_contain("a", "BYTE_ARRAY")
    assert not bf.might_contain("zz", "BYTE_ARRAY")
    with pytest.raises(ValueError):
        SplitBlockBloom(48)  # not a power of two
    with pytest.raises(NotImplementedError):
        bloom_hash(True, "BOOLEAN")
    with pytest.raises(ValueError):
        bloom_hash(None, "INT64")


def test_writer_emits_blooms_own_reader_prunes(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    rnd = random.Random(11)
    keys = [rnd.randrange(10**9) for _ in range(4000)]
    buf = write_parquet_bytes(
        [("k", "INT64", keys)], codec="snappy", row_group_rows=1000,
        use_dictionary=False, bloom_filters={"k": None})
    # independent readers still accept the file
    assert pq.read_table(io.BytesIO(buf)).column("k").to_pylist() == keys
    fn = str(tmp_path / "b.parquet")
    open(fn, "wb").write(buf)
    assert duckdb.sql(f"SELECT count(*) FROM read_parquet('{fn}')"
                      ).fetchone()[0] == 4000
    footer = read_footer_bytes(buf)
    assert all(c["bloom_filter_offset"] is not None
               for rg in footer["row_groups"] for c in rg["columns"])
    # a present key survives its own group; the other 3 groups prune
    # (keys are random 1e9-range values, cross-group collision ~1e-5)
    pr = prune_row_groups_bloom(buf, footer, "k", keys[2500])
    assert pr[2]["selected"] and sum(p["selected"] for p in pr) == 1
    # an absent key prunes everywhere
    pr = prune_row_groups_bloom(buf, footer, "k", 10**9 + 7)
    assert not any(p["selected"] for p in pr)


def test_missing_bloom_is_conservative():
    buf = write_parquet_bytes([("k", "INT64", [1, 2, 3])])
    footer = read_footer_bytes(buf)
    pr = prune_row_groups_bloom(buf, footer, "k", 99)
    assert pr == [{"row_group": 0, "selected": True, "has_bloom": False}]


@pytest.fixture(scope="module")
def java_bloom_file(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jbloom") / "t")
    df = spark.range(9000).selectExpr(
        "id", "concat('key_', cast(id * 2654435761 % 1000000007 as string)) "
        "as s")
    (df.coalesce(1).write.mode("overwrite")
     .option("parquet.bloom.filter.enabled", "true")
     .option("parquet.enable.dictionary", "false")
     .parquet(out))
    return glob.glob(out + "/*.parquet")[0]


def test_reads_parquet_java_bloom_no_false_negatives(java_bloom_file):
    import duckdb

    data = open(java_bloom_file, "rb").read()
    footer = read_footer_bytes(data)
    cols = {c["path"]: c for c in footer["row_groups"][0]["columns"]}
    assert cols["s"]["bloom_filter_offset"] is not None
    bf = read_bloom_filter(data, cols["s"]["bloom_filter_offset"])
    vals = [r[0] for r in duckdb.sql(
        f"SELECT s FROM read_parquet('{java_bloom_file}')").fetchall()]
    assert all(bf.might_contain(v, "BYTE_ARRAY") for v in vals)
    fps = sum(bf.might_contain(f"nope_{i}", "BYTE_ARRAY")
              for i in range(5000))
    assert fps < 150


def test_bitset_byte_identical_to_parquet_java(java_bloom_file):
    import duckdb

    data = open(java_bloom_file, "rb").read()
    footer = read_footer_bytes(data)
    cols = {c["path"]: c for c in footer["row_groups"][0]["columns"]}
    java = read_bloom_filter(data, cols["s"]["bloom_filter_offset"])
    vals = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT s FROM read_parquet('{java_bloom_file}')"
    ).fetchall()]
    own = SplitBlockBloom(len(java.bits))
    for v in vals:
        own.insert(v, "BYTE_ARRAY")
    assert bytes(own.bits) == bytes(java.bits)
    # and the INT64 plane too, if parquet-java emitted one for id
    if cols["id"]["bloom_filter_offset"] is not None:
        java_id = read_bloom_filter(data, cols["id"]["bloom_filter_offset"])
        own_id = SplitBlockBloom(len(java_id.bits))
        for v in range(9000):
            own_id.insert(v, "INT64")
        assert bytes(own_id.bits) == bytes(java_id.bits)


def test_vectorized_bitset_matches_scalar_inserts():
    """The numpy fast path in bloom_filter_bytes must be BYTE-IDENTICAL
    to scalar SplitBlockBloom.insert for INT64 and INT32 (r10)."""
    import random

    from pr2_transformation_spark.sources.parquet_bloom import (
        SplitBlockBloom,
        bloom_filter_bytes,
        optimal_num_bytes,
    )

    rng = random.Random(7)
    for ptype, lo, hi in (
            ("INT64", -(2 ** 62), 2 ** 62),
            ("INT32", -(2 ** 31), 2 ** 31 - 1)):
        vals = [rng.randrange(lo, hi) for _ in range(4000)] + [0, -1, lo]
        nb = optimal_num_bytes(len(set(vals)))
        fast = bloom_filter_bytes(vals, ptype, num_bytes=nb)
        bf = SplitBlockBloom(nb)
        for v in set(vals):
            bf.insert(v, ptype)
        assert fast.endswith(bytes(bf.bits))
        # header + bitset equality against the scalar-built serialization
        slow_full = bloom_filter_bytes(
            [float("nan")], "DOUBLE", num_bytes=nb)  # force scalar path shape
        assert len(fast) - nb == len(slow_full) - nb  # same header length

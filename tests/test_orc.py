"""From-scratch ORC reader (sources/orc.py) conformance: files written
by TWO independent implementations — Spark's Java ORC writer and
pyarrow's C++ libORC — must decode byte-exact across every codec, the
full RLE v2 sub-encoding quartet, dictionary and direct strings,
PRESENT-stream null weaving, dates/timestamps, and multi-stripe files.
"""

from __future__ import annotations

import glob
import random

import pyarrow as pa
import pyarrow.orc as po
import pytest

from pr2_transformation_spark.sources.orc import (
    orc_metadata,
    read_orc,
    read_orc_distributed,
)


def _spark_write(spark, df, path, codec):
    df.coalesce(1).write.mode("overwrite").option(
        "compression", codec).orc(path)
    return glob.glob(path + "/*.orc")[0]


def _assert_matches(df, names, cols):
    expected = {c: [r[c] for r in df.collect()] for c in df.columns}
    assert names == df.columns
    for n in names:
        got, exp = cols[n], expected[n]
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            if isinstance(e, float):
                assert g == e or abs(g - e) < 1e-5, (n, g, e)
            else:
                assert g == e, (n, g, e)


@pytest.mark.parametrize("codec", ["none", "zlib", "snappy", "lz4", "zstd"])
def test_spark_written_all_types_all_codecs(spark, tmp_path, codec):
    """Every supported codec over a schema that exercises long/int/
    short/byte/bool/float/double, dictionary + direct strings, nullable
    columns (PRESENT streams), and dates."""
    df = spark.range(5000).selectExpr(
        "id", "cast(id % 13 as int) as i32",
        "cast(id % 3 as smallint) as i16",
        "cast(id % 120 - 60 as tinyint) as i8",
        "id % 2 = 0 as flag",
        "cast(id * 0.5 as float) as f",
        "cast(id * 2.25 as double) as d",
        "concat('row-', id % 50) as dict_str",
        "concat('unique-string-value-', id) as uniq_str",
        "case when id % 7 = 0 then null else concat('n-', id) end "
        "as nullable_str",
        "case when id % 11 = 0 then null else id * 3 end as nullable_long",
        "date_add(date'2020-01-01', cast(id % 1000 as int)) as dt")
    f = _spark_write(spark, df, str(tmp_path / codec), codec)
    names, cols = read_orc(f)
    _assert_matches(df, names, cols)


def test_rlev2_patched_base(spark, tmp_path):
    """Mostly-small values with rare huge outliers force the Java
    writer into PATCHED_BASE runs (base + patch-list high bits)."""
    df = spark.range(2000).selectExpr(
        "case when id % 500 = 7 then id * 1000000000 "
        "else id % 100 end as v", "id")
    f = _spark_write(spark, df, str(tmp_path / "pb"), "zstd")
    names, cols = read_orc(f)
    _assert_matches(df, names, cols)


def test_rlev2_delta_negative_and_monotonic(spark, tmp_path):
    df = spark.range(1000).selectExpr(
        "-5000 + id * 3 as v", "cast(id as int) - 500 as w")
    f = _spark_write(spark, df, str(tmp_path / "nd"), "zlib")
    names, cols = read_orc(f)
    _assert_matches(df, names, cols)


def test_rlev2_direct_wide_random(spark, tmp_path):
    rng = random.Random(11)
    df = spark.createDataFrame(
        [(rng.randrange(-2 ** 40, 2 ** 40),) for _ in range(3000)],
        "v long")
    f = _spark_write(spark, df, str(tmp_path / "dw"), "snappy")
    names, cols = read_orc(f)
    _assert_matches(df, names, cols)


def test_timestamps_base2015_and_scaled_nanos(spark, tmp_path):
    df = spark.sql(
        "select timestamp'2023-05-17 12:34:56.789123' "
        "+ make_interval(0,0,0,0,0,0,id) as t, id from range(100)")
    f = _spark_write(spark, df, str(tmp_path / "ts"), "zstd")
    names, cols = read_orc(f)
    _assert_matches(df, names, cols)


def test_multistripe(spark, tmp_path):
    df = spark.range(300000).selectExpr(
        "id", "concat('text-', id % 1000) as s")
    f = _spark_write(spark, df, str(tmp_path / "ms"), "zstd")
    meta = orc_metadata(f)
    assert meta["num_rows"] == 300000
    names, cols = read_orc(f)
    assert cols["id"] == list(range(300000))
    assert cols["s"][123456] == "text-456"


@pytest.mark.parametrize(
    "comp", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD", "LZ4"])
def test_pyarrow_written(tmp_path, comp):
    """Second independent writer: pyarrow's bundled libORC (different
    encoder choices than the Java writer)."""
    t = pa.table({
        "id": pa.array(range(4000), pa.int64()),
        "s": pa.array([f"val-{i % 30}" for i in range(4000)]),
        "d": pa.array([i * 0.25 for i in range(4000)], pa.float64()),
        "opt": pa.array([None if i % 5 == 0 else i for i in range(4000)],
                        pa.int32()),
    })
    path = str(tmp_path / f"{comp}.orc")
    po.write_table(t, path, compression=comp)
    names, cols = read_orc(path)
    assert names == ["id", "s", "d", "opt"]
    assert cols["id"] == list(range(4000))
    assert cols["s"] == [f"val-{i % 30}" for i in range(4000)]
    assert cols["opt"][:6] == [None, 1, 2, 3, 4, None]
    assert orc_metadata(path)["compression"] == comp.lower().replace(
        "uncompressed", "none")


def test_metadata_only(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "concat('x', id) as s")
    _spark_write(spark, df, str(tmp_path / "meta"), "zstd")
    f = glob.glob(str(tmp_path / "meta") + "/*.orc")[0]
    meta = orc_metadata(f)
    assert meta["schema"] == [("id", "long"), ("s", "string")]
    assert meta["num_rows"] == 1000
    assert meta["compression"] == "zstd"
    assert all(s["num_rows"] > 0 for s in meta["stripes"])


def test_column_projection(spark, tmp_path):
    df = spark.range(500).selectExpr("id", "concat('a', id) as a",
                                     "id * 2 as b")
    f = _spark_write(spark, df, str(tmp_path / "proj"), "zstd")
    names, cols = read_orc(f, columns=["b"])
    assert names == ["b"]
    assert cols["b"] == [i * 2 for i in range(500)]


def test_distributed_reader(spark, tmp_path):
    df = spark.range(10000).selectExpr(
        "id", "concat('doc-', id % 97) as tag",
        "case when id % 4 = 0 then null else cast(id * 1.5 as double) end "
        "as score")
    df.repartition(4).write.mode("overwrite").option(
        "compression", "zstd").orc(str(tmp_path / "dist"))
    out = read_orc_distributed(
        spark, str(tmp_path / "dist"),
        "id long, tag string, score double")
    rows = out.collect()
    assert len(rows) == 10000
    assert sorted(r["id"] for r in rows) == list(range(10000))
    nulls = sum(1 for r in rows if r["score"] is None)
    assert nulls == 2500


def test_list_and_map_columns(spark, tmp_path):
    """One nesting level: LIST and MAP of primitives (LENGTH streams +
    recursive child columns), nullable lists included."""
    df = spark.range(2000).selectExpr(
        "id",
        "array(id, id + 1, id * 2) as arr",
        "case when id % 7 = 0 then null "
        "else array(concat('s', id)) end as sarr",
        "map(concat('k', id % 5), id, 'fixed', id * 2) as m")
    f = _spark_write(spark, df, str(tmp_path / "lm"), "zstd")
    names, cols = read_orc(f)
    rows = df.collect()
    assert cols["arr"] == [[r["id"], r["id"] + 1, r["id"] * 2]
                           for r in rows]
    assert cols["sarr"][:8] == [None if i % 7 == 0 else [f"s{i}"]
                                for i in range(8)]
    assert cols["m"][3] == {"k3": 3, "fixed": 6}


def test_unsupported_nested_raises(spark, tmp_path):
    df = spark.range(10).selectExpr(
        "id", "array(array(id)) as deep")
    f = _spark_write(spark, df, str(tmp_path / "nested"), "zstd")
    with pytest.raises(NotImplementedError, match="list"):
        read_orc(f)


def test_stripe_statistics_and_pruned_read(tmp_path):
    """ORC prune plane: Metadata stripe stats skip whole stripes from
    tail bytes alone; ROW_INDEX stats select row groups inside the
    survivors; the pruned answer equals full-scan + residual exactly
    (ints, strings, doubles, nulls)."""
    from pr2_transformation_spark.sources.orc import (
        orc_stripe_statistics,
        read_orc_bytes,
        read_orc_bytes_pruned,
    )

    rng = random.Random(41)
    n = 60000
    ks = list(range(n))
    t = pa.table({
        "k": pa.array(ks, pa.int64()),
        "v": pa.array([None if k % 97 == 0 else rng.randint(-500, 500)
                       for k in ks], pa.int64()),
        "s": pa.array([f"id{k:07d}" for k in ks]),
        "d": pa.array([k * 0.25 for k in ks], pa.float64()),
    })
    path = str(tmp_path / "p.orc")
    po.write_table(t, path, stripe_size=48 * 1024, compression="zlib",
                   row_index_stride=1000)
    buf = open(path, "rb").read()

    sstats = orc_stripe_statistics(buf)
    assert len(sstats) >= 3, len(sstats)
    assert sstats[0]["k"]["min"] == 0
    assert sum(st["k"]["n"] for st in sstats) == n
    assert all(st["v"]["has_null"] for st in sstats)
    covered = max(st["k"]["max"] for st in sstats)
    assert covered == n - 1

    _, full = read_orc_bytes(buf)
    for col, lo, hi in (("k", 20000, 21500), ("s", "id0040000", "id0040999"),
                        ("d", 2500.0, 2600.0)):
        names, cols, acc = read_orc_bytes_pruned(buf, col, lo, hi)
        exp_idx = [i for i, v in enumerate(full[col])
                   if v is not None and lo <= v <= hi]
        for name in names:
            assert cols[name] == [full[name][i] for i in exp_idx], (col, name)
        assert acc["stripes_read"] < acc["stripes_total"], col
        assert acc["row_groups_selected"] < acc["row_groups_total"], col
        assert acc["rows_emitted"] == len(exp_idx)

    # empty range: zero stripes touched
    _, cols0, acc0 = read_orc_bytes_pruned(buf, "k", n * 2, n * 3)
    assert acc0["stripes_read"] == 0 and not cols0["k"]
    # unknown column raises
    with pytest.raises(ValueError, match="not in file"):
        read_orc_bytes_pruned(buf, "nope", 0, 1)


def test_pruned_read_without_row_index(tmp_path):
    """A writer that disabled row indexes (this repo's own orc_write,
    rowIndexStride=0) degrades gracefully: stripe-level pruning only,
    each stripe one group, answers still exact."""
    from pr2_transformation_spark.sources.orc import read_orc_bytes_pruned
    from pr2_transformation_spark.sources.orc_write import write_orc_bytes

    n = 20000
    buf = write_orc_bytes(
        [("k", "long", list(range(n))),
         ("s", "string", [f"r{k}" for k in range(n)])],
        compression="zlib", stripe_rows=4000)
    names, cols, acc = read_orc_bytes_pruned(buf, "k", 9000, 9999)
    assert cols["k"] == list(range(9000, 10000))
    assert cols["s"] == [f"r{k}" for k in range(9000, 10000)]
    assert acc["row_groups_total"] == acc["stripes_total"]


def test_bloom_filter_probes_conform_to_liborc(tmp_path):
    """ORC bloom tier vs libORC-written BLOOM_FILTER_UTF8 streams: the
    single-lane Murmur3 hash64 (seed 104729) for strings and Thomas
    Wang mix for longs reproduce libORC's bit positions exactly — no
    false negatives over 60 present probes, absent values almost
    always fully excluded, and the pruned reader's equality path uses
    the tier where min/max stats are useless."""
    import pyarrow.orc as po2

    from pr2_transformation_spark.sources.orc import (
        orc_bloom_row_groups,
        read_orc_bytes,
        read_orc_bytes_pruned,
    )

    rng = random.Random(11)
    ks = list(range(20000))
    rng.shuffle(ks)   # scattered: every row group spans the full range
    t = pa.table({
        "k": pa.array(ks, pa.int64()),
        "s": pa.array([f"key{v:06d}" for v in ks]),
    })
    path = str(tmp_path / "bloom.orc")
    po2.write_table(t, path, stripe_size=64 * 1024, compression="zlib",
                    row_index_stride=2000, bloom_filter_columns=[1, 2],
                    bloom_filter_fpp=0.01)
    buf = open(path, "rb").read()
    _, cols = read_orc_bytes(buf)
    for probe in rng.sample(cols["s"], 30):
        assert any(any(g) for g in orc_bloom_row_groups(buf, "s", probe))
    for probe in rng.sample(cols["k"], 30):
        assert any(any(g) for g in orc_bloom_row_groups(buf, "k", probe))
    absent_s = sum(
        1 for i in range(50)
        if not any(any(g) for g in orc_bloom_row_groups(buf, "s",
                                                        f"nope{i}")))
    absent_k = sum(
        1 for i in range(50)
        if not any(any(g) for g in orc_bloom_row_groups(buf, "k",
                                                        10**9 + i)))
    assert absent_s >= 45 and absent_k >= 45
    # equality path of the pruned reader: stats prune NOTHING on the
    # scattered column, blooms prune almost everything
    _, got, acc = read_orc_bytes_pruned(buf, "k", 777, 777)
    assert got["k"] == [777]
    assert acc["row_groups_bloom_pruned"] >= acc["row_groups_total"] - 3
    # range probes (lo != hi) never consult blooms -> still exact
    _, got2, _ = read_orc_bytes_pruned(buf, "k", 100, 110)
    assert sorted(got2["k"]) == list(range(100, 111))

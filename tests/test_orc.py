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

"""From-scratch parquet writer (sources/parquet_write.py): thrift
compact footer + v1 pages validated against THREE independent readers
(pyarrow, DuckDB, Spark) and this repo's own reader, all codecs."""

from __future__ import annotations

import io
import os

import pytest

from pr2_transformation_spark.sources.parquet_data import read_parquet_bytes
from pr2_transformation_spark.sources.parquet_meta import read_footer_bytes
from pr2_transformation_spark.sources.parquet_write import (
    rle_bp_encode,
    write_parquet,
    write_parquet_bytes,
    write_parquet_distributed,
)

COLS = [
    ("k", "INT64", [1, 2, None, 4, 5, 6, 7, 8, 9, 10]),
    ("i", "INT32", [-3, 0, 7, None, 2, 2, 2, 2, 2, 2]),
    ("x", "DOUBLE", [0.5, None, 2.25, 3.5, -1.0, 0.0, 9.9, 1.1, 2.2, 3.3]),
    ("f", "FLOAT", [0.5, 1.5, None, 3.5, -1.0, 0.0, 9.5, 1.25, 2.5, 3.75]),
    ("b", "BOOLEAN",
     [True, False, None, True, True, False, True, False, True, False]),
    ("s", "BYTE_ARRAY",
     ["aa", "bb", None, "aa", "cc", "aa", "bb", "aa", "aa", "aa"]),
]


@pytest.mark.parametrize("codec", ["none", "snappy", "gzip", "zstd", "lz4_raw"])
@pytest.mark.parametrize("rg", [None, 4])
def test_roundtrip_pyarrow_duckdb_own_reader(codec, rg, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    data = write_parquet_bytes(COLS, codec=codec, row_group_rows=rg)
    t = pq.read_table(io.BytesIO(data))
    for n, _, vals in COLS:
        assert t.column(n).to_pylist() == vals, (codec, n)
    fn = str(tmp_path / "t.parquet")
    open(fn, "wb").write(data)
    r = duckdb.sql(
        f"SELECT count(*), sum(k), min(s), sum(x) "
        f"FROM read_parquet('{fn}')").fetchone()
    assert r[0] == 10 and r[1] == 52 and r[2] == "aa"
    assert abs(r[3] - 21.75) < 1e-12
    names, got = read_parquet_bytes(data)
    assert names == [c[0] for c in COLS]
    for n, _, vals in COLS:
        want = [v.encode() if isinstance(v, str) else v for v in vals]
        assert got[n] == want, (codec, n)


def test_deterministic_bytes_and_footer_stats():
    assert write_parquet_bytes(COLS, codec="snappy") == \
        write_parquet_bytes(COLS, codec="snappy")
    f = read_footer_bytes(write_parquet_bytes(COLS, row_group_rows=4))
    assert f["num_rows"] == 10 and len(f["row_groups"]) == 3
    c0 = f["row_groups"][0]["columns"][0]
    assert (c0["min"], c0["max"], c0["null_count"]) == (1, 4, 1)
    cs = f["row_groups"][0]["columns"][5]
    assert (cs["min"], cs["max"]) == ("aa", "bb")  # rows 0-3 of COLS


def test_dictionary_page_emitted_and_smaller():
    """A low-cardinality string column must go through the dictionary
    path (dictionary_page_offset set, PLAIN_DICTIONARY in encodings)."""
    vals = [f"v{i % 3}" for i in range(3000)]
    data = write_parquet_bytes([("s", "BYTE_ARRAY", vals)], codec="none")
    f = read_footer_bytes(data)
    assert f["row_groups"][0]["columns"][0]["dictionary_page_offset"] \
        is not None
    plain = write_parquet_bytes([("s", "BYTE_ARRAY", vals)], codec="none",
                                use_dictionary=False)
    assert read_footer_bytes(plain)["row_groups"][0]["columns"][0][
        "dictionary_page_offset"] is None
    assert len(data) < len(plain) / 3
    import pyarrow.parquet as pq
    assert pq.read_table(io.BytesIO(data)).column("s").to_pylist() == vals


def test_all_null_empty_string_and_edge_shapes():
    import pyarrow.parquet as pq

    edge = [("a", "INT64", [None] * 20),
            ("s", "BYTE_ARRAY", [""] * 20),
            ("d", "DOUBLE", [float(i) for i in range(20)])]
    t = pq.read_table(io.BytesIO(write_parquet_bytes(edge)))
    assert t.column("a").to_pylist() == [None] * 20
    assert t.column("s").to_pylist() == [""] * 20
    one = pq.read_table(io.BytesIO(
        write_parquet_bytes([("k", "INT32", [7])], codec="gzip")))
    assert one.column("k").to_pylist() == [7]


def test_rle_bp_encode_roundtrips_against_own_decoder():
    from pr2_transformation_spark.sources.parquet_data import rle_bp_hybrid

    cases = [
        ([1] * 100, 1),
        ([0, 1] * 50, 1),
        ([0] * 9 + [1, 0, 1, 1, 0] + [1] * 20, 1),
        (list(range(8)) * 5, 3),
        ([5] * 3, 3),
        ([], 2),
    ]
    for vals, bw in cases:
        enc = rle_bp_encode(vals, bw)
        assert rle_bp_hybrid(enc, 0, len(enc), bw, len(vals)) == vals


def test_seam_errors_are_loud():
    with pytest.raises(NotImplementedError):
        write_parquet_bytes([("k", "INT96", [1])])
    with pytest.raises(NotImplementedError):
        write_parquet_bytes([("k", "INT64", [1])], codec="brotli")
    with pytest.raises(ValueError):
        write_parquet_bytes([("a", "INT64", [1]), ("b", "INT64", [1, 2])])


def test_spark_reads_engine_written_files(spark, tmp_path):
    """Spark's vectorized reader (a third independent implementation)
    accepts engine-written files, including the distributed sink shape
    where every partition serializes its own file with this writer."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    fn = str(tmp_path / "one.parquet")
    write_parquet(fn, COLS, codec="snappy")
    got = spark.read.parquet(fn)
    assert got.count() == 10
    assert sorted(r["k"] for r in got.collect() if r["k"] is not None) == \
        [1, 2, 4, 5, 6, 7, 8, 9, 10]
    assert {r["s"] for r in got.collect()} == {"aa", "bb", "cc", None}

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("m"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 3).cast("string")))
        .alias("s"),
        (F.col("id") * 0.25).alias("x"),
    ).repartition(4)
    out = str(tmp_path / "dist")
    n_files = write_parquet_distributed(df, out, codec="zstd")
    assert n_files == 4
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.agg(F.sum("k")).collect()[0][0] == 499500
    assert back.filter(F.col("s").isNull()).count() == 200
    created = {pq.ParquetFile(os.path.join(out, p)).metadata.created_by
               for p in os.listdir(out) if p.endswith(".parquet")}
    assert created == {"pr2-transformation-spark parquet_write"}


def test_lz4_block_compress_conformance_against_liblz4():
    """Bidirectional conformance with the reference implementation:
    liblz4 decodes our blocks byte-exactly, and our decoder decodes
    liblz4's output.  Skipped when the system library is absent."""
    import ctypes
    import ctypes.util
    import random

    from pr2_transformation_spark.sources.parquet_data import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    name = ctypes.util.find_library("lz4") or "liblz4.so.1"
    try:
        lz4 = ctypes.CDLL(name)
    except OSError:
        pytest.skip("no liblz4 on this host")
    lz4.LZ4_decompress_safe.restype = ctypes.c_int
    lz4.LZ4_compress_default.restype = ctypes.c_int

    rnd = random.Random(7)
    cases = [
        b"", b"a", b"hello world " * 200,
        bytes(rnd.randrange(256) for _ in range(10000)),
        bytes(rnd.choice(b"abcd") for _ in range(50000)),
        b"x" * 100000, bytes(range(256)) * 10,
    ]
    for c in cases:
        enc = lz4_block_compress(c)
        assert lz4_block_decompress(enc, len(c)) == c
        dst = ctypes.create_string_buffer(len(c) + 16)
        r = lz4.LZ4_decompress_safe(enc, dst, len(enc), len(dst))
        assert r == len(c) and dst.raw[:r] == c
        bound = len(c) + len(c) // 255 + 64
        dst2 = ctypes.create_string_buffer(bound)
        r2 = lz4.LZ4_compress_default(bytes(c), dst2, len(c), bound)
        assert r2 > 0
        assert lz4_block_decompress(dst2.raw[:r2], len(c)) == c


def test_delta_and_byte_stream_split_encodings(tmp_path):
    """Round-7 writer symmetry for the modern encodings the reader
    already decodes: DELTA_BINARY_PACKED ints and BYTE_STREAM_SPLIT
    floats, verified by THREE independent readers (pyarrow, DuckDB,
    and the repo's own data plane)."""
    import io
    import random

    import duckdb
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_data import (
        read_parquet_bytes,
    )
    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_bytes,
    )

    rng = random.Random(8)
    cols = [
        ("seq", "INT64", list(range(0, 30000, 3))),
        ("jitter", "INT32", [rng.randrange(-1000, 1000)
                             for _ in range(10000)]),
        ("opt", "INT64", [None if i % 7 == 0 else i * i
                          for i in range(10000)]),
        ("f", "FLOAT", [float(i % 977) * 0.5 for i in range(10000)]),
        ("d", "DOUBLE", [i * 0.125 for i in range(10000)]),
    ]
    enc = {"seq": "delta", "jitter": "delta", "opt": "delta",
           "f": "byte_stream_split", "d": "byte_stream_split"}
    buf = write_parquet_bytes(cols, codec="zstd", column_encodings=enc,
                              row_group_rows=3000)
    t = pq.read_table(io.BytesIO(buf))
    for n, p, v in cols:
        got = t.column(n).to_pylist()
        if p == "FLOAT":
            assert all(abs(a - b) < 1e-4 for a, b in zip(got, v))
        else:
            assert got == v, n
    names, own = read_parquet_bytes(buf)
    assert own["seq"] == cols[0][2]
    assert own["opt"] == cols[2][2]
    path = str(tmp_path / "dbp.parquet")
    open(path, "wb").write(buf)
    r = duckdb.sql(f"SELECT count(*), sum(seq) "
                   f"FROM read_parquet('{path}')").fetchall()
    assert r[0] == (10000, sum(cols[0][2]))
    # encoding id 5 / 9 actually landed in the footer
    meta = pq.ParquetFile(io.BytesIO(buf)).metadata.row_group(0)
    assert "DELTA_BINARY_PACKED" in str(meta.column(0).encodings)
    assert "BYTE_STREAM_SPLIT" in str(meta.column(3).encodings)


def test_delta_encoding_edge_shapes():
    """Single value, exact block multiples, all-equal runs, negatives."""
    import io

    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_bytes,
    )

    shapes = [
        [42],
        list(range(128 + 1)),
        list(range(0, 128 * 4 * 2, 2)),
        [7] * 500,
        [(-1) ** i * i * 1000 for i in range(300)],
    ]
    for vals in shapes:
        buf = write_parquet_bytes(
            [("v", "INT64", vals)], codec="none",
            column_encodings={"v": "delta"})
        assert pq.read_table(io.BytesIO(buf)).column(
            "v").to_pylist() == vals


def test_nested_struct_write(tmp_path):
    """One-level optional-struct writer (write_parquet_nested_bytes —
    the Delta-checkpoint shape): group-null vs leaf-null definition
    levels, read back by pyarrow AND DuckDB (struct reads are the
    own-reader's declared seam)."""
    import io

    import duckdb
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_nested_bytes,
    )

    n = 2000
    buf = write_parquet_nested_bytes([
        ("version", "INT64", list(range(n))),
        ("add", [
            ("path", "BYTE_ARRAY",
             [f"part-{i}.parquet" if i % 3 else None for i in range(n)]),
            ("size", "INT64", [i * 100 if i % 3 else None
                               for i in range(n)]),
            ("dataChange", "BOOLEAN", [bool(i % 2) if i % 3 else None
                                       for i in range(n)]),
        ]),
        ("remove", [
            ("path", "BYTE_ARRAY",
             [f"old-{i}.parquet" if i % 3 == 0 and i % 6 else None
              for i in range(n)]),
            ("deletionTimestamp", "INT64",
             [i if i % 3 == 0 and i % 6 else None for i in range(n)]),
        ]),
    ], codec="zstd")
    t = pq.read_table(io.BytesIO(buf))
    assert t.column("version").to_pylist() == list(range(n))
    adds = t.column("add").to_pylist()
    assert adds[0] is None
    assert adds[1] == {"path": "part-1.parquet", "size": 100,
                       "dataChange": True}
    rems = t.column("remove").to_pylist()
    assert rems[3] == {"path": "old-3.parquet", "deletionTimestamp": 3}
    assert rems[1] is None and rems[6] is None
    path = str(tmp_path / "nested.parquet")
    open(path, "wb").write(buf)
    r = duckdb.sql(
        f"SELECT count(*), count(add.path), count(remove.path), "
        f"sum(add.size) FROM read_parquet('{path}')").fetchall()
    assert r[0][:3] == (n, 1333, 333)


def test_delta_checkpoint_rides_own_writer(spark, tmp_path):
    """The Delta checkpoint parquet is now serialized by the
    from-scratch nested writer; pyarrow (the replay path's reader)
    and the created_by stamp prove it."""
    import glob

    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.delta import DeltaTable

    dt = DeltaTable(str(tmp_path / "t"))
    dt.write(spark.range(5).selectExpr("id", "concat('v', id) as v"),
             mode="overwrite")
    dt.write(spark.range(5, 9).selectExpr("id", "concat('v', id) as v"),
             mode="append")
    dt.checkpoint()
    [ck] = glob.glob(str(tmp_path / "t/_delta_log/*.checkpoint.parquet"))
    meta = pq.ParquetFile(ck).metadata
    assert b"pr2-transformation-spark" in meta.created_by.encode() \
        or "pr2-transformation-spark" in meta.created_by
    adds = pq.read_table(ck).column("add").to_pylist()
    assert sum(1 for a in adds if a is not None) >= 2


def test_list_column_write_four_readers(tmp_path):
    """3-level Dremel LIST write (round-8): null list, empty list,
    null elements, single element — byte-validated by pyarrow, DuckDB,
    the repo's own reader, and (in test_spark_reads_lists) Spark."""
    import duckdb
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_data import (
        read_parquet_bytes,
    )
    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_nested_bytes,
    )

    tags = [["a", "b"], None, [], ["x", None, "z"], ["only"]]
    nums = [[1, 2, 3], [], None, [-7], [0, None]]
    for codec in ("none", "snappy", "zstd"):
        buf = write_parquet_nested_bytes([
            ("id", "INT64", [1, 2, 3, 4, 5]),
            ("tags", "LIST<BYTE_ARRAY>", tags),
            ("nums", "LIST<INT64>", nums),
        ], codec=codec)
        p = tmp_path / f"l_{codec}.parquet"
        p.write_bytes(buf)
        t = pq.read_table(str(p)).to_pydict()
        assert t["tags"] == tags and t["nums"] == nums
        got = duckdb.sql(
            f"SELECT tags, nums FROM '{p}' ORDER BY id").fetchall()
        assert [g[0] for g in got] == tags
        assert [g[1] for g in got] == nums
        names, cols = read_parquet_bytes(buf)
        assert cols["nums"] == nums
        norm = [None if r is None
                else [v.decode() if isinstance(v, bytes) else v for v in r]
                for r in cols["tags"]]
        assert norm == tags


def test_list_column_edge_shapes(tmp_path):
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_nested_bytes,
    )

    # all-null, all-empty, and a long ragged column
    rows = [None] * 3 + [[]] * 3 + [[float(i)] * (i % 5) or None
                                    for i in range(20)]
    buf = write_parquet_nested_bytes(
        [("v", "LIST<DOUBLE>", rows)], codec="gzip")
    p = tmp_path / "edge.parquet"
    p.write_bytes(buf)
    assert pq.read_table(str(p)).to_pydict()["v"] == rows
    # unknown element type seams loudly
    with pytest.raises(NotImplementedError, match="list element"):
        write_parquet_nested_bytes([("v", "LIST<INT96>", [[1]])])


def test_spark_reads_lists(spark, tmp_path):
    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_nested_bytes,
    )

    nums = [[1, 2, 3], [], None, [-7], [0, None]]
    (tmp_path / "t.parquet").write_bytes(write_parquet_nested_bytes([
        ("id", "INT64", [1, 2, 3, 4, 5]),
        ("nums", "LIST<INT64>", nums),
    ], codec="zstd"))
    got = spark.read.parquet(str(tmp_path)).orderBy("id").collect()
    assert [r["nums"] for r in got] == nums
    assert spark.read.parquet(str(tmp_path)).schema["nums"] \
        .dataType.simpleString() == "array<bigint>"


def test_two_level_nested_struct_write(tmp_path):
    """Round-8: optional groups nest to any depth — the Delta
    checkpoint's add.deletionVector shape — validated by pyarrow AND
    DuckDB."""
    import io

    import duckdb
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_nested_bytes)

    buf = write_parquet_nested_bytes([
        ("version", "INT64", [1, 2, 3, 4, 5, 6]),
        ("add", [
            ("path", "BYTE_ARRAY", ["a", None, "c", None, "e", "f"]),
            ("size", "INT64", [10, None, 30, None, None, 60]),
            ("dv", [
                ("storageType", "BYTE_ARRAY",
                 ["u", None, None, None, "i", None]),
                ("card", "INT64", [5, None, None, None, None, None]),
            ]),
        ]),
    ], codec="snappy")
    got = pq.read_table(io.BytesIO(buf)).to_pylist()
    assert got[0]["add"]["dv"] == {"storageType": "u", "card": 5}
    assert got[1]["add"] is None          # whole group null
    assert got[2]["add"]["dv"] is None    # subgroup null, parent present
    assert got[4]["add"] == {"path": "e", "size": None,
                             "dv": {"storageType": "i", "card": None}}
    fn = str(tmp_path / "n2.parquet")
    open(fn, "wb").write(buf)
    r = duckdb.sql(
        f"SELECT count(*), count(add.dv.storageType), count(add.path) "
        f"FROM read_parquet('{fn}')").fetchone()
    assert r == (6, 2, 4)


def test_data_page_v2_write_three_readers(tmp_path):
    """Round-8 page-format symmetry: DATA_PAGE_V2 (levels outside the
    compressed region, byte lengths in the header) across codecs and
    both dictionary modes, validated by pyarrow, DuckDB and the repo's
    own v2-aware reader; composes with page_rows and multi row groups."""
    import io
    import random

    import duckdb
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_data import (
        read_parquet_bytes)

    random.seed(4)
    n = 8000
    cols = [
        ("id", "INT64", list(range(n))),
        ("v", "DOUBLE", [random.random() if i % 9 else None
                         for i in range(n)]),
        ("nm", "BYTE_ARRAY", [f"s{i % 31}" if i % 5 else None
                              for i in range(n)]),
        ("b", "BOOLEAN", [bool(i % 3) if i % 7 else None
                          for i in range(n)]),
    ]
    for codec in ("none", "snappy", "zstd", "gzip"):
        for dic in (True, False):
            buf = write_parquet_bytes(
                cols, codec=codec, use_dictionary=dic,
                data_page_version=2, row_group_rows=3000, page_rows=700)
            t = pq.read_table(io.BytesIO(buf))
            for name, _pt, vals in cols:
                assert t.column(name).to_pylist() == vals, (codec, dic)
            _, got = read_parquet_bytes(buf)
            assert got["id"] == cols[0][2]
            assert got["nm"] == [None if s is None else s.encode()
                                 for s in cols[2][2]]
    fn = str(tmp_path / "v2.parquet")
    open(fn, "wb").write(write_parquet_bytes(
        cols[:2], codec="zstd", data_page_version=2))
    assert duckdb.sql(
        f"SELECT count(*), min(id), max(id) FROM read_parquet('{fn}')"
    ).fetchone() == (n, 0, n - 1)
    with pytest.raises(NotImplementedError, match="flat-column"):
        from pr2_transformation_spark.sources.parquet_write import (
            _write_chunk)
        _write_chunk(bytearray(), "x", "INT64", [1], "none", False,
                     pre_levels=([1], 1), page_version=2)


def test_delta_byte_array_write_three_readers(tmp_path):
    """DELTA_BYTE_ARRAY / DELTA_LENGTH_BYTE_ARRAY writer output decodes
    identically under pyarrow, DuckDB, and the repo's own reader —
    nulls, shared prefixes, empty strings, raw bytes, multi-page."""
    import io
    import random
    import string

    import duckdb
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_data import (
        read_parquet_bytes,
    )
    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_bytes,
    )

    rng = random.Random(31)
    vals = []
    for i in range(4000):
        if i % 13 == 0:
            vals.append(None)
        elif i % 29 == 0:
            vals.append("")
        else:
            vals.append("common/prefix/" * (i % 3) + "".join(
                rng.choices(string.ascii_lowercase, k=rng.randint(0, 25))))
    for enc in ("delta_byte_array", "delta_length_byte_array"):
        buf = write_parquet_bytes(
            [("k", "INT64", list(range(4000))),
             ("text", "BYTE_ARRAY", vals)],
            codec="snappy", page_rows=700,
            column_encodings={"k": "delta", "text": enc})
        assert pq.read_table(io.BytesIO(buf)).column(
            "text").to_pylist() == vals, enc
        path = str(tmp_path / f"{enc}.parquet")
        open(path, "wb").write(buf)
        got = [r[0] for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{path}')").fetchall()]
        assert got == vals, enc
        _, own = read_parquet_bytes(buf)
        assert [v.decode() if isinstance(v, bytes) else v
                for v in own["text"]] == vals, enc
        meta = pq.ParquetFile(io.BytesIO(buf)).metadata.row_group(0)
        assert enc.upper() in str(meta.column(1).encodings)


def test_delta_byte_array_reads_pyarrow_files():
    """The from-scratch reader decodes pyarrow-written DELTA string
    pages on BOTH page versions (the dictionary-fallback shape
    parquet-java emits for wide strings)."""
    import io
    import random
    import string

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_data import (
        read_parquet_bytes,
    )

    rng = random.Random(17)
    vals = [None if i % 11 == 0 else
            ("s3://bucket/crawl/" + "".join(
                rng.choices(string.ascii_letters, k=rng.randint(1, 40))))
            for i in range(3000)]
    for enc, version in (("DELTA_BYTE_ARRAY", "2.0"),
                         ("DELTA_BYTE_ARRAY", "1.0"),
                         ("DELTA_LENGTH_BYTE_ARRAY", "2.0"),
                         ("DELTA_LENGTH_BYTE_ARRAY", "1.0")):
        sink = io.BytesIO()
        pq.write_table(
            pa.table({"text": pa.array(vals, pa.string())}), sink,
            use_dictionary=False, data_page_version=version,
            column_encoding={"text": enc}, compression="zstd")
        _, cols = read_parquet_bytes(sink.getvalue())
        got = [v.decode() if isinstance(v, bytes) else v
               for v in cols["text"]]
        assert got == vals, (enc, version)


def test_delta_byte_array_edge_shapes():
    """Single value, all-identical, zero rows of non-null, fully-null
    page, bytes-vs-str inputs."""
    import io

    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_write import (
        delta_byte_array_encode,
        delta_length_byte_array_encode,
        write_parquet_bytes,
    )
    from pr2_transformation_spark.sources.parquet_data import (
        decode_delta_byte_array,
        decode_delta_length_byte_array,
    )

    for vals in ([b"x"], [b"same"] * 40, [b"", b"", b"a"],
                 [b"ab", b"abc", b"abcd", b"b"]):
        enc = delta_byte_array_encode(vals)
        got, _ = decode_delta_byte_array(enc, 0, len(vals))
        assert got == vals
        enc2 = delta_length_byte_array_encode(vals)
        got2, _ = decode_delta_length_byte_array(enc2, 0, len(vals))
        assert got2 == vals
    assert decode_delta_byte_array(delta_byte_array_encode([]), 0, 0)[0] == []
    for shape in ([None, None, None], ["a"], [None, "x", None]):
        buf = write_parquet_bytes(
            [("t", "BYTE_ARRAY", shape)], codec="none",
            column_encodings={"t": "delta_byte_array"})
        assert pq.read_table(io.BytesIO(buf)).column(
            "t").to_pylist() == shape, shape


def test_decimal_write_three_readers_and_read_back(tmp_path):
    """DECIMAL(p,s) both directions: our FLBA big-endian two's
    complement unscaled writes read identically under pyarrow, DuckDB
    and our own reader; pyarrow- and DuckDB-written decimal files
    (FLBA- and INT-backed) read back exactly."""
    import decimal
    import io

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pr2_transformation_spark.sources.parquet_data import (
        read_parquet_bytes,
    )
    from pr2_transformation_spark.sources.parquet_write import (
        write_parquet_bytes,
    )

    D = decimal.Decimal
    vals = [D("12345.67"), None, D("-0.03"), D("9999999999.99"),
            D("0.00"), D("-9999999999.99")]
    buf = write_parquet_bytes(
        [("k", "INT64", list(range(len(vals)))),
         ("price", "DECIMAL(12,2)", vals)],
        codec="zstd", row_group_rows=4)
    t = pq.read_table(io.BytesIO(buf))
    assert t.column("price").to_pylist() == vals
    assert str(t.schema.field("price").type) == "decimal128(12, 2)"
    path = str(tmp_path / "own.parquet")
    open(path, "wb").write(buf)
    got = [r[0] for r in duckdb.sql(
        f"SELECT price FROM read_parquet('{path}')").fetchall()]
    assert got == vals
    _, own = read_parquet_bytes(buf)
    assert own["price"] == vals

    # foreign writers -> our reader: pyarrow decimal128 (FLBA)
    sink = io.BytesIO()
    pq.write_table(pa.table({
        "p": pa.array(vals, pa.decimal128(12, 2))}), sink)
    _, c = read_parquet_bytes(sink.getvalue())
    assert c["p"] == vals
    # DuckDB (INT32/INT64-backed for small precisions)
    dpath = str(tmp_path / "dd.parquet")
    duckdb.sql(f"COPY (SELECT CAST(v AS DECIMAL(9,3)) AS p FROM (VALUES "
               f"(1.125),(NULL),(-42.5)) t(v)) TO '{dpath}' "
               f"(FORMAT PARQUET)")
    _, c2 = read_parquet_bytes(open(dpath, "rb").read())
    assert c2["p"] == [D("1.125"), None, D("-42.500")]

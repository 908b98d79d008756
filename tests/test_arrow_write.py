"""From-scratch Arrow IPC writer (sources/arrow_write.py): engine-built
flatbuffers and bodies must be read by pyarrow (the C++ reference) and
the repo's own reader, plain and zstd-compressed."""

from __future__ import annotations

import datetime
import io

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from pr2_transformation_spark.sources.arrow_ipc import read_arrow_bytes
from pr2_transformation_spark.sources.arrow_write import (
    write_arrow_bytes,
    write_arrow_distributed,
)


def _cols(n=5000):
    return [
        ("id", "int64", list(range(n))),
        ("i32", "int32", [i % 1000 - 500 for i in range(n)]),
        ("s", "utf8", [f"val-{i % 77}" for i in range(n)]),
        ("b", "binary", [bytes([i % 256, 1, 2]) for i in range(n)]),
        ("f", "float32", [float(i % 50) for i in range(n)]),
        ("d", "float64", [i * 0.25 for i in range(n)]),
        ("flag", "bool", [i % 3 == 0 for i in range(n)]),
        ("opt", "int64", [None if i % 5 == 0 else i for i in range(n)]),
        ("opt_s", "utf8", [None if i % 11 == 0 else f"o{i}"
                           for i in range(n)]),
        ("dt", "date32", [datetime.date(2020, 1, 1)
                          + datetime.timedelta(days=i % 900)
                          for i in range(n)]),
    ]


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_pyarrow_and_own_reader(comp):
    cols = _cols()
    buf = write_arrow_bytes(cols, batch_rows=1300, compression=comp)
    names, data = read_arrow_bytes(buf)
    t = ipc.open_file(io.BytesIO(buf)).read_all()
    assert t.num_rows == 5000
    for n, k, v in cols:
        assert data[n] == v, (comp, "own", n)
        assert t.column(n).to_pylist() == v, (comp, "pyarrow", n)
    # schema round-trips typed
    assert t.schema.field("dt").type == pa.date32()
    assert t.schema.field("f").type == pa.float32()


def test_deterministic_and_empty_and_single():
    cols = _cols(200)
    assert write_arrow_bytes(cols) == write_arrow_bytes(cols)
    e = write_arrow_bytes([("a", "int64", []), ("s", "utf8", [])])
    assert ipc.open_file(io.BytesIO(e)).read_all().num_rows == 0
    assert read_arrow_bytes(e)[1] == {"a": [], "s": []}
    one = write_arrow_bytes([("a", "int64", [9])])
    assert ipc.open_file(io.BytesIO(one)).read_all().column(
        "a").to_pylist() == [9]


def test_all_null_column():
    buf = write_arrow_bytes([("a", "int64", [None] * 64),
                             ("s", "utf8", ["x"] * 64)])
    t = ipc.open_file(io.BytesIO(buf)).read_all()
    assert t.column("a").null_count == 64
    assert read_arrow_bytes(buf)[1]["a"] == [None] * 64


def test_multibatch_blocks():
    buf = write_arrow_bytes([("a", "int64", list(range(10_000)))],
                            batch_rows=1000)
    f = ipc.open_file(io.BytesIO(buf))
    assert f.num_record_batches == 10
    assert f.read_all().column("a").to_pylist() == list(range(10_000))


def test_unsupported_kind_raises():
    with pytest.raises(NotImplementedError, match="seam"):
        write_arrow_bytes([("a", "decimal", [1])])
    with pytest.raises(NotImplementedError, match="compression"):
        write_arrow_bytes([("a", "int64", [1])], compression="brotli")


def test_distributed_sink_pyarrow_reads_back(spark, tmp_path):
    import glob

    src = spark.range(12000).selectExpr(
        "id", "concat('t-', id % 19) as t",
        "case when id % 6 = 0 then null else cast(id * 0.5 as double) end "
        "as sc")
    n = write_arrow_distributed(
        src.repartition(3), str(tmp_path / "dist"), compression="zstd")
    assert n == 3
    total = 0
    for p in glob.glob(str(tmp_path / "dist") + "/*.arrow"):
        t = ipc.open_file(p).read_all()
        total += t.num_rows
    assert total == 12000


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_stream_format_both_directions(comp):
    """Arrow IPC STREAM format: engine-written streams open via
    pyarrow's open_stream; pyarrow-written streams decode via the
    from-scratch stream reader."""
    from pr2_transformation_spark.sources.arrow_ipc import (
        read_arrow_stream_bytes,
    )
    from pr2_transformation_spark.sources.arrow_write import (
        write_arrow_stream_bytes,
    )

    cols = [("id", "int64", list(range(3000))),
            ("s", "utf8", [f"x{i % 9}" for i in range(3000)]),
            ("opt", "float64", [None if i % 4 == 0 else i * 0.5
                                for i in range(3000)])]
    buf = write_arrow_stream_bytes(cols, batch_rows=700, compression=comp)
    t = ipc.open_stream(io.BytesIO(buf)).read_all()
    assert t.num_rows == 3000
    assert t.column("id").to_pylist() == cols[0][2]
    names, data = read_arrow_stream_bytes(buf)
    assert data["opt"] == cols[2][2]
    bio = io.BytesIO()
    w = ipc.new_stream(
        bio, t.schema,
        options=ipc.IpcWriteOptions(compression="zstd" if comp else None))
    for b in t.to_batches(max_chunksize=900):
        w.write_batch(b)
    w.close()
    n2, d2 = read_arrow_stream_bytes(bio.getvalue())
    assert d2["id"] == cols[0][2]


def test_list_write_pyarrow_and_own_reader(tmp_path):
    """Round-8 writer lists: List<primitive> and List<List<T>> with
    null lists, empty lists, and null elements — pyarrow (the C++
    reference) and the repo's own reader agree, plain and zstd, file
    and stream."""
    import io

    from pr2_transformation_spark.sources.arrow_ipc import (
        read_arrow_bytes,
        read_arrow_stream_bytes,
    )
    from pr2_transformation_spark.sources.arrow_write import (
        write_arrow_bytes,
        write_arrow_stream_bytes,
    )

    cols = [
        ("id", "int64", [1, 2, 3, 4, 5]),
        ("nums", "list<int64>", [[1, 2, 3], [], None, [-7], [0, None]]),
        ("tags", "list<utf8>", [["a", "b"], None, [], ["x", None, "z"],
                                ["only"]]),
        ("ll", "list<list<float64>>", [[[1.5], [2.5, 3.5]], None, [[]],
                                       [], [[None, 4.0]]]),
    ]
    for comp in (None, "zstd"):
        buf = write_arrow_bytes(cols, compression=comp)
        t = pa.ipc.open_file(io.BytesIO(buf)).read_all()
        for n, _, vals in cols:
            assert t.column(n).to_pylist() == vals, (comp, n)
        _, back = read_arrow_bytes(buf)
        for n, _, vals in cols:
            assert back[n] == vals, (comp, "own", n)
        sbuf = write_arrow_stream_bytes(cols, compression=comp)
        ts = pa.ipc.open_stream(io.BytesIO(sbuf)).read_all()
        assert ts.column("ll").to_pylist() == cols[3][2]
        _, back2 = read_arrow_stream_bytes(sbuf)
        assert back2["nums"] == cols[1][2]
    with pytest.raises(NotImplementedError, match="outside"):
        write_arrow_bytes([("x", "list<uuid>", [[1]])])


def test_distributed_writer_array_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    from pr2_transformation_spark.sources.arrow_write import (
        write_arrow_distributed,
    )

    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
        .otherwise(F.array(F.col("id"), F.col("id") * 2)).alias("pair"),
        F.split(F.concat(F.lit("a,b,"), F.col("id").cast("string")), ",")
        .alias("toks"),
    ).repartition(3)
    n = write_arrow_distributed(df, str(tmp_path / "out"))
    assert n == 3
    import glob

    tables = [pa.ipc.open_file(p).read_all()
              for p in glob.glob(str(tmp_path / "out" / "*.arrow"))]
    t = pa.concat_tables(tables)
    got = sorted(zip(t.column("id").to_pylist(),
                     t.column("pair").to_pylist(),
                     t.column("toks").to_pylist()))
    assert len(got) == 100
    for i, pair, toks in got:
        assert pair == (None if i % 7 == 0 else [i, i * 2])
        assert toks == ["a", "b", str(i)]


def test_lz4_frame_body_compression_three_readers():
    """Round-8 LZ4 encoder symmetry: Arrow bodies can ride the
    from-scratch lz4_frame_compress; pyarrow (liblz4) and the repo's
    own reader both decode file AND stream formats."""
    import io

    import pyarrow.ipc as ipc

    from pr2_transformation_spark.sources.arrow_ipc import (
        read_arrow_bytes, read_arrow_stream_bytes)
    from pr2_transformation_spark.sources.arrow_write import (
        write_arrow_bytes, write_arrow_stream_bytes)

    cols = [("k", "int64", list(range(5000))),
            ("s", "utf8", [f"row_{i % 50}" if i % 7 else None
                           for i in range(5000)]),
            ("v", "float64", [i * 0.5 for i in range(5000)])]
    data = write_arrow_bytes(cols, compression="lz4")
    t = ipc.open_file(io.BytesIO(data)).read_all()
    for name, _k, vals in cols:
        assert t.column(name).to_pylist() == vals
    _, got = read_arrow_bytes(data)
    assert got["s"] == cols[1][2]
    s = write_arrow_stream_bytes(cols, compression="lz4")
    assert ipc.open_stream(io.BytesIO(s)).read_all().num_rows == 5000
    _, got2 = read_arrow_stream_bytes(s)
    assert got2["k"] == cols[0][2]

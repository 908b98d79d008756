"""From-scratch Arrow IPC reader (sources/arrow_ipc.py) vs pyarrow, the
C++ reference implementation: flatbuffer metadata (vtables, unions,
struct vectors), validity bitmaps, offset columns, body compression."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from pr2_transformation_spark.sources.arrow_ipc import (
    arrow_metadata,
    read_arrow,
    read_arrow_bytes,
    read_arrow_distributed,
)


def _table(n=5000):
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "i32": pa.array([i % 1000 for i in range(n)], pa.int32()),
        "i16": pa.array([i % 300 - 150 for i in range(n)], pa.int16()),
        "u8": pa.array([i % 250 for i in range(n)], pa.uint8()),
        "s": pa.array([f"val-{i % 77}" for i in range(n)]),
        "b": pa.array([bytes([i % 256, 1, 2]) for i in range(n)],
                      pa.binary()),
        "f": pa.array([i * 0.5 for i in range(n)], pa.float32()),
        "d": pa.array([i * 0.25 for i in range(n)], pa.float64()),
        "flag": pa.array([i % 3 == 0 for i in range(n)]),
        "opt": pa.array([None if i % 5 == 0 else i for i in range(n)],
                        pa.int64()),
        "opt_s": pa.array([None if i % 11 == 0 else f"o{i}"
                           for i in range(n)], pa.string()),
        "dt": pa.array([datetime.date(2020, 1, 1)
                        + datetime.timedelta(days=i % 900)
                        for i in range(n)]),
        "ts": pa.array([datetime.datetime(2023, 1, 1)
                        + datetime.timedelta(seconds=i) for i in range(n)],
                       pa.timestamp("us")),
    })


def _write(t, path, codec=None, chunk=1300):
    with open(path, "wb") as f:
        w = ipc.new_file(f, t.schema,
                         options=ipc.IpcWriteOptions(compression=codec))
        for batch in t.to_batches(max_chunksize=chunk):
            w.write_batch(batch)
        w.close()


@pytest.mark.parametrize("codec", [None, "lz4", "zstd"])
def test_all_types_multibatch(tmp_path, codec):
    t = _table()
    path = str(tmp_path / "a.arrow")
    _write(t, path, codec)
    names, cols = read_arrow(path)
    assert names == t.column_names
    for n in names:
        assert cols[n] == t.column(n).to_pylist(), (codec, n)
    assert arrow_metadata(path)["num_batches"] == 4


def test_empty_and_single_row(tmp_path):
    for n in (0, 1):
        t = _table(1).slice(0, n)
        path = str(tmp_path / f"e{n}.arrow")
        _write(t, path)
        names, cols = read_arrow(path)
        assert len(cols["id"]) == n


def test_column_projection(tmp_path):
    t = _table(100)
    path = str(tmp_path / "p.arrow")
    _write(t, path)
    names, cols = read_arrow(path, columns=["s", "opt"])
    assert names == ["s", "opt"]
    assert cols["s"] == t.column("s").to_pylist()


def test_feather_v2_alias(tmp_path):
    """feather.write_feather v2 IS the IPC file format."""
    import pyarrow.feather as feather

    t = _table(300)
    path = str(tmp_path / "f.feather")
    feather.write_feather(t, path, compression="zstd")
    names, cols = read_arrow(path)
    assert cols["id"] == list(range(300))


def test_metadata_only(tmp_path):
    t = _table(10)
    path = str(tmp_path / "m.arrow")
    _write(t, path)
    meta = arrow_metadata(path)
    assert ("id", "int64") in meta["schema"]
    assert ("f", "float32") in meta["schema"]
    assert ("dt", "date32") in meta["schema"]
    assert ("ts", "timestampus") in meta["schema"]


def test_list_columns(tmp_path):
    """List<primitive> vectors: offsets buffer + depth-first child
    node, nullable lists, dictionary columns alongside."""
    t = pa.table({
        "l": pa.array([[i, i + 1] if i % 3 else None
                       for i in range(3000)], pa.list_(pa.int64())),
        "ls": pa.array([[f"s{i % 4}"] * (i % 3) for i in range(3000)],
                       pa.list_(pa.string())),
        "cat": pa.array([f"c{i % 6}"
                         for i in range(3000)]).dictionary_encode(),
    })
    path = str(tmp_path / "l.arrow")
    _write(t, path, codec="zstd", chunk=700)
    names, cols = read_arrow(path)
    for n in t.column_names:
        assert cols[n] == t.column(n).to_pylist(), n


def test_unsupported_seams(tmp_path):
    # list-of-list became supported in round 8; MAP stays a loud seam
    t = pa.table({"m": pa.array([[("k", 1)], [("j", 2)]],
                                pa.map_(pa.utf8(), pa.int64()))})
    path = str(tmp_path / "n.arrow")
    _write(t, path)
    with pytest.raises(NotImplementedError, match="map"):
        read_arrow(path)


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        read_arrow_bytes(b"NOTARROWDATA" * 4)


def test_distributed_reader(spark, tmp_path):
    t = pa.table({
        "id": pa.array(range(8000), pa.int64()),
        "tag": pa.array([f"t{i % 13}" for i in range(8000)]),
        "score": pa.array([None if i % 4 == 0 else i * 0.5
                           for i in range(8000)], pa.float64()),
    })
    d = tmp_path / "dist"
    d.mkdir()
    for part in range(4):
        _write(t.slice(part * 2000, 2000), str(d / f"p{part}.arrow"),
               codec="lz4")
    out = read_arrow_distributed(
        spark, str(d), "id long, tag string, score double")
    rows = out.collect()
    assert len(rows) == 8000
    assert sorted(r["id"] for r in rows) == list(range(8000))
    assert sum(1 for r in rows if r["score"] is None) == 2000


@pytest.mark.parametrize("codec", [None, "zstd"])
def test_dictionary_encoded_columns(tmp_path, codec):
    """DictionaryBatch messages (file footer block index AND inline
    stream messages): indices mapped through the id-keyed value arrays,
    nullable included."""
    import io

    from pr2_transformation_spark.sources.arrow_ipc import (
        read_arrow_bytes,
        read_arrow_stream_bytes,
    )

    t = pa.table({
        "id": pa.array(range(4000), pa.int64()),
        "cat": pa.array([f"cat-{i % 12}"
                         for i in range(4000)]).dictionary_encode(),
        "opt_cat": pa.array([None if i % 9 == 0 else f"o{i % 5}"
                             for i in range(4000)],
                            pa.string()).dictionary_encode(),
    })
    bio = io.BytesIO()
    w = ipc.new_file(bio, t.schema,
                     options=ipc.IpcWriteOptions(compression=codec))
    for b in t.to_batches(max_chunksize=900):
        w.write_batch(b)
    w.close()
    names, cols = read_arrow_bytes(bio.getvalue())
    assert cols["cat"] == t.column("cat").to_pylist()
    assert cols["opt_cat"] == t.column("opt_cat").to_pylist()
    sio = io.BytesIO()
    w = ipc.new_stream(sio, t.schema,
                       options=ipc.IpcWriteOptions(compression=codec))
    for b in t.to_batches(max_chunksize=500):
        w.write_batch(b)
    w.close()
    _, scols = read_arrow_stream_bytes(sio.getvalue())
    assert scols["cat"] == t.column("cat").to_pylist()


def test_nested_struct_and_list_of_list(tmp_path):
    """Round-8 nested vectors: Struct, List<List<T>>, List<Struct>,
    Struct-with-list — pyarrow-written fixtures read back hash-exact in
    BOTH file and stream formats."""
    import io

    from pr2_transformation_spark.sources.arrow_ipc import (
        read_arrow_stream_bytes,
    )

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "ll": pa.array([[[1, 2], [3]], None, [], [None, [4, None]]],
                       pa.list_(pa.list_(pa.int64()))),
        "st": pa.array(
            [{"a": 1, "b": "x"}, None, {"a": None, "b": "y"},
             {"a": 4, "b": None}],
            pa.struct([("a", pa.int64()), ("b", pa.utf8())])),
        "ls": pa.array([[{"a": 1}], [], None, [{"a": None}, {"a": 9}]],
                       pa.list_(pa.struct([("a", pa.int64())]))),
        "sl": pa.array(
            [{"v": [1.5, 2.5]}, {"v": None}, None, {"v": []}],
            pa.struct([("v", pa.list_(pa.float64()))])),
    })
    path = str(tmp_path / "nested.arrow")
    _write(t, path)
    names, cols = read_arrow_bytes(open(path, "rb").read())
    for n in t.column_names:
        assert cols[n] == t.column(n).to_pylist(), n
    sink = io.BytesIO()
    w = pa.ipc.new_stream(sink, t.schema)
    w.write_table(t)
    w.close()
    _, scols = read_arrow_stream_bytes(sink.getvalue())
    for n in t.column_names:
        assert scols[n] == t.column(n).to_pylist(), ("stream", n)

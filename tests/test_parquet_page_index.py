"""Parquet PageIndex (ColumnIndex + OffsetIndex): written by the
from-scratch writer (`sources/parquet_write.py`), parsed and used for
page-level pruning by the from-scratch reader (`sources/parquet_data.
read_parquet_bytes_page_filtered`), cross-pinned BOTH directions
against pyarrow (parquet-cpp writes the same structures with
write_page_index=True)."""

from __future__ import annotations

import io
import random

import pytest

from pr2_transformation_spark.sources.parquet_data import (
    read_parquet_bytes,
    read_parquet_bytes_page_filtered,
)
from pr2_transformation_spark.sources.parquet_meta import (
    prune_pages,
    read_footer_bytes,
    read_page_index_bytes,
)
from pr2_transformation_spark.sources.parquet_write import write_parquet_bytes


def _mk(n=10000, seed=7):
    rnd = random.Random(seed)
    ids = list(range(n))
    vals = [rnd.random() for _ in range(n)]
    names = [f"name_{i % 97}" if i % 11 else None for i in range(n)]
    return ids, vals, names


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd"])
def test_own_index_prunes_and_matches_full_read(codec):
    ids, vals, names = _mk()
    buf = write_parquet_bytes(
        [("id", "INT64", ids), ("v", "DOUBLE", vals),
         ("nm", "BYTE_ARRAY", names)],
        codec=codec, page_rows=500, page_index=True)
    # full read unchanged by the added index structures
    _, full = read_parquet_bytes(buf)
    assert full["id"] == ids
    # filtered read: correct rows, and actually pruned
    _, cols, acc = read_parquet_bytes_page_filtered(buf, "id", 2000, 2999)
    assert cols["id"] == list(range(2000, 3000))
    assert cols["v"] == vals[2000:3000]
    assert cols["nm"] == [None if s is None else s.encode()
                          for s in names[2000:3000]]
    assert acc["pages_total"] == 60  # 20 pages x 3 columns
    assert acc["pages_read"] == 6   # 2 surviving pages x 3 columns


def test_pyarrow_reads_page_indexed_file_and_duckdb_agrees(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    ids, vals, names = _mk(4000)
    buf = write_parquet_bytes(
        [("id", "INT64", ids), ("v", "DOUBLE", vals),
         ("nm", "BYTE_ARRAY", names)],
        codec="zstd", row_group_rows=1000, page_rows=250, page_index=True)
    t = pq.read_table(io.BytesIO(buf))
    assert t.column("id").to_pylist() == ids
    assert t.column("nm").to_pylist() == names
    fn = str(tmp_path / "pi.parquet")
    open(fn, "wb").write(buf)
    r = duckdb.sql(f"SELECT count(*), sum(id) FROM read_parquet('{fn}')"
                   ).fetchone()
    assert r == (4000, sum(ids))


def test_reader_consumes_pyarrow_written_index():
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, vals, names = _mk()
    sink = io.BytesIO()
    pq.write_table(
        pa.table({"id": ids, "v": vals, "nm": names}), sink,
        data_page_size=2000, write_page_index=True,
        compression="snappy", row_group_size=5000)
    buf = sink.getvalue()
    footer = read_footer_bytes(buf)
    index = read_page_index_bytes(buf, footer)
    ci = index[0][0]["column_index"]
    assert ci["boundary_order"] == 1  # parquet-cpp marks id ASCENDING
    assert ci["min"][0] == 0 and not ci["null_pages"][0]
    assert len(index[0][0]["offset_index"]) == len(ci["min"])
    _, cols, acc = read_parquet_bytes_page_filtered(buf, "id", 7100, 7200)
    assert cols["id"] == list(range(7100, 7201))
    assert cols["v"] == vals[7100:7201]
    assert 0 < acc["pages_read"] < acc["pages_total"]


def test_boundary_orders_null_pages_and_multi_row_group():
    import pyarrow.parquet as pq

    n = 2000
    ids, _, _ = _mk(n)
    desc = list(range(n - 1, -1, -1))
    half_null = [None] * 500 + ids[:1500]
    buf = write_parquet_bytes(
        [("a", "INT64", ids), ("d", "INT64", desc),
         ("hn", "INT64", half_null)],
        codec="snappy", row_group_rows=1000, page_rows=250,
        page_index=True)
    assert pq.read_table(io.BytesIO(buf)).column("hn").to_pylist() == half_null
    footer = read_footer_bytes(buf)
    index = read_page_index_bytes(buf, footer)
    assert index[0][0]["column_index"]["boundary_order"] == 1  # ascending
    assert index[0][1]["column_index"]["boundary_order"] == 2  # descending
    ci_hn = index[0][2]["column_index"]
    assert ci_hn["null_pages"][:2] == [True, True]
    assert ci_hn["min"][0] is None and ci_hn["null_counts"][0] == 250
    # all-null pages are excluded from a range predicate
    verdicts = prune_pages(ci_hn, index[0][2]["offset_index"], 1000, 0, 10**9)
    assert [v["selected"] for v in verdicts] == [False, False, True, True]
    _, cols, _ = read_parquet_bytes_page_filtered(buf, "hn", 100, 199)
    assert cols["hn"] == list(range(100, 200))
    assert cols["d"] == desc[600:700]


def test_unordered_boundary_and_dictionary_pages_shared():
    rnd = random.Random(3)
    vals = [rnd.randrange(50) for _ in range(3000)]  # dictionary-friendly
    buf = write_parquet_bytes(
        [("u", "INT64", vals)], codec="none", page_rows=300,
        page_index=True, use_dictionary=True)
    footer = read_footer_bytes(buf)
    col = footer["row_groups"][0]["columns"][0]
    assert col["dictionary_page_offset"] is not None  # one dict, 10 pages
    index = read_page_index_bytes(buf, footer)
    assert index[0][0]["column_index"]["boundary_order"] == 0
    _, full = read_parquet_bytes(buf)
    assert full["u"] == vals
    _, cols, acc = read_parquet_bytes_page_filtered(buf, "u", 10, 20)
    assert cols["u"] == [v for v in vals if 10 <= v <= 20]
    assert acc["pages_read"] == acc["pages_total"] == 10  # nothing prunable

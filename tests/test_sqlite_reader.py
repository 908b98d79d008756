"""From-scratch SQLite file reader (sources/sqlite_reader.py) vs the
stdlib sqlite3 module (the C reference library): b-tree walks, varint
records, serial types, overflow chains, page sizes, rowid aliases."""

from __future__ import annotations

import random
import sqlite3

import pytest

from pr2_transformation_spark.sources.sqlite_reader import (
    read_sqlite_bytes,
    read_sqlite_distributed,
    sqlite_tables,
)


def _build(path, page_size=4096, rows=5000, big=False):
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute(
        "CREATE TABLE docs (id INTEGER PRIMARY KEY, name TEXT, "
        "score REAL, flag INTEGER, payload BLOB, note TEXT)")
    rng = random.Random(3)
    data = [(i + 1, f"name-{i % 97}",
             i * 0.5 if i % 5 else None, i % 2,
             bytes(rng.randrange(256)
                   for _ in range(9000 if big else 40))
             if i % 3 == 0 else None,
             "x" * 2000 if (big and i % 50 == 0) else f"note{i}")
            for i in range(rows)]
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?,?)", data)
    con.execute("CREATE INDEX idx_name ON docs(name)")
    con.commit()
    con.close()


@pytest.mark.parametrize("page_size,rows,big", [
    (4096, 5000, False),   # multi-level interior b-tree
    (512, 2000, False),    # minimum page size
    (4096, 800, True),     # overflow-page chains
    (65536, 1000, False),  # the page_size=1 encoding
])
def test_vs_stdlib(tmp_path, page_size, rows, big):
    path = str(tmp_path / "t.db")
    _build(path, page_size, rows, big)
    buf = open(path, "rb").read()
    names, cols = read_sqlite_bytes(buf, "docs")
    assert names == ["id", "name", "score", "flag", "payload", "note"]
    con = sqlite3.connect(path)
    exp = list(con.execute("SELECT * FROM docs ORDER BY id"))
    con.close()
    got = list(zip(*[cols[n] for n in names]))
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert tuple(bytes(x) if isinstance(x, (bytes, bytearray)) else x
                     for x in g) == e


def test_tables_and_indexes_skipped(tmp_path):
    path = str(tmp_path / "t.db")
    _build(path, rows=50)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE empty_t (a TEXT, b INTEGER)")
    con.commit()
    con.close()
    buf = open(path, "rb").read()
    tables = sqlite_tables(buf)
    assert set(tables) == {"docs", "empty_t"}
    assert tables["docs"] == ["id", "name", "score", "flag", "payload",
                              "note"]
    names, cols = read_sqlite_bytes(buf, "empty_t")
    assert cols == {"a": [], "b": []}


def test_alter_table_short_records(tmp_path):
    """Rows inserted before ALTER TABLE ADD COLUMN have short records;
    the new column must read as NULL for them (the reference library's
    behavior)."""
    path = str(tmp_path / "t.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (a INTEGER)")
    con.execute("INSERT INTO t VALUES (1)")
    con.execute("ALTER TABLE t ADD COLUMN b TEXT")
    con.execute("INSERT INTO t VALUES (2, 'x')")
    con.commit()
    con.close()
    names, cols = read_sqlite_bytes(open(path, "rb").read(), "t")
    assert cols["b"] == [None, "x"]


def test_quoted_identifiers_and_constraints(tmp_path):
    path = str(tmp_path / "t.db")
    con = sqlite3.connect(path)
    con.execute('CREATE TABLE q ("weird name" TEXT, [br] INTEGER, '
                "`bt` REAL, PRIMARY KEY (`bt`), "
                "CHECK (br > -1000))")
    con.execute("INSERT INTO q VALUES ('v', 3, 1.5)")
    con.commit()
    con.close()
    names, cols = read_sqlite_bytes(open(path, "rb").read(), "q")
    assert names == ["weird name", "br", "bt"]
    assert cols["weird name"] == ["v"]


@pytest.mark.parametrize("ddl,rows,order", [
    ("CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER, t TEXT) "
     "WITHOUT ROWID",
     [(f"key{i:04d}", i, f"t{i}") for i in range(3000)], "k"),
    ("CREATE TABLE w (a INTEGER, v REAL, b TEXT, PRIMARY KEY (b, a)) "
     "WITHOUT ROWID",
     [(i, i * 0.5, f"g{i % 9}") for i in range(2000)], "b, a"),
])
def test_without_rowid_tables(tmp_path, ddl, rows, order):
    """WITHOUT ROWID: rows live in index b-trees (interior cells carry
    rows), records store PK columns first — 512-byte pages force
    multi-level trees."""
    path = str(tmp_path / "w.db")
    con = sqlite3.connect(path)
    con.execute("PRAGMA page_size=512")
    con.execute(ddl)
    con.executemany(
        f"INSERT INTO w VALUES ({','.join('?' * len(rows[0]))})", rows)
    con.commit()
    names, cols = read_sqlite_bytes(open(path, "rb").read(), "w")
    exp = list(con.execute(f"SELECT * FROM w ORDER BY {order}"))
    con.close()
    assert list(zip(*[cols[n] for n in names])) == exp


def test_missing_table_and_bad_magic(tmp_path):
    path = str(tmp_path / "t.db")
    _build(path, rows=5)
    with pytest.raises(KeyError, match="no table"):
        read_sqlite_bytes(open(path, "rb").read(), "nope")
    with pytest.raises(ValueError, match="magic"):
        read_sqlite_bytes(b"not a database at all" * 10, "t")


def test_distributed_reader(spark, tmp_path):
    d = tmp_path / "dbs"
    d.mkdir()
    for part in range(3):
        con = sqlite3.connect(str(d / f"p{part}.db"))
        con.execute("CREATE TABLE ev (id INTEGER PRIMARY KEY, "
                    "tag TEXT, val REAL)")
        con.executemany(
            "INSERT INTO ev VALUES (?,?,?)",
            [(part * 1000 + i + 1, f"t{i % 7}",
              None if i % 4 == 0 else i * 0.5) for i in range(1000)])
        con.commit()
        con.close()
    out = read_sqlite_distributed(
        spark, str(d), "ev", "id long, tag string, val double")
    rows = out.collect()
    assert len(rows) == 3000
    assert sum(1 for r in rows if r["val"] is None) == 750


def _pin(tmp_path, ddl, inserts, table="t", order="1"):
    """Build a db with sqlite3, read it back with both readers."""
    path = str(tmp_path / "pin.db")
    con = sqlite3.connect(path)
    con.execute(ddl)
    for stmt in inserts:
        con.execute(stmt)
    con.commit()
    exp = list(con.execute(f"SELECT * FROM {table} ORDER BY {order}"))
    con.close()
    buf = open(path, "rb").read()
    names, cols = read_sqlite_bytes(buf, table)
    got = sorted(zip(*[cols[n] for n in names]),
                 key=lambda r: tuple((v is None, v) for v in r))
    exp_sorted = sorted(exp, key=lambda r: tuple((v is None, v) for v in r))
    assert got == exp_sorted
    return names


def test_table_level_integer_pk_is_rowid_alias(tmp_path):
    # ADVICE round 7: 'PRIMARY KEY(a)' on a single INTEGER column is a
    # rowid alias — values come from the rowid, records store NULL
    names = _pin(
        tmp_path,
        "CREATE TABLE t (a INTEGER, b TEXT, PRIMARY KEY(a))",
        ["INSERT INTO t VALUES (1,'x')", "INSERT INTO t VALUES (2,'y')",
         "INSERT INTO t VALUES (3,'z')"])
    assert names == ["a", "b"]


def test_table_level_integer_pk_desc_still_aliases(tmp_path):
    # SQLite quirk: table-level PRIMARY KEY(a DESC) DOES alias rowid
    _pin(tmp_path,
         "CREATE TABLE t (a INTEGER, b TEXT, PRIMARY KEY(a DESC))",
         ["INSERT INTO t VALUES (7,'x')", "INSERT INTO t VALUES (9,'y')"])


def test_inline_integer_pk_desc_is_not_alias(tmp_path):
    # inline 'INTEGER PRIMARY KEY DESC' is NOT a rowid alias: values
    # are stored in the record itself
    _pin(tmp_path,
         "CREATE TABLE t (a INTEGER PRIMARY KEY DESC, b TEXT)",
         ["INSERT INTO t VALUES (5,'x')", "INSERT INTO t VALUES (2,'y')"])


def test_int_pk_is_not_alias(tmp_path):
    # declared type INT (not INTEGER) never aliases the rowid
    _pin(tmp_path,
         "CREATE TABLE t (a INT PRIMARY KEY, b TEXT)",
         ["INSERT INTO t VALUES (4,'x')", "INSERT INTO t VALUES (6,'y')"])


def test_comma_inside_default_literal(tmp_path):
    # ADVICE round 7: comma inside DEFAULT 'a,b' must not split the
    # column definition and misalign later columns
    names = _pin(
        tmp_path,
        "CREATE TABLE t (a INTEGER PRIMARY KEY, "
        "b TEXT DEFAULT 'x,y', c TEXT DEFAULT 'p''q,r', d REAL)",
        ["INSERT INTO t(a,d) VALUES (1, 1.5)",
         "INSERT INTO t VALUES (2, 'bb', 'cc', 2.5)"])
    assert names == ["a", "b", "c", "d"]


def test_comma_inside_quoted_identifier(tmp_path):
    names = _pin(
        tmp_path,
        'CREATE TABLE t (a INTEGER PRIMARY KEY, "weird,name" TEXT, c TEXT)',
        ["INSERT INTO t VALUES (1, 'w', 'c1')"])
    assert names == ["a", "weird,name", "c"]


def test_check_constraint_with_string_comma(tmp_path):
    _pin(tmp_path,
         "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT, "
         "CHECK (b IN ('x,y', 'z')))",
         ["INSERT INTO t VALUES (1, 'x,y')",
          "INSERT INTO t VALUES (2, 'z')"])


# ------------------------------------------------------ WAL mode (r8)

def _wal_fixture(tmp_path, rows1=2000, rows2=2000):
    """WAL-mode db: batch 1 checkpointed into the main file, batch 2 +
    an UPDATE living only in the -wal side file (autocheckpoint off)."""
    path = str(tmp_path / "w.db")
    con = sqlite3.connect(path)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA wal_autocheckpoint=0")
    con.execute(
        "CREATE TABLE t (k INTEGER PRIMARY KEY, pri TEXT, cents INTEGER)")
    con.execute("CREATE INDEX idx_pri ON t(pri)")
    con.executemany("INSERT INTO t VALUES (?,?,?)",
                    [(i, f"p{i % 5}", i * 13) for i in range(rows1)])
    con.commit()
    con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        [(i, f"p{i % 5}", i * 13) for i in range(rows1, rows1 + rows2)])
    con.execute("UPDATE t SET cents = cents + 7 WHERE k % 10 = 0")
    con.commit()
    db_bytes = open(path, "rb").read()
    wal_bytes = open(path + "-wal", "rb").read()
    exp = list(con.execute("SELECT * FROM t ORDER BY k"))
    con.close()
    return path, db_bytes, wal_bytes, exp


def test_wal_overlay_vs_sqlite3(tmp_path):
    from pr2_transformation_spark.sources.sqlite_reader import (
        apply_wal,
        read_sqlite_wal,
    )

    path, db_bytes, wal_bytes, exp = _wal_fixture(tmp_path)
    names, cols = read_sqlite_wal(db_bytes, wal_bytes, "t")
    got = sorted(zip(cols["k"], cols["pri"], cols["cents"]))
    assert got == [tuple(r) for r in exp]
    # the main image alone must lack batch 2 (the WAL really carried it)
    _, main_only = read_sqlite_bytes(db_bytes, "t")
    assert len(main_only["k"]) < len(exp)
    # the reconstructed image is a valid db to the C reference library
    merged = str(tmp_path / "merged.db")
    open(merged, "wb").write(apply_wal(db_bytes, wal_bytes))
    con = sqlite3.connect(merged)
    assert list(con.execute("SELECT * FROM t ORDER BY k")) == exp
    con.close()


def test_wal_torn_tail_and_stale_salts(tmp_path):
    """A frame with a corrupted checksum ends the valid WAL (spec's
    torn-write guard): everything up to the previous commit stays
    visible, later frames are ignored."""
    from pr2_transformation_spark.sources.sqlite_reader import (
        apply_wal,
        read_sqlite_wal,
    )

    path, db_bytes, wal_bytes, exp = _wal_fixture(tmp_path, 500, 500)
    # corrupt the LAST frame's page image: its commit marker dies with
    # its checksum, so the overlay falls back to the previous commit
    page_size = 4096
    frame = 24 + page_size
    torn = bytearray(wal_bytes)
    torn[-10] ^= 0xFF
    out = apply_wal(db_bytes, bytes(torn))
    # still a readable db (earlier commit or main image)
    names, cols = read_sqlite_wal(db_bytes, bytes(torn), "t")
    assert len(cols["k"]) <= len(exp)
    # WAL whose frames carry foreign salts contributes nothing
    stale = bytearray(wal_bytes)
    import struct as _st
    _st.pack_into(">II", stale, 32 + 8, 0xDEAD, 0xBEEF)
    _, cols2 = read_sqlite_wal(db_bytes, bytes(stale), "t")
    _, main_only = read_sqlite_bytes(db_bytes, "t")
    assert cols2["k"] == main_only["k"]
    # header checksum mismatch is loud
    bad = bytearray(wal_bytes)
    bad[24] ^= 0xFF
    with pytest.raises(ValueError, match="header checksum"):
        apply_wal(db_bytes, bytes(bad))


def test_index_point_lookup_vs_sqlite3(tmp_path):
    """lookup_eq: index b-tree descent + rowid point descents — values
    pinned against the C library's own WHERE query."""
    from pr2_transformation_spark.sources.sqlite_reader import (
        apply_wal,
        lookup_eq,
        sqlite_indexes,
    )

    path, db_bytes, wal_bytes, exp = _wal_fixture(tmp_path)
    merged = apply_wal(db_bytes, wal_bytes)
    assert sqlite_indexes(merged)["idx_pri"]["columns"] == ["pri"]
    con = sqlite3.connect(path)
    for val in ("p0", "p3", "p4", "nope"):
        want = list(con.execute(
            "SELECT * FROM t WHERE pri = ? ORDER BY k", (val,)))
        got = sorted(lookup_eq(merged, "t", "pri", val))
        assert got == [tuple(r) for r in want], val
    con.close()
    with pytest.raises(KeyError, match="no index"):
        lookup_eq(merged, "t", "cents", 13)


def test_index_lookup_multilevel_tree(tmp_path):
    """Enough rows that the index b-tree has interior pages; integer
    and duplicate-heavy keys."""
    from pr2_transformation_spark.sources.sqlite_reader import lookup_eq

    path = str(tmp_path / "big.db")
    con = sqlite3.connect(path)
    con.execute("PRAGMA page_size=512")  # force a deep tree
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, grp INTEGER, "
                "body TEXT)")
    con.execute("CREATE INDEX idx_grp ON t(grp)")
    con.executemany("INSERT INTO t VALUES (?,?,?)",
                    [(i, i % 37, f"body-{i}" * 3) for i in range(20000)])
    con.commit()
    exp = list(con.execute("SELECT * FROM t WHERE grp = 11 ORDER BY k"))
    con.close()
    buf = open(path, "rb").read()
    got = sorted(lookup_eq(buf, "t", "grp", 11))
    assert got == [tuple(r) for r in exp]
    assert len(got) > 500


def test_distributed_wal_sidecar(spark, tmp_path):
    from pr2_transformation_spark.sources.sqlite_reader import (
        read_sqlite_distributed,
    )

    path, db_bytes, wal_bytes, exp = _wal_fixture(tmp_path, 800, 800)
    df = read_sqlite_distributed(
        spark, str(tmp_path / "*.db"), "t",
        "k long, pri string, cents long")
    got = sorted((r["k"], r["pri"], r["cents"]) for r in df.collect())
    assert got == [tuple(r) for r in exp]

"""From-scratch ZIP reader (sources/zip_archive.py) vs the stdlib
zipfile module: central directory, local headers, stored + deflate
members through the in-repo inflate, ZIP64, comments, CRC checks."""

from __future__ import annotations

import io
import random
import zipfile

import pytest

from pr2_transformation_spark.sources.zip_archive import (
    read_zip_bytes,
    read_zip_distributed,
    zip_entries,
    zip_extract,
)


def _archive(members, comment=b"", stored=()):
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        for n, c in members.items():
            z.writestr(n, c,
                       compress_type=zipfile.ZIP_STORED if n in stored
                       else zipfile.ZIP_DEFLATED)
        if comment:
            z.comment = comment
    return bio.getvalue()


def test_mixed_methods_and_dirs():
    rng = random.Random(4)
    members = {f"dir/file{i}.txt": (f"content {i} " * (i * 7 + 1)).encode()
               for i in range(40)}
    members["raw.bin"] = bytes(rng.randrange(256) for _ in range(10000))
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        for n, c in members.items():
            z.writestr(n, c,
                       compress_type=zipfile.ZIP_STORED
                       if n.endswith(".bin") else zipfile.ZIP_DEFLATED)
        z.mkdir("emptydir")
    assert dict(read_zip_bytes(bio.getvalue())) == members


def test_zip64_offsets():
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        with z.open("big.txt", "w", force_zip64=True) as f:
            f.write(b"A" * 100000)
        z.writestr("small.txt", "hello")
    got = dict(read_zip_bytes(bio.getvalue()))
    assert got["big.txt"] == b"A" * 100000
    assert got["small.txt"] == b"hello"


def test_comment_and_filter():
    buf = _archive({"a.json": b"{}", "b.txt": b"t"},
                   comment=b"trailing comment " * 100)
    assert dict(read_zip_bytes(
        buf, lambda n: n.endswith(".json"))) == {"a.json": b"{}"}


def test_crc_verified():
    buf = bytearray(_archive({"x.txt": b"payload " * 50}))
    entry = zip_entries(bytes(buf))[0]
    # corrupt one compressed byte
    pos = entry["offset"] + 30 + len("x.txt") + 5
    buf[pos] ^= 0xFF
    with pytest.raises(ValueError):
        zip_extract(bytes(buf), entry)


def test_unsupported_method_raises():
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_BZIP2) as z:
        z.writestr("c.txt", "compressed with bzip2")
    with pytest.raises(NotImplementedError, match="method"):
        read_zip_bytes(bio.getvalue())


def test_not_a_zip():
    with pytest.raises(ValueError, match="end-of-central"):
        read_zip_bytes(b"definitely not a zip file")


def test_distributed_reader(spark, tmp_path):
    for part in range(3):
        members = {f"doc{part}_{i}.txt": f"text {part} {i}".encode()
                   for i in range(50)}
        (tmp_path / f"a{part}.zip").write_bytes(_archive(members))
    out = read_zip_distributed(spark, str(tmp_path), suffix=".txt")
    rows = out.collect()
    assert len(rows) == 150
    sample = next(r for r in rows if r["member"] == "doc1_7.txt")
    assert bytes(sample["payload"]) == b"text 1 7"


def test_comment_containing_eocd_magic():
    # ADVICE round 7: a comment containing PK\x05\x06 must not be
    # mistaken for the EOCD record
    buf = _archive({"a.txt": b"alpha", "b.txt": b"beta"},
                   comment=b"evil " + b"PK\x05\x06" + b" more text here")
    assert dict(read_zip_bytes(buf)) == {"a.txt": b"alpha",
                                         "b.txt": b"beta"}
    # (stdlib zipfile's simpler scan is itself fooled by this comment
    # and raises BadZipFile — the validated backward scan does better)
    with pytest.raises(zipfile.BadZipFile):
        zipfile.ZipFile(io.BytesIO(buf))


def test_comment_with_many_fake_eocds():
    fake = (b"PK\x05\x06" + b"\xff" * 18) * 5
    buf = _archive({"x.bin": b"\x00" * 1000}, comment=fake)
    assert dict(read_zip_bytes(buf)) == {"x.bin": b"\x00" * 1000}


# ---- writer (round-8 plane symmetry) ------------------------------------

def test_zip_writer_stdlib_validates_both_methods(tmp_path):
    import io
    import random
    import zipfile

    from pr2_transformation_spark.sources.zip_archive import (
        read_zip_bytes, zip_write_bytes)

    rnd = random.Random(3)
    members = [(f"docs/d{i}.txt",
                (f"text {i} " * rnd.randrange(1, 100)).encode())
               for i in range(20)]
    members.append(("empty.bin", b""))
    members.append(("bin.bin", bytes(rnd.randrange(256)
                                     for _ in range(5000))))
    for method in ("stored", "deflate"):
        data = zip_write_bytes(members, method=method)
        zf = zipfile.ZipFile(io.BytesIO(data))
        assert zf.testzip() is None  # stdlib CRC + inflate validation
        assert [(i.filename, zf.read(i))
                for i in zf.infolist()] == members
        assert list(read_zip_bytes(data)) == members
        assert zip_write_bytes(members, method=method) == data  # determinism


def test_zip_writer_comment_and_seams():
    import io
    import zipfile

    import pytest

    from pr2_transformation_spark.sources.zip_archive import (
        read_zip_bytes, zip_write_bytes)

    data = zip_write_bytes([("a.txt", b"hello")],
                           comment=b"trailing comment")
    assert zipfile.ZipFile(io.BytesIO(data)).comment == b"trailing comment"
    assert list(read_zip_bytes(data)) == [("a.txt", b"hello")]
    # EOCD-signature bait INSIDE the comment: stdlib zipfile rejects
    # such archives (it only parses the last signature occurrence);
    # the repo's reader scans candidates backward and survives
    bait = zip_write_bytes([("a.txt", b"hello")],
                           comment=b"comment PK\x05\x06 bait")
    assert list(read_zip_bytes(bait)) == [("a.txt", b"hello")]
    with pytest.raises(NotImplementedError, match="method"):
        zip_write_bytes([("a", b"")], method="bzip2")
    with pytest.raises(NotImplementedError, match="ZIP64"):
        zip_write_bytes([(f"f{i}", b"") for i in range(70000)])


def test_zip_writer_distributed_shards(spark, tmp_path):
    import glob
    import zipfile

    from pyspark.sql import functions as F

    from pr2_transformation_spark.sources.zip_archive import (
        read_zip_distributed, write_zip_distributed)

    df = spark.range(200).selectExpr(
        "concat('m/', id, '.txt') as name",
        "cast(concat('payload-', id) as binary) as payload").repartition(4)
    out = str(tmp_path / "shards")
    n = write_zip_distributed(df, out,
                               name_col="name", payload_col="payload")
    assert n == 4
    for fn in glob.glob(out + "/*.zip"):
        assert zipfile.ZipFile(fn).testzip() is None
    back = read_zip_distributed(spark, out + "/*.zip")
    rows = [(r["member"], bytes(r["payload"])) for r in back.collect()]
    assert len(rows) == 200
    assert sorted(rows) == sorted(
        (f"m/{i}.txt", f"payload-{i}".encode()) for i in range(200))

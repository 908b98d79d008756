"""WebDataset tar-shard source tests."""

import tarfile
import io

import pytest

from pr2_transformation_spark.sources import webdataset as w


def test_tar_shard_roundtrip_and_determinism():
    samples = [("001", {"txt": b"hello", "cls": "en"}), ("002", {"txt": b"bye"})]
    blob = w.build_tar_shard(samples)
    assert w.parse_tar_shard(blob) == [
        ("001", "cls", b"en"),
        ("001", "txt", b"hello"),
        ("002", "txt", b"bye"),
    ]
    assert blob == w.build_tar_shard(samples)  # byte-deterministic
    # fixed metadata: reproducible across environments
    with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
        for info in tar:
            assert (info.mtime, info.uid, info.gid) == (0, 0, 0)


def test_tar_shard_rejects_garbage_and_bad_names():
    with pytest.raises(ValueError):
        w.parse_tar_shard(b"definitely not a tar")
    blob = io.BytesIO()
    with tarfile.open(fileobj=blob, mode="w") as tar:
        info = tarfile.TarInfo(name="noext")
        info.size = 1
        tar.addfile(info, io.BytesIO(b"x"))
    with pytest.raises(ValueError):
        w.parse_tar_shard(blob.getvalue())


def test_webdataset_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [
            ("s1", 2, "beta text", "en"),
            ("s1", 1, "alpha text", "de"),
            ("s2", 3, "gamma", "fr"),
        ],
        ["source", "doc_id", "text", "lang"],
    )
    shards = w.encode_webdataset_frame(
        df, "source", "doc_id", {"txt": "text", "cls": "lang"}
    )
    got_shards = {r["shard_id"]: r["n_samples"] for r in shards.collect()}
    assert got_shards == {"s1": 2, "s2": 1}
    members = {
        (r["shard_id"], r["key"], r["ext"]): bytes(r["content"])
        for r in w.parse_webdataset_members(shards).collect()
    }
    assert members[("s1", "1", "txt")] == b"alpha text"
    assert members[("s1", "2", "cls")] == b"en"
    assert members[("s2", "3", "txt")] == b"gamma"
    assert len(members) == 6


def test_webdataset_datasource_batch_and_stream(spark, tmp_path):
    import pytest as _pytest

    if w.WebDatasetDataSource is None:
        _pytest.skip("pyspark.sql.datasource unavailable")
    shards = tmp_path / "shards"
    shards.mkdir()
    (shards / "s0.tar").write_bytes(
        w.build_tar_shard([("a", {"txt": b"one"}), ("b", {"txt": b"two"})])
    )
    spark.dataSource.register(w.WebDatasetDataSource)

    batch = spark.read.format("webdataset").load(str(shards))
    got = {(r["key"], r["ext"]): bytes(r["content"]) for r in batch.collect()}
    assert got == {("a", "txt"): b"one", ("b", "txt"): b"two"}

    # streaming drop zone: second shard arrives mid-stream
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("webdataset")
        .load(str(shards))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        (shards / "s1.tar").write_bytes(
            w.build_tar_shard([("c", {"txt": b"three"})])
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["key"], r["ext"]): bytes(r["content"])
        for r in spark.read.parquet(sink).collect()
    }
    assert rows == {
        ("a", "txt"): b"one",
        ("b", "txt"): b"two",
        ("c", "txt"): b"three",
    }

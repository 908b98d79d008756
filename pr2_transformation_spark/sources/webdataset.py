"""WebDataset tar-shard container (stdlib ``tarfile``) — the de-facto
layout for multimodal training data: a ``.tar`` whose members are named
``<key>.<ext>``, where every member sharing a key is one training sample
(``000123.txt`` + ``000123.cls`` + ``000123.png`` ...).  Loaders stream
whole tars sequentially, so the SHARD is the unit of I/O parallelism —
exactly the blob-per-group shape the WARC source uses.

Determinism contract: shard bytes are a pure function of the group's
rows — members are ordered by (key, ext), headers carry fixed
``mtime=0 uid=gid=0`` USTAR fields — so shards are reproducible under
any shuffle order and diffable across runs.  (Public format reference:
webdataset/webdataset; no reference-repo counterpart — EXT surface.)
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_tar_shard(samples: Iterable[tuple[str, dict]]) -> bytes:
    """Serialize ``(key, {ext: bytes})`` samples into one deterministic
    USTAR tar blob (fixed metadata, members ordered as given / ext-sorted
    within a sample)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        for key, members in samples:
            for ext in sorted(members):
                payload = members[ext]
                if not isinstance(payload, (bytes, bytearray)):
                    payload = str(payload).encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(bytes(payload)))
    return buf.getvalue()


def parse_tar_shard(blob: bytes) -> list:
    """Read a tar shard back to ``[(key, ext, bytes)]`` in member order.
    Raises ``ValueError`` for non-tar payloads or nameless members."""
    try:
        tar = tarfile.open(fileobj=io.BytesIO(blob), mode="r:")
    except tarfile.TarError as exc:
        raise ValueError(f"not a tar shard: {exc}") from exc
    out = []
    with tar:
        for info in tar:
            if not info.isfile():
                continue
            name = info.name
            if "." not in name:
                raise ValueError(f"member {name!r} has no <key>.<ext> form")
            key, ext = name.rsplit(".", 1)
            member = tar.extractfile(info)
            out.append((key, ext, member.read() if member else b""))
    return out


def encode_webdataset_frame(
    df: DataFrame,
    group_col: str,
    key_col: str,
    member_cols: dict,
) -> DataFrame:
    """Pack rows into one WebDataset tar per ``group_col`` value ->
    ``(shard_id string, n_samples long, tar binary)``.

    ``member_cols`` maps member extension -> source column; each row
    becomes one sample keyed by ``key_col``.  Samples are ordered by
    ``key_col`` within the shard (deterministic bytes); group sizing is
    the caller's scale lever, same as the WARC packer."""

    exts = dict(member_cols)

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col)
        blob = build_tar_shard(
            (
                str(row[key_col]),
                {ext: row[col] for ext, col in exts.items()},
            )
            for _, row in pdf.iterrows()
        )
        return pd.DataFrame(
            {
                "shard_id": [str(key[0])],
                "n_samples": [len(pdf)],
                "tar": [blob],
            }
        )

    cols = [group_col, key_col, *dict.fromkeys(exts.values())]
    return (
        df.select(*cols)
        .groupBy(group_col)
        .applyInPandas(pack, "shard_id string, n_samples long, tar binary")
    )


MEMBER_SCHEMA = "shard_id string, key string, ext string, content binary"


def parse_webdataset_members(
    df: DataFrame, tar_col: str = "tar", id_col: str = "shard_id"
) -> DataFrame:
    """Explode tar shards into members ``(shard_id, key, ext, content)``
    — iterator ``mapInPandas``, peak memory one shard."""

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {"shard_id": [], "key": [], "ext": [], "content": []}
            for sid, blob in zip(pdf[id_col], pdf[tar_col]):
                for key, ext, content in parse_tar_shard(bytes(blob)):
                    rows["shard_id"].append(str(sid))
                    rows["key"].append(key)
                    rows["ext"].append(ext)
                    rows["content"].append(content)
            yield pd.DataFrame(rows)

    return df.select(id_col, tar_col).mapInPandas(explode, MEMBER_SCHEMA)


MEMBER_DS_SCHEMA = (
    "shard_path string, key string, ext string, content binary"
)

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class WebDatasetDataSource(DataSource):
        """Spark 4 Python DataSource for WebDataset shard directories:
        ``spark.read.format("webdataset").load(dir)`` maps every
        ``*.tar`` member to a row (shard_path, key, ext, content).
        Shards are the unit of parallelism — exactly how loaders consume
        them.  ``readStream`` turns the directory into a drop zone with
        the same exact file-set offsets as the WARC/Avro stream readers
        (deterministic batches -> exactly-once with idempotent sinks).

        Register once per session::

            spark.dataSource.register(WebDatasetDataSource)
        """

        @classmethod
        def name(cls) -> str:
            return "webdataset"

        def schema(self) -> str:
            return MEMBER_DS_SCHEMA

        def reader(self, schema):
            return _WdsReader(self.options)

        def streamReader(self, schema):
            return _WdsStreamReader(self.options)

    def _wds_listing(path: str) -> list:
        import glob
        import os as _os

        return sorted(
            glob.glob(_os.path.join(path, "**", "*.tar"), recursive=True)
        )

    def _wds_read(path: str):
        with open(path, "rb") as fh:
            blob = fh.read()
        for key, ext, content in parse_tar_shard(blob):
            yield (path, key, ext, content)

    class _WdsReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("webdataset source requires a path: .load(dir)")

        def partitions(self):
            files = _wds_listing(self._path)
            if not files:
                raise ValueError(f"no .tar shards under {self._path}")
            return [InputPartition(f) for f in files]

        def read(self, partition):
            yield from _wds_read(partition.value)

    class _WdsStreamReader(DataSourceStreamReader):
        """Drop-zone micro-batches: offset = exact sorted file set seen
        so far (no mtime races; replay-deterministic batches)."""

        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("webdataset source requires a path: .load(dir)")

        def initialOffset(self):
            return {"files": []}

        def latestOffset(self):
            return {"files": _wds_listing(self._path)}

        def partitions(self, start, end):
            new = sorted(set(end["files"]) - set(start["files"]))
            return [InputPartition(f) for f in new]

        def read(self, partition):
            yield from _wds_read(partition.value)

        def commit(self, end):
            pass  # files are the durable log

except ImportError:  # pragma: no cover — pre-4.0 Spark
    WebDatasetDataSource = None  # type: ignore[assignment]

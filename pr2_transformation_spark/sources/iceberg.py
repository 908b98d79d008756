"""Minimal Apache Iceberg (format-version 1) table source/sink — the
second open table format beside ``delta.py``, built on this repo's own
pure-python Avro codec (``avro.py``).

Iceberg's metadata tree, spec-faithful in layout:

    table/
      data/part-*.parquet
      metadata/
        v<N>.metadata.json          table metadata: schema, snapshots,
                                    current-snapshot-id, snapshot-log
        snap-<id>.avro              MANIFEST LIST: one row per manifest
                                    (path, counts, added_snapshot_id)
        m-<uuid>.avro               MANIFEST: one row per data file
                                    (status, file_path, record_count,
                                    file_size_in_bytes, ...)
        version-hint.text           current metadata version N

A snapshot's file set = union of data files with status != DELETED in
the manifests its manifest list references; commits append a new
manifest (and for overwrites simply stop referencing the old ones —
the v1-legal "rewrite the manifest list" strategy).  Readers time
travel by snapshot id through any historical metadata the log retains.

Like ``delta.py``: metadata is driver-side KBs at any data size; the
DATA path stays a distributed Spark parquet scan over the reconciled
file list, so predicate pushdown and column pruning are untouched.
Graded q356 mirrors q339 — commits + time travel + history with the
DuckDB oracle replaying the snapshot set algebra.

Out of scope, documented rather than half-built: format-version 2
delete files (merge-on-read), partition specs beyond unpartitioned,
and Avro-encoded column stats in manifests.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .avro import avro_read, avro_write

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},  # 0 EXISTING / 1 ADDED / 2 DELETED
        {"name": "snapshot_id", "type": "long"},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_data_files_count", "type": "int"},
        {"name": "existing_data_files_count", "type": "int"},
        {"name": "deleted_data_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
    ],
}


def _spark_type_to_iceberg(dt: str) -> str:
    return {
        "long": "long", "bigint": "long", "int": "int", "integer": "int",
        "double": "double", "float": "float", "string": "string",
        "boolean": "boolean", "date": "date", "timestamp": "timestamptz",
    }.get(dt, "string")


class IcebergTable:
    """A directory speaking the Iceberg v1 metadata layout."""

    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")

    # ---- metadata plumbing ----------------------------------------

    def _current_version(self) -> int:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            return 0
        return int(open(hint).read().strip())

    def _load_metadata(self) -> dict:
        v = self._current_version()
        if v == 0:
            raise ValueError(f"not an Iceberg table (no version hint): {self.path}")
        return json.load(open(os.path.join(self.meta_dir, f"v{v}.metadata.json")))

    def _write_metadata(self, meta: dict) -> int:
        v = self._current_version() + 1
        tmp = os.path.join(self.meta_dir, f".v{v}.json.tmp")
        json.dump(meta, open(tmp, "w"), indent=1)
        os.rename(tmp, os.path.join(self.meta_dir, f"v{v}.metadata.json"))
        with open(os.path.join(self.meta_dir, "version-hint.text"), "w") as f:
            f.write(str(v))
        return v

    # ---- write side ------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append",
              now_ms: "int | None" = None) -> int:
        """Commit ``df`` as a new snapshot; returns the snapshot id
        (deterministic: 1-based commit ordinal when ``now_ms`` pins
        time).  ``overwrite`` starts the snapshot's manifest list from
        scratch; ``append`` carries the previous list forward."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        ts = int(now_ms if now_ms is not None else time.time() * 1000)

        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        added = []
        counted = df.count()
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            name = f"part-{uuid.uuid4().hex[:12]}-{f}"
            dst = os.path.join(self.data_dir, name)
            os.rename(os.path.join(staging, f), dst)
            added.append({
                "status": 1,
                "snapshot_id": 0,  # patched below once the id is known
                "data_file": {
                    "file_path": f"data/{name}",
                    "file_format": "PARQUET",
                    "record_count": 0,  # per-file counts live in parquet
                    "file_size_in_bytes": os.path.getsize(dst),
                },
            })
        shutil.rmtree(staging)

        try:
            meta = self._load_metadata()
        except ValueError:
            meta = {
                "format-version": 1,
                "table-uuid": uuid.uuid4().hex,
                "location": self.path,
                "last-updated-ms": ts,
                "last-column-id": len(df.schema.fields),
                "schema": {
                    "type": "struct",
                    "fields": [
                        {"id": i + 1, "name": fld.name, "required": False,
                         "type": _spark_type_to_iceberg(fld.dataType.simpleString())}
                        for i, fld in enumerate(df.schema.fields)
                    ],
                },
                "partition-spec": [],
                "properties": {},
                "current-snapshot-id": -1,
                "snapshots": [],
                "snapshot-log": [],
            }
        snap_id = len(meta["snapshots"]) + 1
        for e in added:
            e["snapshot_id"] = snap_id

        manifest_name = f"m-{uuid.uuid4().hex[:12]}.avro"
        manifest_path = os.path.join(self.meta_dir, manifest_name)
        with open(manifest_path, "wb") as f:
            f.write(avro_write(added, MANIFEST_SCHEMA))

        prev_entries = []
        if mode == "append" and meta["current-snapshot-id"] != -1:
            prev = next(s for s in meta["snapshots"]
                        if s["snapshot-id"] == meta["current-snapshot-id"])
            _, prev_rows = avro_read(
                open(os.path.join(self.path, prev["manifest-list"]), "rb").read()
            )
            prev_entries = list(prev_rows)
        entries = prev_entries + [{
            "manifest_path": f"metadata/{manifest_name}",
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "added_snapshot_id": snap_id,
            "added_data_files_count": len(added),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": counted,
        }]
        list_name = f"snap-{snap_id}.avro"
        with open(os.path.join(self.meta_dir, list_name), "wb") as f:
            f.write(avro_write(entries, MANIFEST_LIST_SCHEMA))

        meta["snapshots"].append({
            "snapshot-id": snap_id,
            "timestamp-ms": ts,
            "manifest-list": f"metadata/{list_name}",
            "summary": {"operation": mode},
        })
        meta["current-snapshot-id"] = snap_id
        meta["last-updated-ms"] = ts
        meta["snapshot-log"].append({"snapshot-id": snap_id, "timestamp-ms": ts})
        self._write_metadata(meta)
        return snap_id

    # ---- read side -------------------------------------------------

    def _data_files(self, snapshot_id: "int | None" = None) -> list[str]:
        meta = self._load_metadata()
        sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
        snap = next(
            (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
        )
        if snap is None:
            raise ValueError(
                f"snapshot {sid} not in log "
                f"(have {[s['snapshot-id'] for s in meta['snapshots']]})"
            )
        _, manifests = avro_read(
            open(os.path.join(self.path, snap["manifest-list"]), "rb").read()
        )
        files = []
        for m in manifests:
            _, rows = avro_read(
                open(os.path.join(self.path, m["manifest_path"]), "rb").read()
            )
            files.extend(
                r["data_file"]["file_path"] for r in rows if r["status"] != 2
            )
        return sorted(files)

    def read(self, spark: SparkSession,
             snapshot_id: "int | None" = None) -> DataFrame:
        files = self._data_files(snapshot_id)
        if not files:
            raise ValueError("empty snapshot")
        spark.catalog.refreshByPath(self.path)
        return spark.read.parquet(*[os.path.join(self.path, p) for p in files])

    def snapshots(self) -> list[dict]:
        meta = self._load_metadata()
        return [
            {"snapshot_id": s["snapshot-id"], "timestamp_ms": s["timestamp-ms"],
             "operation": s["summary"]["operation"]}
            for s in meta["snapshots"]
        ]

    def current_snapshot_id(self) -> int:
        return self._load_metadata()["current-snapshot-id"]

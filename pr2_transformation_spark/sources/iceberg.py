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

Format-version 2 DELETES are implemented: POSITIONAL
(``delete_where`` — (file_path, pos) tombstones merged on read via a
broadcast anti-join against ``_metadata.row_index``) and EQUALITY
(``delete_where_equality`` — column-tuple tombstones scoped by
sequence: they apply only to data files OLDER than the delete, so
later appends matching the values survive, per the spec).  Out of
scope, documented rather than half-built: partition specs beyond
unpartitioned and Avro-encoded column stats in manifests.
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
                    # v2: 0 data / 1 position deletes / 2 equality deletes
                    {"name": "content", "type": "int"},
                    # simplification of the spec's equality_ids field-id
                    # list: comma-joined column NAMES (unpartitioned flat
                    # schemas make names unambiguous here)
                    {"name": "equality_cols", "type": "string"},
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
        {"name": "content", "type": "int"},  # v2: 0 data / 1 deletes
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_data_files_count", "type": "int"},
        {"name": "existing_data_files_count", "type": "int"},
        {"name": "deleted_data_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
    ],
}


_ICEBERG_TO_SPARK = {
    "long": "bigint", "int": "int", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "date": "date",
    "timestamptz": "timestamp",
}


def _iceberg_type_to_spark(t: str) -> str:
    # The pinned read schema round-trips through this map; a silent
    # 'string' fallback would CORRUPT the pinned schema for types the
    # seam doesn't carry yet (decimal, timestamp_ntz, binary, ...), so
    # unmapped types fail loudly instead.
    if t not in _ICEBERG_TO_SPARK:
        raise NotImplementedError(
            f"Iceberg type {t!r} is outside this table format seam "
            f"(supported: {sorted(_ICEBERG_TO_SPARK)})")
    return _ICEBERG_TO_SPARK[t]


def _spark_type_to_iceberg(dt: str) -> str:
    m = {
        "long": "long", "bigint": "long", "int": "int", "integer": "int",
        "double": "double", "float": "float", "string": "string",
        "boolean": "boolean", "date": "date", "timestamp": "timestamptz",
    }
    if dt not in m:
        raise NotImplementedError(
            f"Spark type {dt!r} is outside this table format seam "
            f"(supported: {sorted(m)})")
    return m[dt]


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
                    "content": 0,
                    "equality_cols": "",
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
            prev_entries = [{**r, "content": r.get("content", 0)}
                            for r in prev_rows]
        entries = prev_entries + [{
            "manifest_path": f"metadata/{manifest_name}",
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
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
            if m.get("content", 0) != 0:
                continue  # delete manifests feed _delete_files
            _, rows = avro_read(
                open(os.path.join(self.path, m["manifest_path"]), "rb").read()
            )
            files.extend(
                r["data_file"]["file_path"] for r in rows if r["status"] != 2
            )
        return sorted(files)

    def _delete_entries(self, snapshot_id: "int | None" = None) -> list[dict]:
        """v2 delete files referenced by the snapshot's content=1
        manifests: [{"path", "content" (1 pos / 2 eq), "seq"
        (added_snapshot_id — the sequence surrogate equality deletes
        scope on), "cols"}...]."""
        meta = self._load_metadata()
        sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
        snap = next(
            (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
        )
        if snap is None:
            raise ValueError(f"snapshot {sid} not in log")
        _, manifests = avro_read(
            open(os.path.join(self.path, snap["manifest-list"]), "rb").read()
        )
        out = []
        for m in manifests:
            if m.get("content", 0) != 1:
                continue
            _, rows = avro_read(
                open(os.path.join(self.path, m["manifest_path"]), "rb").read()
            )
            for r in rows:
                if r["status"] == 2:
                    continue
                df_ = r["data_file"]
                out.append({
                    "path": df_["file_path"],
                    "content": df_.get("content", 1),
                    "seq": m["added_snapshot_id"],
                    "cols": [c for c in df_.get("equality_cols", "").split(",")
                             if c],
                })
        return sorted(out, key=lambda d: d["path"])

    def _delete_files(self, snapshot_id: "int | None" = None) -> list[str]:
        """Positional-delete file paths (back-compat helper)."""
        return [d["path"] for d in self._delete_entries(snapshot_id)
                if d["content"] == 1]

    def _data_files_with_seq(self, snapshot_id: "int | None" = None):
        """[(file_path, added_snapshot_id)] for the snapshot's data files
        — the per-file sequence equality deletes are scoped against."""
        meta = self._load_metadata()
        sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
        snap = next(
            (s for s in meta["snapshots"] if s["snapshot-id"] == sid), None
        )
        if snap is None:
            raise ValueError(f"snapshot {sid} not in log")
        _, manifests = avro_read(
            open(os.path.join(self.path, snap["manifest-list"]), "rb").read()
        )
        files = []
        for m in manifests:
            if m.get("content", 0) != 0:
                continue
            _, rows = avro_read(
                open(os.path.join(self.path, m["manifest_path"]), "rb").read()
            )
            files.extend(
                (r["data_file"]["file_path"], m["added_snapshot_id"])
                for r in rows if r["status"] != 2
            )
        return sorted(files)

    def read(self, spark: SparkSession,
             snapshot_id: "int | None" = None) -> DataFrame:
        files = self._data_files(snapshot_id)
        if not files:
            raise ValueError("empty snapshot")
        spark.catalog.refreshByPath(self.path)
        # pin the TABLE schema (stored at commit time) instead of letting
        # the scan infer from one arbitrary file — heterogeneous physical
        # types across snapshots (e.g. an int32 literal appended onto a
        # long column) would otherwise fail conversion read-order-
        # dependently
        meta = self._load_metadata()
        ddl = ", ".join(
            f"{f['name']} {_iceberg_type_to_spark(f['type'])}"
            for f in meta["schema"]["fields"])
        base = spark.read.schema(ddl).parquet(
            *[os.path.join(self.path, p) for p in files])
        dels = self._delete_entries(snapshot_id)
        if not dels:
            return base
        # MERGE-ON-READ.  Positional deletes anti-join on (file,
        # original row position) — _metadata.row_index is the immutable
        # within-file ordinal the delete files were written against;
        # path scoping makes them naturally sequence-safe.  EQUALITY
        # deletes anti-join on their column tuple, but only against
        # data files OLDER than the delete (seq = added_snapshot_id):
        # rows appended after the delete survive even if they match —
        # the spec semantics q380 grades.
        from pyspark.sql import functions as F
        cols = base.columns
        # Helper/join columns must not collide with user columns (a table
        # may itself carry file_path/pos or __-prefixed names): uniquify
        # the helper names against the table schema and RENAME the delete
        # frame's columns before joining, so every join reference binds
        # to exactly one side.
        sfx = ""
        while any(f"__ice_{n}{sfx}" in cols for n in ("rel", "pos", "seq")):
            sfx += "_"
        c_rel, c_pos, c_seq = (f"__ice_rel{sfx}", f"__ice_pos{sfx}",
                               f"__ice_seq{sfx}")
        seq_by_file = dict(self._data_files_with_seq(snapshot_id))
        seq_expr = F.lit(None).cast("long")
        for p, seq in seq_by_file.items():
            seq_expr = F.when(
                F.col(c_rel) == p, F.lit(seq)).otherwise(seq_expr)
        out = base.select(
            "*",
            F.concat(
                F.lit("data/"),
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
            ).alias(c_rel),
            F.col("_metadata.row_index").alias(c_pos),
        ).withColumn(c_seq, seq_expr)
        for d in dels:
            del_df = spark.read.parquet(os.path.join(self.path, d["path"]))
            if d["content"] == 1:  # positional
                del_df = del_df.select(
                    F.col("file_path").alias(c_rel + "_d"),
                    F.col("pos").alias(c_pos + "_d"))
                out = out.join(
                    F.broadcast(del_df),
                    (F.col(c_rel) == F.col(c_rel + "_d"))
                    & (F.col(c_pos) == F.col(c_pos + "_d")),
                    "left_anti",
                )
            else:  # equality, sequence-scoped
                ren = {c: f"{c}__ice_d{sfx}" for c in d["cols"]}
                del_df = del_df.select(
                    *[F.col(c).alias(a) for c, a in ren.items()])
                eq = None
                for c in d["cols"]:
                    cond = out[c].eqNullSafe(F.col(ren[c]))
                    eq = cond if eq is None else (eq & cond)
                out = out.join(
                    F.broadcast(del_df),
                    eq & (F.col(c_seq) < F.lit(d["seq"])),
                    "left_anti",
                )
        return out.select(*cols)

    def delete_where_equality(self, spark: SparkSession, predicate: str,
                              columns: list[str],
                              now_ms: "int | None" = None) -> int:
        """EQUALITY DELETE commit (v2 content=2): the DISTINCT
        ``columns`` tuples of current rows matching ``predicate`` are
        written as an equality-delete parquet.  At read time the tuples
        anti-join ONLY against data files older than this commit —
        later appends matching the values survive (the spec's
        sequence-number scoping).  Returns the new snapshot id."""
        ts = int(now_ms if now_ms is not None else time.time() * 1000)
        from pyspark.sql import functions as F  # noqa: F401
        meta = self._load_metadata()
        vals = self.read(spark).filter(predicate).select(*columns).distinct()
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        vals.coalesce(1).write.mode("overwrite").parquet(staging)
        del_name = f"eq-delete-{uuid.uuid4().hex[:12]}.parquet"
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                os.rename(os.path.join(staging, f),
                          os.path.join(self.data_dir, del_name))
        shutil.rmtree(staging, ignore_errors=True)
        import pyarrow.parquet as pq
        n_del = pq.read_metadata(
            os.path.join(self.data_dir, del_name)).num_rows

        snap_id = len(meta["snapshots"]) + 1
        manifest_name = f"m-{uuid.uuid4().hex[:12]}.avro"
        manifest_path = os.path.join(self.meta_dir, manifest_name)
        with open(manifest_path, "wb") as f:
            f.write(avro_write([{
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": f"data/{del_name}",
                    "file_format": "PARQUET",
                    "record_count": n_del,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(self.data_dir, del_name)),
                    "content": 2,
                    "equality_cols": ",".join(columns),
                },
            }], MANIFEST_SCHEMA))
        prev = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        _, prev_rows = avro_read(
            open(os.path.join(self.path, prev["manifest-list"]), "rb").read())
        entries = [{**r, "content": r.get("content", 0)} for r in prev_rows]
        entries.append({
            "manifest_path": f"metadata/{manifest_name}",
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snap_id,
            "added_data_files_count": 0,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": n_del,
        })
        list_name = f"snap-{snap_id}.avro"
        with open(os.path.join(self.meta_dir, list_name), "wb") as f:
            f.write(avro_write(entries, MANIFEST_LIST_SCHEMA))
        meta["format-version"] = 2
        meta["snapshots"].append({
            "snapshot-id": snap_id,
            "timestamp-ms": ts,
            "manifest-list": f"metadata/{list_name}",
            "summary": {"operation": "delete"},
        })
        meta["current-snapshot-id"] = snap_id
        meta["last-updated-ms"] = ts
        meta["snapshot-log"].append(
            {"snapshot-id": snap_id, "timestamp-ms": ts})
        self._write_metadata(meta)
        return snap_id

    def delete_where(self, spark: SparkSession, predicate: str,
                     now_ms: "int | None" = None) -> int:
        """Format-version-2 POSITIONAL DELETE commit: rows of the
        current snapshot matching ``predicate`` are tombstoned as
        (file_path, pos) pairs in a delete parquet file, referenced by
        a content=1 manifest — data files are never rewritten (the
        merge-on-read trade: cheap deletes, a broadcast anti-join at
        read time).  Returns the new snapshot id."""
        ts = int(now_ms if now_ms is not None else time.time() * 1000)
        from pyspark.sql import functions as F
        meta = self._load_metadata()
        files = self._data_files()
        base = spark.read.parquet(
            *[os.path.join(self.path, p) for p in files])
        hits = (
            base.filter(predicate)
            .select(
                F.concat(
                    F.lit("data/"),
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1),
                ).alias("file_path"),
                F.col("_metadata.row_index").alias("pos"),
            )
            .orderBy("file_path", "pos")  # spec: delete files are sorted
        )
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        hits.coalesce(1).write.mode("overwrite").parquet(staging)
        n_del = 0
        del_name = f"delete-{uuid.uuid4().hex[:12]}.parquet"
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                os.rename(os.path.join(staging, f),
                          os.path.join(self.data_dir, del_name))
        shutil.rmtree(staging, ignore_errors=True)
        import pyarrow.parquet as pq
        n_del = pq.read_metadata(
            os.path.join(self.data_dir, del_name)).num_rows

        snap_id = len(meta["snapshots"]) + 1
        manifest_name = f"m-{uuid.uuid4().hex[:12]}.avro"
        manifest_path = os.path.join(self.meta_dir, manifest_name)
        with open(manifest_path, "wb") as f:
            f.write(avro_write([{
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": f"data/{del_name}",
                    "file_format": "PARQUET",
                    "record_count": n_del,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(self.data_dir, del_name)),
                    "content": 1,
                    "equality_cols": "",
                },
            }], MANIFEST_SCHEMA))
        prev = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        _, prev_rows = avro_read(
            open(os.path.join(self.path, prev["manifest-list"]), "rb").read())
        entries = [{**r, "content": r.get("content", 0)} for r in prev_rows]
        entries.append({
            "manifest_path": f"metadata/{manifest_name}",
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snap_id,
            "added_data_files_count": 0,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": n_del,
        })
        list_name = f"snap-{snap_id}.avro"
        with open(os.path.join(self.meta_dir, list_name), "wb") as f:
            f.write(avro_write(entries, MANIFEST_LIST_SCHEMA))
        meta["format-version"] = 2  # delete files are a v2 feature
        meta["snapshots"].append({
            "snapshot-id": snap_id,
            "timestamp-ms": ts,
            "manifest-list": f"metadata/{list_name}",
            "summary": {"operation": "delete"},
        })
        meta["current-snapshot-id"] = snap_id
        meta["last-updated-ms"] = ts
        meta["snapshot-log"].append(
            {"snapshot-id": snap_id, "timestamp-ms": ts})
        self._write_metadata(meta)
        return snap_id

    def snapshots(self) -> list[dict]:
        meta = self._load_metadata()
        return [
            {"snapshot_id": s["snapshot-id"], "timestamp_ms": s["timestamp-ms"],
             "operation": s["summary"]["operation"]}
            for s in meta["snapshots"]
        ]

    def current_snapshot_id(self) -> int:
        return self._load_metadata()["current-snapshot-id"]

"""First-decade probe for the round-7 format planes: the distributed
from-scratch readers (ORC, Arrow IPC, SQLite, ZIP) and the zstd-coded
writer paths at 1x vs 10x FILE COUNT.

The format planes are binaryFile scans + mapInPandas with one task per
file — the scale axis is file count, not rows-per-file (a 100 TB lake
is wide, not deep, at the ingestion layer).  Expectation: ZERO shuffle
at both scales and near-linear wall (flat per-file cost, task-queue
coordination only).

Usage: python scripts/scale_formats_probe.py
"""

import json
import os
import shutil
import sqlite3
import time
import urllib.request
import zipfile

import pyarrow as pa
import pyarrow.ipc as ipc

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4049")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pr2_transformation_spark.sources.arrow_ipc import read_arrow_distributed
from pr2_transformation_spark.sources.orc import read_orc_distributed
from pr2_transformation_spark.sources.orc_write import write_orc_bytes
from pr2_transformation_spark.sources.sqlite_reader import (
    read_sqlite_distributed,
)
from pr2_transformation_spark.sources.zip_archive import read_zip_distributed

BASE = "/tmp/scale_formats"
ROWS_PER_FILE = 20_000


def shuffle_totals():
    appid = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            "http://localhost:4049/api/v1/applications/"
            f"{appid}/stages?status=complete"
        ) as f:
            stages = json.load(f)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as e:  # noqa: BLE001
        print("rest err", e)
        return 0


def build(n_files: int, root: str) -> None:
    if os.path.exists(f"{root}/.done"):
        return
    shutil.rmtree(root, ignore_errors=True)
    for sub in ("orc", "arrow", "db", "zip"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
    for f in range(n_files):
        base = f * ROWS_PER_FILE
        ids = list(range(base, base + ROWS_PER_FILE))
        tags = [f"tag-{i % 41}" for i in ids]
        vals = [None if i % 7 == 0 else i * 0.5 for i in ids]
        with open(f"{root}/orc/p{f}.orc", "wb") as fh:
            fh.write(write_orc_bytes(
                [("id", "long", ids), ("tag", "string", tags),
                 ("val", "double", vals)], compression="zstd"))
        t = pa.table({"id": pa.array(ids, pa.int64()),
                      "tag": pa.array(tags),
                      "val": pa.array(vals, pa.float64())})
        with open(f"{root}/arrow/p{f}.arrow", "wb") as fh:
            w = ipc.new_file(fh, t.schema,
                             options=ipc.IpcWriteOptions(compression="zstd"))
            w.write_table(t)
            w.close()
        con = sqlite3.connect(f"{root}/db/p{f}.db")
        con.execute("CREATE TABLE ev (id INTEGER PRIMARY KEY, tag TEXT, "
                    "val REAL)")
        con.executemany("INSERT INTO ev VALUES (?,?,?)",
                        list(zip(ids, tags, vals)))
        con.commit()
        con.close()
        with zipfile.ZipFile(f"{root}/zip/p{f}.zip", "w",
                             zipfile.ZIP_DEFLATED) as z:
            for k in range(0, ROWS_PER_FILE, 2000):
                z.writestr(f"docs/{base + k}.txt",
                           " ".join(tags[k:k + 2000]))
    open(f"{root}/.done", "w").write("ok")


QUERIES = {
    "orc_scan": lambda root: read_orc_distributed(
        spark, f"{root}/orc", "id long, tag string, val double"),
    "arrow_scan": lambda root: read_arrow_distributed(
        spark, f"{root}/arrow", "id long, tag string, val double"),
    "sqlite_scan": lambda root: read_sqlite_distributed(
        spark, f"{root}/db", "ev", "id long, tag string, val double"),
    "zip_scan": lambda root: read_zip_distributed(
        spark, f"{root}/zip", suffix=".txt"),
}

SCALES = [(4, f"{BASE}/x1"), (40, f"{BASE}/x10")]
for n, root in SCALES:
    build(n, root)
    print(f"built {root} ({n} files)", flush=True)

results = {}
for name, fn in QUERIES.items():
    for n, root in SCALES:
        sb0 = shuffle_totals()
        t0 = time.time()
        cnt = fn(root).count()
        dt = time.time() - t0
        sb = shuffle_totals() - sb0
        results[(name, n)] = (dt, sb, cnt)
        print(f"RESULT {name} x{n // 4}: {dt:.2f}s "
              f"shuffle={sb / 1e6:.1f}MB rows={cnt}", flush=True)
for name in QUERIES:
    (t1, s1, c1), (t10, s10, c10) = results[(name, 4)], results[(name, 40)]
    print(f"CURVE {name}: wall {t1:.2f}->{t10:.2f} "
          f"({t10 / max(t1, 0.01):.1f}x for 10x files) "
          f"shuffle {s1 / 1e6:.1f}->{s10 / 1e6:.1f}MB rows {c1}->{c10}",
          flush=True)
spark.stop()

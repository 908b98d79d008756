"""Fourth-decade scaling probe (round-7 VERDICT item 7): the single worst
persistent heavyweight, q264 perceptual dedup, at x10000 of sf0.1 (~sf1000,
600M documents).  Same decorrelation protocol as scale1000_probe.py —
document replicas suffix 4 of every 5 tokens with the replica id so no
shingle of length >= 2 crosses replicas.  q264 reads only documents.doc_id
(the image family is synthesized from the id), so only documents is blown
up; the other tables symlink sf0.1.

Usage: python scripts/scale10000_probe.py
"""

import json
import os
import sys
import time
import urllib.request

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4049")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
SCALE, DIR = 10000, "/tmp/scale_d10000"


def shuffle_totals():
    appid = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{appid}/stages?status=complete"
        ) as f:
            stages = json.load(f)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as e:  # noqa: BLE001
        print("rest err", e)
        return 0


os.makedirs(DIR, exist_ok=True)
for tbl in (
    "region", "nation", "supplier", "part", "orders", "lineitem",
    "events", "customer", "embeddings",
):
    d = f"{DIR}/{tbl}.parquet"
    if not os.path.exists(d):
        os.symlink(f"{SRC}/{tbl}.parquet", d)

if not os.path.exists(f"{DIR}/.done"):
    t0 = time.time()
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    maxid = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # fan the explode across all cores BEFORE the 10000x blow-up —
    # the source is one parquet file = one input split otherwise
    reps = docs.repartition(64).select(
        F.explode(F.sequence(F.lit(0), F.lit(SCALE - 1))).alias("r"), "*"
    )
    blown = reps.select(
        (F.col("doc_id") + F.col("r").cast("long") * maxid).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t, i: F.when(i % 5 == 0, t).otherwise(
                        F.concat(t, F.lit("x"), F.col("r").cast("string"))
                    ),
                ),
                " ",
            )
        ).alias("text"),
        "lang",
        "source",
        *[c for c in docs.columns if c not in ("doc_id", "text", "lang", "source")],
    )
    blown.write.mode("overwrite").parquet(f"{DIR}/documents.parquet")
    open(f"{DIR}/.done", "w").write("ok")
    print(f"BUILD documents x{SCALE}: {time.time() - t0:.1f}s", flush=True)

qs = entry.queries()
name = "q264_perceptual_dedup_clusters"
sb0 = shuffle_totals()
t0 = time.time()
n = qs[name](spark, DIR).count()
dt = time.time() - t0
sb = shuffle_totals() - sb0
print(
    f"RESULT {name} x{SCALE}: {dt:.2f}s shuffle={sb / 1e6:.1f}MB rows={n}",
    flush=True,
)
print(
    f"CURVE {name}: x1000 record 911.5s / 1529.6MB -> x10000 {dt:.2f}s / "
    f"{sb / 1e6:.1f}MB ({dt / 911.5:.1f}x wall, {sb / 1e6 / 1529.6:.1f}x shuffle)",
    flush=True,
)
spark.stop()

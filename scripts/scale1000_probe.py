"""Third-decade scaling probe (round-6 VERDICT item 4): the persistent
heavyweights at 100x AND 1000x of sf0.1 — i.e. the sf10 -> sf100 decade —
measured in one process on one host so the curve is clean.

Same decorrelation rules as scale10_probe.py: document replicas suffix
4 of every 5 tokens with the replica id (so no shingle of length >= 2 is
shared across replicas and near-dup candidate volume stays honest);
embedding replicas roll the vector (mod dim-1 so replica ids past the
dimension keep producing distinct rolls); customer replicas offset keys
by a multiple of 7 preserving q63's %7 chain pattern.

Usage: python scripts/scale1000_probe.py [query ...]
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
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4048")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
SCALES = [(100, "/tmp/scale_d100"), (1000, "/tmp/scale_d1000")]


def shuffle_totals():
    appid = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"http://localhost:4048/api/v1/applications/{appid}/stages?status=complete"
        ) as f:
            stages = json.load(f)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as e:  # noqa: BLE001
        print("rest err", e)
        return 0


for scale, dirname in SCALES:
    os.makedirs(dirname, exist_ok=True)
    for tbl in ("region", "nation", "supplier", "part", "orders", "lineitem", "events"):
        d = f"{dirname}/{tbl}.parquet"
        if not os.path.exists(d):
            os.symlink(f"{SRC}/{tbl}.parquet", d)
    if os.path.exists(f"{dirname}/.done"):
        continue

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    maxid = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = docs.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    blown = reps.select(
        (F.col("doc_id") + F.col("r") * maxid).alias("doc_id"),
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
    blown.repartition(32).write.mode("overwrite").parquet(f"{dirname}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    maxv = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    erep = emb.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    # roll by 1 + (r-1) % (dim-1): always a nonzero roll for r > 0, valid
    # for replica ids past the dimension
    shift = F.lit(1) + (F.col("r") - 1) % F.lit(dim - 1)
    eblown = erep.select(
        (F.col("vec_id") + F.col("r") * maxv).alias("vec_id"),
        F.when(F.col("r") == 0, F.col("embedding"))
        .otherwise(
            F.concat(
                F.slice("embedding", shift + 1, F.lit(dim) - shift),
                F.slice("embedding", F.lit(1), shift),
            )
        )
        .alias("embedding"),
    )
    eblown.repartition(32).write.mode("overwrite").parquet(f"{dirname}/embeddings.parquet")

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    crep = cust.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    cblown = crep.select(
        (F.col("c_custkey").cast("long")
         + F.col("r").cast("long") * 7_000_000).alias("c_custkey"),
        *[c for c in cust.columns if c != "c_custkey"],
    )
    cblown.repartition(32).write.mode("overwrite").parquet(f"{dirname}/customer.parquet")
    open(f"{dirname}/.done", "w").write("ok")

qs = entry.queries()
FIVE = sys.argv[1:] or [
    "q278_classifier_eval",
    "q255_quality_classifier_train",
    "q256_quality_classifier_score",
    "q264_perceptual_dedup_clusters",
]
results = {}
for name in FIVE:
    for scale, dirname in SCALES:
        sb0 = shuffle_totals()
        t0 = time.time()
        n = qs[name](spark, dirname).count()
        dt = time.time() - t0
        sb = shuffle_totals() - sb0
        results[(name, scale)] = (dt, sb, n)
        print(f"RESULT {name} x{scale}: {dt:.2f}s shuffle={sb / 1e6:.1f}MB rows={n}", flush=True)
for name in FIVE:
    (t1, s1, n1), (t10, s10, n10) = results[(name, 100)], results[(name, 1000)]
    print(
        f"CURVE {name}: wall {t1:.2f}->{t10:.2f} ({t10 / max(t1, 0.01):.1f}x) "
        f"shuffle {s1 / 1e6:.1f}->{s10 / 1e6:.1f}MB ({s10 / max(s1, 1):.1f}x) rows {n1}->{n10}",
        flush=True,
    )
spark.stop()

import json, sys, time, urllib.request
from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "true")
         .config("spark.ui.port", "4049")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
R = 10

def shuffle_totals():
    appid = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{appid}/stages?status=complete"
        ) as f:
            stages = json.load(f)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as e:
        print("rest err", e)
        return 0

import shutil, os
for scale, dirname in [(1, "/tmp/scale_1x"), (R, "/tmp/scale_10x")]:
    os.makedirs(dirname, exist_ok=True)
    for tbl in ("region", "nation", "supplier", "part"):
        d = f"{dirname}/{tbl}.parquet"
        if not os.path.exists(d):
            os.symlink(f"{SRC}/{tbl}.parquet", d)
    # documents: replica r suffixes every token so replicas share no shingles
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    maxid = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = docs.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    blown = reps.select(
        (F.col("doc_id") + F.col("r") * maxid).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(F.split(F.col("text"), " "),
                            lambda t, i: F.when(i % 5 == 0, t).otherwise(
                                F.concat(t, F.lit("x"), F.col("r").cast("string")))),
                " ")
        ).alias("text"),
        "lang", "source", *[c for c in docs.columns if c not in ("doc_id", "text", "lang", "source")],
    )
    blown.write.mode("overwrite").parquet(f"{dirname}/documents.parquet")
    # embeddings: replica r rolls the vector r+1 positions (decorrelates)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    maxv = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    erep = emb.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    eblown = erep.select(
        (F.col("vec_id") + F.col("r") * maxv).alias("vec_id"),
        F.when(F.col("r") == 0, F.col("embedding")).otherwise(
            F.concat(F.slice("embedding", F.col("r") + 1, F.lit(dim) - F.col("r")),
                     F.slice("embedding", F.lit(1), F.col("r")))
        ).alias("embedding"),
    )
    eblown.write.mode("overwrite").parquet(f"{dirname}/embeddings.parquet")
    # customer: offset multiple of 7 preserves the q63 chain pattern
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    crep = cust.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    cblown = crep.select(
        (F.col("c_custkey") + F.col("r") * 7_000_000).alias("c_custkey"),
        *[c for c in cust.columns if c != "c_custkey"],
    )
    cblown.write.mode("overwrite").parquet(f"{dirname}/customer.parquet")
    # events: replica r shifts user/event ids (10x users, same per-user
    # activity shape — funnels/attribution/windows scale by key count)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    erep2 = ev.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    eblown2 = erep2.select(
        (F.col("event_id") + F.col("r") * 10_000_000).alias("event_id"),
        (F.col("user_id") + F.col("r") * 10_000_000).alias("user_id"),
        *[c for c in ev.columns if c not in ("event_id", "user_id")],
    )
    eblown2.write.mode("overwrite").parquet(f"{dirname}/events.parquet")
    # orders/lineitem: replica r shifts orderkey (10x baskets, same part
    # dimension — co-occurrence pair counts scale linearly)
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    orep = orders.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    oblown = orep.select(
        (F.col("o_orderkey") + F.col("r") * 100_000_000).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    oblown.write.mode("overwrite").parquet(f"{dirname}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    lrep = li.select(F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("r"), "*")
    lblown = lrep.select(
        (F.col("l_orderkey") + F.col("r") * 100_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    )
    lblown.write.mode("overwrite").parquet(f"{dirname}/lineitem.parquet")

qs = entry.queries()
TOP5 = sys.argv[1:] or [
    "q22_minhash_lsh", "q63_connected_components", "q94_near_dup_canonicalize",
    "q122_semantic_dedup", "q129_corpus_prep"]
results = {}
for name in TOP5:
    for scale, dirname in [(1, "/tmp/scale_1x"), (R, "/tmp/scale_10x")]:
        sb0 = shuffle_totals()
        t0 = time.time()
        n = qs[name](spark, dirname).count()
        dt = time.time() - t0
        sb = shuffle_totals() - sb0
        results[(name, scale)] = (dt, sb, n)
        print(f"RESULT {name} x{scale}: {dt:.2f}s shuffle={sb/1e6:.1f}MB rows={n}", flush=True)
for name in TOP5:
    (t1, s1, n1), (t10, s10, n10) = results[(name, 1)], results[(name, R)]
    print(f"CURVE {name}: wall {t1:.2f}->{t10:.2f} ({t10/max(t1,0.01):.1f}x) "
          f"shuffle {s1/1e6:.1f}->{s10/1e6:.1f}MB ({s10/max(s1,1):.1f}x) rows {n1}->{n10}")
spark.stop()

"""HNSW ANN (functions/similarity.py:HNSWIndex / hnsw_topk): recall
floor vs brute force, sub-linear distance evaluations, deterministic
builds, sharded merge exactness."""

from __future__ import annotations

import random
import statistics

from pyspark.sql import functions as F

from pr2_transformation_spark.functions import similarity


def _recall_sets(df, key="query_id", val="vec_id"):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r[key], set()).add(r[val])
    return out


def test_hnsw_recall_and_sublinearity_20k(spark):
    """At 20k vectors the graph answers with >= 0.85 mean recall@10
    while evaluating < 40% of the distances brute force needs — the
    claim that makes HNSW the scale path, measured not asserted."""
    rng = random.Random(3)
    big = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(20010)],
        "vec_id long, embedding array<double>")
    queries = big.filter("vec_id < 10").selectExpr(
        "vec_id as query_id", "embedding")
    corpus = big.filter("vec_id >= 10")
    gt = _recall_sets(similarity.cosine_topk_bruteforce(
        corpus, queries, k=10))
    res, acct = similarity.hnsw_topk(
        corpus, queries, k=10, n_shards=4, ef_search=96)
    hn = _recall_sets(res)
    recalls = [len(gt[q] & hn.get(q, set())) / 10 for q in gt]
    assert statistics.mean(recalls) >= 0.85, recalls
    assert min(recalls) >= 0.5, recalls
    a = acct.collect()
    evals = sum(r["dist_evals"] for r in a)
    assert sum(r["n_vectors"] for r in a) == 20000
    assert 0 < evals < 0.4 * 10 * 20000, evals


def test_hnsw_deterministic_and_rank_shape(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 5)
    r1, _ = similarity.hnsw_topk(corpus, queries, k=5, n_shards=2)
    r2, _ = similarity.hnsw_topk(corpus, queries, k=5, n_shards=2)
    rows1 = sorted(map(tuple, r1.collect()))
    rows2 = sorted(map(tuple, r2.collect()))
    assert rows1 == rows2
    per_q = {}
    for r in r1.collect():
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_hnsw_single_graph_high_ef_is_near_exact():
    """One driver-side graph, ef >= n: beam search degenerates to an
    exhaustive scan, so top-k must equal exact cosine order."""
    rng = random.Random(7)
    vecs = {i: [rng.gauss(0, 1) for _ in range(16)] for i in range(200)}
    idx = similarity.HNSWIndex(M=8, ef_construction=64)
    for i, v in vecs.items():
        idx.add(i, v)
    q = [rng.gauss(0, 1) for _ in range(16)]

    def cos(a, b):
        import math
        num = sum(x * y for x, y in zip(a, b))
        den = (math.sqrt(sum(x * x for x in a))
               * math.sqrt(sum(x * x for x in b)))
        return num / den

    exact = sorted(vecs, key=lambda i: (-cos(q, vecs[i]), i))[:10]
    got = [e for _d, e in idx.search(q, k=10, ef=400)]
    assert set(got) == set(exact)


def test_hnsw_level_distribution_and_empty():
    idx = similarity.HNSWIndex(M=8)
    levels = [idx._level(i) for i in range(5000)]
    # geometric with mL = 1/ln(8): ~88% at level 0, tail decays
    frac0 = sum(1 for lv in levels if lv == 0) / 5000
    assert 0.8 < frac0 < 0.95
    assert max(levels) >= 2
    # deterministic
    assert levels[:100] == [idx._level(i) for i in range(100)]
    assert similarity.HNSWIndex(M=8).search([1.0, 0.0], k=3) == []

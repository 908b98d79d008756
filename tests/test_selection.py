"""Tests for the DSIR data-selection operators (functions/selection.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from pr2_transformation_spark.functions import selection as sel


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox sat on the mat", "en"),
        (3, "der schnelle braune fuchs springt hoch", "de"),
        (4, "der faule hund schlaeft unter dem baum", "de"),
        (5, "the lazy dog sat under the tree", "en"),
        (6, "el zorro marron salta sobre el perro", "es"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_feature_buckets_distinct_and_bounded(spark):
    docs = _docs(spark)
    feats = sel.hashed_feature_buckets(docs, n_buckets=16, hasher="md5")
    rows = feats.collect()
    assert all(0 <= r["bucket"] < 16 for r in rows)
    # doc 1 has 8 distinct bigrams ("the quick" ... "lazy dog")
    n1 = feats.filter(F.col("doc_id") == 1).count()
    assert n1 == 8


def test_bucket_model_densifies_all_buckets(spark):
    docs = _docs(spark)
    feats = sel.hashed_feature_buckets(docs, n_buckets=16, hasher="md5")
    model = sel.bucket_model(feats, n_buckets=16)
    rows = {r["bucket"]: r["cnt"] for r in model.collect()}
    assert set(rows) == set(range(16))
    assert sum(rows.values()) == feats.count()


def test_dsir_weights_favor_target_like_docs(spark):
    """English docs must outscore non-English ones under an English
    target model, and the weight must equal the hand-computed ln-ratio
    sum for one pinned doc."""
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    w = sel.dsir_log_weights(docs, target, n_buckets=32, hasher="md5")
    got = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    worst_en = min(v for k, v in got.items() if langs[k] == "en")
    best_other = max(v for k, v in got.items() if langs[k] != "en")
    assert worst_en > best_other

    # hand-replay doc 6 (no vocabulary overlap with the target)
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 32

    feats = sel.hashed_feature_buckets(docs, n_buckets=32, hasher="md5")
    raw_counts = {
        r["bucket"]: r["cnt"]
        for r in sel.bucket_model(feats, n_buckets=32).collect()
    }
    tgt_feats = sel.hashed_feature_buckets(target, n_buckets=32, hasher="md5")
    tgt_counts = {
        r["bucket"]: r["cnt"]
        for r in sel.bucket_model(tgt_feats, n_buckets=32).collect()
    }
    rt, tt = sum(raw_counts.values()), sum(tgt_counts.values())
    toks = "el zorro marron salta sobre el perro".split()
    grams = list(dict.fromkeys(
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    ))
    expect = sum(
        math.log((tgt_counts[bucket(g)] + 1.0) / (tt + 32.0))
        - math.log((raw_counts[bucket(g)] + 1.0) / (rt + 32.0))
        for g in grams
    )
    assert abs(got[6] - expect) < 1e-9


def test_dsir_select_topk_exact_fraction_and_determinism(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    w = sel.dsir_log_weights(docs, target, n_buckets=32, hasher="md5")
    picked = sel.dsir_select_topk(w, frac=0.5)
    rows = picked.collect()
    assert sum(r["selected"] for r in rows) == 3  # ceil(6 * 0.5)
    # rank 1..n dense, selection = rank <= 3
    assert sorted(r["rk"] for r in rows) == [1, 2, 3, 4, 5, 6]
    assert all(r["selected"] == (r["rk"] <= 3) for r in rows)


def test_dsir_xxhash_production_mode_runs(spark):
    """The xxhash64 fast path (default) produces the same SHAPE and the
    same target-over-other ordering property."""
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    w = sel.dsir_log_weights(docs, target, n_buckets=64)
    assert w.columns == ["doc_id", "n_feats", "log_weight"]
    assert w.count() == 6


def test_dsir_selected_ids_matches_rank_window(spark):
    """The scalable TakeOrdered path must select exactly the ids the
    rank-window path marks selected."""
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    w = sel.dsir_log_weights(docs, target, n_buckets=32, hasher="md5")
    via_rank = {
        r["doc_id"]
        for r in sel.dsir_select_topk(w, frac=0.5).collect()
        if r["selected"]
    }
    via_limit = {r["doc_id"] for r in sel.dsir_selected_ids(w, frac=0.5).collect()}
    assert via_limit == via_rank


def test_logreg_train_separates_and_converges(spark):
    from pyspark.sql import functions as F
    from pr2_transformation_spark.functions import selection

    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, f"good clean prose with varied wording number {i}", 1))
        else:
            rows.append((i, f"spam spam buy now spam click spam now {i}", 0))
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])

    model = selection.logreg_train_hashed(
        df, n=1, n_buckets=32, hasher="md5", iters=4, lr=1.0
    )
    # dense contract: one row per bucket plus the bucket=-1 intercept
    assert model.count() == 33
    scored = selection.logreg_score_hashed(
        df, model, n=1, n_buckets=32, hasher="md5"
    )
    means = {
        r["label"]: r["p"]
        for r in scored.join(df.select("doc_id", "label"), "doc_id")
        .groupBy("label")
        .agg(F.avg("prob").alias("p"))
        .collect()
    }
    assert means[1] > 0.8 and means[0] < 0.2

    # more steps reduce logistic loss (monotone on this separable set)
    def loss(iters):
        m = selection.logreg_train_hashed(
            df, n=1, n_buckets=32, hasher="md5", iters=iters, lr=1.0
        )
        s = selection.logreg_score_hashed(df, m, n=1, n_buckets=32, hasher="md5")
        j = s.join(df.select("doc_id", "label"), "doc_id")
        return (
            j.select(
                F.when(F.col("label") == 1, -F.log("prob"))
                .otherwise(-F.log(1 - F.col("prob")))
                .alias("l")
            )
            .agg(F.avg("l"))
            .first()[0]
        )

    l1, l2, l4 = loss(1), loss(2), loss(4)
    assert l1 > l2 > l4


def test_logreg_score_empty_doc_gets_bias(spark):
    from pr2_transformation_spark.functions import selection

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", 1), (2, "", 0)], ["doc_id", "text", "label"]
    )
    model = selection.logreg_train_hashed(
        df, n=2, n_buckets=16, hasher="md5", iters=2, lr=0.5
    )
    bias = model.filter("bucket = -1").first()["weight"]
    scored = {
        r["doc_id"]: r
        for r in selection.logreg_score_hashed(
            df, model, n=2, n_buckets=16, hasher="md5"
        ).collect()
    }
    import math

    # doc 2 has no bigram features -> scores sigmoid(bias)
    assert scored[2]["n_feats"] == 0
    assert abs(scored[2]["prob"] - 1 / (1 + math.exp(-bias))) < 1e-12


def _wf(spark, rows):
    return spark.createDataFrame(rows, "source string, n_tokens long")


def test_waterfill_exact_level_and_allocations(spark):
    df = _wf(spark, [("a", 100), ("b", 300), ("c", 1000), ("d", 50)])
    # ascending d=50,a=100,b=300,c=1000; budget 800 -> i*=3, L=(800-450)/1=350
    out = {
        r["source"]: r
        for r in sel.waterfill_allocations(df, 800).collect()
    }
    assert out["d"]["alloc"] == 50 and out["a"]["alloc"] == 100
    assert out["b"]["alloc"] == 300 and out["c"]["alloc"] == 350
    assert out["c"]["level"] == 350.0 and out["c"]["kept_frac"] == 0.35
    assert sum(r["alloc"] for r in out.values()) == 800


def test_waterfill_fractional_level_floors(spark):
    df = _wf(spark, [("a", 100), ("b", 300), ("c", 1000), ("d", 50)])
    # budget 725 -> i*=2 (S=150), L=(725-150)/2=287.5; b,c floor to 287
    out = {
        r["source"]: r
        for r in sel.waterfill_allocations(df, 725).collect()
    }
    assert out["b"]["alloc"] == 287 and out["c"]["alloc"] == 287
    assert out["b"]["level"] == 287.5
    assert sum(r["alloc"] for r in out.values()) <= 725


def test_waterfill_budget_covers_corpus(spark):
    df = _wf(spark, [("a", 100), ("b", 300)])
    out = {
        r["source"]: r
        for r in sel.waterfill_allocations(df, 2000).collect()
    }
    # level unbounded -> NULL; Spark greatest() skips nulls, so this
    # pins the explicit NULL branch (alloc == tokens, not 0)
    assert out["a"]["alloc"] == 100 and out["b"]["alloc"] == 300
    assert out["a"]["level"] is None
    assert all(r["kept_frac"] == 1.0 for r in out.values())


def test_waterfill_zero_budget_and_fraction_mode(spark):
    df = _wf(spark, [("a", 100), ("b", 300), ("c", 1000), ("d", 50)])
    out = sel.waterfill_allocations(df, 0).collect()
    assert all(r["alloc"] == 0 for r in out)
    # fraction 0.5 of total 1450 -> budget 725: same result as absolute
    frac = {
        r["source"]: r["alloc"]
        for r in sel.waterfill_allocations(df, 0.5).collect()
    }
    absr = {
        r["source"]: r["alloc"]
        for r in sel.waterfill_allocations(df, 725).collect()
    }
    assert frac == absr


def test_waterfill_validation(spark):
    import pytest

    df = _wf(spark, [("a", 100)])
    with pytest.raises(ValueError):
        sel.waterfill_allocations(df, 1.5)
    with pytest.raises(ValueError):
        sel.waterfill_allocations(df, -1)
    with pytest.raises(TypeError):
        sel.waterfill_allocations(df, "many")
    with pytest.raises(ValueError):
        sel.waterfill_allocations(df, 10, group_cols=())


def test_preference_pairs_election_margin_and_near_dup_gate(spark):
    rows = [
        ("g1", 1, "the quick brown fox jumps over the lazy dog", 0.9),
        ("g1", 2, "bad short", 0.2),
        ("g1", 3, "middle quality text here", 0.5),
        ("g2", 4, "the quick brown fox jumps over the lazy dog", 0.8),
        ("g2", 5, "the quick brown fox jumps over a lazy dog", 0.75),
        ("g3", 6, "only one doc", 0.4),
    ]
    df = spark.createDataFrame(
        rows, "grp string, doc_id long, text string, score double"
    )
    out = {
        r["grp"]: r
        for r in sel.preference_pairs(
            df, group_cols=("grp",), min_margin=0.3, max_jaccard=0.5
        ).collect()
    }
    # g1: clear margin, dissimilar texts -> kept
    assert out["g1"]["chosen_id"] == 1 and out["g1"]["rejected_id"] == 2
    assert out["g1"]["kept"] and out["g1"]["pair_jaccard"] == 0.0
    # g2: tiny margin AND a paraphrase pair -> assembled but NOT kept
    assert out["g2"]["chosen_id"] == 4 and out["g2"]["rejected_id"] == 5
    assert not out["g2"]["kept"] and out["g2"]["pair_jaccard"] > 0.5
    # singleton prompt groups are dropped entirely
    assert "g3" not in out


def test_preference_pairs_deterministic_tie_break(spark):
    rows = [
        ("g", 10, "aa bb cc", 0.5),
        ("g", 11, "dd ee ff", 0.5),
        ("g", 12, "gg hh ii", 0.5),
    ]
    df = spark.createDataFrame(
        rows, "grp string, doc_id long, text string, score double"
    )
    out = sel.preference_pairs(df, group_cols=("grp",)).collect()
    # with every score tied, the asc-id tie-break elects doc 10 as BOTH
    # chosen and rejected, so the pair collapses and the group drops —
    # correct, since an all-tie group has margin 0 and teaches nothing
    assert out == []

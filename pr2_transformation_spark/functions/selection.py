"""Training-data selection operators: DSIR importance weighting.

DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — scores every raw-pool document by the log-likelihood
ratio of its hashed n-gram features under a *target* bag-of-ngrams model
vs the *raw* pool's own model, then keeps the highest-ratio documents.
It is the standard recipe for skewing a 100 TB crawl toward a small
high-quality target corpus (Wikipedia, books, curated eval-adjacent
text) without training a classifier.

Spark-first shape (everything stays JVM-side, no Python UDFs):

1. one scan per pool → distinct word n-gram shingles per doc
   (``textstats.shingles_from_tokens`` — O(n·tokens) zip_with fold)
   → hash into ``n_buckets`` feature buckets;
2. the two bucket→count models are tiny aggregates (≤ ``n_buckets``
   rows each) joined into ONE broadcast dimension of per-bucket
   log-probability deltas;
3. per-doc log weight = a map-side broadcast-hash join + one groupBy
   on the doc id.

At 100 TB the only wide exchange is the (doc_id, bucket) partial
aggregate; the models never exceed ``n_buckets`` rows regardless of
corpus size, so the importance join is always broadcast.  This mirrors
how the reference pipeline pushes its per-column transforms into one
generated projection (``/root/reference/core/transformations.py``) —
declare the whole feature plan, let the optimizer fuse it.

Hashing: ``xxhash64`` by default (JVM intrinsic); ``hasher="md5"``
switches to the portable 60-bit md5 fold (``dedup.md5_long``) so DuckDB
can replay bucket assignment bit-for-bit in the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long
from .textstats import shingles_from_tokens, tokens

__all__ = [
    "hashed_feature_buckets",
    "bucket_model",
    "dsir_log_weights",
    "dsir_select_topk",
    "dsir_selected_ids",
    "logreg_train_hashed",
    "logreg_score_hashed",
    "waterfill_allocations",
    "preference_pairs",
]


def _bucket(col: Column, n_buckets: int, hasher: str) -> Column:
    if hasher == "md5":
        h = md5_long(col)
    elif hasher == "xxhash64":
        h = F.xxhash64(col)
    else:  # pragma: no cover - guarded by callers' docstrings
        raise ValueError(f"unknown hasher {hasher!r}")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def hashed_feature_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 1024,
    hasher: str = "xxhash64",
) -> DataFrame:
    """``(id_col, bucket)`` — one row per DISTINCT word n-gram per doc.

    Distinct (binary) features make the model a set-of-ngrams
    distribution — the hashed-feature variant DSIR uses — and keep the
    exploded frame bounded by document vocabulary, not length.
    """
    toks = df.select(id_col, tokens(F.lower(F.col(text_col))).alias("__t"))
    # explode_outer + IS NOT NULL ≡ explode (shingles non-null) minus
    # the inferred size-filter that would inline the shingle assembly +
    # tokenize twice into the scan Filter (r10, guide §7.2)
    grams = toks.select(
        id_col,
        F.explode_outer(shingles_from_tokens(F.col("__t"), n)).alias("__g"),
    ).filter(F.col("__g").isNotNull())
    return grams.select(
        id_col, _bucket(F.col("__g"), n_buckets, hasher).alias("bucket")
    )


def bucket_model(
    feats: DataFrame, *, n_buckets: int = 1024
) -> DataFrame:
    """Bucket→count model: ``(bucket, cnt)`` plus every empty bucket.

    Densifying over ``sequence(0, n_buckets-1)`` keeps the two models
    join-complete so smoothing applies to unseen buckets too."""
    spark = feats.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    counts = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        all_buckets.join(counts, "bucket", "left")
        .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-raw-doc DSIR importance: ``(id_col, n_feats, log_weight)``.

    ``log_weight = Σ_features [ln p_target(b) − ln p_raw(b)]`` with
    Laplace ``smoothing`` over ``n_buckets`` buckets.  The model delta
    is ONE broadcast dim (≤ n_buckets rows); the raw pool is scanned
    once and shuffled once on (id, bucket)."""
    kw = dict(text_col=text_col, id_col=id_col, n=n,
              n_buckets=n_buckets, hasher=hasher)
    raw_feats = hashed_feature_buckets(raw, **kw)
    tgt_feats = hashed_feature_buckets(target, **kw)

    raw_model = bucket_model(raw_feats, n_buckets=n_buckets)
    tgt_model = bucket_model(tgt_feats, n_buckets=n_buckets)

    a = float(smoothing)

    def _logp(cnt: Column, total: Column) -> Column:
        return F.log((cnt + F.lit(a)) / (total + F.lit(a * n_buckets)))

    # totals ride along as literal-free columns so the whole dim stays
    # one small frame: (bucket, delta)
    rt = raw_model.agg(F.sum("cnt").alias("__rt"))
    tt = tgt_model.agg(F.sum("cnt").alias("__tt"))
    dim = (
        raw_model.alias("r")
        .join(tgt_model.alias("t"), "bucket")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            (
                _logp(F.col("t.cnt"), F.col("__tt"))
                - _logp(F.col("r.cnt"), F.col("__rt"))
            ).alias("delta"),
        )
    )
    return (
        raw_feats.join(F.broadcast(dim), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("delta").alias("log_weight"),
        )
    )


def dsir_select_topk(
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    frac: float = 0.2,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic top-``frac`` selection by log weight (ties broken by
    id) — the RNG-free stand-in for DSIR's Gumbel resampling step, per
    optional partition.  Adds ``rk`` and ``selected``."""
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_cols).orderBy(
        F.col("log_weight").desc(), F.col(id_col)
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(*partition_cols))
    return weights.select(
        "*",
        F.row_number().over(w).alias("rk"),
        (F.row_number().over(w) <= F.ceil(n * frac)).alias("selected"),
    )


def dsir_selected_ids(
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    frac: float = 0.2,
) -> DataFrame:
    """Scalable selection twin of ``dsir_select_topk``: the same top-
    ``frac`` id set, computed with ``orderBy().limit(k)`` — Spark's
    TakeOrdered keeps a k-row heap per partition and merges on the
    driver, so nothing ever single-partition-sorts.  Use THIS on a real
    corpus; ``dsir_select_topk``'s global rank window exists for the
    rank-annotated audit output (and costs a total sort, fine at audit
    sizes, wrong at 100 TB).  Equivalence is pinned by test."""
    import math

    n = weights.count()
    k = math.ceil(n * frac)
    return (
        weights.orderBy(F.col("log_weight").desc(), F.col(id_col))
        .limit(k)
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# Trainable quality classifier: hashed-feature logistic regression.
#
# The GPT-3 / LLaMA CommonCrawl recipe trains a small linear classifier
# (fastText-style hashed n-gram features) against a high-quality reference
# corpus and keeps crawl documents the model scores as reference-like.
# Here both halves — training AND scoring — are pure DataFrame programs:
#
#   * features: the same distinct-n-gram -> hashed-bucket stream DSIR uses
#     (binary presence per (doc, bucket));
#   * training: full-batch gradient descent where each iteration is ONE
#     distributed pass — margins via a broadcast join of the (<= n_buckets
#     row) weight vector, residuals via the label join, gradients via a
#     bucket-keyed partial aggregate.  The MODEL is driver-resident (it is
#     at most n_buckets + 1 doubles); the DATA never leaves the cluster.
#     This is exactly the parameter-server-less shape mllib's LBFGS uses
#     (treeAggregate of gradients), written against the public DataFrame
#     API with deterministic iteration count so an external SQL engine can
#     replay the arithmetic.
#   * scoring: one broadcast join + doc-keyed aggregate -> sigmoid margin.
# ---------------------------------------------------------------------------


def logreg_train_hashed(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n: int = 2,
    n_buckets: int = 64,
    hasher: str = "xxhash64",
    iters: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Train binary logistic regression on hashed n-gram presence
    features with ``iters`` full-batch GD steps from a zero init.

    Returns the dense model as a DataFrame: one row per bucket
    ``(bucket, weight)`` plus the intercept as ``bucket = -1`` — the
    broadcastable shape :func:`logreg_score_hashed` consumes.

    Each iteration runs two doc-keyed shuffles (margin aggregate,
    gradient aggregate) and collects only the ≤ ``n_buckets + 1``
    gradient rows; at 100 TB that is 3 scans and a few KB of driver
    traffic per step.  Deterministic given (seedless) zero init and a
    fixed iteration count.
    """
    spark = df.sparkSession
    # per-DOC distinct bucket array instead of an exploded (doc, bucket)
    # stream (r10, guide §2.4): margins become a per-row array fold
    # against the ≤ n_buckets-element broadcast weight literal — no
    # margin join, no doc-keyed aggregate, no labels join — and the
    # only shuffle per GD step is the ≤ n_buckets+1-group gradient
    # aggregate (map-side partial).  The intercept rides as a constant
    # bucket=-1 appended to every doc's array, so one gradient pass
    # still covers weights AND bias.
    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        F.concat(
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(
                        tokens(F.lower(F.col(text_col))), n
                    ),
                    lambda g: _bucket(g, n_buckets, hasher),
                )
            ),
            F.array(F.lit(-1)),
        ).alias("__b"),
    )
    # re-read every iteration: persist so tokenize -> shingle -> hash
    # runs ONCE, not `iters` times.  (On a real cluster swap for a
    # reliable checkpoint if executor loss mid-training matters; the
    # frame is (double, array<int>) narrow.)
    base.persist()
    weights: dict[int, float] = {}  # includes the bias at key -1
    try:
        n_docs = base.count()
        for _ in range(iters):
            if weights:
                # dense weight literal, index = bucket + 1 (1-based
                # element_at; slot 1 is the bias at bucket -1)
                warr = F.array(*[
                    F.lit(weights.get(j, 0.0))
                    for j in range(-1, n_buckets)
                ])
                margin = F.aggregate(
                    F.transform(
                        "__b", lambda b: F.element_at(warr, b + 2)
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                resid = (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
                    - F.col("__y")
                )
            else:
                # zero init: sigmoid(0) = 0.5 for EVERY doc — the first
                # step needs no margin evaluation at all
                resid = F.lit(0.5) - F.col("__y")
            grad_rows = (
                base.select(resid.alias("__r"), "__b")
                .select("__r", F.explode("__b").alias("bucket"))
                .groupBy("bucket")
                .agg(F.sum("__r").alias("__g"))
                .collect()
            )
            for row in grad_rows:
                weights[row["bucket"]] = weights.get(row["bucket"], 0.0) - lr * (
                    row["__g"] / n_docs
                )
    finally:
        base.unpersist()
    dense = [(b, weights.get(b, 0.0)) for b in range(n_buckets)]
    dense.append((-1, weights.get(-1, 0.0)))
    return spark.createDataFrame(dense, "bucket int, weight double")


def logreg_score_hashed(
    df: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Score documents under a :func:`logreg_train_hashed` model:
    ``(id, n_feats, prob)`` with ``prob = sigmoid(bias + Σ w_bucket)``.

    One broadcast join (the model is ≤ n_buckets + 1 rows) + one
    doc-keyed aggregate; docs with no features score ``sigmoid(bias)``.
    Feature params must match training."""
    # the model is ≤ n_buckets + 1 rows by contract — collect it into a
    # dense weight literal and score per row with an array fold (r10,
    # guide §2.4): no model join, no doc-keyed aggregate, no re-join
    # onto the doc spine — scoring is a single narrow projection, the
    # shape that filters a 100 TB crawl with ZERO shuffles.
    wrows = {int(r["bucket"]): float(r["weight"]) for r in model.collect()}
    bias = wrows.get(-1, 0.0)
    # NULL slot for any bucket absent from the model: absent buckets
    # must not count toward n_feats (the former inner join dropped them)
    warr = F.array(*[
        F.lit(wrows[j]) if j in wrows else F.lit(None).cast("double")
        for j in range(n_buckets)
    ])
    # two-step projection: the tokenize -> shingle -> hash chain lands
    # in its own attribute so the two consumers below reference it
    # instead of inlining it twice (CollapseProject keeps the split —
    # it refuses to duplicate non-cheap expressions)
    bucketed = df.select(
        id_col,
        F.array_distinct(
            F.transform(
                shingles_from_tokens(tokens(F.lower(F.col(text_col))), n),
                lambda g: _bucket(g, n_buckets, hasher),
            )
        ).alias("__b"),
    )
    matched = F.filter(
        F.transform("__b", lambda b: F.element_at(warr, b + 1)),
        lambda w: w.isNotNull(),
    )
    return bucketed.select(
        id_col,
        F.size(matched).cast("int").alias("n_feats"),
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.aggregate(
                            matched, F.lit(0.0), lambda acc, v: acc + v
                        )
                        + F.lit(bias)
                    )
                )
            )
        ).alias("prob"),
    )


def waterfill_allocations(
    df: DataFrame,
    budget,
    *,
    weight_col: str = "n_tokens",
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Token-budget water-filling across domains — the corpus-assembly
    allocator that answers "each source holds ``c_g`` tokens and the run
    affords ``B``: how many tokens may each source contribute?".  Small
    domains keep everything; large domains are capped at one common
    water level ``L`` chosen so the caps exactly exhaust the budget:
    ``Σ_g min(c_g, L) = B`` (the max-min-fair allocation — the unique
    split that cannot raise any capped domain without lowering a smaller
    one).  This is the budgeting half that precedes per-source trimming
    (``q112``-style fill-then-stop enforces a cap; this op *derives* the
    caps jointly).

    ``budget`` is either an absolute token count (int) or a fraction of
    the total corpus tokens (float in (0, 1)), resolved with a scalar
    aggregate — never a driver collect.

    Closed form: sort the ``n`` group counts ascending ``c_1 ≤ … ≤ c_n``
    with running sums ``S_i``; the largest ``i*`` with
    ``S_i + c_i·(n - i) ≤ B`` marks the groups that keep everything, and
    ``L = (B - S_{i*}) / (n - i*)`` levels the rest (``i* = n`` ⇒ the
    budget covers the corpus; ``L`` is unbounded and every group keeps
    all).  Integer allocations take ``floor``, so ``Σ alloc ≤ B`` with
    slack < ``n``.

    Distributed shape: the ONLY wide exchange is the per-group weight
    aggregate over the corpus (map-side partial sums).  Everything after
    runs on the tiny group table — two single-partition window passes
    and a broadcast of one scalar row — so the plan is identical at
    sf0.001 and at 100 TB, where "tiny" still means
    O(distinct domains) ≪ executor memory.

    Returns one row per group: ``(*group_cols, tokens, alloc, level,
    kept_frac)`` where ``level`` is ``round(L, 4)`` (NULL when
    unbounded) and ``kept_frac = round(alloc / tokens, 4)``.
    """
    from pyspark.sql import Window

    gcols = list(group_cols)
    if not gcols:
        raise ValueError("waterfill_allocations needs at least one group col")
    counts = df.groupBy(*gcols).agg(
        F.sum(F.col(weight_col)).cast("long").alias("tokens")
    )
    if isinstance(budget, float):
        if not 0.0 < budget < 1.0:
            raise ValueError("fractional budget must be in (0, 1)")
        budget_expr = F.floor(F.col("__total") * F.lit(budget)).cast("long")
    elif isinstance(budget, int) and not isinstance(budget, bool):
        if budget < 0:
            raise ValueError("budget must be >= 0")
        budget_expr = F.lit(budget).cast("long")
    else:
        raise TypeError("budget must be an int (tokens) or float (fraction)")

    scalar = F.broadcast(
        counts.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("tokens").alias("__total"),
        ).select("__n", "__total", budget_expr.alias("__budget"))
    )
    order = [F.col("tokens")] + [F.col(c) for c in gcols]
    w_rank = Window.orderBy(*order)
    ranked = (
        counts.crossJoin(scalar)
        .withColumn("__i", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "__s",
            F.sum("tokens").over(
                w_rank.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    feas = F.broadcast(
        ranked.filter(
            F.col("__s") + F.col("tokens") * (F.col("__n") - F.col("__i"))
            <= F.col("__budget")
        ).agg(
            F.max("__i").alias("__i_star"),
            F.max_by("__s", "__i").alias("__s_star"),
        )
    )
    lvl = F.when(
        F.col("__i_star") < F.col("__n"),
        (F.col("__budget") - F.col("__s_star"))
        / (F.col("__n") - F.col("__i_star")).cast("double"),
    )
    # NB: lvl is NULL when i* = n (budget covers the corpus) — keep that
    # branch explicit: Spark's greatest() SKIPS nulls, so
    # greatest(floor(NULL), 0) would silently collapse to 0, not NULL.
    alloc = F.when(lvl.isNull(), F.col("tokens")).otherwise(
        F.least(
            F.col("tokens"), F.greatest(F.floor(lvl), F.lit(0)).cast("long")
        )
    )
    return (
        ranked.crossJoin(feas)
        .withColumn("__i_star", F.coalesce("__i_star", F.lit(0)))
        .withColumn("__s_star", F.coalesce("__s_star", F.lit(0)))
        .select(
            *gcols,
            F.col("tokens"),
            alloc.alias("alloc"),
            F.round(lvl, 4).alias("level"),
            F.round(
                alloc.cast("double")
                / F.greatest(F.col("tokens"), F.lit(1)).cast("double"),
                4,
            ).alias("kept_frac"),
        )
    )


def preference_pairs(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "score",
    min_margin: float = 0.0,
    max_jaccard: float = 1.0,
    n: int = 2,
) -> DataFrame:
    """Preference-pair assembly — the DPO/RLHF data-prep step that turns
    scored candidates into one (chosen, rejected) training pair per
    prompt group: chosen = highest score, rejected = lowest (ties broken
    by id, so the election is deterministic under any shuffle order).
    A pair is ``kept`` only if it is *informative*: the score margin
    reaches ``min_margin`` (no near-tie pairs, which teach nothing) AND
    the two texts' distinct word-``n``-gram Jaccard stays at or below
    ``max_jaccard`` (a paraphrase of the chosen answer labelled
    "rejected" is a contradictory gradient — the classic silent failure
    of naive pair mining).  Groups with a single candidate are dropped.

    Distributed shape: one shuffle on the group key serves both rank
    windows; the chosen/rejected frames are one row per group, so the
    assembly join runs at prompt-group cardinality, never corpus
    cardinality, and the n-gram arrays ride along as columns (no second
    scan, no explode).

    Returns ``(*group_cols, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, pair_jaccard, kept)``.
    """
    from pyspark.sql import Window

    gcols = list(group_cols)
    if not gcols:
        raise ValueError("preference_pairs needs at least one group col")
    base = df.select(
        *gcols, F.col(id_col), F.col(text_col), F.col(score_col)
    )
    w_best = Window.partitionBy(*gcols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    w_worst = Window.partitionBy(*gcols).orderBy(
        F.col(score_col).asc(), F.col(id_col)
    )
    grams = F.array_distinct(
        shingles_from_tokens(tokens(F.lower(F.col(text_col))), n)
    )
    chosen = (
        base.withColumn("__rn", F.row_number().over(w_best))
        .filter(F.col("__rn") == 1)
        .select(
            *gcols,
            F.col(id_col).alias("chosen_id"),
            F.col(score_col).alias("chosen_score"),
            grams.alias("__cg"),
        )
    )
    rejected = (
        base.withColumn("__rn", F.row_number().over(w_worst))
        .filter(F.col("__rn") == 1)
        .select(
            *gcols,
            F.col(id_col).alias("rejected_id"),
            F.col(score_col).alias("rejected_score"),
            grams.alias("__rg"),
        )
    )
    pair = chosen.join(rejected, gcols).filter(
        F.col("chosen_id") != F.col("rejected_id")
    )
    inter = F.size(F.array_intersect("__cg", "__rg"))
    union = F.size("__cg") + F.size("__rg") - inter
    jac = F.round(inter / F.greatest(union, F.lit(1)), 4)
    margin = F.col("chosen_score") - F.col("rejected_score")
    return pair.select(
        *gcols,
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        margin.alias("margin"),
        jac.alias("pair_jaccard"),
        (
            (margin >= F.lit(float(min_margin)))
            & (jac <= F.lit(float(max_jaccard)))
        ).alias("kept"),
    )

"""Per-group scoring (EXT): grouped standardization in two forms.

``zscore_window`` is the production path — pure built-in window
aggregates, whole-stage codegen'd, one shuffle on the group key.
``zscore_apply_in_pandas`` computes the identical result through an
Arrow-batched grouped UDF (``applyInPandas``) — the escape hatch for
per-group logic that genuinely needs Python/numpy (model inference,
sklearn transforms); kept result-equal to the window form so tests can
pin the equivalence.  UDFs are the slow path: prefer the window form
whenever the math is expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_window(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """(v - group_mean) / group_stddev_samp via window aggregates; NULL for
    single-row groups (stddev undefined) and zero-variance groups."""
    w = Window.partitionBy(*group_cols)
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mu) / sd)
    return df.withColumn(out_col, z)


def zscore_apply_in_pandas(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Same semantics through an Arrow-batched grouped pandas UDF."""
    import pandas as pd  # noqa: F401 - arrow path

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])

    def score(pdf):
        sd = pdf[value_col].std(ddof=1)
        if sd and sd > 0:
            pdf[out_col] = (pdf[value_col] - pdf[value_col].mean()) / sd
        else:
            pdf[out_col] = None
        return pdf

    return df.groupBy(*group_cols).applyInPandas(score, out_schema)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document — the repetitiveness signal
    SQL cannot express: boilerplate, template spam, and copy-paste loops
    compress far below natural prose (ratios under ~0.3 at level 6 are a
    standard curation red flag; CCNet/Gopher-style pipelines pair this
    with the explicit repetition-ratio rules).

    Arrow-batched pandas UDF over stdlib ``zlib`` — narrow, no shuffle;
    the only cost is one deflate pass per document, which at warehouse
    scale is embarrassingly scan-parallel.  Returns the input plus
    ``n_bytes``, ``n_compressed``, ``compression_ratio`` (4dp, compressed
    over raw UTF-8 bytes; empty text -> ratio 1.0).
    """
    import zlib

    import pandas as pd

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["n_bytes int", "n_compressed int", "compression_ratio double"]
    )

    def run(batches):
        for pdf in batches:
            nb, nc, ratio = [], [], []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                if not raw:
                    nb.append(0); nc.append(0); ratio.append(1.0)
                    continue
                c = zlib.compress(raw, level)
                nb.append(len(raw)); nc.append(len(c))
                ratio.append(round(len(c) / len(raw), 4))
            pdf = pdf.copy()
            pdf["n_bytes"] = pd.Series(nb, index=pdf.index, dtype="int32")
            pdf["n_compressed"] = pd.Series(nc, index=pdf.index, dtype="int32")
            pdf["compression_ratio"] = pd.Series(ratio, index=pdf.index)
            yield pdf

    return df.mapInPandas(run, schema)


def cohens_kappa(
    df: DataFrame,
    group_cols: list[str],
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Per-group Cohen's kappa (Cohen 1960) — chance-corrected
    inter-annotator agreement, the QA gate for labeled / preference data
    before it trains a reward model: ``κ = (p_o − p_e) / (1 − p_e)``
    with observed agreement ``p_o`` and chance agreement ``p_e`` from
    the raters' marginal label distributions.

    Three aggregations keyed by (group[, label]) — each map-side
    combinable, no all-pairs anything, so group count bounds every
    shuffle regardless of corpus size.  Returns one row per group:
    ``n, po, pe, kappa`` (kappa NULL when ``p_e = 1``: a constant-label
    group has no chance-corrected signal).  All ratios derive from
    integer counts, so any engine reproduces them bit-for-bit."""
    g = list(group_cols)
    base = df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(rater_a) == F.col(rater_b), 1).otherwise(0)
        ).alias("__agree"),
    )
    ma = df.groupBy(*g, F.col(rater_a).alias("__lab")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    mb = df.groupBy(*g, F.col(rater_b).alias("__lab")).agg(
        F.count(F.lit(1)).alias("__nb")
    )
    pe_num = (
        ma.join(mb, g + ["__lab"])
        .groupBy(*g)
        .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__pe_num"))
    )
    po = F.col("__agree") / F.col("n")
    pe = F.coalesce(F.col("__pe_num"), F.lit(0)) / (F.col("n") * F.col("n"))
    return (
        base.join(pe_num, g, "left")
        .select(
            *g,
            "n",
            po.alias("__po"),
            pe.alias("__pe"),
        )
        .select(
            *g,
            "n",
            F.round("__po", 4).alias("po"),
            F.round("__pe", 4).alias("pe"),
            F.when(
                F.col("__pe") < 1.0,
                F.round(
                    (F.col("__po") - F.col("__pe")) / (1.0 - F.col("__pe")), 4
                ),
            ).alias("kappa"),
        )
    )


def binary_classifier_report(
    df: DataFrame,
    *,
    score_col: str = "p",
    label_col: str = "y",
    n_bins: int = 10,
) -> DataFrame:
    """Exact ROC AUC + reliability (calibration) bins for a scored binary
    classifier, computed WITHOUT a global per-row sort.

    AUC is the tie-corrected Mann-Whitney statistic
    ``(Σ avg-rank of positives − n₁(n₁+1)/2) / (n₁·n₀)``, but ranks are
    derived from a SCORE-HISTOGRAM: rows first aggregate per distinct
    score value (for 4-decimal-quantized scores that is ≤ 10⁴ + 1 groups
    regardless of corpus size), and the rank window runs over that tiny
    frame — so the only per-row work is one groupBy, and the global sort
    a naive rank-every-row AUC needs (the non-starter at 100 TB) never
    happens.  Quantize ``score_col`` BEFORE calling (the quantization is
    what makes ranks engine-portable AND bounds the histogram).

    Returns one row per occupied calibration bin:
    ``(bin, n, mean_pred, frac_pos, auc, brier)`` — auc/brier are
    corpus-level scalars repeated onto every bin row via a broadcast
    1-row cross.

    The input crosses the engine ONCE (r10, guide §2.3): the score
    histogram ``(p, count, positives)`` is a sufficient statistic for
    all three outputs, so Brier (``Σ pos·(1−p)² + (cnt−pos)·p²``) and
    the calibration bins (weighted rollups of the histogram) are
    derived from it instead of re-consuming the scored frame — which
    previously re-ran the whole upstream scoring pipeline three times
    inside one plan."""
    from pr2_transformation_spark.checkpointing import checkpoint_frame

    sc = df.select(
        F.col(score_col).alias("__p"), F.col(label_col).cast("double").alias("__y")
    )
    # materialize the histogram once: it feeds THREE consumers (rank
    # window, brier, bins) and without the cut each would re-run the
    # scored frame's whole upstream.  coalesce(1) first — the frame is
    # quantization-bounded (≤ 10⁴ + 1 rows) and a single-partition
    # checkpoint lets the global rank window run without an exchange.
    byp = checkpoint_frame(
        sc.groupBy("__p")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("__y").alias("__pos"))
        .coalesce(1),
        "local",
    )
    w = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byp.withColumn(
        "__cum_prev", F.coalesce(F.sum("__cnt").over(w), F.lit(0))
    ).withColumn(
        "__avg_rank", F.col("__cum_prev") + (F.col("__cnt") + 1) / F.lit(2.0)
    )
    totals = ranked.agg(
        F.sum(F.col("__pos") * F.col("__avg_rank")).alias("__rpos"),
        F.sum("__pos").alias("__n1"),
        (F.sum("__cnt") - F.sum("__pos")).alias("__n0"),
    )
    auc = totals.select(
        F.round(
            (F.col("__rpos") - F.col("__n1") * (F.col("__n1") + 1) / 2.0)
            / (F.col("__n1") * F.col("__n0")),
            4,
        ).alias("auc")
    )
    # y ∈ {0,1}: per distinct score, Σ(p−y)² = pos·(1−p)² + (cnt−pos)·p²
    brier = byp.agg(
        F.round(
            F.sum(
                F.col("__pos")
                * (F.lit(1.0) - F.col("__p"))
                * (F.lit(1.0) - F.col("__p"))
                + (F.col("__cnt") - F.col("__pos"))
                * F.col("__p")
                * F.col("__p")
            )
            / F.sum("__cnt"),
            4,
        ).alias("brier")
    )
    bins = byp.groupBy(
        F.least(F.floor(F.col("__p") * n_bins), F.lit(n_bins - 1))
        .cast("int")
        .alias("bin")
    ).agg(
        F.sum("__cnt").alias("n"),
        F.round(F.sum(F.col("__p") * F.col("__cnt")) / F.sum("__cnt"), 4)
        .alias("mean_pred"),
        F.round(F.sum("__pos") / F.sum("__cnt"), 4).alias("frac_pos"),
    )
    return bins.crossJoin(F.broadcast(auc)).crossJoin(F.broadcast(brier))

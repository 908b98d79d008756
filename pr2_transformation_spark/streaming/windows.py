"""Windowed / sessionized event aggregation (EXT) — batch + streaming.

The reference is batch-only (SURVEY.md §2.11); this module supplies the
Structured-Streaming surface a Spark-native engine owes its users.  Every
aggregate has a *batch* form (used by the DuckDB-checked correctness
queries) and a *streaming* form differing only in source/watermark wiring —
same logical plan, so correctness of the batch form carries over.

Late data: the streaming forms take a watermark delay; state for windows
older than the watermark is dropped (and `dropDuplicatesWithinWatermark`
bounds dedup state the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count/sum per group (batch form)."""
    g = [F.window(F.col(ts_col), window).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window aggregate (batch form)."""
    g = [F.window(F.col(ts_col), window, slide).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*g)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum(value_col), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Session-window aggregate using Spark's native ``session_window``
    (batch form; works identically under streaming with a watermark)."""
    g = [F.session_window(F.col(ts_col), gap).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*g)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *(group_cols or []),
            "n_events",
        )
    )


def sessionize_batch(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Classic lag/gap sessionization (batch): a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.  SQL-expressible
    (window functions), so it serves as the oracle-checked twin of
    :func:`session_agg`."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    gap_s = gap_minutes * 60
    ts_epoch = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(ts_epoch).over(w)
    new_session = F.when(
        prev.isNull() | ((ts_epoch - prev) > gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__new", new_session)
        .withColumn("session_idx", F.sum("__new").over(w))
        .drop("__new")
    )


# ---------------------------------------------------------------------------
# Streaming forms
# ---------------------------------------------------------------------------

def streaming_tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Streaming tumbling aggregate with late-data watermark; same logical
    plan as :func:`tumbling_agg`."""
    return tumbling_agg(
        stream.withWatermark(ts_col, watermark), ts_col, window, group_cols, value_col
    )


def streaming_session_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming session windows (state pruned past the watermark)."""
    return session_agg(
        stream.withWatermark(ts_col, watermark), ts_col, gap, group_cols
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key events within the watermark horizon
    (``dropDuplicatesWithinWatermark`` bounds the dedup state)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)

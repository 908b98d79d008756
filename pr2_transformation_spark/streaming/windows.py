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


def streaming_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a running
    per-user profile (event count, value sum, last-seen epoch) maintained
    across micro-batches, with processing-time state timeout so idle users'
    state is evicted (bounded state at any user cardinality).

    This is the escape hatch for stateful logic Spark's built-in windowed
    aggregates can't express (cross-window running state, custom eviction);
    everything expressible as a windowed agg should use those instead.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("last_seen_epoch", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", DoubleType()),
            StructField("last", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            last = max(last, int(pdf[ts_col].astype("int64").max() // 1_000_000_000))
        state.update((n, s, last))
        state.setTimeoutDuration(state_timeout_ms)
        import pandas as pd

        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "sum_value": s, "last_seen_epoch": last}]
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_user_stats_tws(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "30 minutes",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """The ``transformWithStateInPandas`` form of ``streaming_user_stats``:
    Spark 4's typed-state operator API (named state cells with per-cell
    TTL, timers, composite list/map state) superseding the single-tuple
    state of ``applyInPandasWithState``.  Output contract is identical so
    the two forms are drop-in interchangeable; state eviction here is a
    declarative TTL on the value cell rather than a manually re-armed
    processing-time timeout.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``) — which is also the right provider at
    scale: state lives off-heap/on-disk per task with changelog
    checkpointing, so per-executor state size is bounded by disk, not
    memory.  Also requires the ``protobuf`` Python package (the operator's
    Python↔JVM state server speaks protobuf); environments without it
    should use ``streaming_user_stats`` (identical output contract).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
            StructField("last_seen_epoch", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", DoubleType()),
            StructField("last", LongType()),
        ]
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", state_schema, state_ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            n, s, last = self._stats.get() if self._stats.exists() else (0, 0.0, 0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
                last = max(
                    last, int(pdf[ts_col].astype("int64").max() // 1_000_000_000)
                )
            self._stats.update((n, s, last))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "sum_value": s,
                        "last_seen_epoch": last,
                    }
                ]
            )

        def close(self) -> None:
            pass

    # the operator's Python<->JVM state server speaks protobuf; where
    # the real package is absent, activate the from-scratch miniproto
    # runtime (vendor/miniproto) on driver + executors
    from .protoshim import ensure_protobuf

    ensure_protobuf(stream.sparkSession)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .transformWithStateInPandas(
            statefulProcessor=_RunningStats(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )

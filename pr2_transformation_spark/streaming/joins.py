"""Stream-stream and stream-static joins (EXT — SURVEY.md §2.11).

The reference is batch-only; a Spark-native engine owes its users the
streaming join surface.  Both helpers build the same *logical* join a batch
caller would write, so batch-twin equivalence tests (tests/test_streaming.py)
prove the streaming wiring and the semantics in one shot.

Scale posture: a stream-stream join keeps both sides' unmatched rows in
state; the watermark + event-time interval bound is what makes that state
finite (Spark drops buffered rows once they can no longer match).  Never
ship an unbounded stream-stream join — without the time bound the state
grows with the stream.  Stream-static joins hold no state at all: the
static side is just (re)broadcast per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: right rows match a left row with the same
    ``key`` whose timestamp falls in ``[left_ts, left_ts + within]``.

    Works on batch frames as-is; for streams, watermark both inputs first
    (:func:`streaming_interval_join`) — the interval bound is what lets
    Spark expire join state.  ``how`` may be ``inner`` or ``left_outer``
    (outer results are emitted only after the watermark passes).
    """
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """:func:`interval_join` over two watermarked streams — the
    impression→click attribution shape.  State per side is bounded by
    ``watermark + within``."""
    return interval_join(
        left.withWatermark(left_ts, watermark),
        right.withWatermark(right_ts, watermark),
        key,
        left_ts,
        right_ts,
        within,
        how,
    )


def enrich(stream: DataFrame, dim: DataFrame, key: str, how: str = "left") -> DataFrame:
    """Stream-static enrichment join: broadcast the (small) static dimension
    against each micro-batch.  Stateless — safe at any stream volume; the
    explicit broadcast keeps the per-batch plan from ever shuffling the
    stream side."""
    return stream.join(F.broadcast(dim), key, how)

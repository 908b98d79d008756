"""Skew-aware join utilities (EXT).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``) handles
most skew at runtime; explicit salting remains the tool when one hot key
dominates a shuffle so badly that a single task OOMs before AQE can split it
(classic at 100 TB: a null/default key holding 10% of rows).

``salted_join`` replicates the small side ``salt`` times and scatters the
big side uniformly across the replicas, so the hot key's rows land on
``salt`` different tasks.  Results are identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    ``on`` must be equi-key column names present on both sides.  The big
    side gets a uniform pseudo-random salt derived from its whole row hash
    (deterministic — no ``rand()``, so retried tasks re-derive the same
    salt); the small side explodes to all ``salt`` values.  Shuffle volume
    for the small side grows ``salt``×, which is the price of splitting the
    hot key's partition — keep the *small* side small or broadcast instead.
    """
    if not on:
        raise ValueError("salted_join requires at least one key column")

    big_salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_salted = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return big_salted.join(small_salted, on + [_SALT], how).drop(_SALT)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: each left row gets the nearest right row within its
    ``by`` group — ``direction="backward"`` (default) takes the latest
    right with ``right.ts <= left.ts``; ``direction="forward"`` the
    earliest right with ``right.ts >= left.ts`` (NULLs when none).
    ``tolerance`` (seconds for timestamp columns, plain units for
    numerics) nulls the match when the gap exceeds it — the same
    contract as ``pandas.merge_asof``.

    Spark has no ASOF JOIN; the naive range join is O(n·m) per group.  This
    is the scale-safe union trick — one shuffle on (by), one sort, zero
    joins:

      1. tag both sides and union (right carries its payload, left NULLs);
      2. window ``last(payload, ignorenulls)`` ordered by (ts, side) —
         right rows sort before left rows at equal timestamps so a tie
         matches (<= semantics);
      3. keep left rows with the carried payload.

    Equivalent to DuckDB's ``ASOF JOIN`` (the q39 oracle).  Left columns
    must not collide with ``right_cols``.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lt = left.withColumn("__side", F.lit(1)).select(
        *by, F.col(ts_col).alias("__ts"), F.col("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.struct(*left.columns).alias("__lrow"),
    )
    rt = right.withColumn("__side", F.lit(0)).select(
        *by, F.col(ts_col).alias("__ts"), F.col("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
    )
    # the right side additionally carries its own ts so tolerance can
    # measure the matched gap after the carry
    lt = lt.withColumn("__rts", F.lit(None).cast(rt.schema["__ts"].dataType))
    rt = rt.withColumn("__rts", F.col("__ts"))
    unioned = lt.unionByName(rt)
    # forward = backward on reversed time: descending scan makes "last
    # right seen" the SMALLEST right.ts that is >= left.ts; right rows
    # still sort before left rows at equal ts, so ties match either way.
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side", "__lrow", "__ts",
        F.last("__rts", ignorenulls=True).over(w).alias("__mts"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}") for c in right_cols],
    )
    keep = None
    if tolerance is not None:
        lnum = _ts_number(F.col("__ts"), unioned.schema["__ts"].dataType)
        rnum = _ts_number(F.col("__mts"), unioned.schema["__ts"].dataType)
        keep = F.abs(lnum - rnum) <= F.lit(tolerance)
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[
            (
                F.when(keep, F.col(f"__c_{c}")) if keep is not None
                else F.col(f"__c_{c}")
            ).alias(c)
            for c in right_cols
        ],
    )
    return out


def _ts_number(col, dtype):
    """Numeric view of a ts column for tolerance arithmetic: epoch seconds
    for timestamps, the value itself for numerics."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_timestamp(col)
    if isinstance(dtype, DateType):
        return F.unix_date(col) * F.lit(86400)
    return col


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Co-grouped Arrow twin of ``asof_join``: both sides are grouped on
    a HASH BUCKET of ``by`` and each bucket's pair of pandas frames
    meets in ONE ``cogroup().applyInPandas`` call that runs
    ``pandas.merge_asof`` per exact key inside the batch — the
    canonical use of Spark's co-grouped map (two datasets, one shuffle
    each, per-key pandas logic no SQL expresses directly).

    Bucketed, not keyed, cogrouping (r10, guide §4): Spark's
    FlatMapCoGroupsInPandas pays a per-GROUP JVM→Arrow→pandas round
    trip, measured at ~2 ms/group — 1500 fine-grained keys cost ~3 s
    of pure framework overhead on a 100k-row input while the same
    merge inside pandas costs microseconds per key.  Cogrouping on
    ``pmod(xxhash64(by), 4x shuffle partitions)`` bounds the crossing
    count by the cluster's partition knob at ANY key cardinality (the
    100 TB shape: billions of entities, thousands of buckets) and the
    per-key split moves into pandas ``groupby(dropna=False)``, which
    preserves the exact former semantics including null-key groups.

    Same contract and results as ``asof_join`` (equivalence-tested);
    prefer the union-trick form when the logic IS expressible as a
    window — it stays in codegen — and this form when per-key logic
    grows beyond what a window can say (model scoring per entity,
    custom interpolation).  Ordering inside each group is handled by
    merge_asof's required sort.

    Tie contract (both implementations): when the right side has
    DUPLICATE (by, ts) keys, which duplicate's payload wins is
    implementation-defined — dedup the right side on (by, ts) first if
    payloads can differ (the same caveat pandas.merge_asof carries)."""
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    from pyspark.sql.types import (
        DateType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    # fresh StructType: StructType.add mutates in place, and mutating
    # left's CACHED schema object corrupts left's own plan analysis
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(c, right.schema[c].dataType, True) for c in right_cols]
    )
    left_cols = list(left.columns)

    # mirror _ts_number's seconds convention: pandas.merge_asof demands a
    # Timedelta tolerance for datetime64 keys (a bare number raises
    # MergeError), and DateType arrives as object-dtype datetime.date,
    # which merge_asof cannot sort — promote to datetime64 for the merge
    ts_dtype = left.schema[ts_col].dataType
    ts_is_date = isinstance(ts_dtype, DateType)
    ts_is_datetime = ts_is_date or isinstance(
        ts_dtype, (TimestampType, TimestampNTZType)
    )
    tol = (
        pd.Timedelta(seconds=float(tolerance))
        if tolerance is not None and ts_is_datetime
        else tolerance
    )

    def _norm_key(k) -> tuple:
        """Hashable per-key tuple where every null flavor (None/NaN/
        NaT) collapses to one sentinel, so null-keyed left rows meet
        null-keyed right rows exactly as Spark's own groupBy would
        group them."""
        parts = k if isinstance(k, tuple) else (k,)
        return tuple("\x00__null__" if pd.isna(p) else p for p in parts)

    def _merge_per_key(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        """Per-exact-key merge_asof loop — kept for NULL-keyed rows,
        which ``merge_asof(by=...)`` would never match (NaN != NaN)
        while Spark's groupBy (and this operator's contract) groups
        null keys together."""
        rgroups = (
            {_norm_key(k): g.sort_values(ts_col)
             for k, g in rp.groupby(by, dropna=False, sort=False)}
            if len(rp) else {}
        )
        outs = []
        for k, lgrp in lp.groupby(by, dropna=False, sort=False):
            lgrp = lgrp.sort_values(ts_col)
            rgrp = rgroups.get(_norm_key(k))
            if rgrp is None:
                out = lgrp.copy()
                for c in right_cols:
                    out[c] = None
            else:
                out = pd.merge_asof(
                    lgrp,
                    rgrp[[ts_col, *right_cols]],
                    on=ts_col,
                    direction=direction,
                    tolerance=tol,
                    suffixes=("", "__r"),
                )
            outs.append(out[left_cols + right_cols])
        if not outs:
            return pd.DataFrame(columns=left_cols + right_cols)
        return (pd.concat(outs, ignore_index=True) if len(outs) > 1
                else outs[0])

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=left_cols + right_cols)
        lp = lpdf
        # an empty cogroup side can arrive as a ZERO-COLUMN frame;
        # reindex materializes the expected columns on it
        rp = (rpdf[[*by, ts_col, *right_cols]] if len(rpdf)
              else rpdf.reindex(columns=[*by, ts_col, *right_cols]))
        if ts_is_date:
            lp = lp.assign(**{ts_col: pd.to_datetime(lp[ts_col])})
            rp = rp.assign(**{ts_col: pd.to_datetime(rp[ts_col])})
        # ONE vectorized merge_asof per bucket via ``by=`` for the
        # non-null-keyed bulk (r10, guide §4.2): the per-key python
        # loop paid pandas fixed overhead (sort/index/concat) per
        # entity — measured 2.7 s of q241's 3.4 s at 150 entities —
        # while by-merge runs the identical asof algorithm per key
        # inside one call.  Null-keyed rows (rare) keep the loop path,
        # preserving the null-groups-match contract.
        lnull = lp[by].isna().any(axis=1)
        rnull = (rp[by].isna().any(axis=1) if len(rp)
                 else pd.Series([], dtype=bool))
        parts = []
        lbulk = lp[~lnull] if lnull.any() else lp
        rbulk = rp[~rnull] if len(rp) and rnull.any() else rp
        if len(lbulk):
            ls = lbulk.sort_values(ts_col, kind="stable")
            if len(rbulk):
                out = pd.merge_asof(
                    ls,
                    rbulk[[*by, ts_col, *right_cols]]
                    .sort_values(ts_col, kind="stable"),
                    on=ts_col,
                    by=by,
                    direction=direction,
                    tolerance=tol,
                    suffixes=("", "__r"),
                )
            else:
                out = ls.copy()
                for c in right_cols:
                    out[c] = None
            parts.append(out[left_cols + right_cols])
        if lnull.any():
            parts.append(_merge_per_key(
                lp[lnull], rp[rnull] if len(rp) else rp))
        out = (pd.concat(parts, ignore_index=True) if len(parts) > 1
               else parts[0])
        if ts_is_date:
            out = out.assign(**{ts_col: out[ts_col].dt.date})
        return out[left_cols + right_cols]

    # bucket count rides the cluster's shuffle-partition knob (x4 for
    # hash spread, guide §2.5) — never a constant tuned for local mode
    n_buckets = 4 * int(left.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in by]), F.lit(n_buckets)).cast("int")
    # Fresh attribute ids on both sides: when left and right share
    # lineage (e.g. two filters of one frame) their `by` columns carry
    # the SAME exprId; the analyzer dedupes the cogroup's right subtree
    # but a projection above the cogroup then lets ColumnPruning drop
    # the right copy of the key (it looks unreferenced), and the pandas
    # frame arrives without it.  groupBy(by) was immune (grouping
    # attributes are pinned); bucketed grouping demotes the key to a
    # data column, so pin it by re-aliasing instead.
    left = left.select([F.col(c).alias(c) for c in left.columns])
    right = right.select([F.col(c).alias(c) for c in right.columns])
    lb = left.withColumn("__asof_bucket", bucket)
    rb = right.withColumn("__asof_bucket", bucket)
    return (
        lb.groupBy("__asof_bucket")
        .cogroup(rb.groupBy("__asof_bucket"))
        .applyInPandas(
            lambda l, r: merge(l.drop(columns="__asof_bucket"),
                               r.drop(columns="__asof_bucket")),
            out_schema)
    )

"""Frequency-sketch operators: exact-verified heavy hitters at scale.

The reference surface has no frequency analysis (SURVEY.md §2.7 ABSENT), but a
training-data pipeline needs "which values dominate this column" over columns
whose full groupBy would shuffle billions of distinct keys.  The classic
scale answer is Misra-Gries: a bounded-memory per-partition summary whose
candidate set is a guaranteed SUPERSET of every value with frequency
> n/capacity.  We run it as ``mapInPandas`` (one pass, no shuffle), then
exact-count only the surviving candidates with a broadcast semi-join — so the
big shuffle happens on ~capacity keys instead of every distinct key.

Guarantee: for support threshold ``s`` (fraction of rows) and per-partition
capacity ``k >= ceil(1/s)``, every value occurring in more than ``s * n`` rows
appears in some partition summary with a retained count, so the union of
candidates contains all true heavy hitters; the verify pass then removes false
positives.  Result is therefore EXACT — same rows as a full groupBy + HAVING —
while the shuffle touches only candidate keys.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], column: str, capacity: int
) -> Iterator[pd.DataFrame]:
    """Bounded-memory frequency summary of one partition (classic MG update:
    increment if tracked, insert if space, else decrement every counter)."""
    counters: dict[object, int] = {}
    for pdf in batches:
        for v in pdf[column]:
            if v is None:
                continue
            if v in counters:
                counters[v] += 1
            elif len(counters) < capacity:
                counters[v] = 1
            else:
                dead = [k for k in counters if counters[k] == 1]
                for k in counters:
                    counters[k] -= 1
                for k in dead:
                    del counters[k]
    yield pd.DataFrame(
        {"candidate": list(counters.keys()), "retained": list(counters.values())}
    )


def heavy_hitters(
    df: DataFrame, column: str, support: float, capacity: int | None = None
) -> DataFrame:
    """Exact values of ``column`` occurring in > ``support`` fraction of rows.

    One full-scan mapInPandas pass produces <= capacity candidates per
    partition; the exact pass aggregates only rows whose value is in the
    (broadcast) candidate set.  Output: (value, n, share) — identical to
    ``GROUP BY column HAVING count(*) > support * n`` but with a shuffle
    bounded by the candidate count, not the distinct-key count.
    """
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1), got {support}")
    cap = capacity or max(math.ceil(1.0 / support), 8)

    candidates = (
        df.select(column)
        .mapInPandas(
            lambda it: _misra_gries_partition(it, column, cap),
            schema=f"candidate {dict(df.dtypes)[column]}, retained long",
        )
        .select("candidate")
        .distinct()
    )

    total = df.count()
    threshold = support * total
    return (
        df.join(
            F.broadcast(candidates),
            df[column] == candidates["candidate"],
            "left_semi",
        )
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .withColumn("share", F.round(F.col("n") / F.lit(total), 4))
    )

# ---------------------------------------------------------------------------
# Count-min sketch as a DataFrame (mergeable, cross-engine replayable)
# ---------------------------------------------------------------------------

def _cms_bucket(key: Column, row_i: int, width: int, hasher: str) -> Column:
    salted = F.concat(F.lit(str(row_i)), F.lit(":"), key.cast("string"))
    h = md5_long(salted) if hasher == "md5" else F.xxhash64(salted)
    return F.pmod(h, F.lit(width)).cast("int")


def count_min_sketch_table(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    hasher: str = "xxhash64",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Count-min sketch of ``key_col`` as ``(group_cols..., row_i, bucket,
    cnt)`` — ``depth x width`` counters per group.

    Representing the sketch as a tiny DataFrame (instead of an opaque
    binary) makes it MERGEABLE with plain SQL — union two sketches and
    ``SUM(cnt) GROUP BY row_i, bucket`` merges them exactly (counters are
    linear) — and lets DuckDB replay build + point queries bit-for-bit in
    the md5 hasher mode.  The scan emits ``depth`` salted-hash rows per
    input row and partial-aggregates map-side, so the shuffle is bounded
    by ``groups x depth x width`` counters no matter how many distinct
    keys the raw column has — the whole point at 100 TB, where a full
    groupBy on a quasi-unique key shuffles billions of rows but the
    sketch shuffles a few thousand.
    """
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("row_i"),
            _cms_bucket(F.col(key_col), i, width, hasher).alias("bucket"),
        )
        for i in range(depth)
    ])
    exploded = df.select(*group_cols, F.explode(pairs).alias("p")).select(
        *group_cols, F.col("p.row_i").alias("row_i"), F.col("p.bucket").alias("bucket")
    )
    return exploded.groupBy(*group_cols, "row_i", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: adds ``cms_est``.

    Estimate = min over the ``depth`` counters the key hashes into
    (missing counter == 0).  The sketch side is at most ``depth x width``
    rows, so the probe is a broadcast join against the keys frame — no
    shuffle of the key side.  CMS guarantees ``cms_est >= true_count``
    always (counters only ever over-count under collisions).
    """
    probes = keys.select(
        "*",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row_i"),
                _cms_bucket(F.col(key_col), i, width, hasher).alias("bucket"),
            )
            for i in range(depth)
        ])).alias("p"),
    ).select("*", F.col("p.row_i").alias("row_i"), F.col("p.bucket").alias("bucket")).drop("p")
    out_cols = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (register table, cross-engine replayable)
# ---------------------------------------------------------------------------

def hll_register_table(
    df: DataFrame,
    key_col: str,
    *,
    p: int = 8,
    hasher: str = "md5",
) -> DataFrame:
    """HyperLogLog registers as ``(bucket, rho_max)`` — ``2^p`` rows max.

    Unlike the JVM datasketches aggregate (opaque binary, engine-specific),
    this register table is plain data: MERGE two sketches with
    ``GROUP BY bucket -> max(rho_max)``, and any engine with md5 can
    replay the build bit-for-bit.  Bucket = low ``p`` bits of the 60-bit
    md5 fold; rho = leading-zero count + 1 of the remaining 52 bits,
    computed by STRING bit-position (`instr(lpad(bin(rem)))`) so there is
    no float log2 anywhere.  The shuffle is bounded by 2^p registers
    regardless of input cardinality (same argument as the count-min
    build: partial-agg map-side, merge tiny)."""
    if hasher == "md5":
        h = md5_long(F.col(key_col).cast("string"))
    elif hasher == "xxhash64":
        h = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(1 << 60))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    m = 1 << p
    bucket = h.bitwiseAND(F.lit(m - 1))
    rem = F.shiftright(h, p)  # 60-p informative bits
    width = 60 - p
    rho = (
        F.when(rem == 0, F.lit(width + 1))
        .otherwise(F.instr(F.lpad(F.bin(rem), width, "0"), "1"))
        .cast("int")
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(registers: DataFrame, *, p: int = 8) -> DataFrame:
    """One-row ``(estimate)`` from a register table: the standard HLL
    harmonic mean with the small-range linear-counting correction.
    Missing buckets count as rho 0 (2^-0 = 1) via a dense ``range(2^p)``
    left join — deterministic arithmetic, replayed verbatim by oracles."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    spark = registers.sparkSession
    dense = (
        spark.range(m)
        .select(F.col("id").cast("long").alias("bucket"))
        .join(registers, "bucket", "left")
        .select(F.coalesce("rho_max", F.lit(0)).alias("rho"))
    )
    agg = dense.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("z"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
    )
    raw = F.lit(alpha * m * m) / F.col("z")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return agg.select(est.alias("estimate"))


# ---------------------------------------------------------------------------
# Portable Bloom filter (set-bit table, cross-engine replayable)
# ---------------------------------------------------------------------------

def bloom_bits_table(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 4,
    m: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """Bloom filter as ``(bit,)`` — the DISTINCT set bit positions of
    every key under ``k`` salted hashes into ``m`` bits.

    Completes the portable-sketch trio (count-min q197, HLL q206):
    plain-data representation, MERGEABLE by simple UNION DISTINCT, and
    bit-for-bit replayable by any engine with md5 — unlike the opaque
    JVM `bloom_filter_agg` binary.  At most ``m`` rows regardless of
    input cardinality; the membership probe broadcasts them."""
    pos = df.select(
        F.explode(
            F.array(*[
                _cms_bucket(F.col(key_col), i, m, hasher).alias(f"b{i}")
                for i in range(k)
            ])
        ).alias("bit")
    )
    return pos.distinct()


def bloom_contains(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    k: int = 4,
    m: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """Adds ``maybe_present``: TRUE iff all ``k`` of the key's bit
    positions are set (no false negatives ever; false positives at the
    standard (1-e^{-kn/m})^k rate).  Probe = explode k positions,
    broadcast-join the bit table, require every position to have hit
    (``min(hit) == 1``, NOT ``sum == k``: duplicate key rows collapse
    into one group whose sum would be a multiple of k, which would
    break the no-false-negative invariant).  Output is one row per
    DISTINCT key row."""
    probes = keys.select(
        "*",
        F.explode(
            F.array(*[
                _cms_bucket(F.col(key_col), i, m, hasher).alias(f"b{i}")
                for i in range(k)
            ])
        ).alias("bit"),
    )
    out_cols = list(keys.columns)
    return (
        probes.join(
            F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left"
        )
        .groupBy(*out_cols)
        .agg((F.min(F.coalesce("__set", F.lit(0))) == 1).alias("maybe_present"))
    )


def bloom_filter_rows(
    bits: DataFrame,
    df: DataFrame,
    key_col: str,
    *,
    k: int = 4,
    m: int = 4096,
    hasher: str = "md5",
) -> DataFrame:
    """MULTIPLICITY-PRESERVING bloom prefilter — the semi-join-pushdown
    shape: keep every original row of ``df`` whose key might be in the
    filter, drop the rest MAP-SIDE (``k`` broadcast hash joins against
    the <= ``m``-row bit table; no shuffle of ``df``, no groupBy, so
    duplicate fact rows keep their multiplicity — the property the
    probe-verdict API :func:`bloom_contains` deliberately trades away
    by emitting one row per distinct key row).  No false negatives:
    a row survives unless some bit is provably unset."""
    # uniquify helper names against df's schema — a fact table may itself
    # carry __bit0/__hit0 columns, which would make the join ambiguous
    sfx = ""
    while any(f"__{n}{i}{sfx}" in df.columns
              for n in ("bit", "hit") for i in range(k)):
        sfx += "_"
    out = df
    for i in range(k):
        bit_c, hit_c = f"__bit{i}{sfx}", f"__hit{i}{sfx}"
        side = F.broadcast(
            bits.select(F.col("bit").alias(bit_c))
            .withColumn(hit_c, F.lit(1))
        )
        out = out.join(
            side,
            _cms_bucket(F.col(key_col), i, m, hasher) == F.col(bit_c),
            "left",
        ).drop(bit_c)
    keep = None
    for i in range(k):
        cond = F.col(f"__hit{i}{sfx}").isNotNull()
        keep = cond if keep is None else (keep & cond)
    return out.filter(keep).drop(*[f"__hit{i}{sfx}" for i in range(k)])

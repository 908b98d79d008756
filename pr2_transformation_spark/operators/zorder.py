"""Z-order (Morton) clustering for multi-column data skipping (EXT).

Parquet min/max footer pruning only helps on columns the layout is sorted
by; sorting by ``(a, b)`` lexicographically gives perfect pruning on ``a``
and none on ``b``.  Interleaving the bits of both keys (the Morton curve)
and range-partitioning on that single value gives every shard a *bounded
rectangle* in (a, b) space — both columns prune, at the cost of each being
slightly looser than a dedicated sort.

The z-value is a pure JVM-side bit expression (shiftright/and/shiftleft
chain — whole-stage-codegen-able, no UDF), so computing it over 100 TB is
scan-speed; the layout write is one range shuffle via
``Catalog.write_sorted_shards`` on the z column.

Standard technique (e.g. Delta Lake OPTIMIZE ZORDER BY, Databricks docs;
Morton 1966).  Columns must be non-negative integers that fit in ``bits``
bits — map/quantize first if not (``quantize`` below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "quantize", "zorder_frame"]


def z_value(x: Column, y: Column, bits: int = 21) -> Column:
    """Morton-interleave two non-negative integer columns (x gets the even
    bit positions, y the odd).  ``bits`` ≤ 31 per column keeps the result
    in a signed 64-bit long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xl = x.cast("long")
    yl = y.cast("long")
    # NB: Python's `|` on Columns is logical OR — bitwiseOR is required.
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(1), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(yl, i).bitwiseAND(1), 2 * i + 1))
    return z


def quantize(col: Column, lo: float, hi: float, bits: int = 21) -> Column:
    """Map a numeric column into [0, 2^bits) rank space for z-valuing.
    Linear quantization against known bounds — for skewed columns compute
    percentile bounds first so buckets carry comparable row counts."""
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - lo) / (hi - lo)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * cells).cast("long")


def zorder_frame(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 21,
    z_col: str = "_z",
) -> DataFrame:
    """Attach the z-value column; pair with
    ``Catalog.write_sorted_shards(df, table, [z_col], n)`` to lay the data
    out along the curve."""
    return df.withColumn(z_col, z_value(F.col(x_col), F.col(y_col), bits))

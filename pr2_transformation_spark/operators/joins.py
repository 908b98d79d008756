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

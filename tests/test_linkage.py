"""Jaro-Winkler record linkage (functions/linkage.py): canonical values,
DuckDB parity, and the blocked distinct-pair builder."""

import random
import string

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pr2_transformation_spark.functions import linkage


def test_canonical_values():
    assert linkage.jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111
    )
    assert linkage.jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.84)
    assert linkage.jaro_winkler_py("abc", "abc") == 1.0
    assert linkage.jaro_winkler_py("abc", "xyz") == 0.0
    assert linkage.jaro_winkler_py("", "") == 0.0  # DuckDB's convention
    assert linkage.jaro_winkler_py("a", "") == 0.0


def test_duckdb_parity_random_pairs():
    """The whole point of the implementation: bit-identical agreement
    with DuckDB's jaro_winkler_similarity, so linkage queries can be
    oracle-graded.  2000 random pairs incl. empties and repeats."""
    con = duckdb.connect()
    rng = random.Random(42)
    for _ in range(2000):
        a = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 12)))
        b = "".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(0, 12)))
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert linkage.jaro_winkler_py(a, b) == pytest.approx(d, abs=1e-12), (a, b)


def test_blocked_pairs_distinct_and_thresholded(spark):
    df = spark.createDataFrame(
        [
            Row(name="small ring", block="ring"),
            Row(name="small ring", block="ring"),  # duplicate row collapses
            Row(name="smell ring", block="ring"),
            Row(name="large bolt", block="bolt"),
            Row(name="other ring", block="ring"),
        ]
    )
    out = linkage.blocked_name_pairs(
        df, "name", F.col("block"), min_similarity=0.8
    ).collect()
    pairs = {(r["name_a"], r["name_b"]): r["jw"] for r in out}
    # the near-identical pair survives; cross-block pairs never formed
    assert ("small ring", "smell ring") in pairs
    assert pairs[("small ring", "smell ring")] >= 0.8
    assert all(a != "large bolt" and b != "large bolt" for a, b in pairs)
    # duplicates collapsed: no self-pairs, each pair once
    assert len(pairs) == len(out)

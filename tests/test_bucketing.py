"""Bucketed co-located join (Catalog.write_bucketed): the zero-Exchange
plan property q362 relies on, plus value equivalence vs a plain join."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from pr2_transformation_spark.sources.catalog import Catalog


def _formatted_plan(df) -> str:
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        df.explain("formatted")
    return out.getvalue()


@pytest.fixture()
def bucketed_pair(spark):
    cat = Catalog(spark)
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    right = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
    )
    cat.write_bucketed(left, "tb_left", ["k"], 4, ["k"])
    cat.write_bucketed(right, "tb_right", ["k"], 4, ["k"])
    yield spark.table("tb_left"), spark.table("tb_right")
    spark.sql("DROP TABLE IF EXISTS tb_left")
    spark.sql("DROP TABLE IF EXISTS tb_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    j = lt.hint("merge").join(rt, "k")
    plan = _formatted_plan(j)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # contrast: the same join off raw DataFrames must shuffle
    raw = (
        spark.range(0, 5000).select(F.col("id").alias("k"))
        .hint("merge")
        .join(spark.range(0, 800).select(F.col("id").alias("k")), "k")
    )
    assert "Exchange" in _formatted_plan(raw)


def test_bucketed_agg_rides_bucket_distribution(bucketed_pair):
    lt, _ = bucketed_pair
    agg = lt.groupBy("k").agg(F.sum("v").alias("s"))
    assert "Exchange" not in _formatted_plan(agg)


def test_bucketed_join_values_match_plain_join(spark, bucketed_pair):
    lt, rt = bucketed_pair
    got = sorted(
        tuple(r) for r in
        lt.hint("merge").join(rt, "k").select("k", "v", "grp").collect()
    )
    exp = sorted(
        (k, k % 97, k % 7) for k in range(800)
    )
    assert got == exp


def test_one_file_per_bucket(spark, bucketed_pair):
    """repartition-before-write must leave exactly num_buckets files —
    the precondition for sort-elision and stable bucket scans."""
    import glob
    import os
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED tb_left")
        .where("col_name = 'Location'").collect()[0]["data_type"]
    )
    path = loc.replace("file:", "")
    files = [f for f in glob.glob(os.path.join(path, "*.parquet"))
             if os.path.basename(f).startswith("part-")]
    assert len(files) == 4

"""merge_table_versions tests (FIXTURES.md F4), incl. the N>=3 chain note."""

import pytest

from pr2_transformation_spark.operators.merge import compose_merge, merge_versions_df


@pytest.fixture(scope="module")
def v1(spark):
    cols = ["Connect_ID", "d_100000001", "D_100000002", "d_200000001", "token"]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(
        [
            ("900000001", "a1", "b1", "u1", "tok"),
            ("900000002", None, "b2", "u2", "tok"),
            ("900000003", "a3", None, "u3", "tok"),  # only in v1
        ],
        schema,
    )


@pytest.fixture(scope="module")
def v2(spark):
    cols = ["Connect_ID", "d_100000001", "d_100000002", "d_300000001", "d_100000003_v2"]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame(
        [
            ("900000001", "A1", "B1", "w1", "x1"),
            ("900000002", "A2", None, "w2", "x2"),
            ("900000004", "A4", "B4", "w4", "x4"),  # only in v2
        ],
        schema,
    )


def test_merge_output_columns(v1, v2):
    out = merge_versions_df([v1, v2])
    # Common (case-insensitive) sorted first, then v1 uniques, then v2's.
    assert out.columns == [
        "Connect_ID", "d_100000001", "d_100000002",
        "d_200000001", "d_100000003_v2", "d_300000001",
    ]
    # forbidden 'token' never survives
    assert "token" not in out.columns


def test_merge_coalesce_order_and_full_outer(v1, v2):
    rows = {r["Connect_ID"]: r for r in merge_versions_df([v1, v2]).collect()}
    assert set(rows) == {"900000001", "900000002", "900000003", "900000004"}
    # v1 listed first -> its value wins the coalesce when non-null.
    assert rows["900000001"]["d_100000001"] == "a1"
    # v1 NULL -> falls through to v2.
    assert rows["900000002"]["d_100000001"] == "A2"
    # v1-only participant keeps v1 values, v2 uniques NULL.
    assert rows["900000003"]["d_100000001"] == "a3"
    assert rows["900000003"]["d_300000001"] is None
    # v2-only participant appears via full outer.
    assert rows["900000004"]["d_100000001"] == "A4"
    assert rows["900000004"]["d_200000001"] is None
    # Case-insensitive common column D_100000002/d_100000002 coalesced.
    assert rows["900000001"]["d_100000002"] == "b1"
    assert rows["900000002"]["d_100000002"] == "b2"


def test_merge_requires_two_sources(v1):
    with pytest.raises(ValueError):
        compose_merge([v1])


def test_merge_three_way_star_chain(spark, v1, v2):
    """N>=3 semantics: the chain anchors every join on the *base* (last)
    table's key, so participants absent from the base but present in two
    earlier versions do NOT align with each other
    (/root/reference/core/transformations.py:126-136; SURVEY.md §2.6)."""
    v3 = spark.createDataFrame(
        [("900000001", "z1", "c1")],
        "`Connect_ID` string, `d_100000001` string, `d_400000001` string",
    )
    out = merge_versions_df([v1, v2, v3])
    keys = [r["Connect_ID"] for r in out.collect()]
    # 900000001 is in the base (v3): everything aligns on one row.
    assert keys.count("900000001") == 1
    # 900000002 is missing from the base: v1's and v2's rows each joined the
    # base key NULL-side, so they stay on *separate* output rows whose
    # Connect_ID (base-first coalesce? no - v1 first) is still the key from
    # the earlier version... the observable effect: two rows with that key.
    assert keys.count("900000002") == 2
    assert keys.count("900000003") == 1
    assert keys.count("900000004") == 1

"""Plan- and data-level tests for clean_columns (FIXTURES.md F1/F2).

The column-name scenarios re-home the reference's stale SQL-regex tests
(/root/reference/test/test_query_composition.py:37-85,142-243) as
output-column assertions on the composed projection.
"""

import pytest

from pr2_transformation_spark.operators.clean_columns import (
    clean_columns_df,
    compose_clean_columns,
)


@pytest.fixture(autouse=True)
def _spark(spark):
    # Column construction needs an active SparkContext in pyspark 4.
    yield


def outputs(columns, table_identifier=""):
    return [c.out_name for c in compose_clean_columns(columns, table_identifier)]


# --- the 7 loop-variable scenarios -------------------------------------------

def test_simple_loop_rename():
    assert outputs(["Connect_ID", "d_123456789_1_1"]) == ["Connect_ID", "d_123456789_1"]


def test_loop_coalesce_group():
    out = compose_clean_columns(["d_123456789_2_2", "d_123456789_2_2_2_2"])
    assert [c.out_name for c in out] == ["d_123456789_2"]
    assert "COALESCE" in out[0].sql


def test_version_loop_rename():
    assert outputs(["d_123456789_v2_1_1"]) == ["d_123456789_1_v2"]


def test_multi_cid_loop():
    assert outputs(["d_123456789_3_3_d_987654321_3_3"]) == ["d_123456789_d_987654321_3"]


def test_nonloop_passthrough():
    assert outputs(["d_987654321"]) == ["d_987654321"]


def test_mixed_loop_and_nonloop():
    got = outputs(["Connect_ID", "d_123456789_1_1", "d_987654321"])
    assert got == ["Connect_ID", "d_123456789_1", "d_987654321"]


def test_version_matrix():
    cols = [
        "d_123456789_5_5", "d_123456789_5_5_5_5",
        "d_123456789_v2_5_5", "d_123456789_v2_5_5_5_5",
        "d_123456789_v3_5_5", "d_123456789_v3_5_5_5_5",
        "d_987654321_5_5", "d_987654321_5_5_5_5",
    ]
    got = outputs(cols)
    assert sorted(got) == sorted([
        "d_123456789_5", "d_123456789_5_v2", "d_123456789_5_v3", "d_987654321_5",
    ])


def test_version_in_middle_pinned():
    # Pinned by /root/reference/test/test_query_composition.py:242-243.
    assert outputs(["d_899251483_v2_d_812107266_6_6"]) == ["d_899251483_d_812107266_6_v2"]


def test_uppercase_version_nonloop():
    assert outputs(["D_191057574_V2"]) == ["d_191057574_v2"]


# --- substring excision (F2) --------------------------------------------------

def test_substring_excision_rename():
    assert outputs(["state_d_706256705"]) == ["d_706256705"]
    assert outputs(["d_684926335_num"]) == ["d_684926335"]


def test_substring_collision_coalesce_priority():
    out = compose_clean_columns(["state_d_684926335_num", "d_684926335_num"])
    assert [c.out_name for c in out] == ["d_684926335"]
    # Fewest excised substrings first: d_684926335_num before state_..._num.
    assert out[0].sql == "COALESCE(`d_684926335_num`, `state_d_684926335_num`) AS `d_684926335`"


def test_impure_names_dropped():
    got = outputs([
        "Connect_ID",
        "D_907590067_4_4_SIBCANC3O_D_650332509_4",  # impure -> dropped
        "d_123456789_1_1",
    ])
    assert got == ["Connect_ID", "d_123456789_1"]


def test_substring_pass_does_not_swallow_loop_vars():
    # Guard against the reference's sweep-all quirk: the presence of a
    # state_ column must not disable loop coalescing.
    got = outputs(["state_d_706256705", "d_123456789_2_2", "d_123456789_2_2_2_2"])
    assert got == ["d_706256705", "d_123456789_2"]


# --- one-off renames ----------------------------------------------------------

def test_one_off_rename_applied():
    got = outputs(
        ["Connect_ID", "D_122887481_TUBLIG_D_232595513"],
        table_identifier="FlatConnect.module1_v1_JP",
    )
    assert got == ["Connect_ID", "d_122887481_d_623218391"]


def test_one_off_shared_target_coalesce():
    # Two sources mapping to one target -> COALESCE group.
    out = compose_clean_columns(
        ["D_122887481_TUBLIG_D_232595513", "D_122887481_D_206625031"],
        table_identifier="FlatConnect.module1_v1_JP",
    )
    assert [c.out_name for c in out] == ["d_122887481_d_623218391"]
    assert "COALESCE" in out[0].sql


# --- custom transforms --------------------------------------------------------

def test_custom_transform_targets_present():
    got = outputs(
        ["Connect_ID", "D_317093647"],
        table_identifier="FlatConnect.module1_v2_JP",
    )
    assert got == [
        "Connect_ID",
        "D_317093647_D_623218391",
        "D_317093647_D_802622485",
        "d_317093647",  # source still flows through loop/non-loop pass
    ]


# --- data-level golden run ----------------------------------------------------

def test_clean_columns_data(spark):
    cols = [
        "Connect_ID", "d_123456789_2_2", "d_123456789_2_2_2_2",
        "state_d_706256705", "d_987654321",
    ]
    schema = ", ".join(f"`{c}` string" for c in cols)
    df = spark.createDataFrame(
        [
            ("900000001", "111111111", None, "x", "a"),
            ("900000002", None, "222222222", "y", "b"),
            ("900000003", None, None, None, None),
        ],
        schema,
    )
    out = clean_columns_df(df)
    assert out.columns == ["Connect_ID", "d_706256705", "d_123456789_2", "d_987654321"]
    rows = {r["Connect_ID"]: r for r in out.collect()}
    assert rows["900000001"]["d_123456789_2"] == "111111111"
    assert rows["900000002"]["d_123456789_2"] == "222222222"  # coalesce fallback
    assert rows["900000003"]["d_123456789_2"] is None
    assert rows["900000001"]["d_706256705"] == "x"


def test_duplicate_guard():
    # Same canonical target from two paths that the processed-set threading
    # must dedupe rather than error: a one-off target colliding with an
    # existing column -> later builder skips it.
    got = outputs(
        ["D_150352141_D_206625031", "d_150352141_d_623218391"],
        table_identifier="FlatConnect.module1_v1_JP",
    )
    assert got == ["d_150352141_d_623218391"]


def test_custom_transform_age_year_values(spark):
    df = spark.createDataFrame(
        [("55",), ("125",), ("126",), ("1987",), ("abc",), (None,)],
        "`D_317093647` string",
    )
    out = clean_columns_df(df, table_identifier="FlatConnect.module1_v2_JP")
    vals = [
        (r["D_317093647_D_623218391"], r["D_317093647_D_802622485"], r["d_317093647"])
        for r in out.collect()
    ]
    assert (55, None, "55") in vals
    assert (125, None, "125") in vals
    assert (None, None, "126") in vals   # age out of range
    assert (None, 1987, "1987") in vals  # 4 digits -> year only
    assert (None, None, "abc") in vals
    assert (None, None, None) in vals

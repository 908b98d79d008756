"""Data-level golden tests for profiling + clean_rows (FIXTURES.md F3)."""

import pytest
from pyspark.sql import Row

from pr2_transformation_spark import profiling
from pr2_transformation_spark.operators.clean_rows import clean_rows_df, compose_clean_rows


@pytest.fixture(scope="module")
def survey_values(spark):
    # Columns per FIXTURES.md F3; rows exercise every value-domain branch.
    rows = [
        #  Connect_ID, binary,  bin2, notbin, allnull, fa,            fa_loop,        fa2,            notfa,         age_year
        Row("900000001", "0",  "0",  "0",    None, "[]",           "[178420302]", "[]",           "[]",          "55"),
        Row("900000002", "1",  "1",  "1",    None, "[178420302]",  "[]",          "[123456789]",  "[12]",        "125"),
        Row("900000003", "",   "0",  "2",    None, "[958239616]",  None,          "[123456789]",  "garbage",     "1987"),
        Row("900000004", None, "1",  None,   None, None,           "[178420302]", None,           "[123456789]", "126"),
        Row("900000005", "1",  "0",  "1",    None, "[]",           "[]",          "[123456789]",  "[]",          "abc"),
        Row("900000006", "0",  "1",  "0",    None, "[178420302]",  None,          "[]",           "[12]",        None),
    ]
    cols = [
        "Connect_ID", "d_820476880", "d_617885715", "d_903487909", "d_999999999",
        "d_578895128_d_578895128", "d_578895128_d_578895128_19",
        "d_236590500_d_236590500", "d_444444444", "d_317093647",
    ]
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame([tuple(r) for r in rows], schema)


def test_binary_detection(survey_values):
    # all-NULL column counts as binary (reference COUNTIF semantics);
    # "2"-containing column does not; Connect_ID (digit strings) does not.
    assert profiling.binary_columns(survey_values) == [
        "d_820476880", "d_617885715", "d_999999999"
    ]


def test_false_array_reference_detection(survey_values):
    cols = survey_values.schema.names
    assert profiling.false_array_columns_from_reference(cols) == [
        "d_578895128_d_578895128",
        "d_578895128_d_578895128_19",
        "d_236590500_d_236590500",
    ]


def test_false_array_strict_detection(survey_values):
    found = profiling.strict_false_array_columns(survey_values, use_reference=False)
    # d_578895128_d_578895128 carries TWO distinct bracketed CIDs -> fails
    # check 3 (<=1 distinct bracketed value); d_236590500_d_236590500 holds
    # "[123456789]" (outside the allowed value set) -> fails check 2;
    # d_444444444 has junk values -> fails; d_999999999 is all NULL -> fails
    # check 1 (needs >=1 non-null).
    assert found == ["d_578895128_d_578895128_19"]


def test_clean_rows_golden(survey_values):
    out = clean_rows_df(survey_values)
    # Output order: sorted binary, sorted false arrays, sorted pass-through.
    assert out.columns == [
        "d_617885715", "d_820476880", "d_999999999",
        "d_236590500_d_236590500", "d_578895128_d_578895128", "d_578895128_d_578895128_19",
        "Connect_ID", "d_317093647", "d_444444444", "d_903487909",
    ]
    rows = {r["Connect_ID"]: r for r in out.collect()}

    # Binary recode: "1"->Yes CID, "0"->No CID, ""/NULL/other -> NULL.
    assert rows["900000001"]["d_820476880"] == "104430631"
    assert rows["900000002"]["d_820476880"] == "353358909"
    assert rows["900000003"]["d_820476880"] is None
    assert rows["900000004"]["d_820476880"] is None
    assert all(r["d_999999999"] is None for r in rows.values())

    # Unwrap: "[]"->NULL, "[9digits]"->digits, NULL->NULL, else default NULL.
    assert rows["900000001"]["d_578895128_d_578895128"] is None
    assert rows["900000002"]["d_578895128_d_578895128"] == "178420302"
    assert rows["900000003"]["d_578895128_d_578895128"] == "958239616"
    assert rows["900000004"]["d_578895128_d_578895128"] is None
    assert rows["900000002"]["d_236590500_d_236590500"] == "123456789"

    # Non-detected columns pass through untouched.
    assert rows["900000002"]["d_444444444"] == "[12]"
    assert rows["900000003"]["d_444444444"] == "garbage"
    assert rows["900000003"]["d_903487909"] == "2"


def test_clean_rows_duplicate_guard(survey_values):
    clauses = compose_clean_rows(survey_values)
    outs = [c.out_name for c in clauses]
    assert len(outs) == len(set(outs))


def test_data_contract_detects_violations(spark):
    from pr2_transformation_spark.profiling import data_contract
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, 3.0), (None, 4.0)],
        "id long, v double",
    )
    out = {
        r["check"]: (r["observed"], r["passed"])
        for r in data_contract(
            df,
            [
                {"name": "id_not_null", "kind": "not_null", "column": "id"},
                {"name": "id_unique", "kind": "unique", "column": "id"},
                {"name": "v_positive", "kind": "predicate", "expr": "v > 0"},
                {"name": "enough", "kind": "min_rows", "threshold": 10},
            ],
        ).collect()
    }
    assert out["id_not_null"] == (1, False)
    assert out["id_unique"] == (1, False)  # id=2 twice; NULL not counted
    assert out["v_positive"] == (1, False)
    assert out["enough"] == (4, False)


def test_data_contract_all_green_and_unknown_kind(spark):
    from pr2_transformation_spark.profiling import data_contract
    import pytest

    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = data_contract(
        df,
        [
            {"name": "nn", "kind": "not_null", "column": "id"},
            {"name": "u", "kind": "unique", "column": "id"},
            {"name": "n", "kind": "min_rows", "threshold": 2},
        ],
    ).collect()
    assert all(r["passed"] for r in out)
    with pytest.raises(ValueError, match="unknown check kind"):
        data_contract(df, [{"name": "x", "kind": "nope"}])


def test_false_array_reference_ships_all_75_pairs():
    """The full reference list (reference/false_array_columns.json
    declares total_unique_pairs: 75) ships with the package — a
    truncated seed list would silently miss false-array columns in
    reference mode."""
    from pr2_transformation_spark.config import load_false_array_reference

    pairs = load_false_array_reference()
    assert len(pairs) == 75
    assert len({tuple(p) for p in pairs}) == 75
    assert ["236590500", "236590500"] in pairs      # first seed pair
    assert all(len(p) == 2 and all(len(c) == 9 and c.isdigit() for c in p)
               for p in pairs)
    # reference-mode detection matches pairs beyond the old 10-pair seed
    import pr2_transformation_spark.profiling as profiling
    a, b = pairs[-1]
    cols = [f"d_{a}_d_{b}", f"d_{a}_d_{b}_1_1", "d_111111111"]
    got = profiling.false_array_columns_from_reference(cols)
    assert f"d_{a}_d_{b}" in got and f"d_{a}_d_{b}_1_1" in got

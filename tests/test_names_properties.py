"""Property-based tests (hypothesis) over the pure name grammar — the
data-level robustness layer the reference's test suite lacks (SURVEY.md
§5.2).  All functions are driver-side pure Python; no Spark needed."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pr2_transformation_spark import config, names

# name-shaped identifiers: tokens of d/D, digits, version tags, words
_token = st.one_of(
    st.just("d"),
    st.just("D"),
    st.integers(min_value=0, max_value=999_999_999).map(str),
    st.integers(min_value=1, max_value=30).map(lambda v: f"v{v}"),
    st.sampled_from(["num", "state", "provided", "blob", "x"]),
)
name_st = st.lists(_token, min_size=1, max_size=6).map("_".join)
any_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_"),
    min_size=0,
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(name_st)
def test_standardize_case_idempotent(name):
    once = names.standardize_column_case(name)
    assert names.standardize_column_case(once) == once
    # Connect_ID is the only mixed-case survivor
    if once != "Connect_ID":
        assert once == once.lower()


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_extract_concept_ids_are_9_digits(name):
    for cid in names.extract_concept_ids(name):
        assert re.fullmatch(r"\d{9}", cid)


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_excise_version_removes_all_version_tags(name):
    excised = names.excise_version(name)
    assert names.extract_version_suffix(excised) == ""
    # idempotent
    assert names.excise_version(excised) == excised


@settings(max_examples=300, deadline=None)
@given(name_st)
def test_excise_substrings_never_lengthens(name):
    out = names.excise_substrings(name, config.SUBSTRINGS_TO_FIX)
    assert len(out) <= len(name)
    for s in config.SUBSTRINGS_TO_FIX:
        assert s not in out or s in ("_num",) and "_num" in out and "_num" not in name


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_loop_number_none_or_nonnegative(name):
    n = names.extract_loop_number(name)
    assert n is None or (isinstance(n, int) and n >= 0)


@settings(max_examples=200, deadline=None)
@given(st.lists(name_st, min_size=0, max_size=12))
def test_group_loop_variables_partitions_input(varnames):
    pure = [v for v in varnames if names.is_pure_variable(v)]
    groups = names.group_loop_variables(pure)
    members = [m for ms in groups.values() for m in ms]
    # every member came from the input and appears at most once per group set
    assert set(members) <= set(pure)
    for (cids, loop, version), ms in groups.items():
        for m in ms:
            assert frozenset(names.extract_concept_ids(names.excise_version(m))) == cids


@settings(max_examples=200, deadline=None)
@given(st.lists(name_st.filter(lambda n: "connect" not in n.lower()), min_size=0, max_size=15))
def test_compose_clean_columns_outputs_unique(varnames):
    """The composed projection never emits duplicate output names, for any
    input schema (the duplicate guard would raise otherwise)."""
    from pr2_transformation_spark.operators.clean_columns import compose_clean_columns

    unique_inputs = list(dict.fromkeys(varnames))
    clauses = compose_clean_columns(unique_inputs, "", "")
    outs = [c.out_name.lower() for c in clauses]
    assert len(outs) == len(set(outs))

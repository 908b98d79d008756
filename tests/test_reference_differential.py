"""Differential parity harness against the ACTUAL reference planner.

The reference's query planners are pure Python once the BigQuery/storage
clients are stubbed — its own tests do exactly this
(/root/reference/test/test_query_composition.py:92-120).  This module
imports /root/reference/core/{utils,constants,transformations} with
``google.cloud`` replaced by inert stand-ins, then:

* property-tests every pure name-grammar function against this repo's
  ``names.py`` twin on randomized CID-grammar inputs;
* asserts the ported constant tables (substrings, token lists, rename maps)
  are byte-identical;
* runs the reference's ``process_columns`` on randomized schemas, parses
  the SELECT list out of its captured SQL, and compares clause-by-clause
  with ``compose_clean_columns`` — exact equality on substring-free
  schemas, plus an explicit golden capture of deviation #1 (the
  reference's substring pass sweeps ALL unprocessed columns whenever any
  column contains an excisable substring,
  /root/reference/core/transformations.py:322-338; this repo's pass claims
  only substring-bearing columns and their excised-name collisions,
  operators/clean_columns.py:18-31);
* does the same for the OTHER three endpoints: ``merge_table_versions``
  (clause list + FULL OUTER chain shape vs ``compose_merge``, with the
  reference's REAL column-exclusion logic running), ``process_rows``
  (kind/name/order vs ``compose_recoding``, expression text being
  dialect-specific by design, plus deviation #2: binary∧false-array
  overlap — reference raises, this repo resolves binary-first), and
  ``create_sensitive_tier`` (hard-coded projection verbatim, plus
  deviation #3: the reference's CONNECT_ID case quirk).

Only the merge test needs a Spark session (schemas ride empty frames);
everything else is driver-side schema->clauses.
"""

from __future__ import annotations

import random
import re
import sys
import types

import pytest

from pr2_transformation_spark import config, names
from pr2_transformation_spark.operators.clean_columns import compose_clean_columns

REF_ROOT = "/root/reference"


def _install_google_stubs() -> None:
    """Provide just enough of ``google.cloud`` for the reference modules to
    import: a bigquery.Client whose ``query`` returns a completed job, and a
    no-op storage.Client."""
    if "google.cloud.bigquery" in sys.modules:
        return

    class _Job:
        job_id = "stub-job"

        def result(self):
            return None

    class _BQClient:
        def __init__(self, *a, **k):
            pass

        def query(self, sql):
            return _Job()

    class _GCSClient:
        def __init__(self, *a, **k):
            pass

    google = types.ModuleType("google")
    cloud = types.ModuleType("google.cloud")
    bigquery = types.ModuleType("google.cloud.bigquery")
    storage = types.ModuleType("google.cloud.storage")
    bigquery.Client = _BQClient
    storage.Client = _GCSClient
    cloud.bigquery = bigquery
    cloud.storage = storage
    google.cloud = cloud
    sys.modules.update(
        {
            "google": google,
            "google.cloud": cloud,
            "google.cloud.bigquery": bigquery,
            "google.cloud.storage": storage,
        }
    )


@pytest.fixture(scope="module")
def ref():
    _install_google_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import core.constants as ref_constants
    import core.transformations as ref_transformations
    import core.utils as ref_utils

    return types.SimpleNamespace(
        constants=ref_constants, utils=ref_utils, transformations=ref_transformations
    )


# ---------------------------------------------------------------------------
# Randomized CID-grammar name generator
# ---------------------------------------------------------------------------

_IMPURE_TOKENS = ["SIBCANC3O", "sha", "uid", "entity", "provided", "siteAcronym"]


def _rand_cid(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789") for _ in range(9))


def _rand_name(rng: random.Random, allow_substrings: bool, pool: list[str] | None = None) -> str:
    """One random column name spanning the grammar: 1-3 CIDs, optional
    version tag (inner or trailing), optional loop suffix, occasional
    impure tokens / special names / excisable substrings.  ``pool`` is a
    per-schema CID pool — reusing CIDs across names is what produces
    groupable loop variables (same CID set + loop -> COALESCE) and collision
    paths, so names draw from it 60% of the time."""
    roll = rng.random()
    if roll < 0.05:
        return rng.choice(["Connect_ID", "token", "uid", "date"])

    def pick_cid() -> str:
        if pool and rng.random() < 0.6:
            return rng.choice(pool)
        cid = _rand_cid(rng)
        if pool is not None:
            pool.append(cid)
        return cid

    parts = [rng.choice(["D", "d"]) + "_" + pick_cid() for _ in range(rng.choice([1, 1, 1, 2, 3]))]
    name = "_".join(parts)
    if rng.random() < 0.15:  # impure token injected mid-name
        name += "_" + rng.choice(_IMPURE_TOKENS)
    if rng.random() < 0.35:  # version tag, inner or trailing
        v = f"_v{rng.randint(1, 4)}" if rng.random() < 0.7 else f"_V{rng.randint(1, 4)}"
        if rng.random() < 0.5:
            head, _, tail = name.partition("_" + parts[-1].split("_", 1)[1]) if len(parts) > 1 else (name, "", "")
            name = (head + v + tail) if tail else name + v
        else:
            name += v
    if rng.random() < 0.45:  # loop suffix _N_N
        n = rng.randint(1, 12)
        name += f"_{n}_{n}"
    if allow_substrings and rng.random() < 0.3:
        name = rng.choice(["state_" + name, name + "_num"])
    return name


def _rand_schema(rng: random.Random, allow_substrings: bool, n: int | None = None) -> list[str]:
    size = n or rng.randint(3, 18)
    cols, seen = [], set()
    pool: list[str] = [_rand_cid(rng) for _ in range(rng.randint(1, 4))]
    if rng.random() < 0.7:
        cols.append("Connect_ID")
        seen.add("connect_id")
    while len(cols) < size:
        c = _rand_name(rng, allow_substrings, pool)
        if c.lower() not in seen:  # BigQuery schemas are case-insensitively unique
            cols.append(c)
            seen.add(c.lower())
    rng.shuffle(cols)
    return cols


# ---------------------------------------------------------------------------
# Constant-table parity
# ---------------------------------------------------------------------------


def test_constant_tables_match_reference(ref):
    rc = ref.constants
    assert list(rc.SUBSTRINGS_TO_FIX) == list(config.SUBSTRINGS_TO_FIX)
    assert list(rc.ALLOWED_NON_CID_VARIABLE_NAMES) == list(config.ALLOWED_NON_CID_VARIABLE_NAMES)
    assert list(rc.FORBIDDEN_NON_CID_VARIABLE_NAMES) == list(config.FORBIDDEN_NON_CID_VARIABLE_NAMES)
    assert list(rc.ALLOWED_NON_CID_SUBSTRINGS) == list(config.ALLOWED_NON_CID_SUBSTRINGS)
    # reference entries carry a free-text 'description'; the functional
    # fields (source, target) must match exactly, per table, in order
    assert set(rc.ONE_OFF_COLUMN_RENAME_MAPPINGS) == set(config.ONE_OFF_COLUMN_RENAME_MAPPINGS)
    for table, ms in rc.ONE_OFF_COLUMN_RENAME_MAPPINGS.items():
        assert [(m["source"], m["target"]) for m in ms] == [
            (m["source"], m["target"]) for m in config.ONE_OFF_COLUMN_RENAME_MAPPINGS[table]
        ]
    # custom transforms: same tables, same (source, target) pairs (the
    # rendered SQL is dialect-specific by design)
    assert set(rc.CUSTOM_TRANSFORMS) == set(config.CUSTOM_TRANSFORMS)
    for table, specs in rc.CUSTOM_TRANSFORMS.items():
        ref_pairs = [(s["source"], s["target"]) for s in specs]
        our_pairs = [(s["source"], s["target"]) for s in config.CUSTOM_TRANSFORMS[table]]
        assert ref_pairs == our_pairs


# ---------------------------------------------------------------------------
# Pure name-grammar functions, differentially
# ---------------------------------------------------------------------------


def test_name_grammar_functions_match_reference(ref):
    rng = random.Random(314159)
    samples = [_rand_name(rng, allow_substrings=True) for _ in range(600)]
    samples += [
        "", "D", "d_", "_1_1", "D_12345", "d_1234567890", "state__num",
        "D_812370563_1_1_D_812370563_1_1_D_665036297",
        "D_907590067_4_4_SIBCANC3O_D_650332509_4",
        "d_123456789_v2_5_5", "D_191057574_V2", "D_715581797_V3_1_1",
        "D_899251483_V2_D_452438775", "Connect_ID", "token", "num_state",
        "d_123456789_11_11", "d_123456789_1_2", "d_123456789_v2_5_5_5_5",
    ]
    for s in samples:
        assert ref.utils.is_pure_variable(s) == names.is_pure_variable(s), s
        assert ref.utils.extract_version_suffix(s) == names.extract_version_suffix(s), s
        assert ref.utils.excise_version_from_column_name(s) == names.excise_version(s), s
        assert ref.utils.extract_loop_number(s) == names.extract_loop_number(s), s
        assert ref.utils.extract_ordered_concept_ids(s) == names.extract_concept_ids(s), s
        assert ref.utils.excise_substrings(s, ref.constants.SUBSTRINGS_TO_FIX) == \
            names.excise_substrings(s, config.SUBSTRINGS_TO_FIX), s
        assert ref.utils.standardize_column_case(s) == names.standardize_column_case(s), s


def test_grouping_and_validation_match_reference(ref):
    rng = random.Random(271828)
    for _ in range(80):
        cols = _rand_schema(rng, allow_substrings=False)
        ref_groups = ref.utils.group_vars_by_cid_and_loop_num(cols)
        our_groups = names.group_loop_variables(cols)
        assert ref_groups == our_groups, cols
        assert ref.utils.find_non_standard_concept_ids(cols) == \
            names.find_non_standard_concept_ids(cols), cols


# ---------------------------------------------------------------------------
# Planner differential: process_columns vs compose_clean_columns
# ---------------------------------------------------------------------------


def _reference_select_clauses(ref, monkeypatch, columns, fq_table) -> list[str]:
    """Run the reference's process_columns with stubbed I/O and parse the
    SELECT list out of the SQL it would have submitted."""
    captured = {}
    monkeypatch.setattr(ref.utils, "get_column_names", lambda client, fq: list(columns))
    monkeypatch.setattr(
        ref.utils,
        "save_sql_string",
        lambda sql, path, storage_client=None: captured.__setitem__("sql", sql),
    )
    out = ref.transformations.process_columns(fq_table, "proj.dataset.dest")
    assert "successfully" in out["status"]
    return _parse_select_list(captured["sql"])


def _parse_select_list(sql: str) -> list[str]:
    m = re.search(r"SELECT\s*\n(.*?)\n\s*FROM `", sql, re.S)
    assert m, f"unparseable reference SQL:\n{sql}"
    lines = [
        ln.strip()
        for ln in m.group(1).splitlines()
        if ln.strip() and not ln.strip().startswith("--")
    ]
    body = " ".join(lines)
    clauses, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            clauses.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    clauses.append("".join(cur))
    return [re.sub(r"\s+", " ", c).strip() for c in clauses if c.strip()]


def _norm(clause_sql: str) -> str:
    """Normalize a clause for cross-dialect text comparison: strip the
    backtick quoting this repo's audit SQL applies."""
    return re.sub(r"\s+", " ", clause_sql.replace("`", "")).strip()


def _our_clauses(columns, table_identifier="dataset.randomtbl", fq="proj.dataset.randomtbl"):
    return compose_clean_columns(list(columns), table_identifier, fq)


def test_planner_differential_substring_free_schemas(ref, monkeypatch):
    """>=200 random substring-free schemas: the reference's generated SELECT
    list and this repo's clause list must be IDENTICAL (text and order) —
    Connect_ID passthrough, purity filtering, loop grouping/COALESCE,
    version-tag placement, case standardization, the lot."""
    rng = random.Random(1729)
    for i in range(220):
        cols = _rand_schema(rng, allow_substrings=False)
        ref_clauses = _reference_select_clauses(
            ref, monkeypatch, cols, "proj.dataset.randomtbl"
        )
        ours = [_norm(c.sql) for c in _our_clauses(cols)]
        assert ref_clauses == ours, f"schema #{i}: {cols}"


def test_planner_differential_one_off_rename_tables(ref, monkeypatch):
    """Random schemas seeded with real one-off mapping sources, run against
    the tables that carry rename maps.  Tables without custom transforms
    compare full clause text; module1_v2_JP (which has custom transforms,
    rendered in each engine's own dialect) compares output names."""
    rng = random.Random(8128)
    for table_id, mappings in config.ONE_OFF_COLUMN_RENAME_MAPPINGS.items():
        has_custom = table_id in config.CUSTOM_TRANSFORMS
        for _ in range(25):
            cols = _rand_schema(rng, allow_substrings=False)
            for m in rng.sample(mappings, k=min(len(mappings), rng.randint(1, 6))):
                if m["source"].lower() not in {c.lower() for c in cols}:
                    cols.append(m["source"])
            rng.shuffle(cols)
            ref_clauses = _reference_select_clauses(
                ref, monkeypatch, cols, f"proj.{table_id}"
            )
            ours = _our_clauses(cols, table_id, f"proj.{table_id}")
            if has_custom:
                ref_names = [c.rsplit(" AS ", 1)[-1] if " AS " in c else c for c in ref_clauses]
                assert ref_names == [c.out_name for c in ours], cols
            else:
                assert ref_clauses == [_norm(c.sql) for c in ours], cols


def test_planner_deviation_substring_sweep_golden(ref, monkeypatch):
    """Golden capture of the ONE documented behavioral deviation.

    Reference (/root/reference/core/transformations.py:322-338): one
    substring-bearing column makes the pass sweep EVERY unprocessed column
    (its grouping loop runs over all_columns), so loop variables are never
    grouped — they come out as individual excised renames.  This repo's pass
    claims only columns actually containing a substring, so the loop pair
    still COALESCEs.  Both captured verbatim below."""
    cols = [
        "Connect_ID",
        "d_111111111_num",                     # the substring-bearing column
        "D_333333333_D_444444444_1_1",         # loop pair: same CID set,
        "D_444444444_D_333333333_1_1",         # same loop -> one group
    ]
    ref_clauses = _reference_select_clauses(ref, monkeypatch, cols, "proj.dataset.t")
    assert ref_clauses == [
        "Connect_ID",
        "d_111111111_num AS d_111111111",
        # swept individually — NOT coalesced, names keep the _1_1 suffix:
        "D_333333333_D_444444444_1_1 AS d_333333333_d_444444444_1_1",
        "D_444444444_D_333333333_1_1 AS d_444444444_d_333333333_1_1",
    ]
    ours = [_norm(c.sql) for c in _our_clauses(cols)]
    assert ours == [
        "Connect_ID",
        "d_111111111_num AS d_111111111",
        # loop pass still runs: the pair groups and COALESCEs to the
        # canonical d_<cid>_d_<cid>_<loop> name (first member's CID order):
        "COALESCE(D_333333333_D_444444444_1_1, D_444444444_D_333333333_1_1) "
        "AS d_333333333_d_444444444_1",
    ]


def test_planner_deviation_substring_sweep_property(ref, monkeypatch):
    """Random substring-bearing schemas: the reference output must equal the
    sweep-all emulation (grouping EVERY unprocessed column by its excised +
    standardized name), pinning the deviation's exact shape beyond the one
    golden example; and this repo's output must agree with the reference on
    every clause whose source columns contain a substring."""
    rng = random.Random(4104)
    for _ in range(40):
        cols = _rand_schema(rng, allow_substrings=True)
        if not any(any(s in c for s in config.SUBSTRINGS_TO_FIX) for c in cols):
            cols.append("state_d_" + _rand_cid(rng))
        ref_clauses = _reference_select_clauses(ref, monkeypatch, cols, "proj.dataset.t")

        # Emulate the reference sweep: group ALL non-Connect_ID columns
        expected, processed = [], set()
        if "Connect_ID" in cols:
            expected.append("Connect_ID")
            processed.add("connect_id")
        groups: dict[str, list[str]] = {}
        for c in cols:
            if c.lower() in processed:
                continue
            new = names.standardize_column_case(
                names.excise_substrings(c, config.SUBSTRINGS_TO_FIX)
            )
            groups.setdefault(new, []).append(c)
        for new, members in groups.items():
            if new.lower() in processed:
                continue
            if len(members) == 1:
                c = members[0]
                expected.append(c if c == new else f"{c} AS {new}")
            else:
                prio = lambda c: sum(1 for s in config.SUBSTRINGS_TO_FIX if s in c)
                expected.append(
                    f"COALESCE({', '.join(sorted(members, key=prio))}) AS {new}"
                )
            processed.add(new.lower())
            processed.update(m.lower() for m in members)
        assert ref_clauses == expected, cols

        # Where a clause's sources contain substrings, both planners agree
        ours = {_norm(c.sql) for c in _our_clauses(cols)}
        for clause in ref_clauses:
            srcs = clause.split(" AS ")[0]
            if any(s in srcs for s in config.SUBSTRINGS_TO_FIX):
                assert clause in ours, (clause, cols)


# ---------------------------------------------------------------------------
# merge_table_versions differential
# ---------------------------------------------------------------------------


def test_valid_column_names_match_reference(ref, monkeypatch):
    """The merge pre-filter (forbidden names + excluded substrings) must
    keep exactly the same columns as the reference's get_valid_column_names
    (which runs its real exclusion logic here — only the schema fetch is
    patched)."""
    assert list(ref.constants.EXCLUDED_NON_CID_SUBSTRINGS) == list(
        config.EXCLUDED_NON_CID_SUBSTRINGS
    )
    rng = random.Random(6174)
    for _ in range(60):
        cols = _rand_schema(rng, allow_substrings=True)
        if rng.random() < 0.5:
            cols = cols + ["d_123456789_entity", "COMPLETED_ts_provided", "sha", "uid"]
        monkeypatch.setattr(
            ref.utils, "get_column_names",
            lambda client=None, fq_table=None, _c=cols: list(_c),
        )
        got = set(ref.utils.get_valid_column_names(None, "p.d.t"))
        assert got == set(names.valid_column_names(cols)), cols


def test_merge_table_versions_differential(ref, monkeypatch, spark):
    """Random 2-4 schema merges: the reference's composed SELECT list
    (COALESCEd commons sorted, per-alias uniques sorted, Connect_ID case
    preserved) must equal compose_merge's clause list, and the FULL OUTER
    chain must anchor on the LAST source joining earlier sources in
    reverse order on Connect_ID."""
    from pr2_transformation_spark.operators.merge import compose_merge

    # capture the REAL functions once, before any monkeypatching
    real_get_valid = ref.utils.get_valid_column_names
    real_get_cols = ref.utils.get_column_names

    rng = random.Random(9261)
    for _ in range(25):
        n = rng.randint(2, 4)
        schemas = []
        shared = [_rand_name(rng, False) for _ in range(rng.randint(1, 4))]
        for _ in range(n):
            cols = _rand_schema(rng, allow_substrings=False)
            if "Connect_ID" not in cols:  # the join key every version carries
                cols.append("Connect_ID")
            for s in shared:
                if s.lower() not in {c.lower() for c in cols}:
                    # vary the case per table: commons match case-insensitively
                    cols.append(s.upper() if rng.random() < 0.3 else s)
            rng.shuffle(cols)
            schemas.append(cols)

        captured = {}

        def ref_valid(cols):
            # run the REAL exclusion logic with only the schema fetch faked
            ref.utils.get_column_names = lambda client=None, fq_table=None, _c=cols: list(_c)
            try:
                return real_get_valid(None, "p.d.t")
            finally:
                ref.utils.get_column_names = real_get_cols

        monkeypatch.setattr(
            ref.utils, "get_valid_column_names",
            lambda client, fq_table, _s=schemas: ref_valid(_s[int(fq_table.rsplit("t", 1)[-1])]),
        )
        monkeypatch.setattr(
            ref.utils, "save_sql_string",
            lambda sql, path, storage_client=None, _c=captured: _c.__setitem__("sql", sql),
        )
        tables = [f"p.d.t{i}" for i in range(n)]
        out = ref.transformations.merge_table_versions(tables, "p.d.dest")
        assert "successfully" in out["status"]
        sql = captured["sql"]

        ref_clauses = _parse_merge_select(sql)

        dfs = [
            spark.createDataFrame([], " ".join(f"`{c}` string," for c in cols)[:-1])
            for cols in schemas
        ]
        _, clauses = compose_merge(dfs)
        ours = [_norm(c.sql) for c in clauses]
        assert ref_clauses == ours, schemas

        # join chain: FROM last table, earlier tables reverse order, keyed
        # on Connect_ID both sides
        joins = re.findall(r"FULL OUTER JOIN `([^`]+)` (v\d+)\s*\n\s*ON ([\w.]+) = ([\w.]+)", sql)
        assert [j[1] for j in joins] == [f"v{i}" for i in range(n - 1, 0, -1)]
        base_alias = f"v{n}"
        for _tbl, alias, lhs, rhs in joins:
            assert lhs == f"{base_alias}.Connect_ID" and rhs == f"{alias}.Connect_ID"


def _parse_merge_select(sql: str) -> list[str]:
    m = re.search(r"SELECT\s*\n(.*?)\n\s*FROM\s*\n", sql, re.S)
    assert m, f"unparseable merge SQL:\n{sql}"
    lines = [ln.strip() for ln in m.group(1).splitlines()
             if ln.strip() and not ln.strip().startswith("--")]
    body = " ".join(lines)
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [re.sub(r"\s+", " ", c).strip() for c in out if c.strip()]


# ---------------------------------------------------------------------------
# process_rows differential
# ---------------------------------------------------------------------------


def _ref_process_rows_parts(ref, monkeypatch, cols, binary, false_arrays):
    captured = {}
    monkeypatch.setattr(
        ref.utils, "get_column_names",
        lambda client=None, fq_table=None: list(cols),
    )
    monkeypatch.setattr(
        ref.utils, "get_binary_columns",
        lambda client=None, fq_table=None: list(binary),
    )
    monkeypatch.setattr(
        ref.utils, "get_strict_false_array_columns",
        lambda client=None, fq_table=None, batch_size=100, use_reference=True,
        reference_file_path=None: list(false_arrays),
    )
    monkeypatch.setattr(
        ref.utils, "save_sql_string",
        lambda sql, path, storage_client=None: captured.__setitem__("sql", sql),
    )
    out = ref.transformations.process_rows("p.d.t", "p.d.dest")
    assert "successfully" in out["status"]
    return _parse_select_list(captured["sql"])


def _classify_ref_part(part: str) -> tuple[str, str]:
    alias = part.rsplit(" AS ", 1)[-1].strip().strip("`") if " AS " in part else part.strip().strip("`")
    if '"353358909"' in part:
        return ("binary", alias)
    if "REGEXP_CONTAINS" in part:
        return ("unwrap", alias)
    return ("pass", alias)


def _classify_our_clause(c) -> tuple[str, str]:
    if "'353358909'" in c.sql:
        return ("binary", c.out_name)
    if "RLIKE" in c.sql:
        return ("unwrap", c.out_name)
    return ("pass", c.out_name)


def test_process_rows_differential(ref, monkeypatch):
    """Random (schema, binary set, false-array set) triples: the reference's
    SELECT composition — binary CASEs sorted, unwrap CASEs sorted,
    pass-through sorted — must equal compose_recoding clause-for-clause in
    kind, output name, and order (expression text is dialect-specific:
    REGEXP_CONTAINS/\\1 in BigQuery re2, RLIKE/$1 in Spark; the value
    semantics of both renderings are pinned by the q03/q12/q27 oracles)."""
    from pr2_transformation_spark.operators.clean_rows import compose_recoding

    rng = random.Random(1089)
    for _ in range(40):
        cols = _rand_schema(rng, allow_substrings=False, n=rng.randint(4, 14))
        pool = [c for c in cols if c != "Connect_ID"]
        rng.shuffle(pool)
        n_bin = rng.randint(0, len(pool) // 2)
        n_fa = rng.randint(0, (len(pool) - n_bin) // 2)
        binary = set(pool[:n_bin])
        false_arrays = set(pool[n_bin : n_bin + n_fa])
        ref_parts = [
            _classify_ref_part(p)
            for p in _ref_process_rows_parts(ref, monkeypatch, cols, binary, false_arrays)
        ]
        ours = [
            _classify_our_clause(c)
            for c in compose_recoding(cols, binary, false_arrays)
        ]
        assert ref_parts == ours, (cols, binary, false_arrays)


def test_process_rows_overlap_deviation(ref, monkeypatch):
    """Documented deviation #2: a column detected as BOTH binary and false
    array.  Reference: emits both expressions and its duplicate guard
    raises ValueError (transformations.py:725-736) — the run dies.  This
    repo: binary wins, one clause, run completes."""
    from pr2_transformation_spark.operators.clean_rows import compose_recoding

    cols = ["Connect_ID", "d_111111111", "d_222222222"]
    with pytest.raises(ValueError, match="[Dd]uplicate"):
        _ref_process_rows_parts(
            ref, monkeypatch, cols, {"d_111111111"}, {"d_111111111"}
        )
    ours = compose_recoding(cols, {"d_111111111"}, {"d_111111111"})
    assert [_classify_our_clause(c) for c in ours] == [
        ("binary", "d_111111111"), ("pass", "Connect_ID"), ("pass", "d_222222222"),
    ]


def test_sensitive_tier_columns_match_reference(ref, monkeypatch):
    """The sensitive-tier projection list must match the reference's
    hard-coded SELECT verbatim — except the key column's case
    (reference writes CONNECT_ID there, unlike every other endpoint's
    Connect_ID; this repo uses the canonical Connect_ID — documented
    deviation #3, case-only, value-identical)."""
    captured = {}
    monkeypatch.setattr(
        ref.utils, "save_sql_string",
        lambda sql, path, storage_client=None: captured.__setitem__("sql", sql),
    )
    out = ref.transformations.create_sensitive_tier("p.d.t", "p.d.dest")
    assert "successfully" in out["status"]
    m = re.search(r"SELECT\s*\n(.*?)\n\s*FROM `", captured["sql"], re.S)
    ref_cols = [c.strip() for c in m.group(1).replace("\n", " ").split(",")]
    assert ref_cols[0] == "CONNECT_ID"  # the reference's case quirk, pinned
    assert [c.lower() for c in ref_cols] == [
        c.lower() for c in config.SENSITIVE_TIER_COLUMNS
    ]
    assert config.SENSITIVE_TIER_COLUMNS[0] == "Connect_ID"
    assert ref_cols[1:] == config.SENSITIVE_TIER_COLUMNS[1:]

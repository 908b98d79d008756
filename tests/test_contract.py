"""Driver-contract consistency: every oracle key names a real query, every
query callable has the (spark, sf_dir) signature, and the bench list only
references declared queries.  Guards against silent-skip typos — unknown
names are ignored by comparison harnesses, so a typo looks like a pass."""

from __future__ import annotations

import inspect

import __spark_entry__ as entrymod
import bench


def test_oracles_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle entries without queries: {sorted(unknown)}"


def test_query_signatures():
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir), has {params}"


def test_bench_queries_exist():
    qs = entrymod.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench names not in queries(): {missing}"


def test_rows_only_queries_are_the_documented_ones():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    # q22/q23/q40/q126 gained DuckDB oracles (deterministic md5-based
    # folds / exact-equivalence SQL) in round 2; q24/q25/q35 became
    # SELF-VERIFYING in round 3 (in-query recall vs the exact result,
    # floor asserted by the oracle).  The two survivors are engine-
    # specific sketches (HLL++, approx_percentile) whose outputs are
    # tolerance-tested in tests/test_ext_ops.py instead.
    assert rows_only == [
        "q64_approx_distinct",
        "q97_approx_quantiles",
    ], f"unexpected rows-only set: {rows_only}"

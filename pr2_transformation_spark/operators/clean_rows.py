"""`clean_rows` — value recoding driven by data profiling.

Pipeline (parity: /root/reference/core/transformations.py:654-773):
  1. profile the table: binary columns (single-pass aggregation; the
     reference runs ceil(N/500) BigQuery scans) and false-array columns
     (name-match fast path by default — zero scans);
  2. partition columns into binary / false-array / pass-through;
  3. compose one projection: binary CASE recode (sorted), false-array unwrap
     CASE (sorted), pass-through (sorted);
  4. duplicate-name guard, SQL audit, overwrite write.

Scale: exactly one profiling scan + one rewrite scan of the table regardless
of column count; both are full-width sequential parquet reads with
whole-stage-codegen'd CASE expressions — no shuffle anywhere.
"""

from __future__ import annotations

from collections import Counter
from typing import Optional

from pyspark.sql import DataFrame

from .. import profiling
from ..expressions import Clause, binary_recode, passthrough, render_select_sql, unwrap_singleton
from ..plans.audit import audit_path_for, save_sql_string
from ..sources.catalog import Catalog


def compose_clean_rows(
    df: DataFrame,
    use_reference: bool = True,
    reference_file_path: Optional[str] = None,
) -> list[Clause]:
    """Profile ``df`` and compose the recoding projection."""
    all_columns = df.schema.names

    if use_reference:
        # name-only false-array fast path: binary detection is the only scan
        binary = set(profiling.binary_columns(df))
        false_arrays = set(
            profiling.false_array_columns_from_reference(
                [c for c in all_columns if c != "Connect_ID"], reference_file_path
            )
        )
    else:
        # computational mode: both detectors share ONE aggregation scan
        b, fa = profiling.profile_columns(df)
        binary, false_arrays = set(b), set(fa)
    return compose_recoding(all_columns, binary, false_arrays)


def compose_recoding(
    all_columns: list[str], binary: set[str], false_arrays: set[str]
) -> list[Clause]:
    """Pure planner: (columns, binary set, false-array set) -> projection.

    Clause order parity: /root/reference/core/transformations.py:698-714
    (binary CASEs sorted, unwrap CASEs sorted, pass-through sorted).

    Documented deviation: a column claimed by BOTH detectors recodes once,
    binary winning.  The reference emits both expressions and its duplicate
    guard then raises ``ValueError`` (transformations.py:725-736), killing
    the run; since the overlap means contradictory profiling output for
    which the binary CASE is the safe interpretation, this repo resolves it
    instead of failing — pinned by
    tests/test_reference_differential.py::test_process_rows_overlap_deviation.
    """
    false_arrays = set(false_arrays) - set(binary)
    rest = [c for c in all_columns if c not in binary and c not in false_arrays]

    clauses: list[Clause] = []
    clauses += [binary_recode(c) for c in sorted(binary)]
    clauses += [unwrap_singleton(c, "NULL") for c in sorted(false_arrays)]
    clauses += [passthrough(c) for c in sorted(rest)]

    counts = Counter(c.out_name for c in clauses)
    dupes = {n for n, k in counts.items() if k > 1}
    if dupes:
        raise ValueError(f"Duplicate column names detected: {sorted(dupes)}")
    return clauses


def clean_rows_df(
    df: DataFrame,
    use_reference: bool = True,
    reference_file_path: Optional[str] = None,
) -> DataFrame:
    """DataFrame-in/DataFrame-out form (no I/O)."""
    clauses = compose_clean_rows(df, use_reference, reference_file_path)
    # one Py4J call for the whole (possibly 4k-wide) projection
    return df.selectExpr(*[c.sql for c in clauses])


def clean_rows(
    catalog: Catalog,
    source_table: str,
    destination_table: str,
    audit_dir: Optional[str] = None,
    use_reference: bool = True,
    reference_file_path: Optional[str] = None,
) -> dict:
    """Full service operation.  Envelope parity:
    /root/reference/core/transformations.py:768-773."""
    df = catalog.read(source_table)
    clauses = compose_clean_rows(df, use_reference, reference_file_path)
    sql_path = None
    if audit_dir:
        sql = render_select_sql(clauses, source_table, destination_table)
        sql_path = save_sql_string(sql, audit_path_for(destination_table, audit_dir))
    catalog.write(df.selectExpr(*[c.sql for c in clauses]), destination_table)
    return {
        "status": f"Table {destination_table} successfully created with all transformations applied",
        "submitted_sql_path": sql_path,
    }

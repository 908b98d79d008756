"""`merge_table_versions` — N-way FULL OUTER join of table versions.

Semantics (parity: /root/reference/core/transformations.py:19-172):
  * each source is aliased ``v1..vN`` in input order; invalid columns
    (forbidden names / excluded substrings) are dropped per table first;
  * columns present in *every* source (case-insensitive) are COALESCEd in
    alias order, output name lowercased (``Connect_ID`` preserved), emitted
    in sorted order;
  * per-table unique columns pass through (sorted within each table);
  * the FROM base is the **last** source; every earlier source joins
    ``FULL OUTER ... ON v_base.Connect_ID = vK.Connect_ID`` in reverse
    order.  This is a star-shaped chain anchored on the base table's key:
    with N >= 3 sources, rows missing from the base do not align with each
    other (v1-only and v2-only rows for the same participant stay on
    separate output rows).  We reproduce that chain exactly — the production
    case (2 versions) is unaffected; see SURVEY.md §2.6 and the 3-version
    test.

Scale posture: version tables share the ``Connect_ID`` key domain, so the
join is a shuffle-on-key sort-merge join; AQE picks broadcast joins when one
version is small.  The wide COALESCE projection is codegen'd; no extra
shuffle beyond the join itself.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from .. import names
from ..expressions import Clause, qualified_coalesce, render_select_sql
from ..plans.audit import audit_path_for, save_sql_string
from ..sources.catalog import Catalog


def compose_merge(dfs: list[DataFrame]) -> tuple[DataFrame, list[Clause]]:
    """Build the joined DataFrame and its projection clauses.

    Returns ``(joined_df, clauses)``; callers select ``[c.column for c in
    clauses]`` on the joined frame.
    """
    if len(dfs) < 2:
        raise ValueError("A destination table and at least two source tables must be provided.")

    aliases = [f"v{i}" for i in range(1, len(dfs) + 1)]
    table_columns = {a: names.valid_column_names(df.schema.names) for a, df in zip(aliases, dfs)}
    for a, cols in table_columns.items():
        if not cols:
            raise ValueError(f"No columns retrieved from source {a}")
    # Alias each frame so clause SQL can use qualified refs (v1.`c`) and the
    # wide projection goes through ONE selectExpr Py4J call downstream —
    # survey version tables run to thousands of columns (see the Clause
    # docstring for why eager per-column refs are a driver bottleneck).
    frames = {a: df.alias(a) for a, df in zip(aliases, dfs)}
    case_maps = {a: {c.lower(): c for c in cols} for a, cols in table_columns.items()}

    common_lower: set[str] = set(case_maps[aliases[0]])
    for a in aliases[1:]:
        common_lower &= set(case_maps[a])

    processed: set[str] = set()
    clauses: list[Clause] = []

    def qref(alias: str, col: str):
        return lambda: frames[alias][col]

    for col_l in sorted(common_lower):
        out = "Connect_ID" if col_l == "connect_id" else col_l
        refs = [qref(a, case_maps[a][col_l]) for a in aliases]
        sql_parts = [f"{a}.`{case_maps[a][col_l]}`" for a in aliases]
        clauses.append(qualified_coalesce(refs, sql_parts, out))
        processed.add(col_l)

    for a in aliases:
        unique = [c for c in table_columns[a] if c.lower() not in processed]
        for col in sorted(unique):
            out = "Connect_ID" if col == "Connect_ID" else col.lower()
            clauses.append(qualified_coalesce([qref(a, col)], [f"{a}.`{col}`"], out))
            processed.add(col.lower())

    # Star-shaped FULL OUTER chain anchored on the last source's key.
    base_alias = aliases[-1]
    base = frames[base_alias]
    joined = base
    base_key = base["Connect_ID"]
    for a in reversed(aliases[:-1]):
        other = frames[a]
        joined = joined.join(other, base_key == other["Connect_ID"], "full")
    return joined, clauses


def merge_versions_df(dfs: list[DataFrame]) -> DataFrame:
    """DataFrame-in/DataFrame-out form (no I/O).  One selectExpr call for
    the whole (possibly thousands-wide) COALESCE projection."""
    joined, clauses = compose_merge(dfs)
    return joined.selectExpr(*[c.sql for c in clauses])


def merge_table_versions(
    catalog: Catalog,
    source_tables: list[str],
    destination_table: str,
    audit_dir: Optional[str] = None,
) -> dict:
    """Full service operation.  Envelope parity:
    /root/reference/core/transformations.py:169-172."""
    if not destination_table or not source_tables or len(source_tables) < 2:
        raise ValueError("A destination table and at least two source tables must be provided.")
    dfs = [catalog.read(t) for t in source_tables]
    joined, clauses = compose_merge(dfs)
    sql_path = None
    if audit_dir:
        base = source_tables[-1]
        join_sql = "\n".join(
            f"FULL OUTER JOIN `{t}` v{i + 1} ON v{len(source_tables)}.Connect_ID = v{i + 1}.Connect_ID"
            for i, t in reversed(list(enumerate(source_tables[:-1])))
        )
        body = ",\n    ".join(c.sql for c in clauses)
        sql = (
            f"CREATE OR REPLACE TABLE `{destination_table}` USING PARQUET AS\n"
            f"SELECT\n    {body}\nFROM `{base}` v{len(source_tables)}\n{join_sql}"
        )
        sql_path = save_sql_string(sql, audit_path_for(destination_table, audit_dir))
    catalog.write(joined.selectExpr(*[c.sql for c in clauses]), destination_table)
    return {
        "status": f"Table {destination_table} successfully created or replaced.",
        "submitted_sql_path": sql_path,
    }

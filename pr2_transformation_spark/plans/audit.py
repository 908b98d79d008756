"""SQL-audit artifact sink.

Every composed plan is archived as SQL text *before* execution, keyed by
destination table — the reference's provenance practice
(/root/reference/core/utils.py:54-89; call sites
/root/reference/core/transformations.py:151-158,624-631,749-758,800-809).
Local filesystem paths are written directly; object-store URIs would need a
cloud client, so they are rejected with a clear error rather than silently
skipped.
"""

from __future__ import annotations

import os

_REMOTE_SCHEMES = ("gs://", "s3://", "s3a://", "abfs://")


def audit_path_for(destination_table: str, output_dir: str) -> str:
    return os.path.join(output_dir, f"{destination_table}.sql")


def save_sql_string(sql: str, path: str) -> str:
    """Persist the SQL text; create parent dirs; return the path written."""
    if path.startswith(_REMOTE_SCHEMES):
        raise NotImplementedError(
            f"object-store audit sink not wired in this environment: {path}"
        )
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w") as fh:
        fh.write(sql)
    return path

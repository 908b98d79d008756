"""SQL-audit artifact sink.

Every composed plan is archived as SQL text *before* execution, keyed by
destination table — the reference's provenance practice
(/root/reference/core/utils.py:54-89; call sites
/root/reference/core/transformations.py:151-158,624-631,749-758,800-809).

Local filesystem paths are written directly.  Object-store URIs
(``gs://``, ``s3://``, ...) go through an injectable writer registry — the
reference passes a cloud storage client into its saver the same way; here
any fsspec-style callable (or a thin SDK wrapper) registers per scheme via
:func:`register_remote_writer`.  An unregistered remote scheme raises a
clear error rather than silently skipping the archive.
"""

from __future__ import annotations

import os
from typing import Callable

_REMOTE_SCHEMES = ("gs://", "s3://", "s3a://", "abfs://")

#: scheme -> writer(path, sql_text).  Injected by the deployment (e.g. an
#: fsspec ``lambda p, s: fs.open(p, "w").write(s)`` or a cloud SDK call).
_REMOTE_WRITERS: dict[str, Callable[[str, str], None]] = {}


def register_remote_writer(scheme: str, writer: Callable[[str, str], None]) -> None:
    """Register (or override) the object-store writer for ``scheme``.

    ``scheme`` must be one of the recognized remote prefixes
    (``gs://``, ``s3://``, ``s3a://``, ``abfs://``).  Pass ``None`` to
    unregister.
    """
    if scheme not in _REMOTE_SCHEMES:
        raise ValueError(f"unknown remote scheme {scheme!r}; expected one of {_REMOTE_SCHEMES}")
    if writer is None:
        _REMOTE_WRITERS.pop(scheme, None)
    else:
        _REMOTE_WRITERS[scheme] = writer


def audit_path_for(destination_table: str, output_dir: str) -> str:
    # os.path.join would mangle double-slash URIs on some platforms; remote
    # prefixes are joined textually.
    if output_dir.startswith(_REMOTE_SCHEMES):
        return f"{output_dir.rstrip('/')}/{destination_table}.sql"
    return os.path.join(output_dir, f"{destination_table}.sql")


def save_sql_string(sql: str, path: str) -> str:
    """Persist the SQL text; create parent dirs; return the path written.

    Remote URIs dispatch to the scheme's registered writer; local paths
    write directly.
    """
    for scheme in _REMOTE_SCHEMES:
        if path.startswith(scheme):
            writer = _REMOTE_WRITERS.get(scheme)
            if writer is None:
                raise RuntimeError(
                    f"no writer registered for {scheme!r} audit paths — inject "
                    "one with plans.audit.register_remote_writer(scheme, fn)"
                )
            writer(path, sql)
            return path
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w") as fh:
        fh.write(sql)
    return path

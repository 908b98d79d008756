"""Flask HTTP service layer — 1:1 route parity with the reference REST API.

The reference is a Flask app whose routes Airflow calls
(/root/reference/core/endpoints.py:11-87): ``GET /heartbeat`` plus four
``POST`` transformation routes that take a ``{"source": ..., "destination":
...}`` JSON body, return a ``{status, timestamp, service}`` envelope on 200,
abort 400 on missing parameters (/root/reference/core/request_helpers.py:3-12),
and return ``{"error": "Internal Server Error", "message": ...}`` on 500.

This module reproduces that surface over the engine's :mod:`api` functions.
It is an app *factory* — the caller supplies the :class:`Catalog` (and with
it the SparkSession), so tests drive it through Flask's ``test_client`` with
no socket, and a deployment can mount it under any WSGI server.  Flask is a
soft dependency: importing this module without flask installed raises only
when :func:`create_app` is called.
"""

from __future__ import annotations

from typing import Optional

try:  # soft dependency — the engine library itself never imports this module
    from flask import Flask, abort, jsonify, request
except ImportError:  # pragma: no cover - flask is present in CI
    Flask = None  # type: ignore[assignment]

from . import api
from .sources.catalog import Catalog


def _extract_source_and_destination(mapping: dict) -> tuple:
    """400 on missing/empty source or destination, like the reference
    (/root/reference/core/request_helpers.py:3-12).  ``source`` may be a
    string or, for merge, a list of table names."""
    source = mapping.get("source")
    destination = mapping.get("destination")
    if not source or not destination:
        abort(
            400,
            description="Missing required parameter(s): 'source' and/or 'destination'.",
        )
    return source, destination


def create_app(catalog: Catalog, audit_dir: Optional[str] = None):
    """Build the Flask app exposing the five reference routes.

    The reference binds module-globals at import (one app, one BigQuery
    client); here the catalog is injected so one process can serve many
    isolated apps (tests, multi-warehouse deployments) off one JVM.
    """
    if Flask is None:  # pragma: no cover
        raise ImportError("flask is required for the HTTP service layer")

    app = Flask("pr2-transformation-spark")

    def _envelope(status: object):
        return jsonify(
            {
                "status": status,
                "timestamp": api.heartbeat()["timestamp"],
                "service": api.SERVICE_NAME,
            }
        ), 200

    def _transform_route(fn, *, listify_source: bool = False):
        mapping = request.get_json(silent=True) or {}
        source, destination = _extract_source_and_destination(mapping)
        if listify_source and isinstance(source, str):
            source = [source]
        try:
            result = fn(catalog, source, destination, audit_dir)
        except Exception as exc:  # noqa: BLE001 — 500 envelope parity
            return jsonify({"error": "Internal Server Error", "message": str(exc)}), 500
        return _envelope(result)

    @app.get("/heartbeat")
    def heartbeat():
        return jsonify(api.heartbeat()), 200

    @app.post("/clean_columns")
    def clean_columns():
        return _transform_route(api.clean_columns)

    @app.post("/clean_rows")
    def clean_rows():
        return _transform_route(api.clean_rows)

    @app.post("/merge_table_versions")
    def merge_table_versions():
        return _transform_route(api.merge_table_versions, listify_source=True)

    @app.post("/create_sensitive_tier")
    def create_sensitive_tier():
        return _transform_route(api.create_sensitive_tier)

    return app

"""Service-level entry points mirroring the reference REST API.

The reference exposes five Flask routes called by Airflow
(/root/reference/core/endpoints.py:11-87); here they are plain functions
over a :class:`Catalog`, and :mod:`pr2_transformation_spark.service`
mounts them on the matching Flask routes (same paths, status codes, and
envelopes).  Request validation and response envelopes follow
/root/reference/core/request_helpers.py:3-12 and
/root/reference/core/endpoints.py:28-35.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Optional

import pyspark

from . import operators
from .sources.catalog import Catalog

SERVICE_NAME = "pr2-transformation-spark"


def _require(value, name: str):
    """400-equivalent validation (/root/reference/core/request_helpers.py:3-12)."""
    if not value:
        raise ValueError(f"Missing required parameter: {name}")
    return value


def heartbeat() -> dict:
    """Health check (/root/reference/core/endpoints.py:11-18).

    ``status`` is "healthy" verbatim — a monitor ported from the reference
    checks that exact string; ``spark_version`` is an additive field (extra
    keys don't break reference clients, a changed value would).
    """
    return {
        "status": "healthy",
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "service": SERVICE_NAME,
        "spark_version": pyspark.__version__,
    }


def clean_columns(catalog: Catalog, source: str, destination: str, audit_dir: Optional[str] = None) -> dict:
    _require(source, "source")
    _require(destination, "destination")
    return operators.clean_columns(catalog, source, destination, audit_dir)


def clean_rows(catalog: Catalog, source: str, destination: str, audit_dir: Optional[str] = None) -> dict:
    _require(source, "source")
    _require(destination, "destination")
    return operators.clean_rows(catalog, source, destination, audit_dir)


def merge_table_versions(catalog: Catalog, sources: list[str], destination: str, audit_dir: Optional[str] = None) -> dict:
    _require(sources, "source")
    _require(destination, "destination")
    return operators.merge_table_versions(catalog, sources, destination, audit_dir)


def create_sensitive_tier(catalog: Catalog, source: str, destination: str, audit_dir: Optional[str] = None) -> dict:
    _require(source, "source")
    _require(destination, "destination")
    return operators.create_sensitive_tier(catalog, source, destination, audit_dir)

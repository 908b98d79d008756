"""Activation for the from-scratch ``miniproto`` protobuf runtime
(pr2_transformation_spark/vendor/miniproto) — the shim that lets
PySpark's transformWithStateInPandas state-server protocol
(StateMessage_pb2) run where the real ``google.protobuf`` package is
not installed.

A real installation always wins: the shim path is appended only when
``import google.protobuf`` fails.  Worker processes don't share the
driver's sys.path, so ``ensure_protobuf(spark)`` also ships the shim
to executors as a zip via ``SparkContext.addPyFile`` — the mechanism
Spark provides for exactly this (runtime code distribution), which a
real cluster honors identically to local mode.
"""

from __future__ import annotations

import os
import sys

_SHIM_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor", "miniproto")


def have_real_protobuf() -> bool:
    import importlib.util

    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        return False
    if spec is None:
        return False
    origin = spec.origin or ""
    return _SHIM_ROOT not in origin


def prepare_env() -> bool:
    """Pre-JVM hook (call BEFORE SparkSession creation, as
    ``session.build_session`` does): when the real protobuf is absent,
    prepend the shim to ``PYTHONPATH`` so every python process the JVM
    launches — executor workers AND the TransformWithStateInPySpark
    DRIVER worker, which gets only the JVM environment, not
    addPyFile's SparkFiles path — can import ``google.protobuf``.
    Returns True when the shim was activated."""
    try:
        import google.protobuf  # noqa: F401
        return False
    except ImportError:
        pass
    existing = os.environ.get("PYTHONPATH", "")
    if _SHIM_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_ROOT + (os.pathsep + existing if existing else ""))
    if _SHIM_ROOT not in sys.path:
        sys.path.insert(0, _SHIM_ROOT)
    return True


def ensure_protobuf(spark=None) -> str:
    """Make ``google.protobuf`` importable on the driver (sys.path) and
    on executors (addPyFile zip).  Returns "real" when an installed
    protobuf is used, "shim" when miniproto was activated.  NOTE: the
    TWS *driver worker* process inherits only the JVM environment — a
    session whose JVM started without :func:`prepare_env` cannot reach
    it; ``session.build_session`` calls prepare_env for exactly this."""
    try:
        import google.protobuf  # noqa: F401
        return "real"
    except ImportError:
        pass
    prepare_env()
    # drop any failed-import placeholder so the retry sees the shim
    for mod in ("google", "google.protobuf"):
        if mod in sys.modules and getattr(
                sys.modules[mod], "__file__", None) is None:
            del sys.modules[mod]
    import google.protobuf  # noqa: F401
    if spark is not None:
        import tempfile
        import zipfile

        zpath = os.path.join(tempfile.gettempdir(),
                             "pr2_miniproto_shim.zip")
        if not os.path.exists(zpath):
            with zipfile.ZipFile(zpath, "w") as z:
                for root, _dirs, files in os.walk(_SHIM_ROOT):
                    for f in files:
                        if not f.endswith(".py"):
                            continue
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, _SHIM_ROOT))
        spark.sparkContext.addPyFile(zpath)
    return "shim"

"""Locate a usable ``google.protobuf`` runtime for transformWithStateInPandas.

Spark 4's ``transformWithStateInPandas`` talks to the JVM state server over
a protobuf wire format (``pyspark/sql/streaming/proto/StateMessage_pb2.py``)
and therefore needs the ``protobuf`` package at runtime — in BOTH the
driver and the Python workers.  Some environments (like this build
container) have no pip/network access, but a pure-Python build of the
BSD-licensed public protobuf runtime is often already on disk as part of
another public SDK install.  This module finds one, puts it on
``sys.path``, and exports the same path via ``PYTHONPATH`` +
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` **before** any Spark JVM
launches, so the python workers the JVM forks inherit both.

Why the version-check disable: Spark 4.1.2's checked-in gencode was
produced by protoc 6.33.0; a found runtime may trail it slightly (e.g.
6.32.0-dev).  Upstream protobuf ships the
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch for exactly
this gencode-newer-than-runtime situation (see
``google/protobuf/runtime_version.py`` in any protobuf release); the
StateMessage schema uses no 6.33-only features, so the older pure-Python
runtime decodes it fine (verified by the un-skipped
``tests/test_stateful_v2.py``).

Search order: ``SPARK_GRAFT_PROTOBUF_PATH`` (explicit override), then
well-known install locations of public SDKs that vendor the pure-Python
runtime.
"""

from __future__ import annotations

import importlib
import os
import sys

_CANDIDATE_DIRS: tuple[str | None, ...] = (
    os.environ.get("SPARK_GRAFT_PROTOBUF_PATH"),
    # google-cloud-sdk's App Engine platform bundles a pure-Python protobuf
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/local/google-cloud-sdk/platform/google_appengine",
)

_RESOLVED: str | None | bool = False  # False = not yet probed


def ensure_protobuf() -> str | None:
    """Make ``google.protobuf`` importable if at all possible.

    Returns ``"installed"`` if the real package imports, the directory a
    vendored pure-Python runtime was found in, or ``None`` if nothing
    usable exists.  Idempotent; safe to call before every session build.
    """
    global _RESOLVED
    if _RESOLVED is not False:
        return _RESOLVED
    try:
        import google.protobuf  # noqa: F401

        _RESOLVED = "installed"
        return _RESOLVED
    except ImportError:
        pass
    for d in _CANDIDATE_DIRS:
        if not d or not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        if d not in sys.path:
            sys.path.insert(0, d)
        # force the pure-python impl (no C extension in a vendored copy)
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        # workers are forked from the JVM, which inherits the driver env —
        # PYTHONPATH is how the path reaches them (set BEFORE JVM launch)
        pp = os.environ.get("PYTHONPATH", "")
        if d not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = d + (os.pathsep + pp if pp else "")
        try:
            importlib.invalidate_caches()
            import google.protobuf  # noqa: F401
        except ImportError:  # pragma: no cover - found dir but unusable
            continue
        _RESOLVED = d
        return d
    _RESOLVED = None
    return None

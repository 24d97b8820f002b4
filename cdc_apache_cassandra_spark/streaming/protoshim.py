"""Activation seam for the vendored proto3 wire-format shim.

Spark's ``transformWithStateInPandas`` Python worker needs
``google.protobuf`` to frame StateRequest/StateResponse messages to the
JVM. Real clusters ship the wheel; this container does not. The shim
(vendor/protoshim — a clean-room implementation of the public proto3
wire format, subset-scoped to Spark's state protocol) stands in ONLY
when the real package is absent:

- never shadows an installed protobuf (checked first);
- must be activated BEFORE the SparkSession's JVM starts, because
  Python workers inherit the JVM's environment — ``PYTHONPATH`` has to
  carry the vendor directory into the worker processes.

Call :func:`ensure_protobuf` from conftest (before any session) or any
driver program that wants the TWS operators on a protobuf-less machine.
"""

from __future__ import annotations

import os
import sys

_VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor",
    "protoshim",
)


def ensure_protobuf() -> str:
    """Make ``google.protobuf`` importable here AND in Spark workers.

    Returns ``'native'`` when the real package is installed (the shim
    stays out of the way), else ``'shim'`` after activating the vendor
    path. Idempotent."""
    try:
        import google.protobuf  # noqa: F401

        if "protoshim" not in (google.protobuf.__file__ or ""):
            return "native"
        return "shim"
    except ImportError:
        pass
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    parts = os.environ.get("PYTHONPATH", "")
    if _VENDOR not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _VENDOR + (os.pathsep + parts if parts else "")
        )
    # An already-running session (e.g. the driver hands us its own)
    # captured its env at JVM start; worker env vars for FUTURE python
    # functions come from sc.environment, so patch that too. Crucial
    # because spark-core's jar carries a `google/` resource directory
    # that resolves as an empty namespace package on the worker — the
    # vendor path must precede it.
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            env = spark.sparkContext.environment
            cur = env.get("PYTHONPATH", "")
            if _VENDOR not in cur.split(os.pathsep):
                env["PYTHONPATH"] = (
                    _VENDOR + (os.pathsep + cur if cur else "")
                )
    except Exception:
        pass
    import google.protobuf  # noqa: F401

    return "shim"

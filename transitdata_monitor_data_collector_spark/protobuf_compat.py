"""Loader for the vendored minimal protobuf runtime (vendor/pbshim).

Spark 4's ``transformWithStateInPandas`` Python runner requires
``google.protobuf`` for its state-server protocol
(pyspark/sql/streaming/proto/StateMessage_pb2.py). When the real runtime
is installed this module is a no-op; when it is absent (as in this
container: no network, no pip), :func:`ensure_protobuf` makes the
vendored shim importable — on the driver via ``sys.path``, and on Spark
python workers via ``SparkContext.addPyFile`` with a zip of the shim
(works mid-session, local or cluster mode, because pyspark prepends
shipped py-files to ``sys.path`` per task).

The shim NEVER shadows a real installation: if ``import google.protobuf``
already succeeds, nothing is touched.
"""

from __future__ import annotations

import os
import sys
import zipfile

_SHIM_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "vendor", "pbshim")
_SHIPPED_FLAG = "_transitdata_pbshim_shipped"


def protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


def _active_runtime_is_shim() -> bool:
    try:
        import google.protobuf as gp
        return bool(getattr(gp, "PROTOBUF_SHIM", False))
    except ImportError:
        return False


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable, preferring a real install.

    With ``spark`` given, also ships the shim to python workers WHENEVER
    the driver is running on the shim — not only when this call inserted
    it (an earlier caller may have made it importable without a session;
    driver-side importability never implies worker availability).
    Returns True when ``google.protobuf`` is importable afterwards.
    """
    if not protobuf_available():
        if _SHIM_ROOT not in sys.path:
            sys.path.insert(0, _SHIM_ROOT)
            import importlib
            importlib.invalidate_caches()
        if not protobuf_available():  # pragma: no cover - shim tree damaged
            return False
    if spark is not None and _active_runtime_is_shim():
        _ship_to_workers(spark)
    return True


def _shim_zip_path() -> str:
    """Build (once) a zip of the shim's ``google`` tree for addPyFile."""
    # keyed by source mtime so an edited shim re-ships in a fresh session
    newest = 0.0
    entries = []
    for dirpath, _dirnames, filenames in os.walk(
        os.path.join(_SHIM_ROOT, "google")
    ):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append(full)
                newest = max(newest, os.path.getmtime(full))
    out = os.path.join(_SHIM_ROOT, f"pbshim-{int(newest)}.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for full in sorted(entries):
                zf.write(full, os.path.relpath(full, _SHIM_ROOT))
        os.replace(tmp, out)  # atomic vs concurrent builders
    return out


def _ship_to_workers(spark) -> None:
    """Two transports, because Spark launches python helpers two ways:

    - ``addPyFile``: task workers (PythonRunner) merge python includes
      into their sys.path — covers the per-partition TWS workers.
    - ``sc.environment['PYTHONPATH']``: the transformWithState DRIVER
      worker (StreamingPythonRunner) does NOT receive python includes;
      its PYTHONPATH is sparkPythonPath + the spark-core jar + the
      PythonFunction's envVars. Without this, ``google.protobuf``
      resolves to the spark-core jar's ``google/protobuf/*.proto``
      RESOURCE directory — an empty namespace package — and the runner
      dies with "cannot import name 'descriptor'". envVars are captured
      at UDF creation, so setting it here (before the job builds its
      transformWithStateInPandas call) is early enough.
    """
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_FLAG, False):
        return
    zip_path = _shim_zip_path()
    sc.addPyFile(zip_path)
    existing = sc.environment.get("PYTHONPATH")
    sc.environment["PYTHONPATH"] = (
        f"{zip_path}{os.pathsep}{existing}" if existing else zip_path
    )
    setattr(sc, _SHIPPED_FLAG, True)

"""Self-shipping: make the fischer_spark package importable on executor
Python workers regardless of the driver's cwd/sys.path.

This is the sandbox analogue of the north rule's
``spark-submit --py-files engine.zip``: the package is zipped once per
process and registered via ``sc.addPyFile`` — harmless no-op when the
module is already importable on workers.  Every public entry point
(session factory, driver-contract callables, jobs) calls
``ensure_shipped`` first, so a bare SparkSession handed to us by an
external driver still works.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def package_zip() -> str:
    """Zip the installed fischer_spark package (py files only)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"fischer_spark_pkg_{os.getuid()}_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    return zpath


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)

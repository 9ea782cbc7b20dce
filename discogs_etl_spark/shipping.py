"""Ship the discogs_etl_spark package to executors.

RDD/mapPartitions closures reference kernel functions by module, so
executor Python workers must be able to ``import discogs_etl_spark`` —
true on a real cluster (spark-submit --py-files) and NOT guaranteed in a
driver process launched from an arbitrary cwd.  ``ensure_shipped`` zips
the installed package once per SparkContext and registers it via
``addPyFile`` — the same mechanism --py-files uses, so behavior is
identical locally and on a 1000-executor deployment.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark import SparkContext

_MARKER = "_discogs_etl_spark_shipped"


def ensure_shipped(sc: SparkContext) -> None:
    if getattr(sc, _MARKER, False):
        return
    import discogs_etl_spark

    pkg_dir = os.path.dirname(os.path.abspath(discogs_etl_spark.__file__))
    fd, zip_path = tempfile.mkstemp(prefix="discogs_etl_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "discogs_etl_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _MARKER, True)

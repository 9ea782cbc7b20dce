"""Fixture-table loaders.

The correctness/bench fixtures are one Parquet file per table under an
``sf_dir`` (see /root/repo/TESTDATA.md).  Loading is a plain partitioned
Parquet scan — Catalyst owns column pruning and predicate pushdown, so the
loaders deliberately do nothing but ``spark.read.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        # The fixtures' ts physical type has changed across driver rounds
        # (TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS)/NTZ since) —
        # sniff the footer instead of assuming.  micros/millis timestamps
        # Spark reads natively (as TIMESTAMP_NTZ when isAdjustedToUTC is
        # false); only the nanos case needs the legacy long read plus the
        # same ns→us truncation DuckDB applies.  Either way, normalize to
        # TIMESTAMP: under the UTC-pinned session that cast preserves the
        # wall clock exactly, the streaming plane needs TIMESTAMP for
        # watermarks, and DuckDB's naive timestamps collect to the same
        # UTC datetimes.
        if _ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = spark.read.parquet(path)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def _ts_is_nanos(path: str) -> bool:
    import pyarrow.parquet as pq

    try:
        field = pq.ParquetFile(path).schema_arrow.field("ts")
    except (KeyError, OSError):
        return False
    t = field.type
    return getattr(t, "unit", None) == "ns"

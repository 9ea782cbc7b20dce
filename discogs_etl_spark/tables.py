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
    if name == "events":
        # events.parquet stores INT64 TIMESTAMP(NANOS), which Spark's
        # Parquet reader rejects.  Read nanos as long, then truncate to
        # microseconds — the same ns→us truncation DuckDB applies, so the
        # two engines see identical timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

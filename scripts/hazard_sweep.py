"""Sweep every registered query/oracle pair for driver-hasher hazards.

The driver's value-hasher (CORRECTNESS gate) mishandles three result cell
types even when values are logically equal across engines:

- DuckDB HUGEINT / DECIMAL  -> pandas decimal128 object, hashes != int64
- raw BOOLEAN               -> representation differs across engines
- LIST / array cells        -> unhashable, crashes the canonicalizer

This script builds each Spark plan (schema only, no execution) and runs each
DuckDB oracle at sf0.01, then prints any query whose result schema contains a
hazardous type on either side.  Run it after adding queries; CI-equivalent is
tests/test_oracle.py whose canon_cell now raises on the same types.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")


def duck_hazards() -> dict[str, list[str]]:
    import duckdb

    from discogs_etl_spark.registry import all_specs

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    bad: dict[str, list[str]] = {}
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        try:
            tbl = con.execute(spec.oracle).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            bad.setdefault(name, []).append(f"oracle ERROR: {e}")
            continue
        for field in tbl.schema:
            t = str(field.type)
            if t.startswith(("decimal", "list", "large_list", "bool", "struct", "map")):
                bad.setdefault(name, []).append(f"oracle col {field.name}: {t}")
    con.close()
    return bad


def spark_hazards() -> dict[str, list[str]]:
    from pyspark.sql import types as T

    from discogs_etl_spark.registry import all_specs
    from discogs_etl_spark.session import get_spark

    spark = get_spark(
        app_name="hazard-sweep", master="local[8]", shuffle_partitions=8
    )
    bad: dict[str, list[str]] = {}
    for name, spec in all_specs().items():
        try:
            df = spec.fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            bad.setdefault(name, []).append(f"spark ERROR: {e}")
            continue
        for field in df.schema.fields:
            if isinstance(
                field.dataType,
                (T.BooleanType, T.ArrayType, T.MapType, T.StructType, T.DecimalType),
            ):
                # rows-only queries may emit rich types on purpose; still list them
                tag = "" if spec.oracle is not None else " (rows-only)"
                bad.setdefault(name, []).append(
                    f"spark col {field.name}: {field.dataType.simpleString()}{tag}"
                )
    spark.stop()
    return bad


if __name__ == "__main__":
    # argparse for --help parity with the other scripts (r15 review: a
    # bare --help previously launched a full Spark session).
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.parse_args()
    issues: dict[str, list[str]] = {}
    for src in (duck_hazards, spark_hazards):
        for k, v in src().items():
            issues.setdefault(k, []).extend(v)
    if not issues:
        print("OK: no driver-hasher hazards in any registered query/oracle")
    else:
        for k in sorted(issues):
            for line in issues[k]:
                print(f"HAZARD {k}: {line}")
        sys.exit(1)

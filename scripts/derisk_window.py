"""De-risk the evidence-rotation window the way the DRIVER will run it.

Fresh process, PLAIN SparkSession (no tuned builder confs), full value
compare vs DuckDB at sf0.01 for the first 50 registered queries — the
exact set the verification driver's CORRECTNESS gate checks.  This has
caught session-sensitivity (timezone, shuffle-partition, active-session
leakage) every round that the tuned pytest fixture session hides.

Usage::

    python scripts/derisk_window.py            # all 50, stop on first fail
    python scripts/derisk_window.py --keep-going
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DERISK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v) -> str:
    # mirror of tests/test_oracle.canon_cell, minus the pytest dependency;
    # hazards raise so the script fails loudly like the driver would
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        raise AssertionError("boolean result cell — driver-hash unsafe")
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        raise AssertionError("Decimal result cell — driver-hash unsafe")
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "nan" if math.isnan(f) else repr(f)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        raise AssertionError("array result cell — driver-hash unsafe")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-going", action="store_true")
    ap.add_argument("--names", nargs="*", help="subset of window names to run")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from discogs_etl_spark.registry import all_specs

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    specs = list(all_specs().items())[:50]
    if args.names:
        wanted = set(args.names)
        specs = [(n, s) for n, s in specs if n in wanted]
    failures = []
    for i, (name, spec) in enumerate(specs, 1):
        t0 = time.monotonic()
        try:
            sdf = spec.fn(spark, SF_DIR)
            scols, srows = canon(sdf.columns, sdf.collect())
            if spec.oracle is None:
                status = f"rows-only ({len(srows)})"
            else:
                cur = con.execute(spec.oracle)
                dcols = [d[0] for d in cur.description]
                dcols, drows = canon(dcols, cur.fetchall())
                assert scols == dcols, f"schema {scols} != {dcols}"
                assert len(srows) == len(drows), f"rows {len(srows)} != {len(drows)}"
                assert srows == drows, "value multiset mismatch"
                status = f"match ({len(srows)} rows)"
        except Exception as exc:  # noqa: BLE001 - report and continue
            status = f"FAIL: {type(exc).__name__}: {exc}"
            failures.append(name)
            if not args.keep_going:
                print(f"[{i:2}/50] {name}: {status}", flush=True)
                return 1
        print(f"[{i:2}/50] {name}: {status}  ({time.monotonic() - t0:.2f}s)", flush=True)
    print(f"\nwindow de-risk: {len(specs) - len(failures)}/{len(specs)} green")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

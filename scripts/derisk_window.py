"""De-risk the evidence-rotation window the way the DRIVER will run it.

Fresh process, PLAIN SparkSession (no tuned builder confs) with only
the runtime knobs the driver contract itself applies — the
``__spark_entry__.queries()`` wrapper calls
``session.tune_for_correctness`` before every builder, so the faithful
replica does too (UTC session timezone being the critical one).  Full
value compare vs DuckDB at sf0.01 for the first 50 registered queries —
the exact set the verification driver's CORRECTNESS gate checks.  This
has caught session-sensitivity (timezone, shuffle-partition,
active-session leakage) every round that the tuned pytest fixture
session hides.

TIMEZONE, fully mapped (r7, swept under TZ=Asia/Kolkata at sf0.01).
Two independent knobs exist and BOTH must be UTC for full 366/366
parity, which is exactly how the driver runs (six rounds of green
driver artifacts, including timestamp-returning and epoch-numeric
queries in the same run, are only consistent with a UTC driver box):

- the SESSION timezone (``spark.sql.session.timeZone``) governs SQL
  instant arithmetic — ``epoch()``/``window()`` queries need it UTC;
  the contract wrapper (``__spark_entry__.queries()`` →
  ``tune_for_correctness``) pins it, so this can never regress in a
  real driver run.  Raw-session sensitivity: 4 queries
  (stats_circular_mean_hour, scan_statistic_errors,
  stream_events_hourly, stream_hourly_error_rate).
- the PYTHON PROCESS timezone governs how collected TimestampType
  cells render (``datetime.fromtimestamp`` uses the process zone, NOT
  the session zone — measured, Spark 4.1).  Under session=UTC but
  process=+05:30, the 9 timestamp-RETURNING queries shift on collect
  while DuckDB's naive timestamps do not.  No contract knob can pin
  the driver's process zone, hence this script pins its own (below)
  for parity, and the r9 hardening plan is to cast returned timestamp
  columns to TIMESTAMP_NTZ (collects the UTC wall clock regardless of
  process zone — measured) once re-window slots are free.

Usage::

    python scripts/derisk_window.py            # all 50, stop on first fail
    python scripts/derisk_window.py --keep-going
    python scripts/derisk_window.py --all --raw --tz Asia/Kolkata  # probe
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DERISK_SF_DIR", "/root/testdata/sf0.01")
# Imported, not mirrored (same rule as empty_probe.py): an 11th
# registered table must get its DuckDB view automatically or every
# oracle touching it fails with a catalog error.
from discogs_etl_spark.tables import TABLE_NAMES as TABLES  # noqa: E402


# The canonicalizer is IMPORTED from the local oracle replica, not
# mirrored — a drift between this script and tests/test_oracle.py would
# recreate exactly the false-green this de-risk exists to prevent.
# (tests/ is a namespace package from the repo root; importing pulls in
# the registry load, which the script needs anyway.)
from tests.test_oracle import canon_rows as canon  # noqa: E402


def _check(cond: bool, msg: str) -> None:
    # NOT a bare assert: `python -O` strips asserts, which would turn
    # every comparison below into a vacuous green (ADVICE r6).
    if not cond:
        raise AssertionError(msg)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-going", action="store_true")
    ap.add_argument("--names", nargs="*", help="subset of window names to run")
    ap.add_argument(
        "--all",
        action="store_true",
        help="run the ENTIRE registry, not just the 50-name window — "
        "catches plain-session sensitivity in backlog queries BEFORE a "
        "future rotation windows them",
    )
    ap.add_argument(
        "--raw",
        action="store_true",
        help="skip the driver contract's tune_for_correctness — stricter "
        "than any real driver run (see module docstring for known "
        "raw-mode TZ sensitivities)",
    )
    ap.add_argument(
        "--tz",
        default="UTC",
        help="process timezone to pin BEFORE the JVM starts (driver "
        "parity = UTC, the default); pass 'system' to leave the "
        "environment untouched for sensitivity probing",
    )
    ap.add_argument(
        "--cores",
        type=int,
        default=8,
        help="local[N] core count — run with --cores 2 (which also sets "
        "spark.sql.shuffle.partitions=2) for the per-round "
        "partition-count-invariance check on changed queries "
        "(--names <flagged...>), replacing the hand-rolled local[2] "
        "probe previous rounds re-typed",
    )
    args = ap.parse_args()

    if args.tz != "system":
        import time as _time

        os.environ["TZ"] = args.tz
        _time.tzset()

    import duckdb
    from pyspark.sql import SparkSession

    from discogs_etl_spark.registry import all_specs
    from discogs_etl_spark.session import tune_for_correctness

    builder = SparkSession.builder.master(f"local[{args.cores}]")
    if args.cores <= 2:
        # The invariance probe wants the SHUFFLE layout to shrink with
        # the cores, or a 200-partition plan on 2 cores tests nothing
        # about partition-count sensitivity.
        builder = builder.config("spark.sql.shuffle.partitions", str(args.cores))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if not args.raw:
        # exactly what __spark_entry__.queries() does before each builder
        tune_for_correctness(spark)
    if args.cores <= 2:
        # Re-apply AFTER tune_for_correctness, which resets the shuffle
        # count to max(cpus, 8) — without this the invariance probe
        # would claim a 2-partition layout while silently running 32
        # (caught by the r11 review pass).
        spark.conf.set("spark.sql.shuffle.partitions", str(args.cores))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    specs = list(all_specs().items())
    if not args.all:
        specs = specs[:50]
    if args.names:
        wanted = set(args.names)
        specs = [(n, s) for n, s in specs if n in wanted]
    failures = []
    total = len(specs)
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
                _check(scols == dcols, f"schema {scols} != {dcols}")
                _check(len(srows) == len(drows), f"rows {len(srows)} != {len(drows)}")
                _check(srows == drows, "value multiset mismatch")
                status = f"match ({len(srows)} rows)"
        except Exception as exc:  # noqa: BLE001 - report and continue
            status = f"FAIL: {type(exc).__name__}: {exc}"
            failures.append(name)
            if not args.keep_going:
                print(f"[{i:2}/{total}] {name}: {status}", flush=True)
                return 1
        print(f"[{i:2}/{total}] {name}: {status}  ({time.monotonic() - t0:.2f}s)", flush=True)
    print(f"\nwindow de-risk: {len(specs) - len(failures)}/{len(specs)} green")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Targeted Spark-vs-DuckDB oracle check at ANY fixture scale factor.

The pytest oracle gate (tests/test_oracle.py) runs the whole registry at
sf0.01; optimization rounds additionally need "this restructured query
is value-identical at sf0.001 AND sf0.1" evidence before a rewrite can
claim equivalence (round rule: prove equivalence with the oracle before
moving on).  This script is that instrument::

    python scripts/oracle_check.py dedup_ngram_jaccard dedup_containment
    python scripts/oracle_check.py --sf-dirs /root/testdata/sf0.001 -- q1

With no --sf-dirs it checks all three fixture SFs.  Comparison is the
same canonicalization as tests/test_oracle.py (column sets, row count,
order-insensitive canonical value multiset, DriverHasherHazard types
fail loudly).  Exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from discogs_etl_spark.registry import all_specs
from discogs_etl_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon():
    spec = importlib.util.spec_from_file_location(
        "oracle_canon",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "test_oracle.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.canon_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        default="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
        help="comma-separated fixture dirs to check (default: all three)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import duckdb

    canon_rows = _canon()
    specs = all_specs()
    unknown = [n for n in args.names if n not in specs]
    if unknown:
        sys.exit(f"not registered: {unknown}")
    no_oracle = [n for n in args.names if specs[n].oracle is None]
    if no_oracle:
        sys.exit(f"rows-only (no oracle) queries: {no_oracle}")

    spark = get_spark(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for sf_dir in args.sf_dirs.split(","):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in args.names:
            spec = specs[name]
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
            detail = ""
            if ok:
                _, s_canon = canon_rows(scols, srows)
                _, d_canon = canon_rows(dcols, drows)
                ok = s_canon == d_canon
                if not ok:
                    mism = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
                    detail = f" first diffs: {mism[:2]}"
            else:
                detail = (
                    f" cols {sorted(scols)} vs {sorted(dcols)};"
                    f" rows {len(srows)} vs {len(drows)}"
                )
            tag = "OK  " if ok else "FAIL"
            print(f"{tag} {os.path.basename(sf_dir):8s} {name}{detail}")
            failures += 0 if ok else 1
        con.close()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

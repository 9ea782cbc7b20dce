"""Local replica of the driver's DuckDB-oracle correctness gate.

For every registered query with an oracle: run the Spark plan and the
DuckDB SQL at sf0.01, then compare row count, column names, and an
order-insensitive canonical value multiset (the moral equivalent of the
driver's value hash).  Exact equality — no tolerances — because the query
builders are written to be bit-deterministic (see registry.py).
"""

from __future__ import annotations

import math

import pytest

from discogs_etl_spark.registry import all_specs
from tests.conftest import SF_ORACLE


class DriverHasherHazard(AssertionError):
    """A cell type the DRIVER's value-hasher mishandles reached a result.

    The driver is stricter than a value-normalizing comparison: Decimal
    (DuckDB HUGEINT → decimal128) hashes differently from int64 even for
    equal values, raw booleans round-trip differently across engines, and
    list cells crash its pandas canonicalizer outright (unhashable).  The
    local harness therefore FAILS on these types instead of normalizing,
    so local green predicts driver green.  Queries must emit BIGINT/INT
    casts and scalar (joined-string or exploded) cells instead.
    """


def canon_cell(v):
    """Canonical string for one cell, identical for equal logical values
    across engine-native widths (int32/int64, numpy scalars, date/datetime).
    Raises DriverHasherHazard on Decimal / bool / list cells — see above."""
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        raise DriverHasherHazard(
            "boolean result cell — cast to INT on both sides (driver-hash unsafe)"
        )
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        raise DriverHasherHazard(
            "Decimal result cell (DuckDB HUGEINT/DECIMAL?) — CAST to BIGINT/DOUBLE "
            "in the oracle (driver hashes decimal128 differently from int64)"
        )
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        raise DriverHasherHazard(
            "array result cell — unhashable in the driver's canonicalizer; "
            "emit array_join(...) or posexplode instead"
        )
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


ORACLE_SPECS = {n: s for n, s in all_specs().items() if s.oracle is not None}
ROWS_ONLY_SPECS = {n: s for n, s in all_specs().items() if s.oracle is None}


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = ORACLE_SPECS[name]
    sdf = spec.fn(spark, SF_ORACLE)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row counts differ ({len(srows)} vs {len(drows)})"

    _, s_canon = canon_rows(scols, srows)
    _, d_canon = canon_rows(dcols, drows)
    mism = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
    assert s_canon == d_canon, (
        f"{name}: value mismatch; first diffs: {mism[:3]}"
    )


@pytest.mark.parametrize("name", sorted(ROWS_ONLY_SPECS))
def test_rows_only_query_runs(spark, name):
    spec = ROWS_ONLY_SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


HAZARD_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "BOOLEAN")


@pytest.mark.parametrize("name", sorted(ORACLE_SPECS))
def test_oracle_schema_driver_hash_safe(duck, name):
    """Every oracle's RESULT TYPES must be driver-hasher safe — DuckDB
    silently widens SUM(BIGINT) to HUGEINT (arrow decimal128), which the
    driver's pandas canonicalizer hashes differently from Spark's int64
    even for equal values.  DESCRIBE exposes the types without executing
    the query, so this guards all ~200 oracles in seconds."""
    desc = duck.execute(f"DESCRIBE {ORACLE_SPECS[name].oracle}").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in desc
        if any(typ.startswith(h) for h in HAZARD_DUCK_TYPES)
    ]
    assert not offenders, (
        f"{name}: oracle emits driver-hash-unsafe types {offenders}; "
        "CAST to BIGINT/DOUBLE/INT in the oracle SQL"
    )

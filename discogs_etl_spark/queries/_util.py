"""Shared determinism helpers for oracle-checked queries.

Floating-point sums are order-dependent and Spark's partial aggregation
order differs from DuckDB's, so every money/measure aggregate is computed
in exact DECIMAL arithmetic and only cast back to DOUBLE at the end —
identical inputs then give bit-identical doubles on both engines.  See
registry.py module docstring for the full rule set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, prec: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: Column | str, scale: int = 2, prec: int = 18) -> Column:
    """Order-independent SUM: exact decimal accumulation, double result."""
    return F.sum(dec(col, scale, prec)).cast("double")


def davg(col: Column | str, scale: int = 2, prec: int = 18) -> Column:
    """Order-independent AVG: decimal sum / count, divided as doubles."""
    return F.sum(dec(col, scale, prec)).cast("double") / F.count(F.lit(1))


# SQL-side twins (DuckDB dialect) used when composing oracle strings.
def sql_dsum(expr: str, scale: int = 2, prec: int = 18) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2, prec: int = 18) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE) / COUNT(*))"

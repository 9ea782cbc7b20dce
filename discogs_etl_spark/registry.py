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
# Round 4 rotation (r1-r3 evidenced 141/360 unique, all ever-green):
# 50 names with ZERO driver rows, drawn per the round-3 plan — the
# BENCHED extension families first (so the headline bench set is 100%
# driver-evidenced), then everything CHANGED this round, then stratum (a)
# of the backlog (the round-3 extension pass: graph family, bloom join,
# streams, stats_* families, retrieval, BPE, sampling, data quality,
# sketches) in registration order.  Every name passes the local
# one-session driver replica (tests/test_oracle.py), so rotation is pure
# evidence collection.  ~3 more rounds at 50/round drains the remaining
# backlog (stratum (b): second-half dedup variants, recsys/bandit evals,
# calendars, remaining stats tail).  Names not listed keep registration
# order after these; unknown names are rejected by a test.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # benched, never driver-checked — headline set gets full evidence
    "graph_triangle_count",
    "graph_pagerank_coorder",
    "sessions_max_concurrency",
    "kmeans_embeddings_fixed",
    "text_search_inverted_topk",
    "text_search_bm25_topk",
    "lm_bigram_surprisal",
    "feature_hashing_vectorize",
    # changed or added this round — needs fresh evidence
    # (dedup_minhash_lsh is r2-green but its builder path was refactored
    # this round — minhash_bands_df split + cap parameters — so the
    # rotation rule "changed since last green row" re-windows it)
    "corpus_heaps_law_fit",
    "corpus_token_budget_planner",
    "stats_ks_two_sample",
    "supplier_greedy_cover",
    "stream_events_lake_roundtrip",
    "stream_hourly_error_rate",
    "dedup_minhash_lsh",
    # stratum (a): round-3 extension families, zero driver rows
    "dedup_jaccard_prefix_filter",
    "bpe_learn_merges",
    "join_bloom_runtime_filter",
    "graph_label_propagation",
    "graph_clustering_coefficient",
    "assoc_rules_coorder",
    "agg_mode_per_user",
    "agg_equidepth_deciles",
    "attribution_first_vs_last",
    "data_quality_report",
    "data_quality_referential",
    "stream_sliding_window",
    "stream_global_topk_users",
    "stream_static_enrich",
    "keywords_per_doc",
    "sample_weighted_per_source",
    "stats_benford_first_digit",
    "events_dau_wau_stickiness",
    "stats_hhi_supplier_concentration",
    "orders_interpurchase_gap",
    "stats_welch_ttest",
    "stats_chi_square_lang_source",
    "stats_entropy_by_source",
    "stats_gini_revenue_by_nation",
    "stats_zipf_slope_by_lang",
    "stats_ewma_per_user",
    "stats_mad_by_event_type",
    "stats_seasonal_adjust_daily",
    "stats_wilson_ci_daily",
    "stats_trend_slope_per_user",
    "orders_cohort_ltv",
    "skew_report_join_keys",
    "sketch_countmin_heavy_hitters",
    "xml_datasource_scan",
    "xml_datasource_stream_scan",
    # ROUND-5 ROTATION NOTE: once CORRECTNESS_r04 lands green, replace
    # this tuple with the next 50 of the 171 still-never-driver-checked
    # names, by registration order (stratum (a) is drained after r04;
    # what remains is stratum (b) — the second-half additions).  First
    # up by registration order: the multimodal family (resize_nn,
    # audio_frames, phash_dedup, media_summary), window/agg tail
    # (time_weighted_avg, profile, incremental_agg_merge, histogram,
    # anomaly_zscore, pareto, null_safe_equality, scd2, markov,
    # backlog_curve, funnel_time_to_convert, explode_outer, variant,
    # top_paths, rfm, rolling_median, burst_users, growth_mom,
    # new_vs_returning, weighted_median, gap_islands,
    # approx_percentile_eval, rolling_percentile_7d, higher_order_maps,
    # table_diff, range_band_pricing, try_safe_casts,
    # duplicate_payments, skyline, link_prediction, business_days,
    # abc_xyz, bandit_greedy_replay, recsys_holdout_hitrate,
    # littles_law, fiscal_445, scorecard, topn_others, conformance,
    # single_source_risk, revenue_bridge, edge_triangle_support,
    # allocation, wilson_lower_bound, runlength, aging_buckets,
    # degree_assortativity) — then ~121 remain for r06-r07; plus any
    # query whose code changed in round 5.  Every candidate is green in
    # the local one-session driver replica, so rotation stays pure
    # evidence collection.
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

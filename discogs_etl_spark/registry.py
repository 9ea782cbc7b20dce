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
# Round 3: the 3 round-2 reds (TIMESTAMP_NTZ family, fixed this round),
# the 2 round-1 greens that regressed against the regenerated fixtures
# (same fix), then every query that has NEVER been in a driver window —
# the TPC-H tail, the curation ops, star-contraction CC, the Python
# extension points, and 2 streaming ops.  42 names; the ~8 remaining
# slots go to queries newly added this round (appended at the end of this
# tuple as they land).  Names not listed keep registration order after
# these; unknown names are rejected by a test.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # round-2 reds, fixed (NTZ/micros root cause + join-key fix)
    "range_join_bucketed",
    "stream_events_hourly",
    "stream_session_window",
    # round-1 greens that regressed vs regenerated fixtures, re-fixed
    "sessionization_events",
    "window_lag_lead_gap",
    # never driver-checked: events/window family (also NTZ-fixed)
    "window_sliding_range_events",
    "stream_dedup_watermark",
    "stream_stream_join",
    "funnel_view_click_purchase",
    "window_distribution_funcs",
    # never driver-checked: TPC-H tail
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    # never driver-checked: scalar/agg/sort/nested tail
    "scalar_datetime_extended",
    "scalar_math_extended",
    "agg_corr_exact",
    "sort_nulls_ordering",
    "nested_struct_roundtrip",
    # never driver-checked: curation ops
    "text_repetition_score",
    "text_redact_pii",
    "decontaminate_eval_overlap",
    "corpus_mix_sources",
    "corpus_shuffle_shards",
    "boilerplate_prefix_groups",
    "quality_gate_quantile",
    # never driver-checked: dedup variants
    "dedup_ngram_crossdoc",
    "dedup_fuzzy_keep_one",
    "dedup_cc_starcontraction",
    # never driver-checked: Python extension points
    "mapinarrow_token_stats",
    "udtf_token_runs",
    "pandas_udaf_lang_iqr",
    # ROUND-4 ROTATION NOTE: once CORRECTNESS_r03 lands, replace this
    # tuple's contents with 50 names from the still-never-driver-checked
    # set.  That set now has two strata: (a) the round-3 extension pass
    # frozen out of this window (BM25/PageRank/k-means/BPE/prefix-filter,
    # the stats_* family, attribution, data_quality_report, sliding/
    # top-k streams, keywords, assoc rules, mode/deciles/clustering-
    # coefficient, weighted sampling, bloom join, Benford/DAU-WAU/HHI/
    # gap), and (b) the ~130 second-half additions (substring/winnowing/
    # containment/ensemble/SemDeDup/medoid dedup, sketches, survival/
    # KS/PSI/DiD stats, PCA, sweep-line, calendars, recsys/bandit/probe
    # evals, streaming error rate, ...).  Every one passes the local
    # one-session driver simulation (tests/test_oracle.py over the full
    # registry), so rotation is pure evidence collection, not risk —
    # prefer stratum (a) first (older code, zero driver rows), then (b)
    # by registration order; ~5 rounds drains the backlog.
    # new this round (appended as they land)
    "xml_ingest_roundtrip",
    "join_skew_salted",
    "asof_join_tolerance",
    "events_retention_cohorts",
    "window_running_distinct_users",
    "embedding_quantize_int8",
    "dedup_cluster_stats",
    "lang_id_confusion",
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

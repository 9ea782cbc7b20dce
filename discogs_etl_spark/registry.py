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
# Round 11 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land; the round-6 guard
# compared against the unbounded audit and the driver landing
# CORRECTNESS_r06.json retroactively broke the build.
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=10: registered=369 unique_checked=369 ever_green=369 \
#     never_checked=0 net_new_last_round=1
# The ledger is fully closed (zero never-checked, zero latest-round-red,
# zero net-new this round), so the window is pure post-backlog policy:
# (a) mechanical re-window flags lead (scripts/rewindow_check.py vs the
# r10-end rev be987c9 — FOURTEEN flags: thirteen are the verdict-r10 #1
# empty-input hardening wave — every query that errored on zero-row
# inputs in the r10 boundary map now degrades to NULL/empty instead
# (NULLIF / CASE-NULL guards with matching oracle edits for the 8 ANSI
# zero-count divisions; first()->None short-circuits for the two BPE
# argmax reads; an n=0 Python-scalar guard for pagerank; an isEmpty
# gate before the IVF k-means fit; a no-files-written graceful return
# for the stream-lake read-back — sf0.01 oracle values unchanged on all
# 13, proven by the local driver replica before windowing, and the
# committed scripts/empty_probe.py now reports 369/369 clean on a
# zero-row fixture set); the fourteenth is
# embedding_power_iteration_pc1_gram, whose non-integer shuffle-knob
# fallback now reads defaultParallelism instead of a constant 32 (r10
# ADVICE — the pre-explode spread must track cluster size); then (b)
# OLDEST-EVIDENCE-FIRST rotation — registered
# names ordered by last-green round ascending (registration order among
# ties, computed by evidence_audit's stale_order_names and filled by
# round_start.py), continuing the round-1 cohort from where the r10
# window stopped (stream_stateful_user_stats / window_lag_lead_gap /
# q6_forecast_revenue onward per the r10 note's plan).  Every name
# passes the local one-session driver replica (tests/test_oracle.py)
# and the plain-session derisk_window.py sweep, so rotation stays pure
# evidence collection.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # mechanical re-windows (changed code this round): the 13-query
    # empty-input hardening wave (verdict r10 #1) — zero-row inputs now
    # yield NULL metrics or empty results, never ANSI DIVIDE_BY_ZERO /
    # NoneType reads / zero-row fits; clean-data values unchanged
    "graph_pagerank_coorder",
    "activation_latency_percentiles",
    "users_reactivation_rate",
    "graph_modularity_lpa",
    "similarity_ivf_topk",
    "bpe_learn_merges",
    "dedup_minhash_eval",
    "embedding_triplet_check",
    "bpe_compression_eval",
    "retrieval_rank_agreement",
    "dedup_granularity_compare",
    "events_harmonic_peak_hour",
    "stream_events_lake_roundtrip",
    # mechanical re-window (r10 ADVICE): the gram twin's shuffle-knob
    # fallback now scales with defaultParallelism instead of a constant
    "embedding_power_iteration_pc1_gram",
    # oldest-evidence-first rotation fill (last green: round 1),
    # continuing the r10 cohort
    "stream_stateful_user_stats",
    "window_lag_lead_gap",
    "q6_forecast_revenue",
    "window_distribution_funcs",
    "window_sliding_range_events",
    "scalar_datetime_extended",
    "scalar_math_extended",
    "agg_corr_exact",
    "sort_nulls_ordering",
    "range_join_bucketed",
    "nested_struct_roundtrip",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_count",
    "q20_potential_promotion",
    "join_skew_salted",
    "asof_join_tolerance",
    "events_retention_cohorts",
    "window_running_distinct_users",
    "lang_id_confusion",
    "text_repetition_score",
    "dedup_ngram_crossdoc",
    "decontaminate_eval_overlap",
    "text_redact_pii",
    "corpus_mix_sources",
    "corpus_shuffle_shards",
    "boilerplate_prefix_groups",
    # ROUND-12 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=11 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r11-end-rev>`: mechanical
    # re-window flags lead, oldest-evidence-first rotation fills (after
    # r11 lands green the stalest cohort continues from where this
    # window stopped — `evidence_audit.py --stale-order` gives the
    # basis).
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

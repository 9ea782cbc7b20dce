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
# Round 9 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over a
# FIXED round range — the note is stamped with the round it describes so
# the suite stays green after later artifacts land; the round-6 guard
# compared against the unbounded audit and the driver landing
# CORRECTNESS_r06.json retroactively broke the build.
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=8: registered=368 unique_checked=366 ever_green=366 \
#     never_checked=2 net_new_last_round=40
# (registered=368 / never_checked=2 because this round registers TWO
# net-new queries — text_search_bm25_pruned_topk and its
# recall/effectiveness eval text_search_bm25_pruned_recall; the audit
# counts the live registry against the landed artifacts, so net-new
# names are never-checked by definition until CORRECTNESS_r09 lands.)
# The never-driver-checked backlog is EMPTY (the ledger closed with
# CORRECTNESS_r08), so this round adopts the post-backlog window policy
# the r8 rotation note scheduled: (a) mechanical re-window flags lead
# (scripts/rewindow_check.py vs the r8-end rev 39b1653 — this round's
# flags are the verdict-r8 hardening edits: the TIMESTAMP_NTZ cast on
# the 9 timestamp-returning queries from the SCALE_NOTES r7 TZ audit,
# plus the embedding_power_iteration_pc1 single-scan fold); then
# (b) OLDEST-EVIDENCE-FIRST rotation — registered names ordered by
# last-green round ascending (registration order among ties, computed
# by evidence_audit's stale_order_names and filled by round_start.py)
# so driver evidence keeps refreshing instead of going permanently
# stale.  The fill below is the round-1 cohort (last green = r1).
# Every name passes the local one-session driver replica
# (tests/test_oracle.py) and the plain-session derisk_window.py sweep,
# so rotation stays pure evidence collection.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # net-new this round (never driver-checked): the statically-pruned
    # production-path BM25 twin (verdict r8 #6) and its
    # recall/effectiveness eval (driver-checked honesty loop)
    "text_search_bm25_pruned_topk",
    "text_search_bm25_pruned_recall",
    # mechanical re-windows (changed code this round): TIMESTAMP_NTZ
    # output hardening (9) + power-iteration single-scan fold (1)
    "sessionization_events",
    "events_hourly_agg",
    "events_runlength_encode",
    "stream_events_hourly",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_stream_join",
    "stream_sliding_window",
    "stream_hourly_error_rate",
    "embedding_power_iteration_pc1",
    # mechanical re-windows: crossJoin broadcast-hint sweep (the r8
    # verdict's "every crossJoin broadcasts" claim was false at these
    # two builders' sites; now hinted and pinned by
    # tests/test_plans.py::test_every_crossjoin_is_broadcast_hinted)
    "funnel_view_click_purchase",
    "corpus_heaps_law_fit",
    # oldest-evidence-first rotation fill (last green: round 1)
    "q1_pricing_summary",
    "agg_rollup_lineitem",
    "agg_cube_orders",
    "agg_distinct_parts_per_flag",
    "agg_variance_price",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "join_broadcast_part_agg",
    "join_left_order_counts",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_full_outer_nation_presence",
    "window_topk_orders_per_customer",
    "window_rank_dense_rank",
    "window_running_total_events",
    "manifest_latest_per_month",
    "set_union_all_lineitem",
    "set_intersect_partkeys",
    "set_except_partkeys",
    "scalar_string_part",
    "scalar_date_orders",
    "scalar_json_events",
    "scalar_hash_customer",
    "scalar_array_embeddings",
    "agg_grouping_sets_events",
    "pivot_orders_status",
    "unpivot_part_measures",
    "join_right_orders_customer",
    "join_cross_nation_region",
    "agg_argmax_order_per_customer",
    "agg_percentiles_price",
    "explode_tokens_positional",
    "scalar_url_documents",
    "scalar_map_events_props",
    "set_union_distinct_keys",
    "subquery_correlated_scalar",
    # ROUND-10 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=9 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r9-end-rev>`: mechanical re-window
    # flags lead, oldest-evidence-first rotation fills (after r09 lands
    # green the stalest cohort is the remaining round-1 names —
    # agg_boolean_countif / scalar_higher_order_arrays onward).
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

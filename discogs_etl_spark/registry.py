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
# Round 14 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land;
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=13: registered=369 unique_checked=369 ever_green=369 \
#     never_checked=0 net_new_last_round=0
# The ledger stays fully closed (zero never-checked, zero
# latest-round-red, zero net-new), so the window is pure post-backlog
# policy: (a) mechanical re-window flags lead (scripts/rewindow_check.py
# vs the r13-end rev 6efeba3 — ZERO flags: r14 is a gate-hardening
# round, no registered query module changed); then (b)
# OLDEST-EVIDENCE-FIRST rotation — registered names ordered by
# last-green round ascending (registration order among ties, printed by
# `evidence_audit.py --stale-order` and filled by round_start.py),
# continuing the round-1 cohort from where the r13 window stopped
# (graph_degree_assortativity / customer_wallet_share_deciles /
# credit_risk_exposure onward per the r13 note's plan).  Every name
# passes the local one-session driver replica (tests/test_oracle.py)
# and the plain-session derisk_window.py sweep, so rotation stays pure
# evidence collection.
#
# EVIDENCE-FRESHNESS SLO (machine-enforced since round 14 by
# tests/test_evidence_freshness.py, driven by
# scripts/evidence_audit.py just like the timing/plansweep gates):
# no registered query's last driver-green round may be older than
# MAX_EVIDENCE_AGE_ROUNDS = 8 rounds behind the newest landed
# CORRECTNESS artifact.  Rationale: the driver re-checks 50 names per
# round, so a correctly-rotated 369-name registry revisits every name
# within ceil(369 / 50) = 8 rounds; evidence older than that means a
# window was skipped or mis-composed (rotation not oldest-first), which
# previously reddened nothing.  The test also asserts the CURRENT
# tuple is a prefix-faithful oldest-evidence-first slice, so a
# mis-rotated tuple fails BEFORE its round lands, not 8 rounds later.
# The ceil(369/50) derivation assumes full-window rotation, while the
# composition gate sanctions up to MAX_FLAG_BLOCK=25 re-window slots
# per round — that tension is reconciled at COMPOSITION time, not by
# widening the bound: the freshness test also requires every
# SLO-endangered name (evidence_audit.endangered_names — would exceed
# the bound once the next artifact lands) to appear in the current
# window, so a flag block large enough to starve the rotation reddens
# the round it is composed, forcing a conscious split or a documented
# bound change rather than a silent SLO trip several rounds later.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # oldest-evidence-first rotation fill (last green: round 6 for the
    # first 37 names, round 7 for the rest), continuing from the name
    # after the r13 window's end per evidence_audit --stale-order
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
    "discount_response_curve",
    "graph_edge_formation_rate",
    "pricing_consistency_audit",
    "priority_sla_fairness",
    "path_entropy_by_outcome",
    "shipping_consolidation_opportunity",
    "users_activity_bitmask",
    "xml_datasource_stream_scan",
    "xml_ingest_label_values",
    "lake_maintenance_roundtrip",
    "embedding_random_projection",
    "similarity_ann_multiprobe",
    "similarity_ann_multiprobe_recall",
    "vocab_oov_rate",
    "ngram_next_word_top",
    "similarity_sparse_cosine_pairs",
    "contrastive_pair_mining",
    "vocab_hapax_rate",
    "dedup_containment",
    "quality_percentile_by_lang",
    "embedding_dispersion_by_label",
    "dedup_substring_windows",
    "text_search_phrase",
    # ROUND-15 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=14 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r14-end-rev>`: mechanical
    # re-window flags lead, oldest-evidence-first rotation fills (after
    # r14 lands green the stalest cohort continues from where this
    # window stopped — `python scripts/evidence_audit.py --stale-order`
    # prints the basis).  tests/test_evidence_freshness.py now reddens
    # a skipped or mis-composed rotation automatically.
)

# Evidence-freshness bound enforced by tests/test_evidence_freshness.py.
# 369 names / 50 driver checks per round => every name re-verified
# within ceil(369/50) = 8 rounds under correct oldest-first rotation.
MAX_EVIDENCE_AGE_ROUNDS = 8


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

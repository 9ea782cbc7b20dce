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
# Round 16 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land;
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=15: registered=374 unique_checked=369 ever_green=369 \
#     never_checked=5 net_new_last_round=0
# The ledger stays fully closed (zero never-checked, zero
# latest-round-red, zero net-new), so the window is pure post-backlog
# policy: (a) mechanical re-window flags lead (scripts/rewindow_check.py
# vs the r15-end rev 431d27a — ZERO flags at composition time; any new
# or oracle-changed query this round lands prepends itself here in the
# SAME commit that changes it, and never-checked names sort to the head
# of the rotation basis anyway); then (b) OLDEST-EVIDENCE-FIRST rotation
# — registered names ordered by last-green round ascending (registration
# order among ties, printed by `evidence_audit.py --stale-order` and
# filled by round_start.py), continuing into the round-8 cohort
# (events_value_winsorize / stats_psi_value_drift / ... — the stalest
# evidence on the ledger is now round 8, 23 names) and on through the
# round-9 cohort from where the r15 window stopped.
# Every name passes the local one-session driver replica
# (tests/test_oracle.py) and the plain-session derisk_window.py sweep,
# so rotation stays pure evidence collection.
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
    # mechanical flag block (20, rewindow_check vs 431d27a; the five
    # never-checked names registered this round lead so the evidenced
    # re-window flags + rotation fill stay one contiguous run): the five
    # new queries (r15 verdict tasks #1-#2 plus the MinHash capped
    # twins), the phash family (tokenizer fix r15-ADVICE #1, real-aHash
    # plumbing, zero-dimension-PNG ValueError fix reach their
    # hash/decode stages), the decode family (decode_png edit), and the
    # MinHash/CC/impact family (the capped-twin factoring of
    # _MINHASH_ORACLE into shared fragments — composed oracles
    # byte-identical, but the rule is executable-granularity and
    # over-re-windows by design)
    "multimodal_phash_capped_pairs",
    "multimodal_phash_dropped_buckets",
    "curation_dedup_media",
    "dedup_minhash_capped_pairs",
    "dedup_minhash_dropped_buckets",
    "dedup_connected_components",
    "dedup_minhash_eval",
    "dedup_minhash_lsh",
    "dedup_fuzzy_keep_one",
    "dedup_cc_starcontraction",
    "dedup_cluster_stats",
    "corpus_token_budget_planner",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
    "multimodal_media_summary",
    "dedup_medoid_selection",
    "dedup_impact_report",
    "corpus_effective_tokens",
    "dedup_impact_by_source",
    # oldest-evidence-first rotation fill (last green: rounds 8-9)
    "events_value_winsorize",
    "stats_psi_value_drift",
    "stats_ks_exponential_gaps",
    "stats_diff_in_diff",
    "stats_theil_sen_trend",
    "stats_circular_mean_hour",
    "stats_dispersion_order_size",
    "events_error_budget_burn",
    "forecast_snaive_backtest",
    "spc_pchart_returns",
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
    "q1_pricing_summary",
    "agg_rollup_lineitem",
    "agg_cube_orders",
    "agg_distinct_parts_per_flag",
    "agg_variance_price",
    "q3_shipping_priority",
    "q5_regional_revenue",
    # ROUND-17 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=16 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r16-end-rev>`: mechanical
    # re-window flags lead, oldest-evidence-first rotation fills (after
    # r16 lands green the stalest cohort continues from where this
    # window stopped — `python scripts/evidence_audit.py --stale-order`
    # prints the basis).  tests/test_evidence_freshness.py reddens a
    # skipped or mis-composed rotation automatically.
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

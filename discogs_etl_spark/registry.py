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
# Round 17 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land;
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=16: registered=378 unique_checked=374 ever_green=374 \
#     never_checked=4 net_new_last_round=5
# The four never-checked names are curation_dedup_corpus,
# curation_dedup_media_capped, curation_profile_table, and
# curation_search_corpus, REGISTERED THIS ROUND in the commits that
# composed this window (r16 verdict task #1 — the end-to-end text
# curation API with the skew cap engaged — plus the media API's capped
# twin closing the other half of r16 residual #1, plus the same
# API-evidence closure for the remaining two user-facing curation
# surfaces, search_corpus and profile_table, whose siblings
# validate_table and cluster_corpus already run inside registered
# queries); they sort to the head of the rotation basis and lead the
# flag block below.  Policy unchanged: (a) mechanical re-window flags
# lead (scripts/rewindow_check.py vs the r16-end rev 95d70dc — 9 flags
# at final composition time: the four new queries, plus
# dedup_minhash_capped_pairs and multimodal_phash_capped_pairs, whose
# oracle texts moved into the shared _MINHASH_CAPPED_ORACLE /
# _PHASH_WIDTHS_SQL fragments the capped API oracles embed — composed
# SQL byte-identical, but the rule is executable-granularity and
# over-re-windows by design — plus the three phash-family names the
# late-round banded/bucket_counts reuse refactor dirtied); then (b)
# OLDEST-EVIDENCE-FIRST rotation
# — registered names ordered by last-green round ascending (registration
# order among ties, printed by `evidence_audit.py --stale-order` and
# filled by round_start.py), continuing into the round-9 cohort
# (join_broadcast_part_agg / join_left_order_counts / ... — the stalest
# evidence on the ledger after r16 re-greened the round-8 cohort) from
# where the r16 window stopped.
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
    # mechanical flag block (9, rewindow_check vs 95d70dc): the four
    # never-checked queries registered this round LEAD (stale-order
    # head first, the r16 precedent), then the five remaining flags —
    # the two capped-pairs queries whose oracle texts were factored
    # into shared fragments (_MINHASH_CAPPED_ORACLE / _PHASH_WIDTHS_SQL)
    # the capped API oracles embed (byte-identical compositions,
    # re-windowed at executable granularity by design) and the three
    # phash-family names (multimodal_phash_dedup / _dropped_buckets /
    # curation_dedup_media) dirtied by the banded/bucket_counts reuse
    # refactor (phash_near_dup_pairs gained the minhash-pattern
    # precomputed-stage params; dedup_media checkpoints banding once)
    "curation_dedup_corpus",
    "curation_dedup_media_capped",
    "curation_profile_table",
    "curation_search_corpus",
    "curation_dedup_media",
    "dedup_minhash_capped_pairs",
    "multimodal_phash_capped_pairs",
    "multimodal_phash_dedup",
    "multimodal_phash_dropped_buckets",
    # oldest-evidence-first rotation fill (last green: round 9, the
    # join/window/scalar/set/stream cohort — r16 re-greened round 8)
    "join_broadcast_part_agg",
    "join_left_order_counts",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_full_outer_nation_presence",
    "window_topk_orders_per_customer",
    "window_rank_dense_rank",
    "window_running_total_events",
    "sessionization_events",
    "manifest_latest_per_month",
    "set_union_all_lineitem",
    "set_intersect_partkeys",
    "set_except_partkeys",
    "scalar_string_part",
    "scalar_date_orders",
    "scalar_json_events",
    "scalar_hash_customer",
    "scalar_array_embeddings",
    "events_hourly_agg",
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
    "funnel_view_click_purchase",
    "events_runlength_encode",
    "text_search_bm25_pruned_topk",
    "text_search_bm25_pruned_recall",
    "corpus_heaps_law_fit",
    "stream_events_hourly",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_stream_join",
    "stream_sliding_window",
    # ROUND-18 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=17 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r17-end-rev>`: mechanical
    # re-window flags lead, oldest-evidence-first rotation fills (after
    # r17 lands green the stalest cohort continues from
    # agg_collect_sorted_genres / subquery_exists_in /
    # agg_boolean_countif onward — `python scripts/
    # evidence_audit.py --stale-order` prints the basis).
    # tests/test_evidence_freshness.py reddens a skipped or
    # mis-composed rotation automatically.
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

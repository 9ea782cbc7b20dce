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

# Canonical registration order, import-order-INDEPENDENT.  ``_REGISTRY``
# insertion order depends on which module a process happens to import
# first (a pytest session that touches ``curation`` before ``analytics``
# registers the llm block ahead of the analytics block), but the
# evidence-rotation basis ("registration order among last-green ties",
# scripts/evidence_audit.py) must be reproducible in ANY process.  Each
# name therefore gets a (module rank, in-module sequence) key at
# registration time: ranks follow ``_load_all``'s import order — which
# a clean process realizes as one contiguous block per module — and the
# in-module sequence is file order, so sorting by this key reproduces
# the clean-process order exactly no matter who imported what first.
_MODULE_RANK: dict[str, int] = {
    "discogs_etl_spark.multimodal": 0,
    "discogs_etl_spark.scale": 1,
    "discogs_etl_spark.queries.analytics": 2,
    "discogs_etl_spark.queries.etl_roundtrip": 3,
    "discogs_etl_spark.queries.llm": 4,
    "discogs_etl_spark.queries.python_api": 5,
    "discogs_etl_spark.queries.stats": 6,
    "discogs_etl_spark.streaming.events": 7,
}


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


def registration_order() -> list[str]:
    """Registered names in CANONICAL registration order — the order a
    clean ``_load_all`` process inserts them — regardless of the import
    history of the calling process.  The evidence-rotation basis
    (scripts/evidence_audit.py stale-order tie-break) and ``all_specs``'s
    post-window fill both use this so a pytest session that imported
    modules in a different order computes the same rotation.

    The key is DERIVED here, not recorded at registration time (keeping
    ``register``'s AST untouched keeps every query's rewindow closure
    clean): decorators run top-to-bottom within a module no matter who
    triggered the import, so each name's index within its own module's
    insertion subsequence is already import-order-invariant; only the
    inter-module order varies, and ``_MODULE_RANK`` pins that."""
    _load_all()
    counters: dict[str, int] = {}
    unknown = len(_MODULE_RANK)
    key: dict[str, tuple[int, int]] = {}
    for name, spec in _REGISTRY.items():
        mod = spec.fn.__module__
        seq = counters.get(mod, 0)
        counters[mod] = seq + 1
        # Unknown modules (test-local registrations) rank after every
        # product module; ties among them keep insertion order via
        # sorted()'s stability.
        key[name] = (_MODULE_RANK.get(mod, unknown), seq)
    return sorted(_REGISTRY, key=lambda n: key[n])


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
# Round 18 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land;
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=17: registered=379 unique_checked=378 ever_green=378 \
#     never_checked=1 net_new_last_round=4
# The ledger closed at 378/378/378 in round 17 (the four curation API
# queries registered there all went green on first check); the one
# never-checked name is backfill_audit_table, REGISTERED THIS ROUND in
# the commit that composed this window (r17 verdict task #5 — the
# `backfill` CLI verb's composition end-to-end with a literal-pinned
# checksum audit).  Policy unchanged: (a) mechanical re-window flags
# lead (scripts/rewindow_check.py vs the r17-end rev 77241e0 — 5 flags
# at composition time: the new query, plus the four phash/media names
# dirtied by the r17-ADVICE consistency guard on phash_near_dup_pairs;
# never-checked names first, the r16/r17 precedent); then (b)
# OLDEST-EVIDENCE-FIRST rotation — registered names ordered by
# last-green round ascending (registration order among ties, printed by
# `evidence_audit.py --stale-order` and filled by round_start.py).  The
# fill LEADS with stream_hourly_error_rate (last green round 9 — the
# single name the r17 9-flag block crowded out of the rotation, and the
# name whose SLO breach test_endangered_names_are_in_current_window
# flagged the moment CORRECTNESS_r17.json landed; r17 verdict task #1),
# then continues through the round-10 cohort (agg_approx_distinct /
# scalar_conditional_lineitem / agg_collect_sorted_genres /
# subquery_exists_in / agg_boolean_countif / scalar_higher_order_arrays
# / q12_priority_by_flag ...) and into the round-11 cohort from where
# the r17 window stopped.
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
    # mechanical flag block (5, rewindow_check vs the r17-end rev
    # 77241e0): backfill_audit_table LEADS (never-checked — registered
    # this round as the r17 verdict task #5 closure: the `backfill`
    # CLI verb's composition end-to-end, the one user-facing verb whose
    # glue had only local tests; never-checked names sort to the
    # stale-order head, the r16/r17 precedent), then the four
    # phash/media names dirtied by the r17-ADVICE consistency guard on
    # phash_near_dup_pairs (reject bucket_counts without max_bucket —
    # the AST change re-windows every caller at executable granularity
    # by design, byte-identical compositions or not).
    "backfill_audit_table",
    "multimodal_phash_dedup",
    "multimodal_phash_capped_pairs",
    "curation_dedup_media",
    "curation_dedup_media_capped",
    # oldest-evidence-first rotation fill (45 names): leads with
    # stream_hourly_error_rate (last green round 9 — the single name
    # r17's 9-flag block crowded out; the freshness SLO guard reddened
    # on it when CORRECTNESS_r17.json landed), then the round-10
    # cohort, then continues into the round-11 cohort from where the
    # r17 window stopped.
    "stream_hourly_error_rate",
    "agg_approx_distinct",
    "scalar_conditional_lineitem",
    "agg_collect_sorted_genres",
    "subquery_exists_in",
    "agg_boolean_countif",
    "scalar_higher_order_arrays",
    "scalar_levenshtein_fuzzy",
    "scalar_string_extended",
    "scalar_null_semantics",
    "q4_late_order_priority",
    "q7_nation_trade_flows",
    "q12_priority_by_flag",
    "q14_promo_revenue_share",
    "q19_disjunctive_predicates",
    "asof_join_events",
    "recsys_holdout_hitrate",
    "dedup_exact",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "similarity_ann_signlsh",
    "dedup_embedding_bucketed",
    "text_stats_by_lang",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "lang_id_corpus",
    "multimodal_binary_meta",
    "sample_deterministic_split",
    "text_normalize",
    "sample_stratified_per_lang",
    "embedding_centroid_by_label",
    "embedding_l2_normalize",
    "dedup_keep_best",
    "ngram_bigram_counts",
    "tfidf_top_terms",
    "similarity_ann_recall",
    "corpus_curate_pipeline",
    "text_chunk_sliding",
    "pack_sequences_by_budget",
    "pack_sequences_sharded",
    "embedding_power_iteration_pc1",
    # ROUND-19 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=18 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r18-end-rev>`: mechanical
    # re-window flags lead (never-checked names first), oldest-evidence
    # -first rotation fills (after r18 lands green the stalest cohort
    # continues from pandas_udf_vector_norm / applyinpandas_lang_stats
    # / retention_halflife_fit onward — `python scripts/
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
    for name in registration_order():
        if name not in ordered:
            ordered[name] = _REGISTRY[name]
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }


def bench_specs() -> dict[str, QuerySpec]:
    return {name: s for name, s in all_specs().items() if s.bench}

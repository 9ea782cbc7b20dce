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
# Round 10 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over
# a FIXED round range — the note is stamped with the round it describes
# so the suite stays green after later artifacts land; the round-6 guard
# compared against the unbounded audit and the driver landing
# CORRECTNESS_r06.json retroactively broke the build.
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=9: registered=369 unique_checked=368 ever_green=368 \
#     never_checked=1 net_new_last_round=2
# (registered=369 / never_checked=1 because this round registers ONE
# net-new query — embedding_power_iteration_pc1_gram, the Gram-matrix
# one-pass covariance twin from verdict r9 #1; the audit counts the
# live registry against the landed artifacts, so the net-new name is
# never-checked by definition until CORRECTNESS_r10 lands.)
# The ledger is otherwise fully closed (every previously-registered
# name has driver-green evidence and zero names are latest-round-red),
# so this round continues the post-backlog window policy: (a)
# mechanical re-window flags lead (scripts/rewindow_check.py vs the
# r9-end rev a556500 — three flags: embedding_power_iteration_pc1,
# whose iteration loop and oracle body moved into the shared helpers
# _power_iterate/_power_iter_oracle that the Gram twin reuses so the
# two trajectories cannot drift; recsys_holdout_hitrate, whose OR-join
# was rewritten as a union of hash equi-joins; and
# retention_halflife_fit, whose flat-curve b=0 edge now returns NULL
# half-life instead of an ANSI double/0 error), with net-new
# never-checked names allowed to precede them; then
# (b) OLDEST-EVIDENCE-FIRST rotation —
# registered names ordered by last-green round ascending (registration
# order among ties, computed by evidence_audit's stale_order_names and
# filled by round_start.py).  The fill below continues the round-1
# cohort from where the r9 window stopped (agg_boolean_countif /
# scalar_higher_order_arrays onward per the r9 note's plan), trimmed
# by four tail names to keep the window at the driver's 50 slots.
# Every name passes the local one-session driver replica
# (tests/test_oracle.py) and the plain-session derisk_window.py sweep,
# so rotation stays pure evidence collection.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # net-new this round (never driver-checked): the Gram-matrix
    # one-pass covariance twin (verdict r9 #1) — C = (Σxxᵀ)/n − μμᵀ in
    # ONE corpus scan (executed-plan FileScans 1 vs the exact
    # baseline's 3), own DuckDB oracle
    "embedding_power_iteration_pc1_gram",
    # mechanical re-windows (changed code this round): the exact
    # baseline now calls the shared _power_iterate/_power_iter_oracle
    # helpers the twin reuses; the recsys eval's OR-of-equalities join
    # was rewritten as a union of two hash equi-joins (Catalyst
    # nested-loops an OR join — the r10 sf0.1 timing sweep caught it at
    # 111 s vs ~2 s; values unchanged, oracle untouched) and its two
    # driver-side counts now ride the plan as 1-row aggregates
    "embedding_power_iteration_pc1",
    "recsys_holdout_hitrate",
    # mechanical re-window: flat retention (b = 0, reachable with clean
    # data — the whole sf0.001 cohort stays active) now yields NULL
    # half-life on both engines instead of Spark's ANSI DIVIDE_BY_ZERO;
    # sub-2-point series yield NULL slope too (r10 timing-sweep catch)
    "retention_halflife_fit",
    # oldest-evidence-first rotation fill (last green: round 1),
    # continuing the r9 cohort
    "subquery_exists_in",
    "agg_approx_distinct",
    "scalar_conditional_lineitem",
    "agg_collect_sorted_genres",
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
    "dedup_connected_components",
    "similarity_ivf_topk",
    "dedup_keep_best",
    "ngram_bigram_counts",
    "tfidf_top_terms",
    "similarity_ann_recall",
    "corpus_curate_pipeline",
    "text_chunk_sliding",
    "pack_sequences_by_budget",
    "pack_sequences_sharded",
    "pandas_udf_vector_norm",
    "applyinpandas_lang_stats",
    # ROUND-11 ROTATION NOTE: keep the post-backlog policy — refresh the
    # audit line to as_of_round=10 and COVERAGE.md's evidence paragraph
    # as the first commit, then compose the window with
    # `python scripts/round_start.py <r10-end-rev>`: mechanical
    # re-window flags lead, oldest-evidence-first rotation fills (after
    # r10 lands green the stalest cohort continues from where this
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

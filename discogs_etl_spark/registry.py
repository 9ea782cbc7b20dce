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
# Round 7 rotation.  Basis (COMPUTED by scripts/evidence_audit.py over a
# FIXED round range — the note is stamped with the round it describes so
# the suite stays green after later artifacts land; the round-6 guard
# compared against the unbounded audit and the driver landing
# CORRECTNESS_r06.json retroactively broke the build.
# tests/test_evidence_audit.py recomputes audit(max_round=as_of_round)
# and asserts this line matches, and separately proves the comparison is
# immune to a synthetic future-round artifact):
#   evidence_audit as_of_round=6: registered=366 unique_checked=280 ever_green=280 \
#     never_checked=86 net_new_last_round=44
# Window composition: first the four multimodal queries, re-windowed
# because round 7 changed executable lines in their call graph
# (_decode_one's real-path audio gate now requires RIFF+WAVE before
# dispatching to decode_wav; decode_wav's block-align check uses the
# spec's ceil(bits/8); decode_png caps the inflate bound by the zlib
# max-expansion ratio so a hostile IHDR cannot re-open the bomb) — the
# registered queries pin real=False so the changed lines are not on
# their evidence path, but the RE-WINDOW RULE IS MECHANICAL AT FUNCTION
# GRANULARITY: a query re-windows iff the docstring-stripped AST of any
# function in its module reachable from its builder changed
# (scripts/rewindow_check.py computes this against a base rev; textual
# edits — comments, docstrings, import hoists — no longer re-window,
# per verdict r6 nit #2).  Then the next 46 never-driver-checked names
# in REGISTRATION ORDER (evidence_audit --never), the similarity/vocab/
# dedup-eval tail from users_reactivation_rate through dedup_pair_evidence.
# Every name passes the local one-session driver replica
# (tests/test_oracle.py) and the plain-session derisk_window.py sweep,
# so rotation stays pure evidence collection.  After r07 lands green,
# never-checked drops 86 -> 40 (one round remains: r08 finishes the
# backlog from chunking_content_defined onward).
_WINDOW_PRIORITY: tuple[str, ...] = (
    # changed this round — executable lines in the real-decode branch of
    # _decode_one/decode_wav/decode_png (ADVICE r6 hardening); builders
    # unchanged but the functions are in their call graph, so the
    # mechanical rule re-windows them
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
    "multimodal_media_summary",
    # backlog, registration order — zero driver rows yet
    "users_reactivation_rate",
    "graph_modularity_lpa",
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
    "dedup_semdedup",
    "privacy_k_anonymity_report",
    "vocab_coverage_curve",
    "similarity_matryoshka_recall",
    "terms_pmi_cooccurrence",
    "dedup_minhash_eval",
    "safety_lexicon_filter",
    "fuzzy_join_levenshtein_blocked",
    "dedup_provenance_matrix",
    "dedup_winnowing_fingerprints",
    "lm_next_word_accuracy",
    "embedding_power_iteration_pc1",
    "text_char_entropy",
    "dedup_doc_duplication_score",
    "dedup_ensemble_vote",
    "embedding_triplet_check",
    "sample_balance_classes",
    "boilerplate_ngram_discovery",
    "text_msttr_diversity",
    "embedding_norm_outliers",
    "corpus_jsd_sources",
    "dedup_transitivity_audit",
    "dedup_medoid_selection",
    "bpe_compression_eval",
    "embedding_ncm_probe_accuracy",
    "dedup_impact_report",
    "corpus_effective_tokens",
    "pack_efficiency_curve",
    "lm_domain_surprisal_ratio",
    "dedup_threshold_sweep",
    "dedup_pair_evidence",
    # ROUND-8 ROTATION NOTE: once CORRECTNESS_r07 lands green, run
    # `python scripts/round_start.py <r7-end-rev>` — it prints the
    # refreshed as_of_round=7 audit line, the mechanical re-window flags
    # (scripts/rewindow_check.py: name-granularity AST diff with
    # import-graph dirtiness; comment/docstring/import-position edits do
    # NOT re-window), and the replacement tuple body: flags first, then
    # the remaining never-driver-checked names in REGISTRATION ORDER
    # (from chunking_content_defined / similarity_int8_recall /
    # dedup_impact_by_source onward through the stats tail, ~40 names —
    # the backlog FINISHES in r8).  Paste all three, refresh
    # COVERAGE.md's evidence paragraph, and let
    # tests/test_evidence_audit.py verify the paste in the same commit.
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

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
    from discogs_etl_spark.queries import analytics, llm, python_api  # noqa: F401
    from discogs_etl_spark.streaming import events  # noqa: F401


# Evidence-rotation window.  The verification driver checks the FIRST 50
# registered queries per round, so ``all_specs`` surfaces queries with NO
# driver-side correctness evidence (or changed since their last green row)
# ahead of queries whose green rows already stand from a prior round.
# Round 2: the three round-1 reds (fixed this round), the six analytics
# queries whose output representation changed (bool→INT / HUGEINT casts),
# the entire Plane C LLM-pipeline surface (queries/llm.py — the north-star
# set, zero driver evidence in round 1), streaming, the Python extension
# points, and the highest-value analytics tail.  Names not listed keep
# registration order after these; unknown names are rejected by a test.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # round-1 reds, fixed
    "agg_approx_distinct",
    "agg_collect_sorted_genres",
    "agg_boolean_countif",
    # representation changed this round → need fresh evidence
    "scalar_conditional_lineitem",
    "q12_priority_by_flag",
    "scalar_higher_order_arrays",
    "scalar_levenshtein_fuzzy",
    "scalar_string_extended",
    "scalar_null_semantics",
    # Plane C (queries/llm.py): dedup family
    "dedup_exact",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_bucketed",
    "dedup_connected_components",
    "dedup_keep_best",
    # Plane C: similarity family
    "similarity_topk_bruteforce",
    "similarity_ann_signlsh",
    "similarity_ivf_topk",
    "similarity_ann_recall",
    # Plane C: text analysis / curation
    "text_stats_by_lang",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_normalize",
    "lang_id_corpus",
    "ngram_bigram_counts",
    "tfidf_top_terms",
    "corpus_curate_pipeline",
    "text_chunk_sliding",
    "pack_sequences_by_budget",
    "pack_sequences_sharded",
    # Plane C: sampling / embeddings / multimodal metadata
    "sample_deterministic_split",
    "sample_stratified_per_lang",
    "embedding_centroid_by_label",
    "embedding_l2_normalize",
    "multimodal_binary_meta",
    # streaming veneer
    "stream_events_hourly",
    "stream_session_window",
    "stream_stateful_user_stats",
    # Python extension points
    "pandas_udf_vector_norm",
    "applyinpandas_lang_stats",
    # analytics tail: TPC-H shapes + range/as-of joins
    "q4_late_order_priority",
    "q7_nation_trade_flows",
    "q14_promo_revenue_share",
    "q19_disjunctive_predicates",
    "range_join_bucketed",
    "asof_join_events",
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

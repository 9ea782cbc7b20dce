"""Python extension-point surface (SURVEY.md §2.11).

The engine's rule is JVM expressions on every hot path; Python appears
only where Spark's built-ins genuinely can't express the computation.
Each extension point gets one oracle-checked exemplar here:

- ``pandas_udf`` (vectorized scalar): Arrow-batched NumPy compute — the
  shape for numeric kernels (custom scoring, model inference adapters).
- ``applyInPandas`` (grouped map): whole-group pandas logic — the shape
  for per-entity algorithms (per-group robust stats, resampling,
  model-per-key).

- ``mapInArrow`` (columnar batch map): RecordBatches straight through
  pyarrow.compute — the zero-pandas-overhead shape for Arrow-native
  libraries (tokenizers, model servers).

(``mapInPandas`` is exercised by the multimodal pipeline and
``applyInPandasWithState`` by the streaming stateful operator.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from discogs_etl_spark.registry import register
from discogs_etl_spark.tables import load


def _np_l2_norm_udf():
    """Vectorized per-row L2 norm via NumPy over Arrow batches.

    np.sqrt(np.dot(v, v)) accumulates IN ORDER over the array — the same
    fold DuckDB's list_dot_product performs — so the doubles match the
    oracle bit-for-bit (rounded for display).

    Built lazily: the @pandas_udf decorator parses its DDL type through
    the ACTIVE SparkSession, so it cannot run at module import."""

    @pandas_udf("double")
    def _np_l2_norm(emb: pd.Series) -> pd.Series:
        import numpy as np

        return emb.map(lambda v: float(np.sqrt(np.dot(v, v))))

    return _np_l2_norm


@register(
    "pandas_udf_vector_norm",
    oracle="""
        SELECT vec_id,
               round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))), 6) AS l2
        FROM embeddings
    """,
    tags=("python", "pandas_udf", "vector"),
)
def pandas_udf_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf exemplar (§2.11): NumPy norm over the
    embedding column, Arrow-batched.  For this exact computation the JVM
    higher-order-function path (scalar_array_embeddings) is preferred;
    this query pins the extension point for kernels that NEED NumPy/SciPy
    (e.g. FFTs, model scoring)."""
    emb = load(spark, sf_dir, "embeddings")
    norm = _np_l2_norm_udf()
    return emb.select(
        "vec_id",
        F.round(norm(F.col("embedding").cast("array<double>")), 6).alias("l2"),
    )


def _lang_stats_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-group pandas computation: per-language doc-length stats.
    Median/min/max over INTEGER n_chars are order-independent and match
    DuckDB's quantile_cont exactly (x.0/x.5 interpolation)."""
    s = pdf["n_chars"]
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "median_chars": [float(s.median())],
            "min_chars": [int(s.min())],
            "max_chars": [int(s.max())],
        }
    )


@register(
    "applyinpandas_lang_stats",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               quantile_cont(n_chars, 0.5) AS median_chars,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    tags=("python", "applyInPandas", "grouped_map"),
)
def applyinpandas_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas exemplar (§2.11): each language's docs
    arrive as one pandas DataFrame (Arrow transfer), stats computed
    group-locally.  For THESE stats groupBy().agg() is preferred; the
    extension point exists for group algorithms SQL can't express
    (per-key model fits, ordered resampling, changepoint detection).

    Scale: one shuffle on the group key; each group must fit one
    executor's memory — the documented applyInPandas constraint (use
    applyInPandasWithState or windows for unbounded groups)."""
    docs = load(spark, sf_dir, "documents").select("lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        _lang_stats_fn,
        schema="lang string, n_docs long, median_chars double, min_chars long, max_chars long",
    )


def _arrow_token_stats(batches):
    """Arrow-native batch transform: token/byte stats computed with
    pyarrow.compute kernels directly on RecordBatches — no pandas
    materialization at all.  The shape for high-throughput columnar
    Python (tokenizers with Arrow bindings, Arrow-native model servers)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        toks = pc.split_pattern(batch.column("text"), " ")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(pc.list_value_length(toks), pa.int64()),
                pc.cast(pc.binary_length(batch.column("text")), pa.int64()),
            ],
            names=["doc_id", "n_tokens", "n_bytes"],
        )


@register(
    "mapinarrow_token_stats",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               strlen(text) AS n_bytes
        FROM documents
    """,
    tags=("python", "mapInArrow", "arrow"),
)
def mapinarrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` exemplar (§2.11) — the fourth extension point,
    below even pandas on the overhead ladder: RecordBatches in,
    RecordBatches out, pyarrow.compute kernels, zero pandas conversion.
    For THESE stats the JVM split/size path is preferred; the point is
    the integration shape for Arrow-native libraries.

    Scale: map-only (no shuffle), Arrow batch size bounds memory
    (spark.sql.execution.arrow.maxRecordsPerBatch)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_token_stats, schema="doc_id long, n_tokens long, n_bytes long"
    )

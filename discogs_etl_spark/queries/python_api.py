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
- Python UDTF (lateral table function): one row in → N rows out with
  imperative per-row logic — the shape for sequential scanners
  (tokenizers emitting spans, parsers emitting sub-records).
- grouped-agg ``pandas_udf`` (vectorized UDAF): whole group → one
  scalar inside ``groupBy().agg()`` — the shape for NumPy statistics
  Spark lacks as built-ins.

(``mapInPandas`` is exercised by the multimodal pipeline and
``applyInPandasWithState`` by the streaming stateful operator.)
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _token_runs_udtf():
    """Python UDTF emitting runs of consecutive repeated tokens.

    Built lazily (like the pandas_udf above): the @udtf decorator parses
    its DDL schema through the active SparkSession."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, run_start bigint, run_len bigint")
    class TokenRuns:
        def eval(self, text: str):
            toks = text.split(" ")
            i, n = 0, len(toks)
            while i < n:
                j = i
                while j + 1 < n and toks[j + 1] == toks[i]:
                    j += 1
                if j > i:
                    # 1-based start to match SQL subscripts
                    yield toks[i], i + 1, j - i + 1
                i = j + 1

    return TokenRuns


@register(
    "udtf_token_runs",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ),
        g AS (
            SELECT doc_id, tok, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id, tok
                                            ORDER BY pos) AS grp
            FROM w
        )
        SELECT doc_id, tok,
               MIN(pos) AS run_start,
               COUNT(*) AS run_len
        FROM g GROUP BY doc_id, tok, grp
        HAVING COUNT(*) >= 2
    """,
    tags=("python", "udtf", "lateral"),
)
def udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exemplar (§2.11): a lateral table function scanning
    each document once and emitting its runs of consecutive repeated
    tokens (run-length encoding — stutter detection / compression prep).
    The sequential two-pointer scan is natural imperative Python; the
    relational equivalent (the oracle) needs a gaps-and-islands double
    window.  Registered via ``spark.udtf.register`` and invoked through
    the SQL ``LATERAL`` correlate — the UDTF surface Spark 4 adds on top
    of the pandas extension points.

    Scale: map-only (the lateral correlate never shuffles); one Python
    worker pass per partition, rows stream through the UDTF without
    buffering the document set."""
    spark.udtf.register("token_runs", _token_runs_udtf())
    load(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, r.tok, r.run_start, r.run_len
        FROM __udtf_docs d, LATERAL token_runs(d.text) r
        """
    )


def _iqr_udaf():
    """Grouped-agg pandas_udf: interquartile range via NumPy linear
    interpolation — bit-identical to DuckDB's quantile_cont on integer
    inputs (both compute x_lo + (x_hi - x_lo) * g with g an exact
    multiple of 0.25 for p in {.25, .75})."""

    @pandas_udf("double")
    def _iqr(s: pd.Series) -> float:
        import numpy as np

        v = s.to_numpy(dtype="float64")
        q75, q25 = np.percentile(v, [75.0, 25.0])
        return float(q75 - q25)

    return _iqr


@register(
    "pandas_udaf_lang_iqr",
    oracle="""
        SELECT lang,
               round(quantile_cont(n_chars, 0.75)
                     - quantile_cont(n_chars, 0.25), 6) AS iqr_chars
        FROM documents
        GROUP BY lang
    """,
    tags=("python", "pandas_udf_agg", "udaf"),
)
def pandas_udaf_lang_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf (vectorized UDAF) exemplar (§2.11): per-
    language interquartile range of document length, computed by NumPy
    inside ``groupBy().agg()`` — the extension point for group
    statistics Spark lacks (trimmed means, robust scale estimators)
    without leaving the agg operator.  (Spark disallows mixing a group
    aggregate pandas UDF with JVM aggregates in one agg — combine via a
    join on the group key when both are needed.)

    Scale: one shuffle on the group key; unlike applyInPandas the
    group's OTHER columns never cross to Python — only the aggregated
    series transfers (Arrow), so memory is bounded by the grouped
    column, not the row width."""
    docs = load(spark, sf_dir, "documents").select("lang", "n_chars")
    iqr = _iqr_udaf()
    return docs.groupBy("lang").agg(F.round(iqr("n_chars"), 6).alias("iqr_chars"))


def _arrow_scalar_fingerprint_udf():
    """Arrow-OPTIMIZED scalar Python UDF (Spark 4 ``useArrow=True``):
    per-value Python logic shipped over Arrow batches instead of pickled
    rows — the migration path for row-at-a-time UDFs that can't be
    vectorized but shouldn't pay pickle serialization.  Built lazily
    (decorator needs an active session, same reason as the pandas_udf
    sibling)."""
    from pyspark.sql.functions import udf

    @udf("string", useArrow=True)
    def char_class_fingerprint(s: str) -> str:
        if s is None:
            return None
        out = []
        last = ""
        for ch in s:
            cls = "a" if ch.isalpha() else ("9" if ch.isdigit() else "_")
            if cls != last:
                out.append(cls)
                last = cls
        return "".join(out)

    return char_class_fingerprint


@register(
    "arrow_udf_char_classes",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '[a-zA-Z]+', 'a', 'g'),
                       '[0-9]+', '9', 'g'),
                   '[^a9]+', '_', 'g') AS shape
        FROM documents WHERE doc_id % 50 = 0
    """,
    tags=("python", "arrow_udf", "scalar"),
)
def arrow_udf_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized SCALAR Python UDF exemplar (§2.11, the sixth
    extension point): collapse each document to its character-class
    shape (runs of letters→'a', digits→'9', other→'_') — per-value
    sequential string logic, exactly the kind of UDF that can't become
    a whole-column NumPy expression, with Arrow transport replacing
    row pickling.  The oracle reproduces the same shape with three
    ordered regexp_replace passes (letters, digits, remainder), proving
    the Python semantics against a pure-SQL twin.

    Scale: map-only; Arrow batching bounds the Python-boundary cost to
    once per batch, not once per row — but the docstring rule stands:
    this path exists for logic the JVM genuinely can't express, and the
    1%-of-corpus query set keeps the exemplar honest about that cost."""
    fp = _arrow_scalar_fingerprint_udf()
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 50 == 0)
        .select("doc_id", fp("text").alias("shape"))
    )


def _iter_regex_token_udf():
    """Iterator-form scalar pandas_udf (SCALAR_ITER): the regex compiles
    ONCE per executor task, then streams every Arrow batch through it —
    the per-partition-expensive-init pattern (model weights, tokenizers,
    compiled automata) that plain SCALAR UDFs re-pay per batch.

    The Iterator hint must live in MODULE globals: under ``from
    __future__ import annotations`` PySpark resolves the string hints
    against the function's globals to pick the SCALAR_ITER eval type."""
    @pandas_udf("long")
    def n_alnum_tokens(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import re

        pat = re.compile(r"[a-z0-9]+")  # the once-per-task init
        for s in batches:
            yield s.map(lambda t: len(pat.findall(t))).astype("int64")

    return n_alnum_tokens


@register(
    "pandas_udf_iter_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
                   AS n_re_tokens
        FROM documents
    """,
    tags=("python", "pandas_udf", "scalar_iter"),
)
def pandas_udf_iter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form pandas_udf exemplar (§2.11, the last UDF mode in the
    matrix: SCALAR_ITER next to SCALAR / GROUPED_MAP / GROUPED_AGG /
    mapInArrow / UDTF / arrow-python): regex token counting with the
    pattern compiled once per task instead of per batch.  The JVM twin
    (text_token_count's regexp_extract_all) is preferred for THIS kernel;
    the mode exists for kernels whose init cost (loading a model,
    building an FST tokenizer) must amortize across a task's batches.

    Scale: map-only, Arrow-batched, init cost O(tasks) not O(batches) —
    on a 1000-executor cluster that's the difference between loading a
    tokenizer 10^3 and 10^7 times."""
    f = _iter_regex_token_udf()
    return load(spark, sf_dir, "documents").select(
        "doc_id", f(F.col("text")).alias("n_re_tokens")
    )

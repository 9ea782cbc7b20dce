"""User-facing corpus-curation API: the dedup machinery the registered
queries prove, bound to ARBITRARY parquet corpora instead of the driver
fixtures — what `python -m discogs_etl_spark dedup` drives.

Methods:

- ``exact``  — content-sha256 keep-first (dedup_exact_hash shape):
  map-side hashing, one shuffle on the 64-char digest.
- ``minhash`` — MinHash+LSH near-dup pairs (minhash_pairs_df) →
  large-star/small-star connected components → keep min-id per
  component (dedup_fuzzy_keep_one shape, with the O(log n) CC variant
  as the default because corpus topology is unknown).

Both return the SURVIVING rows with their original schema plus a
one-row accounting frame; exactness/recall semantics are identical to
the oracle-checked queries (same code paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def dedup_corpus(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "minhash",
) -> tuple[DataFrame, DataFrame]:
    """Deduplicate ``df`` by content.  Returns (survivors, report) —
    survivors keep the input schema; the report is one row with counts.

    The id column must be numeric and unique (keep-first = min id); the
    text column is the content key.  NULL-content rows are never treated
    as duplicates of each other (a NULL is not equal to another NULL) —
    they all survive."""
    # temp names guaranteed absent from the input schema
    tid, ttxt, trn = "__detl_id", "__detl_text", "__detl_rn"
    while any(c in df.columns for c in (tid, ttxt, trn)):
        tid, ttxt, trn = tid + "_", ttxt + "_", trn + "_"
    norm = df.withColumn(tid, F.col(id_col)).withColumn(ttxt, F.col(text_col))
    if method == "exact":
        w = Window.partitionBy(F.sha2(ttxt, 256)).orderBy(tid)
        survivors = (
            norm.withColumn(trn, F.row_number().over(w))
            .where(F.col(ttxt).isNull() | (F.col(trn) == 1))
            .drop(trn, tid, ttxt)
        )
    elif method == "minhash":
        from discogs_etl_spark.queries.llm import (
            connected_components_star,
            minhash_pairs_df,
        )

        pairs = (
            minhash_pairs_df(
                norm.where(F.col(ttxt).isNotNull()).select(
                    F.col(tid).alias("doc_id"), F.col(ttxt).alias("text")
                )
            )
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        comp = connected_components_star(spark, pairs)
        # drop every component member except the minimum id; docs outside
        # any near-dup component survive untouched (anti-join is against
        # the LOSERS only — graph-sized, not corpus-sized)
        losers = comp.where(F.col("doc_id") != F.col("component_id")).select(
            F.col("doc_id").alias("__detl_loser")
        )
        survivors = norm.join(
            losers, norm[tid] == losers["__detl_loser"], "left_anti"
        ).drop(tid, ttxt)
    else:
        raise ValueError(f"unknown dedup method {method!r}; use 'exact' or 'minhash'")
    n_in = df.count()
    n_out = survivors.count()
    report = spark.createDataFrame(
        [(method, n_in, n_out, n_in - n_out)],
        "method string, n_input long, n_survivors long, n_removed long",
    )
    return survivors, report


def _orderable(dt: T.DataType) -> bool:
    return not isinstance(dt, (T.MapType, T.ArrayType, T.StructType, T.BinaryType))


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column profile of ANY DataFrame in ONE scan: rows/nulls/
    approx-distinct (HyperLogLog — sketches merge map-side, so wide
    tables stay a single pass with no Expand blowup) and stringified
    min/max (nulled for nested/binary columns, whose ordering is not
    meaningful as a string).  The oracle-checked table_profile_orders is
    the exact-count sibling for a fixed column set."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for field in df.schema.fields:
        c = field.name
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls__{c}")
        )
        target = F.col(c) if _orderable(field.dataType) else F.to_json(F.struct(c))
        aggs.append(F.approx_count_distinct(target).alias(f"__dist__{c}"))
        if _orderable(field.dataType):
            aggs.append(F.min(c).cast("string").alias(f"__min__{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max__{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min__{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max__{c}"))
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "__n_rows AS n_rows",
        "stack({n}, {args}) AS (col, n_nulls, n_distinct_approx, min_str, max_str)".format(
            n=len(df.columns),
            args=", ".join(
                f"'{c}', `__nulls__{c}`, `__dist__{c}`, `__min__{c}`, `__max__{c}`"
                for c in df.columns
            ),
        ),
    )
    return stacked.select(
        "col", "n_rows", "n_nulls", "n_distinct_approx", "min_str", "max_str"
    )

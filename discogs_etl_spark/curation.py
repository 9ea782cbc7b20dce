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
    text column is the content key."""
    norm = df.withColumn("__id", F.col(id_col)).withColumn("__text", F.col(text_col))
    if method == "exact":
        w = Window.partitionBy(F.sha2("__text", 256)).orderBy("__id")
        survivors = (
            norm.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__id", "__text")
        )
    elif method == "minhash":
        from discogs_etl_spark.queries.llm import (
            connected_components_star,
            minhash_pairs_df,
        )

        pairs = (
            minhash_pairs_df(
                norm.select(
                    F.col("__id").alias("doc_id"), F.col("__text").alias("text")
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
            F.col("doc_id").alias("__loser")
        )
        survivors = norm.join(
            losers, norm["__id"] == losers["__loser"], "left_anti"
        ).drop("__id", "__text")
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
    """Per-column profile of ANY DataFrame: rows/nulls/distinct and
    stringified min/max (nulled for nested/binary columns, whose
    ordering is not meaningful as a string) — the generic form of the
    oracle-checked table_profile_orders."""
    out = None
    for field in df.schema.fields:
        c = field.name
        if _orderable(field.dataType):
            mn = F.min(c).cast("string").alias("min_str")
            mx = F.max(c).cast("string").alias("max_str")
        else:
            mn = F.lit(None).cast("string").alias("min_str")
            mx = F.lit(None).cast("string").alias("max_str")
        p = df.agg(
            F.lit(c).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct")
            if _orderable(field.dataType)
            else F.count_distinct(F.to_json(F.struct(c))).alias("n_distinct"),
            mn,
            mx,
        )
        out = p if out is None else out.unionAll(p)
    return out

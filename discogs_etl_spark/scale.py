"""Scale techniques as first-class operators (SURVEY.md §7.2 phase 6).

The reference scales by launching more containers (reference §3.3); this
engine scales by shaping shuffles.  Three techniques live here, each with
a test proving the plan/result property it claims:

- **Bucketed tables** — pre-shuffled storage: joins and aggregations on
  the bucket key run with ZERO exchanges (verified in the physical plan).
  At 100 TB this is the difference between an hourly fact⋈fact join
  re-shuffling 100 TB every run and reading co-located buckets.
- **Salted aggregation** — two-phase groupBy for skewed keys: partial
  aggregate on (key, salt), final on key.  Result-identical to a plain
  groupBy (oracle-checked), but no single reducer ever sees a hot key's
  full row stream.
- **Salted join** — explicit skew-join: replicate the small side per
  salt, scatter the big side's hot keys across salts.  AQE's skew-join
  handles MOST cases at runtime; the explicit form is for when skew is
  known and AQE's post-shuffle split is too late (e.g. the shuffle itself
  OOMs a partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from discogs_etl_spark.registry import register
from discogs_etl_spark.tables import load


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Readers joining/grouping on ``bucket_cols`` skip the exchange; with
    ``sort_cols`` they skip the sort too."""
    w = df.write.bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    w.mode("overwrite").format("parquet").saveAsTable(table_name)


def salted(col: str | Column, n_salts: int) -> Column:
    """Deterministic salt derived FROM THE ROW (hash-mod), not rand() or
    monotonically_increasing_id(): re-runs and task RETRIES place every
    row in the same salt bucket (nondeterministic repartitioning under
    retry is the classic lost/duplicated-rows bug, SPARK-23207)."""
    return F.pmod(F.hash(col), F.lit(n_salts))


def salted_groupby_agg(
    df: DataFrame,
    key: str,
    measures: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``measures`` maps output name → (input column, agg) where agg ∈
    {sum, count, min, max}; these are the re-associable aggregates the
    two-phase split is valid for.  Phase 1 shuffles (key, salt) —
    splitting any hot key across ``n_salts`` reducers — phase 2 merges
    the per-salt partials on key alone, moving only n_salts rows per key.
    ``salt_source`` must vary WITHIN a key group (a high-cardinality
    column like a row id).  The default salts on a hash of the whole
    row — deterministic and varying for any non-identical rows; fully
    identical duplicate rows share a salt, which only matters if a key's
    rows are mostly byte-identical (pass an id column then)."""
    if salt_source is not None:
        salt_col = salted(salt_source, n_salts)
    else:
        salt_col = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    phase1_aggs, phase2_aggs = [], []
    for out, (col, how) in measures.items():
        part = f"__p_{out}"
        if how == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(part))
            phase2_aggs.append(F.sum(part).alias(out))
        elif how == "sum":
            phase1_aggs.append(F.sum(col).alias(part))
            phase2_aggs.append(F.sum(part).alias(out))
        elif how in ("min", "max"):
            fn = F.min if how == "min" else F.max
            phase1_aggs.append(fn(col).alias(part))
            phase2_aggs.append(fn(part).alias(out))
        else:
            raise ValueError(f"non-reassociable aggregate {how!r}")
    partial = df.groupBy(F.col(key), salt_col.alias("__salt")).agg(*phase1_aggs)
    return partial.groupBy(key).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with explicit salting: the big side gets a
    row-derived salt, the small side is replicated n_salts times, and the
    join key becomes (key, salt) — a hot key's rows spread over n_salts
    partitions instead of one.

    The salt hashes the big side's FULL ROW — deterministic under task
    retry (monotonically_increasing_id would migrate rows between shuffle
    partitions on recomputation: SPARK-23207 lost/duplicated output).
    Byte-identical duplicate rows share a salt; a hot key of IDENTICAL
    rows needs a distinguishing id column added upstream."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"])
    return out.drop("__salt")


@register(
    "agg_salted_skew_safe",
    oracle="""
        SELECT l_returnflag AS key,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salting"),
)
def agg_salted_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on a deliberately LOW-cardinality key
    (3 return flags over all of lineitem — every key is hot).  The oracle
    is the plain single-phase groupBy: salting must be result-invisible.

    Scale: phase 1 fans each flag across 16 salt reducers; phase 2
    merges 3x16 partial rows.  (Map-side partial aggregation already
    mitigates this exact case; salting is the insurance for when the
    partial-agg hash table overflows on high-cardinality-times-hot
    composites.)"""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "l_quantity_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_groupby_agg(
        li.withColumnRenamed("l_returnflag", "key"),
        "key",
        {
            "n": ("key", "count"),
            "sum_qty_dec": ("l_quantity_dec", "sum"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=16,
        salt_source="l_orderkey",
    )
    return out.select(
        "key", "n", F.col("sum_qty_dec").cast("double").alias("sum_qty"), "max_price"
    )


def incremental_dedup_ingest(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist=None,
) -> DataFrame:
    """Dedup a NEW batch against everything ever ingested, using a
    persistent content-hash index — the incremental flow the reference's
    monthly-dump cadence implies (each month arrives as a new dump;
    re-deduping the full corpus per month is a 100 TB no-op generator).

    Steps: (1) sha256 each batch row (NULL content passes through as
    always-novel and never enters the index — NULL is not equal to
    NULL); (2) within-batch keep-first per hash (min id); (3) LEFT ANTI
    join against the stored index — only never-seen content survives;
    (4) hand the novel rows to ``persist`` (the caller's durable write);
    (5) append the survivors' hashes to the index ONLY AFTER persist
    returns.  Ordering matters: appending the index first would, on a
    crashed downstream write, permanently classify that month's content
    as already-seen — silent data loss on retry.  With no ``persist``
    callback the index append still happens (single-process convenience),
    and the docstring contract is: persist the returned rows in the same
    job or pass the callback.

    The returned DataFrame is eagerly localCheckpoint-ed BEFORE the index
    append: the anti-join plan must not re-execute against the index it
    just extended (lazy evaluation would otherwise make every returned
    row vanish on second reference).

    Scale: the batch side is a month (small); the index side is the
    corpus's hash set — join shuffles on the 32-byte hash with the batch
    side tiny, so AQE plans a broadcast of the BATCH hashes when it fits.
    Store the index bucketed on content_sha256 (write_bucketed) to skip
    the index-side exchange entirely at 100 TB; the index carries only
    (hash, first id) — bytes per corpus row, not the corpus."""
    from discogs_etl_spark.lake import fs_exists

    nulls = batch.where(F.col(content_col).isNull()).withColumn(
        "content_sha256", F.lit(None).cast("string")
    )
    w_first = Window.partitionBy("content_sha256").orderBy(F.asc(id_col))
    hashed = (
        batch.where(F.col(content_col).isNotNull())
        .withColumn("content_sha256", F.sha2(F.col(content_col), 256))
        .withColumn("__rn", F.row_number().over(w_first))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if fs_exists(spark, index_path):
        index = spark.read.parquet(index_path).select("content_sha256")
        novel = hashed.join(index, "content_sha256", "left_anti")
    else:
        novel = hashed
    novel = novel.unionByName(nulls).localCheckpoint(eager=True)
    if persist is not None:
        persist(novel)
    (
        novel.where(F.col("content_sha256").isNotNull())
        .select("content_sha256", F.col(id_col).alias("first_id"))
        .write.mode("append")
        .parquet(index_path)
    )
    return novel

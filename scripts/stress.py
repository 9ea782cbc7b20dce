#!/usr/bin/env python
"""Scale-stress smoke: run the heaviest operators on N-times-enlarged
inputs (in-memory union of the sf0.1 fixtures with shifted keys — no new
source data) and print per-scale wall times.  The point is slope, not
absolute numbers: a scalable plan grows ~linearly in rows; a quadratic
candidate explosion or a driver-side bottleneck shows up immediately.

    python scripts/stress.py [N ...]     # default scales: 1 5 20
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from discogs_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def enlarged_documents(spark, n: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    if n == 1:
        return base
    # range(n) x broadcast(docs): ONE scan, parallelism from the range
    # partitions.  (A first version unioned n separate scans — at n=100
    # that's a 100-child codegen unit and 100-task waves, superlinear for
    # harness reasons that have nothing to do with the operators under
    # test.)  Text perturbed per copy so dedup/minhash see distinct
    # content — the worst case for signature work.
    reps = spark.range(n).repartition(min(n, 32))
    return reps.join(F.broadcast(base)).select(
        (F.col("doc_id") + F.col("id") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copyid"), F.col("id").cast("string")).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )


def minhash_signatures(docs):
    """The map-only signature phase of dedup_minhash_lsh (the part whose
    cost scales with corpus size; banding/verify scale with collisions)."""
    from discogs_etl_spark.queries.llm import _MINHASH_A, _MINHASH_B, _MINHASH_P, _SHINGLES_SQL

    staged = docs.selectExpr("doc_id", "split(text, ' ') AS __w").selectExpr(
        "doc_id", _SHINGLES_SQL.format(w="__w") + " AS shingles"
    )
    hs = staged.selectExpr(
        "doc_id",
        "transform(shingles, s -> CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)"
        f" % {_MINHASH_P}L) AS hs",
    )
    return hs.selectExpr(
        "doc_id",
        *[
            f"array_min(transform(hs, h -> ({_MINHASH_A[i]}L * h + {_MINHASH_B[i]}L)"
            f" % {_MINHASH_P}L)) AS mh{i}"
            for i in range(16)
        ],
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark(app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()  # warmup

    for n in scales:
        docs = enlarged_documents(spark, n)
        rows = docs.count()
        t0 = time.perf_counter()
        (
            docs.groupBy(F.sha2("text", 256).alias("h"))
            .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("c"))
            .write.format("noop").mode("overwrite").save()
        )
        t_dedup = time.perf_counter() - t0
        t0 = time.perf_counter()
        minhash_signatures(docs).write.format("noop").mode("overwrite").save()
        t_sig = time.perf_counter() - t0
        print(
            f"scale={n:>3} rows={rows:>8} dedup_exact_hash={t_dedup:6.2f}s "
            f"minhash_signatures={t_sig:6.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()

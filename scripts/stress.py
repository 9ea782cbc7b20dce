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


def enlarged_embeddings(spark, n: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    if n == 1:
        return base
    reps = spark.range(n).repartition(min(n, 32))
    # perturb a middle dimension per copy: vectors stay distinct but most
    # copies keep their sign-LSH bucket — the worst case for bucketed
    # dedup (occupancy grows n-fold in the same 256 buckets)
    return reps.join(F.broadcast(base)).select(
        (F.col("vec_id") + F.col("id") * 1_000_000).alias("vec_id"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "(x, i) -> CASE WHEN i = 32 THEN x + CAST(id AS DOUBLE) * 1e-6 ELSE x END)"
        ).alias("embedding"),
        "label",
    )


def pack_sharded(docs):
    """The round-2 production packing window (per-(lang,source) shards).
    Enlarged fixtures keep the shard KEYS constant, so shard size grows
    n-fold — the within-shard sort is what's being stressed."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.selectExpr("doc_id", "lang", "source", "size(split(text, ' ')) AS n_tokens")
    return d.select(
        "doc_id",
        "lang",
        "source",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 512).cast("long").alias("bin_id"),
    )


def crossdoc_dup(docs):
    """Round-2 cross-doc duplicate-shingle profile: explode + counted
    inverted index + join back (two shuffles on the shingle key)."""
    from discogs_etl_spark.queries.llm import _SHINGLES_SQL

    sh = docs.selectExpr("doc_id", "split(text, ' ') AS __w").selectExpr(
        "doc_id", f"explode({_SHINGLES_SQL.format(w='__w')}) AS s"
    )
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )


def emb_bucket_pairs(embs):
    """Round-2 bucketed embedding dedup candidate join (pair counts grow
    with bucket occupancy squared — the knob is bucket bits)."""
    b = F.lit(0)
    for i in range(8):
        b = b + F.when(F.element_at(F.col("emb"), i + 1) > 0, F.lit(1 << i)).otherwise(0)
    e = embs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).select("vec_id", "emb", b.alias("bucket"))
    a = e.select(F.col("bucket"), F.col("vec_id").alias("va"))
    c = e.select(F.col("bucket").alias("bucket_b"), F.col("vec_id").alias("vb"))
    return a.join(
        c, (F.col("bucket") == F.col("bucket_b")) & (F.col("va") < F.col("vb"))
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("pairs"))


def enlarged_lineitem(spark, n: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    if n == 1:
        return base
    reps = spark.range(n).repartition(min(n, 32))
    # keys shifted per copy: the (partkey, suppkey) grouping cardinality
    # grows n-fold with the rows — partsupp derivation sees MORE groups,
    # not hotter ones (the honest scale axis for a dimension derivation)
    return reps.join(F.broadcast(base)).select(
        (F.col("l_orderkey") + F.col("id") * 1_000_000).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("id") * 1_000_000).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("id") * 1_000_000).alias("l_suppkey"),
        "l_quantity",
        "l_extendedprice",
    )


def partsupp_derive(li):
    """Round-2 derived partsupp (feeds TPC-H Q2/Q9/Q11/Q16/Q20): one
    partial-agg shuffle of lineitem on (partkey, suppkey)."""
    unit_cents = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("cost_c"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_f2"),
    )


def shuffle_shards(docs):
    """Round-2 deterministic corpus shuffle: one shuffle on the shard key,
    then per-shard independent sorts (parallelism = shard count)."""
    from pyspark.sql.window import Window

    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % 64
    )
    pos_key = F.md5(F.concat(F.lit("pos:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("pos_key", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard"), pos_key.alias("pos_key"))
        .select("doc_id", "shard", F.row_number().over(w).alias("pos"))
    )


def bm25_score(docs):
    """BM25 over an n-times corpus with a FIXED query set (the base
    copy's every-100th doc): the scale axis is the index side — postings,
    df, dl all grow with the corpus; the query fan-out does not."""
    k1, b = 1.2, 0.75
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 3)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dl = tok.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    q = tok.where(
        (F.col("doc_id") < 1_000_000) & (F.col("doc_id") % 100 == 0)
    ).select(F.col("doc_id").alias("q_id"), "w")
    joined = (
        q.join(tok.join(dfreq, "w").join(dl, "doc_id"), "w")
        .where(F.col("doc_id") != F.col("q_id"))
        .join(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfnorm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    )
    from pyspark.sql.window import Window

    scored = (
        joined.select("q_id", "doc_id", F.round(idf * tfnorm, 6).cast("decimal(28,6)").alias("c"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("c").alias("sc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sc"), F.asc("doc_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)


def coorder_edges(li):
    """The shared one-aggregation co-order edge build (triangle/PageRank/
    clustering-coefficient family) — order count grows n-fold."""
    parts = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .where(F.size("ps").between(2, 4))
    )
    pair_expr = F.flatten(
        F.expr(
            "transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1),"
            " y -> struct(x AS u, y AS v)))"
        )
    )
    return (
        parts.select(F.explode(pair_expr).alias("e")).select("e.u", "e.v").distinct()
    )


def pagerank_round(edges):
    """ONE PageRank power iteration over the symmetric edge set: the
    per-round cost that multiplies by the iteration count."""
    sym = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(F.col("u").alias("node"), F.lit(1.0).alias("rank"))
    contrib = (
        sym.join(deg, "u")
        .join(ranks.withColumnRenamed("node", "u"), "u")
        .select(
            F.col("v").alias("node"),
            F.round(F.col("rank") * 0.85 / F.col("deg") * 1e12).cast("long").alias("c"),
        )
    )
    return contrib.groupBy("node").agg(F.sum("c").alias("s"))


def kmeans_assign(embs):
    """One Lloyd assignment pass: broadcast 8 centroids, map-only
    distance argmin over the n-times corpus."""
    from pyspark.sql.window import Window

    emb = embs.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cent = (
        emb.where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dd = emb.join(F.broadcast(cent)).select(
        "vec_id", "cid", F.round(dist, 9).cast("decimal(38,9)").alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return dd.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)


def prefix_filter_candidates(docs):
    """PPJoin candidate generation: rare-first prefix postings self-join —
    the part whose growth separates prefix filtering from the full
    inverted-index join."""
    from pyspark.sql.window import Window

    from discogs_etl_spark.queries.llm import _SHINGLES_SQL

    staged = docs.selectExpr("doc_id", "split(text, ' ') AS __w").selectExpr(
        "doc_id", _SHINGLES_SQL.format(w="__w") + " AS shingles"
    )
    ex = staged.select("doc_id", F.explode("shingles").alias("sh"))
    freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("gf"))
    sizes = staged.select("doc_id", F.size("shingles").alias("L")).where(F.col("L") > 0)
    w = Window.partitionBy("doc_id").orderBy(F.asc("gf"), F.asc("sh"))
    prefix = (
        ex.join(freq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(F.col("rn") <= F.col("L") - F.ceil(F.lit(0.3) * F.col("L")) + 1)
        .select("doc_id", "sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def substring_windows(docs):
    """dedup_substring_windows' shuffle: every 48-char sliding window
    grouped corpus-wide.  Row fan-out is ~n_chars per doc — the heaviest
    map-side explosion in the registry; the HAVING-style filter keeps
    the reduce side honest."""
    winds = docs.where(F.length("text") >= 48).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 47),"
                " i -> substring(text, i, 48))"
            )
        ).alias("w")
    )
    return (
        winds.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
    )


def feature_hash(docs):
    """feature_hashing_vectorize's two aggregations — vocabulary-free, so
    the plan shape is identical at any corpus size."""
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hv = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
    return (
        tf.select(
            "doc_id",
            (hv % 1024).alias("fi"),
            F.when((F.floor(hv / 1024) % 2) == 0, F.col("cnt"))
            .otherwise(-F.col("cnt"))
            .alias("sc"),
        )
        .groupBy("doc_id", "fi")
        .agg(F.sum("sc").alias("v"))
        .where(F.col("v") != 0)
    )


def bigram_lm_score(docs):
    """lm_bigram_surprisal's LM build + score join (minus the driver-side
    vocab count — fixed at a constant here): two aggregations over the
    bigram stream, then the bigram-keyed scoring join."""
    inst = (
        docs.selectExpr("doc_id", "split(text, ' ') AS w")
        .where(F.size("w") >= 2)
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(1, size(w) - 1),"
            " i -> struct(element_at(w, i) AS w1,"
            " concat(element_at(w, i), ' ', element_at(w, i + 1)) AS bigram))) AS s",
        )
        .select("doc_id", "s.w1", "s.bigram")
    )
    bg = inst.groupBy("w1", "bigram").agg(F.count(F.lit(1)).alias("c2"))
    ctx = bg.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lm = bg.join(ctx, "w1").select(
        "bigram",
        (-F.log((F.col("c2") + 1) / (F.col("c1") + F.lit(50)).cast("double"))).alias("s"),
    )
    per = inst.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("k"))
    return (
        per.join(lm, "bigram")
        .groupBy("doc_id")
        .agg((F.sum(F.col("k") * F.col("s")) / F.sum("k")).alias("m"))
    )


def winnowing_select(docs):
    """dedup_winnowing_fingerprints' selection phase: positional 3-gram
    hashes + windowed-min fingerprints, all row-local — the map-side
    thinning that makes the downstream join ~2/(w+1) of the gram
    stream."""
    from discogs_etl_spark.queries.llm import _MINHASH_P

    w = docs.selectExpr("doc_id", "split(text, ' ') AS w").where(F.size("w") >= 6)
    hs = w.selectExpr(
        "doc_id",
        "transform(sequence(1, size(w) - 2),"
        " i -> CAST(conv(substring(md5(array_join(slice(w, i, 3), ' ')), 1, 12),"
        f" 16, 10) AS BIGINT) % {_MINHASH_P}L) AS hs",
    )
    sel = hs.selectExpr(
        "doc_id",
        "explode(array_distinct(transform(sequence(1, size(hs) - 3),"
        " j -> array_min(slice(hs, j, 4))))) AS fp",
    )
    return sel.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))


def char_entropy(docs):
    """text_char_entropy's window explode + per-doc entropy — the 2-char
    cousin of the 48-char substring shuffle."""
    ch = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    cnt = ch.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t").cast("double")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(-p * F.log(p)).alias("h"))
    )


def boilerplate_documents(spark, n: int):
    """Degenerate corpus for the round-4 bucket-skew guard: half the rows
    carry one of 4 fixed boilerplate texts (every copy of a template
    lands in the SAME LSH bucket in all 4 bands), half are unique.  At
    scale n the hot buckets hold ~625·n docs each — uncapped candidate
    generation would emit O((625·n)²) pairs per bucket, which is exactly
    the blowup the cap bounds."""
    base_rows = 5_000 * n
    tmpl = (
        "CASE WHEN id % 2 = 0 THEN concat("
        "'standard site footer text block number ', CAST(id % 4 AS STRING),"
        "' repeated verbatim on many pages of the crawl with no variation at all')"
        " ELSE concat('unique document ', CAST(id AS STRING),"
        " ' with words derived from its own identifier ',"
        " CAST(id * 7919 % 104729 AS STRING), ' ', CAST(id * 104729 % 7919 AS STRING))"
        " END"
    )
    return (
        spark.range(base_rows)
        .repartition(32)
        .selectExpr("id AS doc_id", f"{tmpl} AS text")
    )


def minhash_pairs_capped(spark, n: int):
    """The PRODUCTION dedup path under the round-4 skew guard
    (max_bucket=64): bucket sizes pre-counted with a mergeable
    aggregation, oversized boilerplate buckets excluded before
    collect_list.  Wall-clock should track the signature pass (~rows),
    never the quadratic in-bucket pair count the cap removed."""
    from discogs_etl_spark.queries.llm import minhash_pairs_df

    return minhash_pairs_df(boilerplate_documents(spark, n), max_bucket=64)


def skew_series_json(scales: list[int]) -> None:
    """The skew-guard scaling series as ONE JSON line — the recordable
    form of the round-4 stress prose, folded into SCALE_LADDER.json.
    Per scale: best-of-3 wall for the CAPPED production dedup path over
    the degenerate boilerplate corpus, next to best-of-3 for the bare
    map-only signature pass (minhash_bands_df) over the same corpus —
    flat capped-vs-signature tracking is the guard's whole claim (cost
    follows the signature pass, never the quadratic in-bucket pair
    count the cap removed)."""
    import json

    from discogs_etl_spark.queries.llm import minhash_bands_df

    spark = get_spark(app_name="stress-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    series = {}
    for n in scales:
        docs = boilerplate_documents(spark, n)
        rows = docs.count()
        timings = {}
        for name, build in (
            ("signature_pass", lambda: minhash_bands_df(boilerplate_documents(spark, n))),
            ("minhash_pairs_capped", lambda: minhash_pairs_capped(spark, n)),
        ):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        series[str(n)] = {"rows": rows, **timings}
    print(
        json.dumps(
            {
                "metric": "minhash_skew_guard_series",
                "unit": "sec",
                "max_bucket": 64,
                "corpus": "50% boilerplate across 4 templates / 50% unique",
                "runs": "best-of-3",
                "per_scale": series,
            }
        )
    )
    spark.stop()


def _synth_media_batches(batches):
    """Executor-side media synthesis: deterministic REAL container bytes
    per doc_id — incompressible 64x64 RGB PNGs (filter 0, the realistic
    inflate+unfilter workload), 16-bit stereo PCM WAVs, and AVI headers.
    Lives at module top level so Spark can pickle it without closures."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd

    def png(rng) -> bytes:
        h = w = 64
        px = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
        )

    def wav(rng) -> bytes:
        n_frames = int(rng.integers(1000, 3000))
        fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
        pcm = rng.integers(0, 256, size=n_frames * 4, dtype=np.uint8).tobytes()
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def avi(rng) -> bytes:
        avih = struct.pack(
            "<10I", 33333, 0, 0, 0, int(rng.integers(1, 10_000)), 0, 1, 0, 640, 480
        ) + bytes(16)
        hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
        body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        return b"RIFF" + struct.pack("<I", len(body)) + body

    kinds = (("image", png), ("audio", wav), ("video", avi))
    for pdf in batches:
        rows = []
        for doc_id in pdf["id"]:
            rng = np.random.default_rng(int(doc_id))
            media_type, make = kinds[int(doc_id) % 3]
            rows.append((int(doc_id), make(rng), media_type))
        yield pd.DataFrame(rows, columns=["doc_id", "payload", "media_type"])


def media_decode_series_json(scales: list[int]) -> None:
    """REAL-decode throughput series as ONE JSON line: decode_features
    with real=True over executor-synthesized PNG/WAV/AVI bytes.  The
    stage is map-only (inherits the scan's partitioning, zero shuffles),
    so the claim under test is linear rows-vs-wall and payload-MB/s
    tracking cores, not data size.  Synth is persisted and counted
    FIRST so the timed pass is decode work, not generation."""
    import json

    from discogs_etl_spark.multimodal import decode_features

    spark = get_spark(app_name="stress-media")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    series = {}
    for n in scales:
        synth = (
            spark.range(n)
            .repartition(32)
            .mapInPandas(
                _synth_media_batches,
                schema="doc_id long, payload binary, media_type string",
            )
            .persist()
        )
        rows = synth.count()
        mb = synth.agg(F.sum(F.length("payload"))).collect()[0][0] / 1e6
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            decode_features(synth, real=True).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        synth.unpersist()
        series[str(n)] = {
            "rows": rows,
            "payload_mb": round(mb, 1),
            "wall_s": round(best, 3),
            "mb_per_s": round(mb / best, 1),
        }
    print(
        json.dumps(
            {
                "metric": "real_decode_throughput_series",
                "unit": "sec",
                "mix": "1/3 PNG 64x64 RGB (incompressible) + 1/3 PCM WAV + 1/3 AVI header",
                "runs": "best-of-3 after persisted synth",
                "per_scale": series,
            }
        )
    )
    spark.stop()


def _twin_series_json(
    sfs: list[str],
    pairs: tuple[tuple[str, str], tuple[str, str]],
    payload: dict[str, str],
    app_name: str,
) -> None:
    """Shared exact-vs-production-twin wall-time series harness: per sf
    rung, best-of-3 wall (noop sink) for each (series_key, query_name)
    pair, plus the exact/twin speedup ratio — ONE methodology for every
    twin series so the discipline (best-of-3, warmup, unrounded-ratio
    guard) can never silently diverge between copies.  The speedup is
    computed from the UNROUNDED walls: a sub-millisecond twin run would
    round to 0.0 and ZeroDivisionError the sweep."""
    import json

    from discogs_etl_spark.registry import all_specs

    spark = get_spark(app_name=app_name)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    specs = all_specs()
    (exact_key, _), (twin_key, _) = pairs
    series = {}
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        timings = {}
        raw: dict[str, float] = {}
        for key, qname in pairs:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                specs[qname].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            raw[key] = best
            timings[key] = round(best, 3)
        timings["speedup"] = round(raw[exact_key] / raw[twin_key], 2)
        series[sf] = timings
    print(json.dumps({**payload, "per_sf": series}))
    spark.stop()


def bm25_prune_series_json(sfs: list[str]) -> None:
    """Exact-vs-pruned BM25 wall-time series as ONE JSON line (verdict
    r9 #4): per sf rung, best-of-3 wall for the exact postings plan
    (text_search_bm25_topk) next to the statically-pruned production
    twin (text_search_bm25_pruned_topk — median-df stopping +
    impact-ordered top-64 postings).  The recordable round-over-round
    form of the r9 "3.5x" note: the pruned twin's per-term fan-out is
    capped at 64 postings, so its wall should stay flat-ish while the
    exact plan's postings expansion grows with the corpus."""
    _twin_series_json(
        sfs,
        (
            ("bm25_exact", "text_search_bm25_topk"),
            ("bm25_pruned", "text_search_bm25_pruned_topk"),
        ),
        {
            "metric": "bm25_prune_series",
            "unit": "sec",
            "prune": "median-df stopping + impact-ordered top-64 postings",
            "runs": "best-of-3 (scripts/stress.py --bm25-json, noop sink)",
        },
        "stress-bm25",
    )


def pca_gram_series_json(sfs: list[str]) -> None:
    """Exact-vs-Gram PC1 wall-time series as ONE JSON line (verdict r10
    #5, the bm25_prune precedent): per sf rung, best-of-3 wall for the
    exact centered-covariance power iteration
    (embedding_power_iteration_pc1 — 3 corpus FileScans: mu subplan +
    covariance self-join x2) next to the Gram one-pass twin
    (embedding_power_iteration_pc1_gram — ONE FileScan, map-side
    partial Gram, 4096-rows-per-task shuffle invariant).  Records the
    r10 "~2.4x at sf0.1" as a round-over-round series instead of a
    one-off note."""
    _twin_series_json(
        sfs,
        (
            ("pca_exact", "embedding_power_iteration_pc1"),
            ("pca_gram", "embedding_power_iteration_pc1_gram"),
        ),
        {
            "metric": "pca_gram_series",
            "unit": "sec",
            "twin": "Gram one-pass covariance (1 FileScan) vs exact centered (3)",
            "runs": "best-of-3 (scripts/stress.py --pca-json, noop sink)",
        },
        "stress-pca",
    )


def main() -> None:
    flags = {"--skew-json", "--media-json", "--bm25-json", "--pca-json"}
    args = [a for a in sys.argv[1:] if a not in flags]
    if "--bm25-json" in sys.argv[1:]:
        bm25_prune_series_json(args or ["0.001", "0.01", "0.1"])
        return
    if "--pca-json" in sys.argv[1:]:
        pca_gram_series_json(args or ["0.001", "0.01", "0.1"])
        return
    scales = [int(a) for a in args] or [1, 5, 20]
    if "--media-json" in sys.argv[1:]:
        media_decode_series_json(scales)
        return
    if "--skew-json" in sys.argv[1:]:
        skew_series_json(scales)
        return
    spark = get_spark(app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()  # warmup

    for n in scales:
        docs = enlarged_documents(spark, n)
        embs = enlarged_embeddings(spark, n)
        rows = docs.count()
        timings = {}
        for name, df in (
            ("dedup_exact_hash", docs.groupBy(F.sha2("text", 256).alias("h")).agg(
                F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("c"))),
            ("minhash_signatures", minhash_signatures(docs)),
            ("pack_sharded", pack_sharded(docs)),
            ("crossdoc_dup", crossdoc_dup(docs)),
            ("emb_bucket_pairs", emb_bucket_pairs(embs)),
            ("partsupp_derive", partsupp_derive(enlarged_lineitem(spark, n))),
            ("shuffle_shards", shuffle_shards(docs)),
            ("bm25_score", bm25_score(docs)),
            ("pagerank_round", pagerank_round(coorder_edges(enlarged_lineitem(spark, n)))),
            ("kmeans_assign", kmeans_assign(embs)),
            ("prefix_filter_cand", prefix_filter_candidates(docs)),
            ("substring_windows", substring_windows(docs)),
            ("feature_hash", feature_hash(docs)),
            ("bigram_lm_score", bigram_lm_score(docs)),
            ("winnowing_select", winnowing_select(docs)),
            ("char_entropy", char_entropy(docs)),
            ("minhash_pairs_capped", minhash_pairs_capped(spark, n)),
        ):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = time.perf_counter() - t0
        print(
            f"scale={n:>3} rows={rows:>8} "
            + " ".join(f"{k}={v:6.2f}s" for k, v in timings.items())
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""SparkSession factory with scale-oriented defaults.

The reference runs one Python thread per dump inside a 2 vCPU AWS Batch
container (reference scripts/aws_batch_job_register.sh:6-7, SURVEY.md §3.2).
Here the unit of parallelism is the Spark task; these defaults are chosen so
the same code runs on ``local[N]`` for tests and on a 1000-executor cluster
unchanged:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- ``spark.sql.shuffle.partitions`` sized from the available cores locally;
  on a real cluster AQE coalesces the (higher) initial number down.
- 128 MiB file-split target (``maxPartitionBytes``) — the classic
  scan-parallelism sweet spot for Parquet.
- Arrow-backed Python interop (Pandas UDFs are the only Python on the hot
  path anywhere in this engine).
- UTC session timezone so timestamp semantics are environment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "host_fingerprint", "tune_for_correctness"]


def host_fingerprint() -> dict:
    """Hardware identity of the box a perf reading was taken on —
    stamped into bench.py and scripts/time_registry.py artifacts
    (r16 verdict task #3).  Round 16's quiet bench sat 15-50% above
    the documented band purely because the host changed under the
    artifacts (80 reported CPUs where prior sessions saw 32), and
    nothing on record could PROVE drift vs regression; with the
    fingerprint stamped, timing_compare prints a host-changed warning
    (informational, never a gate) and the round notes can cite it."""
    model = None
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpu_count": os.cpu_count(), "cpu_model": model}


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "discogs-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults."""
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: one shuffle partition per core is right at test SFs.
        # Cluster deployments should pass an explicit value (2-3x total
        # cores) and let AQE coalesce.
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate clones the full generator expression into
        # a pre-Generate filter; for expensive array builders (shingling)
        # that doubles the CPU of every explode — measured 2x on the
        # minhash pipeline.  The pruning it buys (skipping empty arrays
        # before Generate) is negligible for our plans.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # HotSpot never JIT-compiles methods over 8000 bytecodes
        # (-XX:-DontCompileHugeMethods is the non-default), so a
        # whole-stage-codegen method past that limit runs in the bytecode
        # INTERPRETER forever.  Spark's default only falls back past
        # 65535 (the JVM hard limit); aligning the fallback with the JIT
        # threshold makes big fused stages (the unrolled 64-dim dot
        # products) drop back to split per-expression codegen, which JITs.
        # Measured on the cosine pair family: the fused-but-unJITtable
        # plan runs 7x slower than the fallback (guide §1.2 step 3 — a
        # config that fixes a structural compilation problem).
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # zstd over the default snappy: ~30% smaller lake files for ~equal
        # read CPU — at 100 TB stored that's the cheaper default.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    return builder.getOrCreate()


def tune_for_correctness(spark: SparkSession) -> SparkSession:
    """Runtime-settable knobs applied when we receive a session we did not
    build (the verification driver constructs its own).  Only touches
    runtime-mutable confs; timestamp determinism is the critical one."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    # The driver's plain session keeps the 200-partition default; at the
    # correctness SFs that is pure scheduling overhead (notably for
    # stateful streaming, where state partitioning follows this number).
    spark.conf.set("spark.sql.shuffle.partitions", str(max(_cpus(), 8)))
    # Align the whole-stage-codegen fallback with HotSpot's 8000-bytecode
    # JIT ceiling (see get_spark) — runtime-mutable, value-neutral: it
    # changes WHICH compiled form runs, never what it computes.
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    return spark

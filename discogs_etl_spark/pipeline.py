"""End-to-end backfill orchestration (SURVEY.md §3.1-§3.3).

The reference's top entry point (reference run.py:20-41) lists dump keys,
organizes them into latest-per-(month, type), then processes each dump
STRICTLY SEQUENTIALLY on one thread, scaling out only by launching whole
containers per run (reference §3.3: Lambda / AWS Batch, 2 vCPU each).

Spark-shaped: the catalog is a DataFrame (sources.manifest), each dump is
an independent map-only job (gzip is unsplittable → intra-file parallelism
is impossible anyway, exactly the reference's constraint), and dumps run
CONCURRENTLY — a thread pool submits per-dump jobs to the shared scheduler,
which is how one Spark application saturates a cluster with many
single-task file reads.  Checksum verification (reference
process.py:95-173) is preserved as an audit record per dump, not an
inline side effect.
"""

from __future__ import annotations

import hashlib
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from discogs_etl_spark.lake import ingest_dump_to_lake
from discogs_etl_spark.sources.manifest import dumps_catalog, organize_dumps


@dataclass(frozen=True)
class DumpResult:
    filename: str
    data_type: str
    lake_path: str
    sha256: str | None
    checksum_ok: bool | None  # None → no expected checksum known


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@dataclass(frozen=True)
class LandedDump:
    url: str
    path: str
    sha256: str
    n_bytes: int


def land_dumps(
    urls: list[str], landing_dir: str, skip_existing: bool = True
) -> list[LandedDump]:
    """Land dump URLs into a local directory: sequential streamed GET with
    an inline sha256, atomic rename on completion (reference run.py:20-41
    goes URL→lake in one command; its downloader is io.py:153-382 — the
    ranged-parallel machinery there is deliberately NOT rebuilt, since
    landing is driver-side and gzip dumps are consumed whole anyway).

    ``skip_existing`` makes re-runs incremental: an already-landed file is
    re-hashed (cheap, local) but not re-fetched.  Partial downloads never
    become visible — data streams to ``<name>.part`` and is renamed only
    after the stream ends cleanly."""
    from urllib.parse import urlparse
    from urllib.request import urlopen

    os.makedirs(landing_dir, exist_ok=True)
    out: list[LandedDump] = []
    for url in urls:
        name = os.path.basename(urlparse(url).path)
        if not name:
            raise ValueError(f"cannot derive a filename from {url!r}")
        dest = os.path.join(landing_dir, name)
        if skip_existing and os.path.exists(dest):
            out.append(LandedDump(url, dest, _sha256_file(dest), os.path.getsize(dest)))
            continue
        h = hashlib.sha256()
        tmp = dest + ".part"
        with urlopen(url) as r, open(tmp, "wb") as f:  # noqa: S310 (caller-supplied URL)
            while chunk := r.read(1 << 20):
                f.write(chunk)
                h.update(chunk)
        os.replace(tmp, dest)
        out.append(LandedDump(url, dest, h.hexdigest(), os.path.getsize(dest)))
    return out


def backfill_from_urls(
    spark: SparkSession,
    urls: list[str],
    landing_dir: str,
    lake_root: str,
    checksums: DataFrame | None = None,
    max_concurrent_dumps: int = 4,
    verify_checksums: bool = True,
) -> list[DumpResult]:
    """The reference's one-command story (run.py:20-41): URLs → landing
    dir → parse → partitioned lake, checksum audit included."""
    landed = land_dumps(urls, landing_dir)
    return backfill(
        spark,
        [d.path for d in landed],
        lake_root,
        checksums=checksums,
        max_concurrent_dumps=max_concurrent_dumps,
        verify_checksums=verify_checksums,
    )


def backfill(
    spark: SparkSession,
    dump_paths: list[str],
    lake_root: str,
    checksums: DataFrame | None = None,
    max_concurrent_dumps: int = 4,
    verify_checksums: bool = True,
) -> list[DumpResult]:
    """Process a set of local/landed dump files into the partitioned lake.

    Concurrency model: one thread per in-flight dump; each thread submits
    a normal Spark job (parse → write), so the scheduler interleaves tasks
    from all dumps across the cluster.  The reference's month-by-month
    serial loop (run.py:28-41) becomes wall-clock-bounded by the LARGEST
    dump instead of the SUM of dumps."""
    catalog = dumps_catalog(spark, dump_paths)
    chosen = organize_dumps(catalog, checksums)
    rows = chosen.collect()  # catalog rows, not data — always tiny
    expected = {r["filename"]: r["checksum"] for r in rows} if checksums is not None else {}
    path_by_name = {os.path.basename(p): p for p in dump_paths}

    def run_one(row) -> DumpResult:
        path = path_by_name[row["filename"]]
        sha = ok = None
        if verify_checksums:
            sha = _sha256_file(path)
            exp = expected.get(row["filename"])
            ok = (sha.lower() == exp.lower()) if exp else None
        lake_path = ingest_dump_to_lake(spark, path, lake_root)
        return DumpResult(row["filename"], row["data_type"], lake_path, sha, ok)

    with ThreadPoolExecutor(max_workers=max_concurrent_dumps) as pool:
        return list(pool.map(run_one, rows))


def audit_table(spark: SparkSession, results: list[DumpResult]) -> DataFrame:
    """Checksum/landing audit as a DataFrame (the reference only logs;
    SURVEY.md §2.1 S8 says record instead)."""
    return spark.createDataFrame(
        [
            (r.filename, r.data_type, r.lake_path, r.sha256, r.checksum_ok)
            for r in results
        ],
        "filename string, data_type string, lake_path string, sha256 string, checksum_ok boolean",
    )

"""Dump catalog/manifest as DataFrame operators (SURVEY.md §2.1 S10-S13).

The reference's ``organize_discogs_files`` (s3.py:329-424) walks a Python
list of S3 keys, groups by year-month, keeps the LATEST file per
(month, type) via pairwise compares (s3.py:384-386), and attaches expected
checksums parsed from CHECKSUM.txt manifests (s3.py:292-327).  Here the
same catalog logic is relational: a window argmax plus a broadcast
left-outer join — the shape that scales to millions of catalog entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# matches e.g. data/2019/discogs_20190301_artists.xml.gz
_FNAME_PATTERN = r"discogs_(\d{8})_(artists|labels|masters|releases)\.xml\.gz"


def dumps_catalog(spark: SparkSession, keys: list[str], base_url: str = "") -> DataFrame:
    """Key list → typed catalog rows (filename, date, type, url)."""
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    date = F.regexp_extract("key", _FNAME_PATTERN, 1)
    plural = F.regexp_extract("key", _FNAME_PATTERN, 2)
    return (
        df.where(date != "")
        .select(
            F.element_at(F.split("key", "/"), -1).alias("filename"),
            F.to_date(date, "yyyyMMdd").alias("dump_date"),
            F.date_format(F.to_date(date, "yyyyMMdd"), "yyyy-MM").alias("year_month"),
            # plural → singular type map (reference s3.py:390-395)
            F.regexp_replace(plural, "s$", "").alias("data_type"),
            F.concat(F.lit(base_url), F.col("key")).alias("url"),
        )
    )


def parse_checksum_manifest(spark: SparkSession, manifest_text: str) -> DataFrame:
    """CHECKSUM.txt lines ``<sum> [*]<file>`` → (filename, checksum)
    (reference s3.py:292-327)."""
    lines = [ln.strip() for ln in manifest_text.splitlines() if ln.strip()]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    return df.select(
        F.regexp_extract("line", r"^(\S+)\s+\*?(.+)$", 2).alias("filename"),
        F.regexp_extract("line", r"^(\S+)\s+\*?(.+)$", 1).alias("checksum"),
    ).where(F.col("filename") != "")


def organize_dumps(catalog: DataFrame, checksums: DataFrame | None = None) -> DataFrame:
    """Latest file per (year_month, data_type), with checksum attached.

    Spark translation of reference s3.py:329-424: the pairwise-compare
    argmax (s3.py:384-386) becomes ``row_number`` over a
    (year_month, data_type) window ordered by dump_date desc; the
    checksum dict lookup (s3.py:399-416) becomes a broadcast left join.
    """
    w = Window.partitionBy("year_month", "data_type").orderBy(
        F.desc("dump_date"), F.desc("filename")
    )
    latest = (
        catalog.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    if checksums is not None:
        latest = latest.join(F.broadcast(checksums), "filename", "left")
    return latest

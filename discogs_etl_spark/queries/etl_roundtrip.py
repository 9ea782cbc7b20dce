"""ETL-plane end-to-end roundtrip as an oracle-checked query.

Every other registered query exercises the ANALYTICS plane; this one
drives the reference's core pipeline (reference etl.py:316-534: dump →
parse → partitioned lake) through the Spark engine and lets the DuckDB
oracle read the PRODUCED parquet back — so the XML kernel (S1-S6), the
typed coercions (P1-P5, reference parser.py:30-169), and the lake layout
(K1/K5, reference s3.py:40-52) earn a driver CORRECTNESS row instead of
living on local tests alone.

Shape: a golden Discogs-release dump (every §1.2 coercion: missing id→0,
qty→"1" string, image dims→0, empty lists ≠ null, control-char scrub,
whitespace collapse, stray attrs) is gzipped to a deterministic temp
path, ingested with ``ingest_dump_to_lake`` (year/month derived from the
FILENAME, not the data), and the lake is read back with partition
discovery.  The oracle is DuckDB ``read_parquet(...hive_partitioning...)``
over the same written files — two independent readers agreeing on the
bytes the engine wrote.

Result cells are scalars only (array_join / element_at flattening): the
driver's value-hasher rejects list cells (see tests/test_oracle.py).
"""

from __future__ import annotations

import gzip
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_etl_spark.registry import register

# Deterministic location shared by the Spark writer and the DuckDB oracle
# (the oracle is a static SQL string, so the path cannot vary per run).
ROUNDTRIP_ROOT = os.path.join(tempfile.gettempdir(), "discogs_etl_spark_roundtrip")
_DUMP_NAME = "discogs_20240101_releases.xml.gz"

# Golden release dump — exercises the full §1.2 coercion surface:
# record 1: nested images/labels/formats/descriptions, control char in
#   title (scrub → space → ws-collapse), newline in notes (streaming-path
#   whitespace collapse), partial date kept as string, qty string;
# record 2: attribute-less husk — id defaults to 0, lists to [], text to
#   NULL (reference parser.py:100-144 semantics).
_GOLDEN_RELEASES_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<releases>
  <release id="7001" status="Accepted">
    <title>Round\x07Trip</title>
    <country>US</country>
    <released>1999-00-00</released>
    <notes>first line
second line</notes>
    <images>
      <image height="600" width="600" type="primary" uri="u1" uri150="u2"/>
      <image type="secondary"/>
    </images>
    <artists><artist><name>Alpha</name></artist><artist><name>Beta</name></artist></artists>
    <labels><label name="LabelX" catno="LX-1"/><label name="LabelY"/></labels>
    <formats>
      <format name="Vinyl" qty="2"><descriptions><description>12\"</description><description>LP</description></descriptions></format>
      <format name="CD"/>
    </formats>
    <genres><genre>Electronic</genre><genre>Jazz</genre></genres>
    <styles><style>House</style></styles>
  </release>
  <release id="7002" status="Draft">
    <title>Plain</title>
    <genres><genre>Jazz</genre></genres>
  </release>
  <release>
    <title>No Attrs</title>
  </release>
</releases>
"""


def _lake_root() -> str:
    return os.path.join(ROUNDTRIP_ROOT, "lake")


def _stage_dump() -> str:
    """Write the gzipped golden dump to its deterministic path (idempotent:
    rewrite every time so a stale fixture from an older code version can
    never leak into this run's lake)."""
    dump_dir = os.path.join(ROUNDTRIP_ROOT, "dumps")
    os.makedirs(dump_dir, exist_ok=True)
    path = os.path.join(dump_dir, _DUMP_NAME)
    with gzip.open(path, "wb") as f:
        f.write(_GOLDEN_RELEASES_XML)
    return path


_ROUNDTRIP_ORACLE = f"""
    SELECT id, status, title, country, released, notes,
           -- the kernel writes empty lists, never NULL lists (reference
           -- parser.py:108-113); DuckDB's array_to_string([]) yields NULL
           -- where Spark's array_join([]) yields '' — coalesce to match
           COALESCE(array_to_string(genres, '|'), '') AS genres_joined,
           COALESCE(array_to_string(styles, '|'), '') AS styles_joined,
           COALESCE(array_to_string(artists, '|'), '') AS artists_joined,
           CAST(len(images) AS BIGINT) AS n_images,
           images[1].height AS img0_height,
           images[2].width AS img1_width,
           labels[1].name AS label0_name,
           labels[2].catno AS label1_catno,
           formats[1].qty AS fmt0_qty,
           array_to_string(formats[1].descriptions, '|') AS fmt0_desc,
           formats[2].qty AS fmt1_qty,
           CAST(year AS INT) AS year,
           month
    FROM read_parquet(
        '{_lake_root()}/releases/*/*/*.parquet', hive_partitioning = true)
"""


@register(
    "xml_ingest_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("etl", "xml", "lake", "roundtrip"),
)
def xml_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dump → XML kernel → partitioned lake → partition-discovering read,
    flattened to driver-hashable scalars.  ``sf_dir`` is unused: the input
    is the golden dump (the ETL plane has no sf-scaled fixture), kept as a
    parameter for the registry's uniform signature."""
    from discogs_etl_spark.lake import ingest_dump_to_lake, read_lake

    dump = _stage_dump()
    ingest_dump_to_lake(spark, dump, _lake_root())
    back = read_lake(spark, _lake_root(), "release")
    img0 = F.try_element_at("images", F.lit(1))
    img1 = F.try_element_at("images", F.lit(2))
    lbl0 = F.try_element_at("labels", F.lit(1))
    lbl1 = F.try_element_at("labels", F.lit(2))
    fmt0 = F.try_element_at("formats", F.lit(1))
    fmt1 = F.try_element_at("formats", F.lit(2))
    return back.select(
        "id",
        "status",
        "title",
        "country",
        "released",
        "notes",
        F.array_join("genres", "|").alias("genres_joined"),
        F.array_join("styles", "|").alias("styles_joined"),
        F.array_join("artists", "|").alias("artists_joined"),
        F.size("images").cast("long").alias("n_images"),
        img0.getField("height").alias("img0_height"),
        img1.getField("width").alias("img1_width"),
        lbl0.getField("name").alias("label0_name"),
        lbl1.getField("catno").alias("label1_catno"),
        fmt0.getField("qty").alias("fmt0_qty"),
        F.array_join(fmt0.getField("descriptions"), "|").alias("fmt0_desc"),
        fmt1.getField("qty").alias("fmt1_qty"),
        "year",
        "month",
    )


_DATASOURCE_ORACLE = """
    SELECT * FROM (VALUES
        (CAST(7001 AS BIGINT), 'Round Trip', 'Accepted', 'Electronic|Jazz',
         CAST(2 AS INT), '2', '1', CAST(2024 AS INT), '01'),
        (CAST(7002 AS BIGINT), 'Plain', 'Draft', 'Jazz',
         CAST(0 AS INT), NULL, NULL, CAST(2024 AS INT), '01'),
        (CAST(0 AS BIGINT), 'No Attrs', NULL, '',
         CAST(0 AS INT), NULL, NULL, CAST(2024 AS INT), '01')
    ) AS t(id, title, status, genres_joined, n_images, fmt0_qty, fmt1_qty,
           year, month)
"""


@register(
    "xml_datasource_scan",
    oracle=_DATASOURCE_ORACLE,
    tags=("etl", "xml", "datasource"),
)
def xml_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XML kernel through the FRAMEWORK surface:
    ``spark.read.format("discogs_xml")`` (Python DataSource API, one
    partition per dump file — see sources/datasource.py) over the golden
    dump, flattened to scalars.  The oracle is the expected parse pinned
    as SQL VALUES — the reference's §1.2 coercion table frozen as
    literals (missing id→0, qty→"1" string, control-char scrub +
    whitespace collapse in titles, empty lists join to '').

    Partition values (year/month) come from the dump FILENAME — computed
    here with the same parse_dump_url the lake writer uses."""
    from discogs_etl_spark.lake import parse_dump_url
    from discogs_etl_spark.sources.datasource import register as _register_ds

    _register_ds(spark)
    dump = _stage_dump()
    info = parse_dump_url(dump)
    df = spark.read.format("discogs_xml").option("path", dump).load()
    return df.select(
        "id",
        "title",
        "status",
        F.array_join("genres", "|").alias("genres_joined"),
        F.size("images").cast("int").alias("n_images"),
        F.try_element_at("formats", F.lit(1)).getField("qty").alias("fmt0_qty"),
        F.try_element_at("formats", F.lit(2)).getField("qty").alias("fmt1_qty"),
        F.lit(info["year"]).cast("int").alias("year"),
        F.lit(info["month"]).alias("month"),
    )


@register(
    "xml_datasource_stream_scan",
    oracle=_DATASOURCE_ORACLE,
    tags=("etl", "xml", "datasource", "streaming"),
)
def xml_datasource_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XML kernel through the STREAM surface of the Python DataSource:
    ``spark.readStream.format("discogs_xml")`` over a landing DIRECTORY
    (offsets = the set of dump files seen; each micro-batch parses only
    new arrivals — the monthly-dump consumption model with exactly-once
    from the engine's offset log, sources/datasource.py _StreamReader),
    drained with Trigger.AvailableNow into a memory sink and flattened to
    the same scalars as the batch twin ``xml_datasource_scan`` — so both
    halves of the registered source share one VALUES oracle (the §1.2
    coercion table as literals).  Until this query the stream reader was
    pytest-only; this is its driver CORRECTNESS row."""
    from discogs_etl_spark.lake import parse_dump_url
    from discogs_etl_spark.sources.datasource import register as _register_ds

    _register_ds(spark)
    # a dedicated landing dir (not the batch dump dir) so the stream scan
    # exercises directory listing + filename type detection on its own.
    # Wiped first: the stream reader drains the whole DIRECTORY, so a
    # stale dump left by an older code version (different _DUMP_NAME, an
    # aborted run) would add rows beyond the pinned VALUES oracle —
    # same-name rewriting alone doesn't cover directory-based staleness.
    import shutil

    land = os.path.join(ROUNDTRIP_ROOT, "stream_landing")
    shutil.rmtree(land, ignore_errors=True)
    os.makedirs(land, exist_ok=True)
    path = os.path.join(land, _DUMP_NAME)
    with gzip.open(path, "wb") as f:
        f.write(_GOLDEN_RELEASES_XML)
    info = parse_dump_url(path)
    stream = spark.readStream.format("discogs_xml").option("path", land).load()
    flat = stream.select(
        "id",
        "title",
        "status",
        F.array_join("genres", "|").alias("genres_joined"),
        F.size("images").cast("int").alias("n_images"),
        F.try_element_at("formats", F.lit(1)).getField("qty").alias("fmt0_qty"),
        F.try_element_at("formats", F.lit(2)).getField("qty").alias("fmt1_qty"),
        F.lit(info["year"]).cast("int").alias("year"),
        F.lit(info["month"]).alias("month"),
    )
    q = (
        flat.writeStream.format("memory")
        .queryName("xml_datasource_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("xml_datasource_stream_sink")


_GOLDEN_ARTISTS_XML = b"""<artists>
  <artist>
    <id>42</id>
    <name>Zeta</name>
    <realname>Z Real</realname>
    <profile>profile
text</profile>
    <data_quality>Correct</data_quality>
    <namevariations><name>Z1</name><name>Z2</name></namevariations>
    <aliases><name>A1</name></aliases>
    <groups/>
    <members><name>M1</name><name>M2</name></members>
    <urls><url>http://z</url><url/></urls>
    <images><image height="10" width="20" type="primary" uri="u" uri150="v"/></images>
  </artist>
  <artist><name>NoId</name></artist>
</artists>
"""

_ARTIST_DUMP_NAME = "discogs_20240301_artists.xml.gz"


def _stage_artist_dump() -> str:
    dump_dir = os.path.join(ROUNDTRIP_ROOT, "dumps")
    os.makedirs(dump_dir, exist_ok=True)
    path = os.path.join(dump_dir, _ARTIST_DUMP_NAME)
    with gzip.open(path, "wb") as f:
        f.write(_GOLDEN_ARTISTS_XML)
    return path


_ARTIST_ROUNDTRIP_ORACLE = f"""
    SELECT id, name, realname, profile, data_quality,
           COALESCE(array_to_string(namevariations, '|'), '') AS variations_joined,
           COALESCE(array_to_string(aliases, '|'), '') AS aliases_joined,
           COALESCE(array_to_string(groups, '|'), '') AS groups_joined,
           COALESCE(array_to_string(members, '|'), '') AS members_joined,
           CAST(len(urls) AS BIGINT) AS n_urls,
           images[1].height AS img0_height,
           CAST(year AS INT) AS year,
           month
    FROM read_parquet(
        '{_lake_root()}/artists/*/*/*.parquet', hive_partitioning = true)
"""


@register(
    "xml_ingest_roundtrip_artist",
    oracle=_ARTIST_ROUNDTRIP_ORACLE,
    tags=("etl", "xml", "lake", "roundtrip", "artist"),
)
def xml_ingest_roundtrip_artist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Artist-entity roundtrip — the SECOND schema family through the full
    pipeline (release covers deep nesting; artist covers the flat-text +
    many-list shape: namevariations/aliases/groups/members, reference
    parser.py:146-169): golden dump → kernel → partitioned lake → DuckDB
    reads the written parquet.  Pins missing id→0, empty <groups/> → []
    not NULL, whitespace collapse in profile, and the March partition
    deriving from the FILENAME."""
    from discogs_etl_spark.lake import ingest_dump_to_lake, read_lake

    dump = _stage_artist_dump()
    ingest_dump_to_lake(spark, dump, _lake_root())
    back = read_lake(spark, _lake_root(), "artist")
    img0 = F.try_element_at("images", F.lit(1))
    return back.select(
        "id",
        "name",
        "realname",
        "profile",
        "data_quality",
        F.array_join("namevariations", "|").alias("variations_joined"),
        F.array_join("aliases", "|").alias("aliases_joined"),
        F.array_join("groups", "|").alias("groups_joined"),
        F.array_join("members", "|").alias("members_joined"),
        F.size("urls").cast("long").alias("n_urls"),
        img0.getField("height").alias("img0_height"),
        "year",
        "month",
    )

"""Dump catalog operators (SURVEY.md §2.1 S10-S13): latest-per-month
window argmax + checksum manifest broadcast join."""

from __future__ import annotations

from discogs_etl_spark.sources.manifest import (
    dumps_catalog,
    organize_dumps,
    parse_checksum_manifest,
)

KEYS = [
    "data/2019/discogs_20190301_artists.xml.gz",
    "data/2019/discogs_20190308_artists.xml.gz",  # later in same month -> wins
    "data/2019/discogs_20190301_releases.xml.gz",
    "data/2019/discogs_20190401_releases.xml.gz",
    "data/2019/CHECKSUM.txt",  # non-dump entries are dropped
]

MANIFEST = """
abc123 *discogs_20190308_artists.xml.gz
def456 discogs_20190301_releases.xml.gz
"""


def test_organize_latest_per_month(spark):
    cat = dumps_catalog(spark, KEYS, base_url="https://dumps/")
    assert cat.count() == 4
    latest = organize_dumps(cat)
    rows = {(r["year_month"], r["data_type"]): r for r in latest.collect()}
    assert set(rows) == {("2019-03", "artist"), ("2019-03", "release"), ("2019-04", "release")}
    # argmax(date) within the month (reference s3.py:384-386)
    assert rows[("2019-03", "artist")]["filename"] == "discogs_20190308_artists.xml.gz"
    assert rows[("2019-03", "artist")]["url"].startswith("https://dumps/data/2019/")


def test_checksum_join(spark):
    cat = dumps_catalog(spark, KEYS)
    sums = parse_checksum_manifest(spark, MANIFEST)
    latest = organize_dumps(cat, sums)
    rows = {r["filename"]: r["checksum"] for r in latest.collect()}
    assert rows["discogs_20190308_artists.xml.gz"] == "abc123"
    assert rows["discogs_20190301_releases.xml.gz"] == "def456"
    assert rows["discogs_20190401_releases.xml.gz"] is None

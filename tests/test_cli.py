"""CLI parity tests (reference run.py): backfill → query → compact over a
real lake, driven exactly as a reference user would."""

from __future__ import annotations

import gzip
import json

from discogs_etl_spark.cli import main
from tests.test_xml_ingest import RELEASE_XML


def test_cli_backfill_query_compact(spark, tmp_path, capsys):
    d1 = tmp_path / "discogs_20190301_releases.xml.gz"
    d1.write_bytes(gzip.compress(RELEASE_XML))
    lake = str(tmp_path / "lake")

    assert main(["backfill", str(d1), "--lake", lake]) == 0
    audit = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert audit[0]["filename"] == d1.name and audit[0]["data_type"] == "release"

    # the README flagship query, via the CLI's SQL surface (README.md:84-87)
    rc = main(
        [
            "query",
            "SELECT id, title FROM releases "
            "WHERE array_contains(genres, 'Jazz') AND size(genres) > 1 "
            "ORDER BY id",
            "--lake",
            lake,
            "--limit",
            "20",
        ]
    )
    assert rc == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert [r["id"] for r in rows] == [1]

    assert main(["compact", "--lake", lake, "--type", "release"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rewritten_partitions" in out

"""Curation API edge cases (the review-fix contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from discogs_etl_spark.curation import dedup_corpus, profile_table


def test_exact_dedup_preserves_null_content_rows(spark):
    """Distinct documents with NULL content are NOT duplicates of each
    other — all survive exact dedup."""
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    survivors, report = dedup_corpus(spark, df, method="exact")
    ids = {r["doc_id"] for r in survivors.collect()}
    assert ids == {1, 3, 4, 5}  # one 'same' survivor, both NULLs, 'other'
    assert report.first()["n_removed"] == 1


def test_dedup_does_not_clobber_dunder_columns(spark):
    """User columns named like our temp columns survive intact."""
    df = spark.createDataFrame(
        [(1, "a", "keep1"), (2, "a", "keep2")],
        "doc_id long, text string, __detl_id string",
    )
    survivors, _ = dedup_corpus(spark, df, method="exact")
    assert "__detl_id" in survivors.columns
    assert survivors.first()["__detl_id"] == "keep1"


def test_minhash_dedup_with_null_texts(spark):
    """NULL texts neither crash shingling nor get removed."""
    from discogs_etl_spark.tables import load

    base = load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    with_nulls = base.unionByName(
        spark.createDataFrame([(9_000_001, None), (9_000_002, None)],
                              "doc_id long, text string")
    )
    survivors, report = dedup_corpus(spark, with_nulls, method="minhash")
    assert survivors.where(F.col("doc_id") >= 9_000_000).count() == 2
    assert report.first()["n_input"] == base.count() + 2


def test_minhash_bucket_skew_guard_bounds_degenerate_buckets(spark):
    """A boilerplate corpus (many docs with IDENTICAL text) hashes every
    copy into the same LSH bucket in all 4 bands — uncapped that is one
    O(k²) pair blowup per band.  With max_bucket set: (1) the oversized
    buckets are excluded, so all boilerplate docs SURVIVE (bounded work,
    recall traded inside the degenerate bucket only); (2) genuine small
    duplicate groups elsewhere still dedup; (3) the report accounts for
    exactly what was skipped."""
    boiler = "the standard footer text repeated on every page of this site"
    uniq = "completely different document number {} with its own words here"
    rows = [(i, boiler) for i in range(50)]
    rows += [(100, uniq.format("one")), (101, uniq.format("one"))]  # true dups
    rows += [(200, uniq.format("two zebra"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    survivors, report = dedup_corpus(spark, df, method="minhash", max_bucket=10)
    ids = {r["doc_id"] for r in survivors.collect()}
    # all 50 boilerplate docs survive (their buckets were dropped) ...
    assert set(range(50)).issubset(ids)
    # ... the genuine pair still dedups to its min id, others untouched
    assert 100 in ids and 101 not in ids and 200 in ids
    rep = report.first()
    # identical text -> identical signature -> one oversized bucket per band
    assert rep["n_dropped_buckets"] == 4
    # DISTINCT documents (same unit as n_input), not docs x bands
    assert rep["n_docs_in_dropped_buckets"] == 50
    assert rep["n_removed"] == 1

    # uncapped control: the boilerplate group collapses to one survivor
    # and the report's new accounting stays zero
    survivors_u, report_u = dedup_corpus(spark, df, method="minhash")
    ids_u = {r["doc_id"] for r in survivors_u.collect()}
    assert ids_u == {0, 100, 200}
    rep_u = report_u.first()
    assert rep_u["n_dropped_buckets"] == 0
    assert rep_u["n_docs_in_dropped_buckets"] == 0


def test_profile_table_single_scan_any_schema(spark):
    """One row per column, nested columns profiled by JSON identity."""
    from discogs_etl_spark.tables import load

    df = load(spark, "/root/testdata/sf0.001", "documents")
    prof = {r["col"]: r for r in profile_table(df).collect()}
    assert set(prof) == set(df.columns)
    n = df.count()
    assert all(r["n_rows"] == n for r in prof.values())
    assert prof["doc_id"]["n_nulls"] == 0
    # HLL estimate of a unique key is within a few % of exact
    assert abs(prof["doc_id"]["n_distinct_approx"] - n) / n < 0.1


def test_datasource_mixed_types_rejected(spark, tmp_path):
    """A landing dir mixing entity types must fail at planning, not parse
    releases with the artist kernel."""
    import gzip

    from discogs_etl_spark.sources.datasource import register
    from tests.test_xml_ingest import ARTIST_XML, RELEASE_XML

    register(spark)
    d = tmp_path / "landing"
    d.mkdir()
    (d / "discogs_20240101_artists.xml.gz").write_bytes(gzip.compress(ARTIST_XML))
    (d / "discogs_20240101_releases.xml.gz").write_bytes(gzip.compress(RELEASE_XML))
    with pytest.raises(Exception, match="mixed entity types"):
        spark.read.format("discogs_xml").option("path", str(d)).load().count()


def test_datasource_no_match_fails_at_planning(spark, tmp_path):
    from discogs_etl_spark.sources.datasource import register

    register(spark)
    with pytest.raises(Exception, match="no input files"):
        (
            spark.read.format("discogs_xml")
            .option("path", str(tmp_path / "*.xml.gz"))
            .load()
            .count()
        )


def test_exact_dedup_properties_hypothesis(spark):
    """Property: for ANY corpus, exact dedup (a) keeps exactly one row
    per distinct non-null text, (b) keeps every NULL-text row, (c) the
    survivor of each text group is the minimum id."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.one_of(st.none(), st.text(alphabet="abcd ", max_size=8)),
        min_size=0,
        max_size=25,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts)
    def check(ts):
        rows = [(i, t) for i, t in enumerate(ts)]
        if not rows:
            return
        df = spark.createDataFrame(rows, "doc_id long, text string")
        survivors, report = dedup_corpus(spark, df, method="exact")
        got = {(r["doc_id"], r["text"]) for r in survivors.collect()}
        nulls = {(i, t) for i, t in rows if t is None}
        keepers = {}
        for i, t in rows:
            if t is not None and (t not in keepers or i < keepers[t]):
                keepers[t] = i
        expected = nulls | {(i, t) for t, i in keepers.items()}
        assert got == expected
        assert report.first()["n_removed"] == len(rows) - len(expected)

    check()


def test_weighted_sample_and_ewma_null_safety(spark):
    """Engine-divergence armor: NULL weights must not blank the sampling
    priority (Spark greatest skips NULLs, DuckDB returns NULL), and the
    EWMA fold must skip NULL values the same way on both engines (Spark
    collect_list drops NULLs, DuckDB list() keeps them).  Pin the Spark
    side's behavior on a corpus WITH nulls."""
    from discogs_etl_spark.registry import all_specs  # noqa: F401  (registry import pattern)
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "s1", None), (2, "s1", 50), (3, "s1", None), (4, "s1", 10)],
        "doc_id long, source string, n_chars int",
    )
    pri = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
        " DIV greatest(coalesce(n_chars, 1), 1)"
    )
    out = docs.select("doc_id", pri.alias("priority")).collect()
    assert all(r["priority"] is not None for r in out)

    # EWMA: NULL values must be dropped BEFORE the ordered collect, so
    # the fold walks only non-null values (regression guard for the
    # isNotNull filter in stats_ewma_per_user)
    import datetime

    ev = spark.createDataFrame(
        [
            (1, 10, datetime.datetime(2024, 1, 1, 0, 0, 0), 2.0),
            (2, 10, datetime.datetime(2024, 1, 1, 0, 1, 0), None),
            (3, 10, datetime.datetime(2024, 1, 1, 0, 2, 0), 4.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    from pyspark.sql.window import Window

    base = ev.where(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    seq = (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
                lambda s: s.value,
            ).alias("vals")
        )
    )
    vals = seq.collect()[0]["vals"]
    assert vals == [2.0, 4.0]  # the NULL row is gone, order preserved
    ewma = F.aggregate(
        F.slice("vals", 2, F.size("vals") - 1),
        F.round(F.element_at("vals", 1), 6),
        lambda acc, x: F.round(x * F.lit(0.2) + acc * F.lit(0.8), 6),
    )
    got = seq.select(ewma.alias("e")).collect()[0]["e"]
    assert got == round(4.0 * 0.2 + 2.0 * 0.8, 6)


def test_validate_table_matches_python_reference(spark):
    """Property test: validate_table's violation counts must equal an
    independent pure-Python evaluation of the same rules over
    hypothesis-generated rows (NULLs, duplicates, boundary values)."""
    from hypothesis import given, settings, strategies as st

    from discogs_etl_spark.curation import validate_table

    row = st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.one_of(st.none(), st.floats(min_value=-50, max_value=150,
                                       allow_nan=False)),
        st.sampled_from(["a", "b", "c", None]),
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=1, max_size=12))
    def check(rows):
        df = spark.createDataFrame(rows, "k int, v double, tag string")
        rep = {
            r["check_name"]: r["n_violations"]
            for r in validate_table(
                spark,
                df,
                ["not_null:k", "unique:k", "range:v:0:100", "in_set:tag:a|b"],
            ).collect()
        }
        ks = [r[0] for r in rows]
        vs = [r[1] for r in rows]
        tags = [r[2] for r in rows]
        nn = [k for k in ks if k is not None]
        assert rep["not_null(k)"] == sum(1 for k in ks if k is None)
        assert rep["unique(k)"] == len(nn) - len(set(nn))
        # NULLs never violate range/in_set (SQL three-valued logic:
        # NOT(NULL between ...) is NULL, not TRUE)
        assert rep["range(v,0,100)"] == sum(
            1 for v in vs if v is not None and not (0 <= v <= 100)
        )
        assert rep["in_set(tag)"] == sum(
            1 for t in tags if t is not None and t not in ("a", "b")
        )

    check()


def test_dedup_media_phash_pipeline(spark):
    """dedup_media = the dedup_corpus contract for opaque-binary media:
    the oracle-checked phash pipeline (64-bit hash, pre-grouping,
    banded hamming<=7, CC keep-first), fixture-pinned on the sf0.001
    image slice, with the max_bucket skew guard's accounting."""
    import pyspark.sql.functions as F

    from discogs_etl_spark.curation import dedup_media
    from discogs_etl_spark.multimodal import with_payload
    from discogs_etl_spark.tables import load

    media = with_payload(load(spark, "/root/testdata/sf0.001", "documents")).where(
        F.col("media_type") == "image"
    )
    surv, rep = dedup_media(spark, media)
    r = rep.collect()[0]
    assert (r.method, r.n_input, r.n_survivors, r.n_removed) == (
        "phash", 167, 142, 25,
    )
    assert (r.n_dropped_buckets, r.n_docs_in_dropped_buckets) == (0, 0)
    assert surv.schema == media.schema  # survivors keep the input schema
    # keep-first: every removed id is larger than some surviving id it
    # paired with — spot-invariant: the global min doc_id always survives
    assert surv.agg(F.min("doc_id")).collect()[0][0] == media.agg(
        F.min("doc_id")
    ).collect()[0][0]

    # the skew guard trades near-dup recall inside hot buckets for
    # bounded memory and REPORTS the exposure
    surv2, rep2 = dedup_media(spark, media, max_bucket=3)
    r2 = rep2.collect()[0]
    assert r2.n_removed <= r.n_removed  # cap only reduces pair output
    assert r2.n_dropped_buckets > 0
    assert 0 < r2.n_docs_in_dropped_buckets <= r2.n_input

    # EXACT byte-duplicates are removed even under an extreme cap (the
    # full-hash equi-join bypasses banding), and NULL payloads survive
    rows = [
        (1, bytearray(b"alpha beta gamma")),
        (2, bytearray(b"alpha beta gamma")),  # exact dup of 1
        (3, None),
        (4, None),  # NULLs are never duplicates of each other
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    surv3, rep3 = dedup_media(spark, df, max_bucket=1)
    r3 = rep3.collect()[0]
    assert r3.n_input == 4 and r3.n_survivors == 3 and r3.n_removed == 1
    assert sorted(x.doc_id for x in surv3.collect()) == [1, 3, 4]


def test_dedup_media_payload_column_validation(spark):
    """r15 ADVICE #3: a STRING payload column (the CLI's --text default
    pointed at text) used to crash executor-side with
    TypeError('string argument without an encoding'); now it is cast to
    its UTF-8 bytes driver-side — same result as the binary twin — and
    a non-binary non-string column fails fast with a clear error."""
    import pytest

    from discogs_etl_spark.curation import dedup_media

    rows = [(1, "alpha beta"), (2, "alpha beta"), (3, "unrelated text")]
    s = spark.createDataFrame(rows, "doc_id long, payload string")
    b = spark.createDataFrame(
        [(i, bytearray(t.encode())) for i, t in rows],
        "doc_id long, payload binary",
    )
    surv_s, rep_s = dedup_media(spark, s)
    surv_b, rep_b = dedup_media(spark, b)
    assert sorted(x.doc_id for x in surv_s.collect()) == sorted(
        x.doc_id for x in surv_b.collect()
    ) == [1, 3]
    assert rep_s.collect()[0].n_removed == rep_b.collect()[0].n_removed == 1

    bad = spark.createDataFrame([(1, 2)], "doc_id long, payload long")
    with pytest.raises(ValueError, match="payload.*must be binary"):
        dedup_media(spark, bad)

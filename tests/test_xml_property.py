"""Property-based ETL-fidelity tests (SURVEY.md §5.2): hypothesis-generated
artist records → serialized XML → parse kernel → field-exact round-trip.

The generators respect what the streaming-path cleaner normalizes anyway
(whitespace runs collapse, XML-invalid chars → space), so the identity
property holds exactly: parse(serialize(r)) == r for every generated r.
Spark is deliberately NOT in the loop — the kernel is pure Python and the
property is about parse semantics, not distribution."""

from __future__ import annotations

from xml.sax.saxutils import escape

from hypothesis import given, settings, strategies as st

from discogs_etl_spark.sources.xml_ingest import iter_records

# single-space-joined alphanumeric words: the fixpoint of the cleaner
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789&<>'\"",
    min_size=1,
    max_size=12,
)
_clean_text = st.builds(" ".join, st.lists(_word, min_size=1, max_size=8))
_opt_text = st.one_of(st.none(), _clean_text)

_artist = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=0, max_value=2**40),
        "name": _opt_text,
        "realname": _opt_text,
        "profile": _opt_text,
        "data_quality": _opt_text,
        "urls": st.lists(_clean_text, max_size=4),
        "namevariations": st.lists(_clean_text, max_size=3),
        "aliases": st.lists(_clean_text, max_size=3),
        "groups": st.lists(_clean_text, max_size=3),
        "members": st.lists(_clean_text, max_size=3),
        "images": st.lists(
            st.fixed_dictionaries(
                {
                    "width": st.integers(min_value=0, max_value=10_000),
                    "height": st.integers(min_value=0, max_value=10_000),
                    "type": _opt_text,
                    "uri": _opt_text,
                    "uri150": _opt_text,
                }
            ),
            max_size=3,
        ),
    }
)


def _ser_artist(r: dict) -> str:
    def tag(name: str, value) -> str:
        # None → element OMITTED: findtext of a missing element is None,
        # while an empty <name/> yields '' — the reference distinguishes
        # them (SURVEY §1.2 null semantics)
        return f"<{name}>{escape(value)}</{name}>" if value is not None else ""

    def tag_list(outer: str, inner: str, values) -> str:
        return (
            f"<{outer}>" + "".join(tag(inner, v) for v in values) + f"</{outer}>"
        )

    imgs = "".join(
        "<image"
        + (f' width="{i["width"]}"' if i["width"] else "")
        + (f' height="{i["height"]}"' if i["height"] else "")
        + "".join(
            f' {k}="{escape(i[k], {chr(34): "&quot;"})}"'
            for k in ("type", "uri", "uri150")
            if i[k] is not None
        )
        + "/>"
        for i in r["images"]
    )
    return (
        "<artist>"
        + tag("id", str(r["id"]))
        + tag("name", r["name"])
        + tag("realname", r["realname"])
        + tag("profile", r["profile"])
        + tag("data_quality", r["data_quality"])
        + tag_list("urls", "url", r["urls"])
        + tag_list("namevariations", "name", r["namevariations"])
        + tag_list("aliases", "name", r["aliases"])
        + tag_list("groups", "name", r["groups"])
        + tag_list("members", "name", r["members"])
        + f"<images>{imgs}</images>"
        + "</artist>"
    )


@settings(max_examples=150, deadline=None)
@given(st.lists(_artist, min_size=1, max_size=5))
def test_artist_roundtrip(records):
    doc = ("<artists>" + "".join(_ser_artist(r) for r in records) + "</artists>").encode()
    parsed = list(iter_records(doc, "artist"))
    assert len(parsed) == len(records)
    for got, want in zip(parsed, records):
        assert got["id"] == want["id"]
        for f in ("name", "realname", "profile", "data_quality"):
            assert got[f] == want[f], f
        for f in ("urls", "namevariations", "aliases", "groups", "members"):
            assert got[f] == want[f], f
        # image dims: missing/0 attribute → 0 (reference parser.py:44-45);
        # the serializer omits 0-valued dims, so the default path is hit
        assert len(got["images"]) == len(want["images"])
        for gi, wi in zip(got["images"], want["images"]):
            assert gi["width"] == wi["width"] and gi["height"] == wi["height"]
            assert gi["type"] == wi["type"] and gi["uri"] == wi["uri"]
            assert gi["uri150"] == wi["uri150"]


@settings(max_examples=60, deadline=None)
@given(st.lists(_artist, min_size=1, max_size=3))
def test_artist_roundtrip_survives_dirty_wrappers(records):
    """The dirty-dump repairs (stray <documents> wrapper, control chars in
    inter-record whitespace) must not change parse results."""
    body = "".join(_ser_artist(r) for r in records)
    dirty = ("<documents><artists>\x07" + body + "</artists></documents>").encode()
    clean = ("<artists>" + body + "</artists>").encode()
    assert list(iter_records(dirty, "artist")) == list(iter_records(clean, "artist"))


# ---------------------------------------------------------------------------
# release: the deepest entity (3 nesting levels, attribute-vs-element mix)
# ---------------------------------------------------------------------------

_release = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=0, max_value=2**40),
        "status": _opt_text,
        "title": _opt_text,
        "country": _opt_text,
        "released": st.one_of(st.none(), st.just("1999-00-00"), _clean_text),
        "notes": _opt_text,
        "artists": st.lists(_clean_text, max_size=3),
        "genres": st.lists(_clean_text, max_size=3),
        "styles": st.lists(_clean_text, max_size=2),
        "labels": st.lists(
            st.fixed_dictionaries(
                {"name": _opt_text, "catno": _opt_text}
            ),
            max_size=2,
        ),
        "formats": st.lists(
            st.fixed_dictionaries(
                {
                    "name": _opt_text,
                    # None → attr omitted → must coerce to "1"
                    "qty": st.one_of(st.none(), st.integers(1, 9)),
                    "descriptions": st.lists(_word, max_size=3),
                }
            ),
            max_size=2,
        ),
    }
)


def _attr(k: str, v) -> str:
    if v is None:
        return ""
    return f' {k}="{escape(str(v), {chr(34): "&quot;"})}"'


def _ser_release(r: dict) -> str:
    def tag(name: str, value) -> str:
        return f"<{name}>{escape(value)}</{name}>" if value is not None else ""

    def tag_list(outer: str, inner: str, values) -> str:
        return f"<{outer}>" + "".join(tag(inner, v) for v in values) + f"</{outer}>"

    labels = "".join(
        f"<label{_attr('name', lb['name'])}{_attr('catno', lb['catno'])}/>"
        for lb in r["labels"]
    )
    formats = "".join(
        f"<format{_attr('name', f['name'])}{_attr('qty', f['qty'])}>"
        + tag_list("descriptions", "description", f["descriptions"])
        + "</format>"
        for f in r["formats"]
    )
    artists = "".join(f"<artist>{tag('name', a)}</artist>" for a in r["artists"])
    return (
        f"<release{_attr('id', r['id'])}{_attr('status', r['status'])}>"
        + tag("title", r["title"])
        + tag("country", r["country"])
        + tag("released", r["released"])
        + tag("notes", r["notes"])
        + f"<artists>{artists}</artists>"
        + f"<labels>{labels}</labels>"
        + f"<formats>{formats}</formats>"
        + tag_list("genres", "genre", r["genres"])
        + tag_list("styles", "style", r["styles"])
        + "</release>"
    )


@settings(max_examples=120, deadline=None)
@given(st.lists(_release, min_size=1, max_size=4))
def test_release_roundtrip(records):
    doc = (
        "<releases>" + "".join(_ser_release(r) for r in records) + "</releases>"
    ).encode()
    parsed = list(iter_records(doc, "release"))
    assert len(parsed) == len(records)
    for got, want in zip(parsed, records):
        assert got["id"] == want["id"]
        for f in ("status", "title", "country", "released", "notes"):
            assert got[f] == want[f], f
        assert got["artists"] == want["artists"]
        assert got["genres"] == want["genres"]
        assert got["styles"] == want["styles"]
        assert [(lb["name"], lb["catno"]) for lb in got["labels"]] == [
            (lb["name"], lb["catno"]) for lb in want["labels"]
        ]
        for gf, wf in zip(got["formats"], want["formats"]):
            assert gf["name"] == wf["name"]
            # missing qty attr coerces to the STRING "1" (parser.py:137)
            assert gf["qty"] == (str(wf["qty"]) if wf["qty"] is not None else "1")
            assert gf["descriptions"] == wf["descriptions"]
        assert got["images"] == []  # no images serialized → [] not null

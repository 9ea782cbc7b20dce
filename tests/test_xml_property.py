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

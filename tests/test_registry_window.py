"""Evidence-rotation window regression tests.

The verification driver checks the FIRST 50 registered queries per round;
``registry._WINDOW_PRIORITY`` decides which queries occupy that window.
These tests pin the invariants that make the rotation trustworthy:
every priority name resolves, there are no duplicates, the window is
exactly the first 50 surfaced specs, and every windowed query carries a
real value oracle (the whole point of rotating it in).
"""

from __future__ import annotations

from discogs_etl_spark import registry


def test_priority_names_resolve_and_fill_window():
    specs = registry.all_specs()
    names = list(specs)
    pri = registry._WINDOW_PRIORITY
    assert len(pri) == len(set(pri)), "duplicate names in _WINDOW_PRIORITY"
    unknown = [n for n in pri if n not in specs]
    assert not unknown, f"priority names not registered: {unknown}"
    assert tuple(names[: len(pri)]) == pri, "window is not the priority prefix"


def test_windowed_queries_all_have_oracles():
    specs = registry.all_specs()
    missing = [
        n for n in registry._WINDOW_PRIORITY if specs[n].oracle is None
    ]
    assert not missing, f"windowed queries without oracles: {missing}"


def test_non_window_queries_keep_registration_order():
    specs = registry.all_specs()
    rest = [n for n in specs if n not in set(registry._WINDOW_PRIORITY)]
    raw = [n for n in registry._REGISTRY if n not in set(registry._WINDOW_PRIORITY)]
    assert rest == raw

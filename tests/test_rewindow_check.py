"""The re-window rule is mechanical at FUNCTION granularity (verdict r6 #3).

Round 6 burned two driver-evidence slots re-windowing queries whose only
change was an import hoist.  scripts/rewindow_check.py compares
docstring-stripped ASTs of top-level definitions and flags a query only
when a definition REACHABLE from its builder changed — so comments,
docstrings, and import position can never cost a slot, while any
executable-line change in the call graph always re-windows.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _mod():
    spec = importlib.util.spec_from_file_location(
        "rewindow_check", REPO / "scripts" / "rewindow_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BASE = '''
import os

THRESH = 3

def helper(x):
    """docstring."""
    # a comment
    return x + THRESH

def builder(spark, sf):
    """Builds the query."""
    return helper(1)

def unrelated(y):
    return y * 2
'''

# comment changed, docstrings changed, import hoisted below a def,
# blank lines moved — ZERO executable changes
TEXTUAL_ONLY = '''
THRESH = 3

def helper(x):
    """rewritten docstring."""
    # a DIFFERENT comment
    return x + THRESH

import os

def builder(spark, sf):
    return helper(1)


def unrelated(y):
    return y * 2
'''

# one executable line changed inside helper (in builder's call graph)
HELPER_CHANGED = BASE.replace("return x + THRESH", "return x + THRESH + 1")

# module constant the builder reaches transitively (via helper) changed
CONST_CHANGED = BASE.replace("THRESH = 3", "THRESH = 4")

# only the unreachable function changed
UNRELATED_CHANGED = BASE.replace("return y * 2", "return y * 3")


def _diff(mod, a: str, b: str) -> set[str]:
    da, db = mod._top_level_defs(a), mod._top_level_defs(b)
    return {n for n in set(da) | set(db) if da.get(n) != db.get(n)}


def test_textual_only_changes_never_flag():
    assert _diff(_mod(), BASE, TEXTUAL_ONLY) == set()


def test_executable_change_in_reachable_helper_flags_builder():
    mod = _mod()
    changed = _diff(mod, BASE, HELPER_CHANGED)
    assert changed == {"helper"}
    assert changed & mod.reachable(HELPER_CHANGED, "builder")


def test_constant_change_reachable_transitively_flags_builder():
    mod = _mod()
    changed = _diff(mod, BASE, CONST_CHANGED)
    assert changed == {"THRESH"}
    # builder -> helper -> THRESH: two hops
    assert changed & mod.reachable(CONST_CHANGED, "builder")


def test_change_in_unreachable_function_does_not_flag_builder():
    mod = _mod()
    changed = _diff(mod, BASE, UNRELATED_CHANGED)
    assert changed == {"unrelated"}
    assert not changed & mod.reachable(UNRELATED_CHANGED, "builder")


def test_round7_window_leads_with_rewindow_script_output():
    # The registry's changed-this-round block must be exactly what the
    # mechanical rule computed at window-composition time: the four
    # multimodal queries (decode hardening touched _decode_one /
    # decode_wav / decode_png, all in their builders' reachable sets).
    mod = _mod()
    src = (REPO / "discogs_etl_spark" / "multimodal.py").read_text()
    for fn in (
        "multimodal_decode_features",
        "multimodal_frame_sample",
        "multimodal_phash_dedup",
        "multimodal_media_summary",
    ):
        reach = mod.reachable(src, fn)
        assert "_decode_one" in reach, f"{fn} no longer reaches _decode_one"

"""Evidence-count bookkeeping is DERIVED, never hand-typed.

Three rounds running the registry rotation note / SCALE_NOTES carried
off-by-one evidence counts.  scripts/evidence_audit.py computes the
ground truth from the CORRECTNESS_r*.json artifacts plus the live
registry; these tests assert the numbers QUOTED in the registry rotation
note match the computed ones, and that the rotation window's backlog
slice really is never-driver-checked.
"""

from __future__ import annotations

import importlib.util
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _audit():
    spec = importlib.util.spec_from_file_location(
        "evidence_audit", REPO / "scripts" / "evidence_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.audit(REPO)


def test_rotation_note_counts_match_computed_audit():
    src = (REPO / "discogs_etl_spark" / "registry.py").read_text()
    m = re.search(
        r"evidence_audit: registered=(\d+) unique_checked=(\d+) ever_green=(\d+) \\\n"
        r"#\s+never_checked=(\d+) net_new_last_round=(\d+)",
        src,
    )
    assert m, "registry rotation note lost its machine-checkable audit line"
    quoted = tuple(int(g) for g in m.groups())
    stats = _audit()
    computed = (
        stats["registered"],
        stats["unique_checked"],
        stats["ever_green"],
        stats["never_checked"],
        stats["net_new_last_round"],
    )
    assert quoted == computed, (
        f"rotation note quotes {quoted} but evidence_audit computes {computed} — "
        "re-run `python scripts/evidence_audit.py` and update the note"
    )


def test_window_backlog_slice_is_never_driver_checked():
    from discogs_etl_spark import registry

    stats = _audit()
    never = set(stats["never_checked_names"])
    # the window is a leading changed-this-round block (re-windows, which
    # may interleave with NEW never-checked queries) followed by pure
    # never-checked backlog.  Already-evidenced names must therefore form
    # one contiguous run starting within the first few slots — an
    # evidenced name deep in the tuple wastes one of the 50 driver slots.
    idx = [i for i, n in enumerate(registry._WINDOW_PRIORITY) if n not in never]
    if idx:
        assert max(idx) - min(idx) + 1 == len(idx), (
            f"re-windowed names are not contiguous: positions {idx}"
        )
        assert min(idx) <= 5, (
            f"re-windowed block starts at position {min(idx)} — it must "
            "lead the tuple (only new changed-code queries may precede it)"
        )


def test_audit_sees_no_unregistered_checked_names():
    stats = _audit()
    assert stats["checked_not_registered"] == [], (
        "CORRECTNESS artifacts name queries the registry no longer has: "
        f"{stats['checked_not_registered']}"
    )

"""bench.py's load-contamination stamp (verdict r13 task #3).

BENCH_r13.json shipped a 25.30 s reading captured at loadavg 2.6 and
nothing in the artifact said "don't trust this" — adjudicating it took
a judge re-run with its own quiet bench.  The stamp makes a contended
reading self-documenting: ``load_contaminated`` is true when the 1-min
loadavg at bench start exceeds ``LOAD_CONTAMINATION_1M``.  These tests
pin the predicate (threshold boundary, unknown-loadavg behavior) —
running the actual bench belongs to the driver, not the suite.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contamination_threshold_boundary():
    b = _bench()
    t = b.LOAD_CONTAMINATION_1M
    assert not b._contaminated([t, 5.0, 5.0])  # at the cap: clean
    assert b._contaminated([t + 0.01, 0.0, 0.0])  # just over: flagged
    assert not b._contaminated([0.1, 2.6, 2.6])  # only the 1-min avg gates


def test_unknown_loadavg_never_flags():
    # The stamp asserts contamination, never cleanliness: a platform
    # without getloadavg must not flag (and must not crash).
    b = _bench()
    assert not b._contaminated(None)
    assert not b._contaminated([])


def test_mid_run_contention_flags_via_after_loadavg():
    # r14 review: a clean start plus foreign work arriving mid-run
    # shipped load_contaminated: false — the BENCH_r13 failure mode for
    # late arrivals.  The END loadavg gates past the bench's own
    # measured contribution; at-or-under the margin stays clean (the
    # bench itself pushes the 1-min average toward ~1.7 on a quiet box).
    b = _bench()
    t = b.LOAD_CONTAMINATION_AFTER_1M
    assert not b._contaminated([0.1, 0.1, 0.1], [t, 5.0, 5.0])  # at cap
    assert b._contaminated([0.1, 0.1, 0.1], [t + 0.01, 0.0, 0.0])
    assert not b._contaminated([0.1, 0.1, 0.1], None)  # unknown end load
    assert not b._contaminated([0.1, 0.1, 0.1], [])

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


def test_host_fingerprint_shape():
    # r16 verdict task #3: perf artifacts must carry the hardware
    # identity (the r16 band dispute was host drift — 80 vs 32 reported
    # CPUs — that no artifact could prove).  The fingerprint must be
    # JSON-serializable, carry a positive cpu_count on Linux, and be
    # stable within a process (same box -> same stamp).
    import json

    from discogs_etl_spark.session import host_fingerprint

    fp = host_fingerprint()
    assert set(fp) == {"cpu_count", "cpu_model"}
    assert isinstance(fp["cpu_count"], int) and fp["cpu_count"] >= 1
    assert fp["cpu_model"] is None or (
        isinstance(fp["cpu_model"], str) and fp["cpu_model"]
    )
    json.dumps(fp)
    assert fp == host_fingerprint()


def test_timing_compare_host_warning_is_not_a_gate(tmp_path, capsys):
    # The host-changed message is informational: two sweeps with
    # different _host stamps but identical timings must still PASS.
    import importlib.util as iu
    import json

    spec = iu.spec_from_file_location(
        "timing_compare", REPO / "scripts" / "timing_compare.py"
    )
    tc = iu.module_from_spec(spec)
    spec.loader.exec_module(tc)
    prev = {"q": 1.0, "_host": {"cpu_count": 32, "cpu_model": "A"}}
    cur = {"q": 1.0, "_host": {"cpu_count": 80, "cpu_model": "B"}}
    p, c = tmp_path / "TIMINGS_r98.json", tmp_path / "TIMINGS_r99.json"
    p.write_text(json.dumps(prev))
    c.write_text(json.dumps(cur))
    import sys

    argv = sys.argv
    sys.argv = ["timing_compare.py", "--prev", str(p), "--cur", str(c)]
    try:
        rc = tc.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 0
    assert "WARNING host changed" in out
    # same-host pair: no warning
    c.write_text(json.dumps({"q": 1.0, "_host": prev["_host"]}))
    sys.argv = ["timing_compare.py", "--prev", str(p), "--cur", str(c)]
    try:
        rc = tc.main()
    finally:
        sys.argv = argv
    assert rc == 0
    assert "WARNING host changed" not in capsys.readouterr().out


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

"""Round-over-round plan-shape gate: the two newest committed
PLANSWEEP_r{N}.json sweeps must show no nested-loop-shape change that
scripts/plansweep_compare.py does not acknowledge.

Motivation (VERDICT r12 task #1): plan_sweep's static ALLOWED list
proves every conditioned nested loop is in an audited set, but cannot
see an audited shape GROWING under the same query name (a 1-row scalar
cross becoming a data-sized nested loop keeps the name green).  The
compare diffs the conditioned-node counts, the expr-id-free condition
text, and the ALLOWED-membership snapshots round-over-round, so that
class of silent change reddens the suite.  Like test_timing_gate, it
compares COMMITTED artifacts only — it never runs Spark.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_plan_shape_changes_between_committed_sweeps():
    pc = _load("plansweep_compare")
    arts = pc.newest_artifacts(REPO)
    assert arts, "no PLANSWEEP_r*.json committed — run scripts/plan_sweep.py --json"
    if len(arts) < 2:
        return  # first round with an artifact: no basis to compare yet
    prev = json.loads(arts[-2].read_text())
    cur = json.loads(arts[-1].read_text())
    cur_round = pc._round_of(arts[-1])
    acks = pc.ADJUDICATED.get(cur_round, {})
    problems = pc.compare_sweeps(prev, cur, acks)
    assert not problems, (
        f"{arts[-2].name} -> {arts[-1].name} plan-shape changes (a Catalyst "
        f"strategy flip or a grown nested loop — adjudicate in "
        f"plansweep_compare.ADJUDICATED with the commit rationale): {problems}"
    )


def test_current_sweep_snapshot_matches_allowed_in_code():
    """The newest artifact's _allowed snapshot must equal plan_sweep.ALLOWED
    — otherwise the artifact predates an ALLOWED edit and the membership
    diff would compare stale state; re-run the sweep after any edit."""
    pc = _load("plansweep_compare")
    ps = _load("plan_sweep")
    arts = pc.newest_artifacts(REPO)
    assert arts, "no PLANSWEEP_r*.json committed — run scripts/plan_sweep.py --json"
    cur = json.loads(arts[-1].read_text())
    if "_allowed" not in cur:
        return  # pre-snapshot artifact (r12 bootstrap): nothing to sync-check
    assert cur["_allowed"] == sorted(ps.ALLOWED), (
        f"{arts[-1].name} _allowed snapshot is out of sync with "
        "plan_sweep.ALLOWED — re-run scripts/plan_sweep.py --json on current code"
    )


def test_every_allowance_is_used_in_current_sweep():
    """The stale-allowance rule (r12 ADVICE), gated on the artifact: every
    ALLOWED name must show at least one observed conditioned node in the
    newest sweep, so an allowance is pruned the round its plan improves
    (a lingering allowance would let a future reintroduction pass
    silently)."""
    pc = _load("plansweep_compare")
    ps = _load("plan_sweep")
    arts = pc.newest_artifacts(REPO)
    assert arts, "no PLANSWEEP_r*.json committed — run scripts/plan_sweep.py --json"
    cur = json.loads(arts[-1].read_text())
    # An errored query was never OBSERVED — its allowance is not stale
    # (same rule as plan_sweep's in-process check; the _errors metadata
    # exists precisely so artifact consumers can tell "errored" from
    # "no nested-loop nodes").
    errored = set(cur.get("_errors", []))
    stale = sorted(
        name
        for name in ps.ALLOWED
        if name not in errored and not cur.get(name, {}).get("conditioned")
    )
    assert not stale, (
        f"ALLOWED entries with no observed conditioned nested loop in "
        f"{arts[-1].name} — prune them: {stale}"
    )


def test_current_sweep_is_internally_consistent():
    """The artifact's redundant views of the same nodes must agree:
    cross == len(cross_leaves) and the conditioned text list must equal
    the texts inside conditioned_leaves — the compare reads different
    views for different flags, so a hand-edited artifact that desyncs
    them would show different truths to different checks."""
    pc = _load("plansweep_compare")
    arts = pc.newest_artifacts(REPO)
    assert arts, "no PLANSWEEP_r*.json committed — run scripts/plan_sweep.py --json"
    cur = json.loads(arts[-1].read_text())
    for name, entry in cur.items():
        if name.startswith("_"):
            continue
        if "cross_leaves" in entry:
            assert entry["cross"] == len(entry["cross_leaves"]), name
        if "conditioned_leaves" in entry:
            assert sorted(entry["conditioned"]) == sorted(
                pair[0] for pair in entry["conditioned_leaves"]
            ), name
        assert entry.get("cross", 0) or entry.get("conditioned"), (
            f"{name}: entry with no nested-loop nodes at all should be absent"
        )


def test_compare_flags_synthetic_changes():
    pc = _load("plansweep_compare")
    base = {
        "scalar_q": {"cross": 1, "conditioned": []},
        "band_q": {"cross": 0, "conditioned": ["(a < b)"]},
        "_allowed": ["band_q"],
    }
    # Identical artifacts: pass (metadata keys are not query names).
    assert pc.compare_sweeps(base, base) == []

    # NEW conditioned node — both on a previously-clean query and as
    # growth under an already-audited name.
    grown = {
        "scalar_q": {"cross": 0, "conditioned": ["(x = y OR x = z)"]},
        "band_q": {"cross": 0, "conditioned": ["(a < b)", "(c < d)"]},
        "_allowed": ["band_q", "scalar_q"],
    }
    probs = pc.compare_sweeps(base, grown)
    assert any(p.startswith("scalar_q: NEW") for p in probs), probs
    assert any(p.startswith("band_q: NEW") for p in probs), probs
    # scalar_q also ENTERED the ALLOWED snapshot.
    assert any("ENTERED the ALLOWED list" in p for p in probs), probs

    # CHANGED condition text at the same count.
    changed = {
        "scalar_q": {"cross": 1, "conditioned": []},
        "band_q": {"cross": 0, "conditioned": ["(a <= b)"]},
        "_allowed": ["band_q"],
    }
    probs = pc.compare_sweeps(base, changed)
    assert probs == [
        "band_q: CHANGED condition text: ['(a < b)'] -> ['(a <= b)']"
    ], probs

    # DISAPPEARED node + the name leaving the ALLOWED snapshot.
    pruned = {"scalar_q": {"cross": 1, "conditioned": []}, "_allowed": []}
    probs = pc.compare_sweeps(base, pruned)
    assert any("DISAPPEARED" in p for p in probs), probs
    assert any("LEFT the ALLOWED list" in p for p in probs), probs

    # Adjudication suppresses exactly the named query's flags.
    probs = pc.compare_sweeps(base, pruned, {"band_q": "rewritten onto hash joins"})
    assert probs == [], probs

    # A conditioned name outside the artifact's own snapshot is flagged
    # even with no prior-round basis (hand-edited-artifact integrity).
    rogue = {"rogue_q": {"cross": 0, "conditioned": ["(p < q)"]}, "_allowed": []}
    probs = pc.compare_sweeps({}, rogue)
    assert any("outside the artifact's own _allowed snapshot" in p for p in probs), probs

    # Condition-less cross growth flags too (review finding: plan_sweep
    # never flags pure crosses and PLAN_PINS covers only the gate set,
    # so this compare is the registry-wide net for a join degenerating
    # into a cartesian or a scalar cross getting re-derived).
    more_cross = {
        "scalar_q": {"cross": 3, "conditioned": []},
        "band_q": {"cross": 0, "conditioned": ["(a < b)"]},
        "_allowed": ["band_q"],
    }
    probs = pc.compare_sweeps(base, more_cross)
    assert probs == [
        "scalar_q: condition-less cross count changed (1 -> 3) — a "
        "hinted scalar cross was added, re-derived, or a join "
        "degenerated into a pure cartesian; adjudicate"
    ], probs
    assert pc.compare_sweeps(base, more_cross, {"scalar_q": "split agg"}) == []

    # A like-for-like substitution at the SAME count flags through the
    # cross's leaf identity (r13 review): the scalar range-carried
    # cross became a cross over a parquet table.
    swapped_a = {
        "scalar_q": {
            "cross": 1,
            "cross_leaves": [["range"]],
            "conditioned": [],
        },
        "_allowed": [],
    }
    swapped_b = {
        "scalar_q": {
            "cross": 1,
            "cross_leaves": [["parquet:documents.parquet"]],
            "conditioned": [],
        },
        "_allowed": [],
    }
    probs = pc.compare_sweeps(swapped_a, swapped_b)
    assert probs == [
        "scalar_q: cross build composition changed at the same count: "
        "[('range',)] -> [('parquet:documents.parquet',)] — a scalar "
        "cross was swapped for one over different sources; adjudicate"
    ], probs
    # Pre-r13 artifacts lack cross_leaves: identity compare is skipped,
    # count compare still applies.
    pre_r13 = {"scalar_q": {"cross": 1, "conditioned": []}, "_allowed": []}
    assert pc.compare_sweeps(pre_r13, swapped_b) == []

    # Conditioned nodes carry leaf identity too: identical condition
    # text over a swapped build side flags (the text survives a source
    # swap when column names match).
    cond_a = {
        "band_q": {
            "cross": 0,
            "conditioned": ["(a < b)"],
            "conditioned_leaves": [["(a < b)", ["parquet:part.parquet"]]],
        },
        "_allowed": ["band_q"],
    }
    cond_b = {
        "band_q": {
            "cross": 0,
            "conditioned": ["(a < b)"],
            "conditioned_leaves": [["(a < b)", ["parquet:orders.parquet"]]],
        },
        "_allowed": ["band_q"],
    }
    probs = pc.compare_sweeps(cond_a, cond_b)
    assert probs == [
        "band_q: conditioned build composition changed under identical "
        "condition text: [('(a < b)', ('parquet:part.parquet',))] -> "
        "[('(a < b)', ('parquet:orders.parquet',))] — adjudicate"
    ], probs
    assert pc.compare_sweeps(cond_a, cond_a) == []
    # Pre-schema fallback: a prior artifact without conditioned_leaves
    # compares by text only.
    cond_old = {
        "band_q": {"cross": 0, "conditioned": ["(a < b)"]},
        "_allowed": ["band_q"],
    }
    assert pc.compare_sweeps(cond_old, cond_b) == []

    # Errored names (hand-committed artifact) flag on the current side
    # and are skipped as a basis on the previous side — never read as
    # "its nested loops disappeared".
    errored_cur = {
        "scalar_q": {"cross": 1, "conditioned": []},
        "_allowed": ["band_q"],
        "_errors": ["band_q"],
    }
    probs = pc.compare_sweeps(base, errored_cur)
    assert probs == ["band_q: errored in current sweep — rerun it"], probs
    healthy_again = {
        "band_q": {"cross": 0, "conditioned": ["(a < b)"]},
        "scalar_q": {"cross": 1, "conditioned": []},
        "_allowed": ["band_q"],
    }
    assert pc.compare_sweeps(errored_cur, healthy_again) == []
    # An errored name with NO per-query entry on either side still flags
    # (errored names are absent from res by construction, so the name
    # universe must come from _errors too — third review pass).
    ghost_error = {"_allowed": [], "_errors": ["new_q"]}
    probs = pc.compare_sweeps({}, ghost_error)
    assert probs == ["new_q: errored in current sweep — rerun it"], probs

    # r12 bootstrap: prev artifact without _allowed — membership diff is
    # skipped, conditioned/cross diffs still apply.
    old = {
        "scalar_q": {"cross": 1, "conditioned": []},
        "band_q": {"cross": 0, "conditioned": ["(a < b)"]},
    }
    assert pc.compare_sweeps(old, base) == []

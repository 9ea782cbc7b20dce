"""Print everything the round-start ritual needs, computed — never typed.

One command replaces the three error-prone hand steps that previous
rounds got wrong (off-by-one counts three rounds running; a stale note
that reddened the suite when the next artifact landed; cautious
re-windows that burned driver-evidence slots):

1. the registry rotation note's machine-checkable audit line, stamped
   with the newest LANDED round (``as_of_round=N``),
2. the queries the mechanical AST rule says must re-window
   (scripts/rewindow_check.py against the given base rev), and
3. the proposed 50-name ``_WINDOW_PRIORITY`` body: flagged re-windows
   first, then the byte-exact oldest-evidence-first fill from
   ``evidence_audit --stale-order`` — the EXACT composition the
   freshness gate (``evidence_audit.window_flag_split``) verifies.
   Never-checked and never-green names need no separate block: both
   carry no last-green round, so stale order already puts them first
   (r14 review: a separate backlog block ordered them differently
   from the gate's expectation whenever never-green names existed).

Paste the outputs into discogs_etl_spark/registry.py (note + tuple) and
COVERAGE.md's evidence paragraph, then run
``pytest tests/test_evidence_audit.py tests/test_registry_window.py
tests/test_evidence_freshness.py`` — those tests verify the paste
(including the freshness gate's composition and endangered-name
checks), so a typo cannot survive.

Usage::

    python scripts/round_start.py <last-round-end-rev>
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_rev", help="git rev of the previous round's final commit")
    ap.add_argument("--window-size", type=int, default=50)
    args = ap.parse_args()

    evidence_audit = _load("evidence_audit")
    rewindow_check = _load("rewindow_check")

    rounds = [n for n, _ in evidence_audit._round_artifacts(REPO)]
    if not rounds:
        sys.exit(
            "no CORRECTNESS_r*.json artifacts found — nothing has landed yet, "
            "so there is no audit basis to stamp; run this after the first "
            "driver round."
        )
    newest = max(rounds)
    stats = evidence_audit.audit(REPO, max_round=newest)

    print("# 1. registry rotation note audit line (paste verbatim):")
    print(
        f"#   evidence_audit as_of_round={newest}: registered={stats['registered']} "
        f"unique_checked={stats['unique_checked']} ever_green={stats['ever_green']} \\\n"
        f"#     never_checked={stats['never_checked']} "
        f"net_new_last_round={stats['net_new_last_round']}"
    )

    flags = rewindow_check.rewindow_names(args.base_rev)
    # Registry convention: names appear in REGISTRATION order, flags
    # included (the hand-pasted round-7 block and the backlog both use
    # it) — not alphabetical.
    from discogs_etl_spark import registry

    flag_order = [n for n in registry.registration_order() if n in flags]
    flag_order += [n for n in flags if n not in registry._REGISTRY]  # paranoia
    print(f"\n# 2. mechanical re-windows vs {args.base_rev} ({len(flags)}):")
    for name in flag_order:
        print(f"#   {name}  (dirty: {', '.join(sorted(flags[name]))})")
    if len(flags) > evidence_audit.MAX_FLAG_BLOCK:
        print(
            f"# WARNING: {len(flags)} re-window flags exceed "
            f"MAX_FLAG_BLOCK={evidence_audit.MAX_FLAG_BLOCK} — the "
            "composition gate (evidence_audit.window_flag_split) will "
            "reject this window; split the change across rounds or raise "
            "the cap WITH rationale in the commit message."
        )
    if len(flags) > args.window_size:
        print(
            f"# WARNING: {len(flags)} re-window flags exceed the "
            f"{args.window_size}-slot window — the driver will only check the "
            f"first {args.window_size}; split the change across rounds."
        )

    # Fill order: mechanical re-windows first, then the BYTE-EXACT
    # oldest-evidence-first slice of stale_order — the same composition
    # evidence_audit.window_flag_split verifies (r14 review: composing
    # here with a separate never-checked backlog block diverged from the
    # gate whenever never-GREEN names existed, since both populations
    # sort at last-green 0 interleaved by registration order).
    rotation = [n for n in stats["stale_order_names"] if n not in flags]
    fill = max(0, args.window_size - len(flags))
    window = flag_order + rotation[:fill]
    print(
        f"\n# 3. proposed _WINDOW_PRIORITY ({len(window)} names: {len(flags)} "
        f"re-windows + {min(fill, len(rotation))} oldest-evidence fill):"
    )
    for name in window:
        print(f'    "{name}",')

    # SLO guard (r14 review): names that will exceed the staleness bound
    # once the NEXT artifact lands must be in THIS window — a flag block
    # big enough to crowd them out should redden now, not rounds later.
    endangered = evidence_audit.endangered_names(
        stats, registry.MAX_EVIDENCE_AGE_ROUNDS
    )
    missing = [n for n in endangered if n not in set(window)]
    if missing:
        print(
            f"\n# WARNING: {len(missing)} SLO-endangered names are NOT in "
            f"this window (flag block crowded them out): {missing} — "
            "tests/test_evidence_freshness.py will fail; split the "
            "re-window across rounds."
        )

    if stats["never_green"]:
        print(f"\n# WARNING: {stats['never_green']} checked-but-never-green queries!")
    if stats["checked_not_registered"]:
        print(f"# WARNING: artifacts name unregistered queries: {stats['checked_not_registered']}")


if __name__ == "__main__":
    main()

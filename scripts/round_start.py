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
   first, then never-driver-checked backlog in registration order.

Paste the outputs into discogs_etl_spark/registry.py (note + tuple) and
COVERAGE.md's evidence paragraph, then run
``pytest tests/test_evidence_audit.py tests/test_registry_window.py``
— those tests verify the paste, so a typo cannot survive.

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

    registry._load_all()
    flag_order = [n for n in registry._REGISTRY if n in flags]
    flag_order += [n for n in flags if n not in registry._REGISTRY]  # paranoia
    print(f"\n# 2. mechanical re-windows vs {args.base_rev} ({len(flags)}):")
    for name in flag_order:
        print(f"#   {name}  (dirty: {', '.join(sorted(flags[name]))})")
    if len(flags) > args.window_size:
        print(
            f"# WARNING: {len(flags)} re-window flags exceed the "
            f"{args.window_size}-slot window — the driver will only check the "
            f"first {args.window_size}; split the change across rounds."
        )

    # Fill order: mechanical re-windows first, then never-driver-checked
    # backlog in registration order, then — the post-backlog policy the
    # r8 rotation note scheduled — oldest-evidence-first rotation
    # (last-green round ascending) so driver evidence keeps refreshing
    # instead of going permanently stale once the ledger closes.
    backlog = [n for n in stats["never_checked_names"] if n not in flags]
    backlog_set = set(backlog)
    stale = [
        n
        for n in stats["stale_order_names"]
        if n not in flags and n not in backlog_set
    ]
    fill = max(0, args.window_size - len(flags))
    n_backlog = min(fill, len(backlog))
    rotation = stale[: max(0, fill - n_backlog)]
    window = flag_order + backlog[:fill] + rotation
    leftover = len(backlog) - fill
    print(
        f"\n# 3. proposed _WINDOW_PRIORITY ({len(window)} names: {len(flags)} "
        f"re-windows + {n_backlog} backlog + {len(rotation)} "
        f"oldest-evidence rotation; "
        f"{max(leftover, 0)} never-checked remain after this window lands):"
    )
    for name in window:
        print(f'    "{name}",')

    if stats["never_green"]:
        print(f"\n# WARNING: {stats['never_green']} checked-but-never-green queries!")
    if stats["checked_not_registered"]:
        print(f"# WARNING: artifacts name unregistered queries: {stats['checked_not_registered']}")


if __name__ == "__main__":
    main()

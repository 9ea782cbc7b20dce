"""Derive driver-evidence counts from the CORRECTNESS_r*.json artifacts.

Three rounds running, the hand-typed evidence counts in the registry
rotation note / SCALE_NOTES were off by one.  This script computes them
from the ground truth instead: the per-round driver artifacts plus the
live registry.  The rotation note and SCALE_NOTES must quote this
output; ``tests/test_evidence_audit.py`` asserts the quoted numbers
match.

Usage::

    python scripts/evidence_audit.py            # human summary
    python scripts/evidence_audit.py --json     # machine-readable
    python scripts/evidence_audit.py --never    # list never-checked names
    python scripts/evidence_audit.py --max-round 6   # bound the basis

The registry rotation note quotes this output together with the round it
was computed over (``as_of_round=N``); ``tests/test_evidence_audit.py``
recomputes ``audit(max_round=N)`` and asserts the quoted tuple matches.
Bounding the basis by round is what keeps the suite green after the NEXT
round's CORRECTNESS artifact lands: the note describes a fixed historical
basis, not "whatever files are on disk today" (the round-6 guard compared
against the unbounded audit, so the driver landing CORRECTNESS_r06.json
retroactively broke the build).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _round_artifacts(repo: Path = REPO) -> list[tuple[int, Path]]:
    out = []
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def _is_green(row: dict) -> bool:
    # Oracle-backed rows carry all three match flags; rows-only checks
    # (oracle=None) at minimum carry rows_match.  err must be absent/null.
    if row.get("err"):
        return False
    flags = [v for k, v in row.items() if k.endswith("_match")]
    return bool(flags) and all(flags)


def audit(
    repo: Path = REPO,
    max_round: int | None = None,
    artifacts_dir: Path | None = None,
) -> dict:
    """Compute evidence stats.  Importable for tests.

    ``max_round`` bounds the basis to artifacts from rounds <= N so a
    note stamped ``as_of_round=N`` stays verifiable (and the test suite
    stays green) after later rounds' artifacts land.  ``artifacts_dir``
    lets tests point at a synthetic artifact set without touching the
    repo; the registry is always imported from ``repo``.
    """
    rounds = _round_artifacts(artifacts_dir or repo)
    if max_round is not None:
        rounds = [(n, p) for n, p in rounds if n <= max_round]
    per_round: dict[int, dict[str, bool]] = {}
    for n, path in rounds:
        data = json.loads(path.read_text())
        per_round[n] = {name: _is_green(row) for name, row in data.items()}

    checked: set[str] = set()
    ever_green: set[str] = set()
    last_green: dict[str, int] = {}
    net_new_last = []
    last_round = max(per_round) if per_round else 0
    for n in sorted(per_round):
        names = set(per_round[n])
        if n == last_round:
            net_new_last = sorted(names - checked)
        checked |= names
        for name, ok in per_round[n].items():
            if ok:
                ever_green.add(name)
                last_green[name] = n

    sys.path.insert(0, str(repo))
    from discogs_etl_spark import registry

    specs = registry.all_specs()
    registered = set(specs)
    never_checked = sorted(registered - checked)
    # CANONICAL registration order (import-order-independent, see
    # registry.registration_order), ignoring the rotation window, so
    # the "next 50" plan is reproducible in any process — including a
    # pytest session whose earlier tests imported query modules in a
    # different order than _load_all (that pollution flipped the
    # round-10 tie cohort's order in r18 and falsely reddened the
    # window-composition gate).
    reg_order = [n for n in registry.registration_order() if n in registered]
    never_in_order = [n for n in reg_order if n not in checked]
    # Post-backlog rotation basis: registered names ordered by how STALE
    # their driver evidence is — last-green round ascending, registration
    # order among ties.  Never-checked / never-green names sort first
    # (last_green absent → round 0).  round_start.py fills the window
    # from this list once the never-checked backlog is empty, so driver
    # evidence keeps refreshing oldest-first instead of going static.
    reg_index = {n: i for i, n in enumerate(reg_order)}
    stale_order = sorted(reg_order, key=lambda n: (last_green.get(n, 0), reg_index[n]))

    return {
        "rounds": sorted(per_round),
        "registered": len(registered),
        "unique_checked": len(checked),
        "ever_green": len(ever_green),
        "never_green": len(checked - ever_green),
        "never_checked": len(never_checked),
        "net_new_last_round": len(net_new_last),
        "net_new_last_round_names": net_new_last,
        "never_checked_names": never_in_order,
        "stale_order_names": stale_order,
        "last_green_round": last_green,
        "checked_not_registered": sorted(checked - registered),
        # Direct intersection, not a count comparison (r15 ADVICE): the
        # ever_green COUNT can equal the registered COUNT while a
        # registered name is never-green, if a green unregistered name
        # pads it — don't make correctness depend on the separate
        # checked_not_registered gate.  Never-green means CHECKED and
        # red on every attempt (a defect); never-CHECKED names are a
        # separate population the window-composition gate forces to the
        # front of the rotation — stale_names' docstring has always
        # drawn this distinction, but the set here was computed as
        # registered - ever_green, which also swept up names registered
        # mid-round before their first driver window (found in r16, the
        # first round to register new queries after this gate landed).
        "registered_never_green_names": sorted(
            (registered & checked) - ever_green
        ),
    }


# Evidence-freshness enforcement (verdict r13 task #1).  The rotation
# that keeps the ledger trustworthy was convention until round 14; these
# helpers make it a suite gate (tests/test_evidence_freshness.py), the
# same script-owned-logic/thin-test pattern as timing_compare/plan_sweep.

# A window legitimately leads with mechanically re-windowed names
# (rewindow_check.py flags) before the oldest-evidence-first fill.  The
# largest flag block on record is 14 (round 11's empty-input hardening);
# cap it at half the window so a tuple of 50 arbitrary fresh names can
# never masquerade as "all flags".  If a round genuinely re-windows more
# than 25 registered queries, raise this WITH the rationale in the
# commit message.
MAX_FLAG_BLOCK = 25


def stale_names(stats: dict, bound: int) -> list[str]:
    """Registered names whose last driver-green round trails the newest
    landed artifact by MORE than ``bound`` rounds.

    Names WITHOUT a last-green round are exempt here, which covers two
    distinct populations (r14 review): never-CHECKED names carry no
    evidence by definition and the window-composition check forces them
    to the front of the rotation (they sort as round 0 in stale order),
    so they cannot hide; never-GREEN names (checked, red on every
    attempt) are a DEFECT, not a freshness problem, and are gated
    separately by ``test_every_registered_query_has_green_evidence``
    (ever_green == registered on the unbounded basis) so they cannot
    ride this exemption either.  An empty return means the freshness
    SLO holds.
    """
    newest = max(stats["rounds"], default=0)
    last_green = stats["last_green_round"]
    return sorted(
        n
        for n in stats["stale_order_names"]
        if n in last_green and newest - last_green[n] > bound
    )


def endangered_names(stats: dict, bound: int) -> list[str]:
    """Names whose evidence will EXCEED ``bound`` once the next round's
    artifact lands unless this round's window re-checks them — i.e. the
    names the CURRENT window must contain for the staleness SLO to be
    satisfiable at all.

    This is what reconciles the SLO with the flag block (r14 review):
    the SLO's ``ceil(registered / 50)`` derivation assumes every window
    slot rotates, but up to ``MAX_FLAG_BLOCK`` slots may legitimately
    re-check fresh names after a re-window.  Requiring endangered ⊆
    window turns that tension into a composition-time error — a flag
    block so large it would push a name past the SLO reddens THIS round
    (split the change, or consciously raise the bound), instead of the
    SLO tripping rounds later with every intervening window "valid".
    Endangered names are by construction the head of ``stale_order``,
    so a window composed per ``window_flag_split`` only misses them
    when the flag block crowds them out.
    """
    newest = max(stats["rounds"], default=0)
    last_green = stats["last_green_round"]
    return sorted(
        n
        for n in stats["stale_order_names"]
        if n in last_green and (newest + 1) - last_green[n] > bound
    )


def window_flag_split(
    window: tuple[str, ...] | list[str],
    stale_order: list[str],
    max_flag_block: int = MAX_FLAG_BLOCK,
) -> int | None:
    """Smallest ``k`` such that ``window[k:]`` is exactly the
    oldest-evidence-first fill over ``stale_order`` after excluding the
    leading ``k`` flag names — or ``None`` if no ``k <= max_flag_block``
    satisfies it (the tuple is mis-rotated: out of order, skips a stale
    name, or contains fresh names beyond the allowed flag block).

    Two honest limits (r14 review), both bounded rather than closed:

    * The flag block itself is TRUST-based — its names come from
      ``rewindow_check`` against a base rev this static check cannot
      reproduce, so up to ``max_flag_block`` leading names are accepted
      unverified.  The damage is bounded, not eliminated: the fill
      still rotates ``len(window) - k`` genuinely-oldest names, and the
      companion endangered-names check (``endangered_names``) rejects
      any window whose flag block crowds out a name the staleness SLO
      needs this round.
    * A match is only accepted when the fill is NON-EMPTY (or there is
      genuinely nothing to fill from): without that, any window no
      longer than ``max_flag_block`` would validate vacuously —
      ``k = len(window)`` makes both sides of the comparison empty.
    """
    w = list(window)
    for k in range(0, min(len(w), max_flag_block) + 1):
        flags = set(w[:k])
        fill = [n for n in stale_order if n not in flags][: len(w) - k]
        if w[k:] == fill:
            if not fill and any(n not in flags for n in stale_order):
                continue  # vacuous: whole window absorbed as "flags"
            return k
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--never", action="store_true", help="list never-checked names in registration order")
    ap.add_argument(
        "--stale-order",
        action="store_true",
        help="list ALL registered names oldest-evidence-first (last-green "
        "round ascending, registration order among ties) — the rotation "
        "basis round_start.py fills the post-backlog window from",
    )
    ap.add_argument("--max-round", type=int, default=None, help="bound the basis to rounds <= N")
    args = ap.parse_args()
    stats = audit(max_round=args.max_round)
    if args.json:
        # keep the machine-readable summary COMPACT: drop the per-query
        # collections (the *_names lists and the last_green_round dict),
        # not just keys matching the _names suffix convention
        print(
            json.dumps(
                {
                    k: v
                    for k, v in stats.items()
                    if not isinstance(v, (dict,))
                    and not k.endswith("_names")
                },
                indent=2,
            )
        )
    elif args.never:
        for name in stats["never_checked_names"]:
            print(name)
    elif args.stale_order:
        for name in stats["stale_order_names"]:
            print(name)
    else:
        print(
            f"rounds={stats['rounds']}  registered={stats['registered']}  "
            f"unique checked={stats['unique_checked']}  ever-green={stats['ever_green']}  "
            f"never-green={stats['never_green']}  never-checked={stats['never_checked']}  "
            f"net-new last round={stats['net_new_last_round']}"
        )
        if stats["checked_not_registered"]:
            print(f"WARNING checked-but-unregistered: {stats['checked_not_registered']}")


if __name__ == "__main__":
    main()

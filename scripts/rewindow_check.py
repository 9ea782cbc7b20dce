"""Decide which registered queries must be re-windowed, mechanically.

The evidence-rotation rule through round 6 was textual: ANY edit to a
module containing registered queries re-windowed every query in it, so
an import hoist or comment fix burned driver-evidence slots (verdict r6
nit #2 counted two such slots).  This script tightens the rule to
EXECUTABLE-line granularity while keeping it mechanical:

    a registered query must be re-windowed iff, since the given base
    rev, the docstring-stripped AST changed for (a) its builder
    function, (b) any same-module function/class reachable from the
    builder by name (transitively), or (c) any module-level assignment
    whose target name is reachable from the builder.

Comments never reach the AST; docstrings are stripped before comparing;
import position is invisible at definition granularity.  Reachability is
by NAME OCCURRENCE (an over-approximation — a name mentioned under a
dead branch still counts), so the rule can only over-re-window relative
to true behavior, never under.

Usage::

    python scripts/rewindow_check.py <base-rev>          # names to re-window
    python scripts/rewindow_check.py <base-rev> --why    # + which defs changed
"""

from __future__ import annotations

import argparse
import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return tree


def _top_level_defs(src: str) -> dict[str, str]:
    """Map top-level name -> docstring-stripped AST dump.

    Covers function/class defs and plain/annotated assignments (module
    constants like regex tables that builders consume at runtime).
    """
    tree = _strip_docstrings(ast.parse(src))
    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out[node.name] = ast.dump(node)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out[tgt.id] = ast.dump(node)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            out[node.target.id] = ast.dump(node)
    return out


def _names_used(dump_src: str, src: str, def_name: str) -> set[str]:
    """All identifiers that occur inside the named top-level definition."""
    tree = ast.parse(src)
    for node in tree.body:
        found = (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
            and node.name == def_name
        ) or (
            isinstance(node, ast.Assign)
            and any(isinstance(t, ast.Name) and t.id == def_name for t in node.targets)
        ) or (
            isinstance(node, ast.AnnAssign)
            and isinstance(node.target, ast.Name)
            and node.target.id == def_name
        )
        if found:
            return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
    return set()


def _git_show(rev: str, relpath: str) -> str | None:
    proc = subprocess.run(
        ["git", "show", f"{rev}:{relpath}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return proc.stdout if proc.returncode == 0 else None


def changed_defs(rev: str, relpath: str, cur_src: str) -> set[str]:
    """Top-level names whose docstring-stripped AST differs from base rev."""
    base_src = _git_show(rev, relpath)
    cur = _top_level_defs(cur_src)
    if base_src is None:
        return set(cur)  # new module: everything counts as changed
    base = _top_level_defs(base_src)
    return {
        name
        for name in set(cur) | set(base)
        if cur.get(name) != base.get(name)
    }


def reachable(src: str, start: str) -> set[str]:
    """Transitive same-module name-occurrence closure from a top-level def."""
    defs = _top_level_defs(src)
    seen = {start}
    frontier = [start]
    while frontier:
        name = frontier.pop()
        if name not in defs:
            continue
        for used in _names_used(defs[name], src, name) & set(defs):
            if used not in seen:
                seen.add(used)
                frontier.append(used)
    return seen


def rewindow_names(rev: str) -> dict[str, set[str]]:
    """query name -> changed defs in its reachable set (empty = no re-window)."""
    sys.path.insert(0, str(REPO))
    from discogs_etl_spark import registry

    specs = registry.all_specs()
    by_module: dict[str, list[tuple[str, str]]] = {}
    for name, spec in specs.items():
        mod = sys.modules[spec.fn.__module__]
        relpath = str(Path(mod.__file__).resolve().relative_to(REPO))
        fn_name = spec.fn.__qualname__.split(".")[0].split("<locals>")[0]
        by_module.setdefault(relpath, []).append((name, fn_name))

    out: dict[str, set[str]] = {}
    for relpath, queries in sorted(by_module.items()):
        cur_src = (REPO / relpath).read_text()
        changed = changed_defs(rev, relpath, cur_src)
        if not changed:
            continue
        for qname, fn_name in queries:
            hit = reachable(cur_src, fn_name) & changed
            if hit:
                out[qname] = hit
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_rev", help="git rev to diff against (e.g. the last round-end commit)")
    ap.add_argument("--why", action="store_true", help="also print which defs changed")
    args = ap.parse_args()
    hits = rewindow_names(args.base_rev)
    for qname in sorted(hits):
        if args.why:
            print(f"{qname}\t{','.join(sorted(hits[qname]))}")
        else:
            print(qname)


if __name__ == "__main__":
    main()

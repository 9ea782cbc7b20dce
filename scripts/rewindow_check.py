"""Decide which registered queries must be re-windowed, mechanically.

The evidence-rotation rule through round 6 was textual: ANY edit to a
module containing registered queries re-windowed every query in it, so
an import hoist or comment fix burned driver-evidence slots (verdict r6
nit #2 counted two such slots).  This script tightens the rule to
EXECUTABLE granularity while keeping it mechanical:

    a registered query must be re-windowed iff, since the given base
    rev, a DIRTY name is reachable from its builder function by
    name-occurrence within its module (transitively).  A name is dirty
    when (a) a statement binding OR mutating it changed (docstring-
    stripped AST), (b) it is imported (``from m import name``) and
    ``name``'s reachable closure in the repo-local module ``m`` touches
    a dirty name there (or ``name`` is itself a repo-local submodule
    with any dirty name), or (c) it aliases a repo-local module
    (``import m``) that has ANY dirty name.

Comments never reach the AST; docstrings are stripped before comparing;
import statements are keyed by the names they bind, so hoisting or
reordering them changes nothing.  Bindings inside top-level if/try/
while/for/with accumulate (a name bound in several branches depends on
all of them), and module-level mutations — ``X[k] = v``, ``X += 1``,
``X.update(...)`` — accumulate onto the mutated name, so none of those
edits can hide.  Name-occurrence reachability is an over-approximation
(a name mentioned under a dead branch still counts), and cross-module
dirtiness propagates through the repo-local import graph — including
imports written inside function bodies — so within its stated
assumptions the rule over-re-windows, never under.  The assumptions,
stated: builders resolve their dependencies by ordinary imports and
module-level names — no importlib/``globals()``/``exec`` dynamic
dispatch, no behavior smuggled in via non-Python data files — which
holds for every module in this package.  Shared-helper changes are
therefore LOUD by design: editing anything ``tables.load`` reaches
dirties the ``load`` alias in every query module that imports it and
flags every builder that mentions it — correct, because all of their
results could change.

Usage::

    python scripts/rewindow_check.py <base-rev>          # names to re-window
    python scripts/rewindow_check.py <base-rev> --why    # + which names are dirty
"""

from __future__ import annotations

import argparse
import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGE = "discogs_etl_spark"

# Reserved key for top-level statement forms the index does not model
# (bare side-effect calls like ``setup()``, ``del X``, module-level
# ``match``/``assert``/``raise``, and compounds containing such
# statements).  Such a statement could mutate anything in its module,
# so a change to one dirties the whole module: the sentinel joins every
# builder's flagged set and propagates through member imports.  The
# package currently carries UNMODELED statements in exactly TWO
# modules, neither imported by any query module: __main__.py (the
# ``raise SystemExit(main())`` entry) and cli.py (the ``__main__``
# guard's bare ``main()`` call) — pinned by
# tests/test_rewindow_check.py::test_package_unmodeled_inventory, which
# fails loudly if a future edit adds an UNMODELED statement anywhere
# else (or removes these) so the weakened-attribution surface is always
# known and reviewed.
UNMODELED = "<unmodeled-top-level>"


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


def _flat_name_targets(target: ast.expr):
    """Yield Name nodes from assignment targets, incl. tuple/list unpacking."""
    if isinstance(target, ast.Name):
        yield target
    elif isinstance(target, (ast.Tuple, ast.List)):
        for elt in target.elts:
            yield from _flat_name_targets(elt)
    elif isinstance(target, ast.Starred):
        yield from _flat_name_targets(target.value)


def _root_name(expr: ast.expr) -> str | None:
    """Root Name of an attribute/subscript chain (None if call-rooted)."""
    while isinstance(expr, (ast.Attribute, ast.Subscript)):
        expr = expr.value
    return expr.id if isinstance(expr, ast.Name) else None


def _bound_names(node: ast.stmt) -> set[str]:
    """Every name a compound statement binds or mutates, at any depth.

    Over-approximates: names bound inside nested function bodies are
    included too (they can only ADD accumulation to a same-named module
    binding — the safe direction)."""
    out: set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.add(sub.name)
        elif isinstance(sub, ast.Assign):
            for tgt in sub.targets:
                for name in _flat_name_targets(tgt):
                    out.add(name.id)
                root = _root_name(tgt)
                if root:
                    out.add(root)
        elif isinstance(sub, (ast.AnnAssign, ast.AugAssign)):
            for name in _flat_name_targets(sub.target):
                out.add(name.id)
            root = _root_name(sub.target)
            if root:
                out.add(root)
        elif isinstance(sub, ast.Import):
            out |= {a.asname or a.name.split(".")[0] for a in sub.names}
        elif isinstance(sub, ast.ImportFrom):
            out |= {a.asname or a.name for a in sub.names if a.name != "*"}
        elif isinstance(sub, (ast.For, ast.AsyncFor)):
            for name in _flat_name_targets(sub.target):
                out.add(name.id)
        elif isinstance(sub, (ast.With, ast.AsyncWith)):
            for item in sub.items:
                if item.optional_vars is not None:
                    for name in _flat_name_targets(item.optional_vars):
                        out.add(name.id)
    return out


_COMPOUND_STMTS = (
    ast.If,
    ast.Try,
    ast.While,
    ast.For,
    ast.AsyncFor,
    ast.With,
    ast.AsyncWith,
)
# Statement forms whose module-level effect the index fully attributes
# to bound names (or that have none).  Break/Continue are pure control
# flow; nested FUNCTION bodies are deferred (they run on call, and their
# names are already captured by _bound_names).  ClassDef is NOT here:
# class bodies execute at definition time, so a bare call inside one is
# an import-time side effect — _has_unattributable recurses into them.
_ATTRIBUTABLE_STMTS = (
    ast.Assign,
    ast.AnnAssign,
    ast.AugAssign,
    ast.Import,
    ast.ImportFrom,
    ast.Pass,
    ast.Break,
    ast.Continue,
    ast.FunctionDef,
    ast.AsyncFunctionDef,
)


def _compound_bodies(node: ast.stmt) -> list[ast.stmt]:
    out: list[ast.stmt] = []
    for attr in ("body", "orelse", "finalbody"):
        out.extend(getattr(node, attr, None) or [])
    for handler in getattr(node, "handlers", None) or []:
        out.extend(handler.body)
    return out


def _has_unattributable(node: ast.stmt) -> bool:
    """True if a compound statement contains sub-statements whose effect
    the index cannot pin to a bound name: bare side-effect calls
    (``if flag: x = 1; setup()``), del/raise/assert, method-call
    mutations, or any statement form outside the attributable set.
    Nested function/class bodies are skipped (deferred execution).
    Without this check, a compound that binds at least one name
    attributed ALL of its behavior to those names, so builders not
    reaching them never flagged when only the side-effect line changed
    — an under-flag (ADVICE r8)."""
    stack = _compound_bodies(node)
    if isinstance(node, ast.ClassDef):
        stack = list(node.body)
    while stack:
        sub = stack.pop()
        if isinstance(sub, _ATTRIBUTABLE_STMTS):
            # A star import binds names the index cannot enumerate, so a
            # NESTED one (inside a compound that also binds a modeled
            # name) must mark the whole statement unattributable — the
            # top-level star path binds UNMODELED in _handle_import, but
            # that never runs for sub-statements, so without this check
            # deleting the nested star line only changed the sibling
            # binding's dump and builders using star-imported names
            # never flagged (ADVICE r9).
            if isinstance(sub, ast.ImportFrom) and any(
                a.name == "*" for a in sub.names
            ):
                return True
            continue
        if isinstance(sub, ast.Expr) and isinstance(sub.value, ast.Constant):
            continue  # stray literal / stripped docstring remnant
        if isinstance(sub, _COMPOUND_STMTS):
            stack.extend(_compound_bodies(sub))
            continue
        if isinstance(sub, ast.ClassDef):
            # class bodies run at definition time — import-time effects
            stack.extend(sub.body)
            continue
        return True  # Expr call, Delete, Raise, Assert, match, ...
    return False


class ModuleIndex:
    """Parse-once index of a module: top-level bindings, the names each
    binding's statements mention, and every repo-relevant import
    (module-level or written inside function bodies).

    Binding semantics mirror runtime where that is safe and over-
    approximate where it is not: a plain top-level re-assignment to a
    bare name OVERWRITES (last binding wins, like the interpreter),
    while branch bindings (if/try/...), augmented assignments, and
    subscript/attribute/method-call mutations ACCUMULATE onto the name —
    a change to ANY statement that could have produced the value flags
    it.
    """

    def __init__(self, src: str, relpath: str) -> None:
        tree = _strip_docstrings(ast.parse(src))
        self.relpath = relpath
        # bound name -> tuple of EXACT statement dumps (accumulation
        # appends; membership is exact-element, never substring — a new
        # statement whose dump happens to be a substring of an already
        # accumulated compound dump must still register as a change)
        self.defs: dict[str, tuple[str, ...]] = {}
        self.uses: dict[str, set[str]] = {}  # bound name -> names mentioned
        # local alias -> set of ("module", dotted) | ("member", dotted, member)
        self.imports: dict[str, set[tuple]] = {}
        self.star_imports: set[str] = set()
        self._walk_body(tree.body)
        # Imports inside function/compound bodies bind locally, but for
        # dirtiness they matter module-wide: record them all.
        for node in ast.walk(tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                self._record_import(node, bind=False)

    def _bind(self, name: str, node: ast.stmt, accumulate: bool = False) -> None:
        dump = ast.dump(node)
        names = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        if accumulate and name in self.defs:
            # ALWAYS append, even when an identical dump is already
            # accumulated: statement MULTIPLICITY is part of behavior
            # (deleting one of two identical ``X.append(1)`` statements
            # changes how many times it executes), so deduping here
            # would under-flag — the one direction the rule forbids.
            self.defs[name] = self.defs[name] + (dump,)
            self.uses[name] |= names
        else:
            self.defs[name] = (dump,)
            self.uses[name] = names

    def _record_import(self, node: ast.stmt, bind: bool) -> None:
        if isinstance(node, ast.Import):
            for alias in node.names:
                local = alias.asname or alias.name.split(".")[0]
                self.imports.setdefault(local, set()).add(("module", alias.name))
                if bind:
                    self._bind(local, node)
        elif isinstance(node, ast.ImportFrom):
            mod = self._resolve_from(node)
            if mod is None:
                return
            for alias in node.names:
                if alias.name == "*":
                    self.star_imports.add(mod)
                    if bind:
                        # A star import binds an unknowable name set, so
                        # adding/removing/re-targeting one is a module-
                        # wide change — without this, DELETING the
                        # statement changed no def dump and removed the
                        # propagation edge in the same breath: zero
                        # flags for a behavior change.
                        self._bind(UNMODELED, node, accumulate=True)
                    continue
                local = alias.asname or alias.name
                self.imports.setdefault(local, set()).add(("member", mod, alias.name))
                if bind:
                    self._bind(local, node)

    def _resolve_from(self, node: ast.ImportFrom) -> str | None:
        if node.level == 0:
            return node.module
        pkg = list(Path(self.relpath).parent.parts)
        drop = node.level - 1
        if drop > len(pkg):
            return None
        pkg = pkg[: len(pkg) - drop] if drop else pkg
        return ".".join(pkg + ([node.module] if node.module else []))

    def _walk_body(self, body: list[ast.stmt]) -> None:
        for node in body:
            # Walrus targets bind module-level names from ANY statement
            # form; accumulate them so `(x := f())` edits cannot hide.
            for sub in ast.walk(node):
                if isinstance(sub, ast.NamedExpr) and isinstance(sub.target, ast.Name):
                    self._bind(sub.target.id, node, accumulate=True)
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                self._bind(node.name, node)
            elif isinstance(node, ast.ClassDef):
                self._bind(node.name, node)
                if _has_unattributable(node):
                    # class bodies execute at definition time: a bare
                    # call in one is an import-time side effect the
                    # class name cannot bound.
                    self._bind(UNMODELED, node, accumulate=True)
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    for name in _flat_name_targets(tgt):
                        self._bind(name.id, node)
                    root = _root_name(tgt)
                    if root:  # X[k] = v / X.attr = v mutates X
                        self._bind(root, node, accumulate=True)
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name):
                    self._bind(node.target.id, node)
                else:
                    root = _root_name(node.target)
                    if root:
                        self._bind(root, node, accumulate=True)
            elif isinstance(node, ast.AugAssign):
                name = _root_name(node.target)
                if name:  # X += ... reads AND writes X: accumulate
                    self._bind(name, node, accumulate=True)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                self._record_import(node, bind=True)
            elif isinstance(node, ast.Expr):
                if isinstance(node.value, ast.Constant):
                    pass  # stray literal / stripped docstring remnant: inert
                elif (
                    isinstance(node.value, ast.Call)
                    and isinstance(node.value.func, ast.Attribute)
                    and _root_name(node.value.func)
                ):
                    # X.update(...) / X.append(...) — method-call mutation
                    self._bind(_root_name(node.value.func), node, accumulate=True)
                else:
                    # Bare Name-rooted call (`setup()`), call on a call
                    # result, lambda expr, ... — could mutate anything.
                    self._bind(UNMODELED, node, accumulate=True)
            elif isinstance(node, ast.Pass):
                pass
            elif isinstance(
                node, (ast.If, ast.Try, ast.While, ast.For, ast.With)
            ):
                # A name bound in ANY branch depends on the whole compound
                # statement (which branch wins is a runtime question), so
                # bind every name it touches to the full compound dump,
                # accumulating onto prior bindings — 'LIMIT = 1' followed
                # by 'if cond: LIMIT = 2' must flag when EITHER edit lands.
                bound = _bound_names(node)
                for name in bound:
                    self._bind(name, node, accumulate=True)
                if not bound or _has_unattributable(node):
                    # Binds nothing (`if flag: setup()`) OR binds names
                    # but ALSO carries side effects the index cannot
                    # attribute (`if flag: x = 1; setup()`): module-wide
                    # dirt on change, never silently folded into x.
                    self._bind(UNMODELED, node, accumulate=True)
            else:
                # del X / module-level match / assert / raise / global /
                # any future statement form: the index cannot attribute
                # the effect to a name, so attribute it to the module.
                self._bind(UNMODELED, node, accumulate=True)

    def reachable(self, start: str) -> set[str]:
        """Transitive same-module name-occurrence closure from a binding."""
        seen = {start}
        frontier = [start]
        while frontier:
            for used in self.uses.get(frontier.pop(), set()) & set(self.defs):
                if used not in seen:
                    seen.add(used)
                    frontier.append(used)
        return seen

    def mentioned_closure(self, start: str) -> set[str]:
        """reachable() plus every name the reachable bindings mention —
        covers names that bind nothing at module level (function-scoped
        imports, builtins shadowed by imports elsewhere, ...)."""
        reach = self.reachable(start)
        mentioned = set(reach)
        for n in reach:
            mentioned |= self.uses.get(n, set())
        return mentioned


def _top_level_defs(src: str, relpath: str = "mod.py") -> dict[str, str]:
    return ModuleIndex(src, relpath).defs


def reachable(src: str, start: str, relpath: str = "mod.py") -> set[str]:
    return ModuleIndex(src, relpath).reachable(start)


def _module_to_relpath(dotted: str, known: set[str]) -> str | None:
    """Map a dotted module to a repo-local relpath (None if external)."""
    if not dotted or not dotted.startswith(PACKAGE):
        return None
    parts = dotted.split(".")
    for cand in ("/".join(parts) + ".py", "/".join(parts) + "/__init__.py"):
        if cand in known:
            return cand
    return None


class RewindowAnalysis:
    """Testable core: takes {relpath: (cur_src, base_src|None)} directly."""

    def __init__(self, sources: dict[str, tuple[str, str | None]]) -> None:
        self.sources = sources
        self.cur: dict[str, ModuleIndex] = {
            rel: ModuleIndex(cur, rel) for rel, (cur, _) in sources.items()
        }
        self._changed_memo: dict[str, set[str]] = {}
        self._dirty_memo: dict[str, set[str]] = {}

    def changed_defs(self, rel: str) -> set[str]:
        if rel in self._changed_memo:
            return self._changed_memo[rel]
        cur = self.cur[rel].defs
        base_src = self.sources[rel][1]
        if base_src is None:
            out = set(cur)  # new module: everything counts as changed
        else:
            base = ModuleIndex(base_src, rel).defs
            out = {n for n in set(cur) | set(base) if cur.get(n) != base.get(n)}
        self._changed_memo[rel] = out
        return out

    def dirty_names(self, rel: str, _visiting: frozenset = frozenset()) -> set[str]:
        """Names in ``rel`` whose behavior may have changed: own AST diff
        plus dirtiness imported from other repo-local modules."""
        if rel in self._dirty_memo:
            return self._dirty_memo[rel]
        if rel in _visiting:
            return self.changed_defs(rel)  # import cycle: own changes only
        visiting = _visiting | {rel}
        dirty = set(self.changed_defs(rel))
        idx = self.cur[rel]
        known = set(self.sources)
        for local, specs in idx.imports.items():
            for spec in specs:
                if spec[0] == "module":
                    target = _module_to_relpath(spec[1], known)
                    if target and target != rel and self.dirty_names(target, visiting):
                        dirty.add(local)
                else:
                    mod, member = spec[1], spec[2]
                    # 'from pkg import submodule': the member may itself be
                    # a repo-local MODULE — any change inside it counts
                    sub_rel = _module_to_relpath(f"{mod}.{member}", known)
                    if sub_rel and sub_rel != rel and self.dirty_names(sub_rel, visiting):
                        dirty.add(local)
                        continue
                    target = _module_to_relpath(mod, known)
                    if target and target != rel and self._name_dirty(
                        target, member, visiting
                    ):
                        dirty.add(local)
        for smod in idx.star_imports:
            target = _module_to_relpath(smod, known)
            if target and target != rel:
                dirty |= self.dirty_names(target, visiting)
        # An UNMODELED statement whose own dump is unchanged still
        # changes module behavior when anything it CALLS/MENTIONS is
        # dirty (`setup()` at top level with an edited setup body runs
        # the new code at import): the sentinel goes dirty whenever its
        # mention closure does.
        if (
            UNMODELED in idx.defs
            and UNMODELED not in dirty
            and idx.mentioned_closure(UNMODELED) & dirty
        ):
            dirty.add(UNMODELED)
        # Results computed under cycle truncation are order-dependent —
        # memoizing them would poison later full evaluations (a real
        # hazard: curation.py <-> queries/llm.py cycle via function-
        # scoped imports).  Only cache top-level computations.
        if not _visiting:
            self._dirty_memo[rel] = dirty
        return dirty

    def _name_dirty(self, rel: str, name: str, visiting: frozenset) -> bool:
        """Is ``name`` in module ``rel`` behavior-changed?  Not just its
        own statement: anything its closure reaches counts — 'from m
        import load' must flag when load's INTERNAL helper changed.  A
        changed UNMODELED statement in ``rel`` could have mutated any
        name in it, so it dirties every member import too."""
        dirty = self.dirty_names(rel, visiting)
        if UNMODELED in dirty:
            return True
        return bool(self.cur[rel].mentioned_closure(name) & dirty)

    def flagged(self, rel: str, fn_name: str) -> set[str]:
        """Dirty names the builder can reach (empty = no re-window).

        Beyond the def-closure itself, every name MENTIONED by a
        reachable binding counts: a function-scoped ``from m import f``
        binds no module-level def, but the builder still calls ``f``.
        A changed UNMODELED top-level statement flags every builder in
        the module — the index cannot bound its effect.
        """
        dirty = self.dirty_names(rel)
        hit = self.cur[rel].mentioned_closure(fn_name) & dirty
        if UNMODELED in dirty:
            hit = hit | {UNMODELED}
        return hit


def _git_show(rev: str, relpath: str) -> str | None:
    proc = subprocess.run(
        ["git", "show", f"{rev}:{relpath}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return proc.stdout if proc.returncode == 0 else None


def rewindow_names(rev: str) -> dict[str, set[str]]:
    """query name -> dirty names its builder reaches (empty = no re-window)."""
    sys.path.insert(0, str(REPO))
    from discogs_etl_spark import registry

    # Index EVERY repo-local module, not just those holding builders:
    # shared helpers (tables.py, queries/_util.py, ...) propagate
    # dirtiness into query modules through the import graph.
    sources: dict[str, tuple[str, str | None]] = {}
    for f in sorted((REPO / PACKAGE).rglob("*.py")):
        rel = str(f.relative_to(REPO))
        sources[rel] = (f.read_text(), _git_show(rev, rel))
    analysis = RewindowAnalysis(sources)

    out: dict[str, set[str]] = {}
    for name, spec in registry.all_specs().items():
        mod = sys.modules[spec.fn.__module__]
        rel = str(Path(mod.__file__).resolve().relative_to(REPO))
        fn_name = spec.fn.__qualname__.split(".")[0].split("<locals>")[0]
        hit = analysis.flagged(rel, fn_name)
        if hit:
            out[name] = hit
    return out


# --- Code-closure fingerprints (r14) -------------------------------
#
# The scaling-exponent artifact (SCALE_EXPONENTS.json) is keyed to
# query CODE, not rounds: a rewrite that introduces an accidental
# quadratic must redden the suite until the affected names are
# re-measured.  These helpers hash each builder's reachable code
# closure in the CURRENT tree, mirroring the dirtiness-propagation
# rules above (own-module mention closure; member imports pull the
# member's closure in the target module; module/star imports and
# UNMODELED statements pull the whole target module; import cycles
# truncate to own-module parts, like dirty_names) — so the fingerprint
# changes exactly when this script would flag the query against the
# fingerprinted revision, comments and docstrings excluded.


def _fp_module_parts(idxs, known, rel, visiting, out) -> None:
    # Own defs are ALWAYS part of the identity, even on cycle re-entry:
    # dirty_names' truncation returns changed_defs(rel) — any own-def
    # change dirties a module-granularity alias — so a fingerprint that
    # added nothing here would stay unchanged where rewindow flags
    # (r14 review: module-style re-entry into a member-visited module).
    idx = idxs[rel]
    for n, dumps in idx.defs.items():
        out.add((rel, n, dumps))
    if rel in visiting:
        return  # cycle: own defs only (dirty_names rule)
    visiting = visiting | {rel}
    for specs in idx.imports.values():
        for spec in specs:
            _fp_import_parts(idxs, known, rel, spec, visiting, out)
    for smod in idx.star_imports:
        t = _module_to_relpath(smod, known)
        if t and t != rel:
            _fp_module_parts(idxs, known, t, visiting, out)


def _fp_import_parts(idxs, known, rel, spec, visiting, out) -> None:
    if spec[0] == "module":
        t = _module_to_relpath(spec[1], known)
        if t and t != rel:
            _fp_module_parts(idxs, known, t, visiting, out)
        return
    mod, member = spec[1], spec[2]
    sub = _module_to_relpath(f"{mod}.{member}", known)
    if sub and sub != rel:
        _fp_module_parts(idxs, known, sub, visiting, out)
        return
    t = _module_to_relpath(mod, known)
    if t and t != rel:
        _fp_member_parts(idxs, known, t, member, visiting, out)


def _fp_member_parts(idxs, known, rel, name, visiting, out) -> None:
    idx = idxs[rel]
    if UNMODELED in idx.defs:
        # an unmodeled top-level statement can mutate anything in its
        # module, so the whole module is part of every member's identity
        _fp_module_parts(idxs, known, rel, visiting, out)
        return
    closure = idx.mentioned_closure(name)
    for n in sorted(closure):
        if n in idx.defs:
            out.add((rel, n, idx.defs[n]))
    if rel in visiting:
        return  # import cycle: own-module parts only (dirty_names rule)
    visiting = visiting | {rel}
    for n in sorted(closure):
        for spec in idx.imports.get(n, ()):
            _fp_import_parts(idxs, known, rel, spec, visiting, out)
    for smod in idx.star_imports:
        t = _module_to_relpath(smod, known)
        if t and t != rel:
            _fp_module_parts(idxs, known, t, visiting, out)


def current_fingerprints() -> dict[str, str]:
    """query name -> 16-hex sha256 of the builder's reachable code
    closure in the CURRENT working tree.  Deterministic (sorted parts,
    docstring-stripped AST dumps, repo-relative paths); stable across
    sessions and machines for the same tree."""
    import hashlib

    sys.path.insert(0, str(REPO))
    from discogs_etl_spark import registry

    idxs: dict[str, ModuleIndex] = {}
    for f in sorted((REPO / PACKAGE).rglob("*.py")):
        rel = str(f.relative_to(REPO))
        idxs[rel] = ModuleIndex(f.read_text(), rel)
    known = set(idxs)

    out: dict[str, str] = {}
    for name, spec in registry.all_specs().items():
        mod = sys.modules[spec.fn.__module__]
        rel = str(Path(mod.__file__).resolve().relative_to(REPO))
        fn_name = spec.fn.__qualname__.split(".")[0].split("<locals>")[0]
        parts: set = set()
        _fp_member_parts(idxs, known, rel, fn_name, frozenset(), parts)
        blob = "\n".join(
            f"{r}::{n}::{'||'.join(dumps)}" for r, n, dumps in sorted(parts)
        )
        out[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_rev", help="git rev to diff against (e.g. the last round-end commit)")
    ap.add_argument("--why", action="store_true", help="also print which names are dirty")
    args = ap.parse_args()
    hits = rewindow_names(args.base_rev)
    for qname in sorted(hits):
        if args.why:
            print(f"{qname}\t{','.join(sorted(hits[qname]))}")
        else:
            print(qname)


if __name__ == "__main__":
    main()

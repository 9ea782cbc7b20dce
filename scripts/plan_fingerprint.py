#!/usr/bin/env python
"""Executed-plan fingerprints: the machine-checkable plan gate's extractor.

Answers are hash-gated (tests/test_oracle.py) and wall-times are
ratio-gated (scripts/timing_compare.py), but both catch a Catalyst
strategy flip only noisily and after the fact — the r10
recsys_holdout_hitrate nested-loop ran green for nine rounds because
nothing machine-checked the PHYSICAL plan.  This module normalizes an
EXECUTED plan (the AQE final plan, not the initial one — runtime
broadcast conversions are part of the strategy under test) into a small
dict of node counts that tests/test_plans.py pins per query:

    {"scan_parquet": 1, "scan_rdd": 0, "local_scan": 0, "bhj": 2,
     "smj": 0, "shj": 0, "bnlj": 0, "cartesian": 0, "cache": 0}

* ``scan_parquet`` — FileSourceScan count: a query that promises "one
  corpus scan" must not silently grow a second scan branch; a
  checkpointed iteration (pc1 / pc1_gram) must show ZERO parquet scans
  in its returned plan, else the fold is no longer physically real (the
  r9 lesson: Catalyst re-derives subtrees from the scan unless the
  materialization actually happened).
* ``bhj``/``smj``/``shj`` — join strategies on named joins: a dimension
  join that loses its broadcast (hint dropped, threshold misread)
  flips bhj -> smj deterministically at the pinned sf/session.
* ``bnlj``/``cartesian`` — always pinned, almost always to zero; the
  only nonzero pins are the deliberate broadcast-hinted crossJoins
  (kmeans centroid assignment and friends), which
  test_every_crossjoin_is_broadcast_hinted separately proves are
  hinted.
* ``cache`` — InMemoryTableScan count; cached-relation plans are walked
  too (once per distinct cache), so nothing hides under a cache().

The fingerprint is taken at a FIXED condition (sf dir + the tuned test
session: local[8], shuffle.partitions=8, AQE on) — AQE's runtime
broadcast conversions depend on observed sizes, so the pins are
statements about the plan AT that condition, exactly the condition the
suite reruns them under.  UPDATE PATH when a plan legitimately changes:
rerun this script for the touched names and paste the new dict into
tests/test_plans.py's PLAN_PINS, with a commit message saying WHY the
shape moved (a pin update without a rationale is the smell the gate
exists to produce).

    python scripts/plan_fingerprint.py [--sf /root/testdata/sf0.001]
                                       [--only a,b,...] [--pins]

``--pins`` prints the ready-to-paste PLAN_PINS body for the gate's
pinned set (bench headline set + the previously-fixed scale-killers).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The gate's pinned set: every bench=True headline query (the 23 the
# driver times every round) plus the previously-fixed scale-killers —
# queries whose plan SHAPE was the bug once already:
#   recsys_holdout_hitrate      r10: OR-of-equalities join nested-looped;
#                               fixed as a union of two hash equi-joins
#   dedup_minhash_eval          r11: three driver .count() actions re-ran
#                               the all-pairs join twice; now ONE plan
#   embedding_power_iteration_pc1 / _gram
#                               r9/r10: the covariance fold must be
#                               physically materialized (zero parquet
#                               scans in the returned iteration plan)
SCALE_KILLERS = (
    "recsys_holdout_hitrate",
    "dedup_minhash_eval",
    "embedding_power_iteration_pc1",
    "embedding_power_iteration_pc1_gram",
)

# Second tier: queries whose 100 TB story IS a specific plan shape — the
# bucketed/salted/as-of join demos and the production twins of the two
# all-pairs baselines.  Their correctness is hash-gated like everything
# else; what the pin protects is the CLAIMED strategy (a bucket join
# that quietly un-buckets, an IVF candidate join that falls back to
# brute force, a pruned index that loses its broadcast) — the part a
# reviewer cites and a value hash cannot see.
SCALE_STORY = (
    "range_join_bucketed",
    "join_skew_salted",
    "agg_salted_skew_safe",
    "asof_join_events",
    "asof_join_tolerance",
    "dedup_embedding_bucketed",
    "similarity_ivf_topk",
    "text_search_bm25_pruned_topk",
    # r17 (VERDICT r16 task #7): the LSH skew guards' whole story is the
    # width-filter join on the bucket key BEFORE candidate generation —
    # a rewrite that silently drops the filter reverts to uncapped
    # O(width²) pair emission while values stay plausible at fixture
    # scale, so the shape (and the filter's condition text, via
    # condition_texts) must redden the plan gate, not just the value gate.
    "dedup_minhash_capped_pairs",
    "multimodal_phash_capped_pairs",
)

# Third tier (VERDICT r12 task #4): the expensive non-headline tail —
# the registry's costliest sf0.1 walls outside the bench set and the
# documented all-pairs baselines (TIMINGS_r12: phash 20.9 s, theil_sen
# 11.4 s, semdedup 9.7 s, doc_duplication 8.1 s, pricing_audit 7.8 s,
# levenshtein 6.5 s).  These are where a silent Catalyst strategy flip
# costs the most wall-time per round: each one's cost is ACCEPTABLE
# only under its current shape (banded equi-join, cluster-scoped
# pairs, blocked compare), and a flip to a broader join multiplies a
# double-digit wall, so they get the same deterministic pin as the
# headline set.
EXPENSIVE_TAIL = (
    # phash's r15 rewrite cut its wall from 15.4 s to ~2 s, but the pin
    # stays: the new shape (4 BHJ over a localCheckpointed hash stage)
    # is exactly what makes it cheap, so a strategy flip is still the
    # costliest thing that could happen to it.
    "multimodal_phash_dedup",
    "stats_theil_sen_trend",
    "dedup_semdedup",
    "dedup_doc_duplication_score",
    "fuzzy_join_levenshtein_blocked",
    "pricing_consistency_audit",
)

# Fourth tier (r17): the user-facing curation API compositions — the
# queries that run `curation.dedup_corpus` / `dedup_media` /
# `search_corpus` / `profile_table` END TO END.  Their stages are
# individually pinned above (minhash/phash capped pairs, BM25, CC),
# but the API composes them across module boundaries, so a regression
# in the GLUE (a lost broadcast on the report attach, a re-shuffled
# survivor join, a dropped width filter at the API call site) is
# invisible to the stage pins while multiplying the cost of the exact
# entry points a reference user calls.  `curation_dedup_media_capped`
# is also the costliest non-baseline tail this round (16.7 s sf0.1).
API_SURFACE = (
    "curation_dedup_corpus",
    "curation_dedup_media",
    "curation_dedup_media_capped",
    "curation_search_corpus",
    "curation_profile_table",
    # r18: the backfill CLI verb's composition.  The RETURNED plan is
    # the audit report (one local-results scan — the ingest jobs are
    # actions inside pipeline.backfill, invisible to the returned
    # DataFrame), so the pin is thin by construction; what it guards is
    # the report staying driver-local (a rewrite that turns the audit
    # into a distributed join against the lake would grow scans here).
    "backfill_audit_table",
)

# Physical-node classification by JVM class name.  The extractor WALKS
# THE PLAN OBJECTS (py4j) instead of parsing explain strings: three
# successive review passes each found a leak in a string approach,
# because EVERY string view — explain("formatted"), sparkPlan
# .treeString(), executedPlan().treeString() — prints a materialized
# adaptive subtree twice (== Final Plan == / == Initial Plan == pairs,
# nested and indentation-restarting under cached relations), and
# whole-stage-codegen prefixes defeat line parsers.  The object tree has
# each node exactly once, exposes conditions as expressions (rendered
# via .sql() — stable, no expr ids), and lets intent pick the plan per
# AdaptiveSparkPlanExec: initialPlan (static Catalyst strategy,
# cache-state-immune) or executedPlan (runtime strategy, after an
# action).
_CLS_KEYS = {
    "FileSourceScanExec": "scan_parquet",
    "RDDScanExec": "scan_rdd",
    "LocalTableScanExec": "local_scan",
    "BroadcastHashJoinExec": "bhj",
    "SortMergeJoinExec": "smj",
    "ShuffledHashJoinExec": "shj",
    "BroadcastNestedLoopJoinExec": "bnlj",
    "CartesianProductExec": "cartesian",
    "InMemoryTableScanExec": "cache",
}


def _walk(jplan, executed: bool, visited: set):
    """Yield (simpleClassName, node) for every DISTINCT physical node
    reachable from ``jplan``: through adaptive plans (final if
    ``executed`` else initial), query stages, cached relations
    (InMemoryTableScan -> cachedPlan), and children.  ``Reused*``
    wrappers are skipped (their target is reached through its owner),
    and a global visited set on SparkPlan.id guarantees a shared
    subtree (one cached plan scanned from several places) counts once —
    physically it computes once."""
    cls = jplan.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        child = jplan.executedPlan() if executed else jplan.initialPlan()
        yield from _walk(child, executed, visited)
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk(jplan.plan(), executed, visited)
        return
    if cls.startswith("Reused"):
        return
    node_id = jplan.id()
    if node_id in visited:
        return
    visited.add(node_id)
    yield cls, jplan
    if cls == "InMemoryTableScanExec":
        yield from _walk(jplan.relation().cachedPlan(), executed, visited)
    children = jplan.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i), executed, visited)


def iter_physical_nodes(df, *, executed: bool):
    """All distinct physical nodes of ``df``'s prepared plan, INCLUDING
    subquery plans (``subqueriesAll`` — a nested loop inside a scalar
    subquery is still a nested loop).  ``executed=True`` runs the
    DataFrame first so every adaptive plan reports its FINAL tree;
    ``executed=False`` reads initial plans — the static Catalyst
    strategy, identical whether or not a builder's internal actions
    pre-materialized cached stages."""
    if executed:
        df.collect()
    root = df._jdf.queryExecution().executedPlan()
    visited: set = set()
    yield from _walk(root, executed, visited)
    subs = root.subqueriesAll()
    for i in range(subs.size()):
        yield from _walk(subs.apply(i), executed, visited)


def fingerprint(df, *, executed: bool = True) -> dict[str, int]:
    """Normalized node counts of the (executed) physical plan."""
    counts = dict.fromkeys(_CLS_KEYS.values(), 0)
    for cls, _node in iter_physical_nodes(df, executed=executed):
        key = _CLS_KEYS.get(cls)
        if key is not None:
            counts[key] += 1
    return counts


def _subtree_identity(jnode) -> tuple[list[str], list[str]]:
    """``(leaves, shape)`` of the subtree under a physical node — the
    IDENTITY of a nested-loop node beyond its mere presence (r13
    review): two condition-less crosses count the same, but a 1-row
    scalar-aggregate cross over ``range`` and a data-sized pure cross
    over a parquet table have different leaf sets, so recording them
    makes a like-for-like count substitution visible round-over-round.

    ``leaves`` — sorted leaf-source descriptors.  Parquet scans name
    their root paths; other known leaf classes reduce to their kind (an
    RDD scan's string form carries session expr-ids, so only the class
    is artifact-stable); a zero-children node of an UNRECOGNIZED class
    (e.g. a DSv2 BatchScanExec) still contributes ``other:<ClassName>``
    so unknown sources carry identity instead of silently dropping out
    of the leaf set (r13 ADVICE — a swap between two unrecognized
    source kinds must not be invisible).

    ``shape`` — the subtree's node-class MULTISET, rendered as sorted
    ``"ClassName:count"`` strings over every distinct physical node
    (wrapper kinds — Adaptive/QueryStage/Reused — excluded; class
    names only, so the rendering is expr-id-free and artifact-stable),
    plus ONE trailing ``"tree:<skeleton>"`` entry carrying the ORDERED
    class-name tree (``Cls(child,child)`` nesting, same wrapper rules).
    This is the r13 residual's closure (verdict r13 task #2): a
    condition-less cross substitution that preserves BOTH the count
    and the exact leaf sets still differs in the operators BETWEEN
    the leaves and the cross — a scalar aggregate feeding a broadcast
    is a different class multiset than a projection feeding one.  The
    skeleton (r14 review) closes the multiset's own blind spot: a
    rearrangement that PRESERVES the class multiset — an operator
    moved from the build side to the stream side, or sibling operators
    exchanged between branches — changes the ordered tree even though
    every count is identical.  Remaining residual, documented rather
    than papered over: expression TEXT inside non-nested-loop
    operators is not compared (a changed filter predicate under an
    unchanged skeleton is invisible here) — condition text is compared
    only on the nested-loop nodes themselves, and value regressions
    from changed expressions are the correctness gate's jurisdiction,
    not the plan gate's.

    Own traversal, NOT ``_walk``: _walk's ``Reused*`` early-return is
    correct for a global walk (the target is reached through its
    owner) but wrong for an ISOLATED subtree walk — a cross whose side
    is a ReusedExchange would contribute zero leaves, truncating the
    identity exactly where it matters (second r13 review pass).  Here
    a ``Reused*`` wrapper is followed into the plan it reuses: the
    identity question is "what sources feed this node", and a reused
    exchange is fed by the original's sources."""
    out: list[str] = []
    cls_counts: dict[str, int] = {}
    stack = [jnode]
    seen: set = set()
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(n.initialPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(n.plan())
            continue
        if cls.startswith("Reused"):
            # ReusedExchangeExec / ReusedSubqueryExec are leaf wrappers
            # whose constructor child is the reused plan.
            stack.append(n.child())
            continue
        node_id = n.id()
        if node_id in seen:
            continue
        seen.add(node_id)
        cls_counts[cls] = cls_counts.get(cls, 0) + 1
        children = n.children()
        if cls == "FileSourceScanExec":
            paths = n.relation().location().rootPaths()
            names = sorted(
                paths.apply(i).getName() for i in range(paths.size())
            )
            out.append("parquet:" + ",".join(names))
        elif cls == "RDDScanExec":
            out.append("rdd")
        elif cls == "LocalTableScanExec":
            out.append("local")
        elif cls == "RangeExec":
            out.append("range")
        elif cls == "InMemoryTableScanExec":
            stack.append(n.relation().cachedPlan())
        elif children.size() == 0:
            out.append(f"other:{cls}")
        for i in range(children.size()):
            stack.append(children.apply(i))
    shape = sorted(f"{c}:{k}" for c, k in cls_counts.items())
    shape.append("tree:" + _skeleton(jnode))
    return sorted(out), shape


def _skeleton(jnode) -> str:
    """Ordered class-name rendering of a physical subtree —
    ``Cls(child,child)`` — with the same wrapper rules as the multiset
    walk (Adaptive → initialPlan, QueryStage → plan, Reused* followed
    into the reused plan, InMemoryTableScan → cachedPlan).  Child order
    is constructor order, which is deterministic for a given plan; only
    class simple names appear, so the string is expr-id-free and
    artifact-stable (verified byte-identical across fresh sessions,
    same standard as the rest of the sweep schema).  Unlike the
    multiset walk there is no node-id dedup: a subtree reached through
    two Reused wrappers renders at both sites, which is exactly the
    ordered identity we want, and physical plans are acyclic so the
    recursion terminates."""
    n = jnode
    while True:
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            n = n.initialPlan()
        elif cls.endswith("QueryStageExec"):
            n = n.plan()
        elif cls.startswith("Reused"):
            n = n.child()
        else:
            break
    if cls == "InMemoryTableScanExec":
        return f"{cls}({_skeleton(n.relation().cachedPlan())})"
    children = n.children()
    if children.size() == 0:
        return cls
    inner = ",".join(_skeleton(children.apply(i)) for i in range(children.size()))
    return f"{cls}({inner})"


def nested_loop_nodes(df) -> list[dict]:
    """Every BroadcastNestedLoopJoin / CartesianProduct node in the
    STATIC physical plan, as ``{"cond": <Expression.sql() or "None">,
    "leaves": [<leaf descriptor>, ...], "shape": ["Cls:count", ...]}``.

    The discriminator the full-registry sweep keys on: a condition-less
    Cross nested loop is the deliberate broadcast-hinted scalar
    crossJoin pattern (every source-level crossJoin is hint-checked by
    test_every_crossjoin_is_broadcast_hinted), while a nested loop WITH
    a condition is a real join Catalyst could not plan as a hash join —
    the r10 recsys_holdout_hitrate bug class (an OR-of-equalities
    condition nested-looping), unless it is a documented non-equi band
    join.  ``leaves`` gives the condition-less class an identity the
    bare count lacks; ``shape`` (the subtree node-class multiset plus
    a trailing ordered-skeleton entry) makes even a same-count
    same-leaves substitution or a multiset-preserving rearrangement
    visible."""
    out = []
    for cls, node in iter_physical_nodes(df, executed=False):
        if cls not in ("BroadcastNestedLoopJoinExec", "CartesianProductExec"):
            continue
        cond = node.condition()
        leaves, shape = _subtree_identity(node)
        out.append(
            {
                "cond": _norm_sql(cond.get().sql()) if cond.isDefined() else "None",
                "leaves": leaves,
                "shape": shape,
            }
        )
    return out


def _norm_sql(text: str) -> str:
    """Normalize session-dependent generated aliases in a rendered
    expression.  CommonExpressionRef aliases (``_common_expr_N``) number
    from a SESSION-global counter, so the same plan renders different N
    across builds; the regex collapses the counter wherever it appears —
    filters, aggregates, windows, generators — not just project lists
    (r17 ADVICE: a CSE ref surfacing inside any other captured text
    would otherwise make that capture session-dependent)."""
    return re.sub(r"_common_expr_\d+", "_common_expr_#", text)


def _seq_sql(jseq) -> list[str]:
    """Render a Scala Seq[Expression] via .sql() (stable, no expr ids;
    session-global generated aliases normalized by _norm_sql)."""
    return [_norm_sql(jseq.apply(i).sql()) for i in range(jseq.size())]


def condition_texts(df) -> list[str]:
    """Sorted descriptors of every Filter condition and every hash-join
    key set (+ residual condition) in the STATIC plan — the expression
    surface plansweep_compare was blind to on non-nested-loop operators
    (r14 verdict residual / r15 task #5).  Nested-loop nodes are
    EXCLUDED here: their condition text already has its own identity,
    diff, and ack kinds.

    Captured only for the PLAN_PINS gate set (the sweep calls this for
    ``pinned_names()`` queries), so the cost is bounded and the gate
    covers exactly the plans whose shape is already pinned: a predicate
    rewrite there (a loosened filter, a dropped join key, a changed
    residual) flags round-over-round even though the node counts and
    join strategies are identical.

    Join keys are captured as jointly-sorted ``left=right`` PAIRS, not
    independently-sorted key lists (r15 ADVICE #2): sorting leftKeys
    and rightKeys separately destroys positional pairing, so a rewrite
    that re-pairs the equi-join (left key i now equated to a DIFFERENT
    right key) yielded an identical descriptor — the exact
    dropped/changed-join-key class this capture exists to catch."""
    return pinned_captures(df)[0]


def aggregate_texts(df) -> list[str]:
    """Sorted descriptors of every aggregate node's grouping keys and
    aggregate expressions in the STATIC plan — closes the remaining
    pinned-expression blindness (r16 verdict residual #5: expression
    text outside Filter/hash-join nodes was uncompared): a pinned query
    whose node counts, filter conditions, and join keys are all
    identical can still silently change WHAT it aggregates (sum -> avg,
    a lost count-distinct, a regrouped key).  Captured only for the
    PLAN_PINS gate set, like ``condition_texts``, and diffed
    round-over-round by plansweep_compare under the ``pinned_agg`` ack
    kind.

    Rendering notes (probed on Spark 4.1): ``.sql()`` on grouping and
    aggregate expressions is expr-id-free and deterministic across plan
    builds; partial and final stages of one logical aggregate render
    IDENTICAL texts (mode is not part of ``.sql()``), so a lost
    map-side partial aggregation shows as a multiset-count change, not
    a text change — both redden."""
    return pinned_captures(df)[1]


def window_sort_texts(df) -> list[str]:
    """Sorted descriptors of every Window / WindowGroupLimit / Sort /
    TakeOrderedAndProject node in the STATIC plan — the last slice of
    the r16 pinned-expression blindness (residual #5): with filters,
    join keys, and aggregates captured, a pinned plan could still
    silently change its window functions (rank -> row_number, a
    re-partitioned OVER clause, a dropped frame bound), its sort keys
    or direction/null ordering, or a top-k limit.  Captured only for
    the PLAN_PINS gate set, like ``condition_texts``, and diffed
    round-over-round by plansweep_compare under the ``pinned_window``
    ack kind.

    Descriptor shapes (order spec kept in ORDER — it is positional
    semantics; partition spec and window expressions sorted — they are
    sets):

    - ``win:[partition]:[order]:[window exprs]``
    - ``wgl:[partition]:[order]:[rank fn]:limit`` — the rank-based
      group-limit pushdown; losing it reverts a top-k-per-group to a
      full window sort.
    - ``sort:[order]:global`` — ``global=False`` is a per-partition
      sort (e.g. SMJ input); a global becoming local changes result
      order semantics.
    - ``topk:[order]:limit``

    Rendering notes (probed on Spark 4.1 across the full pin set, two
    independent plan builds each): ``.sql()`` on SortOrder renders
    ``key ASC NULLS FIRST``-style text with no expr ids; window
    expressions render the full OVER clause including frame bounds;
    generated intermediate names (``_w0``) number deterministically
    per-query."""
    return pinned_captures(df)[2]


def projection_texts(df) -> list[str]:
    """Sorted descriptors of every Project / Generate / Expand / bare
    Limit node in the STATIC plan — the LAST uncompared
    expression-bearing classes in a pinned plan (the precisely-stated
    residual after the r17 aggregate and window/sort captures): a
    changed projection arithmetic, a swapped generator, a regrouped
    Expand, or a changed bare ``.limit(n)`` under identical node counts
    was still invisible to the plan gate.  Captured only for the
    PLAN_PINS gate set and diffed under the ``pinned_proj`` ack kind.

    Descriptor shapes (project lists kept in ORDER — output column
    order is semantics):

    - ``proj:[expr AS name, ...]``
    - ``gen:[generator sql]:outer`` (outer=True keeps empty-generator
      rows — losing it silently drops rows)
    - ``expand:n:[proj0; proj1; ...]`` (grouping-set/cube lattices)
    - ``limit:Class:n`` for CollectLimit / GlobalLimit / LocalLimit
      (TakeOrderedAndProject limits live in the window/sort capture)

    Rendering probed on this Spark build: ``.sql()`` on project-list
    expressions (including generated ``_groupingexpression`` aliases
    and CASE chains) is expr-id-free and deterministic across plan
    builds and JVM sessions."""
    return pinned_captures(df)[3]


def pinned_captures(
    df,
) -> tuple[list[str], list[str], list[str], list[str]]:
    """One STATIC-plan walk producing all four pinned capture lists
    ``(condition_texts, aggregate_texts, window_sort_texts,
    projection_texts)`` — ``iter_physical_nodes`` is
    py4j-roundtrip-heavy, so the sweep calls this once per pinned query
    instead of four separate traversals."""
    conds: list[str] = []
    aggs: list[str] = []
    wins: list[str] = []
    projs: list[str] = []
    for cls, node in iter_physical_nodes(df, executed=False):
        if cls == "FilterExec":
            conds.append(f"filter:{_norm_sql(node.condition().sql())}")
        elif cls in (
            "BroadcastHashJoinExec",
            "SortMergeJoinExec",
            "ShuffledHashJoinExec",
        ):
            pairs = ",".join(
                sorted(
                    f"{l}={r}"
                    for l, r in zip(
                        _seq_sql(node.leftKeys()), _seq_sql(node.rightKeys())
                    )
                )
            )
            cond = node.condition()
            residual = _norm_sql(cond.get().sql()) if cond.isDefined() else ""
            conds.append(f"join:[{pairs}]:{residual}")
        elif cls in (
            "HashAggregateExec",
            "SortAggregateExec",
            "ObjectHashAggregateExec",
        ):
            keys = ",".join(sorted(_seq_sql(node.groupingExpressions())))
            exprs = ",".join(sorted(_seq_sql(node.aggregateExpressions())))
            aggs.append(f"agg:[{keys}]:[{exprs}]")
        elif cls == "WindowExec":
            part = ",".join(sorted(_seq_sql(node.partitionSpec())))
            order = ",".join(_seq_sql(node.orderSpec()))
            exprs = ",".join(sorted(_seq_sql(node.windowExpression())))
            wins.append(f"win:[{part}]:[{order}]:[{exprs}]")
        elif cls == "WindowGroupLimitExec":
            part = ",".join(sorted(_seq_sql(node.partitionSpec())))
            order = ",".join(_seq_sql(node.orderSpec()))
            rank = _norm_sql(node.rankLikeFunction().sql())
            wins.append(f"wgl:[{part}]:[{order}]:[{rank}]:{node.limit()}")
        elif cls == "SortExec":
            order = ",".join(_seq_sql(node.sortOrder()))
            # `global` is a Python keyword — getattr for the accessor.
            wins.append(f"sort:[{order}]:{getattr(node, 'global')()}")
        elif cls == "TakeOrderedAndProjectExec":
            order = ",".join(_seq_sql(node.sortOrder()))
            wins.append(f"topk:[{order}]:{node.limit()}")
        elif cls == "ProjectExec":
            # _common_expr_N normalization happens inside _seq_sql
            # (probed: dedup_minhash_eval flipped _common_expr_0 ->
            # _common_expr_2 on rebuild); the CSE STRUCTURE still shows
            # as text shape.
            text = ",".join(_seq_sql(node.projectList()))
            projs.append(f"proj:[{text}]")
        elif cls == "GenerateExec":
            projs.append(
                f"gen:[{_norm_sql(node.generator().sql())}]:{node.outer()}"
            )
        elif cls == "ExpandExec":
            ps = node.projections()
            rows = "; ".join(
                ",".join(_seq_sql(ps.apply(i))) for i in range(ps.size())
            )
            projs.append(f"expand:{ps.size()}:[{rows}]")
        elif cls in (
            "CollectLimitExec",
            "GlobalLimitExec",
            "LocalLimitExec",
        ):
            projs.append(f"limit:{cls[:-4]}:{node.limit()}")
    return sorted(conds), sorted(aggs), sorted(wins), sorted(projs)


def pinned_names() -> list[str]:
    from discogs_etl_spark.registry import all_specs

    specs = all_specs()
    names = [n for n, s in specs.items() if s.bench]
    names += [
        n
        for n in SCALE_KILLERS + SCALE_STORY + EXPENSIVE_TAIL + API_SURFACE
        if n not in names
    ]
    return sorted(names)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", help="comma-separated query names")
    ap.add_argument(
        "--pins",
        action="store_true",
        help="print a ready-to-paste PLAN_PINS dict body",
    )
    args = ap.parse_args()

    from discogs_etl_spark.registry import all_specs
    from discogs_etl_spark.session import get_spark

    # EXACTLY the suite's session shape (tests/conftest.py): the pins
    # are statements about this condition.
    spark = get_spark(
        app_name="plan-fingerprint", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    names = (
        [n.strip() for n in args.only.split(",") if n.strip()]
        if args.only
        else pinned_names()
    )
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    for name in names:
        fp = fingerprint(specs[name].fn(spark, args.sf))
        if args.pins:
            body = ", ".join(f'"{k}": {v}' for k, v in fp.items() if v)
            print(f'    "{name}": {{{body}}},')
        else:
            print(name, fp, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

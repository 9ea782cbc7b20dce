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

    {"scan_parquet": 1, "scan_rdd": 0, "local_scan": 0,
     "bhj": 2, "smj": 0, "shj": 0, "bnlj": 0, "cartesian": 0}

* ``scan_parquet`` — FileScan count: a query that promises "one corpus
  scan" must not silently grow a second scan branch; a checkpointed
  iteration (pc1 / pc1_gram) must show ZERO parquet scans in its
  returned plan, else the fold is no longer physically real (the r9
  lesson: Catalyst re-derives subtrees from the scan unless the
  materialization actually happened).
* ``bhj``/``smj``/``shj`` — join strategies on named joins: a dimension
  join that loses its broadcast (hint dropped, threshold misread)
  flips bhj -> smj deterministically at the pinned sf/session.
* ``bnlj``/``cartesian`` — always pinned, almost always to zero; the
  only nonzero pins are the deliberate broadcast-hinted crossJoins
  (kmeans centroid assignment and friends), which
  test_every_crossjoin_is_broadcast_hinted separately proves are
  hinted.

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
import contextlib
import io
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
)

# Node-name extraction from the formatted tree section.  Tree lines look
# like "   +- * BroadcastHashJoin Inner BuildRight (14)" or
# "ShuffleQueryStage (7), Statistics(...)"; the name is the leading
# word run (letters/digits/spaces, e.g. "Scan parquet") before the
# node-id parenthesis or the first detail token.
_NODE_RE = re.compile(r"^[\s+:|-]*(?:\* )?([A-Za-z][A-Za-z0-9]*(?: [A-Za-z][A-Za-z0-9]*)?)")

_KEYS = {
    "Scan parquet": "scan_parquet",
    "Scan ExistingRDD": "scan_rdd",
    "LocalTableScan": "local_scan",
    "BroadcastHashJoin": "bhj",
    "SortMergeJoin": "smj",
    "ShuffledHashJoin": "shj",
    "BroadcastNestedLoopJoin": "bnlj",
    "CartesianProduct": "cartesian",
}


def _main_tree(df) -> str:
    """The formatted explain's main TREE section, unsliced."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("\n\n", 1)[0]


def final_plan_tree(df) -> str:
    """The formatted explain TREE of the plan that actually ran,
    sliced to the OUTERMOST final section.

    The caller must have run an action on this very DataFrame first
    (``df.collect()``): only then does AdaptiveSparkPlan print
    ``== Final Plan ==`` with the runtime-replanned tree.  SCOPE: the
    slice runs from the first Final marker to the first Initial marker
    — when a CACHED inner relation's plan is expanded inline (its own
    nested marker pair), the slice ends at the nested boundary, so the
    fingerprint covers the outer structure only.  That truncation is
    made explicit and PINNED via fingerprint()'s ``nested_adaptive``
    key: a pinned query that starts (or stops) caching changes its pin
    loudly instead of silently shifting what the other counts mean.  (A
    duplication-free full executed view would require walking the plan
    OBJECT — both explain("formatted") and the JVM treeString print
    every adaptive subtree twice as Final/Initial pairs.)
    """
    tree = _main_tree(df)
    if "== Final Plan ==" in tree:
        tree = tree.split("== Final Plan ==", 1)[1]
        tree = tree.split("== Initial Plan ==", 1)[0]
    return tree


def fingerprint(df, *, executed: bool = True) -> dict[str, int]:
    """Normalized node counts of the (executed) physical plan, plus
    ``nested_adaptive``: how many ADDITIONAL adaptive subtrees (cached
    inner relations) the main tree carries beyond the outer one — the
    explicit marker that the node counts cover the outer slice only
    (see final_plan_tree)."""
    if executed:
        df.collect()
    counts = dict.fromkeys(_KEYS.values(), 0)
    counts["nested_adaptive"] = max(
        0, _main_tree(df).count("== Final Plan ==") - 1
    )
    for line in final_plan_tree(df).splitlines():
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1).strip()
        # two-word names first ("Scan parquet" / "Scan ExistingRDD"),
        # then the bare first word ("BroadcastHashJoin Inner" -> join)
        key = _KEYS.get(name)
        if key is None and " " in name:
            key = _KEYS.get(name.split(" ", 1)[0])
        if key is not None:
            counts[key] += 1
    return counts


def nested_loop_conditions(df) -> list[str]:
    """The join condition of every BroadcastNestedLoopJoin /
    CartesianProduct node in the STATIC physical plan ("None" for a
    pure cross product).

    The discriminator the full-registry sweep keys on: a condition-less
    Cross nested loop is the deliberate broadcast-hinted scalar
    crossJoin pattern (every source-level crossJoin is hint-checked by
    test_every_crossjoin_is_broadcast_hinted), while a nested loop WITH
    a condition is a real join Catalyst could not plan as a hash join —
    the r10 recsys_holdout_hitrate bug class (an OR-of-equalities
    condition nested-looping), unless it is a documented non-equi band
    join.

    Reads ``queryExecution().sparkPlan()`` — the pre-AQE physical plan —
    NOT the formatted explain: once any AQE stage materializes, the
    formatted output duplicates each adaptive subtree as a
    == Final Plan == / == Initial Plan == pair (and a BUILDER's internal
    actions can pre-materialize cached stages, so even a never-collected
    DataFrame prints pairs — nested, with sibling cached plans
    restarting indentation, which defeats textual region-slicing; two
    review passes each found a leak in a regex approach).  sparkPlan has
    no adaptive duplication by construction and is cache-state-immune.
    Nested-loop selection is a static Catalyst decision, so pre-AQE is
    also the semantically right tree for the sweep.  Scope: plans of
    CACHED relations and scalar subqueries are not expanded by
    treeString — acceptable because cache() wraps inputs, not joins, in
    this codebase, and the r12 formatted-explain cross-check found every
    registry nested loop in a main tree.
    """
    tree = df._jdf.queryExecution().sparkPlan().treeString()
    out = []
    for line in tree.splitlines():
        node = line.lstrip(" :+-*")
        if not node.startswith(("BroadcastNestedLoopJoin", "CartesianProduct")):
            continue
        # "BroadcastNestedLoopJoin BuildSide, JoinType[, condition]" —
        # the condition is the third comma field (maxsplit keeps a
        # comma-bearing expression whole); "CartesianProduct [condition]".
        if node.startswith("BroadcastNestedLoopJoin"):
            parts = node.split(", ", 2)
            cond = parts[2].strip() if len(parts) > 2 else "None"
        else:
            cond = node[len("CartesianProduct"):].strip() or "None"
        out.append(cond)
    return out


def pinned_names() -> list[str]:
    from discogs_etl_spark.registry import all_specs

    specs = all_specs()
    names = [n for n, s in specs.items() if s.bench]
    names += [n for n in SCALE_KILLERS + SCALE_STORY if n not in names]
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

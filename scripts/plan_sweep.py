#!/usr/bin/env python
"""Full-registry conditioned-nested-loop audit — the r10 bug class,
swept everywhere, every round.

tests/test_plans.py's fingerprint gate pins EXECUTED plans for the
headline set, and test_every_crossjoin_is_broadcast_hinted proves every
SOURCE-level crossJoin is broadcast-hinted — but a nested-loop join can
enter a plan with no crossJoin anywhere in the source: an
OR-of-equalities join condition (the r10 recsys_holdout_hitrate bug,
111 s at sf0.1 until rewritten as a union of two hash equi-joins), a
non-equi band predicate, any condition Catalyst cannot decompose into
hash-join keys.  This script builds EVERY registered query's plan and
classifies each BroadcastNestedLoopJoin / CartesianProduct node by its
join condition:

* ``Join condition: None`` (a pure Cross) — the deliberate
  broadcast-hinted scalar-aggregate crossJoin pattern; benign (83
  nodes across 47 queries as of r13), counted and identified by
  subtree leaf sources but never flagged here — growth and
  substitution are plansweep_compare's round-over-round job.
* a REAL condition — a join that nested-loops per left row; flagged
  unless the query is in the audited ALLOWED set below with a written
  size bound.

    python scripts/plan_sweep.py [--sf /root/testdata/sf0.001]
                                 [--json out.json]

Initial (pre-AQE) plans: nested-loop selection is a static Catalyst
decision visible before runtime replanning, and not executing the final
DataFrame keeps the sweep cheap (builders with internal driver actions —
iterative graph queries, streaming drains — still pay those; the full
registry takes a few minutes at sf0.001).  Exit 1 iff an UNAUDITED
conditioned nested loop (or a build error) appears: the fix is a plan
rewrite (decompose the OR into a union of equi-joins, block or bucket
the band join) — an ALLOWED entry is only for a build side with a
written O(1)/tiny bound.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Audited conditioned nested loops: name -> (max allowed count, why the
# build side is bounded).  "It was green" is not a reason.  Audit basis
# (r12, first sweep): source inspection of every join below + its
# TIMINGS_r11 sf0.1 wall; four bound classes appear —
#   scalar:    the broadcast side is a 1-row/tiny aggregate (a threshold,
#              a max date, bin edges) and the "condition" is a filter
#              Catalyst folded into the join
#   fixed:     the broadcast side is a fixed-size slice (anchor set,
#              query set) independent of corpus size
#   calendar:  a self-join over a day/week rollup bounded by the time
#              span, not the corpus (pairs grow with years^2, not rows)
#   baseline:  the two DOCUMENTED all-pairs exactness baselines
#              (timing_compare.BASELINE_TAIL; weak_count=2)
ALLOWED: dict[str, tuple[int, str]] = {
    "join_range_band_pricing": (
        1,
        "DOCUMENTED non-equi band lookup: broadcast side is the 4-row "
        "price-band table (test_range_band_pricing_is_deliberate_bnlj "
        "pins exactly this shape)",
    ),
    "contrastive_pair_mining": (1, "fixed: broadcast mini-batch anchor set"),
    "dedup_embedding_cosine": (
        1,
        "baseline: the deliberate all-pairs exact-cosine ground truth "
        "(BASELINE_TAIL; bucketed twin dedup_embedding_bucketed is the "
        "production path)",
    ),
    "embedding_triplet_check": (
        1,
        "fixed: positive/negative selection joins against a fixed anchor "
        "slice (0.6 s at sf0.1)",
    ),
    "q11_important_stock": (1, "scalar: 1-row value-share threshold"),
    "q22_global_sales_opportunity": (1, "scalar: 1-row avg-acctbal threshold"),
    "sample_balance_classes": (1, "scalar: 1-row min-class-size m"),
    "similarity_ann_multiprobe_recall": (
        1,
        "fixed: broadcast query set, self-exclusion filter in-condition",
    ),
    "similarity_ann_recall": (1, "fixed: broadcast query set, self-exclusion"),
    "similarity_int8_recall": (2, "fixed: broadcast query set, self-exclusion"),
    "similarity_ivf_topk": (1, "fixed: broadcast query set, self-exclusion"),
    "similarity_matryoshka_recall": (
        2,
        "fixed: broadcast query set, self-exclusion",
    ),
    "similarity_topk_bruteforce": (
        1,
        "fixed: broadcast query set, self-exclusion",
    ),
    "stats_psi_value_drift": (2, "scalar: broadcast decile-edge table, once per compared side"),
    "stats_survival_km_repurchase": (
        1,
        "scalar: broadcast 1-row censoring max-date; the condition is the "
        "folded event/censor CASE filter",
    ),
    "stats_theil_sen_trend": (
        1,
        "calendar: pairwise slopes over the per-user DAILY rollup — pair "
        "count grows with span^2, not corpus rows (the Theil-Sen "
        "estimator is pairwise by definition)",
    ),
    "text_search_bm25_pruned_recall": (
        2,
        "scalar: broadcast 1-row median document frequency",
    ),
    "text_search_bm25_pruned_topk": (
        2,
        "scalar: broadcast 1-row median document frequency (index build "
        "and query-side reuse)",
    ),
    "users_activity_bitmask": (1, "scalar: broadcast 1-row epoch day d0"),
    "whale_retention_jaccard": (
        1,
        "calendar: week x later-week pairs over the weekly whale rollup — "
        "bounded by span^2 weeks",
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--json",
        help="dump {name: {cross: n, cross_leaves: [[leaf, ...], ...], "
        "cross_shapes: [[[leaf, ...], [cls:count, ...]], ...], "
        "conditioned: [cond, ...], conditioned_leaves: [[cond, "
        "[leaf, ...]], ...], conditioned_shapes: [[cond, [leaf, ...], "
        "[cls:count, ...]], ...]}} for every query with any "
        "nested-loop node, plus _allowed (the ALLOWED snapshot) and "
        "_errors (build-errored names) metadata keys",
    )
    args = ap.parse_args()

    pf_spec = importlib.util.spec_from_file_location(
        "plan_fingerprint",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_fingerprint.py"),
    )
    pf = importlib.util.module_from_spec(pf_spec)
    pf_spec.loader.exec_module(pf)

    from discogs_etl_spark.registry import all_specs
    from discogs_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    res: dict[str, dict] = {}
    offenders: list[str] = []
    errors: list[str] = []
    # Expression-text capture for the PLAN_PINS gate set (r15 task #5):
    # Filter conditions and hash-join key sets/residuals, the surface
    # the nested-loop fields are blind to.  Bounded to the pinned
    # queries — the plans whose shape is already pinned — and carried
    # as artifact metadata so per-query entries keep their
    # nodes-present invariant.
    pinned = set(pf.pinned_names())
    pinned_conditions: dict[str, list[str]] = {}
    # Aggregate-expression capture (r17, closing r16 verdict residual
    # #5): grouping keys + aggregate expressions for the same pinned
    # set, diffed by plansweep_compare under the "pinned_agg" kind.
    pinned_aggregates: dict[str, list[str]] = {}
    # Window/sort/top-k capture (r17, same residual): diffed under
    # "pinned_window".
    pinned_windows: dict[str, list[str]] = {}
    # Project/Generate/Expand/bare-limit capture (r17, closing the
    # residual's remainder): diffed under "pinned_proj".
    pinned_projections: dict[str, list[str]] = {}
    n_cross = 0
    for i, (name, spec) in enumerate(sorted(specs.items()), 1):
        try:
            df = spec.fn(spark, args.sf)
            nodes = pf.nested_loop_nodes(df)
            if name in pinned:
                # one walk for all three captures — iter_physical_nodes
                # is py4j-roundtrip-heavy
                (
                    pinned_conditions[name],
                    pinned_aggregates[name],
                    pinned_windows[name],
                    pinned_projections[name],
                ) = pf.pinned_captures(df)
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            errors.append(name)
            print(f"[{i}/{len(specs)}] {name}: ERROR {type(ex).__name__}", flush=True)
            continue
        if not nodes:
            continue
        conditioned = [n["cond"] for n in nodes if n["cond"] != "None"]
        # cross_leaves: each condition-less node's sorted leaf-source
        # descriptors — the identity the bare count lacks, so
        # plansweep_compare can see a scalar cross swapped for a
        # data-sized one at the SAME count (r13 review).
        cross_leaves = sorted(
            n["leaves"] for n in nodes if n["cond"] == "None"
        )
        # conditioned_leaves: [condition, leaves] pairs — condition
        # TEXT alone is the conditioned class's identity for the
        # compare gate, but the text survives a build-side source swap
        # when column names match, so the leaves travel with it (same
        # rationale as cross_leaves, uniform across both classes).
        conditioned_leaves = sorted(
            [n["cond"], n["leaves"]] for n in nodes if n["cond"] != "None"
        )
        # *_shapes: the r13 residual's closure (verdict r13 task #2) —
        # each node's [leaves, shape] pair ([cond, leaves, shape] for
        # the conditioned class), where shape is the subtree's
        # node-class multiset.  A substitution preserving count AND
        # exact leaf sets still moves the operators BETWEEN the leaves
        # and the nested loop, so it flags here.  Leaves travel INSIDE
        # the pair (not a parallel sorted list) so the leaves<->shape
        # pairing survives sorting.
        cross_shapes = sorted(
            [n["leaves"], n["shape"]] for n in nodes if n["cond"] == "None"
        )
        conditioned_shapes = sorted(
            [n["cond"], n["leaves"], n["shape"]]
            for n in nodes
            if n["cond"] != "None"
        )
        res[name] = {
            "cross": len(cross_leaves),
            "cross_leaves": cross_leaves,
            "cross_shapes": cross_shapes,
            "conditioned": conditioned,
            "conditioned_leaves": conditioned_leaves,
            "conditioned_shapes": conditioned_shapes,
        }
        n_cross += res[name]["cross"]
        cap = ALLOWED.get(name, (0, ""))[0]
        if len(conditioned) > cap:
            offenders.append(name)
            print(
                f"[{i}/{len(specs)}] {name}: UNAUDITED conditioned nested "
                f"loop (allowed={cap}): {conditioned}",
                flush=True,
            )
        elif conditioned:
            print(
                f"[{i}/{len(specs)}] {name}: ok ({len(conditioned)} audited "
                "conditioned nested loop)",
                flush=True,
            )

    # Stale-allowance audit (r12 ADVICE): an ALLOWED entry whose
    # conditioned nested loop has disappeared (the query was rewritten
    # onto hash joins) must be PRUNED the round the plan improves —
    # otherwise a future reintroduction of a conditioned nested loop in
    # that query would pass silently under the lingering allowance.
    # A query that ERRORED was never observed — its allowance is not
    # stale, and pruning it on an error would delete a live audit entry
    # (the error itself already fails the sweep).
    unused = sorted(
        name
        for name in ALLOWED
        if name not in errors and not res.get(name, {}).get("conditioned")
    )

    if args.json:
        # "_allowed" is metadata (underscore-prefixed like TIMINGS'
        # _loadavg stamp — every consumer skips "_" keys): the ALLOWED
        # membership snapshot at sweep time, so plansweep_compare can
        # detect names entering/leaving the audited set across rounds
        # even though the list itself lives in code, not artifacts.
        dump = dict(res)
        dump["_allowed"] = sorted(ALLOWED)
        # Errored names are ABSENT from res, which an artifact consumer
        # cannot tell apart from "no nested-loop nodes" — record them so
        # the suite's stale-allowance test and plansweep_compare's
        # DISAPPEARED flag never instruct pruning a live audit entry
        # over a build error (r13 review; the sweep's own exit status
        # already fails on errors, this keeps the artifact honest too).
        dump["_errors"] = sorted(errors)
        # Expression texts for the PLAN_PINS gate set (r15 task #5):
        # plansweep_compare diffs these per name under the
        # "pinned_cond" ack kind, closing the non-nested-loop
        # expression blindness on exactly the pinned plans.
        dump["_pinned_conditions"] = {
            k: v for k, v in sorted(pinned_conditions.items())
        }
        # Aggregate expression texts for the same pinned set (r17) —
        # diffed under the "pinned_agg" ack kind.
        dump["_pinned_aggregates"] = {
            k: v for k, v in sorted(pinned_aggregates.items())
        }
        # Window/sort/top-k texts for the same pinned set (r17) —
        # diffed under the "pinned_window" ack kind.
        dump["_pinned_windows"] = {
            k: v for k, v in sorted(pinned_windows.items())
        }
        # Project/Generate/Expand/bare-limit texts (r17) — diffed
        # under the "pinned_proj" ack kind.
        dump["_pinned_projections"] = {
            k: v for k, v in sorted(pinned_projections.items())
        }
        with open(args.json, "w") as fh:
            json.dump(dump, fh, indent=1, sort_keys=True)
    print(
        f"\nPLAN SWEEP: {len(specs)} plans; {len(res)} queries carry "
        f"nested-loop nodes ({n_cross} condition-less hinted crosses, "
        f"{sum(len(v['conditioned']) for v in res.values())} conditioned — "
        f"all audited: {not offenders}); {len(errors)} build errors; "
        f"{len(unused)} stale allowances"
    )
    for name in offenders:
        print(f"UNAUDITED {name}")
    for name in errors:
        print(f"ERROR {name}")
    for name in unused:
        print(f"STALE ALLOWANCE {name}: no conditioned nested loop observed — prune it")
    return 1 if (offenders or errors or unused) else 0


if __name__ == "__main__":
    raise SystemExit(main())

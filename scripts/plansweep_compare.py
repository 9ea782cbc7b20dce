#!/usr/bin/env python
"""Round-over-round plan-shape gate over PLANSWEEP_r{N}.json.

plan_sweep.py audits every registered query's nested-loop nodes against
a static ALLOWED list — but a static list cannot catch a benign
audited shape GROWING under the same query name (a 1-row scalar cross
becoming a data-sized nested loop is invisible as long as the name
stays in ALLOWED and the node count stays under its cap, and even the
count can legitimately be >1).  This gate makes the sweep round-over-
round comparable, the way timing_compare made the timing sweep a gate:
every round commits `scripts/plan_sweep.py --json PLANSWEEP_r{N}.json`
on final code, and this script diffs the two newest artifacts.

    python scripts/plansweep_compare.py [--prev PLANSWEEP_rA.json]
                                        [--cur PLANSWEEP_rB.json]

Fails (exit 1) on:

* a NEW conditioned nested-loop node — a query's conditioned count
  grew vs the prior round (including a query with no prior nested-loop
  nodes at all);
* a CHANGED condition-less cross count or cross BUILD COMPOSITION —
  plan_sweep treats pure crosses as the benign broadcast-hinted scalar
  pattern and never flags them, and PLAN_PINS covers only the gate
  set, so this compare is where a hash join constant-folding into a
  CartesianProduct, a scalar cross getting re-derived, or a scalar
  cross being SWAPPED for a data-sized one at the same count reddens
  for the other ~330 queries.  Each cross's identity is its subtree's
  leaf-source descriptors (``cross_leaves``) AND its subtree
  node-class multiset plus ordered skeleton (``cross_shapes`` — leaves
  paired with shape so the pairing survives sorting): a substitution
  preserving both the count and the exact leaf sets still moves the
  operators BETWEEN the leaves and the cross, closing the r13 residual
  (verdict r13 #2), and the skeleton entry closes the multiset's own
  blind spot (r14 review) — a multiset-preserving rearrangement such
  as an operator moved between the build and stream sides.  Remaining
  documented residual: expression text inside non-nested-loop
  operators is not compared (condition text is compared only on the
  nested-loop nodes themselves);
* a DISAPPEARED conditioned nested loop — the count shrank, which is
  an improvement but one that must be adjudicated so the matching
  ALLOWED allowance is pruned/lowered the same round (plan_sweep's
  stale-allowance check catches count->0 for ALLOWED names; this
  catches partial decreases too);
* CHANGED condition text — same count, different join condition.
  Conditions are emitted via ``Expression.sql()`` (expr-id-free, so
  the diff is meaningful, not session noise) — and because identical
  text survives a build-side source swap when column names match, the
  conditioned class also carries leaf identity (``conditioned_leaves``)
  plus the subtree shape (``conditioned_shapes``) and flags a
  composition change under unchanged text;
* ALLOWED-membership change — a name entering or leaving the audited
  list between the two artifacts' ``_allowed`` snapshots (the list
  lives in code; the snapshot makes its history visible in artifacts);
* a conditioned name in the current artifact that is missing from its
  own ``_allowed`` snapshot (plan_sweep itself also fails this; the
  re-check means a hand-edited artifact cannot sneak past the gate).

Deliberate changes are acknowledged in ADJUDICATED below, keyed by the
CURRENT round number so an acknowledgment can never linger past the
round it describes (the stale-allowance lesson, applied to the gate
itself) — and, within a round, by ``(query_name, flag_kind)`` so
acknowledging one deliberate change cannot mask an unrelated
concurrent change in the same query (r13 ADVICE: a name-keyed ack
suppressed every flag class at once).  Each entry carries the
rationale the commit message must repeat.
tests/test_plansweep_gate.py runs this comparison over the two newest
committed artifacts, so a silent Catalyst strategy change anywhere in
the 369-query registry reddens the suite, not just a judge's
spot-check.

Metadata keys (underscore-prefixed, e.g. ``_allowed``) are skipped as
query names, mirroring TIMINGS' ``_loadavg_end`` convention.
"""

from __future__ import annotations

import argparse
import importlib.util
from collections import Counter
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Artifact discovery is timing_compare's (one parser for every
# per-round {PREFIX}_r{N}.json family — imported, not mirrored).
_tc_spec = importlib.util.spec_from_file_location(
    "timing_compare", Path(__file__).resolve().parent / "timing_compare.py"
)
_tc = importlib.util.module_from_spec(_tc_spec)
_tc_spec.loader.exec_module(_tc)

# Acknowledged deliberate plan-shape changes: {cur_round: {(query_name,
# flag_kind): rationale}}.  An entry suppresses EXACTLY ONE flag class
# for that name in exactly one round-pair comparison (prev=cur_round-1
# -> cur=cur_round); the NEXT round's comparison sees the new shape on
# both sides and needs no entry, so the dict is self-expiring.  Keying
# by kind (r13 ADVICE) means adjudicating, say, a deliberate cross-count
# change cannot also mask a concurrent condition-text change in the
# same query.  Kinds: "new" / "disappeared" / "cond_text" /
# "cond_composition" / "cross_count" / "cross_composition" /
# "allowed_left" / "allowed_entered".  The schema-regression flag (a
# current artifact DROPPING a leaf/shape field) is deliberately NOT
# acknowledgeable — that is artifact integrity, not a plan change.
# "It was green" is not a rationale; cite the commit that changed the
# plan.
# Shared rationale fragment for the round-18 optimization rewrites —
# every entry below cites it plus the query-specific delta.  The round's
# full measurement evidence (before/after bench seconds, plan dumps,
# exact-oracle re-verification at sf0.001/0.01/0.1) is in
# OPTIMIZATION_r18.md and plans/r18/.
_R18_OPT = (
    "r18 OPTIMIZATION round rewrite (OPTIMIZATION_r18.md): plan "
    "restructured for performance with values PROVEN unchanged — "
    "exact-oracle match re-verified at all three fixture sfs. "
)

ADJUDICATED: dict[int, dict[tuple[str, str], str]] = {
    18: {
        ("events_littles_law_report", "cross_composition"): (
            _R18_OPT
            + "The sessionization bounds this query derives from are now "
            "materialized once (sessions_max_concurrency's r18 "
            "localCheckpoint), so the scalar cross's build subtree reads "
            "the checkpoint RDD instead of re-deriving the events scan — "
            "same 1-row broadcast attach, sources parquet→rdd."
        ),
        ("kmeans_embeddings_fixed", "cross_composition"): (
            _R18_OPT
            + "Lloyd assignment is now a MAP-ONLY broadcast-centroid-array "
            "argmin: the k-row centroid cross became a 1-row "
            "collect_list(struct(cid, cv)) cross, deleting the per-round "
            "corpus×k window shuffle (window/sort/filter nodes gone from "
            "every cross build subtree).  2.354 → 1.714 s benched."
        ),
        **{
            ("kmeans_embeddings_fixed", kind): (
                _R18_OPT
                + "Same map-only argmin rewrite: the per-__id row_number "
                "window and its __rn=1 filter no longer exist; the new "
                "captures are the 1-row centroid collect_list aggregate "
                "and the array_min(transform(...)) argmin projections."
            )
            for kind in ("pinned_cond", "pinned_agg", "pinned_window", "pinned_proj")
        },
        **{
            ("lm_bigram_surprisal", kind): (
                _R18_OPT
                + "The bigram-instance pass now runs ONCE (checkpointed "
                "per-doc counts; the LM derives from them — bigram's "
                "prefix recovers w1) and the context totals come from a "
                "w1-window instead of a second aggregation + join: the "
                "(w1, bigram) aggregates, the w1 join and the 3 documents "
                "scans left the plan.  2.131 → 1.328 s benched."
            )
            for kind in ("pinned_cond", "pinned_agg", "pinned_window", "pinned_proj")
        },
        **{
            ("sessions_max_concurrency", kind): (
                _R18_OPT
                + "Session bounds are materialized once (localCheckpoint) "
                "so the sessionization windows and the events scan run 1x "
                "instead of 3x; the sweep/carry branches now read the "
                "checkpoint and the window/agg captures moved inside the "
                "checkpoint build.  1.075 → 0.805 s benched."
            )
            for kind in ("pinned_agg", "pinned_window", "pinned_proj")
        },
        **{
            ("feature_hashing_vectorize", kind): (
                _R18_OPT
                + "The (doc, term) pre-count aggregation and its exchange "
                "are gone: Σ±cnt over term groups equals Σ±1 over raw "
                "token instances, so ONE (doc, idx) aggregation partial-"
                "aggregates straight off the explode (md5 staged behind a "
                "projection, evaluated once per instance)."
            )
            for kind in ("pinned_agg", "pinned_proj")
        },
        **{
            ("graph_pagerank_coorder", kind): (
                _R18_OPT
                + "The eager edge materialization was dropped (the union "
                "over the memoized oriented checkpoint is narrow) and the "
                "node-sized degree table is checkpointed instead, making "
                "the node count metadata-cheap; the degree aggregate "
                "moved inside the checkpoint build and the src "
                "repartition sort surfaces.  2.958 → 2.387 s benched."
            )
            for kind in ("pinned_agg", "pinned_window")
        },
        **{
            (n, "pinned_proj"): (
                _R18_OPT
                + "BM25 scoring now accumulates int64 micros instead of a "
                "DECIMAL(28,6) buffer (bm25_contribution_micros — the "
                "_util.fixed idiom; A/B-verified bit-equal over every "
                "contribution at all three sfs): the captured scoring "
                "projection carries round(raw·1e6) AS BIGINT and the "
                "finalizer divides the summed micros back to the double "
                "score.  Scoring aggregate measured 4.39 → 2.85 s."
            )
            for n in (
                "text_search_bm25_topk",
                "text_search_bm25_pruned_topk",
                "curation_search_corpus",
            )
        },
        ("dedup_embedding_cosine", "cond_text"): (
            _R18_OPT
            + "Batch-3 per-pair tuning (commit: cosine-family unroll): the "
            "pair predicate's 3 interpreted aggregate-fold dot products "
            "became ONE unrolled left-associated Add chain over hoisted "
            "per-vector norms (na*nb), and the cheap vec_a<vec_b conjunct "
            "now leads so the dot short-circuits for the mirrored half. "
            "Same 0.0 seed, same per-element products, same in-order "
            "accumulation → bit-identical doubles (A/B 0 divergences over "
            "every pair at sf0.1).  83.7 → ~9 s isolated."
        ),
        ("dedup_embedding_cosine", "cond_composition"): (
            _R18_OPT
            + "Same rewrite: each BNLJ input gained one Project computing "
            "the hoisted sqrt-dot norm per vector (ProjectExec 2→4 in the "
            "build subtree); sources and join node unchanged."
        ),
        **{
            ("dedup_embedding_bucketed", kind): (
                _R18_OPT
                + "Norms hoisted to one sqrt-dot per VECTOR (new na/nb "
                "projections below the bucket join) and the residual "
                "condition reordered cheap-conjunct-first with the dot "
                "over na*nb — bit-identical cosine doubles; the dot "
                "stays the fold (within-bucket pair count too small to "
                "amortize an unrolled chain's compile cost)."
            )
            for kind in ("pinned_cond", "pinned_proj")
        },
        **{
            ("dedup_semdedup", kind): (
                _R18_OPT
                + "Batch-3 per-pair tuning: norm hoisted to one unrolled "
                "sqrt-dot per vector on the corpus-sized v (before both "
                "pair sides), unrolled in-order dot over nra*nrb in the "
                "within-cluster residual, cheap conjuncts first — "
                "bit-identical cosine doubles (oracle-exact at all three "
                "sfs).  12.2 → 7.0 s isolated."
            )
            for kind in ("pinned_cond", "pinned_proj")
        },
        **{
            ("dedup_doc_duplication_score", kind): (
                _R18_OPT
                + "Batch-2 rewrite (landed in commit 3c9fb3f; sweep "
                "artifact lagged it — this entry closes the lag): the "
                "corpus-sized 48-char window stream is generated ONCE, "
                "(w, doc_id) aggregation compacts windows to per-doc "
                "multiplicities map-side, a w-partitioned count window "
                "marks nd≥2 on the same shuffle layout, and the per-doc "
                "rollup sums multiplicities — the duplicate-set branch, "
                "its membership join and the second explode left the "
                "plan.  Σk integers identical; oracle-exact at both "
                "verification sfs.  7.56 → 6.05 s isolated."
            )
            for kind in (
                "pinned_cond",
                "pinned_agg",
                "pinned_window",
                "pinned_proj",
            )
        },
        **{
            ("pricing_consistency_audit", kind): (
                _R18_OPT
                + "Batch-2 rewrite (landed in commit 3c9fb3f; sweep "
                "artifact lagged it — this entry closes the lag): the "
                "three scalar percentile(ratio, q) aggregates became ONE "
                "percentile(ratio, array(0.5, 0.01, 0.99)) buffer and a "
                "finalizing projection reads the three quantiles from "
                "the array — identical interpolation, identical doubles "
                "(values equal: True).  12.38 → 2.96 s isolated."
            )
            for kind in ("pinned_agg", "pinned_proj")
        },
        ("stats_theil_sen_trend", "cond_composition"): (
            _R18_OPT
            + "Batch-5: `daily` is localCheckpoint-ed, so both pair-join "
            "sides of the (b.d > a.d) BNLJ read the checkpoint RDD "
            "instead of re-deriving the orders aggregation (sources "
            "parquet→rdd; the .count() action stopped re-running the "
            "aggregation too).  13.8 → ~4 s isolated."
        ),
        **{
            ("stats_theil_sen_trend", kind): (
                _R18_OPT
                + "Batch-5: the median is now sort+rank — a global-order "
                "row_number/count window and a min(CASE WHEN rk = "
                "floor/ceil(pos)+1) aggregate reproducing "
                "Percentile.getPercentile's interpolation VERBATIM "
                "(A/B bit-equal at all three sfs) — because the exact "
                "percentile buffer hashed ~2.9M mostly-unique doubles "
                "per partial (10-16 s of the query's 13.8 s).  The "
                "checkpoint also moved the datediff grouping captures "
                "inside the checkpoint build."
            )
            for kind in ("pinned_cond", "pinned_agg", "pinned_window", "pinned_proj")
        },
        **{
            ("fuzzy_join_levenshtein_blocked", kind): (
                _R18_OPT
                + "Batch-5: 3-arg banded levenshtein(a, b, 5) — computes "
                "only the |i−j| ≤ 5 diagonal band (O(k·n) per candidate "
                "pair instead of O(n²)) and returns the EXACT distance "
                "within the threshold, so every emitted pair and "
                "lev_dist is unchanged (A/B equal at sf0.01 + sf0.1); "
                "the ≤5 filter became lev >= 0 in the join residual.  "
                "7.5 → 0.8 s isolated."
            )
            for kind in ("pinned_cond", "pinned_proj")
        },
        **{
            ("backfill_audit_table", kind): (
                "ENTERED all four pinned expression-capture tiers by "
                "design (commit b4cb4a2, the r17-end mid-build commit "
                "that registered the query and pinned its API_SURFACE "
                "plan shape): the backfill CLI verb's audit composition "
                "is a driver-local results scan, and pinning its "
                "expressions makes a distributed join appearing in that "
                "plan redden the gate.  A NEW pin has no prev capture "
                "by definition — the r17 API_SURFACE precedent."
            )
            for kind in ("pinned_cond", "pinned_agg", "pinned_window", "pinned_proj")
        },
    },
    17: {
        ("curation_dedup_corpus", "cross_count"): (
            "query REGISTERED this round (commit f6b1059), so its prev "
            "count is vacuously 0: the one condition-less cross is the "
            "deliberate F.broadcast(report) one-row report attach — the "
            "same audited shape as r16's curation_dedup_media"
        ),
        ("curation_search_corpus", "cross_count"): (
            "query REGISTERED this round, so its prev count is vacuously "
            "0: the one condition-less cross is search_corpus's "
            "deliberate F.broadcast(stats) 1-row corpus-stats attach "
            "(curation.py) — the same audited shape as the registered "
            "BM25 queries that share bm25_contribution"
        ),
        ("curation_dedup_media_capped", "cross_count"): (
            "query REGISTERED this round (commit c1bab7f), so its prev "
            "count is vacuously 0: the one condition-less cross is the "
            "deliberate F.broadcast(report) one-row report attach — the "
            "same audited shape as r16's curation_dedup_media"
        ),
        ("dedup_minhash_capped_pairs", "pinned_cond"): (
            "ENTERED the pinned expression-capture set by design (commit "
            "3f1fe78, VERDICT r16 task #7): the LSH skew guards' width "
            "filter joins are now plan-pinned so a dropped filter reddens "
            "the plan gate — a NEW pin has no prev capture by definition"
        ),
        ("multimodal_phash_capped_pairs", "pinned_cond"): (
            "ENTERED the pinned expression-capture set by design (commit "
            "3f1fe78, VERDICT r16 task #7): same rationale as its MinHash "
            "twin — the n_hashes <= 16 width filter is now captured"
        ),
        **{
            (n, "pinned_cond"): (
                "ENTERED the pinned expression-capture set by design "
                "(r17 API_SURFACE tier): the user-facing curation API "
                "compositions are now plan-pinned end-to-end — their "
                "stages were already pinned, but a regression in the "
                "composition glue (a lost report broadcast, a "
                "re-shuffled survivor join, a dropped width filter at "
                "the API call site) was invisible to the stage pins.  "
                "A NEW pin has no prev capture by definition."
            )
            for n in (
                "curation_dedup_corpus",
                "curation_dedup_media",
                "curation_dedup_media_capped",
                "curation_search_corpus",
                "curation_profile_table",
            )
        },
    },
    16: {
        ("curation_dedup_media", "cross_count"): (
            "query REGISTERED this round (commit c007730), so its prev "
            "count is vacuously 0: the one condition-less cross is the "
            "deliberate F.broadcast(report) one-row report attach — a "
            "hinted broadcast nested loop over exactly one row, present "
            "in the sweep's _allowed snapshot and audited"
        ),
        **{
            (n, "pinned_cond"): (
                "capture FORMAT change, not a plan change: condition_texts "
                "records hash-join keys as jointly-sorted left=right pairs "
                "since commit 2d88b86 (r15 ADVICE #2 — independent key-list "
                "sorting missed re-paired join keys).  Verified mechanical "
                "before adjudicating: every r16 pinned text projected back "
                "to the r15 format compares byte-exact against "
                "PLANSWEEP_r15 across all 41 pinned names (16 identical, "
                "these 25 format-only, zero real diffs)."
            )
            for n in (
            "dedup_connected_components",
            "dedup_doc_duplication_score",
            "dedup_embedding_bucketed",
            "dedup_minhash_eval",
            "dedup_minhash_lsh",
            "dedup_semdedup",
            "embedding_power_iteration_pc1",
            "embedding_power_iteration_pc1_gram",
            "fuzzy_join_levenshtein_blocked",
            "graph_pagerank_coorder",
            "graph_triangle_count",
            "join_broadcast_part_agg",
            "join_skew_salted",
            "lm_bigram_surprisal",
            "multimodal_phash_dedup",
            "pricing_consistency_audit",
            "q3_shipping_priority",
            "q5_regional_revenue",
            "range_join_bucketed",
            "recsys_holdout_hitrate",
            "sessions_max_concurrency",
            "similarity_ivf_topk",
            "text_search_bm25_pruned_topk",
            "text_search_bm25_topk",
                "text_search_inverted_topk",
            )
        },
    },
    19: {
        # TWO adjudicated rewrites share these (name, kind) slots this
        # round, both in the exact set-similarity family
        # (dedup_ngram_jaccard / dedup_containment /
        # dedup_threshold_sweep and their compositions), both
        # oracle-exact at sf0.001/0.01/0.1 re-verified THIS round
        # (scripts/oracle_check.py, OPTIMIZATION_r19.md):
        # (1) the INHERITED r18 end-of-round size(shingles) rewrite
        #     (78e1ae9, landed after the last r18 sweep regen — the
        #     stale-artifact red tree the r18 verdict flagged as item
        #     1): the m-side per-doc explode+count became
        #     size(shingles), identical because shingles is
        #     array_distinct'ed and m only ever inner-joins pair docs.
        # (2) the r19 posting-pair rewrite (_posting_pair_counts): the
        #     exploded shingle SELF-JOIN (a.sh = b.sh AND doc_id <
        #     doc_id) became one collect_list per shingle + in-list
        #     position-ordered pair emission — the shingle subtree
        #     builds once, the join machinery leaves the plan, and the
        #     (doc_a, doc_b) count consumes map-side-emitted pairs.
        #     n_common is the identical multiset (sorted lists, i<j
        #     emission).
        ("dedup_threshold_sweep", "cross_composition"): (
            "size(shingles) + posting-pair rewrites: the scalar-marks "
            "cross's build subtree lost the m-side explode+aggregation "
            "and the shingle self-join (one documents-scan subtree and "
            "an ObjectHashAggregate posting-list pass instead of two "
            "scans feeding a hash join); same sources, same 4-row "
            "broadcast marks attach.  Oracle-exact at all three "
            "fixture sfs (r19 re-verification); 7.17 -> 3.64 s at "
            "sf0.1."
        ),
        **{
            ("dedup_minhash_eval", kind): (
                "size(shingles) + posting-pair rewrites propagating "
                "through the composed exact-jaccard pipeline (the "
                "per-doc count aggregates and the self-join's "
                "duplicated explode inputs left the plan; the new "
                "captures are the direct size(shingles) projections "
                "and the posting-list collect_list aggregate with its "
                "posexplode/slice pair emission), PLUS the minhash "
                "side now reading the shared per-session pair-graph "
                "checkpoint (minhash_pair_graph — the CC family's "
                "materialization) instead of re-running the signature "
                "pipeline.  Oracle-exact at all three fixture sfs "
                "(r19 re-verification); 4.88 -> ~2 s at sf0.1."
            )
            for kind in ("pinned_cond", "pinned_agg", "pinned_proj", "pinned_window")
        },
        # r19 half_up_long swap (OPTIMIZATION_r19.md §4): every
        # fixed-point HALF_UP rounding (the _util.fixed money idiom and
        # the BM25/LM scoring micros) now computes
        # sign(x)*floor(|x|+0.5) instead of F.round's per-row
        # BigDecimal — identical HALF_UP integers for |x| < 2^51
        # (proof in half_up_long's docstring), A/B-verified 0
        # divergences over every fixture money column and every
        # scoring contribution at all three sfs, full oracle suite
        # green (761 passed).  The pinned aggregate/projection TEXTS
        # change (round(...) -> CASE WHEN ... FLOOR(...)); node
        # structure is untouched.  Measured: Q1-shaped money
        # aggregation 1.54 -> 0.68 s, BM25 scoring projection 2.2 ->
        # 1.6 s at sf0.1.
        **{
            (n, "pinned_agg"): (
                "half_up_long swap — fixed-point HALF_UP via "
                "sign-aware floor, not Round's per-row BigDecimal; "
                "captured aggregate text only, values A/B-proven "
                "identical (see the r19 block comment above)."
            )
            for n in (
                "events_hourly_agg",
                "join_broadcast_part_agg",
                "join_skew_salted",
                "lm_bigram_surprisal",
                "q1_pricing_summary",
                "q3_shipping_priority",
                "q5_regional_revenue",
            )
        },
        **{
            (n, "pinned_proj"): (
                "half_up_long swap — same rewrite, captured projection "
                "text only (see the r19 block comment above)."
            )
            for n in (
                "curation_search_corpus",
                "graph_pagerank_coorder",
                "text_search_bm25_pruned_topk",
                "text_search_bm25_topk",
            )
        },
    },
}

# The flag kinds an ADJUDICATED entry may name (kept beside the dict so
# a typo'd kind is caught by the suite's validity test, not silently
# never matched).
ACK_KINDS = frozenset(
    {
        "new",
        "disappeared",
        "cond_text",
        "cond_composition",
        "cross_count",
        "cross_composition",
        "allowed_left",
        "allowed_entered",
        "pinned_cond",
        "pinned_agg",
        "pinned_window",
        "pinned_proj",
    }
)


def _conds(art: dict, name: str) -> list[str]:
    """Condition texts, derived from conditioned_leaves when the
    artifact carries it (one source of truth — a hand-edit desyncing
    the redundant 'conditioned' key then cannot show this gate a
    different set of texts than the leaves view), falling back to the
    bare 'conditioned' key for pre-r13 artifacts."""
    entry = art.get(name, {})
    pairs = entry.get("conditioned_leaves")
    if pairs is not None:
        return sorted(cond for cond, _leaves in pairs)
    return sorted(entry.get("conditioned", []))


def _cross(art: dict, name: str) -> int:
    return art.get(name, {}).get("cross", 0)


def _cross_leaves(art: dict, name: str):
    """Sorted leaf-descriptor lists of the condition-less crosses, or
    None when the artifact predates the field (pre-r13 schema)."""
    leaves = art.get(name, {}).get("cross_leaves")
    return sorted(map(tuple, leaves)) if leaves is not None else None


def _conditioned_leaves(art: dict, name: str):
    """Sorted (condition, leaves) pairs of the conditioned nested
    loops, or None when the artifact predates the field."""
    pairs = art.get(name, {}).get("conditioned_leaves")
    if pairs is None:
        return None
    return sorted((cond, tuple(leaves)) for cond, leaves in pairs)


def _cross_shapes(art: dict, name: str):
    """Sorted (leaves, shape) pairs of the condition-less crosses, or
    None when the artifact predates the field (pre-r14 schema)."""
    pairs = art.get(name, {}).get("cross_shapes")
    if pairs is None:
        return None
    return sorted((tuple(leaves), tuple(shape)) for leaves, shape in pairs)


def _conditioned_shapes(art: dict, name: str):
    """Sorted (condition, leaves, shape) triples of the conditioned
    nested loops, or None when the artifact predates the field."""
    triples = art.get(name, {}).get("conditioned_shapes")
    if triples is None:
        return None
    return sorted(
        (cond, tuple(leaves), tuple(shape)) for cond, leaves, shape in triples
    )


def compare_sweeps(
    prev: dict,
    cur: dict,
    acks: dict[tuple[str, str], str] | None = None,
) -> list[str]:
    """Human-readable gate violations (empty = pass).  ``acks`` is
    keyed by ``(query_name, flag_kind)`` — see ADJUDICATED/ACK_KINDS —
    so each acknowledgment suppresses exactly one flag class."""
    acks = acks or {}
    problems: list[str] = []
    prev_errors = set(prev.get("_errors", []))
    cur_errors = set(cur.get("_errors", []))
    # Errored names are ABSENT from the sweep's per-query entries, so
    # the name universe must include the error sets or an errored query
    # with no entry on either side would never reach the current-side
    # error flag below (third r13 review pass, confirmed by execution).
    names = sorted(
        k
        for k in set(prev) | set(cur) | prev_errors | cur_errors
        if not k.startswith("_")
    )
    for name in names:
        if name in cur_errors:
            # A committed artifact should never carry errors (the sweep
            # exits nonzero), but a hand-committed one must not read as
            # "this query's nested loops disappeared".
            problems.append(f"{name}: errored in current sweep — rerun it")
            continue
        if name in prev_errors:
            continue  # never observed last round: no basis to diff
        p, c = _conds(prev, name), _conds(cur, name)
        p_cross, c_cross = _cross(prev, name), _cross(cur, name)
        p_leaves, c_leaves = _cross_leaves(prev, name), _cross_leaves(cur, name)
        leaves_changed = (
            p_leaves is not None and c_leaves is not None and p_leaves != c_leaves
        )
        p_cl, c_cl = _conditioned_leaves(prev, name), _conditioned_leaves(cur, name)
        cond_leaves_changed = p_cl is not None and c_cl is not None and p_cl != c_cl
        p_cs, c_cs = _cross_shapes(prev, name), _cross_shapes(cur, name)
        shapes_changed = p_cs is not None and c_cs is not None and p_cs != c_cs
        p_cds, c_cds = _conditioned_shapes(prev, name), _conditioned_shapes(cur, name)
        cond_shapes_changed = (
            p_cds is not None and c_cds is not None and p_cds != c_cds
        )
        # Only the PREVIOUS side may legitimately predate the leaf/shape
        # schema (the r12/r13 bootstraps); a current entry missing a
        # field its predecessor carried is a generator regression or a
        # hand-edit that would otherwise silently disable the identity
        # gates for that query (fourth r13 review pass).
        schema_lost = [
            field
            for field, p_has, c_has in (
                ("cross_leaves", p_leaves is not None, c_leaves is not None),
                ("conditioned_leaves", p_cl is not None, c_cl is not None),
                ("cross_shapes", p_cs is not None, c_cs is not None),
                ("conditioned_shapes", p_cds is not None, c_cds is not None),
            )
            if p_has and not c_has and name in cur
        ]
        if schema_lost:
            problems.append(
                f"{name}: current artifact dropped {schema_lost} — "
                "generator regression or hand-edit; regenerate the sweep"
            )
            continue
        if len(c) > len(p) and (name, "new") not in acks:
            problems.append(
                f"{name}: NEW conditioned nested loop ({len(p)} -> {len(c)}): "
                f"{[x for x in c if x not in p] or c}"
            )
        elif len(c) < len(p) and (name, "disappeared") not in acks:
            problems.append(
                f"{name}: conditioned nested loop DISAPPEARED "
                f"({len(p)} -> {len(c)}) — prune/lower its ALLOWED "
                "allowance and adjudicate"
            )
        if len(c) != len(p):
            # A count-change ack must not mask a CONCURRENT change to
            # the surviving nodes (r14 review, confirmed by execution:
            # prev ['(a < b)', '(c < d)'] -> cur ['(a <= b)'] under a
            # 'disappeared' ack returned zero problems, silently
            # accepting the a<b -> a<=b rewrite).  Multiset surplus:
            # appeared+vanished beyond the count delta means something
            # ALSO changed in place, which carries its own flag kind.
            pc_t, cc_t = Counter(p), Counter(c)
            text_surplus = (
                sum((cc_t - pc_t).values()) + sum((pc_t - cc_t).values())
            ) - abs(len(c) - len(p))
            if text_surplus > 0 and (name, "cond_text") not in acks:
                problems.append(
                    f"{name}: condition text ALSO changed alongside the "
                    f"count change: {p} -> {c}"
                )
            # Composition surplus is checked INDEPENDENTLY of the text
            # comparison (r15 ADVICE: the elif let an acked cond_text
            # change mask a concurrent build-composition change).  When
            # the text multiset moved, the full (cond, leaves, shape)
            # triples differ trivially, so the basis drops to the
            # TEXT-STRIPPED (leaves, shape) pairs — a same-sources text
            # rewrite stays a pure cond_text flag while a concurrent
            # source/shape swap still carries its own kind.
            if p_cds is not None and c_cds is not None:
                if text_surplus == 0:
                    basis_p, basis_c = p_cds, c_cds
                else:
                    basis_p = [t[1:] for t in p_cds]
                    basis_c = [t[1:] for t in c_cds]
                pc_s, cc_s = Counter(basis_p), Counter(basis_c)
                comp_surplus = (
                    sum((cc_s - pc_s).values()) + sum((pc_s - cc_s).values())
                ) - abs(len(c) - len(p))
                if comp_surplus > 0 and (name, "cond_composition") not in acks:
                    problems.append(
                        f"{name}: conditioned build composition ALSO "
                        f"changed alongside the count change: "
                        f"{p_cds} -> {c_cds} — adjudicate"
                    )
        else:
            if p != c and (name, "cond_text") not in acks:
                problems.append(
                    f"{name}: CHANGED condition text: {p} -> {c}"
                )
            # Same independence at EQUAL counts (r15 ADVICE): with
            # p != c the old elif chain never reached the composition
            # branch, so a cond_text ack hid a simultaneous source
            # swap.  Identical text keeps the stronger full-descriptor
            # comparison (it also sees re-pairing of text to sources);
            # changed text compares text-stripped descriptors.
            if p == c:
                # Same condition text, different build composition — the
                # text survives a source swap when column names match, so
                # the conditioned class carries leaf identity, and the
                # subtree shape catches a swap that preserves the leaves.
                if (cond_leaves_changed or cond_shapes_changed) and (
                    name,
                    "cond_composition",
                ) not in acks:
                    what = (
                        (p_cl, c_cl) if cond_leaves_changed else (p_cds, c_cds)
                    )
                    problems.append(
                        f"{name}: conditioned build composition changed "
                        f"under identical condition text: "
                        f"{what[0]} -> {what[1]} — adjudicate"
                    )
            else:
                s_cl = (
                    (sorted(t[1:] for t in p_cl), sorted(t[1:] for t in c_cl))
                    if p_cl is not None and c_cl is not None
                    else None
                )
                s_cds = (
                    (sorted(t[1:] for t in p_cds), sorted(t[1:] for t in c_cds))
                    if p_cds is not None and c_cds is not None
                    else None
                )
                comp_changed = bool(
                    (s_cl is not None and s_cl[0] != s_cl[1])
                    or (s_cds is not None and s_cds[0] != s_cds[1])
                )
                if comp_changed and (name, "cond_composition") not in acks:
                    what = (
                        s_cl
                        if s_cl is not None and s_cl[0] != s_cl[1]
                        else s_cds
                    )
                    problems.append(
                        f"{name}: conditioned build composition ALSO "
                        f"changed alongside the condition text: "
                        f"{what[0]} -> {what[1]} — adjudicate"
                    )
        if p_cross != c_cross:
            if (name, "cross_count") not in acks:
                problems.append(
                    f"{name}: condition-less cross count changed "
                    f"({p_cross} -> {c_cross}) — a hinted scalar cross was "
                    "added, re-derived, or a join degenerated into a pure "
                    "cartesian; adjudicate"
                )
            # Same masking closure as the conditioned family: an acked
            # count change must not hide a concurrent substitution among
            # the SURVIVING crosses.
            if p_cs is not None and c_cs is not None:
                pc_x, cc_x = Counter(p_cs), Counter(c_cs)
                x_surplus = (
                    sum((cc_x - pc_x).values()) + sum((pc_x - cc_x).values())
                ) - abs((p_cross or 0) - (c_cross or 0))
                if x_surplus > 0 and (name, "cross_composition") not in acks:
                    problems.append(
                        f"{name}: cross build composition ALSO changed "
                        f"alongside the count change: {p_cs} -> {c_cs} — "
                        "adjudicate"
                    )
        elif (leaves_changed or shapes_changed) and (
            name,
            "cross_composition",
        ) not in acks:
            what = (p_leaves, c_leaves) if leaves_changed else (p_cs, c_cs)
            problems.append(
                f"{name}: cross build composition changed at the same "
                f"count: {what[0]} -> {what[1]} — a scalar cross was "
                "swapped for one over different sources or a different "
                "subtree shape; adjudicate"
            )

    # ALLOWED-membership drift between the snapshots.  The prior-round
    # artifact may predate the snapshot field (r12 bootstrap); then the
    # membership diff has no basis and only the current-side integrity
    # check below applies.
    cur_allowed = set(cur.get("_allowed", []))
    if "_allowed" in prev and "_allowed" in cur:
        prev_allowed = set(prev["_allowed"])
        for name in sorted(prev_allowed - cur_allowed):
            if (name, "allowed_left") not in acks:
                problems.append(f"{name}: LEFT the ALLOWED list — adjudicate")
        for name in sorted(cur_allowed - prev_allowed):
            if (name, "allowed_entered") not in acks:
                problems.append(f"{name}: ENTERED the ALLOWED list — adjudicate")
    if "_allowed" in cur:
        for name in names:
            if _conds(cur, name) and name not in cur_allowed:
                problems.append(
                    f"{name}: conditioned nested loop outside the artifact's "
                    "own _allowed snapshot"
                )

    def _multiset_delta(
        prev_list: list[str], cur_list: list[str]
    ) -> tuple[list[str], list[str]]:
        """Counter-based (removed, added) for capture-text lists — a
        pure COUNT change (e.g. a lost map-side partial aggregation:
        two identical texts becoming one) must name the descriptor and
        delta, not print 'removed [] added []' (set-membership diffing
        hid exactly the count-change case the captures advertise
        catching)."""
        p, c = Counter(prev_list), Counter(cur_list)
        gone = [f"{t} (x{n})" if n > 1 else t for t, n in sorted((p - c).items())]
        new = [f"{t} (x{n})" if n > 1 else t for t, n in sorted((c - p).items())]
        return gone, new

    # PLAN_PINS expression-text diff (r15 task #5): Filter conditions
    # and hash-join key sets/residuals for the pinned gate set, the
    # surface the nested-loop fields cannot see.  Only diffed when BOTH
    # artifacts carry the field (the r14 artifact predates it — one
    # bootstrap round, same as every other schema addition); a name
    # present on one side only is a pin-set membership change, flagged
    # under the same kind so it cannot slip in silently.
    if "_pinned_conditions" in prev and "_pinned_conditions" not in cur:
        # Same integrity rule as the per-query leaf/shape fields: a
        # current artifact DROPPING the field would silently disable
        # this gate — flag it, not ack-suppressible (fourth r15 review
        # pass; generator regression or hand-edit, regenerate the sweep).
        problems.append(
            "_pinned_conditions: current artifact dropped the pinned "
            "expression capture — generator regression or hand-edit; "
            "regenerate the sweep"
        )
    if "_pinned_conditions" in prev and "_pinned_conditions" in cur:
        p_pc, c_pc = prev["_pinned_conditions"], cur["_pinned_conditions"]
        for name in sorted(set(p_pc) | set(c_pc)):
            if name in cur_errors or name in prev_errors:
                continue
            if (name, "pinned_cond") in acks:
                continue
            if name not in c_pc:
                problems.append(
                    f"{name}: LEFT the pinned expression-capture set — "
                    "adjudicate (pin removed or sweep regression)"
                )
            elif name not in p_pc:
                problems.append(
                    f"{name}: ENTERED the pinned expression-capture set — "
                    "adjudicate (new pin)"
                )
            elif p_pc[name] != c_pc[name]:
                gone, new = _multiset_delta(p_pc[name], c_pc[name])
                problems.append(
                    f"{name}: pinned plan expression text changed — "
                    f"removed {gone} added {new} — adjudicate"
                )

    # PLAN_PINS expression-capture diffs (r17, closing r16 verdict
    # residual #5): with filter conditions and join keys already
    # captured (_pinned_conditions), a pinned plan with identical node
    # counts could still silently change WHAT it aggregates (sum ->
    # avg, a lost count-distinct, a regrouped key — _pinned_aggregates
    # under the "pinned_agg" kind), or its window functions / sort
    # keys / top-k limits (rank -> row_number, a re-partitioned OVER
    # clause, a changed null ordering, a lost rank-limit pushdown —
    # _pinned_windows under "pinned_window").  The multisets also
    # carry node counts, so a lost map-side partial aggregation or a
    # dropped per-partition sort reddens as a count change.  Same
    # bootstrap/integrity rules as _pinned_conditions: only diffed
    # when BOTH artifacts carry the field (r17 artifacts are the
    # first); a current artifact DROPPING a field flags
    # non-ack-suppressibly.
    for field, kind, label in (
        ("_pinned_aggregates", "pinned_agg", "aggregate"),
        ("_pinned_windows", "pinned_window", "window/sort"),
        ("_pinned_projections", "pinned_proj", "projection/limit"),
    ):
        if field in prev and field not in cur:
            problems.append(
                f"{field}: current artifact dropped the pinned "
                f"{label} capture — generator regression or "
                "hand-edit; regenerate the sweep"
            )
        if field not in prev or field not in cur:
            continue
        p_pa, c_pa = prev[field], cur[field]
        for name in sorted(set(p_pa) | set(c_pa)):
            if name in cur_errors or name in prev_errors:
                continue
            if (name, kind) in acks:
                continue
            if name not in c_pa:
                problems.append(
                    f"{name}: LEFT the pinned {label}-capture set — "
                    "adjudicate (pin removed or sweep regression)"
                )
            elif name not in p_pa:
                problems.append(
                    f"{name}: ENTERED the pinned {label}-capture set — "
                    "adjudicate (new pin)"
                )
            elif p_pa[name] != c_pa[name]:
                gone, new = _multiset_delta(p_pa[name], c_pa[name])
                problems.append(
                    f"{name}: pinned {label} expressions changed — "
                    f"removed {gone} added {new} — adjudicate"
                )
    return problems


def newest_artifacts(root: Path) -> list[Path]:
    return _tc.newest_artifacts(root, prefix="PLANSWEEP")


def _round_of(path: Path) -> int | None:
    return _tc.artifact_round(path, prefix="PLANSWEEP")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev")
    ap.add_argument("--cur")
    args = ap.parse_args()

    if args.prev and args.cur:
        prev_p, cur_p = Path(args.prev), Path(args.cur)
    else:
        arts = newest_artifacts(REPO)
        if len(arts) < 2:
            print("fewer than two PLANSWEEP_r*.json artifacts — nothing to compare")
            return 0
        prev_p, cur_p = arts[-2], arts[-1]

    prev = json.loads(prev_p.read_text())
    cur = json.loads(cur_p.read_text())
    cur_round = _round_of(cur_p)
    acks = ADJUDICATED.get(cur_round, {}) if cur_round is not None else {}
    problems = compare_sweeps(prev, cur, acks)
    n_q = sum(1 for k in cur if not k.startswith("_"))
    print(
        f"compare {prev_p.name} -> {cur_p.name}: {n_q} queries with "
        f"nested-loop nodes; {len(acks)} adjudications in scope"
    )
    for p in problems:
        print(f"PLAN CHANGE {p}")
    if not problems:
        print("gate PASS: no plan-shape change vs the prior round")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Physical-plan regression tests: the scale properties the engine claims
(pushdown, broadcast dimensions, top-k without global sort, map-only
signature phases) are asserted on the plans themselves, so a refactor
that silently loses one fails here — not on a 100 TB cluster."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from discogs_etl_spark.registry import queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def q():
    return queries()


def test_scan_pushdown_and_pruning(spark, q):
    plan = _plan(q["scan_project_filter"](spark, SF))
    assert "GreaterThan(o_totalprice,400000.0)" in plan  # predicate reached the scan
    assert "EqualTo(o_orderstatus,O)" in plan
    # column pruning: only the 3 selected columns are read
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>" in plan


def test_topk_plans_take_ordered(spark, q):
    assert "TakeOrderedAndProject" in _plan(q["sort_topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in _plan(q["flagship_scan_filter_limit"](spark, SF))


def test_star_join_broadcasts_dimensions(spark, q):
    plan = _plan(q["q5_regional_revenue"](spark, SF))
    # every dimension joins as a broadcast; no cartesian anywhere
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_broadcast_hint_respected(spark, q):
    plan = _plan(q["join_broadcast_part_agg"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact table must not shuffle


def test_minhash_signatures_map_only(spark, q):
    """The signature phase must stay shuffle-free: the first Exchange in
    the minhash plan may come only AFTER band explosion (the bucket
    groupBy).  If signature computation itself ever introduces an
    exchange (e.g. someone reverts to a groupBy formulation), the plan
    gains exchanges before any Generate."""
    plan = _plan(q["dedup_minhash_lsh"](spark, SF))
    # cheap structural proxy: scan->signature->Generate(bands) appears
    # before any Exchange in the formatted tree ordering
    tree = plan.split("\n\n")[0]
    first_generate = tree.find("Generate")
    first_exchange = tree.find("Exchange")
    assert first_generate != -1 and first_exchange != -1
    # formatted trees list operators top-down (sink first); the LAST
    # Generate (deepest = band explosion) must sit below (after) every
    # Exchange textually, i.e. exchanges happen downstream of it
    last_generate = tree.rfind("Generate")
    assert last_generate > first_exchange


def test_window_topk_group_limit(spark, q):
    plan = _plan(q["window_topk_orders_per_customer"](spark, SF))
    assert "WindowGroupLimit" in plan  # rn<=k pushed into the window sort


def test_sharded_packing_window_is_partitioned(spark, q):
    """The production packing form must never plan a partition-less window
    (single-task global sort — the round-1 scale flag)."""
    plan = _plan(q["pack_sequences_sharded"](spark, SF))
    assert "windowspecdefinition(lang" in plan  # window keyed by shard
    assert "hashpartitioning(lang" in plan  # exchange on the shard key
    assert "SinglePartition" not in plan  # never a global single-task sort


def test_bucketed_embedding_dedup_is_hash_join(spark, q):
    """Bucketed dedup must plan a HASH equi-join on the LSH bucket, never
    the nested-loop all-pairs join of the exactness baseline."""
    plan = _plan(q["dedup_embedding_bucketed"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast at tiny SF, shuffled-hash at scale


def test_curate_pipeline_single_normalization(spark, q):
    """The regex normalization must be computed once per row: filter
    pushdown / CollapseProject re-inlining shows up as extra
    regexp_replace nodes (8 when unstaged — measured round 2)."""
    df = q["corpus_curate_pipeline"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_replace") <= 2
    assert plan.count("split(") <= 1


def test_partsupp_family_no_cartesian(spark, q):
    """The derived-partsupp TPC-H shapes must stay hash/broadcast joins —
    a lost equi-condition (e.g. on the two-column partsupp key) would
    surface as a nested-loop join."""
    for name in ("q2_min_cost_supplier", "q9_product_type_profit",
                 "q11_important_stock", "q16_parts_supplier_count",
                 "q20_potential_promotion"):
        plan = _plan(q[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        # q11's one-row threshold joins as a broadcast nested loop by
        # design (no join key); everything else must be hash-joined.
        if name != "q11_important_stock":
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_q2_min_via_window_not_self_join(spark, q):
    """Q2's correlated MIN must be a per-part window over one partsupp
    pass, not a second partsupp derivation + self-join (one lineitem
    aggregation in the plan, not two)."""
    plan = _plan(q["q2_min_cost_supplier"](spark, SF))
    assert "Window" in plan
    assert plan.count("partial_min") <= 1


def test_boilerplate_groups_partial_agg(spark, q):
    """Exact-hash-dedup shape: map-side partial aggregation must precede
    the single exchange on the prefix hash."""
    plan = _plan(q["boilerplate_prefix_groups"](spark, SF))
    # one hash exchange for the agg (the second is the output ordering's
    # range partitioner, not a data-motion cost of the dedup itself)
    assert plan.count("hashpartitioning") == 1
    assert "partial_count" in plan


def test_shuffle_shards_partitioned_sort(spark, q):
    """The shard window must partition by shard — a partition-less window
    here would be a single-task global sort of the corpus."""
    plan = _plan(q["corpus_shuffle_shards"](spark, SF))
    assert "windowspecdefinition(shard" in plan
    assert "SinglePartition" not in plan


def test_redact_pii_map_side(spark, q):
    """Redaction itself is map-only: no exchange may appear below the
    final ordering of the filtered output."""
    plan = _plan(q["text_redact_pii"](spark, SF))
    # one Sort for the deterministic output order; no aggregation exchanges
    assert "HashAggregate" not in plan


def test_quality_gate_broadcasts_thresholds(spark, q):
    """Pass 2 of the quantile gate must join the per-lang thresholds as a
    broadcast — if the threshold table ever shuffles the corpus side the
    two-pass shape is lost."""
    plan = _plan(q["quality_gate_quantile"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_udtf_token_runs_map_only(spark, q):
    """The UDTF lateral correlate is a per-row fan-out: no Exchange may
    appear anywhere in its plan."""
    plan = _plan(q["udtf_token_runs"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_range_join_user_key_in_join_condition(spark, q):
    """The bucketed range join must equi-join on (bkt, user_id) — with
    bucket alone as the key, every user active in the same 5-minute
    bucket cross-multiplies before the user filter (a per-bucket
    cartesian at scale, the round-2 flag).  Assert the user key appears
    INSIDE the hash-join condition, and the range predicate is the only
    residual."""
    plan = _plan(q["range_join_bucketed"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # details section: the HashJoin's "Left keys"/"Right keys" list both
    # bkt and user_id
    import re

    keys = re.findall(r"(?:Left|Right) keys \[\d+\]: \[([^\]]*)\]", plan)
    assert keys, "no hash-join key details in plan"
    assert all("user_id" in k and "bkt" in k for k in keys), keys


def test_salted_join_salt_in_key(spark, q):
    """The salted skew join must carry the salt INSIDE the equi-join key
    (that is the whole point — spreading one hot key over S reducers);
    and never degrade to a nested loop."""
    import re

    plan = _plan(q["join_skew_salted"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    keys = re.findall(r"(?:Left|Right) keys \[\d+\]: \[([^\]]*)\]", plan)
    assert keys, "no hash-join key details in plan"
    assert all("user_id" in k and "salt" in k for k in keys), keys


def test_embedding_quantize_map_only(spark, q):
    """INT8 quantization is pure per-row array math — its plan must have
    no Exchange at all (one codegen stage with the scan)."""
    plan = _plan(q["embedding_quantize_int8"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree


def test_running_distinct_tiny_window_input(spark, q):
    """The running-distinct query's single-partition window is legal only
    because its input is day-grained: the plan must aggregate BEFORE the
    window (two HashAggregates below the Window), never window the raw
    events."""
    plan = _plan(q["window_running_distinct_users"](spark, SF))
    tree = plan.split("\n\n")[0]
    w = tree.find("Window")
    assert w != -1
    # formatted trees list operators top-down; both aggregates must be
    # textually after (i.e. upstream of) the Window node
    assert tree.count("HashAggregate", w) >= 2


def test_inverted_search_group_limit(spark, q):
    """Per-query top-k in the inverted-index retrieval must plan as a
    WindowGroupLimit (rank pushed into the window sort), and the postings
    join must stay a hash join."""
    plan = _plan(q["text_search_inverted_topk"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_stages_broadcast_user_sets(spark, q):
    """Each funnel stage joins the previous stage's per-user MIN set as a
    broadcast; the events fact side must never shuffle into a merge join."""
    plan = _plan(q["funnel_view_click_purchase"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_triangle_edge_build_single_aggregation(spark, q):
    """The triangle edge build must be ONE order-keyed aggregation (pair
    generation via higher-order array functions, no self-join of items),
    and the closing-edge check must plan as a LEFT SEMI hash join."""
    plan = _plan(q["graph_triangle_count"](spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one collect_set aggregate pair (partial + final) feeds the
    # edge generation; the old shape had a distinct + count + self-join
    assert plan.count("collect_set") <= 4


def test_bm25_group_limit_and_broadcast_stats(spark, q):
    """BM25 top-k must plan as a WindowGroupLimit; the 1-row corpus stats
    aggregate must broadcast, never cartesian the postings."""
    plan = _plan(q["text_search_bm25_topk"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_bloom_runtime_filter_injected(spark, q):
    """Under the scoped bloom confs, the fact-side scan filter must carry
    might_contain (bloom pushed to the scan) fed by a bloom_filter_agg on
    the build side; the builder must restore every conf afterwards."""
    from discogs_etl_spark.queries.analytics import (
        _BLOOM_RUNTIME_CONFS,
        _bloom_join_frame,
    )

    before = {
        k: spark.conf.get(k, None) for k in _BLOOM_RUNTIME_CONFS
    }
    saved = {}
    for k, v in _BLOOM_RUNTIME_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        plan = _plan(_bloom_join_frame(spark, SF))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    # the registered query (checkpoint + restore) leaves confs untouched
    q["join_bloom_runtime_filter"](spark, SF)
    after = {k: spark.conf.get(k, None) for k in _BLOOM_RUNTIME_CONFS}
    assert after == before


def test_kmeans_assignment_broadcast_map_only(spark, q):
    """K-means assignment must join the broadcast centroid table with a
    BroadcastNestedLoopJoin (K-row build side, no shuffle of the corpus)
    and never a CartesianProduct."""
    plan = _plan(q["kmeans_embeddings_fixed"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_growth_window_over_aggregated_grid(spark, q):
    """The MoM lag window must sit ABOVE the monthly aggregation (window
    input is the grid, not the fact table) and the dimension joins must
    broadcast."""
    plan = _plan(q["growth_mom_by_nation"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:]  # aggregate below (after) the window node


def test_assoc_rules_take_ordered(spark, q):
    plan = _plan(q["assoc_rules_coorder"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path_factory):
    """BUCKETED-TABLE join evidence: co-bucketing both join sides on the
    key lets the sort-merge join run with NO Exchange on either side —
    the pre-shuffled-layout strategy for repeated fact-fact joins at
    100 TB (bucket pruning + shuffle elimination are free thereafter)."""
    import uuid

    from discogs_etl_spark.tables import load

    tag = uuid.uuid4().hex[:8]
    warehouse = tmp_path_factory.mktemp("bucketed")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    for df, name, key in ((orders, f"b_orders_{tag}", "o_orderkey"),
                          (li, f"b_lineitem_{tag}", "l_orderkey")):
        (df.write.mode("overwrite")
         .option("path", str(warehouse / name))
         .bucketBy(8, key).sortBy(key)
         .saveAsTable(name))
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join exercises the bucketed SMJ path
        # (at fixture size the small side would otherwise broadcast and
        # prove nothing about the bucket layout)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (spark.table(f"b_orders_{tag}")
             .join(spark.table(f"b_lineitem_{tag}"),
                   F.col("o_orderkey") == F.col("l_orderkey"))
             .groupBy("o_orderkey").count())
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # co-bucketed layout: no shuffle below the join, and the final
        # same-key aggregation reuses it too — the whole plan must be
        # Exchange-free.
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql(f"DROP TABLE IF EXISTS b_orders_{tag}")
        spark.sql(f"DROP TABLE IF EXISTS b_lineitem_{tag}")


def test_observe_metrics_on_curation_pipeline(spark, q):
    """Pipeline observability: df.observe() collects named metrics (row
    counts, aggregate checks) as a side effect of the SAME action that
    produces the data — no second pass over the corpus.  This is how a
    production curation job reports its dedup rate without re-running."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from discogs_etl_spark.tables import load

    obs = Observation("curate_metrics")
    docs = load(spark, SF, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.length("text") > 0, 1).otherwise(0)).alias("n_nonempty"),
    )
    out = docs.where(F.col("n_chars") > 0).count()
    got = obs.get
    assert got["n_rows"] > 0
    assert got["n_nonempty"] <= got["n_rows"]
    assert out <= got["n_rows"]


def test_phash_dedup_is_banded_equi_join(spark, q):
    """The perceptual-hash dedup must candidate-generate via an equi-join
    on (band, sig) — never a nested-loop over all image pairs."""
    plan = _plan(q["multimodal_phash_dedup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band" in plan and "sig" in plan


def test_sweepline_partitions_by_day(spark, q):
    """The concurrency sweep must window per DAY (hashpartitioning on the
    day key), not sort the whole boundary stream in one partition."""
    plan = _plan(q["sessions_max_concurrency"](spark, SF))
    assert "hashpartitioning(day" in plan
    assert "CartesianProduct" not in plan


def test_duplicate_payments_blocks_before_compare(spark, q):
    """The fuzzy payment join must be equi-keyed on (custkey, block) with
    the tolerances as residual filters — no inequality-driven nested
    loop."""
    plan = _plan(q["orders_duplicate_payments"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_scopes_pairs_to_clusters(spark, q):
    """SemDeDup's pair join must be keyed on the cluster id (equi-join),
    which is the entire point of clustering-as-blocking."""
    plan = _plan(q["dedup_semdedup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_substring_windows_partial_aggregates(spark, q):
    """The 48-char window count must partial-aggregate map-side (two
    HashAggregate nodes around one Exchange on the window key)."""
    plan = _plan(q["dedup_substring_windows"](spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_bigram_lm_join_is_keyed_on_bigram(spark, q):
    """The LM scoring join keys on the bigram string; no plan may fall
    back to a nested loop between instances and the model table."""
    plan = _plan(q["lm_bigram_surprisal"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_band_pricing_is_deliberate_bnlj(spark, q):
    """The band lookup is the DOCUMENTED keyless broadcast: exactly a
    BroadcastNestedLoopJoin against the 4-row band table — and nothing
    larger."""
    plan = _plan(q["join_range_band_pricing"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_heaps_law_checkpoints_are_conditional_aggs(spark, q):
    """The 10 corpus-prefix checkpoints must be conditional sums inside
    single Aggregates over the token / first-seen tables — never a
    grid crossJoin that materializes 10 copies of the token table
    before filtering (the round-3 shape).  The only join left is the
    1-row x 1-row combine of the two aggregate rows."""
    plan = _plan(q["corpus_heaps_law_fit"](spark, SF))
    assert "CartesianProduct" not in plan
    # the grid table is gone entirely: no scan of an in-memory cut list
    assert "LocalTableScan" not in plan and "Scan ExistingRDD" not in plan
    # both checkpoint passes are plain aggregates feeding a keyless
    # 1x1 combine (BroadcastNestedLoopJoin over two single-row sides);
    # count tree lines only — the formatted detail repeats the node name
    assert plan.count("BroadcastNestedLoopJoin Cross") == 1
    # map-side partial conditional sums: checkpoints computed in one pass
    assert "partial_sum(CASE WHEN (doc_id" in plan


def test_token_budget_planner_single_pass(spark, q):
    """All four budget scenarios must come from ONE Aggregate over the
    joined scan (conditional sums + unpivot), not a 4-branch unionAll
    that re-executes the join pipeline per scenario."""
    plan = _plan(q["corpus_token_budget_planner"](spark, SF))
    assert "Union" not in plan
    # one scan of documents feeds the whole thing
    assert plan.count("documents.parquet") == 1


def test_every_crossjoin_is_broadcast_hinted():
    """Every cartesian-product join in the package must wrap its argument
    in F.broadcast(...): each one combines a scalar/tiny aggregate, and
    the hint makes the BroadcastNestedLoopJoin shape explicit instead of
    relying on AQE size estimates (the r8 verdict claimed this invariant
    was grep-verified; three sites falsified it — this test makes the
    invariant real and keeps it that way).  Two forms produce the same
    cartesian product and both are swept (ADVICE r9): ``.crossJoin(x)``
    and the keyless ``.join(x)`` with exactly one positional argument
    and no ``on``/``how`` — the escape hatch the r9 BM25 queries
    themselves used (hinted, but previously untested) — plus any
    ``.join(..., how="cross")`` / ``.join(x, None, "cross")`` spelling
    whose ``how`` is the literal ``"cross"``.  ``str.join`` is excluded
    by skipping string-literal receivers (every str.join in the package
    calls through a literal separator; a future ``sep.join(...)``
    through a variable would false-positive here and should be rewritten
    or excluded locally)."""
    import ast
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "discogs_etl_spark"
    offenders = []
    for f in sorted(pkg.rglob("*.py")):
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)):
                continue
            is_cross = node.func.attr == "crossJoin"
            str_receiver = isinstance(node.func.value, ast.Constant) and isinstance(
                node.func.value.value, str
            )
            is_keyless_join = (
                node.func.attr == "join"
                and len(node.args) == 1
                and not node.keywords
                and not str_receiver
            )
            # .join(x, None) / .join(x, on=None): an explicit null join
            # condition is a cartesian product too (same planner path as
            # the keyless spelling) and must carry the broadcast hint.
            null_on = [
                kw.value for kw in node.keywords if kw.arg == "on"
            ] + node.args[1:2]
            is_null_on_join = (
                node.func.attr == "join"
                and not str_receiver
                and any(
                    isinstance(h, ast.Constant) and h.value is None
                    for h in null_on
                )
            )
            how_values = [
                kw.value for kw in node.keywords if kw.arg == "how"
            ] + node.args[2:3]
            is_cross_how_join = (
                node.func.attr == "join"
                and not str_receiver
                and any(
                    isinstance(h, ast.Constant) and h.value == "cross"
                    for h in how_values
                )
            )
            if not (
                is_cross or is_keyless_join or is_cross_how_join or is_null_on_join
            ):
                continue
            arg = node.args[0] if node.args else None
            hinted = isinstance(arg, ast.Call) and (
                (
                    isinstance(arg.func, ast.Attribute)
                    and arg.func.attr == "broadcast"
                )
                or (isinstance(arg.func, ast.Name) and arg.func.id == "broadcast")
            )
            if not hinted:
                offenders.append(f"{f.relative_to(pkg.parent)}:{node.lineno}")
    assert not offenders, (
        f"cartesian join without F.broadcast(...) hint: {offenders} — wrap "
        "the argument (scalar aggregates broadcast; anything bigger should "
        "not be a cartesian product)"
    )


# ---------------------------------------------------------------------------
# Executed-plan fingerprint gate (verdict r11 #1).
#
# Answers are hash-gated and wall-times are ratio-gated, but both catch a
# Catalyst strategy flip only noisily and after the fact — the r10
# recsys_holdout_hitrate nested-loop ran green for NINE rounds because
# nothing machine-checked the physical plan.  This sweep pins normalized
# node counts of the EXECUTED (AQE-final) plan for every headline bench
# query plus the previously-fixed scale-killers, at the suite's exact
# session condition (local[8], shuffle.partitions=8, AQE on, 64 MiB
# broadcast threshold, sf0.001).
#
# What each key catches:
#   scan_parquet  a "one corpus scan" promise growing a second branch, or
#                 a checkpointed iteration silently re-deriving the corpus
#                 (pc1/pc1_gram pin ZERO parquet scans: the fold must be
#                 physically real — the r9 lesson)
#   bhj/smj/shj   a dimension join losing its broadcast (hint dropped,
#                 threshold misread) flips bhj -> smj deterministically
#   bnlj/cartesian  nonzero ONLY for the deliberate broadcast-hinted
#                 scalar crossJoins (test_every_crossjoin_is_broadcast_hinted
#                 proves each is hinted); any other value is the r10 bug
#                 class resurfacing
#
# UPDATE PATH when a plan legitimately changes: rerun
#   python scripts/plan_fingerprint.py --pins --only <name>
# and paste the new entry here, saying WHY the shape moved in the commit
# message — a pin update without a rationale is the smell this gate
# exists to produce.  Zero-valued keys are omitted.
# ---------------------------------------------------------------------------

PLAN_PINS: dict[str, dict[str, int]] = {
    # -- second tier (SCALE_STORY): the queries whose 100 TB story IS a
    #    plan shape — bucket/salt/as-of demos, production twins of the
    #    all-pairs baselines
    "agg_salted_skew_safe": {"scan_parquet": 1},
    "asof_join_events": {"scan_parquet": 1},
    "asof_join_tolerance": {"scan_parquet": 1},
    "dedup_embedding_bucketed": {"scan_parquet": 2, "bhj": 1},
    # r17 (VERDICT r16 task #7): the LSH skew guards — the width filter
    # must join on the bucket key BEFORE candidate generation.  MinHash:
    # localCheckpointed bands (scan_rdd x2: aggregate input + join
    # probe), BHJ for the width filter + the two verify text joins, one
    # parquet scan for the verify text.  phash: localCheckpointed hash
    # stage (scan_rdd x5 across exact/banded/member-expansion branches),
    # BHJ x6 = r16's uncapped 4 + the width-filter join on (band, sig)
    # on BOTH sides' candidate generation.  A dropped width filter
    # reverts to uncapped O(width²) emission and shows here as a lost
    # join/scan before the value gate could notice at fixture scale.
    "dedup_minhash_capped_pairs": {"scan_parquet": 1, "scan_rdd": 2, "bhj": 3},
    "multimodal_phash_capped_pairs": {"scan_rdd": 5, "bhj": 6},
    "join_skew_salted": {"scan_parquet": 2, "bhj": 1},
    "range_join_bucketed": {"scan_parquet": 2, "bhj": 1},
    "similarity_ivf_topk": {"scan_parquet": 5, "bhj": 3, "bnlj": 1},
    "text_search_bm25_pruned_topk": {"scan_rdd": 5, "bhj": 3, "smj": 1, "bnlj": 4},
    # -- third tier (EXPENSIVE_TAIL, verdict r12 #4): the costliest
    #    non-headline sf0.1 walls — a strategy flip here multiplies a
    #    double-digit wall, so each one's claimed shape (banded pHash
    #    equi-join, per-cluster semdedup pairs, blocked Levenshtein,
    #    broadcast-dim audits, daily-rollup Theil-Sen bnlj) is pinned
    # r18: window generation runs ONCE — the (w, doc_id) multiplicity
    # aggregation + a w-partitioned count window replaced the
    # duplicate-set branch + membership join (second documents scan and
    # the broadcast join gone; identical Σk integers, oracle-verified
    # at all three sfs).
    "dedup_doc_duplication_score": {"scan_parquet": 1},
    "dedup_semdedup": {"scan_parquet": 1, "scan_rdd": 2, "bhj": 3},
    "fuzzy_join_levenshtein_blocked": {"scan_parquet": 2, "bhj": 1},
    # r15 banding rewrite (VERDICT r14 task #1): the 64-bit hash is a
    # localCheckpointed map stage (scan_rdd leaves), and exact-pair,
    # banded-candidate, and two member-expansion joins are all BHJ at
    # this sf — zero parquet rescans of the payload.
    "multimodal_phash_dedup": {"scan_rdd": 4, "bhj": 4},
    "pricing_consistency_audit": {"scan_parquet": 2, "bhj": 1},
    # r18: daily is localCheckpoint-ed (scan_parquet -> scan_rdd, and the
    # count action no longer re-derives the orders aggregation), so both
    # pair-join sides read the checkpoint RDD; the median is sort+rank
    # (no percentile buffer), same single BNLJ pair join.
    "stats_theil_sen_trend": {"scan_rdd": 2, "bnlj": 1},
    # -- fourth tier (API_SURFACE, r17): the user-facing curation API
    #    compositions end-to-end.  The dedup APIs share one shape: one
    #    parquet payload scan, a localCheckpointed hash/signature stage
    #    (scan_rdd x3 across pair generation and member expansion), one
    #    BHJ survivor join, and the audited one-row broadcast report
    #    attach (bnlj).  search_corpus is the checkpointed-postings BM25
    #    composition (scan_rdd x4) with the hit-scoped df join + 1-row
    #    corpus-stats attach; profile_table is deliberately a SINGLE
    #    parquet scan — a second scan would mean the one-pass profile
    #    regressed to per-column rescans.
    "curation_dedup_corpus": {"scan_parquet": 1, "scan_rdd": 3, "bhj": 1, "bnlj": 1},
    "curation_dedup_media": {"scan_parquet": 1, "scan_rdd": 3, "bhj": 1, "bnlj": 1},
    "curation_dedup_media_capped": {"scan_parquet": 1, "scan_rdd": 3, "bhj": 1, "bnlj": 1},
    "curation_search_corpus": {"scan_rdd": 4, "bhj": 2, "bnlj": 1},
    "curation_profile_table": {"scan_parquet": 1},
    # r18: the backfill CLI verb's audit report — driver-local results
    # scan only (the ingest jobs are actions inside pipeline.backfill,
    # not part of the returned plan); a distributed join against the
    # lake appearing here would mean the audit's shape regressed.
    "backfill_audit_table": {"scan_rdd": 1},
    # -- headline bench set + fixed scale-killers
    "corpus_curate_pipeline": {"scan_parquet": 1},
    "dedup_cc_starcontraction": {"scan_rdd": 2},
    # the one caching query in the set: the walker descends into each
    # of its 3 distinct cached-relation plans, so the counts cover the
    # WHOLE plan, caches included
    "dedup_connected_components": {"scan_rdd": 6, "bhj": 1, "cache": 3},
    "dedup_exact_hash": {"scan_parquet": 1},
    # r19 (two changes, both oracle-exact at all three fixture sfs —
    # OPTIMIZATION_r19.md): the composed exact-jaccard side uses
    # posting-list pair generation (_posting_pair_counts: the self-join's
    # second documents scan and hash join left the plan), and the
    # minhash side reads the shared per-session pair-graph checkpoint
    # (scan_rdd) instead of re-running the whole signature pipeline.
    "dedup_minhash_eval": {"scan_parquet": 2, "scan_rdd": 1, "bhj": 2, "smj": 1},
    "dedup_minhash_lsh": {"scan_parquet": 2, "bhj": 2},
    "embedding_power_iteration_pc1": {"scan_rdd": 3, "bhj": 3, "bnlj": 4},
    "embedding_power_iteration_pc1_gram": {"scan_rdd": 3, "bhj": 3, "bnlj": 4},
    "events_hourly_agg": {"scan_parquet": 1},
    "feature_hashing_vectorize": {"scan_parquet": 1},
    "flagship_scan_filter_limit": {"scan_parquet": 1},
    "graph_pagerank_coorder": {"scan_rdd": 3, "bhj": 5},
    "graph_triangle_count": {"scan_rdd": 3, "bhj": 2},
    "join_broadcast_part_agg": {"scan_parquet": 2, "bhj": 1},
    "kmeans_embeddings_fixed": {"scan_parquet": 4, "bnlj": 3},
    # r18: the bigram-instance counts are materialized once (2 checkpoint
    # reads: LM side + scoring probe) and the context totals come from a
    # w1-window over the bigram counts instead of a second agg + join —
    # 3 documents scans and one broadcast join gone from the plan.
    "lm_bigram_surprisal": {"scan_rdd": 2, "bhj": 1},
    "q1_pricing_summary": {"scan_parquet": 1},
    "q3_shipping_priority": {"scan_parquet": 3, "bhj": 2},
    "q5_regional_revenue": {"scan_parquet": 6, "bhj": 5},
    "recsys_holdout_hitrate": {"scan_parquet": 1, "bhj": 2, "bnlj": 1},
    # r18: session bounds are materialized once (the sweep and carry
    # branches read the checkpoint) instead of re-running the events scan
    # + sessionization windows per consumer.
    "sessions_max_concurrency": {"scan_rdd": 2},
    "similarity_topk_bruteforce": {"scan_parquet": 2, "bnlj": 1},
    "sort_topk_orders": {"scan_parquet": 1},
    "text_chunk_sliding": {"scan_parquet": 1},
    "text_search_bm25_topk": {"scan_rdd": 5, "bhj": 3, "bnlj": 1},
    "text_search_inverted_topk": {"scan_rdd": 2, "bhj": 1},
    "text_stats_by_lang": {"scan_parquet": 1},
}


def _plan_fingerprint_mod():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "scripts" / "plan_fingerprint.py"
    spec = importlib.util.spec_from_file_location("plan_fingerprint", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_condition_texts_capture_join_key_pairing(spark):
    """r15 ADVICE #2: sorting a hash join's leftKeys and rightKeys
    INDEPENDENTLY destroys positional pairing, so a rewrite that
    re-pairs the equi-join (x=u,y=v -> x=v,y=u — same key SETS, a
    different join) produced an identical descriptor and the pinned
    expression gate missed exactly the dropped/changed-join-key class
    it exists to catch.  Keys are now captured as jointly-sorted
    left=right pairs: a re-pairing differs, while the same pairing
    written in either conjunct order is byte-identical."""
    mod = _plan_fingerprint_mod()
    a = spark.range(8).select(F.col("id").alias("x"), (F.col("id") + 1).alias("y"))
    b = spark.range(8).select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    paired = mod.condition_texts(a.join(b, (a.x == b.u) & (a.y == b.v)))
    repaired = mod.condition_texts(a.join(b, (a.x == b.v) & (a.y == b.u)))
    reordered = mod.condition_texts(a.join(b, (a.y == b.v) & (a.x == b.u)))
    assert any(t.startswith("join:") for t in paired)  # hash join captured
    assert paired != repaired
    assert paired == reordered


def test_plan_pins_cover_the_whole_gate_set():
    """The pinned set is DERIVED (bench set + scale-killers), not
    hand-typed: registering a new bench=True headline query without
    pinning its plan fails here, so the gate's coverage cannot silently
    rot as the headline set evolves."""
    expected = set(_plan_fingerprint_mod().pinned_names())
    assert set(PLAN_PINS) == expected, (
        f"PLAN_PINS out of sync with the gate set: missing "
        f"{sorted(expected - set(PLAN_PINS))}, stale "
        f"{sorted(set(PLAN_PINS) - expected)} — rerun "
        "`python scripts/plan_fingerprint.py --pins`"
    )


@pytest.mark.parametrize("name", sorted(PLAN_PINS))
def test_executed_plan_fingerprint(spark, q, name):
    """The gate itself: run the query at sf0.001 and compare the final
    adaptive plan's node counts against the pin.  A legitimate plan
    change updates the pin (see the PLAN_PINS comment); an accidental
    one fails exactly one named test the moment it lands."""
    # The pins are statements about this condition — if a prior test
    # leaked one of these confs, fail with the real cause instead of a
    # mysterious fingerprint diff.  shuffle.partitions is deliberately
    # NOT asserted: tests running earlier in the session legitimately
    # retune it (tune_for_correctness sets max(cpus, 8)) and node-type
    # counts are partition-count-insensitive — verified by running all
    # 35 pins at 8 and at 32 partitions with zero drift.
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(
        64 * 1024 * 1024
    )
    mod = _plan_fingerprint_mod()
    fp = mod.fingerprint(q[name](spark, SF))
    got = {k: v for k, v in fp.items() if v}
    assert got == PLAN_PINS[name], (
        f"{name}: executed-plan fingerprint drifted.\n"
        f"  pinned: {PLAN_PINS[name]}\n  actual: {got}\n"
        "If intentional, rerun `python scripts/plan_fingerprint.py "
        f"--pins --only {name}` and update PLAN_PINS with a rationale; "
        "if not, a Catalyst strategy flip or a lost checkpoint/broadcast "
        "just got caught before it shipped."
    )


def test_plan_sweep_allowed_names_are_registered():
    """scripts/plan_sweep.py's audited nested-loop allowance must not go
    stale: every ALLOWED name exists in the registry (a renamed/removed
    query would otherwise keep a dead allowance a future query could
    inherit by taking the name)."""
    import importlib.util
    from pathlib import Path

    from discogs_etl_spark.registry import all_specs

    path = Path(__file__).resolve().parent.parent / "scripts" / "plan_sweep.py"
    spec = importlib.util.spec_from_file_location("plan_sweep", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registered = set(all_specs())
    stale = sorted(set(mod.ALLOWED) - registered)
    assert not stale, f"plan_sweep.ALLOWED names not in registry: {stale}"
    for name, (cap, why) in mod.ALLOWED.items():
        assert cap >= 1 and why.strip(), f"{name}: empty allowance rationale"


def test_subtree_skeleton_sees_multiset_preserving_rearrangement(spark):
    """The ordered-skeleton entry in a nested-loop node's shape closes
    the class-multiset blind spot (r14 review): a filter moved from one
    side of a cross to the other preserves every ``Cls:count`` entry
    AND the leaf sets, so only the ordered tree distinguishes the two
    plans — a substitution the compare gate must see."""
    from pyspark.sql import functions as F

    pf = _plan_fingerprint_mod()
    a = spark.range(10).select(F.col("id").alias("a"))
    b = spark.range(10).select(F.col("id").alias("b"))
    left_filtered = a.filter("a > 3").hint("broadcast").crossJoin(b)
    right_filtered = a.hint("broadcast").crossJoin(b.filter("b > 3"))
    n1 = pf.nested_loop_nodes(left_filtered)
    n2 = pf.nested_loop_nodes(right_filtered)
    assert len(n1) == len(n2) == 1
    s1, s2 = n1[0]["shape"], n2[0]["shape"]
    tree1 = [e for e in s1 if e.startswith("tree:")]
    tree2 = [e for e in s2 if e.startswith("tree:")]
    assert len(tree1) == len(tree2) == 1, "exactly one skeleton entry"
    # identical multisets (same classes, same counts, same leaves) ...
    assert [e for e in s1 if not e.startswith("tree:")] == [
        e for e in s2 if not e.startswith("tree:")
    ]
    assert n1[0]["leaves"] == n2[0]["leaves"]
    # ... but the ordered tree tells them apart
    assert tree1 != tree2


def test_pinned_expression_captures_stable_across_sessions(spark, q):
    """Cross-SESSION determinism of the three pinned expression
    captures (conditions, aggregates, window/sort): recompute them
    live in THIS JVM session for three representative pins and compare
    byte-for-byte against the committed PLANSWEEP artifact, which a
    PRIOR session generated.  ``.sql()`` rendering was probed
    deterministic across plan builds within one session; this is the
    stronger property the round-over-round plansweep_compare diff
    actually relies on — a session-dependent fragment (an expr-id leak,
    a nondeterministically numbered ``_groupingexpression``/``_w0``)
    would flag every pin in the NEXT round's compare, and should fail
    here instead.  Full-pin-set version executed at r17 close: 48/48
    byte-identical.  Skips cleanly on artifacts predating the capture
    fields (the compare gate's bootstrap rule)."""
    import importlib.util
    import json
    from pathlib import Path

    # the shared round-number-parsing discovery, NOT a lexicographic
    # glob sort (which would pick r99 over r100 across a digit boundary)
    repo = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "plansweep_compare", repo / "scripts" / "plansweep_compare.py"
    )
    pc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pc)
    arts = pc.newest_artifacts(repo)
    assert arts, "no PLANSWEEP_r*.json committed"
    art = json.loads(arts[-1].read_text())
    if "_pinned_windows" not in art:
        pytest.skip("newest artifact predates the expression captures")
    mod = _plan_fingerprint_mod()
    # one join/filter-heavy, one aggregate-heavy, one window/sort-heavy,
    # and the CSE-heavy pin whose _common_expr_N aliases exposed the one
    # session-counter nondeterminism the projection capture normalizes
    for name in (
        "dedup_minhash_capped_pairs",
        "q1_pricing_summary",
        "sessions_max_concurrency",
        "dedup_minhash_eval",
    ):
        df = q[name](spark, SF)
        assert mod.condition_texts(df) == art["_pinned_conditions"][name], name
        assert mod.aggregate_texts(df) == art["_pinned_aggregates"][name], name
        assert mod.window_sort_texts(df) == art["_pinned_windows"][name], name
        if "_pinned_projections" in art:
            assert (
                mod.projection_texts(df) == art["_pinned_projections"][name]
            ), name

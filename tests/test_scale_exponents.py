"""Scaling-exponent gate: super-linear growth must be deliberate.

Every wall-time gate before round 14 compared rounds at a FIXED sf, so
a query whose cost grows super-linearly in the data — stable
round-over-round, innocent plan, catastrophic at 1000x — reddened
nothing.  scripts/scale_exponents.py fits each registered query's
measured growth exponent between two whole-registry sweeps at different
scale factors, against the query's OWN input growth (the synthetic
tables scale unevenly: TPC-H planes 10x per decade, documents 10x only
in the top decade, embeddings 4x), and the committed
SCALE_EXPONENTS.json is gated here:

* every registered query is measured (adding a query reddens until the
  artifact is refreshed with the new name),
* every material super-linear reading is a DOCUMENTED baseline (the
  all-pairs exactness pair that calibrates the recall evals), and
* every documented baseline is still actually flagged (a stale
  allowance reddens, so the allowlist can only shrink honestly — the
  plan-sweep ALLOWED rule).

The artifact is refreshed when queries change (the rewindow ritual
lists which) or are added, not per-round: exponents are a property of
the query code, and the per-round fixed-sf timing gate already covers
drift of the code that exists.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

from discogs_etl_spark import registry

REPO = Path(__file__).resolve().parent.parent
ARTIFACT = REPO / "SCALE_EXPONENTS.json"


def _mod():
    spec = importlib.util.spec_from_file_location(
        "scale_exponents", REPO / "scripts" / "scale_exponents.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _artifact() -> dict:
    return json.loads(ARTIFACT.read_text())


def test_artifact_covers_every_registered_query():
    art = _artifact()
    measured = {n for n in art if not n.startswith("_")}
    registered = set(registry.all_specs())
    missing = sorted(registered - measured)
    assert missing == [], (
        f"{len(missing)} registered queries have no scaling-exponent "
        f"measurement: {missing[:10]} — refresh SCALE_EXPONENTS.json "
        "(two time_registry sweeps + scripts/scale_exponents.py --json)"
    )
    stray = sorted(measured - registered)
    assert stray == [], f"artifact names unregistered queries: {stray[:10]}"


def test_no_undocumented_superlinear_growth():
    mod = _mod()
    art = {n: r for n, r in _artifact().items() if not n.startswith("_")}
    bad = mod.undocumented_flags(art)
    assert bad == [], (
        f"material super-linear growth without a documented baseline "
        f"rationale: {bad} — audit the plan and match cardinality; if "
        "deliberate, add to SUPERLINEAR_BASELINES with the why"
    )


def test_no_stale_superlinear_allowances():
    mod = _mod()
    art = {n: r for n, r in _artifact().items() if not n.startswith("_")}
    stale = mod.stale_allowances(art)
    assert stale == [], (
        f"SUPERLINEAR_BASELINES entries no longer flagged by the "
        f"artifact: {stale} — the query was fixed or re-measured; prune "
        "the allowance"
    )


def test_allowlists_are_registered_queries():
    mod = _mod()
    registered = set(registry.all_specs())
    for name in list(mod.SUPERLINEAR_BASELINES) + list(mod.ANALYTIC_SUPERLINEAR):
        assert name in registered, f"allowlist names unregistered query {name}"


def test_artifact_meta_matches_script_constants():
    # The artifact must have been generated under the SAME thresholds the
    # gate reasons with — a threshold change without regeneration would
    # silently grade old readings on a new curve.
    mod = _mod()
    meta = _artifact()["_meta"]
    assert meta["alpha_flag"] == mod.ALPHA_FLAG
    assert meta["material_sec"] == mod.MATERIAL_SEC
    assert meta["floor_sec"] == mod.FLOOR_SEC
    assert meta["min_data_ratio"] == mod.MIN_DATA_RATIO


def test_exponent_math_and_gate_can_fail():
    mod = _mod()
    rows_lo = {t: 100 for t in mod.TABLE_NAMES}
    rows_hi = {t: 1000 for t in mod.TABLE_NAMES}
    lo = {"quad": 2.0, "lin": 2.0, "fixed": 2.0, "broken": None}
    hi = {"quad": 200.0, "lin": 20.0, "fixed": 2.0, "broken": 3.0}
    oracles = {
        "quad": "SELECT * FROM lineitem",
        "lin": "SELECT * FROM orders",
        "fixed": "SELECT 1",  # no scaling input
        "broken": "SELECT * FROM part",
    }
    table = mod.exponents(lo, hi, oracles, rows_lo, rows_hi)
    assert table["quad"]["alpha"] == 2.0 and table["quad"]["class"] == "superlinear"
    assert table["lin"]["alpha"] == 1.0 and table["lin"]["class"] == "linearish"
    assert table["fixed"]["class"] == "fixed-input"
    assert table["broken"]["class"] == "error"
    assert mod.undocumented_flags(table) == ["quad"]


def test_immaterial_readings_are_recorded_not_gated():
    # A sub-floor wall with a steep exponent is visibility, not a flag:
    # single-run noise owns that region (documented instrument limit).
    mod = _mod()
    rows_lo = {t: 100 for t in mod.TABLE_NAMES}
    rows_hi = {t: 1000 for t in mod.TABLE_NAMES}
    table = mod.exponents(
        {"small": 0.02}, {"small": 1.5}, {"small": "SELECT * FROM events"},
        rows_lo, rows_hi,
    )
    assert table["small"]["class"] == "immaterial"
    assert table["small"]["alpha"] == 1.0  # floor-clamped fit still recorded
    assert mod.undocumented_flags(table) == []


def test_oracle_table_extraction_is_word_bounded():
    mod = _mod()
    assert mod.oracle_tables(
        "SELECT o_orderkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    ) == ["orders", "lineitem"]
    # column prefixes and substrings must not match
    assert mod.oracle_tables("SELECT o_orderkey, l_partkey FROM foo") == []
    assert mod.oracle_tables(None) == []


def test_known_plane_ratios_in_artifact():
    # The per-table data ratio is the instrument's load-bearing
    # correction: the
    # quadratic cosine baseline reads alpha ~2 only against embeddings'
    # true 4x growth (1.21 against the raw sf labels).  Pin the planes.
    meta = _artifact()["_meta"]
    assert meta["hi_rows"]["lineitem"] / meta["lo_rows"]["lineitem"] == 10.0
    assert meta["hi_rows"]["documents"] / meta["lo_rows"]["documents"] == 10.0
    assert meta["hi_rows"]["embeddings"] / meta["lo_rows"]["embeddings"] == 4.0
    art = _artifact()
    assert art["dedup_embedding_cosine"]["ratio"] == 4.0
    assert art["dedup_embedding_cosine"]["alpha"] > 1.8  # quadratic by design

"""Gate on the committed 100× scale-probe evidence (SCALE_r*.json).

``python -m tests.scale_probe --copies=100 --out=.scratch/sf10 <queries>``
measures every probed query warm at sf0.1 and at 100× and records a JSON
artifact; a run committed as ``SCALE_r{N}.json`` at the repo root is the
round's scale evidence. These tests validate the LATEST committed record,
so a regression that slips a quadratic plan or a super-linear runtime into
a probed query fails the suite as soon as a new probe run is recorded —
and the assertions document what "survives 100×" concretely means.

No Spark session needed — this is an artifact gate, not a probe run
(the probe itself takes ~15 min and is run per-round, not per-test).
"""

from __future__ import annotations

import glob
import json
import os

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: 100× data on a fixed 32-core box: a linear operator lands well under
#: 100×; per-partition-quadratic operators (v6's label GEMM) stay bounded
#: by the partition contract. Anything past this is a scale regression.
MAX_RATIO = 60.0

#: Deliberate quadratic BASELINES, kept probed as the witness the LSH/IVF
#: paths are graded against (v4-v6's scale paths are v5/v7/v8 — r6-r8
#: verdicts). Their inherent per-label-pair growth hugs the linear gate
#: (v6 measured 55.1× in r8, 63.8× in r9 with identical plans), so each
#: carries its OWN bound — high enough for the quadratic physics, low
#: enough that a REGRESSION past the partition contract still fails.
QUADRATIC_BASELINES = {"v6_gemm_neardup": 100.0}

#: families that must appear in the probe set for the evidence to count
REQUIRED = {
    "d5_lsh_jaccard_dedup",     # MinHash LSH end-to-end
    "v5_lsh_bucketed_neardup",  # hyperplane LSH + tiled GEMM (the r4 OOM fix)
    "d10_contamination_check",  # decontamination join
    "d12_persisted_lsh_probe",  # zero-shuffle index probe
    "d13_contamination_bloom",  # bloom-prefiltered decontamination
    "v7_ivf_probe",             # IVF ANN
    "j2_revenue_topk",          # pre-aggregated fact join
    "e3_session_window",        # stateful event-time op
}


def _latest_record() -> dict:
    from .plan_manifest import round_num

    paths = sorted(glob.glob(os.path.join(_ROOT, "SCALE_r*.json")), key=round_num)
    if not paths:
        pytest.skip("no committed SCALE_r*.json probe record yet")
    with open(paths[-1]) as fh:
        rec = json.load(fh)
    rec["_round"] = round_num(paths[-1])
    return rec


def _catalog_round() -> int:
    """The round the catalog was last stamped for — the max last_windowed
    round in window_history.json (every round's window build stamps it)."""
    from etl_pipeline_telecom_spark.catalog import rotation_policy

    return max(rotation_policy()["last_windowed"].values())


#: query families with NO probe row — the ONLY allowed coverage gaps, each
#: with its documented reason. st*: streaming replay harnesses are out of
#: probe scope by design (r4 decision); every st op's BATCH twin is probed
#: (st1/st3→e1/e3, st7→d13, st9→dq4, st10→p4, st11→g2) and pipe5 probes
#: the incremental-curation streaming path end-to-end.
EXCLUDED_FAMILIES = {"st"}


def _family(name: str) -> str:
    import re

    return re.match(r"^([a-z]+)", name.split("[")[0].split("_")[0]).group(1)


def test_probe_round_not_stale():
    """r15 (VERDICT r14 item 2): the gate used to accept arbitrarily stale
    probes — it globbed SCALE_r*.json and took the newest, so a hung run
    (r14's exact failure) left every scale assertion silently passing
    against the PRIOR round's evidence. The newest committed probe must be
    at most 1 round behind the catalog's stamped round."""
    rec = _latest_record()
    cat_round = _catalog_round()
    assert rec["_round"] >= cat_round - 1, (
        f"scale evidence is stale: newest probe is r{rec['_round']} but the "
        f"catalog is stamped r{cat_round} — re-run tests/scale_probe.py and "
        "commit SCALE_r{N}.json"
    )


def test_probe_covers_every_catalog_family():
    """r15 (VERDICT r14 item 2): every query family present in the catalog
    must have at least one probe row (the K-rule discipline, applied to
    scale evidence), except the documented EXCLUDED_FAMILIES."""
    rec = _latest_record()
    from etl_pipeline_telecom_spark import catalog

    cat_fams = {_family(n) for n in catalog.queries()}
    probed_fams = {_family(q["query"]) for q in rec["queries"]}
    missing = cat_fams - probed_fams - EXCLUDED_FAMILIES
    assert not missing, f"catalog families with no scale-probe row: {sorted(missing)}"


def test_probe_record_is_complete_and_untimed():
    """r15: the hardened probe writes "partial": true into every
    incremental flush and marks watchdog-cancelled rows "timed_out" — a
    committed record must be a COMPLETED run with zero timed-out rows."""
    rec = _latest_record()
    if rec["_round"] < 15:
        pytest.skip("record predates the hang-proofed probe (r15)")
    assert not rec.get("partial"), "committed probe record is a partial flush"
    hung = [q["query"] for q in rec["queries"] if q.get("timed_out")]
    assert not hung, f"probe rows hit the row watchdog: {hung}"


def test_probe_covers_required_families():
    rec = _latest_record()
    probed = {q["query"] for q in rec["queries"]}
    missing = REQUIRED - probed
    assert not missing, f"scale evidence missing families: {sorted(missing)}"


def test_no_disallowed_plan_nodes_at_scale():
    rec = _latest_record()
    bad = {q["query"]: q["disallowed_plan_nodes"] for q in rec["queries"] if q["disallowed_plan_nodes"]}
    assert not bad, f"cartesian/NLJ plans at 100×: {bad}"
    assert rec.get("strict_violations", 0) == 0


def test_every_probed_query_scales_sublinearly():
    # r11+: judge ratio_adj (t_big / max(t_small, 0.5s)) where recorded —
    # sub-second sf0.1 denominators flap the raw ratio across rounds with
    # identical plans (m7 read 31.0× then 46.5× in r9/r10 from a
    # 0.632→0.45 s denominator while the 100× wall moved ~6%); the raw
    # ratio stays in the artifact for reference
    rec = _latest_record()

    def gated_ratio(q: dict) -> float:
        # r14+: a row the probe re-measured standalone and machine-
        # adjudicated as host noise (plan unchanged, standalone wall back
        # at the prior round's level) is judged by the RE-measurement —
        # the structural replacement for r13's hand-merged e3b row
        if q.get("noise_adjudication") == "host_noise":
            return q.get("remeasured_ratio_adj", q.get("ratio_adj", q["ratio"]))
        return q.get("ratio_adj", q["ratio"])

    over = {
        q["query"]: gated_ratio(q)
        for q in rec["queries"]
        if gated_ratio(q) > QUADRATIC_BASELINES.get(q["query"], MAX_RATIO)
    }
    assert not over, f"queries slower than {MAX_RATIO}× at 100× data: {over}"


def test_skew_probes_present_and_bounded():
    """r5+: hot-key variants (30% of events on one user / 30% of orders on
    one customer at 100×) must be probed for the skew-sensitive shapes and
    stay inside the same gate — a salting/AQE regression shows up as a
    straggler cliff here."""
    rec = _latest_record()
    probed = {q["query"]: q["ratio"] for q in rec["queries"]}
    required_skew = {
        "j7_salted_join[skew]",
        "e3_session_window[skew]",
        "p2_upsert_latest[skew]",
    }
    # r6+: funnels under a hot user, ingest gate under a hot fingerprint
    required_skew |= {
        "e8_funnel_steps[skew]",
        "e9_windowed_funnel[skew]",
        "pipe2_ingest_gate[skew]",
    }
    missing = required_skew - set(probed)
    if missing and not any("[skew]" in q for q in probed):
        pytest.skip("record predates skew probes")
    assert not missing, f"missing skew evidence: {sorted(missing)}"
    over = {q: r for q, r in probed.items() if q in required_skew and r > MAX_RATIO}
    assert not over, f"skew straggler cliff: {over}"


def test_cc_crafted_rounds_stay_flat():
    """r7+: the connected-components star alternation on the crafted
    chain+giant-star graph must grow its round count LOGARITHMICALLY as
    the graph grows 100×. Rounds track log2(chain length) almost exactly
    (measured 10 → 17 at 500 → 50k chain nodes; log2 says 9 → 15.6), so
    the gate allows log2(100)≈7 extra rounds plus slack — the original
    "+3" allowance was authored before the probe first ran and is
    mathematically unreachable for ANY O(log n) algorithm at 100×. The
    failure mode this guards (diameter-bound propagation) would show
    rounds_big ≈ 50_000, not ≈ rounds_small + 7; the doubling cap below
    catches any such blow-up with orders of magnitude to spare."""
    rec = _latest_record()
    rows = [q for q in rec["queries"] if q["query"].startswith("cc_chain_giant")]
    if not rows:
        pytest.skip("record predates the crafted CC probe (r7)")
    row = rows[0]
    assert row["rounds_big"] <= row["rounds_small"] + 9, row  # log2(100)+slack
    assert row["rounds_big"] <= 2 * row["rounds_small"], row  # not diameter-bound
    assert row["ratio"] <= MAX_RATIO, row


def test_fresh_probe_rows_carry_adjudication_fields():
    """r11+: rows probed with the hardened probe must carry the
    denominator-floored ratio and the plan fingerprint — the fields that
    make round-over-round ratio moves self-adjudicating (--prev). Only
    checked when the record has any such row (older carried rows are
    grandfathered verbatim)."""
    rec = _latest_record()
    fresh = [q for q in rec["queries"] if "ratio_adj" in q]
    if not fresh:
        pytest.skip("record predates the hardened probe (r11)")
    for q in fresh:
        assert q["ratio_adj"] <= q["ratio"] + 1e-9, q["query"]  # floor only lowers
        assert isinstance(q.get("plan_hash"), str) and len(q["plan_hash"]) >= 8, (
            f"{q['query']}: fresh probe row missing plan_hash"
        )


def test_fresh_probe_rows_carry_cold_walls():
    """r12+: probe rows record t_big_cold_sec so a cached op's honest
    full-pipeline cost rides in the artifact (VERDICT r11 advice 1) —
    the warm wall alone would grade a cache read. Grandfathered for
    records predating the field."""
    rec = _latest_record()
    fresh = [q for q in rec["queries"] if "t_big_cold_sec" in q]
    if not fresh:
        pytest.skip("record predates the cold-wall field (r12)")
    for q in fresh:
        assert isinstance(q["t_big_cold_sec"], (int, float)) and q["t_big_cold_sec"] > 0, (
            q["query"]
        )

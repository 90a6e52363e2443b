"""Suite enforcement of the plan-hash manifest (VERDICT r4 #2).

Replaces the hand-curated ``_MUST_BE_IN_WINDOW`` discipline with two
automated invariants:

1. **Freshness**: the committed ``PLAN_MANIFEST.json`` was generated from
   the current source tree (recomputed per-file sha == recorded sha). A
   stale manifest cannot pass — regenerate with
   ``python -m tests.plan_manifest`` after any package edit.
2. **Window rule**: every query whose optimized-plan hash differs from
   ``PLAN_BASELINE.json`` (the plans as of the last zero-fail full
   verification) must sit in ``DRIVER_WINDOW`` — so plan drift, including
   drift caused by a shared-helper edit, always gets a fresh driver
   verdict. The stored diff is recomputed here from the two files, not
   trusted.

Also: queries that have NEVER appeared in any CORRECTNESS artifact
(driver rounds or full sweeps) must be in-window — new queries cannot
launch unverified.
"""

from __future__ import annotations

import glob
import json
import os

from etl_pipeline_telecom_spark import catalog

from .plan_manifest import BASELINE, MANIFEST, source_hashes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_manifest_is_fresh_and_complete():
    assert os.path.exists(MANIFEST), "run python -m tests.plan_manifest"
    m = _load(MANIFEST)
    assert set(m["plans"]) == set(catalog.specs()), "manifest does not cover the catalog"
    assert m["source_sha"] == source_hashes(), (
        "PLAN_MANIFEST.json is stale vs the source tree — regenerate with "
        "python -m tests.plan_manifest (and keep its changed_vs_baseline ⊆ DRIVER_WINDOW)"
    )


def test_plan_drift_is_in_driver_window():
    m, b = _load(MANIFEST), _load(BASELINE)
    changed = sorted(n for n, h in m["plans"].items() if b["plans"].get(n) != h)
    assert changed == m["changed_vs_baseline"], "manifest's stored diff is dishonest"
    out_of_window = set(changed) - set(catalog.DRIVER_WINDOW)
    assert not out_of_window, (
        f"plans drifted from their last-verified form but are NOT in the driver "
        f"window: {sorted(out_of_window)} — add them to DRIVER_WINDOW or revert"
    )


def test_baseline_is_vouched_by_a_zero_fail_sweep():
    b = _load(BASELINE)
    assert b.get("verified_by"), "baseline must cite the sweep artifact that vouches for it"
    art = _load(os.path.join(REPO, b["verified_by"]))
    assert art["fails"] == []
    assert set(b["plans"]) <= set(art["results"])


def test_never_verified_queries_are_in_window():
    verdicted: set[str] = set()
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(REPO, "CORRECTNESS_full_r*.json")
    ):
        verdicted |= set(_load(p).get("results", _load(p)) or {})
    never = set(catalog.specs()) - verdicted
    missing = never - set(catalog.DRIVER_WINDOW)
    assert not missing, f"queries with no verdict anywhere must be in-window: {sorted(missing)}"

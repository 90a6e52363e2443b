"""Catalog discipline guards — cheap invariants that keep future query
additions driver-compatible without running Spark.

The driver hash-compares by sorted COLUMN NAME, so an unaliased computed
column (e.g. ``sum(l_quantity)``) breaks parity even with identical
values; these checks fail fast at registration level.
"""

from __future__ import annotations

import re

from etl_pipeline_telecom_spark import catalog

SPECS = catalog.specs()


def test_every_query_has_doc_and_tags():
    for name, spec in SPECS.items():
        assert spec.doc, f"{name} has no doc"
        assert spec.tags, f"{name} has no tags"


# every sql=None query must say why in its doc/source: iterative,
# engine-specific, or watermark-dependent. a15 graduated to oracle-backed
# in r3 (scalar quartile rows + exact cents interpolation + deterministic
# sketch bound); r5 graduations: st3 (sentinel-replay closes all sessions
# → e3's SQL is exact), a14/a16 (sketch outputs recast as deterministic
# bound/coverage booleans the oracle asserts TRUE). r7 graduations close
# the set: d12_index_build returns a per-band summary READ BACK from the
# persisted index vs DuckDB recomputing the band rows; d9 returns its
# found pairs graded against the exact Jaccard-≥0.5 set (the grade is
# deterministic even though MLlib's hash family isn't DuckDB-computable).
_JUSTIFIED_ROWS_ONLY: set[str] = set()


def test_rows_only_queries_are_justified():
    rows_only = {n for n, s in SPECS.items() if s.sql is None}
    assert rows_only == _JUSTIFIED_ROWS_ONLY, (
        f"new rows-only query needs an explicit justification: {rows_only}"
    )


def test_oracle_sql_has_no_unaliased_aggregates():
    # a top-level aggregate without AS would produce a column named like
    # "sum(x)" — sorted-by-name hashing then diverges from the Spark alias
    bad = re.compile(r"SELECT[^(]*\b(SUM|COUNT|AVG|MIN|MAX)\s*\([^)]*\)\s*(,|FROM)", re.I)
    for name, spec in SPECS.items():
        if spec.sql is None:
            continue
        for line in spec.sql.split("\n"):
            stripped = line.strip()
            if bad.search(stripped) and " AS " not in stripped.upper():
                raise AssertionError(f"{name}: possibly unaliased aggregate: {stripped}")


def test_query_names_are_stable_identifiers():
    for name in SPECS:
        assert re.fullmatch(r"[a-z][a-z0-9_]+", name), name


# Window rule (ADVICE r2): anything NEW (no verdict yet) or whose PLAN
# changed this round MUST sit in the driver's 50-entry window; proven
# unchanged queries may rotate out. Since r5 this is enforced
# AUTOMATICALLY by the plan-hash manifest (tests/test_plan_manifest.py)
# instead of a hand-curated set.


def test_driver_window_leads_query_order():
    """The driver verifies only the first 50 entries of queries()."""
    names = list(catalog.queries())
    assert len(names) == len(set(names))
    assert list(names[: len(catalog.DRIVER_WINDOW)]) == list(catalog.DRIVER_WINDOW)


def test_registry_complete_vs_window():
    # every DRIVER_WINDOW name registered, and window is exactly 50 wide
    assert len(catalog.DRIVER_WINDOW) == 50
    assert set(catalog.DRIVER_WINDOW) <= set(SPECS)


# ---------------------------------------------------------------------------
# Rotation guarantee (VERDICT r8 item 7): every query gets a driver
# verdict at least every ROTATION_K rounds, enforced via the tracked
# last-windowed map in window_history.json.
# ---------------------------------------------------------------------------


def test_rotation_policy_covers_registry_exactly():
    pol = catalog.rotation_policy()
    assert set(pol["last_windowed"]) == set(SPECS)


def test_rotation_policy_consistent_with_current_window():
    pol = catalog.rotation_policy()
    cur = pol["current_round"]
    lw = pol["last_windowed"]
    for n in catalog.DRIVER_WINDOW:
        assert lw[n] == cur, f"{n} is in this round's window but not stamped {cur}"
    for n in set(SPECS) - set(catalog.DRIVER_WINDOW):
        assert lw[n] < cur, f"{n} stamped current round but not in the window"


def test_rotation_k_is_arithmetically_feasible():
    """Schedulability law (r12 generalization of the original ``50·K ≥
    N + 40``, whose +40 was the drift budget 8 × K=5 in disguise): over
    any K-round cycle the 50-slot window issues 50·K verdicts, the
    drift cohort (new/changed queries; historical max 7/round, budgeted
    8) consumes up to 8·K of them, and the rest must cover the whole
    registry once — N ≤ (50−8)·K. The policy keeps K MINIMAL under
    that law (``k_rule`` in window_history.json): the staleness
    guarantee stays as tight as the window arithmetic allows, and
    loosening K without registry growth forcing it fails here."""
    import math

    pol = catalog.rotation_policy()
    k = pol["rotation_k"]
    assert k * 50 >= len(SPECS) + 8 * k
    assert k == max(5, math.ceil(len(SPECS) / 42)), (
        "rotation_k must be the MINIMAL feasible K, not a convenience dial"
    )


def test_rotation_backlog_recorded_and_shrinking():
    """Catch-up schedule: the count of queries ≥K rounds stale must be
    recorded for the current round, match the map, and shrink every
    round until zero."""
    pol = catalog.rotation_policy()
    cur, k = pol["current_round"], pol["rotation_k"]
    lw = pol["last_windowed"]
    computed = sum(1 for v in lw.values() if cur - v >= k)
    assert pol["backlog"][str(cur)] == computed
    prev = pol["backlog"].get(str(cur - 1))
    if prev is not None and prev > 0:
        assert computed < prev, "rotation backlog did not shrink this round"


def test_rotation_staleness_bound_enforced():
    """THE guarantee: from enforced_from_round on, no query goes more
    than ROTATION_K rounds without a driver verdict."""
    pol = catalog.rotation_policy()
    cur, k = pol["current_round"], pol["rotation_k"]
    if cur >= pol["enforced_from_round"]:
        worst = max((cur - v, n) for n, v in pol["last_windowed"].items())
        assert worst[0] <= k, f"{worst[1]} is {worst[0]} rounds stale (limit {k})"


def test_window_fill_is_stalest_first():
    """No slot is wasted: any query EXCLUDED from the window must be no
    staler than the stalest included fill entry — i.e. the fill came from
    the front of stale_rotation_candidates()."""
    pol = catalog.rotation_policy()
    lw = pol["last_windowed"]
    # fill entries = window members that were NOT stamped fresh for a
    # drift/new reason; identify by previous staleness: a member whose
    # pre-stamp round is unknowable here, so assert the weaker closure:
    # the oldest EXCLUDED query is no older than the oldest cohort the
    # window drew from this round (recorded implicitly: excluded minimum)
    excluded_oldest = min(
        (lw[n] for n in set(SPECS) - set(catalog.DRIVER_WINDOW)), default=None
    )
    assert excluded_oldest is not None
    # the catch-up schedule drains oldest-first: while a backlog exists,
    # the excluded-oldest cohort may lag the bound only until
    # enforced_from_round (asserted above); here we pin that the window
    # did not skip an OLDER query in favor of a younger non-drift one —
    # equivalently, every excluded query is at least as fresh as the
    # oldest cohort was BEFORE this round only if backlog is zero.
    if pol["backlog"][str(pol["current_round"])] == 0:
        assert pol["current_round"] - excluded_oldest <= pol["rotation_k"]


def test_rotation_drift_cohort_within_budget():
    """The k_rule's PREMISE, pinned at the round that would break it
    (ADVICE r12): the schedulability law 50·K ≥ N + 8·K budgets at most
    8 window slots per round for the drift cohort (new/changed queries).
    The cohort is recorded per-round in window_history.json's "drift"
    map from r13 on; a round needing 9+ drift slots must split across
    rounds or revisit the law — this fails HERE, not K rounds later via
    the staleness bound."""
    pol = catalog.rotation_policy()
    drift = pol.get("drift", {})
    cur = str(pol["current_round"])
    assert cur in drift, "current round's drift cohort is not recorded"
    cohort = drift[cur]
    assert len(cohort) <= 8, f"drift cohort {len(cohort)} exceeds the 8-slot budget"
    # the cohort leads the window verbatim (window construction rule:
    # new/changed first, then stalest fill)
    assert list(catalog.DRIVER_WINDOW[: len(cohort)]) == list(cohort)

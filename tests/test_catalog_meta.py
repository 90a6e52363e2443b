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

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


def test_rows_only_queries_are_justified():
    # every sql=None query must say why in its doc/source: iterative,
    # engine-specific, or watermark-dependent
    rows_only = {n for n, s in SPECS.items() if s.sql is None}
    # a15 graduated to oracle-backed in r3 (scalar quartile rows + exact
    # cents interpolation + deterministic sketch bound); d12_index_build is
    # the r4 build step of the build/probe split — the index contents are
    # internal representation, the probe (d12_persisted_lsh_probe) carries
    # the d11 oracle that proves the build result-neutral
    assert rows_only == {
        "a14_approx_distinct",
        "a16_freq_items",
        "d9_mllib_minhash",
        "st3_stream_sessionize",
        "d12_index_build",
    }, f"new rows-only query needs an explicit justification: {rows_only}"


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


# Window rule (ADVICE r2): anything NEW (no verdict yet) or whose
# PLAN changed this round MUST sit in the driver's 50-entry window; proven
# unchanged queries may rotate out.
_MUST_BE_IN_WINDOW = {
    # round-4 additions — first-ever driver verdict needed
    "d12_index_build",
    "t10_bpe_pretokenize", "e6_gap_fill", "p2_upsert_latest",
    "sm3_split_assign", "v8_embedding_decontam",
    "e7_cohort_retention", "w9_ntile_buckets", "a18_exact_corr",
    "t11_bigram_topk", "st5_stream_static_join",
    # plans materially changed in round 4: e4 linear rewrite, d12
    # build/probe split, t9 hint drop, v1 guard, v4/v5/v6 tiled GEMM
    # (v5 also carries the new hyperplane literals in plan AND oracle)
    "e4_asof_join", "d12_persisted_lsh_probe", "t9_tfidf_topterms",
    "v1_knn_brute", "v4_embedding_neardup", "v5_lsh_bucketed_neardup",
    "v6_gemm_neardup",
    # round-3 additions whose only verdict is r3 — kept in-window as
    # canaries alongside a4/j2/d1
    "d13_contamination_bloom", "v7_ivf_probe",
}


def test_driver_window_covers_unverified_queries():
    """The driver verifies only the first 50 entries of queries()."""
    names = list(catalog.queries())
    assert len(names) == len(set(names))
    first50 = set(names[:50])
    missing = _MUST_BE_IN_WINDOW - first50
    assert not missing, f"queries with no driver verdict outside the window: {sorted(missing)}"
    assert list(names[: len(catalog.DRIVER_WINDOW)]) == list(catalog.DRIVER_WINDOW)


def test_registry_complete_vs_window():
    # every DRIVER_WINDOW name registered, and window is exactly 50 wide
    assert len(catalog.DRIVER_WINDOW) == 50
    assert set(catalog.DRIVER_WINDOW) <= set(SPECS)

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
    assert rows_only == {
        "a14_approx_distinct",
        "a15_percentile_approx",
        "a16_freq_items",
        "d9_mllib_minhash",
        "st3_stream_sessionize",
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


# Queries the round-1 driver never checked (CORRECTNESS_r01.json covers only
# the first 50 registered entries) plus the two round-1 hash-fails whose
# oracle typing was fixed in round 2 — all MUST sit in the driver's window.
_MUST_BE_IN_WINDOW = {
    "d5_lsh_jaccard_dedup", "d6_simhash", "d7_ngram_jaccard_pairs", "d8_neardup_clusters",
    "d9_mllib_minhash", "v1_knn_brute", "v2_knn_partitioned", "v3_label_centroids",
    "v4_embedding_neardup", "v5_lsh_bucketed_neardup", "v6_gemm_neardup",
    "e1_tumbling_window", "e2_sliding_window", "e3_session_window", "e4_asof_join",
    "e5_band_range_join", "st1_stream_tumbling", "st2_stream_dedup", "st3_stream_sessionize",
    "st4_stream_stream_join", "m1_media_features", "m2_frame_sample", "m3_media_type_stats",
    "dq1_lineitem_checks", "dq2_orders_checks", "a14_approx_distinct", "a15_percentile_approx",
    "a16_freq_items", "a17_grouped_percentiles", "p1_projection_ops", "x1_json_extract",
    "x2_event_type_map", "sm1_hash_sample", "sm2_stratified_sample", "u1_pandas_udf_score",
    "g1_grouped_median", "pipe1_corpus_clean", "r1_unpivot_measures", "r2_orders_by_month",
    "a8_pivot_rate", "a11_null_counts",
    # round-2 additions — first-ever driver verdict needed
    "t6_repetition_stats", "t7_doc_chunks", "d10_contamination_check",
    "d11_incremental_dedup", "t8_chunk_dedup",
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

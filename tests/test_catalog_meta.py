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
        "d8_neardup_clusters",
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

"""Run EVERY catalog query against its DuckDB oracle at sf0.001.

This is the primary correctness gate (SURVEY.md §5.2) — the same
comparison the driver makes at sf0.01, run locally and fast.
"""

from __future__ import annotations

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare

SPECS = catalog.specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df is not None
    if spec.sql is None:
        # rows-only check (driver does the same for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    ok, msg = compare(spark, sf_dir, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"

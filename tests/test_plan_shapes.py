"""Physical-plan shape guards — pin the scale properties the sf1 probes
establish (NOTES_r2.md), so a future edit that silently reintroduces a
pair-row join, an extra shuffle, or a nested-loop join fails here long
before a benchmark notices.

These assert on `explain("formatted")` text at sf0.001 — plan SHAPE is
scale-independent for these queries (no AQE runtime flips below the
broadcast threshold at any probed sf; the probe watches the large-scale
shapes separately).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_pipeline_telecom_spark import catalog

SPECS = catalog.specs()


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        SPECS[name].fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", ["v4_embedding_neardup", "v5_lsh_bucketed_neardup", "v6_gemm_neardup"])
def test_embedding_neardup_never_materializes_pair_rows(spark, sf_dir, name):
    """The near-dup verify is one gram matrix per partition (applyInPandas):
    vectors cross the shuffle once; pair ROWS never do. A self-join here is
    the exact plan that went superlinear at sf1 (78s — NOTES_r2.md)."""
    plan = _plan(spark, sf_dir, name)
    assert "FlatMapGroupsInPandas" in plan, f"{name}: GEMM applyInPandas node missing"
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"{name}: pair-materializing join reappeared: {bad}"


def test_doc_chunking_is_narrow(spark, sf_dir):
    """t7 is tokenize → explode → slice: per-row work only, no shuffle.
    (The single AQE result exchange for the final collect is absent because
    there is no aggregation or join at all.)"""
    plan = _plan(spark, sf_dir, "t7_doc_chunks")
    assert "Exchange" not in plan, "chunking gained a shuffle"
    assert "Generate" in plan  # the chunk-index explode


@pytest.mark.parametrize("name", ["j1_broadcast_join", "j6_star_join"])
def test_dim_joins_broadcast(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_join_is_partial_agg_equijoin(spark, sf_dir):
    """d10: equi-join on the shingle key + hash aggregation. Distinct-count
    aggregates still run as hash aggregates (Expand), never a nested loop."""
    plan = _plan(spark, sf_dir, "d10_contamination_check")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_group_avg_single_shuffle(spark, sf_dir):
    """a4 is scan → partial agg → one exchange → final agg. A second
    exchange means map-side combine broke."""
    plan = _plan(spark, sf_dir, "a4_group_avg")
    # "Exchange (n)" matches the plan-tree line only, not the "(n) Exchange"
    # detail block that formatted mode repeats per node
    assert plan.count("Exchange (") == 1, plan

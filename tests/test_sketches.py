"""Error-bound tests for the approximate/sketch operators.

Sketch values are engine-specific (no DuckDB hash oracle), so the
contract tested here is the one that matters: bounded relative error
against the exact answer computed in the same engine.
"""

from __future__ import annotations

from etl_pipeline_telecom_spark.plans.sketches import (
    a14_approx_distinct,
    a15_percentile_approx,
)


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = a14_approx_distinct(spark, sf_dir).collect()
    assert rows, "no groups"
    for row in rows:
        assert row["within_bound"], f"HLL outside 5% bound for {row['grp']}"


def test_percentile_approx_close_to_exact(spark, sf_dir):
    rows = a15_percentile_approx(spark, sf_dir).collect()
    assert sorted(r["p"] for r in rows) == [0.25, 0.5, 0.75]
    for r in rows:
        assert r["approx_ok"], f"sketch outside 1% bound at p={r['p']}"
        assert r["exact_value"] > 0


def test_percentile_approx_raw_error_bound(spark, sf_dir):
    """The raw sketch error (not just the plan's boolean) stays well inside
    the GK rank guarantee: measured ~1e-4 relative at the test SFs."""
    from etl_pipeline_telecom_spark.sources import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    row = li.select(cents.alias("c")).agg(
        F.percentile_approx("c", [0.25, 0.5, 0.75], 10_000).alias("ap"),
        F.expr("percentile(c, array(0.25, 0.5, 0.75))").alias("ex"),
    ).collect()[0]
    for approx, exact in zip(row["ap"], row["ex"]):
        rel_err = abs(approx - exact) / max(abs(exact), 1e-9)
        assert rel_err < 0.01, f"quantile rel err {rel_err:.6f} ({approx} vs {exact})"


def test_freq_items_contains_true_heavy_hitters(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.sketches import a16_freq_items
    from etl_pipeline_telecom_spark.sources import load_table
    import pyspark.sql.functions as F

    row = a16_freq_items(spark, sf_dir).collect()[0]
    assert row["n_heavy"] > 0, "fixture should have heavy hitters at 15% support"
    assert row["all_heavy_found"]  # sketch may over-report, must never miss

    # independent raw-sketch check (the catalog form folds this to a boolean)
    orders = load_table(spark, sf_dir, "orders")
    found = set(orders.stat.freqItems(["o_orderpriority"], support=0.15).collect()[0][0])
    total = orders.count()
    true_heavy = {
        r["o_orderpriority"]
        for r in orders.groupBy("o_orderpriority").count().collect()
        if r["count"] / total > 0.15
    }
    assert true_heavy <= found

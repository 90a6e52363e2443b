"""Bucketed co-located join: the write-once/shuffle-never contract.

Asserts at the PLAN level (no Exchange nodes) and at the value level
(bucketed join ≡ plain join) — the property that matters at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_telecom_spark.sources import load_table
from etl_pipeline_telecom_spark.sources.bucketing import (
    plan_has_shuffle,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", str(base / "orders"), buckets=8, keys=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", str(base / "lineitem"), buckets=8, keys=["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _joined(spark, bucketed_tables):
    o, l = bucketed_tables
    return read_bucketed(spark, o).join(
        read_bucketed(spark, l), F.col("o_orderkey") == F.col("l_orderkey")
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # sort-merge join must not introduce an Exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = _joined(spark, bucketed_tables)
        assert not plan_has_shuffle(j), j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    o, _ = bucketed_tables
    agg = read_bucketed(spark, o).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert not plan_has_shuffle(agg)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    bucketed_count = _joined(spark, bucketed_tables).count()
    plain = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert bucketed_count == plain.count()


def test_d12_probe_crafted_collision_and_miss(spark, tmp_path):
    """Deterministic edge pin for the persisted-index probe: an exact copy
    of an old document (identical signature → collides in EVERY band) must
    come back as its best match with jaccard 1.0; a shingle-disjoint new
    document must produce NO row; and the probe must equal d11's
    recompute-everything form on the same corpus (index result-neutrality
    on data where we KNOW the right answer, not just the fixture hash)."""
    import hashlib
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.dedup import (
        d11_incremental_dedup,
        d12_persisted_lsh_probe,
    )

    texts = {
        # ids avoid %10==0 (no dup-reinsertion) — %7: 1,8 old; 3,17 new
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu",
        3: "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu",
        8: "one two three four five six seven eight nine ten eleven twelve",
        17: "red orange yellow green blue indigo violet cyan magenta umber teal pink",
    }
    table = pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["crafted"] * 4, pa.string()),
        "n_chars": pa.array([len(t) for t in texts.values()], pa.int64()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    abs_dir = os.path.abspath(str(tmp_path))
    base = "".join(c if c.isalnum() else "_" for c in abs_dir.rstrip("/").rsplit("/", 1)[-1])
    index_table = f"lsh_band_index_{base}_{hashlib.sha1(abs_dir.encode()).hexdigest()[:8]}"
    index_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", index_table
    )
    try:
        probe = {
            r["new_doc_id"]: (r["match_doc_id"], r["jaccard"])
            for r in d12_persisted_lsh_probe(spark, str(tmp_path)).collect()
        }
        assert probe == {3: (1, 1.0)}, probe
        recompute = {
            r["new_doc_id"]: (r["match_doc_id"], r["jaccard"])
            for r in d11_incremental_dedup(spark, str(tmp_path)).collect()
        }
        assert probe == recompute
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index_table}")
        shutil.rmtree(index_path, ignore_errors=True)

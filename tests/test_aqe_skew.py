"""AQE skew-join splitting: prove the session's adaptive config actually
splits a pathological partition at runtime.

Manual salting (j7) is for keys bigger than an executor; this pins the
automatic path — AQE detects the oversized partition after the shuffle
and splits it across tasks, visible as ``skew=true`` on the join node.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def skew_confs(spark):
    """Shrink AQE's skew thresholds so local-scale data triggers the path."""
    saved = {}
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 90% of fact rows hash to key 0 — one shuffle partition dwarfs the rest
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    joined = fact.join(dim, "k")
    # collect() executes THIS DataFrame's own QueryExecution (count() would
    # build a separate plan and leave this one isFinalPlan=false)
    n = len(joined.collect())
    assert n == 200_000  # every fact key exists in dim → row-preserving join
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:2000]}"

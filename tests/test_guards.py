"""The quadratic baselines (v1, d7) must REFUSE oversized inputs at
plan-construction time (VERDICT r3 item 5) — a caller pointing them at a
full corpus gets a ValueError, not a cluster-killing job."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_telecom_spark import guards
from etl_pipeline_telecom_spark.plans import dedup, similarity


def test_assert_bounded_input_raises_past_bound(spark):
    big = spark.range(100_000).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="quadratic baseline"):
        guards.assert_bounded_input(big, 64, "test input")


def test_assert_bounded_input_passes_within_bound(spark):
    small = spark.range(10)
    guards.assert_bounded_input(small, 64, "test input")  # no raise


def test_d7_refuses_oversized_corpus(spark, tmp_path):
    """A synthetic 25k-doc corpus exceeds d7's 20k bound → builder raises
    before any shingle join is planned."""
    docs = spark.range(25_000).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta").alias("text"),
        F.lit("en").alias("lang"),
        F.lit(22).alias("n_chars"),
    )
    docs.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    with pytest.raises(ValueError, match="d7_ngram_jaccard_pairs"):
        dedup.d7_ngram_jaccard_pairs(spark, str(tmp_path))


def test_v1_guard_is_wired(spark, sf_dir, monkeypatch):
    """v1's query side is bounded by construction (vec_id < 10); assert the
    guard actually runs in the builder so a future edit loosening the
    filter cannot silently unbound it."""
    calls = []

    def spy(df, max_rows, what):
        calls.append((max_rows, what))

    monkeypatch.setattr(guards, "assert_bounded_input", spy)
    similarity.v1_knn_brute(spark, sf_dir)
    assert calls == [(64, "v1_knn_brute query side")]


def test_v8_guard_is_wired(spark, sf_dir, monkeypatch):
    """v8's eval side is small at every fixture sf; assert the bounded-
    eval-benchmark contract (≤65,536 rows) is actually enforced in the
    builder, so the broadcast can never silently grow data-sized."""
    calls = []

    def spy(df, max_rows, what):
        calls.append((max_rows, what))

    monkeypatch.setattr(guards, "assert_bounded_input", spy)
    similarity.v8_embedding_decontam(spark, sf_dir)
    assert calls == [(65536, "v8_embedding_decontam eval side")]

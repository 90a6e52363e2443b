"""Connected-components clustering vs a python union-find ground truth."""

from __future__ import annotations

from etl_pipeline_telecom_spark.plans.dedup import d5_lsh_jaccard_dedup
from etl_pipeline_telecom_spark.plans.pipeline import d8_neardup_clusters


def _union_find_reps(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_clusters_match_union_find(spark, sf_dir):
    pairs = [(r["doc_a"], r["doc_b"]) for r in d5_lsh_jaccard_dedup(spark, sf_dir).collect()]
    assert pairs, "fixture corpus should produce near-dup pairs"
    expected = _union_find_reps(pairs)
    got = {r["doc_id"]: r["rep"] for r in d8_neardup_clusters(spark, sf_dir).collect()}
    assert got == expected

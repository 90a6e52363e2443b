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


def test_mllib_minhash_recall_vs_exact(spark, sf_dir):
    """MLlib's LSH is probabilistic; with 8 hash tables it must still find
    the vast majority of the exact pipeline's high-similarity pairs."""
    from etl_pipeline_telecom_spark.plans.dedup import d9_mllib_minhash

    exact = {(r["doc_a"], r["doc_b"]) for r in d5_lsh_jaccard_dedup(spark, sf_dir).collect()
             if r["jaccard"] >= 0.6}
    got = {(r["doc_a"], r["doc_b"]) for r in d9_mllib_minhash(spark, sf_dir).collect()}
    assert exact, "need high-similarity pairs to measure recall"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"MLlib LSH recall {recall:.2f} on jaccard>=0.6 pairs"

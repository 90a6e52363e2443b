"""Connected-components clustering vs a python union-find ground truth."""

from __future__ import annotations

import pytest

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
    got = {
        (r["doc_a"], r["doc_b"])
        for r in d9_mllib_minhash(spark, sf_dir).collect()
        if r["mllib_found"]  # graded form: unfound exact pairs carry false
    }
    assert exact, "need high-similarity pairs to measure recall"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"MLlib LSH recall {recall:.2f} on jaccard>=0.6 pairs"


def test_persisted_index_probe_matches_incremental(spark, sf_dir):
    """d12 (probe vs persisted bucketed index) must be result-identical to
    d11 (recompute both sides) — persisting the index is an execution
    strategy, never a semantics change."""
    from etl_pipeline_telecom_spark.plans.dedup import (
        d11_incremental_dedup,
        d12_persisted_lsh_probe,
    )

    a = {tuple(r) for r in d11_incremental_dedup(spark, sf_dir).collect()}
    b = {tuple(r) for r in d12_persisted_lsh_probe(spark, sf_dir).collect()}
    assert a, "fixture should produce incremental matches"
    assert a == b


def test_bloom_prefilter_is_result_neutral(spark, sf_dir):
    """d13's bloom prefilter may only drop train rows that cannot join
    (no false negatives) — output must equal d10 exactly."""
    from etl_pipeline_telecom_spark.plans.dedup import (
        d10_contamination_check,
        d13_contamination_bloom,
    )

    a = {tuple(r) for r in d10_contamination_check(spark, sf_dir).collect()}
    b = {tuple(r) for r in d13_contamination_bloom(spark, sf_dir).collect()}
    assert a, "fixture should produce contamination hits"
    assert a == b


def test_ivf_probe_recall_floor_on_uniform_fixture(spark, sf_dir):
    """v7 (nprobe=2 of 10 cells) is approximate by design. The synthetic
    embeddings are near-uniform (no real cluster structure), so IVF recall
    cannot beat chance by much — for uniform data the expected floor is
    nprobe/k = 0.2, and measured recall is 0.23 (sf0.001) / 0.47 (sf0.01).
    The correctness of the plan itself is oracle-verified; this test pins
    the recall floor and the output contract. Recall where IVF is MEANT to
    work (clustered data) is measured in test_ivf_probe_recall_vs_brute."""
    from etl_pipeline_telecom_spark.plans.similarity import v1_knn_brute, v7_ivf_probe

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in v1_knn_brute(spark, sf_dir).collect()
        if r["rn"] <= 3
    }
    rows = v7_ivf_probe(spark, sf_dir).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert exact
    assert len(rows) == 30  # top-3 for each of the 10 probe queries
    recall = len(exact & got) / len(exact)
    assert recall >= 0.2, f"IVF nprobe=2 recall {recall:.2f} below uniform-data floor"


@pytest.fixture(scope="module")
def clustered_sf_dir(spark, tmp_path_factory):
    """A fixture dir whose embeddings HAVE cluster structure: 10 label
    clusters with well-separated deterministic centers and small isotropic
    noise — the data regime IVF exists for. Schema matches the driver
    fixtures (vec_id int64, embedding array<float>, label int32); the 10
    probe queries (vec_id < 10) land one per cluster."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    k, per, dim = 10, 30, 64
    centers = rng.uniform(-1.0, 1.0, size=(k, dim))
    rows = []
    for vid in range(k * per):
        lab = vid % k  # queries 0..9 land one per cluster
        vec = centers[lab] + rng.normal(0.0, 0.03, size=dim)
        rows.append((vid, vec.astype(np.float32).tolist(), lab))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    out = tmp_path_factory.mktemp("clustered")
    spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>, label int"
    ).write.parquet(str(out / "embeddings.parquet"))
    return str(out)


def test_ivf_probe_recall_vs_brute(spark, clustered_sf_dir):
    """On label-clustered vectors (the IVF data regime) nprobe=2 must
    recover ≥ 0.9 of the brute-force top-3 — the near-uniform driver
    fixture only measures the nprobe/k floor (NOTES_r3.md), so this is
    the test that exercises the operator where it matters. Brute force
    (v1) stays the oracle."""
    from etl_pipeline_telecom_spark.plans.similarity import v1_knn_brute, v7_ivf_probe

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in v1_knn_brute(spark, clustered_sf_dir).collect()
        if r["rn"] <= 3
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in v7_ivf_probe(spark, clustered_sf_dir).collect()
    }
    assert len(exact) == 30  # top-3 for each of the 10 probe queries
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"IVF nprobe=2 recall {recall:.2f} on clustered data"


def test_hyperplanes_are_pairwise_independent():
    """Regression for the degenerate plane family: the original
    ((d+1)·p mod 3) construction made 7 of 8 planes IDENTICAL (any p
    coprime to 3 gives the same zero set), collapsing the corpus into 4
    buckets and blowing per-bucket GEMM memory at scale. Planes must be
    pairwise distinct, non-complementary, and roughly sign-balanced."""
    from etl_pipeline_telecom_spark.plans.similarity import _HYPERPLANES

    assert len(_HYPERPLANES) == 8
    for i, a in enumerate(_HYPERPLANES):
        assert 20 <= sum(1 for x in a if x == 1) <= 44, f"plane {i} is sign-skewed"
        for j, b in enumerate(_HYPERPLANES[i + 1:], start=i + 1):
            agree = sum(1 for x, y in zip(a, b) if x == y)
            # identical (64) or complementary (0) planes carry one bit twice
            assert 16 <= agree <= 48, f"planes {i},{j} are correlated (agree={agree})"


def test_hyperplane_buckets_spread(spark, sf_dir):
    """The 8-bit signature must actually use the bucket space: on the
    fixture corpus, no single bucket may hold the majority of vectors
    (the degenerate planes put 32-54% in one bucket)."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.similarity import _hyperplane_bucket, _quantized

    counts = (
        _quantized(spark, sf_dir)
        .withColumn("bucket", _hyperplane_bucket())
        .groupBy("bucket")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    top = max(r["count"] for r in counts)
    assert len(counts) >= 32, f"only {len(counts)} of 256 buckets populated"
    assert top / total <= 0.2, f"hot bucket holds {top}/{total} vectors"


def test_tiled_gemm_matches_full_gram():
    """The tiled _gemm_pairs must emit exactly the pairs a single full
    n×n gram would — on a group spanning several tiles, including ids
    deliberately out of order so the vec_a<vec_b normalization is hit."""
    import numpy as np
    import pandas as pd

    from etl_pipeline_telecom_spark.plans import similarity as sim

    rng = np.random.default_rng(7)
    n, d = 500, 16
    # clustered points so a meaningful fraction of pairs pass cos >= 0.4
    base = rng.integers(-5, 6, size=(10, d)).astype("float64")
    v = base[rng.integers(0, 10, n)] * 100 + rng.integers(-40, 41, size=(n, d))
    ids = rng.permutation(n).astype("int64") + 1000
    pdf = pd.DataFrame({"vec_id": ids, "qv": [row for row in v]})

    g = v @ v.T
    nrm = np.sqrt(np.diag(g))
    cos = g / np.outer(nrm, nrm)
    iu, ju = np.triu_indices(n, k=1)
    keep = cos[iu, ju] >= 0.4
    a, b = ids[iu][keep], ids[ju][keep]
    expected = {
        (int(min(x, y)), int(max(x, y))): c
        for x, y, c in zip(a, b, cos[iu, ju][keep])
    }

    old_block = sim._GEMM_BLOCK
    sim._GEMM_BLOCK = 64  # force an 8×8 tile grid
    try:
        out = sim._gemm_pairs(pdf)
    finally:
        sim._GEMM_BLOCK = old_block
    got = {
        (int(r.vec_a), int(r.vec_b)): r.cos_raw for r in out.itertuples(index=False)
    }
    assert expected, "fixture must produce passing pairs"
    assert got == expected  # bit-identical cosines, exact pair set


def _cc_on_pairs(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    from etl_pipeline_telecom_spark.plans.pipeline import connected_components

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r["doc_id"]: r["rep"] for r in connected_components(df).collect()}


def test_cc_chain_converges_in_log_rounds(spark):
    """A 2,000-node path is the worst case for min-label propagation
    (rounds = diameter); the star alternation must still solve it — and
    fast enough that the test itself is the round bound."""
    n = 2000
    pairs = [(i, i + 1) for i in range(n - 1)]
    got = _cc_on_pairs(spark, pairs)
    assert got == {i: 0 for i in range(n)}


def test_cc_giant_star_plus_chain_plus_islands(spark):
    """One giant component (hub 10_000 with 500 leaves), a chain glued to
    it, and two 2-node islands — mixed shapes in one graph."""
    pairs = [(10_000, 10_000 + i) for i in range(1, 501)]   # giant star
    pairs += [(10_000 + 500 + i, 10_000 + 500 + i + 1) for i in range(20)]
    pairs += [(10_500, 10_501)]                             # glue chain to star
    pairs += [(1, 2), (7, 8)]                               # islands
    got = _cc_on_pairs(spark, pairs)
    expected = _union_find_reps(pairs)
    assert got == expected
    # the glued chain belongs to the star's component
    assert got[10_520] == 10_000


def test_cc_random_graph_matches_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(300))
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(250)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cc_on_pairs(spark, pairs)
    assert got == _union_find_reps(pairs)


def test_cc_duplicate_and_reversed_edges_are_harmless(spark):
    pairs = [(5, 3), (3, 5), (5, 3), (9, 5)]
    got = _cc_on_pairs(spark, pairs)
    assert got == {3: 3, 5: 3, 9: 3}

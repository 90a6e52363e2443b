"""Crafted-data pins for the round-12 operators.

Same discipline as test_r7-r11_ops: hand-computed expectations on tiny
crafted fixtures (the hash gate is blind to bugs BOTH engines share —
d19's lesson), plus the DuckDB oracle round-trip where the operator has
one.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def _roundtrip(spark, d: str, name: str) -> None:
    spec = catalog.REGISTRY[name]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"


def _write_docs(tmp_path, rows) -> str:
    """rows: (doc_id, text, lang, source) → a documents.parquet fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _write_emb(tmp_path, rows) -> str:
    """rows: (vec_id, [floats], label) → an embeddings.parquet fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# t30: stupid-backoff bigram→unigram LM scoring (train/eval hash split)
# ---------------------------------------------------------------------------

# train docs (doc_id % 10 < 8) with a controlled bigram inventory; eval
# docs (doc_id % 10 >= 8) exercising each scoring path
_T30_TRAIN = "the cat sat the cat sat the cat"     # doc 0..2: (the,cat)x3,(cat,sat)x2,(sat,the)x2 per doc
_T30_EVAL_SEEN = "the cat sat the cat"             # doc 8: every bigram train-seen
_T30_EVAL_MIXED = "the cat zonk the"               # doc 9: (the,cat) seen,
#   (cat,zonk) unseen but 'zonk'... NOT in train → OOV; (zonk,the) unseen, 'the' known → backoff


def _t30_crafted(tmp_path) -> str:
    rows = [
        (0, _T30_TRAIN, "en", "web"),
        (1, _T30_TRAIN, "en", "web"),
        (2, _T30_TRAIN, "en", "web"),
        (8, _T30_EVAL_SEEN, "en", "web"),
        (9, _T30_EVAL_MIXED, "en", "web"),
    ]
    return _write_docs(tmp_path, rows)


def _bl(x: int) -> int:
    return len(bin(x)) - 2


def test_t30_crafted_paths_exact(spark, tmp_path):
    """Hand-computed bits for all three scoring paths, including the
    unseen-bigram doc an inner-join MLE replay silently under-scores
    (the optimistic-perplexity bug t30 exists to fix)."""
    from etl_pipeline_telecom_spark.plans.text import t30_backoff_lm

    d = _t30_crafted(tmp_path)
    got = {r.doc_id: r for r in t30_backoff_lm(spark, d).collect()}
    assert set(got) == {8, 9}

    # train counts (3 identical docs): (the,cat)x9, (cat,sat)x6, (sat,the)x6
    # unigrams: the x9, cat x9, sat x6 → T = 24, bl(T) = 5
    blt = _bl(24)
    assert blt == 5
    # doc 8 "the cat sat the cat": all seen —
    #   (the,cat)x2: bl(cc(the)=9) - bl(9) = 0 each
    #   (cat,sat):   bl(cc(cat)=6) - bl(6) = 0
    #   (sat,the):   bl(cc(sat)=6) - bl(6) = 0
    r8 = got[8]
    assert (r8.n_bigrams, r8.n_seen, r8.n_backoff, r8.n_oov) == (4, 4, 0, 0)
    assert r8.bits_total == 0
    assert r8.micro_bits_per_bigram == 0
    # doc 9 "the cat zonk the":
    #   (the,cat) seen → 0 bits
    #   (cat,zonk): unseen bigram, zonk OOV → 1 + bl(T) = 6
    #   (zonk,the): unseen bigram, the known (ucnt=9) → 1 + 5 - bl(9)=4 → 2
    r9 = got[9]
    assert (r9.n_bigrams, r9.n_seen, r9.n_backoff, r9.n_oov) == (3, 1, 1, 1)
    assert r9.bits_total == 0 + 6 + 2
    assert r9.micro_bits_per_bigram == (8 * 1_000_000) // 3
    # the corpus-mean flag: mean = (0+8)*1e6 // (4+3) = 1142857
    assert (r8.flagged, r9.flagged) == (False, True)
    # the inner-join replay (t24's recipe on the train model) sees only
    # doc 9's ONE seen bigram — 2 of 3 bigrams silently vanish; t30
    # scores all 3 (the pin the verdict asked for)
    assert r9.n_seen < r9.n_bigrams


def test_t30_seen_path_equals_inner_join_replay(spark, tmp_path):
    """For an eval doc whose bigrams are ALL train-seen, t30's bits must
    equal the plain inner-join MLE replay — backoff only ever ADDS the
    missing mass, never changes the seen path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.text import t30_backoff_lm
    from etl_pipeline_telecom_spark.sources import load_table
    from etl_pipeline_telecom_spark.functions.text import tokens

    d = _t30_crafted(tmp_path)
    r8 = {r.doc_id: r for r in t30_backoff_lm(spark, d).collect()}[8]
    # independent inner-join replay trained on the train split
    docs = load_table(spark, d, "documents")
    toks = docs.select("doc_id", F.posexplode(tokens("text")).alias("p", "tok"))
    w = Window.partitionBy("doc_id").orderBy("p")
    big = toks.select(
        "doc_id", F.col("tok").alias("w1"), F.lead("tok", 1).over(w).alias("w2")
    ).where(F.col("w2").isNotNull())
    bc = big.where(F.col("doc_id") % 10 < 8).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ctx = bc.groupBy("w1").agg(F.sum("cnt").cast("bigint").alias("cc"))
    bits = F.length(F.bin("cc")) - F.length(F.bin("cnt"))
    replay = (
        big.where(F.col("doc_id") == 8)
        .join(bc, ["w1", "w2"])
        .join(ctx, "w1")
        .agg(F.sum(bits).cast("bigint").alias("sb"))
        .collect()[0]
        .sb
    )
    assert r8.bits_total == replay


def test_t30_path_partition_law(spark, sf_dir):
    """Every eval bigram takes exactly one path: seen+backoff+oov == n."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.text import t30_backoff_lm

    df = t30_backoff_lm(spark, sf_dir)
    bad = df.where(
        F.col("n_seen") + F.col("n_backoff") + F.col("n_oov") != F.col("n_bigrams")
    ).count()
    assert bad == 0
    # the fixture's held-out split genuinely exercises the smoothing
    # (the OOV path needs a word absent from the whole train split —
    # guaranteed only on the crafted corpus above, not at every SF)
    agg = df.agg(F.sum("n_backoff").alias("b")).collect()[0]
    assert agg.b > 0


def test_t30_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _t30_crafted(tmp_path), "t30_backoff_lm")


def test_t30_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t30_backoff_lm")


# ---------------------------------------------------------------------------
# m12: video scene-level near-dup detection
# ---------------------------------------------------------------------------


def _m12_docs(tmp_path, n: int = 10) -> str:
    # m12 derives everything from doc_id; text content is irrelevant
    return _write_docs(
        tmp_path, [(i, f"clip {i}", "en", "video") for i in range(n)]
    )


def _m12_expected_sig(doc: int, s: int) -> str:
    """Analytic scene signature: md5 over the comma-joined decoded grid."""
    from etl_pipeline_telecom_spark.plans.multimodal import _M8_PX

    ck = doc - 1 if (doc % 4 == 1 and s < 2) else doc
    raw = b"".join(
        hashlib.md5(f"{ck}:s{s}:{k}".encode()).digest() for k in range(9)
    )[:_M8_PX]
    grid = ",".join(str(b % 250) for b in raw)
    return hashlib.md5(grid.encode()).hexdigest()


def test_m12_scene_signatures_survive_codec_roundtrip(spark, tmp_path):
    """The decoded-grid signature equals the analytic one — the BMP
    encode/decode round-trip inside the operator is lossless."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.multimodal import video_scene_grids

    d = _m12_docs(tmp_path, 4)
    sigs = (
        video_scene_grids(spark, d)
        .select(
            "doc_id",
            "s",
            F.md5(
                F.concat_ws(",", F.transform("g", lambda x: x.cast("string")))
            ).alias("sig"),
        )
        .collect()
    )
    for r in sigs:
        assert r.sig == _m12_expected_sig(r.doc_id, r.s), (r.doc_id, r.s)


def test_m12_crafted_pairs_and_verdicts(spark, tmp_path):
    """Docs 0..9: exactly the planted compilation-edit pairs appear, each
    sharing exactly the two borrowed scenes, and the Jaccard verdict
    splits — (4,5) shares scenes but differs elsewhere (the verdict's
    crafted case), (8,9) is a full containment."""
    from etl_pipeline_telecom_spark.plans.multimodal import m12_video_scene_dedup

    d = _m12_docs(tmp_path, 10)
    got = {(r.doc_a, r.doc_b): r for r in m12_video_scene_dedup(spark, d).collect()}
    assert set(got) == {(0, 1), (4, 5), (8, 9)}
    for (a, b), r in got.items():
        assert r.shared_scenes == 2, (a, b)
        assert r.n_scenes_a == 2 + a % 3 and r.n_scenes_b == 2 + b % 3
    # ns: (0,1)=(2,3) → J = 2/3 ≥ 1/2; (4,5)=(3,4) → 2/5 < 1/2;
    # (8,9)=(4,2) → 2/4 = 1/2 (boundary, inclusive)
    assert got[(0, 1)].is_neardup is True
    assert got[(4, 5)].is_neardup is False
    assert got[(8, 9)].is_neardup is True


def test_m12_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _m12_docs(tmp_path, 10), "m12_video_scene_dedup")


def test_m12_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "m12_video_scene_dedup")


# ---------------------------------------------------------------------------
# sm11: cluster-balanced domain mixing over d21's cells
# ---------------------------------------------------------------------------


def _sm11_apportion(cells: dict[int, int]) -> dict[int, int]:
    """Independent pure-python largest-remainder replay.

    cells: cid → n_survivors; returns cid → quota_micro."""
    budget = 1_000_000 * sum(cells.values())
    import math

    s = {c: int(math.floor(math.sqrt(n) * 1000)) for c, n in cells.items()}
    s_tot = sum(s.values())
    base = {c: (budget * v) // s_tot for c, v in s.items()}
    rem = {c: (budget * v) % s_tot for c, v in s.items()}
    deficit = budget - sum(base.values())
    order = sorted(cells, key=lambda c: (-rem[c], c))
    return {
        c: base[c] + (1 if order.index(c) < deficit else 0) for c in cells
    }


def test_sm11_crafted_two_cells_even_split(spark, tmp_path):
    """d21's crafted geometry: cell 0 = one 3-vector semantic cluster
    (1 survivor), cell 1 = a singleton — equal sqrt weights, the budget
    (2 survivors) splits exactly in half."""
    from etl_pipeline_telecom_spark.plans.pipeline import sm11_cluster_balanced_mix

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.5, 0.866], 0),
        (2, [-0.5, 0.866], 0),
        (3, [100.0, 0.0], 1),
    ]
    d = _write_emb(tmp_path, rows)
    got = {r.cid: r for r in sm11_cluster_balanced_mix(spark, d).collect()}
    assert got.keys() == {0, 1}
    assert (got[0].n_members, got[0].n_survivors) == (3, 1)
    assert (got[1].n_members, got[1].n_survivors) == (1, 1)
    for r in got.values():
        assert r.budget_micro == 2_000_000
        assert r.weight_milli == 1000
        assert r.quota_micro == 1_000_000


def test_sm11_crafted_uneven_cells_match_python_replay(spark, tmp_path):
    """Cell 1 holds two orthogonal survivors (cos 0 < τ) — sqrt(2)
    weighting and the deficit distribution must match the independent
    integer replay exactly."""
    from etl_pipeline_telecom_spark.plans.pipeline import sm11_cluster_balanced_mix

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.5, 0.866], 0),
        (2, [-0.5, 0.866], 0),
        (3, [100.0, 0.0], 1),
        (4, [0.0, 100.0], 1),
    ]
    d = _write_emb(tmp_path, rows)
    got = {r.cid: r for r in sm11_cluster_balanced_mix(spark, d).collect()}
    assert (got[0].n_survivors, got[1].n_survivors) == (1, 2)
    expect = _sm11_apportion({0: 1, 1: 2})
    for cid, r in got.items():
        assert r.quota_micro == expect[cid], cid
    assert sum(r.quota_micro for r in got.values()) == got[0].budget_micro


def test_sm11_conservation_laws(spark, sf_dir):
    """sum(quota) == budget EXACTLY, budget == 10^6 × survivors, and the
    per-cell frame agrees with d21's own aggregation."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.pipeline import (
        d21_semantic_dedup,
        sm11_cluster_balanced_mix,
    )

    rows = sm11_cluster_balanced_mix(spark, sf_dir).collect()
    budget = rows[0].budget_micro
    assert all(r.budget_micro == budget for r in rows)
    assert sum(r.quota_micro for r in rows) == budget
    assert budget == 1_000_000 * sum(r.n_survivors for r in rows)
    d21 = (
        d21_semantic_dedup(spark, sf_dir)
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("keep").cast("int")).alias("s"),
        )
        .collect()
    )
    expect = {r.cid: (r.m, r.s) for r in d21}
    assert {r.cid: (r.n_members, r.n_survivors) for r in rows} == expect


def test_sm11_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "sm11_cluster_balanced_mix")


# ---------------------------------------------------------------------------
# v15: incremental ANN index maintenance
# ---------------------------------------------------------------------------


def _v15_index_snapshot(base_dir: str) -> dict:
    import glob

    return {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(base_dir, "**", "*.parquet"), recursive=True)
    }


def test_v15_base_index_files_physically_untouched(spark, sf_dir):
    """The maintenance pass must never open a base index file for write —
    the p11 physical-pin pattern (path, size, mtime snapshot)."""
    from etl_pipeline_telecom_spark.plans.similarity import (
        persisted_ivf_index,
        staged_ivf_delta,
        v15_incremental_ann,
    )

    base_dir = persisted_ivf_index(spark, sf_dir)
    before = _v15_index_snapshot(base_dir)
    assert before, "base index is empty"
    v15_incremental_ann(spark, sf_dir).collect()
    assert _v15_index_snapshot(base_dir) == before, "maintenance touched the base index"
    delta = staged_ivf_delta(spark, sf_dir, base_dir)
    assert _v15_index_snapshot(delta), "delta layout missing"


def test_v15_serving_set_is_complete_and_split_correctly(spark, sf_dir):
    """base ∪ delta read back from files == the full corpus, split
    exactly on the vec_id % 7 == 3 arrival rule."""
    from etl_pipeline_telecom_spark.plans.similarity import (
        _V15_NEW_MOD,
        persisted_ivf_index,
        staged_ivf_delta,
        _quantized,
    )

    base_dir = persisted_ivf_index(spark, sf_dir)
    delta_dir = staged_ivf_delta(spark, sf_dir, base_dir)
    base = spark.read.parquet(os.path.join(base_dir, "assign"))
    delta = spark.read.parquet(delta_dir)
    emb = _quantized(spark, sf_dir)
    n_all = emb.count()
    n_new = emb.where(f"vec_id % {_V15_NEW_MOD} = 3").count()
    assert base.count() == n_all - n_new
    assert delta.count() == n_new
    from pyspark.sql import functions as F

    assert base.where(F.col("vec_id") % _V15_NEW_MOD == 3).count() == 0
    assert delta.where(F.col("vec_id") % _V15_NEW_MOD != 3).count() == 0


def test_v15_delta_assignment_matches_persisted_model(spark, sf_dir):
    """Delta rows must equal a fresh assignment of the arriving batch
    against the PERSISTED centroids (stale model, not a recompute over
    base+new — incremental maintenance's defining property)."""
    from etl_pipeline_telecom_spark.plans.similarity import (
        _V15_NEW_MOD,
        _quantized,
        _v15_assign,
        persisted_ivf_index,
        staged_ivf_delta,
    )

    base_dir = persisted_ivf_index(spark, sf_dir)
    delta_dir = staged_ivf_delta(spark, sf_dir, base_dir)
    cent = spark.read.parquet(os.path.join(base_dir, "cent"))
    new = _quantized(spark, sf_dir).where(f"vec_id % {_V15_NEW_MOD} = 3")
    expect = {
        r.vec_id: r.cid for r in _v15_assign(new, cent).collect()
    }
    got = {
        r.vec_id: int(r.cid)
        for r in spark.read.parquet(delta_dir).select("vec_id", "cid").collect()
    }
    assert got == expect


def test_v15_output_shape_and_delta_serving(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.similarity import v15_incremental_ann

    rows = v15_incremental_ann(spark, sf_dir).collect()
    assert len(rows) == 10  # the v7 query sample
    for r in rows:
        assert r.n_ann == 3
        assert 0 <= r.n_hits <= 3
        assert abs(r.recall_at_3 - round(r.n_hits / 3, 6)) < 1e-12
        assert r.n_cand >= r.n_ann
    # the delta rows actually serve candidates — the incremental index
    # is live, not write-only
    assert sum(r.n_new_cand for r in rows) > 0


def test_v15_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "v15_incremental_ann")


# ---------------------------------------------------------------------------
# pipe4: the end-to-end curation funnel
# ---------------------------------------------------------------------------

# A corpus where EVERY stage drops exactly one known document:
#   doc 10 — the survivor (and, being %10==0, its dup re-insertion clone
#            survives the gates and dies at exact-dedup)
#   doc 2  — no language markers → 'und' → dropped at langid
#   doc 3  — 3 words → fails the Gopher word-count rule
#   doc 4  — "the qaK" chains: every bigram corpus-unique with a frequent
#            context → high surprisal → dropped at the perplexity gate
#   docs 5, 6 — near-identical 24-word docs (one word differs): distinct
#            fingerprints survive exact-dedup, the LSH pair kills doc 6
_PIPE4_ROWS = [
    (10, "the cat and dog sat " * 5, "en", "web"),
    (2, " ".join(f"zoqa{i}" for i in range(25)), "en", "web"),
    (3, "the and cat", "en", "web"),
    (4, " ".join(f"the qa{i}" for i in range(1, 12)), "en", "web"),
    (5, "the cat and dog like fish " * 4, "en", "web"),
    (6, ("the cat and dog like fish " * 4).rstrip().rsplit(" ", 1)[0] + " fowl", "en", "web"),
]


def test_pipe4_crafted_funnel_every_stage_drops_one(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.pipeline import pipe4_curation_funnel

    d = _write_docs(tmp_path, _PIPE4_ROWS)
    got = {
        r.stage_ord: r for r in pipe4_curation_funnel(spark, d).collect()
    }
    expect = {
        0: ("ingest", 7, 7, 0, 7_000_000),
        1: ("langid", 7, 6, 1, 6_000_000),
        2: ("gopher_rules", 6, 5, 1, 5_000_000),
        3: ("perplexity", 5, 4, 1, 4_000_000),
        4: ("exact_dedup", 5 - 1, 3, 1, 3_000_000),
        5: ("fuzzy_dedup", 3, 2, 1, 2_000_000),
        6: ("dupaware_weights", 2, 2, 0, 3_000_000),
    }
    assert set(got) == set(expect)
    for k, (stage, di, do, dr, m) in expect.items():
        r = got[k]
        assert (r.stage, r.docs_in, r.docs_out, r.dropped, r.mass_micro) == (
            stage, di, do, dr, m,
        ), k


def test_pipe4_chaining_and_conservation_laws(spark, sf_dir):
    """docs_in chains exactly from the previous stage's docs_out, dropped
    is their difference, gate stages carry docs_out × 10^6 mass, and the
    weights stage conserves the PRE-fuzzy mass (10^6 × fuzzy docs_in)."""
    from etl_pipeline_telecom_spark.plans.pipeline import pipe4_curation_funnel

    rows = sorted(
        pipe4_curation_funnel(spark, sf_dir).collect(), key=lambda r: r.stage_ord
    )
    assert [r.stage_ord for r in rows] == list(range(7))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.docs_in == prev.docs_out, cur.stage
    for r in rows:
        assert r.dropped == r.docs_in - r.docs_out, r.stage
        if r.stage_ord <= 5:
            assert r.mass_micro == r.docs_out * 1_000_000, r.stage
    weights, fuzzy = rows[6], rows[5]
    assert weights.docs_in == weights.docs_out == fuzzy.docs_out
    assert weights.mass_micro == fuzzy.docs_in * 1_000_000
    # the fixture genuinely exercises every gate
    for r in rows[1:6]:
        assert r.dropped > 0, f"{r.stage} dropped nothing at sf0.001"


def test_pipe4_lang_gate_agrees_with_t3(spark, sf_dir):
    """Doc-for-doc: pipe4's inline language gate == t3_langid's published
    prediction landing in the allowed set (the t28/t19 duplication pin)."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _PIPE4_LANGS,
        _pipe4_lang_keep,
    )
    from etl_pipeline_telecom_spark.plans.text import t3_langid
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _pipe4_lang_keep().alias("keep")
    )
    t3 = t3_langid(spark, sf_dir).select(
        "doc_id", F.col("lang_pred").isin(*_PIPE4_LANGS).alias("keep3")
    )
    bad = docs.join(t3, "doc_id").where(F.col("keep") != F.col("keep3")).count()
    assert bad == 0


def test_pipe4_gopher_gate_agrees_with_t19(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.text import (
        _t28_gopher_label,
        t19_gopher_flags,
    )
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (_t28_gopher_label() == 1).alias("keep")
    )
    t19 = t19_gopher_flags(spark, sf_dir).select("doc_id", "pass_gopher")
    bad = docs.join(t19, "doc_id").where(
        F.col("keep") != F.col("pass_gopher")
    ).count()
    assert bad == 0


def test_pipe4_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _write_docs(tmp_path, _PIPE4_ROWS), "pipe4_curation_funnel")


def test_pipe4_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "pipe4_curation_funnel")


# ---------------------------------------------------------------------------
# dq9_neardup_split_leakage — near-dup content leakage across hash splits
# ---------------------------------------------------------------------------

# Split membership under sm3's md5-mod-100 rule (90/5/5), precomputed:
# bucket(1)=60 bucket(2)=5 bucket(3)=10 -> train; bucket(8)=93 -> val;
# bucket(37)=96 bucket(43)=98 -> test. None are %10==0, so
# corpus_with_dups re-inserts nothing.
_DQ9_X = "alpha beta gamma delta epsilon zeta"
_DQ9_Y = "quick brown fox jumps over dog"
_DQ9_ROWS = [
    (1, _DQ9_X, "en", "web"),    # train  ─┐ identical text X: pairs
    (37, _DQ9_X, "en", "web"),   # test    ├ (1,37) (1,43) (37,43)
    (43, _DQ9_X, "en", "web"),   # test   ─┘
    (2, _DQ9_Y, "en", "web"),    # train  ─┬ identical text Y: pair (2,3)
    (3, _DQ9_Y, "en", "web"),    # train  ─┘
    (8, "solo unique words only here now", "en", "web"),  # val, no twin
]


def test_dq9_crafted_split_classes(spark, tmp_path):
    """Hand-derived audit: X spans train{1}/test{37,43}, Y sits inside
    train{2,3}. Expected classes — within-train (2,3); train<->test
    pairs (1,37),(1,43) sharing the single train-side doc; within-test
    (37,43). The val doc has no near-twin and must appear nowhere."""
    from etl_pipeline_telecom_spark.plans.quality import dq9_neardup_split_leakage

    d = _write_docs(tmp_path, _DQ9_ROWS)
    rows = {
        (r.split_lo, r.split_hi): r
        for r in dq9_neardup_split_leakage(spark, d).collect()
    }
    assert set(rows) == {("train", "train"), ("train", "test"), ("test", "test")}
    expect = {
        ("train", "train"): (False, 1, 1, 1),
        ("train", "test"): (True, 2, 1, 2),
        ("test", "test"): (False, 1, 1, 1),
    }
    for k, (leak, n_pairs, n_lo, n_hi) in expect.items():
        r = rows[k]
        assert (r.is_leak, r.n_pairs, r.n_docs_lo, r.n_docs_hi) == (
            leak, n_pairs, n_lo, n_hi,
        ), k


def test_dq9_pair_conservation_and_fixture_leaks(spark, sf_dir):
    """SUM(n_pairs) over all classes == |d5 pairs| exactly (every near-dup
    pair lands in exactly one class), and the fixture corpus genuinely
    exercises the leak rows (the ~10% dup re-insertions hash across
    splits by construction)."""
    from etl_pipeline_telecom_spark.plans.dedup import d5_lsh_jaccard_dedup
    from etl_pipeline_telecom_spark.plans.quality import dq9_neardup_split_leakage

    rows = dq9_neardup_split_leakage(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in rows) == d5_lsh_jaccard_dedup(spark, sf_dir).count()
    assert any(r.is_leak and r.n_pairs > 0 for r in rows), (
        "fixture produced no cross-split near-dup pair — the audit's "
        "raison d'etre is unexercised"
    )
    for r in rows:
        assert r.is_leak == (r.split_lo != r.split_hi)
        assert r.n_docs_lo <= r.n_pairs and r.n_docs_hi <= r.n_pairs


def test_dq9_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _write_docs(tmp_path, _DQ9_ROWS), "dq9_neardup_split_leakage")


def test_dq9_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "dq9_neardup_split_leakage")

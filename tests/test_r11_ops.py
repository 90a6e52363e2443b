"""Crafted-data pins for the round-11 operators.

Same discipline as test_r7-r10_ops: hand-computed expectations on tiny
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
# t28: trained quality classifier (hashed-BoW NB distilling t19's verdict)
# ---------------------------------------------------------------------------

# a text that PASSES every Gopher rule: 22 words, all alphabetic, two
# stopwords, mean word length (3+3+20*5)/22 ≈ 4.8
_T28_POS = "the and " + " ".join(f"vocab{c}" for c in "abcdefghijklmnopqrst")
# FAILS (2 words < 20) and uses a disjoint vocabulary
_T28_NEG = "zonk quux"


def _t28_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 256


def test_t28_separable_corpus_perfect_accuracy(spark, tmp_path):
    """On a corpus whose classes use DISJOINT vocabularies (and whose
    hashed buckets do not collide — asserted), the distilled classifier
    scores every held-out doc correctly."""
    from etl_pipeline_telecom_spark.plans.text import t28_quality_classifier

    pos_b = {_t28_bucket(t) for t in _T28_POS.split()}
    neg_b = {_t28_bucket(t) for t in _T28_NEG.split()}
    assert not pos_b & neg_b, "crafted vocabularies collide in bucket space"
    rows = [(i, _T28_POS, "en", "s") for i in range(20)]
    rows += [(i, _T28_NEG, "en", "s") for i in range(20, 40)]
    d = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in t28_quality_classifier(spark, d).collect()}
    assert set(got) == {8, 9, 18, 19, 28, 29, 38, 39}  # doc_id % 10 >= 8
    for i, r in got.items():
        assert r.label == (1 if i < 20 else 0), r
        assert r.pred == r.label, r
        assert r.correct == 1, r
    # positives carry positive evidence; negatives likewise
    assert all(got[i].score_pos_micro > got[i].score_neg_micro for i in (8, 9, 18, 19))
    assert all(got[i].score_neg_micro > got[i].score_pos_micro for i in (28, 29, 38, 39))


def test_t28_model_miss_falls_to_negative(spark, tmp_path):
    """An eval doc whose tokens hash to buckets absent from the trained
    model joins nothing → both scores 0 → the conservative gate predicts
    negative (pred 0)."""
    from etl_pipeline_telecom_spark.plans.text import t28_quality_classifier

    trained = {_t28_bucket(t) for t in (_T28_POS + " " + _T28_NEG).split()}
    miss = next(
        f"miss{k}"
        for k in range(10000)
        if _t28_bucket(f"miss{k}") not in trained
    )
    rows = [(i, _T28_POS, "en", "s") for i in range(20)]
    rows += [(i, _T28_NEG, "en", "s") for i in range(20, 38)]
    rows.append((38, f"{miss} {miss}", "en", "s"))  # fails Gopher → label 0
    rows.append((39, _T28_NEG, "en", "s"))
    d = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in t28_quality_classifier(spark, d).collect()}
    r = got[38]
    assert (r.score_pos_micro, r.score_neg_micro) == (0, 0)
    assert r.pred == 0 and r.label == 0 and r.correct == 1


def test_t28_label_matches_t19_verdict(spark, sf_dir):
    """The weak label IS t19's conjunctive verdict — expression drift
    between the two would silently change what t28 distills."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.text import (
        _t28_gopher_label,
        t19_gopher_flags,
    )
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select("doc_id", _t28_gopher_label().alias("label"))
    t19 = t19_gopher_flags(spark, sf_dir).select(
        "doc_id", F.col("pass_gopher").cast("int").alias("v")
    )
    diff = lab.join(t19, "doc_id").where(F.col("label") != F.col("v")).count()
    assert diff == 0


def test_t28_oracle_roundtrip_crafted(spark, tmp_path):
    rows = [(i, _T28_POS, "en", "s") for i in range(20)]
    rows += [(i, _T28_NEG, "en", "s") for i in range(20, 40)]
    _roundtrip(spark, _write_docs(tmp_path, rows), "t28_quality_classifier")


def test_t28_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t28_quality_classifier")


# ---------------------------------------------------------------------------
# d21: SemDeDup-style embedding-cluster semantic dedup
# ---------------------------------------------------------------------------


def test_d21_cross_cell_near_identical_pair_stays_unclustered(spark, tmp_path):
    """THE cell-bounded guarantee: vectors 0 and 2 are cosine-identical
    (same direction, 100× magnitude) but L2-assign to DIFFERENT centroid
    cells — d21 must never score the pair, so both stay singletons."""
    from etl_pipeline_telecom_spark.plans.pipeline import d21_semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [100.0, 0.0, 0.0, 0.0], 1),
        (3, [0.0, 0.0, 100.0, 0.0], 1),
    ]
    d = _write_emb(tmp_path, rows)
    got = {r.vec_id: r for r in d21_semantic_dedup(spark, d).collect()}
    assert set(got) == {0, 1, 2, 3}
    # cells split by magnitude: small vectors → label-0 centroid cell
    assert got[0].cid == got[1].cid
    assert got[2].cid == got[3].cid
    assert got[0].cid != got[2].cid
    for r in got.values():  # every vector is its own semantic cluster
        assert r.cluster_size == 1 and r.keep and r.rep == r.vec_id, r


def test_d21_intra_cell_chain_clusters_transitively(spark, tmp_path):
    """Within one cell, A~B and B~C (cos=0.5) but cos(A,C)=-0.5: the
    component fixpoint must still produce ONE cluster {A,B,C} with the
    min-id keeper — pairwise thresholding alone would split it."""
    from etl_pipeline_telecom_spark.plans.pipeline import d21_semantic_dedup

    rows = [  # 0°, 60°, 120° in the plane — all one label → one cell
        (0, [1.0, 0.0], 0),
        (1, [0.5, 0.866], 0),
        (2, [-0.5, 0.866], 0),
    ]
    d = _write_emb(tmp_path, rows)
    got = {r.vec_id: r for r in d21_semantic_dedup(spark, d).collect()}
    assert all(r.rep == 0 and r.cluster_size == 3 for r in got.values())
    assert [r.keep for r in (got[0], got[1], got[2])] == [True, False, False]


def test_d21_keep_count_matches_cluster_count(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.pipeline import d21_semantic_dedup

    df = d21_semantic_dedup(spark, sf_dir)
    agg = df.agg(
        F.sum(F.col("keep").cast("int")).alias("keepers"),
        F.countDistinct("rep").alias("clusters"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg.keepers == agg.clusters
    assert agg.n >= agg.keepers


def test_d21_oracle_roundtrip_crafted(spark, tmp_path):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.5, 0.866], 0),
        (2, [-0.5, 0.866], 0),
        (3, [100.0, 0.0], 1),
    ]
    _roundtrip(spark, _write_emb(tmp_path, rows), "d21_semantic_dedup")


def test_d21_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "d21_semantic_dedup")


# ---------------------------------------------------------------------------
# sm10: duplication-aware sampling weights
# ---------------------------------------------------------------------------


def test_sm10_crafted_clusters_and_apportionment(spark, tmp_path):
    """Three identical docs form one cluster splitting 10^6 by largest
    remainder (333334/333333/333333, +1 to the LOWEST doc_id); the
    %10==0 doc and its injected clone split evenly; the unique doc keeps
    the full mass."""
    from etl_pipeline_telecom_spark.plans.dedup import _DUP_OFFSET
    from etl_pipeline_telecom_spark.plans.semistructured import (
        sm10_dupaware_weights,
    )

    trip = "alpha bravo carol delta echo foxtrot golf hotel india"
    rows = [
        (1, trip, "en", "s"),
        (2, trip, "en", "s"),
        (3, trip, "en", "s"),
        (4, "zulu yankee xray whiskey victor uniform tango sierra", "en", "s"),
        (10, "kilo lima mike november oscar papa quebec romeo", "en", "s"),
    ]
    d = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in sm10_dupaware_weights(spark, d).collect()}
    assert set(got) == {1, 2, 3, 4, 10, 10 + _DUP_OFFSET}
    assert [got[i].rep for i in (1, 2, 3)] == [1, 1, 1]
    assert [got[i].weight_micro for i in (1, 2, 3)] == [333334, 333333, 333333]
    assert all(got[i].cluster_size == 3 for i in (1, 2, 3))
    assert got[4].weight_micro == 1_000_000 and got[4].cluster_size == 1
    for i in (10, 10 + _DUP_OFFSET):
        assert got[i].rep == 10 and got[i].cluster_size == 2
        assert got[i].weight_micro == 500_000


def test_sm10_conservation_law(spark, sf_dir):
    """SUM(weight_micro) over any cluster == 10^6 exactly; total mass ==
    10^6 × number of clusters — the integer apportionment law."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.semistructured import (
        sm10_dupaware_weights,
    )

    df = sm10_dupaware_weights(spark, sf_dir)
    per = df.groupBy("rep").agg(
        F.sum("weight_micro").alias("mass"),
        F.count(F.lit(1)).alias("n"),
        F.max("cluster_size").alias("cs"),
    )
    bad = per.where(
        (F.col("mass") != 1_000_000) | (F.col("n") != F.col("cs"))
    ).count()
    assert bad == 0
    tot = df.agg(
        F.sum("weight_micro").alias("m"), F.countDistinct("rep").alias("k")
    ).collect()[0]
    assert tot.m == 1_000_000 * tot.k


def test_sm10_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "sm10_dupaware_weights")


# ---------------------------------------------------------------------------
# p11: incremental compaction
# ---------------------------------------------------------------------------


def test_p11_audit_matches_independent_replay(spark, sf_dir):
    """Every audit column must equal an independent DuckDB+python replay
    of the two md5 windows and the threshold rule."""
    import duckdb

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        _P11_MAX_FILES,
        p11_incremental_compact,
    )

    got = {r.bucket: r for r in p11_incremental_compact(spark, sf_dir).collect()}
    expect = {
        b: (nf, nr)
        for b, nf, nr in duckdb.sql(
            f"""SELECT bucket, COUNT(DISTINCT fh % (1 + bucket % 4)) AS nf,
                       COUNT(*) AS nr
               FROM (SELECT CAST(('0x' || substr(m, 1, 8)) AS BIGINT)
                                % {_P11_BUCKETS} AS bucket,
                            CAST(('0x' || substr(m, 9, 8)) AS BIGINT) AS fh
                     FROM (SELECT md5(CAST(event_id AS VARCHAR)) AS m
                           FROM '{os.path.join(sf_dir, "events.parquet")}'))
               GROUP BY bucket"""
        ).fetchall()
    }
    assert set(got) == set(expect)
    for b, (nf, nr) in expect.items():
        r = got[b]
        assert r.n_files_before == nf, b
        assert r.n_rows_before == nr and r.n_rows_after == nr and r.conserved, b
        assert r.rewritten == (nf > _P11_MAX_FILES), b
        assert r.n_files_out == (1 if nf > _P11_MAX_FILES else 0), b
    # the fixture exercises BOTH paths
    assert any(r.rewritten for r in got.values())
    assert any(not r.rewritten for r in got.values())


def test_p11_untouched_buckets_physically_untouched(spark, sf_dir):
    """Buckets within the file budget must keep their EXACT original
    files (path, size, mtime) after the compaction ran, and must have no
    output in the compacted layout."""
    import glob

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        _P11_MAX_FILES,
        p11_incremental_compact,
    )
    from etl_pipeline_telecom_spark.sources.writers import stage_fragmented_events

    staged = stage_fragmented_events(spark, sf_dir, _P11_BUCKETS)

    def snapshot():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(staged, "bucket=*", "**", "*.parquet"),
                               recursive=True)
        }

    before = snapshot()
    rows = p11_incremental_compact(spark, sf_dir).collect()
    assert snapshot() == before, "compaction modified the staged layout"
    from etl_pipeline_telecom_spark.sources.writers import (
        incremental_compact_fragments,
    )

    out = incremental_compact_fragments(spark, sf_dir, _P11_BUCKETS, _P11_MAX_FILES)
    out_buckets = {
        int(e.split("=", 1)[1])
        for e in os.listdir(out)
        if e.startswith("bucket=")
    }
    assert out_buckets == {r.bucket for r in rows if r.rewritten}
    for b in out_buckets:  # each rewritten bucket compacts to ONE file
        parts = glob.glob(os.path.join(out, f"bucket={b}", "part-*.parquet"))
        assert len(parts) == 1, b


def test_p11_rewrite_plan_has_no_shuffle(spark, sf_dir):
    """The per-bucket rewrite is scan → coalesce(1) → write: no Exchange
    may appear (payload rows never shuffle — the p10 discipline)."""
    from etl_pipeline_telecom_spark.plans.pipeline import _P11_BUCKETS
    from etl_pipeline_telecom_spark.sources.writers import stage_fragmented_events

    staged = stage_fragmented_events(spark, sf_dir, _P11_BUCKETS)
    member = (
        spark.read.option("basePath", staged)
        .parquet(os.path.join(staged, "bucket=3"))
        .drop("frag")
        .coalesce(1)
    )
    plan = member._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_p11_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "p11_incremental_compact")


# ---------------------------------------------------------------------------
# m10: metadata-gate image filter
# ---------------------------------------------------------------------------


def test_m10_matches_pure_python_replay(spark, sf_dir):
    """Every gate must equal an independent pure-python replay of the
    header contract (md5 nibble dims, integer density, cross-multiplied
    aspect and mean-threshold rules)."""
    import duckdb

    from etl_pipeline_telecom_spark.plans.multimodal import m10_image_meta_gate

    docs = duckdb.sql(
        f"""SELECT doc_id, text
           FROM '{os.path.join(sf_dir, "documents.parquet")}'
           WHERE doc_id % 3 = 0"""
    ).fetchall()
    exp = {}
    for doc_id, text in docs:
        m = hashlib.md5(text.encode()).hexdigest()
        w = 32 + int(m[0:4], 16) % 992
        h = 32 + int(m[4:8], 16) % 992
        nb = len(text.encode())
        exp[doc_id] = (w, h, nb, (nb * 1_000_000) // (w * h))
    s = sum(v[3] for v in exp.values())
    n = len(exp)
    got = {r.doc_id: r for r in m10_image_meta_gate(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for doc_id, (w, h, nb, dens) in exp.items():
        r = got[doc_id]
        assert (r.width, r.height, r.nbytes, r.density_micro) == (w, h, nb, dens)
        assert r.g_dims == (w >= 64 and h >= 64)
        assert r.g_aspect == (max(w, h) * 2 <= min(w, h) * 5)
        assert r.g_density == (dens * n >= s)
        assert r.pass_meta == (r.g_dims and r.g_aspect and r.g_density)


def test_m10_gates_are_discriminative(spark, sf_dir):
    """The fixture corpus must exercise both sides of the verdict — a
    gate that passes (or fails) everything is vacuous."""
    from etl_pipeline_telecom_spark.plans.multimodal import m10_image_meta_gate

    rows = m10_image_meta_gate(spark, sf_dir).collect()
    assert any(r.pass_meta for r in rows)
    assert any(not r.pass_meta for r in rows)


def test_m10_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "m10_image_meta_gate")


# ---------------------------------------------------------------------------
# t29: CCNet perplexity buckets
# ---------------------------------------------------------------------------


def test_t29_scores_match_t24_and_terciles_are_exact(spark, sf_dir):
    """t29's per-doc score must equal t24's micro bits-per-bigram doc for
    doc (the inline-duplication pin), and the value-based tercile law
    must hold: each cutoff is the SMALLEST score whose cumulative count
    reaches n/3 (resp. 2n/3)."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.text import (
        t24_bigram_surprisal,
        t29_perplexity_buckets,
    )

    t29 = t29_perplexity_buckets(spark, sf_dir)
    t24 = t24_bigram_surprisal(spark, sf_dir).select(
        "doc_id", F.col("micro_bits_per_bigram").alias("m24")
    )
    joined = t29.join(t24, "doc_id", "full")
    assert joined.where(
        F.col("ppl_micro").isNull()
        | F.col("m24").isNull()
        | (F.col("ppl_micro") != F.col("m24"))
    ).count() == 0
    rows = t29.collect()
    n = len(rows)
    c_head, c_tail = rows[0].c_head, rows[0].c_tail
    n_head = sum(1 for r in rows if r.bucket == "head")
    n_hm = sum(1 for r in rows if r.bucket in ("head", "middle"))
    ties_h = sum(1 for r in rows if r.ppl_micro == c_head)
    ties_t = sum(1 for r in rows if r.ppl_micro == c_tail)
    assert all((r.bucket == "head") == (r.ppl_micro <= c_head) for r in rows)
    assert all(
        (r.bucket == "middle") == (c_head < r.ppl_micro <= c_tail) for r in rows
    )
    assert 3 * n_head >= n and 3 * (n_head - ties_h) < n
    assert 3 * n_hm >= 2 * n and 3 * (n_hm - ties_t) < 2 * n


def test_t29_degenerate_corpus_all_head(spark, tmp_path):
    """Identical docs → one score value → both cutoffs equal it → every
    doc is 'head' (value-based buckets put cutoff ties in the lower
    bucket by construction)."""
    from etl_pipeline_telecom_spark.plans.text import t29_perplexity_buckets

    rows = [(i, "alpha bravo alpha carol alpha delta", "en", "s") for i in range(6)]
    d = _write_docs(tmp_path, rows)
    got = t29_perplexity_buckets(spark, d).collect()
    assert len(got) == 6
    assert all(r.bucket == "head" for r in got)
    assert all(r.c_head == r.c_tail == r.ppl_micro for r in got)


def test_t29_oracle_roundtrip_crafted(spark, tmp_path):
    rows = [
        (i, f"w{i % 3} common w{i % 5} common w{i % 7} tail{i}", "en", "s")
        for i in range(12)
    ]
    _roundtrip(spark, _write_docs(tmp_path, rows), "t29_perplexity_buckets")


def test_t29_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t29_perplexity_buckets")


# ---------------------------------------------------------------------------
# m11: audio quality gate
# ---------------------------------------------------------------------------


def test_m11_matches_pure_python_replay(spark, sf_dir):
    """Every gate must equal an independent pure-python replay of the
    m7 PCM contract (md5-derived int16 LE samples) and the gate rules."""
    import duckdb

    from etl_pipeline_telecom_spark.plans.multimodal import (
        _M11_MIN_CROSSINGS,
        _M11_PEAK_CEIL,
        m11_audio_quality_gate,
    )

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
        ).fetchall()
    ]
    exp = {}
    for doc_id in ids:
        raw = b"".join(
            hashlib.md5(f"{doc_id}:a{k}".encode()).digest() for k in range(8)
        )[: 64 * 2]
        s = [
            (v - 65536) if (v := raw[2 * i] + 256 * raw[2 * i + 1]) >= 32768 else v
            for i in range(64)
        ]
        peak = max(abs(x) for x in s)
        crossings = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
        energy = sum(x * x for x in s)
        exp[doc_id] = (peak, crossings, energy)
    se = sum(v[2] for v in exp.values())
    n = len(exp)
    got = {r.doc_id: r for r in m11_audio_quality_gate(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for doc_id, (peak, crossings, energy) in exp.items():
        r = got[doc_id]
        assert (r.peak, r.zero_crossings, r.energy) == (peak, crossings, energy)
        assert r.g_peak == (peak < _M11_PEAK_CEIL)
        assert r.g_active == (crossings >= _M11_MIN_CROSSINGS)
        assert r.g_energy == (energy * n >= se)
        assert r.pass_audio == (r.g_peak and r.g_active and r.g_energy)


def test_m11_energy_gate_is_discriminative(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.multimodal import m11_audio_quality_gate

    rows = m11_audio_quality_gate(spark, sf_dir).collect()
    assert any(r.g_energy for r in rows) and any(not r.g_energy for r in rows)


def test_m11_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "m11_audio_quality_gate")


# ---------------------------------------------------------------------------
# cross-operator contract pins
# ---------------------------------------------------------------------------


def test_sm10_reps_agree_with_d8_components(spark, sf_dir):
    """sm10 and d8 both resolve the d5 pair surface to components — their
    (doc_id, rep) maps must agree exactly on every doc d8 covers (docs in
    at least one pair); sm10 additionally carries the singletons."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.pipeline import d8_neardup_clusters
    from etl_pipeline_telecom_spark.plans.semistructured import (
        sm10_dupaware_weights,
    )

    d8 = d8_neardup_clusters(spark, sf_dir).select(
        "doc_id", F.col("rep").alias("rep8")
    )
    sm = sm10_dupaware_weights(spark, sf_dir).select("doc_id", "rep")
    joined = d8.join(sm, "doc_id", "left")
    assert joined.where(
        F.col("rep").isNull() | (F.col("rep") != F.col("rep8"))
    ).count() == 0


def test_m10_dims_match_m1_header_contract(spark, sf_dir):
    """m10's doc claims it consumes the header fields m1's stub decode
    emits — pin width/height equality doc-for-doc on the image rows so
    the two can never drift apart."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.multimodal import (
        m1_media_features,
        m10_image_meta_gate,
    )

    m1 = (
        m1_media_features(spark, sf_dir)
        .where(F.col("media_type") == "image")
        .select("doc_id", F.col("width").alias("w1"), F.col("height").alias("h1"))
    )
    m10 = m10_image_meta_gate(spark, sf_dir).select("doc_id", "width", "height")
    joined = m1.join(m10, "doc_id", "full")
    assert joined.where(
        F.col("w1").isNull()
        | F.col("width").isNull()
        | (F.col("w1") != F.col("width"))
        | (F.col("h1") != F.col("height"))
    ).count() == 0

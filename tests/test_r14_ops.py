"""Crafted-data pins for the round-14 operators.

Same discipline as test_r7-r13_ops: hand-computed expectations on tiny
crafted fixtures (the hash gate is blind to bugs BOTH engines share —
d19's lesson), plus the DuckDB oracle round-trip where the operator has
one.
"""

from __future__ import annotations

import os

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare
from .test_r12_ops import _write_docs, _write_emb

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def _roundtrip(spark, d: str, name: str) -> None:
    spec = catalog.REGISTRY[name]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"


# ---------------------------------------------------------------------------
# t32: Kneser–Ney smoothed LM — continuation counts + absolute discount
# ---------------------------------------------------------------------------

# t30's crafted train corpus, reused verbatim (3 × "the cat sat the cat
# sat the cat"). KN model: cnt(the,cat)=9, cnt(cat,sat)=6, cnt(sat,the)=6;
# cc: the=9, cat=6, sat=6; n1p = 1 for each context (each w1 has exactly
# one distinct continuation); ct: cat=1, sat=1, the=1; T2 = 3 distinct
# bigram types, bl(T2) = 2.
from .test_r12_ops import _T30_TRAIN  # noqa: E402


def _t32_crafted(tmp_path) -> str:
    rows = [
        (0, _T30_TRAIN, "en", "web"),
        (1, _T30_TRAIN, "en", "web"),
        (2, _T30_TRAIN, "en", "web"),
        (8, "the cat sat the cat", "en", "web"),  # all bigrams seen
        (9, "the cat zonk the", "en", "web"),     # OOV + continuation rungs
        (18, "cat the cat", "en", "web"),         # the λ·P_cont KN rung
    ]
    return _write_docs(tmp_path, rows)


def _bl(x: int) -> int:
    return len(bin(x)) - 2


def test_t32_crafted_all_four_paths_exact(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t32_kneser_ney_lm

    got = {
        r.doc_id: r for r in t32_kneser_ney_lm(spark, _t32_crafted(tmp_path)).collect()
    }
    assert set(got) == {8, 9, 18}
    # doc 8: 4 bigrams, all seen; each pays bl(2·cc) − bl(2·cnt − 1):
    # (the,cat): bl(18)=5 − bl(17)=5 = 0; (cat,sat)/(sat,the):
    # bl(12)=4 − bl(11)=4 = 0 → total 0
    r8 = got[8]
    assert (r8.n_bigrams, r8.n_seen, r8.n_kn_backoff, r8.n_cont, r8.n_oov) == (
        4, 4, 0, 0, 0,
    )
    assert r8.bits_total == 0 and r8.micro_bits_per_bigram == 0
    # doc 9: (the,cat) seen → 0; (cat,zonk): 'zonk' completes nothing in
    # train (ct NULL) → OOV: 1 + bl(T2=3) = 1 + 2 = 3; (zonk,the): 'zonk'
    # unseen as context → raw continuation: bl(3) − bl(ct(the)=1) = 2−1 = 1
    r9 = got[9]
    assert (r9.n_bigrams, r9.n_seen, r9.n_kn_backoff, r9.n_cont, r9.n_oov) == (
        3, 1, 0, 1, 1,
    )
    assert r9.bits_total == 0 + 3 + 1
    assert r9.micro_bits_per_bigram == (4 * 1_000_000) // 3
    # doc 18: (cat,the) unseen, context 'cat' known, 'the' continues →
    # the KN rung λ(cat)·P_cont(the) = (n1p·ct)/(2·cc·T2) = 1/36:
    # bl(2·6·3=36)=6 − bl(1·1=1)=1 → 5; (the,cat) seen → 0
    r18 = got[18]
    assert (r18.n_bigrams, r18.n_seen, r18.n_kn_backoff, r18.n_cont, r18.n_oov) == (
        2, 1, 1, 0, 0,
    )
    assert r18.bits_total == 5
    # corpus mean = 9e6 // 9 = 1e6 → docs 9 (1.33e6) and 18 (2.5e6) flagged
    assert (r8.flagged, r9.flagged, r18.flagged) == (False, True, True)


def test_t32_continuation_oov_vs_t30_backoff(spark, tmp_path):
    """KN's OOV test is 'completes nothing in train' (ct NULL), which is
    STRICTLY stronger than t30's unigram test: a word seen in train only
    DOC-INITIALLY has ucnt > 0 but ct NULL — t30 happily backs off to its
    raw unigram probability, KN correctly scores it as a non-continuation.
    Crafted: 'qstart' opens train doc 10 and never follows anything."""
    from etl_pipeline_telecom_spark.plans.text import (
        t30_backoff_lm,
        t32_kneser_ney_lm,
    )

    d = _write_docs(
        tmp_path,
        [
            (0, _T30_TRAIN, "en", "web"),
            (10, "qstart the cat sat", "en", "web"),
            (28, "the qstart", "en", "web"),
        ],
    )
    # model: cnt(the,cat)=4, (cat,sat)=3, (sat,the)=2, (qstart,the)=1;
    # T2=4; t30 unigrams: the=4, cat=4, sat=3, qstart=1, T=12 (bl=4)
    r32 = {r.doc_id: r for r in t32_kneser_ney_lm(spark, d).collect()}[28]
    r30 = {r.doc_id: r for r in t30_backoff_lm(spark, d).collect()}[28]
    assert (r32.n_oov, r30.n_oov) == (1, 0)          # KN: OOV; t30: backoff
    assert r30.n_backoff == 1
    assert r32.bits_total == 1 + _bl(4)               # 1 + bl(T2) = 4
    assert r30.bits_total == 1 + _bl(12) - _bl(1)     # 1 + bl(T) − bl(ucnt) = 4


def test_t32_relational_laws_vs_t30(spark, sf_dir):
    """Per-doc relational pins against t30 on the real fixture: (a) the
    seen-path count is IDENTICAL (both models are the same bc table);
    (b) KN's OOV count can only exceed t30's (ct NULL ⊇ ucnt NULL);
    (c) for all-seen docs the absolute discount costs at most one bit
    per bigram: t30_bits ≤ t32_bits ≤ t30_bits + n_bigrams
    (bl(2cc)−bl(2cnt−1) ∈ {bl(cc)−bl(cnt), bl(cc)−bl(cnt)+1})."""
    from etl_pipeline_telecom_spark.plans.text import (
        t30_backoff_lm,
        t32_kneser_ney_lm,
    )

    r30 = {r.doc_id: r for r in t30_backoff_lm(spark, sf_dir).collect()}
    r32 = {r.doc_id: r for r in t32_kneser_ney_lm(spark, sf_dir).collect()}
    assert set(r30) == set(r32) and r30
    for did, a in r32.items():
        b = r30[did]
        assert a.n_bigrams == b.n_bigrams
        assert a.n_seen == b.n_seen, did
        assert a.n_oov >= b.n_oov, did
        if a.n_seen == a.n_bigrams:
            assert b.bits_total <= a.bits_total <= b.bits_total + a.n_bigrams, did


def test_t32_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _t32_crafted(tmp_path), "t32_kneser_ney_lm")


def test_t32_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t32_kneser_ney_lm")


# ---------------------------------------------------------------------------
# sm13: DSIR-style importance resampling
# ---------------------------------------------------------------------------

# Crafted corpus with collision-free feature buckets (verified:
# hash32 % 64 of the six bigrams -> {35, 33, 16, 41, 53, 14}): the
# target-like pool doc shares every bigram with the target slice, the
# two mismatch docs share none.
_SM13_ROWS = [
    (0, "alpha beta alpha beta alpha", "en", "src0"),   # target
    (1, "alpha beta alpha beta alpha", "en", "src0"),   # target
    (2, "alpha beta alpha beta", "en", "src1"),         # pool, target-like
    (3, "zz yy zz yy zz", "en", "src1"),                # pool, mismatch
    (4, "mm nn mm nn mm", "de", "src2"),                # pool, mismatch
]


def _sm13_replay(rows):
    """Independent python reference for the whole sm13 pipeline (the
    m13 both-references discipline — the oracle hash is blind to bugs
    both engines share)."""
    import hashlib
    import re

    B, PPM, CAP, TARGET = 64, 1_000_000, 20, "src0"

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def bl(x):
        return len(bin(x)) - 2

    occ = []  # (doc_id, lang, source, feat)
    for did, text, lang, src in rows:
        t = re.split(r"\s+", text.strip().lower())
        for i in range(len(t) - 1):
            occ.append((did, lang, src, h32(t[i] + " " + t[i + 1]) % B))
    tgt = {b: 1 for b in range(B)}
    prop = {b: 1 for b in range(B)}
    for _, _, src, f in occ:
        (tgt if src == TARGET else prop)[f] += 1
    tt, tp = sum(tgt.values()), sum(prop.values())
    score = {}
    lang_of = {}
    for did, lang, src, f in occ:
        if src == TARGET:
            continue
        score[did] = score.get(did, 0) + bl(tgt[f] * tp) - bl(prop[f] * tt)
        lang_of[did] = lang
    s_max = max(score.values())
    out = {}
    for did, s in score.items():
        shift = min(CAP, s_max - s)
        keep = PPM // (2 ** shift)
        out[did] = {
            "lang": lang_of[did],
            "score": s,
            "shift": shift,
            "keep_ppm": keep,
            "admitted": h32(str(did)) % PPM < keep,
        }
    return out


def test_sm13_crafted_semantic_ordering_and_conservation(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.semistructured import (
        _sm13_admissions,
        sm13_dsir_resample,
    )

    d = _write_docs(tmp_path, _SM13_ROWS)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    got = {r.doc_id: r for r in _sm13_admissions(docs).collect()}
    exp = _sm13_replay(_SM13_ROWS)
    assert set(got) == {2, 3, 4}
    for did, e in exp.items():
        g = got[did]
        assert (g.score, g.shift, g.keep_ppm, bool(g.admitted)) == (
            e["score"], e["shift"], e["keep_ppm"], e["admitted"],
        ), did
    # the target-like doc strictly outscores both mismatches, sits at the
    # pool max (shift 0 -> keep_ppm = 10^6) and is therefore admitted
    # unconditionally — admission ∝ weight with the max-weight doc at p=1
    assert got[2].score > got[3].score and got[2].score > got[4].score
    assert (got[2].shift, got[2].keep_ppm, bool(got[2].admitted)) == (0, 1_000_000, True)
    # halving law: keep_ppm == 10^6 >> shift exactly
    for g in got.values():
        assert g.keep_ppm == 1_000_000 // (2 ** g.shift)
    # conservation: the registered per-lang mass equals the per-doc sum
    agg = {r.lang: r for r in sm13_dsir_resample(spark, d).collect()}
    for lang in {"en", "de"}:
        docs_l = [g for g in got.values() if g.lang == lang]
        assert agg[lang].n_pool == len(docs_l)
        assert agg[lang].mass_ppm == sum(g.keep_ppm for g in docs_l)
        assert agg[lang].n_admitted == sum(bool(g.admitted) for g in docs_l)


def test_sm13_python_replay_exact_sf0001(spark, sf_dir):
    """Full-fixture replay: every pool doc's score/shift/keep_ppm/admission
    reproduced by the independent python reference."""
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.semistructured import _sm13_admissions

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("source").to_pylist(),
        )
    )
    exp = _sm13_replay(rows)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in _sm13_admissions(docs).collect()}
    assert set(got) == set(exp)
    for did, e in exp.items():
        g = got[did]
        assert (g.score, g.shift, g.keep_ppm, bool(g.admitted)) == (
            e["score"], e["shift"], e["keep_ppm"], e["admitted"],
        ), did


def test_sm13_deterministic_across_repartitionings(spark, sf_dir):
    """The sm12 determinism contract: the admitted set (and every score)
    is a pure function of the data, byte-stable under physical layout."""
    import os as _os

    from etl_pipeline_telecom_spark.plans.semistructured import _sm13_admissions

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    a = sorted(map(tuple, _sm13_admissions(docs.repartition(3)).collect()))
    b = sorted(map(tuple, _sm13_admissions(docs.repartition(17)).collect()))
    assert a == b and a


def test_sm13_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _write_docs(tmp_path, _SM13_ROWS), "sm13_dsir_resample")


def test_sm13_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "sm13_dsir_resample")


# ---------------------------------------------------------------------------
# v17: filtered ANN — metadata predicate pushed below the IVF probe join
# ---------------------------------------------------------------------------

# One label → one IVF cell, so every vector is a candidate for every
# query. Query 0's three nearest vectors (1,2,3 — cosine ≈ 0.998) are
# all INELIGIBLE (lang 'de'); vectors 4,5,6 (cosine ≈ 0.707) are
# eligible. Post-filtering the unfiltered top-3 therefore returns ZERO
# rows for query 0; the pushed form returns a full k=3.
def _v17_crafted(tmp_path) -> str:
    emb = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.05], 0),
        (2, [1.0, 0.06], 0),
        (3, [1.0, 0.07], 0),
        (4, [0.5, 0.5], 0),
        (5, [0.52, 0.5], 0),
        (6, [0.5, 0.48], 0),
    ]
    long_en = "w " * 210  # n_chars = 420 >= 400
    docs = [
        (0, "kurz", "de", "src1"),
        (1, "kurz", "de", "src1"),
        (2, "kurz", "de", "src1"),
        (3, "kurz", "de", "src1"),
        (4, long_en, "en", "src1"),
        (5, long_en, "en", "src1"),
        (6, long_en, "en", "src1"),
    ]
    _write_emb(tmp_path, emb)
    _write_docs(tmp_path, docs)
    return str(tmp_path)


def test_v17_pushed_filter_returns_k_where_postfilter_underreturns(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.similarity import (
        v7_ivf_probe,
        v17_filtered_ann,
    )

    d = _v17_crafted(tmp_path)
    elig = {4, 5, 6}
    # the post-filter anti-pattern: unfiltered top-3, THEN drop ineligible
    v7_q0 = [r for r in v7_ivf_probe(spark, d).collect() if r.query_id == 0]
    assert {r.neighbor_id for r in v7_q0} == {1, 2, 3}
    assert sum(r.neighbor_id in elig for r in v7_q0) == 0  # under-returns to 0
    # the pushed form fills k=3 from the eligible pool
    got = [r for r in v17_filtered_ann(spark, d).collect() if r.query_id == 0]
    assert len(got) == 3
    assert {r.neighbor_id for r in got} == elig
    assert sorted(r.rn for r in got) == [1, 2, 3]
    # every returned neighbor satisfies the predicate corpus-wide
    assert all(
        r.neighbor_id in elig for r in v17_filtered_ann(spark, d).collect()
    )


def _jchildren(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _jwalk(node):
    yield node
    for c in _jchildren(node):
        yield from _jwalk(c)


def test_v17_filter_sits_below_probe_join(spark, sf_dir):
    """The plan-shape pin (VERDICT r13 item 3): the eligibility predicate
    reaches the documents PARQUET SCAN as pushed filters, and the
    eligibility join sits INSIDE (a descendant of) the probe join's member
    branch, so the distance kernel never scores an ineligible vector.

    ADVICE r14: asserted by walking the actual SparkPlan tree (ancestry,
    not explain-output line order — printed line indices are not tree
    depth across sibling branches, and exact node counts are brittle
    under AQE/version changes)."""
    import contextlib
    import io

    from etl_pipeline_telecom_spark import catalog as cat

    df = cat.REGISTRY["v17_filtered_ann"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "EqualTo(lang,en)" in plan and "GreaterThanOrEqual(n_chars,400)" in plan

    # pre-AQE physical plan: join strategy chosen, tree structure stable
    root = df._jdf.queryExecution().sparkPlan()
    nodes = list(_jwalk(root))

    def named(frag: str):
        return [n for n in nodes if frag in n.nodeName()]

    probes = named("SortMergeJoin") + named("ShuffledHashJoin")
    assert probes, "no shuffle probe join in the v17 plan"
    # eligibility BHJ: the broadcast join whose subtree scans documents
    elig = [
        b
        for b in named("BroadcastHashJoin")
        if any("documents" in str(n) for n in _jwalk(b) if "Scan" in n.nodeName())
    ]
    assert elig, "no broadcast eligibility join over the documents scan"

    def descends(anc, node) -> bool:
        return any(n.equals(node) for n in _jwalk(anc))

    # the eligibility join is a DESCENDANT of a probe join (below it in
    # the tree → excluded vectors never reach the distance kernel) ...
    assert any(descends(p, e) for p in probes for e in elig), (
        "eligibility join is not below the probe join"
    )
    # ... and the Arrow scoring stage is an ANCESTOR of that probe join
    # (scores only post-filter candidates)
    arrows = named("ArrowEvalPython")
    assert any(descends(a, p) for a in arrows for p in probes), (
        "Arrow scoring stage does not sit above the probe join"
    )


def test_v17_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _v17_crafted(tmp_path), "v17_filtered_ann")


def test_v17_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "v17_filtered_ann")


# ---------------------------------------------------------------------------
# p12: snapshot / time-travel read — manifest-versioned, physically pinned
# ---------------------------------------------------------------------------


def test_p12_snapshot_isolation_and_physical_pin(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        _P11_MAX_FILES,
    )
    from etl_pipeline_telecom_spark.sources.writers import (
        read_snapshot,
        snapshot_files_intact,
        stage_fragmented_events,
        stage_versioned_events,
    )

    mdir = stage_versioned_events(spark, sf_dir, _P11_BUCKETS, _P11_MAX_FILES)
    staged = stage_fragmented_events(spark, sf_dir, _P11_BUCKETS)
    # the physical pin: creating version 2 (the compaction commit) never
    # rewrote a version-1 file
    assert snapshot_files_intact(mdir, 1)
    assert snapshot_files_intact(mdir, 2)
    # snapshot isolation: v1 serves ONLY staged-layout files; v2 mixes
    # compacted files in for the rewritten buckets
    s1 = read_snapshot(spark, mdir, 1)
    s2 = read_snapshot(spark, mdir, 2)
    import os as _os

    base = _os.path.basename(staged)
    v1_files = {r.file_path for r in s1.select("file_path").distinct().collect()}
    assert all(base in p for p in v1_files)
    v2_files = {r.file_path for r in s2.select("file_path").distinct().collect()}
    assert any(base not in p for p in v2_files), "no compacted file in v2"
    # row conservation: both versions are the same logical table
    ev = spark.read.parquet(_os.path.join(sf_dir, "events.parquet"))
    cols = ["event_id", "user_id", "event_type", "value"]
    a = sorted(map(tuple, s1.select(*cols).collect()))
    b = sorted(map(tuple, s2.select(*cols).collect()))
    c = sorted(map(tuple, ev.select(*cols).collect()))
    assert a == b == c and a


def test_p12_tamper_detection(spark, sf_dir, tmp_path):
    """Rewriting a committed snapshot file in place must flip the
    physical pin (and with it p12's hash-gated snapshot_ok column)."""
    import json
    import os as _os
    import shutil

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        _P11_MAX_FILES,
    )
    from etl_pipeline_telecom_spark.sources.writers import (
        snapshot_files_intact,
        stage_versioned_events,
    )

    src = stage_versioned_events(spark, sf_dir, _P11_BUCKETS, _P11_MAX_FILES)
    mdir = str(tmp_path / "manifests")
    shutil.copytree(src, mdir)
    assert snapshot_files_intact(mdir, 1)
    # tamper: point one v1 entry at a file with different stats
    with open(_os.path.join(mdir, "v1.json")) as f:
        m = json.load(f)
    m["files"][0]["mtime_ns"] += 1
    with open(_os.path.join(mdir, "v1.json"), "w") as f:
        json.dump(m, f)
    assert not snapshot_files_intact(mdir, 1)


def test_p12_missing_version_fails_loud(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        _P11_MAX_FILES,
    )
    from etl_pipeline_telecom_spark.sources.writers import (
        read_snapshot,
        stage_versioned_events,
    )

    mdir = stage_versioned_events(spark, sf_dir, _P11_BUCKETS, _P11_MAX_FILES)
    with pytest.raises(ValueError, match="version 9 does not exist"):
        read_snapshot(spark, mdir, 9)


def test_p12_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "p12_snapshot_read")

"""Crafted-data pins for the round-13 operators.

Same discipline as test_r7-r12_ops: hand-computed expectations on tiny
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
from .test_r12_ops import _write_docs

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def _roundtrip(spark, d: str, name: str) -> None:
    spec = catalog.REGISTRY[name]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"


# ---------------------------------------------------------------------------
# pipe5: streaming incremental curation against persisted state
# ---------------------------------------------------------------------------

# A corpus where every gate fires on a KNOWN batch doc, including the two
# state-dependent paths no batch rerun exercises: an arrival dropped only
# because of the PERSISTED base store, and one dropped only because of a
# doc ADMITTED BY AN EARLIER MICRO-BATCH.
#
# base (doc_id % 7 != 3): 1, 2 — two copies of the same 25-word doc; the
#   frozen LM trains on them, so every train-seen bigram carries 0 bits
#   and the frozen threshold is exactly 0 (a doc passes the perplexity
#   gate iff it has >= 1 train-seen bigram).
# batch (doc_id % 7 == 3), slice = (doc_id // 7) % 4:
#   3  (slice 0) exact copy of base doc 1       -> dropped at exact_dedup
#   31 (slice 0) "the qa1 the qa2 ..." — every bigram train-unseen
#                                               -> dropped at perplexity
#   59 (slice 0) unique quality doc             -> ADMITTED
#   38 (slice 1) base doc 1 with last word swapped (shingle J = 5/6)
#                                               -> dropped at fuzzy (BASE anchor)
#   66 (slice 1) doc 59 with one word swapped   -> dropped at fuzzy
#                                    (anchored to the slice-0 ADMISSION)
#   17 (slice 2) no language markers            -> dropped at langid
#   45 (slice 2) "the cat and dog nap" x5       -> within-slice pair rep, ADMITTED
#   73 (slice 2) 45 with one 'nap' -> 'map'     -> dropped (non-rep of the pair)
#   24 (slice 3) three words                    -> dropped at gopher_rules
_P5_BASE = "the cat and dog sat " * 5
_P5_UNIQ = (
    "the cat ate food and the dog ate bones and the cat ran fast "
    "and the dog ran far and all sat here"
)
_PIPE5_ROWS = [
    (1, _P5_BASE, "en", "web"),
    (2, _P5_BASE, "en", "web"),
    (3, _P5_BASE, "en", "web"),
    (17, " ".join(f"zoqa{i}" for i in range(25)), "en", "web"),
    (24, "the and cat", "en", "web"),
    (31, " ".join(f"the qa{i}" for i in range(1, 13)), "en", "web"),
    (38, _P5_BASE.rstrip().rsplit(" ", 1)[0] + " fowl", "en", "web"),
    (45, "the cat and dog nap " * 5, "en", "web"),
    (59, _P5_UNIQ, "en", "web"),
    (66, _P5_UNIQ.replace("bones", "rocks"), "en", "web"),
    (73, ("the cat and dog nap " * 5).rstrip().rsplit(" ", 1)[0] + " map", "en", "web"),
]

_PIPE5_EXPECT = {
    # slice: (n0, n1, n2, n3, n4, n5)
    0: (3, 3, 3, 2, 1, 1),
    1: (2, 2, 2, 2, 2, 0),
    2: (3, 2, 2, 2, 2, 1),
    3: (1, 1, 0, 0, 0, 0),
}


def _pipe5_state_dir(sf_dir: str) -> str:
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.getpid()}".encode()
    ).hexdigest()[:10]
    return os.path.join("/tmp", f"spark_graft_pipe5_state_{key}")


def test_pipe5_crafted_every_gate_fires(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    d = _write_docs(tmp_path, _PIPE5_ROWS)
    rows = pipe5_incremental_curation(spark, d).collect()
    got = {(r.slice_id, r.stage_ord): (r.docs_in, r.docs_out) for r in rows}
    assert len(rows) == 24
    for s, (n0, n1, n2, n3, n4, n5) in _PIPE5_EXPECT.items():
        chain = [n0, n1, n2, n3, n4, n5]
        for o in range(6):
            di = n0 if o == 0 else chain[o - 1]
            assert got[(s, o)] == (di, chain[o]), (s, o, got[(s, o)])
    # the two state-dependent drops really happened at the fuzzy stage:
    # slice 1 lost both docs there (38 to the base anchor, 66 to the
    # slice-0 admission) and nowhere earlier
    assert got[(1, 5)] == (2, 0)


def test_pipe5_crafted_admitted_state(spark, tmp_path):
    """The delta store ends the run holding EXACTLY the admitted docs —
    59 (slice 0) and 45 (slice 2) — with base-consistent fingerprints."""
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    d = _write_docs(tmp_path, _PIPE5_ROWS)
    pipe5_incremental_curation(spark, d).collect()
    state = spark.read.parquet(os.path.join(_pipe5_state_dir(d), "admitted"))
    got = {(r.slice_id, r.doc_id) for r in state.collect()}
    assert got == {(0, 59), (2, 45)}


def test_pipe5_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _write_docs(tmp_path, _PIPE5_ROWS), "pipe5_incremental_curation")


def test_pipe5_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "pipe5_incremental_curation")


def test_pipe5_stream_state_equals_audit(spark, sf_dir):
    """Stream-vs-batch set equality, per slice: the ids the foreachBatch
    path ADMITTED INTO THE STORE == the ids the audit recompute admits.
    (The oracle hash already fails if a wrong admit shifts a later
    slice's counts; this pins the admitted SETS directly, catching a
    count-preserving swap the funnel could miss.)"""
    from etl_pipeline_telecom_spark.plans.pipeline import (
        _pipe5_audit,
        pipe5_incremental_curation,
    )

    pipe5_incremental_curation(spark, sf_dir).collect()
    state_dir = _pipe5_state_dir(sf_dir)
    state = spark.read.parquet(os.path.join(state_dir, "admitted"))
    stream_adm = {}
    for r in state.select("slice_id", "doc_id").collect():
        stream_adm.setdefault(int(r.slice_id), set()).add(int(r.doc_id))
    audit_adm: dict[int, object] = {}
    _pipe5_audit(spark, sf_dir, state_dir, admitted_out=audit_adm).collect()
    for s, adm_df in audit_adm.items():
        audit_ids = {int(r.doc_id) for r in adm_df.collect()}
        assert stream_adm.get(s, set()) == audit_ids, f"slice {s}"


def test_pipe5_base_index_files_physically_untouched(spark, sf_dir):
    """The curation pass PROBES the persisted base band index, never
    rewrites it — the p11/v15 physical-pin pattern (path, size, mtime)."""
    from etl_pipeline_telecom_spark.plans.dedup import persisted_band_index
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    persisted_band_index(spark, sf_dir)  # ensure built
    base = os.path.abspath(sf_dir)
    slug = "".join(
        c if c.isalnum() else "_" for c in base.rstrip("/").rsplit("/", 1)[-1]
    )
    table = f"lsh_band_index_{slug}_{hashlib.sha1(base.encode()).hexdigest()[:8]}"
    pkg = os.path.dirname(
        os.path.dirname(os.path.abspath(catalog.__file__))
    )
    idx_dir = os.path.join(pkg, ".scratch", table)

    def snap():
        return sorted(
            (f, os.path.getsize(os.path.join(idx_dir, f)),
             os.path.getmtime(os.path.join(idx_dir, f)))
            for f in os.listdir(idx_dir)
            if not f.startswith(".")
        )

    before = snap()
    assert before, "base index is empty"
    pipe5_incremental_curation(spark, sf_dir).collect()
    assert snap() == before, "curation touched the base index files"


def test_pipe5_funnel_chaining_and_state_vectors(spark, sf_dir):
    """Chaining + the built-in dup vector at fixture scale: docs_in
    chains from the previous stage's docs_out within every slice, and
    the dup re-insertions (orig % 70 == 0 lands the copy in the batch)
    make the exact_dedup stage provably fire against the base store."""
    from etl_pipeline_telecom_spark.plans.pipeline import pipe5_incremental_curation

    rows = sorted(
        pipe5_incremental_curation(spark, sf_dir).collect(),
        key=lambda r: (r.slice_id, r.stage_ord),
    )
    assert [(r.slice_id, r.stage_ord) for r in rows] == [
        (s, o) for s in range(4) for o in range(6)
    ]
    for s in range(4):
        sl = rows[s * 6 : (s + 1) * 6]
        assert sl[0].docs_in == sl[0].docs_out  # arrived
        for prev, cur in zip(sl, sl[1:]):
            assert cur.docs_in == prev.docs_out, (s, cur.stage)
        for r in sl:
            assert r.dropped == r.docs_in - r.docs_out
    assert sum(r.dropped for r in rows if r.stage == "exact_dedup") > 0
    assert sum(r.docs_out for r in rows if r.stage == "fuzzy_dedup") > 0


# ---------------------------------------------------------------------------
# sm12: epoch-deterministic global shuffle + balanced shard assignment
# ---------------------------------------------------------------------------


def test_sm12_assignment_partition_invariant(spark, sf_dir):
    """THE determinism contract: same epoch => byte-identical (shard, pos)
    assignment regardless of input partitioning (the content-addressed
    key + two-pass rank make the order a pure function of doc ids)."""
    from etl_pipeline_telecom_spark.plans.pipeline import _sm12_assignment
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {r.doc_id: (r.shard_id, r.pos)
         for r in _sm12_assignment(docs.repartition(3), 0).collect()}
    b = {r.doc_id: (r.shard_id, r.pos)
         for r in _sm12_assignment(docs.repartition(17), 0).collect()}
    assert a == b
    # a different epoch is a genuinely different permutation
    e1 = {r.doc_id: (r.shard_id, r.pos)
          for r in _sm12_assignment(docs, 1).collect()}
    assert a != e1
    assert set(a) == set(e1)  # same universe, different order


def test_sm12_matches_plain_rownumber_replay(spark, sf_dir):
    """The two-pass bucketed rank == a plain global ROW_NUMBER over
    (key, doc_id) — the single-partition shape sm12 exists to avoid."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.functions.text import hash32
    from etl_pipeline_telecom_spark.plans.pipeline import (
        _SM12_SHARDS,
        _sm12_assignment,
    )
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = hash32(F.concat_ws(":", F.lit("0"), F.col("doc_id").cast("string")))
    naive = docs.select(
        "doc_id",
        (F.row_number().over(Window.orderBy(key, "doc_id")) - 1).alias("rank"),
    )
    expect = {
        r.doc_id: (r.rank % _SM12_SHARDS, r.rank // _SM12_SHARDS)
        for r in naive.collect()
    }
    got = {r.doc_id: (r.shard_id, r.pos) for r in _sm12_assignment(docs, 0).collect()}
    assert got == expect


def test_sm12_balance_and_interleave(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.pipeline import (
        _SM12_EPOCHS,
        _SM12_SHARDS,
        sm12_epoch_shard_shuffle,
    )

    rows = sm12_epoch_shard_shuffle(spark, sf_dir).collect()
    assert len(rows) == _SM12_EPOCHS * _SM12_SHARDS
    for e in range(_SM12_EPOCHS):
        sizes = sorted(r.n_docs for r in rows if r.epoch == e)
        assert sizes[-1] - sizes[0] <= 1  # DistributedSampler balance
        for r in rows:
            if r.epoch == e:
                assert r.max_pos == r.n_docs - 1  # contiguous positions


def test_sm12_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "sm12_epoch_shard_shuffle")


# ---------------------------------------------------------------------------
# m13: pHash (DCT) perceptual near-dup — the m6 cross-check
# ---------------------------------------------------------------------------


def _m6_dhash_bits(g):
    """m6's dHash rule as a python reference (adjacent-intensity compare)."""
    return [
        1 if g[(j // 16) * 17 + j % 16 + 1] > g[(j // 16) * 17 + j % 16] else 0
        for j in range(128)
    ]


def test_m13_phash_catches_what_dhash_misses():
    """THE disagreement pin (VERDICT r12 item 4): on every fixture
    copy/original pair, dHash's Hamming blows past its gate (the
    checkerboard flips adjacent comparisons) while pHash stays within
    its gate AND its even-v bands are bit-identical — the exact-algebra
    recall guarantee."""
    from etl_pipeline_telecom_spark.plans.multimodal import (
        _M13_HAMMING_MAX,
        _m13_gray,
        _m13_phash_bits,
    )

    for base in range(0, 500, 10):
        g0, g1 = _m13_gray(base, False), _m13_gray(base, True)
        dh = sum(a != b for a, b in zip(_m6_dhash_bits(g0), _m6_dhash_bits(g1)))
        p0, p1 = _m13_phash_bits(g0), _m13_phash_bits(g1)
        ph = sum(a != b for a, b in zip(p0, p1))
        assert dh > 10, (base, dh)          # dHash would MISS this copy
        assert ph <= _M13_HAMMING_MAX, (base, ph)
        assert p0[:32] == p1[:32], base     # bands 0/1 exactly invariant


def test_m13_dct_kernel_reference():
    """The integer DCT against a direct O(n^2) python replay on a
    crafted grid — catches any index/transpose slip in the matmul."""
    from etl_pipeline_telecom_spark.plans.multimodal import (
        _M13_CX,
        _M13_CY,
        _M13_PERM,
        _m13_phash_bits,
    )

    g = [(i * 37 + 11) % 128 + 64 for i in range(136)]
    co = {}
    for u in range(8):
        for v in range(8):
            co[u * 8 + v] = sum(
                g[y * 17 + x] * _M13_CX[u][x] * _M13_CY[v][y]
                for x in range(17)
                for y in range(8)
            )
    expect = [int(co[c] > 0) for c in _M13_PERM]
    assert _m13_phash_bits(g) == expect


def test_m13_recall_is_total_and_exact(spark, sf_dir):
    """Every (original, copy) pair appears in the output — deterministic
    recall, not LSH luck — and nothing else does at fixture scale."""
    from etl_pipeline_telecom_spark.plans.dedup import _DUP_OFFSET
    from etl_pipeline_telecom_spark.plans.multimodal import m13_phash_neardup
    from etl_pipeline_telecom_spark.sources import load_table

    copies = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where("doc_id % 10 = 0")
        .select("doc_id")
        .collect()
    }
    rows = m13_phash_neardup(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    expect = {(d, d + _DUP_OFFSET) for d in copies}
    assert expect <= got
    extras = got - expect
    assert not extras, f"false positives at fixture scale: {sorted(extras)[:5]}"


def test_m13_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "m13_phash_neardup")


# ---------------------------------------------------------------------------
# t31: trigram stupid backoff — t30's ladder grown one level
# ---------------------------------------------------------------------------

# t30's crafted train corpus, reused verbatim: 3 × "the cat sat the cat
# sat the cat". Trigram counts: (the,cat,sat)=(cat,sat,the)=(sat,the,cat)
# = 6; cc3 = 6 each. Bigram model (t30's): (the,cat)=9, (cat,sat)=6,
# (sat,the)=6; cc2: the=9, cat=6, sat=6. Unigrams: the=9, cat=9, sat=6;
# T=24, bl(T)=5.
from .test_r12_ops import _T30_TRAIN  # noqa: E402


def _t31_crafted(tmp_path) -> str:
    rows = [
        (0, _T30_TRAIN, "en", "web"),
        (1, _T30_TRAIN, "en", "web"),
        (2, _T30_TRAIN, "en", "web"),
        (8, "the cat sat the cat", "en", "web"),   # all trigrams seen
        (9, "the cat zonk the", "en", "web"),      # OOV + unigram rungs
        (18, "cat the cat", "en", "web"),          # the bigram rung
    ]
    return _write_docs(tmp_path, rows)


def _bl(x: int) -> int:
    return len(bin(x)) - 2


def test_t31_crafted_all_four_paths_exact(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t31_trigram_backoff_lm

    got = {
        r.doc_id: r for r in t31_trigram_backoff_lm(spark, _t31_crafted(tmp_path)).collect()
    }
    assert set(got) == {8, 9, 18}
    # doc 8: (the,cat,sat),(cat,sat,the),(sat,the,cat) all seen,
    # bl(cc3=6)-bl(cnt3=6) = 0 each
    r8 = got[8]
    assert (r8.n_trigrams, r8.n_seen3, r8.n_backoff2, r8.n_backoff1, r8.n_oov) == (
        3, 3, 0, 0, 0,
    )
    assert r8.bits_total == 0 and r8.micro_bits_per_trigram == 0
    # doc 9: (the,cat,zonk) -> zonk OOV: 2 + bl(T)=5 -> 7;
    #        (cat,zonk,the) -> bigram (zonk,the) unseen, 'the' known
    #        (ucnt=9, bl=4): 2 + 5 - 4 = 3
    r9 = got[9]
    assert (r9.n_trigrams, r9.n_seen3, r9.n_backoff2, r9.n_backoff1, r9.n_oov) == (
        2, 0, 0, 1, 1,
    )
    assert r9.bits_total == 7 + 3
    assert r9.micro_bits_per_trigram == (10 * 1_000_000) // 2
    # doc 18: (cat,the,cat) trigram-unseen, bigram (the,cat) seen:
    # 1 + bl(cc2(the)=9) - bl(cnt2(the,cat)=9) = 1 + 4 - 4 = 1
    r18 = got[18]
    assert (r18.n_trigrams, r18.n_seen3, r18.n_backoff2, r18.n_backoff1, r18.n_oov) == (
        1, 0, 1, 0, 0,
    )
    assert r18.bits_total == 1
    # corpus mean = 11e6 // 6 -> only doc 9 is flagged
    assert (r8.flagged, r9.flagged, r18.flagged) == (False, True, False)


def test_t31_bigram_rung_is_one_plus_t30_seen_bits(spark, tmp_path):
    """The relational pin (VERDICT r12 item 5): the →bigram rung uses
    EXACTLY t30's bigram model, so for a doc whose trigrams are all
    backoff2 with train-seen bigrams, t31's bits == n_trigrams·1 +
    Σ t30-seen-bits of the (w2,w3) bigrams. Doc 18's only bigram on
    that path is (the,cat), whose t30 seen bits are bl(9)−bl(9) = 0 —
    and t30 itself (run on the same fixture) scores that same bigram
    on its seen path with 0 bits."""
    from etl_pipeline_telecom_spark.plans.text import (
        t30_backoff_lm,
        t31_trigram_backoff_lm,
    )

    d = _t31_crafted(tmp_path)
    r31 = {r.doc_id: r for r in t31_trigram_backoff_lm(spark, d).collect()}[18]
    r30 = {r.doc_id: r for r in t30_backoff_lm(spark, d).collect()}[18]
    # t30 on doc 18 "cat the cat": (cat,the) backoff (1+5-4=2),
    # (the,cat) seen (0 bits) -> its seen-path contribution is 0
    assert (r30.n_seen, r30.n_backoff, r30.bits_total) == (1, 1, 2)
    t30_seen_bits = r30.bits_total - (r30.n_backoff + r30.n_oov) * (1 + 5) + 4
    assert t30_seen_bits == 0
    assert r31.bits_total == r31.n_backoff2 * 1 + t30_seen_bits


def test_t31_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _t31_crafted(tmp_path), "t31_trigram_backoff_lm")


def test_t31_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t31_trigram_backoff_lm")


# ---------------------------------------------------------------------------
# v16: index-rebuild trigger — the ANN lifecycle's maintenance decision
# ---------------------------------------------------------------------------

from .test_r12_ops import _write_emb  # noqa: E402

# Two tight cells; a 5-vector arrival wave lands in cell 1 (persisted-
# centroid assignment: dist 472,900 vs 533,500 to cell 0) and drags its
# live centroid to [289, 750] — hand-computed drift and ppm below.
_V16_ROWS = (
    [(i, [1.0, 0.0], 0) for i in (0, 1, 2, 4)]
    + [(i, [0.0, 1.0], 1) for i in (5, 6, 8, 9)]
    + [(i, [0.52, 0.55], 1) for i in (3, 10, 17, 24, 31)]
)


def test_v16_crafted_decisions_exact(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.similarity import v16_index_rebuild_trigger

    d = _write_emb(tmp_path, _V16_ROWS)
    got = {r.cid: r for r in v16_index_rebuild_trigger(spark, d).collect()}
    assert set(got) == {0, 1}
    r0, r1 = got[0], got[1]
    assert (r0.n_base, r0.n_delta, r0.delta_ppm, r0.drift_sq, r0.misassign_ppm,
            r0.decision) == (4, 0, 0, 0, 0, "keep")
    # live c1 = round([2600/9, 6750/9]) = [289, 750];
    # drift = 289^2 + 250^2 = 146,021; delta_ppm = 5e6 // 9 = 555,555
    assert (r1.n_base, r1.n_delta, r1.delta_ppm, r1.drift_sq, r1.misassign_ppm,
            r1.decision) == (4, 5, 555555, 146021, 0, "rebuild")


def test_v16_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _write_emb(tmp_path, _V16_ROWS), "v16_index_rebuild_trigger")


def test_v16_both_branches_fire_at_fixture_scale(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.similarity import v16_index_rebuild_trigger

    rows = v16_index_rebuild_trigger(spark, sf_dir).collect()
    decisions = {r.decision for r in rows}
    assert decisions == {"keep", "rebuild"}, decisions
    for r in rows:
        assert r.delta_ppm == (r.n_delta * 1_000_000) // (r.n_base + r.n_delta)
        assert 0 <= r.misassign_ppm <= 1_000_000


def test_v16_rebuild_restores_assignment_quality(spark, sf_dir):
    """The grading pin: REBUILDING (recompute centroids over the serving
    set, reassign) must reduce total misassignment — misassignment is
    the recall driver the v9 harness grades (a vector serving in the
    wrong cell is invisible to probes of its true cell), so this is the
    recall delta that justifies the trigger's 'rebuild' rows."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.similarity import (
        _v16_live_centroids,
        _v16_misassigned,
        persisted_ivf_index,
        staged_ivf_delta,
        v16_index_rebuild_trigger,
    )

    before = {
        r.cid: r.misassign_ppm
        for r in v16_index_rebuild_trigger(spark, sf_dir).collect()
    }
    base_dir = persisted_ivf_index(spark, sf_dir)
    delta_dir = staged_ivf_delta(spark, sf_dir, base_dir)
    base = spark.read.parquet(os.path.join(base_dir, "assign")).select(
        "vec_id", "qv", F.col("cid").cast("int").alias("cid")
    )
    delta = spark.read.parquet(delta_dir).select(
        "vec_id", "qv", F.col("cid").cast("int").alias("cid")
    )
    members = base.unionByName(delta)
    # REBUILD: live centroids become the model; reassign every member;
    # then measure misassignment against the rebuilt model's own live
    # centroids (one Lloyd's step of self-consistency)
    live = _v16_live_centroids(members)
    dist = (
        F.aggregate(F.zip_with("qv", "lvec", lambda x, y: x * y), F.lit(0.0),
                    lambda a, v: a + v) * (-2)
        + F.aggregate(F.transform("qv", lambda x: x * x), F.lit(0.0),
                      lambda a, v: a + v)
        + F.aggregate(F.transform("lvec", lambda x: x * x), F.lit(0.0),
                      lambda a, v: a + v)
    )
    from pyspark.sql import Window

    d2 = members.drop("cid").crossJoin(
        F.broadcast(live.select(F.col("cid").alias("lcid"), "lvec"))
    ).select("vec_id", "qv", "lcid", dist.alias("dist"))
    w = Window.partitionBy("vec_id").orderBy("dist", "lcid")
    reassigned = (
        d2.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("vec_id", "qv", F.col("lcid").alias("cid"))
    )
    live2 = _v16_live_centroids(reassigned)
    sizes = reassigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    after = {
        r.cid: (r.n_mis * 1_000_000) // r.n
        for r in _v16_misassigned(reassigned, live2).join(sizes, "cid").collect()
    }
    tot_before = sum(before.values())
    tot_after = sum(after.values())
    assert tot_after < tot_before, (tot_before, tot_after)


def test_v16_base_index_files_physically_untouched(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.similarity import (
        persisted_ivf_index,
        v16_index_rebuild_trigger,
    )

    base_dir = persisted_ivf_index(spark, sf_dir)

    def snap():
        out = []
        for root, _dirs, files in os.walk(base_dir):
            for f in files:
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p), os.path.getmtime(p)))
        return sorted(out)

    before = snap()
    assert before
    v16_index_rebuild_trigger(spark, sf_dir).collect()
    assert snap() == before


def test_v16_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "v16_index_rebuild_trigger")

"""Crafted-data pins for the round-15 operators.

Same discipline as test_r7-r14_ops: hand-computed expectations on tiny
crafted fixtures (the hash gate is blind to bugs BOTH engines share —
d19's lesson), plus the DuckDB oracle round-trip where the operator has
one.
"""

from __future__ import annotations

import hashlib

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
# d22: span-level exact-substring removal + document reassembly
# ---------------------------------------------------------------------------

_SPAN60 = [f"sp{i}" for i in range(60)]  # the >= 50-token duplicated span
_SPAN20 = [f"qq{i}" for i in range(20)]  # below the removal threshold


def _d22_crafted(tmp_path) -> str:
    """Docs 1/2 share a 60-token span that crosses DIFFERENT line
    boundaries in each doc (no two lines are byte-identical anywhere in
    the corpus, so keep-first LINE dedup — t13 — would change nothing);
    docs 3/4 share a 20-token span, below the 50-token removal floor.
    All ids avoid %% 10 == 0 so corpus_with_dups adds no re-insertions."""
    d1 = "a1 a2 " + " ".join(_SPAN60[:30]) + "\n" + " ".join(_SPAN60[30:]) + " a3"
    d2 = (
        "b1 b2 b3 " + " ".join(_SPAN60[:20]) + "\n" + " ".join(_SPAN60[20:]) + " b4"
    )
    d3 = "c1 " + " ".join(_SPAN20) + " c2"
    d4 = "d1 " + " ".join(_SPAN20) + " d2"
    rows = [(1, d1, "en", "web"), (2, d2, "en", "web"),
            (3, d3, "en", "web"), (4, d4, "en", "web")]
    # the line-dedup contrast, asserted on the fixture itself: no line is
    # shared between any two docs, so line-granular keep-first dedup is a
    # no-op on this corpus while d22 must still cut doc 2's span
    lines = [set(r[1].split("\n")) for r in rows]
    for i in range(len(lines)):
        for j in range(i + 1, len(lines)):
            assert not (lines[i] & lines[j])
    return _write_docs(tmp_path, rows)


def test_d22_crafted_span_removed_where_line_dedup_would_not(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.dedup import d22_span_removal_dedup

    got = {
        r.doc_id: r
        for r in d22_span_removal_dedup(spark, _d22_crafted(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # doc 1 holds the corpus-FIRST occurrence of every duplicated shingle
    # → intact (keep-first at span granularity)
    r1 = got[1]
    assert (r1.n_removed, r1.n_spans) == (0, 0)
    assert r1.text_dedup == "a1 a2 " + " ".join(_SPAN60) + " a3"
    # doc 2's copy of the span (positions 4..63, 60 tokens >= 50) is cut;
    # the doc is REASSEMBLED from its unique tokens — a change no
    # line-granular dedup could make on this corpus (no shared lines)
    r2 = got[2]
    assert (r2.n_tokens, r2.n_removed, r2.n_spans) == (64, 60, 1)
    assert r2.text_dedup == "b1 b2 b3 b4"
    # the 20-token shared span is below the 50-token floor → untouched
    for i in (3, 4):
        assert (got[i].n_removed, got[i].n_spans) == (0, 0)
        assert got[i].text_dedup.split() == got[i].text_dedup.split()  # parses
        assert len(got[i].text_dedup.split()) == got[i].n_tokens


def test_d22_whole_doc_duplicate_reassembles_empty(spark, sf_dir):
    """corpus_with_dups re-inserts byte-identical copies (doc_id + 1e7);
    a copy long enough to clear the 50-token floor must reassemble to the
    EMPTY string (every token inside one removed span)."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.dedup import (
        _DUP_OFFSET,
        d22_span_removal_dedup,
    )

    out = d22_span_removal_dedup(spark, sf_dir)
    dups = out.where(F.col("doc_id") >= _DUP_OFFSET)
    full = dups.where(F.col("n_tokens") >= 50).collect()
    assert full, "fixture has no >=50-token re-inserted duplicates"
    for r in full:
        assert r.n_removed == r.n_tokens and r.text_dedup == "", r.doc_id


def test_d22_keep_first_is_insertion_invariant(spark, sf_dir):
    """THE keep-first law, as an invariance: re-inserting duplicate copies
    at LARGER (doc_id, pos) keys must not change any earlier doc's output
    by one byte — first occurrences keep their spans no matter how many
    later copies arrive. (The naive per-doc form — 'a dup's source doc is
    never wiped' — is FALSE on this templated corpus: doc 120's every
    8-shingle legitimately first-occurs in even earlier docs.)"""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.dedup import (
        _DUP_OFFSET,
        corpus_with_dups,
        span_removal,
    )
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    alone = sorted(map(tuple, span_removal(docs).collect()))
    with_dups = sorted(
        map(
            tuple,
            span_removal(corpus_with_dups(spark, sf_dir))
            .where(F.col("doc_id") < _DUP_OFFSET)
            .collect(),
        )
    )
    assert alone == with_dups and alone


def test_d22_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _d22_crafted(tmp_path), "d22_span_removal_dedup")


def test_d22_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "d22_span_removal_dedup")


# ---------------------------------------------------------------------------
# sm14: DoReMi mixture-weight optimization
# ---------------------------------------------------------------------------

_PPM = 1_000_000


def _sm14_replay(domains: list[tuple[str, int]]) -> dict[str, int]:
    """Independent python replay of the full T-step DRO iteration from
    (source, micro_loss) — the sm13 whole-pipeline-replay discipline,
    applied to the part of sm14 the t30 tests don't already cover."""
    from etl_pipeline_telecom_spark.plans.semistructured import (
        _SM14_C,
        _SM14_CAP,
        _SM14_SM,
        _SM14_T,
    )

    doms = sorted(domains)
    k = len(doms)
    uni = {
        s: _PPM // k + (1 if i + 1 <= _PPM % k else 0)
        for i, (s, _) in enumerate(doms)
    }
    w = dict(uni)
    loss = dict(doms)
    for _ in range(_SM14_T):
        baseline = sum(w[s] * loss[s] for s in w) // _PPM
        u = {
            s: w[s] * (_SM14_C + min(_SM14_CAP, max(0, loss[s] - baseline)))
            for s in w
        }
        su = sum(u.values())
        base = {s: (_PPM * u[s]) // su for s in u}
        rem = {s: (_PPM * u[s]) % su for s in u}
        order = sorted(u, key=lambda s: (-rem[s], s))
        deficit = _PPM - sum(base.values())
        wp = {s: base[s] + (1 if order.index(s) < deficit else 0) for s in u}
        wsm = {s: (_PPM - _SM14_SM) * wp[s] + _SM14_SM * uni[s] for s in u}
        b2 = {s: wsm[s] // _PPM for s in u}
        order2 = sorted(u, key=lambda s: (-(wsm[s] % _PPM), s))
        deficit2 = _PPM - sum(b2.values())
        w = {s: b2[s] + (1 if order2.index(s) < deficit2 else 0) for s in u}
    return w


def test_sm14_conservation_and_replay(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.semistructured import sm14_doremi_mixture

    rows = sm14_doremi_mixture(spark, sf_dir).collect()
    assert sum(r.w0_ppm for r in rows) == _PPM
    assert sum(r.weight_ppm for r in rows) == _PPM  # conservation, exactly
    # independent python replay of all T iterations from the domain losses
    replay = _sm14_replay([(r.source, r.micro_loss) for r in rows])
    for r in rows:
        assert replay[r.source] == r.weight_ppm, r.source


def _sm14_crafted(tmp_path) -> str:
    """Two domains scored by a reference LM trained on the %%10<8 slice:
    'easy' docs repeat one high-count seen sentence; 'hard' docs are
    singleton-bigram gibberish (every bigram costs bits). hard's loss is
    strictly larger, so DRO must move weight hard-ward from uniform."""
    easy = "the cat sat " * 8  # high-count bigrams → ~0 surrogate bits
    rows = [(i, easy.strip(), "en", "easy") for i in range(8)]
    # hard docs sit OUTSIDE the %10<8 train slice, so their tokens are
    # unknown to the frozen reference LM — every bigram takes the OOV
    # path (1 + bl(T) bits); inside the slice they would be seen
    # singletons, which cost bl(1)−bl(1) = 0 in the surrogate
    rows += [
        (18, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8", "en", "hard"),
        (28, "yk1 yk2 yk3 yk4 yk5 yk6 yk7 yk8", "en", "hard"),
        (38, "xj1 xj2 xj3 xj4 xj5 xj6 xj7 xj8", "en", "hard"),
    ]
    return _write_docs(tmp_path, rows)


def test_sm14_crafted_hard_domain_upweighted(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.semistructured import sm14_doremi_mixture

    got = {r.source: r for r in sm14_doremi_mixture(spark, _sm14_crafted(tmp_path)).collect()}
    assert set(got) == {"easy", "hard"}
    assert got["hard"].micro_loss > got["easy"].micro_loss
    assert got["hard"].weight_ppm > got["hard"].w0_ppm
    assert got["easy"].weight_ppm < got["easy"].w0_ppm
    assert got["easy"].weight_ppm + got["hard"].weight_ppm == _PPM


def test_sm14_deterministic_under_repartition(spark, sf_dir):
    """Byte-stable under any physical layout (the sm12/sm13 contract):
    every quantity is an integer function of the data, and largest-
    remainder rank ties break on the domain name."""
    from etl_pipeline_telecom_spark.plans.semistructured import _sm14_weights
    from etl_pipeline_telecom_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, _sm14_weights(docs.repartition(3)).collect()))
    b = sorted(map(tuple, _sm14_weights(docs.repartition(17)).collect()))
    assert a == b and a


def test_sm14_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _sm14_crafted(tmp_path), "sm14_doremi_mixture")


def test_sm14_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "sm14_doremi_mixture")


# ---------------------------------------------------------------------------
# p13: incremental snapshot diff (change data feed)
# ---------------------------------------------------------------------------


def _p13_manifests(spark, sf_dir):
    from etl_pipeline_telecom_spark.plans.pipeline import _P11_BUCKETS
    from etl_pipeline_telecom_spark.sources.writers import (
        _load_manifest,
        stage_cdf_commit,
    )

    mdir = stage_cdf_commit(spark, sf_dir, _P11_BUCKETS)
    return _load_manifest(mdir, 1), _load_manifest(mdir, 2)


def test_p13_reads_only_the_manifest_delta(spark, sf_dir):
    """THE p13 plan pin (VERDICT r14 item 7, the p5 pattern): the diff's
    scans read EXACTLY the files dropped by v2 (old image) plus the files
    added by v2 (new image) — a file common to both versions is NEVER in
    any scan's file list."""
    from etl_pipeline_telecom_spark.plans.pipeline import p13_snapshot_diff

    v1, v2 = _p13_manifests(spark, sf_dir)
    p1, p2 = {e["path"] for e in v1}, {e["path"] for e in v2}
    removed, added, common = p1 - p2, p2 - p1, p1 & p2
    assert removed and added and common  # a real incremental commit
    scanned = {
        p.split("://", 1)[-1] for p in p13_snapshot_diff(spark, sf_dir).inputFiles()
    }
    assert scanned == removed | added
    assert not scanned & common


def test_p13_commit_rewrites_only_affected_buckets(spark, sf_dir):
    """Manifest-delta minimality: v2 drops exactly the base files of
    buckets containing a delete or update, keeps every other v1 file
    verbatim (same recorded stats), and only adds commit-root files."""
    v1, v2 = _p13_manifests(spark, sf_dir)
    p2 = {e["path"] for e in v2}
    dropped_buckets = {e["bucket"] for e in v1 if e["path"] not in p2}
    kept = [e for e in v1 if e["path"] in p2]
    v2_by_path = {e["path"]: e for e in v2}
    for e in kept:
        assert e["bucket"] not in dropped_buckets
        assert v2_by_path[e["path"]] == e  # byte-identical entry carry-over
    for e in v2:
        if e["path"] not in {x["path"] for x in v1}:
            assert "/rewrite" in e["root"] or "/append" in e["root"]


def _bucket_py(event_id: int, n_buckets: int) -> int:
    return int(hashlib.md5(str(event_id).encode()).hexdigest()[:8], 16) % n_buckets


def test_p13_classification_matches_python_replay(spark, sf_dir):
    """Engine-independent replay (the d19 both-engines-share-a-bug guard):
    recompute the change feed in plain python from the events parquet and
    the DML laws, and compare the full grouped output."""
    import collections

    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        p13_snapshot_diff,
    )
    from etl_pipeline_telecom_spark.sources.writers import _CDF_INSERT_OFFSET

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    ids = t["event_id"].to_pylist()
    users = t["user_id"].to_pylist()
    agg = collections.defaultdict(lambda: [0, set(), 0])
    for i, u in zip(ids, users):
        if i % 97 == 0:
            key = ("delete", _bucket_py(i, _P11_BUCKETS))
        elif i % 103 == 0:
            key = ("update", _bucket_py(i, _P11_BUCKETS))
        else:
            key = None
        if key:
            a = agg[key]
            a[0] += 1
            a[1].add(u)
            a[2] += i
        if i % 101 == 0:
            ni = i + _CDF_INSERT_OFFSET
            a = agg[("insert", _bucket_py(ni, _P11_BUCKETS))]
            a[0] += 1
            a[1].add(u)
            a[2] += ni
    expected = {
        k: (v[0], len(v[1]), v[2]) for k, v in agg.items()
    }
    got = {
        (r.change_type, r.bucket): (r.n_rows, r.n_users, r.id_sum)
        for r in p13_snapshot_diff(spark, sf_dir).collect()
    }
    assert got == expected


def test_p13_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "p13_snapshot_diff")


# ---------------------------------------------------------------------------
# p14: incremental materialized-view maintenance over the p13 change feed
# ---------------------------------------------------------------------------


def test_p14_reads_only_mv_and_manifest_delta(spark, sf_dir):
    """THE p14 plan pin (the p5/p13 file-list law, extended to the MV):
    the maintained view's scans read EXACTLY the materialized v1
    aggregate plus the commit's manifest delta (dropped ∪ added files) —
    no file common to both snapshot versions, i.e. no unchanged data
    file, is ever scanned. That file-list is the whole 100 TB argument:
    refresh cost is O(changed files + |MV|), not O(table)."""
    import glob as _glob

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        p14_incremental_mv,
    )
    from etl_pipeline_telecom_spark.sources.writers import (
        stage_cdf_commit,
        stage_mv_base,
    )

    v1, v2 = _p13_manifests(spark, sf_dir)
    p1, p2 = {e["path"] for e in v1}, {e["path"] for e in v2}
    removed, added, common = p1 - p2, p2 - p1, p1 & p2
    assert removed and added and common  # a real incremental commit
    mdir = stage_cdf_commit(spark, sf_dir, _P11_BUCKETS)
    mv_files = set(
        _glob.glob(f"{stage_mv_base(spark, mdir, 1)}/*.parquet")
    )
    assert mv_files  # the materialized base exists and is parquet
    scanned = {
        p.split("://", 1)[-1] for p in p14_incremental_mv(spark, sf_dir).inputFiles()
    }
    assert scanned == mv_files | removed | added
    assert not scanned & common


def test_p14_matches_python_replay_and_recompute(spark, sf_dir):
    """Engine-independent replay (the d19 guard) + the IVM contract:
    (a) plain python applies the commit law (%97 delete, %103 value+1,
    %101 re-keyed clone insert) to the events parquet and aggregates the
    v2 state per event_type; (b) Spark recomputes the same state FROM the
    v2 snapshot read (full rescan). The maintained view must equal both
    — base + delta ≡ recompute, to the last bit of the integer value
    surrogate."""
    import collections
    import math

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P11_BUCKETS,
        p14_incremental_mv,
    )
    from etl_pipeline_telecom_spark.sources.writers import (
        mv_milli,
        read_snapshot,
        stage_cdf_commit,
    )

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])
    agg = collections.defaultdict(lambda: [0, 0])

    def vi(v: float | None) -> int:
        return int(math.floor((v or 0.0) * 1000))

    for i, et, v in zip(
        t["event_id"].to_pylist(), t["event_type"].to_pylist(), t["value"].to_pylist()
    ):
        if i % 97 != 0:  # survivor (update applies value+1 BEFORE the surrogate)
            a = agg[et]
            a[0] += 1
            a[1] += vi((v or 0.0) + 1.0 if i % 103 == 0 else v)
        if i % 101 == 0:  # insert clone keeps the ORIGINAL value
            a = agg[et]
            a[0] += 1
            a[1] += vi(v)
    expected = {k: (v[0], v[1]) for k, v in agg.items() if v[0] > 0}

    got = {
        r.event_type: (r.n_rows, r.v_milli_sum)
        for r in p14_incremental_mv(spark, sf_dir).collect()
    }
    assert got == expected

    mdir = stage_cdf_commit(spark, sf_dir, _P11_BUCKETS)
    recomputed = {
        r.event_type: (r.n_rows, r.v_milli_sum)
        for r in read_snapshot(spark, mdir, 2)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(mv_milli(F.col("value"))).cast("bigint").alias("v_milli_sum"),
        )
        .collect()
    }
    assert got == recomputed


def test_p14_single_aggregate_no_join(spark, sf_dir):
    """The no-join law: self-maintainable aggregates need NO diff join —
    the plan is unions into hash aggregates on event_type (partial +
    final), with zero join nodes of any kind."""
    import contextlib
    import io

    from etl_pipeline_telecom_spark.plans.pipeline import p14_incremental_mv

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        p14_incremental_mv(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    for node in ("Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert node not in plan, f"unexpected {node} in p14 plan"
    assert "HashAggregate" in plan


def test_p14_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "p14_incremental_mv")


# ---------------------------------------------------------------------------
# t33: CCNet-style per-language perplexity bucketing
# ---------------------------------------------------------------------------


def _t33_crafted(tmp_path) -> str:
    """Two languages with private vocabularies. Lang ``aa``: a fluent
    train slice over the x/y vocabulary plus scored docs spanning fully-
    seen → mixed → all-OOV. Lang ``bb``: its own m/n vocabulary, plus a
    doc whose text is byte-identical to aa's fully-seen doc 8 — if
    languages contaminated each other it would score fluent; against its
    OWN LM it is all-OOV."""
    rows = [
        # lang aa train (%10 < 8)
        (1, "x y x y x y x y", "aa", "web"),
        (2, "x y x y", "aa", "web"),
        # lang aa scored spread
        (8, "x y", "aa", "web"),          # fully seen
        (18, "x y q q", "aa", "web"),     # mixed seen/OOV
        (9, "q z", "aa", "web"),          # all OOV
        # lang bb train + the contamination probe
        (21, "m n m n m n", "bb", "web"),
        (28, "x y", "bb", "web"),         # same text as doc 8, other lang
    ]
    return _write_docs(tmp_path, rows)


def _t33_collect(spark, d: str) -> dict[int, tuple]:
    fn = catalog.REGISTRY["t33_perplexity_buckets"].fn
    return {
        r.doc_id: (r.lang, r.micro_bits_per_bigram, r.bucket)
        for r in fn(spark, d).collect()
    }


def test_t33_language_isolation_and_ordering(spark, tmp_path):
    got = _t33_collect(spark, _t33_crafted(tmp_path))
    # same text, different language ⇒ different score: doc 8 is fully
    # seen in aa's LM, doc 28 is all-OOV against bb's LM
    assert got[8][1] < got[28][1]
    # within aa, surprisal orders fully-seen < mixed < all-OOV
    assert got[8][1] < got[18][1] < got[9][1]
    # the all-OOV doc sits in aa's tail tercile; a train-fluent doc in head
    assert got[9][2] == "tail"
    assert got[8][2] == "head"


def test_t33_buckets_match_python_value_domain_replay(spark, sf_dir):
    """The bucket law replayed engine-independently (t29's value-domain
    tercile, per language): c_head = smallest micro whose cumulative
    count reaches n/3 (3·cum ≥ n), c_tail likewise for 2n/3; every doc
    with micro ≤ c_head is head, ≤ c_tail middle, else tail — ties share
    a value and land in the lower bucket."""
    import collections

    got = _t33_collect(spark, sf_dir)
    by_lang = collections.defaultdict(list)
    for doc_id, (lang, micro, bucket) in got.items():
        by_lang[lang].append((micro, doc_id, bucket))
    assert by_lang  # scored docs exist at every sf
    for lang, rows in by_lang.items():
        rows.sort()
        n = len(rows)
        micros = [r[0] for r in rows]
        c_head = micros[(n + 2) // 3 - 1]  # smallest micro with 3*cum >= n
        c_tail = micros[(2 * n + 2) // 3 - 1]
        for micro, doc_id, bucket in rows:
            expect = (
                "head" if micro <= c_head
                else "middle" if micro <= c_tail
                else "tail"
            )
            assert bucket == expect, f"lang {lang} doc {doc_id}"


def test_t33_oracle_roundtrip_crafted(spark, tmp_path):
    _roundtrip(spark, _t33_crafted(tmp_path), "t33_perplexity_buckets")


def test_t33_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t33_perplexity_buckets")

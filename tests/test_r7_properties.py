"""Property-based tests (hypothesis) for the mid-round-7 operators whose
semantics have a crisp independent reference implementation:

- g2 greedy throttle ≡ the sequential python recurrence on ARBITRARY
  per-user event sets (the crafted pin covers named edges; this covers
  the space — tie timestamps, bursts, exact-gap boundaries).
- j9 bucketed interval join ≡ the naive O(N·M) containment scan — the
  bucket decomposition must be invisible for any interval/point layout,
  including intervals straddling bucket edges.
- e11 sweep-line max concurrency ≡ brute-force overlap counting at
  event boundaries (max concurrency is always attained at a start).
- a23 histogram quantile bin always CONTAINS the rank statistic (the
  ≤1-bin error guarantee, on arbitrary price multisets).

Each example builds a tiny parquet fixture and runs the real catalog
plan — one Spark job per example, so max_examples stays small.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from .test_r6_ops import _write_events

pytestmark = pytest.mark.usefixtures("spark")

T0 = dt.datetime(2024, 1, 5, 12, 0, 0)
GAP_US = 86_400 * 1_000_000


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * 86_400),  # offset seconds
            st.integers(min_value=1, max_value=3),           # user
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_g2_throttle_equals_sequential_reference(spark, tmp_path_factory, events):
    from etl_pipeline_telecom_spark.plans.semistructured import g2_throttle_debounce

    d = tmp_path_factory.mktemp("g2prop")
    rows = [
        (i, T0 + dt.timedelta(seconds=off), uid, "click", 0.0)
        for i, (off, uid) in enumerate(events)
    ]
    _write_events(d, rows)

    # sequential reference: per user in (ts, event_id) order
    expected = set()
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (off, uid) in enumerate(events):
        by_user.setdefault(uid, []).append((off * 1_000_000, i))
    for uid, evs in by_user.items():
        last = None
        for t_us, eid in sorted(evs):
            if last is None or t_us >= last + GAP_US:
                expected.add(eid)
                last = t_us
    got = {r["event_id"] for r in g2_throttle_debounce(spark, str(d)).collect()}
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6000),  # offset seconds
            st.integers(min_value=1, max_value=2),     # user
        ),
        min_size=2,
        max_size=20,
        unique=True,
    )
)
def test_j9_bucketed_join_equals_naive_containment(spark, tmp_path_factory, events):
    from etl_pipeline_telecom_spark.plans.joins import j9_interval_bucket_join

    d = tmp_path_factory.mktemp("j9prop")
    rows = [
        (i, T0 + dt.timedelta(seconds=off), uid, "click", 0.0)
        for i, (off, uid) in enumerate(events)
    ]
    _write_events(d, rows)

    base_us = int(T0.timestamp() * 1_000_000)
    iv, pt = [], []
    for i, (off, uid) in enumerate(events):
        t = base_us + off * 1_000_000
        if i % 4 == 0:
            iv.append((uid, i, t, t + ((i % 1800) + 60) * 1_000_000))
        else:
            pt.append((uid, i, t))
    expected: dict[int, list[tuple[int, int]]] = {}
    for uid, pid, t in pt:
        for vuid, vid, s, e in iv:
            if vuid == uid and s <= t < e:
                expected.setdefault(uid, []).append((pid, vid))
    got = {r["user_id"]: r for r in j9_interval_bucket_join(spark, str(d)).collect()}
    assert set(got) == set(expected)
    for uid, pairs in expected.items():
        assert got[uid]["n_containments"] == len(pairs)
        assert got[uid]["n_points_covered"] == len({p for p, _ in pairs})
        assert got[uid]["n_intervals_hit"] == len({v for _, v in pairs})


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=7200),  # offset seconds
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_e11_sweep_equals_bruteforce_overlap(spark, tmp_path_factory, offs):
    from etl_pipeline_telecom_spark.plans.eventtime import e11_max_concurrency

    d = tmp_path_factory.mktemp("e11prop")
    rows = [(i, T0 + dt.timedelta(seconds=off), 1, "a", 0.0) for i, off in enumerate(offs)]
    _write_events(d, rows)

    ivs = [
        (off * 1_000_000, off * 1_000_000 + ((i % 3600) + 60) * 1_000_000)
        for i, off in enumerate(offs)
    ]
    # max concurrency is attained at some interval start (half-open)
    expected = max(sum(1 for s2, e2 in ivs if s2 <= s < e2) for s, _ in ivs)
    [row] = e11_max_concurrency(spark, str(d)).collect()
    assert row["max_concurrent"] == expected
    assert row["n_intervals"] == len(ivs)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=500_000),  # price cents
        min_size=1,
        max_size=40,
    )
)
def test_a23_bin_contains_rank_statistic(spark, tmp_path_factory, cents):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.sketches import (
        _A23_PS,
        a23_histogram_quantiles,
    )

    d = tmp_path_factory.mktemp("a23prop")
    pq.write_table(
        pa.table({"l_extendedprice": pa.array([c / 100.0 for c in cents], pa.float64())}),
        os.path.join(str(d), "lineitem.parquet"),
    )
    srt = sorted(cents)
    n = len(srt)
    got = {r["p_ppt"]: r for r in a23_histogram_quantiles(spark, str(d)).collect()}
    for p in _A23_PS:
        rank_val = srt[-(-p * n // 1000) - 1]  # value at rank ceil(p*n/1000), 1-based
        r = got[p]
        assert r["bin_lo_cents"] <= rank_val < r["bin_hi_cents"], (p, rank_val, dict(r.asDict()))


def _reference_bpe_encode(merges, word: str) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(syms[i]); i += 1
        syms = out
    return syms


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_t15_t17_bpe_train_and_encode_match_reference_on_random_vocab(
    spark, tmp_path_factory, words
):
    """The FULL BPE pair on arbitrary tiny vocabularies over a 2-letter
    alphabet (maximal merge collisions and overlap runs): t15's learned
    merge table must equal the pure-python Sennrich reference exactly
    (count, pair, rank AND selection frequency), and t17's per-doc token
    counts must equal greedily applying those merges. Two docs split the
    corpus so training (union) and encoding (per-doc) disagree unless
    both are right."""
    import re

    from etl_pipeline_telecom_spark.plans.text import (
        _BPE_MERGES,
        _BPE_PATTERN,
        t15_bpe_merges,
        t17_bpe_encode,
    )

    from .test_r7_guards import _python_bpe
    from .test_r7_ops import _write_docs_file

    d = tmp_path_factory.mktemp("bpeprop")
    half = max(1, len(words) // 2)
    texts = [" ".join(words[:half]), " ".join(words[half:]) or words[0]]
    _write_docs_file(str(d), list(enumerate(texts)))

    freqs: dict[str, int] = {}
    per_doc: list[list[str]] = []
    for t in texts:
        toks = re.findall(_BPE_PATTERN, t.lower())
        per_doc.append(toks)
        for tok in toks:
            freqs[tok] = freqs.get(tok, 0) + 1

    expected_merges = _python_bpe(freqs, _BPE_MERGES)
    got_merges = sorted(
        (r["merge_rank"], r["merge_left"], r["merge_right"], r["pair_freq"])
        for r in t15_bpe_merges(spark, str(d)).collect()
    )
    assert got_merges == sorted(expected_merges)

    merges = [(a, b) for _, a, b, _ in expected_merges]
    expected_counts = {
        i: sum(len(_reference_bpe_encode(merges, w)) for w in toks)
        for i, toks in enumerate(per_doc)
        if toks
    }
    got_counts = {
        r["doc_id"]: r["n_bpe_tokens"] for r in t17_bpe_encode(spark, str(d)).collect()
    }
    assert got_counts == expected_counts

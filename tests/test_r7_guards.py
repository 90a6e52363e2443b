"""Round-7 guard pins (ADVICE r6): defined behavior on inputs the random
fixtures never produce.

- dq4/st9: an event type with ZERO current-window rows used to make the
  chi-square contribution 0/0 — NaN that Spark's floor+cast silently
  nulls while DuckDB errors on CAST(NaN AS BIGINT). The type is now
  excluded (nothing to compare against) in plan and oracle alike.
- dq4: the ref/cur split is a full timestamp boundary, not dayofmonth,
  so multi-month data can't fold months together.
- a21: an empty events table (weight count 0) yields the documented
  boot_mean = boot_se = 0.0 instead of a null row.
- t13: the (doc_id, line_idx) bigint packing raises at runtime on
  out-of-bound doc ids instead of silently corrupting the canonical
  pick; the max in-bound doc id still decodes exactly.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare
from .test_r6_ops import _write_docs, _write_events

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()


def test_dq4_type_with_no_current_rows_is_excluded_not_nan(spark, tmp_path):
    """Type 'probe' exists only BEFORE the split (cur_tot=0): every one of
    its chi-square contributions would be 0/0. It must vanish from the
    output — in both engines — while the healthy type is still graded."""
    from etl_pipeline_telecom_spark.plans.quality import dq4_distribution_drift

    ref_t = dt.datetime(2024, 1, 5, 12, 0, 0)
    cur_t = dt.datetime(2024, 1, 20, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [(i, ref_t + i * s, 1, "probe", 10.0) for i in range(8)]
    rows += [(100 + i, ref_t + i * s, 1, "click", 60.0) for i in range(6)]
    rows += [(200 + i, cur_t + i * s, 1, "click", 60.0) for i in range(6)]
    _write_events(tmp_path, rows)

    out = dq4_distribution_drift(spark, str(tmp_path)).collect()
    types = {r["event_type"] for r in out}
    assert types == {"click"}  # probe excluded, not NaN/null rows
    assert all(r["contrib"] is not None and r["chi2_type"] is not None for r in out)

    spec = catalog.REGISTRY["dq4_distribution_drift"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg


def test_dq4_split_is_a_timestamp_boundary_not_dayofmonth(spark, tmp_path):
    """A February-10th row is AFTER the 2024-01-16 boundary and must land
    in 'cur' — the old dayofmonth<16 rule would have called it 'ref'."""
    from etl_pipeline_telecom_spark.plans.quality import dq4_bucket_counts
    from etl_pipeline_telecom_spark.sources import load_table

    s = dt.timedelta(seconds=1)
    jan5 = dt.datetime(2024, 1, 5, 0, 0, 0)
    feb10 = dt.datetime(2024, 2, 10, 0, 0, 0)  # day-of-month 10 < 16
    rows = [(i, jan5 + i * s, 1, "click", 10.0) for i in range(3)]
    rows += [(10 + i, feb10 + i * s, 1, "click", 10.0) for i in range(5)]
    _write_events(tmp_path, rows)

    counts = dq4_bucket_counts(load_table(spark, str(tmp_path), "events")).collect()
    assert len(counts) == 1
    assert counts[0]["ref_n"] == 3 and counts[0]["cur_n"] == 5


def test_a21_empty_events_yields_zero_not_null(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.sketches import a21_poisson_bootstrap

    _write_events(tmp_path, [])
    row = a21_poisson_bootstrap(spark, str(tmp_path)).collect()[0]
    assert row["n_replicates"] == 16
    assert row["boot_mean"] == 0.0 and row["boot_se"] == 0.0

    spec = catalog.REGISTRY["a21_poisson_bootstrap"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg


def test_t13_packing_guard_rejects_oversized_doc_id(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t13_line_dedup

    _write_docs(spark, str(tmp_path), [(1 << 43, "a b c")])
    with pytest.raises(Exception, match="packing"):
        t13_line_dedup(spark, str(tmp_path)).collect()


def test_t13_max_inbound_doc_id_decodes_exactly(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t13_line_dedup

    big = (1 << 43) - 1
    _write_docs(spark, str(tmp_path), [(big, "a b c")])
    rows = t13_line_dedup(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == big and rows[0]["n_kept"] == 1


def test_t13_negative_doc_id_rejected(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t13_line_dedup

    _write_docs(spark, str(tmp_path), [(-1, "a b c")])
    with pytest.raises(Exception, match="packing"):
        t13_line_dedup(spark, str(tmp_path)).collect()


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE replay (Sennrich counting + greedy left-to-right
    merge, ties by lexicographic pair) — the ground truth for t15."""
    seqs = {w: list(w) for w in word_freqs}
    out = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        (a, b), f = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, f))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


def _run_t15(spark, tmp_path, texts: list[str]):
    from etl_pipeline_telecom_spark.plans.text import t15_bpe_merges

    _write_docs(spark, str(tmp_path), list(enumerate(texts)))
    rows = t15_bpe_merges(spark, tmp_path.as_posix()).collect()
    return sorted(
        (r["merge_rank"], r["merge_left"], r["merge_right"], r["pair_freq"]) for r in rows
    )


def test_t15_reproduces_reference_bpe_on_classic_vocab(spark, tmp_path):
    """Sennrich's canonical example vocabulary: {low:5, lower:2, newest:6,
    widest:3} — the learned merges must match a pure-python reference BPE
    exactly, including the e,s → es ; es,t → est opening."""
    import re

    from etl_pipeline_telecom_spark.plans.text import _BPE_MERGES, _BPE_PATTERN

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    text = " ".join(words)
    # replay the engine's own pretokenizer to get its word_freqs
    freqs: dict[str, int] = {}
    for tok in re.findall(_BPE_PATTERN, text.lower()):
        freqs[tok] = freqs.get(tok, 0) + 1
    expected = sorted(_python_bpe(freqs, _BPE_MERGES))
    got = _run_t15(spark, tmp_path, [text])
    assert got == expected
    # the famous first merges of this vocabulary (space-prefixed words
    # shift them; the un-prefixed first word still yields es/est chains)
    learned_pairs = [(a, b) for _, a, b, _ in got]
    assert ("e", "s") in learned_pairs and ("es", "t") in learned_pairs


def test_t15_overlap_run_merges_greedy_left_to_right(spark, tmp_path):
    """'aaaa aaaa aaa' — the (a,a) merge must consume runs greedily
    left-to-right: 'aaaa'→[aa,aa], 'aaa'→[aa,a], matching reference BPE."""
    import re

    from etl_pipeline_telecom_spark.plans.text import _BPE_MERGES, _BPE_PATTERN

    text = "aaaa aaaa aaa"
    freqs: dict[str, int] = {}
    for tok in re.findall(_BPE_PATTERN, text.lower()):
        freqs[tok] = freqs.get(tok, 0) + 1
    expected = sorted(_python_bpe(freqs, _BPE_MERGES))
    got = _run_t15(spark, tmp_path, [text])
    assert got == expected
    # naive adjacent counting: 'aaaa'→3, ' aaaa'→3, ' aaa'→2 (a,a) pairs
    assert got[0][1:] == ("a", "a", 8)

"""Crafted-edge pins for the round-6 additions (t13, d16, sm5, a20).

The full-sweep oracle proves engine parity on the random fixtures; these
tests pin the SEMANTICS on hand-built inputs whose edges random data
cannot reliably reach: within-doc duplicate lines and fully-boilerplate
docs (t13), exact containment / disjoint / exact-0.8-threshold overlap
(d16), the binding-language and flattening invariants of the temperature
mix (sm5), and sketch-mergeability exactness (a20).
"""

from __future__ import annotations

import hashlib
import os

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _write_docs(spark, d: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


LINE_A = " ".join(f"a{i}" for i in range(10))
LINE_B = " ".join(f"b{i}" for i in range(10))
LINE_C = " ".join(f"c{i}" for i in range(10))
LINE_D = " ".join(f"d{i}" for i in range(10))


def test_t13_keeps_first_occurrence_and_empties_boilerplate_docs(spark, tmp_path):
    """Line A appears in docs 0/1/2 (twice in doc 2) → only doc 0's copy
    survives; doc 2 is 100% boilerplate → zero lines, md5('') fingerprint;
    a within-doc duplicate with no cross-doc copy keeps its first
    occurrence only."""
    from etl_pipeline_telecom_spark.plans.text import t13_line_dedup

    d = str(tmp_path)
    _write_docs(
        spark,
        d,
        [
            (0, f"{LINE_A} {LINE_B}"),
            (1, f"{LINE_A} {LINE_C}"),
            (2, f"{LINE_A} {LINE_A}"),
            (3, f"{LINE_D} {LINE_D}"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_md5"])
        for r in t13_line_dedup(spark, d).collect()
    }
    assert got[0] == (2, 2, _md5(f"{LINE_A} {LINE_B}"))
    assert got[1] == (2, 1, _md5(LINE_C))
    assert got[2] == (2, 0, _md5(""))  # fully boilerplate → present, empty
    assert got[3] == (2, 1, _md5(LINE_D))  # within-doc dup, first kept


def test_t13_short_tail_line(spark, tmp_path):
    """A 13-token doc forms one full line + one 3-token tail line."""
    from etl_pipeline_telecom_spark.plans.text import t13_line_dedup

    d = str(tmp_path)
    tail = "t0 t1 t2"
    _write_docs(spark, d, [(0, f"{LINE_A} {tail}")])
    [r] = t13_line_dedup(spark, d).collect()
    assert (r["n_lines"], r["n_kept"]) == (2, 2)
    assert r["kept_md5"] == _md5(f"{LINE_A} {tail}")


def test_d16_containment_disjoint_and_exact_threshold(spark, tmp_path):
    """eval doc 0 ⊂ train doc 1 → overlap 1.0; eval doc 5 disjoint → 0.0;
    eval doc 10 shares exactly 4 of its 5 shingles → 0.8, and the >=
    threshold marks it contaminated."""
    from etl_pipeline_telecom_spark.plans.dedup import d16_ngram_overlap

    d = str(tmp_path)
    _write_docs(
        spark,
        d,
        [
            (0, "w1 w2 w3 w4"),  # eval: shingles (w1 w2 w3), (w2 w3 w4)
            (1, "w1 w2 w3 w4 w5 w6"),  # train: contains both + 2 more
            (5, "q1 q2 q3 q4"),  # eval: fully novel
            (10, "w1 w2 w3 w4 w5 w6 z7"),  # eval: 5 shingles, 4 in train
            (11, "filler tokens only here"),  # train noise
        ],
    )
    got = {
        r["eval_doc_id"]: (
            r["n_shingles"],
            r["n_shared"],
            r["overlap_frac"],
            r["contaminated"],
        )
        for r in d16_ngram_overlap(spark, d).collect()
    }
    assert got[0] == (2, 2, 1.0, True)
    assert got[5] == (2, 0, 0.0, False)
    assert got[10] == (5, 4, 0.8, True)  # inclusive threshold edge


def test_sm5_flattens_mix_and_never_upsamples(spark, tmp_path):
    """64 'big' vs 4 'small' docs with alpha=0.5: exact sqrt weights give
    the small language the binding rate (~100% kept) and the big language
    a 25% rate; kept counts must equal a driver-side replay of the same
    md5 thresholds, and no language exceeds its input count."""
    from etl_pipeline_telecom_spark.plans.semistructured import sm5_temperature_mix

    d = str(tmp_path)
    rows = [(i, f"doc {i} text", "big", "src", 10) for i in range(64)]
    rows += [(100 + i, f"doc {100 + i} text", "small", "src", 10) for i in range(4)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {
        r["lang"]: (r["n_docs"], r["keep_ppm"], r["n_kept"])
        for r in sm5_temperature_mix(spark, d).collect()
    }
    # sqrt(64)=8e6 ppm, sqrt(4)=2e6 ppm → shares 0.8/0.2 → C=min(80,20)=20
    # → rate_small=1.0 (binding), rate_big=0.25; FLOOR may shave 1 ppm
    assert got["small"][1] in (999_999, 1_000_000)
    assert got["big"][1] in (249_999, 250_000)
    for lang, (n_docs, keep_ppm, n_kept) in got.items():
        assert n_kept <= n_docs  # never upsamples
        ids = range(64) if lang == "big" else range(100, 104)
        expect = sum(
            1
            for i in ids
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
            < keep_ppm
        )
        assert n_kept == expect


def test_sm5_single_language_keeps_everything(spark, tmp_path):
    """Degenerate mix: one language → it binds, rate 1.0, all docs kept."""
    from etl_pipeline_telecom_spark.plans.semistructured import sm5_temperature_mix

    d = str(tmp_path)
    _write_docs(spark, d, [(i, f"only lang doc {i}") for i in range(10)])
    [r] = sm5_temperature_mix(spark, d).collect()
    assert r["keep_ppm"] in (999_999, 1_000_000)
    assert r["n_kept"] == r["n_docs"] == 10


def test_a20_union_of_monthly_sketches_equals_direct_year_sketch(spark):
    """Mergeability exactness: unioning the per-month sketches must give
    the SAME estimate as sketching the whole year directly — the property
    that lets per-partition sketches roll up without rescanning. Also pins
    determinism across two independent evaluations."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.sources import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    yr = F.year("o_orderdate").cast("bigint").alias("yr")
    merged = (
        o.groupBy(yr, F.month("o_orderdate").alias("mo"))
        .agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
        .groupBy("yr")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = o.groupBy(yr).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(12))).alias("est")
    )
    m = {r["yr"]: r["est"] for r in merged.collect()}
    d1 = {r["yr"]: r["est"] for r in direct.collect()}
    d2 = {r["yr"]: r["est"] for r in direct.collect()}
    assert m == d1 == d2


# ---------------------------------------------------------------------------
# Mid-round additions: t14 (content-defined chunking), t16 (unigram
# rarity), v9 (ANN recall eval)
# ---------------------------------------------------------------------------


def _cdc_chunks_py(tokens: list[str], w: int = 4, m: int = 8) -> list[str]:
    """Driver-side replay of t14's boundary rule → list of chunk strings."""
    flags = []
    for i in range(len(tokens)):
        if i >= w - 1:
            window = " ".join(tokens[i - w + 1 : i + 1])
            h = int(hashlib.md5(window.encode()).hexdigest()[:8], 16)
            flags.append(1 if h % m == 0 else 0)
        else:
            flags.append(0)
    chunks, cur = [], []
    for tok, flag in zip(tokens, flags):
        cur.append(tok)
        if flag:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_t14_boundaries_resync_after_insertion(spark, tmp_path):
    """The CDC property itself: prepending a token to a document shifts
    only the chunks up to the first boundary — every later chunk
    fingerprint re-syncs (fixed-span chunking would shift them all).
    Chunks must equal a driver-side replay of the same boundary rule."""
    from etl_pipeline_telecom_spark.plans.text import t14_cdc_chunks

    base = [f"w{i}" for i in range(60)]
    shifted = ["zzz"] + base
    d = str(tmp_path)
    _write_docs(spark, d, [(0, " ".join(base)), (1, " ".join(shifted))])
    rows = t14_cdc_chunks(spark, d).collect()
    got = {0: {}, 1: {}}
    for r in rows:
        got[r["doc_id"]][r["chunk_idx"]] = (r["n_tokens"], r["chunk_md5"])

    for doc_id, toks in ((0, base), (1, shifted)):
        expect = _cdc_chunks_py(toks)
        assert len(got[doc_id]) == len(expect)
        for idx, chunk in enumerate(expect):
            n, h = got[doc_id][idx]
            assert n == len(chunk.split())
            assert h == _md5(chunk)

    shared = {h for _, h in got[0].values()} & {h for _, h in got[1].values()}
    # re-sync: the tail chunks agree despite the head insertion
    assert len(shared) >= 1
    # and n_copies marked them as corpus-duplicated chunks
    copies = {r["chunk_md5"]: r["n_copies"] for r in rows}
    for h in shared:
        assert copies[h] == 2


def test_t14_doc_shorter_than_window_is_one_chunk(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t14_cdc_chunks

    d = str(tmp_path)
    _write_docs(spark, d, [(0, "a b c")])
    [r] = t14_cdc_chunks(spark, d).collect()
    assert (r["chunk_idx"], r["n_tokens"], r["chunk_md5"]) == (0, 3, _md5("a b c"))


def test_t16_rarity_extremes(spark, tmp_path):
    """Eval doc of fully-unseen tokens scores the smoothing ceiling
    (N·1e6 div 1 per token); an eval doc made of the commonest train
    token scores its exact inverse frequency. Expected values replayed
    driver-side from the same integer arithmetic."""
    from etl_pipeline_telecom_spark.plans.semistructured import _PPM  # noqa: F401
    from etl_pipeline_telecom_spark.plans.text import t16_unigram_rarity

    d = str(tmp_path)
    # train: docs 1-4 (doc_id % 5 != 0) → "common" x12, "mid" x4
    _write_docs(
        spark,
        d,
        [
            (1, "common common common mid"),
            (2, "common common common mid"),
            (3, "common common common mid"),
            (4, "common common common mid"),
            (0, "novel tokens only"),  # eval: all unseen
            (5, "common common"),  # eval: all the hot token
        ],
    )
    n_train = 16
    got = {
        r["eval_doc_id"]: (r["n_tokens"], r["n_unseen"], r["rarity"])
        for r in t16_unigram_rarity(spark, d).collect()
    }
    ceiling = round((n_train * 1_000_000) // 1 / 1_000_000, 6)
    assert got[0] == (3, 3, ceiling)
    common_term = (n_train * 1_000_000) // (12 + 1)
    assert got[5] == (2, 0, round(common_term / 1_000_000, 6))


def test_v9_recall_is_consistent_and_bounded(spark):
    """recall@3 = n_hits/3 exactly, hits never exceed the ANN list, and
    the ANN list never exceeds k — on the real sf0.001 fixture."""
    from etl_pipeline_telecom_spark.plans.similarity import v9_ann_recall_eval

    rows = v9_ann_recall_eval(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_ann"] <= 3
        assert r["recall_at_3"] == round(r["n_hits"] / 3, 6)


# ---------------------------------------------------------------------------
# Second mid-round batch: e10 (time-weighted average), dq4 (chi-square
# distribution drift), sm6 (exactly-k-per-group sampling)
# ---------------------------------------------------------------------------


def _write_events(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))


def test_e10_twa_weights_by_holding_time_not_sample_count(spark, tmp_path):
    """v=10 held 10s, v=20 held 20s → TWA 16.666667 — NOT the naive
    mean 23.333 that overweights the burst; the final sample bounds the
    last interval and contributes no weight of its own. Single-event
    days produce no row (no interval to integrate)."""
    import datetime as dt

    from etl_pipeline_telecom_spark.plans.eventtime import e10_time_weighted_avg

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    _write_events(
        tmp_path,
        [
            (1, t0, 7, "click", 10.0),
            (2, t0 + 10 * s, 7, "click", 20.0),
            (3, t0 + 30 * s, 7, "click", 40.0),
            # another user, single event that day → no output row
            (4, t0, 8, "view", 99.0),
        ],
    )
    rows = e10_time_weighted_avg(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["user_id"], r["n_samples"], r["span_us"]) == (7, 3, 30_000_000)
    assert r["twa"] == round((10.0 * 10 + 20.0 * 20) / 30, 6)
    assert r["twa"] != round((10.0 + 20.0 + 40.0) / 3, 6)


def test_e10_matches_oracle_on_crafted_bursts(spark, tmp_path):
    import datetime as dt

    from etl_pipeline_telecom_spark import catalog

    from .oracle_harness import compare

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = []
    eid = 0
    for u in range(5):
        for i in range(6):
            eid += 1
            rows.append((eid, t0 + (i * i + u) * s, u, "click", float(10 * u + i)))
    _write_events(tmp_path, rows)
    spec = catalog.REGISTRY["e10_time_weighted_avg"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg


def test_dq4_flags_only_the_drifted_type(spark, tmp_path):
    """Type 'same' has identical ref/cur histograms → every contribution
    0, not drifted. Type 'moved' shifts all mass from bucket 1 to
    bucket 0 → chi2 = 20 > 16.919 → drifted. Values replayed from the
    same integer arithmetic."""
    import datetime as dt

    from etl_pipeline_telecom_spark.plans.quality import dq4_distribution_drift

    ref_day = dt.datetime(2024, 1, 5, 0, 0, 0)
    cur_day = dt.datetime(2024, 1, 25, 0, 0, 0)
    s = dt.timedelta(seconds=1)
    rows, eid = [], 0

    def add(day, etype, value, n):
        nonlocal eid
        for _ in range(n):
            eid += 1
            rows.append((eid, day + eid * s, 1, etype, value))

    # 'same': ref 10+10, cur 10+10 across buckets 0 (v=25) and 1 (v=75)
    add(ref_day, "same", 25.0, 10); add(ref_day, "same", 75.0, 10)
    add(cur_day, "same", 25.0, 10); add(cur_day, "same", 75.0, 10)
    # 'moved': ref 10+10, cur 20+0 — all mass to bucket 0
    add(ref_day, "moved", 25.0, 10); add(ref_day, "moved", 75.0, 10)
    add(cur_day, "moved", 25.0, 20)
    _write_events(tmp_path, rows)

    got = {
        (r["event_type"], r["bucket"]): (r["ref_n"], r["cur_n"], r["contrib"], r["chi2_type"], r["drifted"])
        for r in dq4_distribution_drift(spark, str(tmp_path)).collect()
    }
    assert got[("same", 0)] == (10, 10, 0.0, 0.0, False)
    assert got[("same", 1)] == (10, 10, 0.0, 0.0, False)
    # (o*R - r*C)^2 / (r*C*R) with R=C=20: b0 (20*20-10*20)^2/4000 = 10
    assert got[("moved", 0)] == (10, 20, 10.0, 20.0, True)
    assert got[("moved", 1)] == (10, 0, 10.0, 20.0, True)


def test_sm6_exact_k_small_strata_and_growth_stability(spark, tmp_path):
    """Big language yields EXACTLY k rows, a 3-doc language contributes
    all 3; the selection equals a driver-side md5-order replay; and
    adding one document changes the selected set by at most one member
    (hash-ordered selection is stable under growth)."""
    from etl_pipeline_telecom_spark.plans.semistructured import _SM6_K, sm6_fixed_k_per_group

    def selected(ids):
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        return order[:_SM6_K]

    big = list(range(1000, 1100))
    small = [1, 2, 3]
    d = str(tmp_path)
    rows_in = [(i, f"doc {i} text", "big", "src", 10) for i in big] + [
        (i, f"small {i} text", "small", "src", 10) for i in small
    ]
    spark.createDataFrame(
        rows_in, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    rows = sm6_fixed_k_per_group(spark, d).collect()
    got_big = sorted((r["rk"], r["doc_id"]) for r in rows if r["doc_id"] >= 1000)
    got_small = sorted((r["rk"], r["doc_id"]) for r in rows if r["doc_id"] < 1000)
    assert len(got_big) == _SM6_K
    assert [i for _, i in sorted(got_big)] == selected(big)
    assert len(got_small) == 3

    grown = selected(big + [1100])
    assert len(set(selected(big)) - set(grown)) <= 1


def test_j8_same_microsecond_and_pre_version_facts(spark, tmp_path):
    """Temporal snapshot edges random data cannot reach: a fact at the
    SAME microsecond as a version change joins that new version
    (inclusive valid-from); a fact with no prior version gets nulls;
    two versions in the same microsecond — the higher event_id wins
    (its sibling's interval is empty)."""
    import datetime as dt

    from etl_pipeline_telecom_spark.plans.joins import j8_temporal_snapshot_join

    t0 = dt.datetime(2024, 1, 10, 9, 0, 0)
    s = dt.timedelta(seconds=1)
    _write_events(
        tmp_path,
        [
            (100, t0 - 5 * s, 1, "purchase", 1.0),   # before any version → nulls
            (5, t0, 1, "signup", 10.0),              # version A
            (101, t0, 1, "purchase", 2.0),           # same µs as A → joins A
            (6, t0 + 10 * s, 1, "signup", 20.0),     # version B
            (7, t0 + 10 * s, 1, "signup", 30.0),     # version C, same µs as B
            (102, t0 + 10 * s, 1, "purchase", 3.0),  # joins C (B's interval empty)
            (103, t0 + 20 * s, 1, "purchase", 4.0),  # later fact → still C
        ],
    )
    got = {
        r["event_id"]: (r["version_id"], r["version_attr"])
        for r in j8_temporal_snapshot_join(spark, str(tmp_path)).collect()
    }
    assert got[100] == (None, None)
    assert got[101] == (5, 10.0)
    assert got[102] == (7, 30.0)
    assert got[103] == (7, 30.0)


def test_j8_matches_oracle_on_crafted_edges(spark, tmp_path):
    """The same crafted edge fixture round-trips the full oracle compare
    — the window form and the interval-join form agree at the edges."""
    import datetime as dt

    from etl_pipeline_telecom_spark import catalog

    from .oracle_harness import compare

    t0 = dt.datetime(2024, 1, 10, 9, 0, 0)
    s = dt.timedelta(seconds=1)
    rows, eid = [], 0
    for u in range(4):
        for i in range(5):
            eid += 1
            etype = "signup" if i % 2 == 0 else "purchase"
            rows.append((eid, t0 + (i * 3 + u) * s, u, etype, float(i + u)))
        eid += 1
        rows.append((eid, t0, u, "purchase", 99.0))  # same-µs-as-version edge
    _write_events(tmp_path, rows)
    spec = catalog.REGISTRY["j8_temporal_snapshot_join"]
    ok, msg = compare(spark, str(tmp_path), spec.fn, spec.sql)
    assert ok, msg


def test_a21_constant_values_have_zero_bootstrap_se(spark, tmp_path):
    """Every replicate's weighted mean of a constant is the constant, so
    the bootstrap SE is EXACTLY 0 and the mean exactly the constant —
    pins the weight/mean/variance plumbing end-to-end."""
    import datetime as dt

    from etl_pipeline_telecom_spark.plans.sketches import a21_poisson_bootstrap

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    _write_events(tmp_path, [(i, t0 + i * s, 1, "click", 7.25) for i in range(200)])
    [r] = a21_poisson_bootstrap(spark, str(tmp_path)).collect()
    assert r["n_replicates"] == 16
    assert r["boot_mean"] == 7.25
    assert r["boot_se"] == 0.0


def test_a21_se_tracks_analytic_se_on_fixture(spark):
    """On the real sf0.01 events the (deterministic) bootstrap SE must
    land near the analytic se = sd/sqrt(n) — a fixed-draw sanity check,
    not a statistical flake (every hash draw is deterministic)."""
    import math

    from etl_pipeline_telecom_spark.plans.sketches import a21_poisson_bootstrap
    from etl_pipeline_telecom_spark.sources import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    [r] = a21_poisson_bootstrap(spark, sf).collect()
    stats = (
        load_table(spark, sf, "events")
        .agg(
            F.avg("value").alias("mu"),
            F.stddev("value").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    analytic = stats["sd"] / math.sqrt(stats["n"])
    assert abs(r["boot_mean"] - stats["mu"]) < 5 * analytic
    assert 0.3 * analytic < r["boot_se"] < 3.0 * analytic

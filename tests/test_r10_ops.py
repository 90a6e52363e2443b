"""Crafted-data pins for the round-10 operators.

Same discipline as test_r7/r8/r9_ops: hand-computed expectations on tiny
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
    """rows: (doc_id, text, lang, source) → a documents.parquet fixture
    dir the registered query fns can read as sf_dir."""
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


# ---------------------------------------------------------------------------
# t25: trained character-bigram language-ID
# ---------------------------------------------------------------------------


def test_t25_separable_corpus_perfect_accuracy(spark, tmp_path):
    """The claim that matters (the fixture corpus is language-degenerate):
    on a corpus whose languages use DISJOINT character sets, the trained
    classifier scores every held-out doc correctly."""
    from etl_pipeline_telecom_spark.plans.text import t25_langid_train

    rows = []
    for i in range(20):  # lang A: chars a/b only
        rows.append((i, "aaa aab abb baa", "aa", "s"))
    for i in range(20, 40):  # lang Z: chars y/z only
        rows.append((i, "zzz zzy zyy yzz", "zz", "s"))
    d = _write_docs(tmp_path, rows)
    got = t25_langid_train(spark, d).collect()
    evals = {r.doc_id for r in got}
    assert evals == {8, 9, 18, 19, 28, 29, 38, 39}  # doc_id % 10 >= 8
    for r in got:
        assert r.correct == 1, r
        assert r.lang_pred == ("aa" if r.doc_id < 20 else "zz")
        assert r.score_micro > 0


def test_t25_unseen_chars_fall_back_to_und(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t25_langid_train

    rows = [(i, "aaa aab", "aa", "s") for i in range(8)]  # train only
    rows.append((18, "qqq", "qq", "s"))  # eval; 'q' bigrams never trained
    d = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in t25_langid_train(spark, d).collect()}
    assert set(got) == {18}
    assert got[18].lang_pred == "und"
    assert got[18].score_micro == 0
    assert got[18].correct == 0


def test_t25_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t25_langid_train")


# ---------------------------------------------------------------------------
# sm9: epoch-annealed mixture schedule
# ---------------------------------------------------------------------------


def test_sm9_conservation_laws(spark, sf_dir):
    """THE sm9 invariants: per-epoch quotas sum EXACTLY to that epoch's
    budget, epoch budgets sum EXACTLY to the corpus token mass, and the
    weight distribution flattens monotonically across epochs."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.semistructured import sm9_epoch_mix_schedule
    from etl_pipeline_telecom_spark.sources import load_table

    rows = sm9_epoch_mix_schedule(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")))
    ).collect()[0][0]

    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {1, 2, 3, 4}
    grand = 0
    budgets = []
    for e, ers in sorted(by_epoch.items()):
        budget = ers[0].epoch_budget
        assert all(r.epoch_budget == budget for r in ers)
        assert sum(r.quota_tokens for r in ers) == budget, f"epoch {e}"
        grand += budget
        budgets.append(budget)
    assert grand == total
    assert max(budgets) - min(budgets) <= 1  # T div 4 (+1 for T mod 4)

    # flattening: the max NORMALIZED weight is non-increasing in epoch
    # (exact integer cross-multiplication, no float shares)
    def max_share(ers):
        s_tot = sum(r.weight_milli for r in ers)
        return max(r.weight_milli for r in ers), s_tot

    prev = None
    for e, ers in sorted(by_epoch.items()):
        mx, tot = max_share(ers)
        if prev is not None:
            pmx, ptot = prev
            assert mx * ptot <= pmx * tot, f"epoch {e} did not flatten"
        prev = (mx, tot)


def test_sm9_single_lang_gets_whole_budget(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.semistructured import sm9_epoch_mix_schedule

    rows = [(i, "one two three", "en", "s") for i in range(5)]
    d = _write_docs(tmp_path, rows)
    got = sm9_epoch_mix_schedule(spark, d).collect()
    assert len(got) == 4
    for r in got:
        assert r.quota_tokens == r.epoch_budget
    assert sum(r.epoch_budget for r in got) == 15


def test_sm9_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "sm9_epoch_mix_schedule")


# ---------------------------------------------------------------------------
# m9: image-text pair scoring
# ---------------------------------------------------------------------------


def _m9_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16) % 8


def _m9_vi(doc_id: int) -> list[int]:
    from etl_pipeline_telecom_spark.plans.multimodal import _M6_W, _m6_gray

    g = _m6_gray(doc_id, False)
    return [sum(g[r * _M6_W : (r + 1) * _M6_W]) for r in range(8)]


def _toks_in_bucket(b: int, n: int = 3) -> list[str]:
    out = []
    i = 0
    while len(out) < n:
        tok = f"w{i}"
        if _m9_bucket(tok) == b:
            out.append(tok)
        i += 1
    return out


def test_m9_matched_caption_outscores_mismatched(spark, tmp_path):
    """Crafted matched/mismatched pairs: for the SAME image (same
    doc_id → same decoded grid), a caption whose tokens hash into the
    image's heaviest grid-row bucket must outscore one hashing into the
    lightest."""
    from etl_pipeline_telecom_spark.plans.multimodal import m9_image_text_score

    vi = _m9_vi(7)
    hi = max(range(8), key=lambda r: vi[r])
    lo = min(range(8), key=lambda r: vi[r])
    assert vi[hi] > vi[lo]  # grid rows are not uniform
    hi_text = " ".join(_toks_in_bucket(hi))
    lo_text = " ".join(_toks_in_bucket(lo))

    d_hi = tmp_path / "hi"
    d_lo = tmp_path / "lo"
    d_hi.mkdir()
    d_lo.mkdir()
    s_hi = {
        r.doc_id: r.score_micro
        for r in m9_image_text_score(
            spark, _write_docs(d_hi, [(7, hi_text, "en", "s")])
        ).collect()
    }
    s_lo = {
        r.doc_id: r.score_micro
        for r in m9_image_text_score(
            spark, _write_docs(d_lo, [(7, lo_text, "en", "s")])
        ).collect()
    }
    assert s_hi[7] > s_lo[7]


def test_m9_score_invariant_under_caption_replication(spark, tmp_path):
    """L1 normalization law: doubling every caption token leaves
    score_micro EXACTLY unchanged ((2d*10^6) div (ni*2nt) ==
    (d*10^6) div (ni*nt) — integer identity, not approximation)."""
    from etl_pipeline_telecom_spark.plans.multimodal import m9_image_text_score

    text = "alpha beta gamma delta"
    d1 = tmp_path / "once"
    d2 = tmp_path / "twice"
    d1.mkdir()
    d2.mkdir()
    s1 = {
        r.doc_id: r.score_micro
        for r in m9_image_text_score(
            spark, _write_docs(d1, [(11, text, "en", "s")])
        ).collect()
    }
    s2 = {
        r.doc_id: r.score_micro
        for r in m9_image_text_score(
            spark, _write_docs(d2, [(11, text + " " + text, "en", "s")])
        ).collect()
    }
    assert s1[11] == s2[11]


def test_m9_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "m9_image_text_score")


# ---------------------------------------------------------------------------
# v14: IVF × PQ composed ANN
# ---------------------------------------------------------------------------


def test_v14_adc_scores_only_probed_cells(spark, sf_dir):
    """The at-scale point of the composition: the ADC stage scores
    exactly the IVF candidate pairs — nothing outside the probed cells
    ever gets a distance."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.similarity import (
        _ivf_candidates,
        _pq_codebook,
        _pq_codes,
        _pq_lut,
        _quantized,
        _v13_subspaces,
    )

    cand_pairs = {
        (r.query_id, r.vec_id)
        for r in _ivf_candidates(spark, sf_dir).select("query_id", "vec_id").collect()
    }
    emb = _quantized(spark, sf_dir)
    sub = _v13_subspaces(emb)
    cb = _pq_codebook(sub)
    codes = _pq_codes(sub, cb)
    lut = _pq_lut(sub, cb, guard_label="v14 test")
    cp = (
        _ivf_candidates(spark, sf_dir)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    adc = (
        cp.join(codes.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "m", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adist"))
    )
    adc_pairs = {(r.query_id, r.neighbor_id) for r in adc.collect()}
    assert adc_pairs == cand_pairs  # every candidate scored, none beyond


def test_v14_recall_reported_vs_v12(spark, sf_dir):
    """Both composed indexes grade against the same exact ground truth;
    report recall side-by-side and pin the structural invariants."""
    from etl_pipeline_telecom_spark.plans.similarity import (
        v12_ivf_sq8_recall,
        v14_ivf_pq_recall,
    )

    r14 = {r.query_id: r for r in v14_ivf_pq_recall(spark, sf_dir).collect()}
    r12 = {r.query_id: r for r in v12_ivf_sq8_recall(spark, sf_dir).collect()}
    assert set(r14) == set(r12)
    for q, r in r14.items():
        assert r.n_ann == 3
        assert 0 <= r.n_hits <= 3
        assert abs(r.recall_at_3 - r.n_hits / 3) < 1e-6  # ROUND(.., 6)
    mean14 = sum(r.recall_at_3 for r in r14.values()) / len(r14)
    mean12 = sum(r.recall_at_3 for r in r12.values()) / len(r12)
    print(f"v14 recall@3={mean14:.3f} vs v12 recall@3={mean12:.3f}")
    assert mean14 > 0  # the composed index finds real neighbors


def test_v14_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "v14_ivf_pq_recall")


# ---------------------------------------------------------------------------
# p10: compaction execution
# ---------------------------------------------------------------------------


def test_p10_audit_invariants_and_python_replay(spark, sf_dir):
    """The audit's bin assignment must equal an independent python
    replay of next-fit over md5-mod bucket counts, and every physical
    invariant must hold on the real layout."""
    import duckdb

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P10_BINS,
        _P10_BUCKETS,
        p10_compaction_exec,
    )

    got = {r.bucket: r for r in p10_compaction_exec(spark, sf_dir).collect()}
    counts = dict(
        duckdb.sql(
            f"""SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % {_P10_BUCKETS} AS bucket, COUNT(*)
               FROM '{os.path.join(sf_dir, "events.parquet")}' GROUP BY bucket"""
        ).fetchall()
    )
    assert set(got) == set(counts)
    total = sum(counts.values())
    budget = -(-total // _P10_BINS)
    cum = 0
    for bucket in sorted(counts):
        expect_bin = cum // budget
        cum += counts[bucket]
        r = got[bucket]
        assert r.bin_id == expect_bin, f"bucket {bucket}"
        assert r.n_rows_src == counts[bucket]
        assert r.n_rows_compacted == counts[bucket]
        assert r.conserved
        assert r.n_src_files == 1
        assert r.n_bins_touched == 1
        assert r.n_out_files_bin == 1
    assert len({r.bin_id for r in got.values()}) <= _P10_BINS


def test_p10_rewrite_plan_has_no_shuffle(spark, sf_dir):
    """The compaction rewrite is scan → coalesce(1) → write: no Exchange
    may appear in the per-bin plan (payload rows never shuffle)."""
    from etl_pipeline_telecom_spark.plans.pipeline import _P10_BUCKETS
    from etl_pipeline_telecom_spark.sources.writers import stage_bucketed_events

    staged = stage_bucketed_events(spark, sf_dir, _P10_BUCKETS)
    paths = [os.path.join(staged, f"bucket={k}") for k in (0, 1, 2, 3)]
    member = spark.read.option("basePath", staged).parquet(*paths).coalesce(1)
    plan = member._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_p10_compacted_layout_one_file_per_bin(spark, sf_dir):
    import glob

    from etl_pipeline_telecom_spark.plans.pipeline import _P10_BINS, _P10_BUCKETS
    from etl_pipeline_telecom_spark.sources.writers import compact_bucketed_layout

    out = compact_bucketed_layout(spark, sf_dir, _P10_BUCKETS, _P10_BINS)
    bins = sorted(glob.glob(os.path.join(out, "bin=*")))
    assert 1 <= len(bins) <= _P10_BINS
    for b in bins:
        parts = glob.glob(os.path.join(b, "part-*.parquet"))
        assert len(parts) == 1, b


def test_p10_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "p10_compaction_exec")


# ---------------------------------------------------------------------------
# t26/t27: WordPiece train + encode
# ---------------------------------------------------------------------------

_T26_SCALE = 1_000_000_000


def _py_wordpiece_train(words: dict[str, int], n_merges: int):
    """Pure-python WordPiece replay: '##' continuation symbols, naive
    adjacent pair counts, nano-scaled integer likelihood-ratio winner
    with (score DESC, a, b) tie-break, greedy left-to-right merge."""
    seqs = {w: [w[0]] + ["##" + c for c in w[1:]] for w in words}
    merges = []
    for r in range(n_merges):
        pc: dict = {}
        sc: dict = {}
        for w, f in words.items():
            s = seqs[w]
            for x in s:
                sc[x] = sc.get(x, 0) + f
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (a, b), f = min(
            pc.items(),
            key=lambda kv: (
                -(kv[1] * _T26_SCALE // (sc[kv[0][0]] * sc[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        score = f * _T26_SCALE // (sc[a] * sc[b])
        merges.append((r + 1, a, b, f, score))
        new = a + (b[2:] if b.startswith("##") else b)
        for w in words:
            s = seqs[w]
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_t26_matches_pure_python_replay(spark, tmp_path):
    from etl_pipeline_telecom_spark.plans.text import t26_wordpiece_train

    words = {"abab": 3, "abc": 2, "babab": 1, "cab": 2, "abba": 1}
    text = " ".join(w for w, f in words.items() for _ in range(f))
    d = _write_docs(tmp_path, [(0, text, "en", "s")])
    got = sorted(
        (r.merge_rank, r.merge_left, r.merge_right, r.pair_freq, r.score_nano)
        for r in t26_wordpiece_train(spark, d).collect()
    )
    expect, _seqs = _py_wordpiece_train(words, 8)
    assert got == sorted(expect)


def test_t26_likelihood_ratio_differs_from_raw_frequency(spark, tmp_path):
    """The WordPiece criterion must be able to pick a RARER pair whose
    parts are rare (high ratio) over the most frequent pair with common
    parts — the exact place t26 diverges from BPE."""
    from etl_pipeline_telecom_spark.plans.text import _wp_train
    from etl_pipeline_telecom_spark.sources import load_table

    # 'xy' occurs 3x but x,y occur only in it: ratio = 3e9/(3*3) huge.
    # 'ab' occurs 6x but a,b are everywhere (freq 14, 13): ratio small.
    rows = [
        (0, "ab ab ab ab ab ab ba ba ba ba ba ba ba aa", "en", "s"),
        (1, "xy xy xy", "en", "s"),
    ]
    d = _write_docs(tmp_path, rows)
    docs = load_table(spark, d, "documents")
    merges, _s0, _seq = _wp_train(docs, 1)
    (row,) = merges[0].collect()
    assert (row.merge_left, row.merge_right) == ("x", "##y")


def test_t26_deeper_chain_oracle(spark, sf_dir):
    """Depth is a parameter: the N=12 chain must also replay (t15's
    second-depth discipline)."""
    from etl_pipeline_telecom_spark.plans.text import _sql_t26, _wp_train
    from etl_pipeline_telecom_spark.sources import load_table

    def fn(spark, d):
        merges, _s0, _seq = _wp_train(load_table(spark, d, "documents"), 12)
        out = merges[0]
        for m in merges[1:]:
            out = out.unionByName(m)
        return out

    ok, msg = compare(spark, sf_dir, fn, _sql_t26(12))
    assert ok, msg


def test_t26_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t26_wordpiece_train")


def test_t27_greedy_longest_match_and_unk():
    from etl_pipeline_telecom_spark.plans.text import _wp_encode_word

    vocab = frozenset({"ab", "a", "##b", "##bc", "##c"})
    # longest-first: 'abc' → 'ab' + '##c' (2 pieces), never a+##b+##c
    assert _wp_encode_word("abc", vocab) == 2
    # 'a' alone
    assert _wp_encode_word("a", vocab) == 1
    # continuation missing → UNK: 'ax' has no '##x'
    assert _wp_encode_word("ax", vocab) is None
    # word-initial form required at pos 0: 'b' alone has no initial 'b'
    assert _wp_encode_word("b", vocab) is None


def test_t27_encode_words_matches_python(spark):
    from etl_pipeline_telecom_spark.plans.text import _wp_encode_word, wp_encode_words

    vocab = frozenset({"un", "##able", "##b", "a", "##a", "b", "##le", "u", "##n"})
    words = ["unable", "ab", "ba", "aaa", "unun", "q"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: (r.n_tok, r.unk) for r in wp_encode_words(df, vocab).collect()}
    for w in words:
        n = _wp_encode_word(w, vocab)
        assert got[w] == ((1, 1) if n is None else (n, 0)), w


def test_t27_oracle_roundtrip(spark, sf_dir):
    _roundtrip(spark, sf_dir, "t27_wordpiece_encode")


# ---------------------------------------------------------------------------
# m6 ADVICE closure: the REGISTERED oracle's LSH banding must stay
# arithmetically identical to the engine's Horner band keys over ALL 128
# dHash bits — the r9 oracle silently banded only bits 0-63 and the
# end-to-end hash gate never noticed (ADVICE r9, medium).
# ---------------------------------------------------------------------------


def test_m6_registered_oracle_bands_match_engine_horner(spark):
    """Three-way band-key equivalence on crafted vectors, including ones
    that differ ONLY in bits 64-127 (the region the stale r9 oracle
    ignored): (1) the bands expression EXTRACTED from the registered
    oracle SQL, run in DuckDB; (2) the engine's Horner fold as a Spark
    Column on the same literal bits; (3) an independent python
    sum(bit<<j). Any regression of the oracle's band width / bit
    indexing away from _M6_BAND_W turns this red directly, without
    needing a fixture pair that happens to discriminate."""
    import re

    import duckdb
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.multimodal import _M6_BAND_W

    sql = catalog.oracle_sql()["m6_perceptual_neardup"]
    m = re.search(
        r"list_transform\(range\(0,\s*4\),\s*b\s*->\s*\{'band':\s*b,\s*"
        r"'key':[^}]+\}\)",
        sql,
        re.S,
    )
    assert m, "bands expression not found in registered m6 oracle SQL"
    bands_expr = m.group(0)
    # the expression must cover all 4 bands of width _M6_BAND_W
    assert f"range(0, {_M6_BAND_W})" in bands_expr, bands_expr
    assert f"bits[b * {_M6_BAND_W} + j + 1]" in bands_expr, bands_expr

    vectors = [
        [0] * 64 + [1] * 64,              # differs from zeros ONLY in high bits
        [1] * 64 + [0] * 64,
        [(i * 7 + 3) % 2 for i in range(128)],
        [0] * 127 + [1],                  # the single highest bit
        [1] + [0] * 127,
        [int(i >= 96) for i in range(128)],  # only band 3 set
    ]
    for bits in vectors:
        expected = [
            sum(bits[b * _M6_BAND_W + j] << j for j in range(_M6_BAND_W))
            for b in range(4)
        ]
        # (1) registered-oracle arithmetic in DuckDB
        got_duck = [
            r[1]
            for r in duckdb.sql(
                f"SELECT band, key FROM (SELECT unnest({bands_expr}, "
                f"recursive := true) FROM (SELECT {bits}::BIGINT[] AS bits)) "
                f"ORDER BY band"
            ).fetchall()
        ]
        # (2) engine Horner fold on the same literal
        horner = F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda b: F.aggregate(
                F.sequence(F.lit(_M6_BAND_W - 1), F.lit(0), F.lit(-1)),
                F.lit(0).cast("bigint"),
                lambda acc, jj: acc * 2
                + F.element_at(F.lit(bits), (b * _M6_BAND_W + jj + 1).cast("int")),
            ).cast("bigint"),
        )
        got_spark = spark.range(1).select(horner.alias("k")).collect()[0].k
        assert got_duck == expected, (bits, got_duck, expected)
        assert list(got_spark) == expected, (bits, got_spark, expected)

"""Crafted-data pins for the mid-round-7 operators.

Each test hand-computes the expected values on a tiny crafted fixture,
asserts them against the Spark plan, and round-trips the same fixture
through the full DuckDB oracle compare (the driver's hash discipline) —
so the semantic claim AND the cross-engine claim are both pinned.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import pytest

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare
from .test_r6_ops import _write_events


def _write_docs_file(d: str, rows: list[tuple[int, str]]) -> None:
    """Single-file documents.parquet (pyarrow) so DuckDB's read_parquet
    sees the same bytes Spark does — the Spark dir-writer breaks the
    oracle round-trip."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["src"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()

T0 = dt.datetime(2024, 1, 5, 12, 0, 0)
S = dt.timedelta(seconds=1)


def _roundtrip(spark, d: str, name: str) -> None:
    spec = catalog.REGISTRY[name]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"


def test_w10_frame_is_trailing_five_rows_per_user(spark, tmp_path):
    """Values 1..7 for one user → at row 7 the frame is rows 3..7
    (sum 25, avg 5), at row 3 the frame is only rows 1..3 (partial
    frames average over the actual count, not a padded 5); a second
    user's rows never leak into the frame."""
    from etl_pipeline_telecom_spark.plans.windows import w10_rolling_stats

    rows = [(i, T0 + i * S, 1, "click", float(i)) for i in range(1, 8)]
    rows += [(100, T0, 2, "click", 1000.0)]
    _write_events(tmp_path, rows)
    got = {r["event_id"]: r for r in w10_rolling_stats(spark, str(tmp_path)).collect()}
    assert got[7]["roll_sum"] == 25.0 and got[7]["roll_avg"] == 5.0
    assert got[7]["roll_min"] == 3.0 and got[7]["roll_max"] == 7.0
    assert got[3]["roll_sum"] == 6.0 and got[3]["roll_avg"] == 2.0
    assert got[100]["roll_sum"] == 1000.0  # user 2 isolated
    _roundtrip(spark, str(tmp_path), "w10_rolling_stats")


def test_e11_half_open_touching_intervals_never_overlap(spark, tmp_path):
    """Durations are (event_id % 3600) + 60 s. Type 'a': two intervals
    where the first ends EXACTLY when the second starts → max 1 (the
    -1 boundary sorts before the +1 at the same instant). Type 'b':
    three intervals all alive at t0+20s → max 3."""
    from etl_pipeline_telecom_spark.plans.eventtime import e11_max_concurrency

    rows = [
        # type a: id 3600 → 60s at t0, [t0, t0+60); id 7200 → 60s at t0+60
        (3600, T0, 1, "a", 0.0),
        (7200, T0 + 60 * S, 1, "a", 0.0),
        # type b: ids 0/1/2 → 60/61/62s, all starting within 20s
        (0, T0, 2, "b", 0.0),
        (1, T0 + 10 * S, 2, "b", 0.0),
        (2, T0 + 20 * S, 2, "b", 0.0),
    ]
    _write_events(tmp_path, rows)
    got = {r["event_type"]: r for r in e11_max_concurrency(spark, str(tmp_path)).collect()}
    assert got["a"]["max_concurrent"] == 1 and got["a"]["n_intervals"] == 2
    assert got["b"]["max_concurrent"] == 3 and got["b"]["n_intervals"] == 3
    _roundtrip(spark, str(tmp_path), "e11_max_concurrency")


def test_dq5_staleness_and_day_coverage(spark, tmp_path):
    """'fresh' type's last event is Jan 30 (2d before the fixed audit
    instant Feb 1) → fresh; 'stale' type stops Jan 10 (22d) → not
    fresh. 'fresh' has events on Jan 28 and Jan 30 but not Jan 29 →
    days_seen 2 over span 3 → coverage 666666 ppm (floor)."""
    from etl_pipeline_telecom_spark.plans.quality import dq5_freshness

    rows = [
        (1, dt.datetime(2024, 1, 28, 8, 0, 0), 1, "fresh", 0.0),
        (2, dt.datetime(2024, 1, 30, 8, 0, 0), 1, "fresh", 0.0),
        (3, dt.datetime(2024, 1, 10, 8, 0, 0), 1, "stale", 0.0),
    ]
    _write_events(tmp_path, rows)
    got = {r["event_type"]: r for r in dq5_freshness(spark, str(tmp_path)).collect()}
    assert got["fresh"]["fresh"] is True and got["stale"]["fresh"] is False
    assert got["fresh"]["days_seen"] == 2 and got["fresh"]["span_days"] == 3
    assert got["fresh"]["coverage_ppm"] == 666_666
    two_days_us = 2 * 86_400 * 1_000_000 - 8 * 3600 * 1_000_000
    assert got["fresh"]["staleness_us"] == two_days_us
    assert got["stale"]["coverage_ppm"] == 1_000_000  # single day, full span
    _roundtrip(spark, str(tmp_path), "dq5_freshness")


def test_t19_each_rule_fails_independently(spark, tmp_path):
    """doc 0 passes every rule; doc 1 is too short (wordcount); doc 2
    has no stopword evidence; doc 3 is symbol soup (alpha + symbol
    rules). The conjunctive verdict is true only for doc 0."""
    from etl_pipeline_telecom_spark.plans.text import t19_gopher_flags

    good = "the quick brown fox and his friend ran over the hill with joy " * 2
    _write_docs_file(
        str(tmp_path),
        [
            (0, good.strip()),
            (1, "the tiny and doc"),
            (2, " ".join(f"word{i}" for i in range(25))),
            (3, " ".join(["#!?"] * 25)),
        ],
    )
    got = {r["doc_id"]: r for r in t19_gopher_flags(spark, str(tmp_path)).collect()}
    assert got[0]["pass_gopher"] is True
    assert got[1]["r_wordcount"] is False and got[1]["pass_gopher"] is False
    assert got[2]["r_stop"] is False and got[2]["r_wordcount"] is True
    assert got[3]["r_alpha"] is False and got[3]["r_symbol"] is False
    _roundtrip(spark, str(tmp_path), "t19_gopher_flags")


def test_t18_redacts_organic_and_injected_pii_exactly(spark, tmp_path):
    """doc 1 (no injected footer: 1 % 3 != 0) carries ORGANIC PII — an
    email, a dashed phone, an IPv4 — and every span is replaced; doc 3
    gets the deterministic footer (3 % 3 == 0) and its counts/clean
    fingerprint match the hand-built redaction; doc 2 is clean and
    passes through byte-identical."""
    from etl_pipeline_telecom_spark.plans.text import t18_pii_scrub

    organic = "mail alice@example.org or call +44-123-4567 from 192.168.0.1 now"
    clean2 = "just plain words here"
    _write_docs_file(str(tmp_path), [(1, organic), (2, clean2), (3, "body text")])
    got = {r["doc_id"]: r for r in t18_pii_scrub(spark, str(tmp_path)).collect()}

    red1 = "mail <EMAIL> or call <PHONE> from <IP> now"
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (1, 1, 1)
    assert got[1]["clean_fp"] == hashlib.md5(red1.encode()).hexdigest()
    assert got[1]["clean_len"] == len(red1)

    assert got[2]["had_pii"] is False
    assert got[2]["clean_fp"] == hashlib.md5(clean2.encode()).hexdigest()

    # footer for doc 3: " Contact: user3@example.com or +1-555-0003 ip 10.3.0.1"
    red3 = "body text Contact: <EMAIL> or <PHONE> ip <IP>"
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (1, 1, 1)
    assert got[3]["clean_fp"] == hashlib.md5(red3.encode()).hexdigest()
    assert got[3]["clean_len"] == len(red3)
    _roundtrip(spark, str(tmp_path), "t18_pii_scrub")


def test_p4_delete_tombstone_and_resurrection(spark, tmp_path):
    """Key (1,'x'): U,U,D in order → absent. Key (2,'y'): D then a later
    U → present with the U's value (resurrection). Key (3,'z'): single
    U → present. Audit counts include tombstone ops."""
    from etl_pipeline_telecom_spark.plans.pipeline import p4_cdc_apply

    rows = [
        (1, T0 + 1 * S, 1, "x", 10.0),
        (2, T0 + 2 * S, 1, "x", 11.0),
        (9, T0 + 3 * S, 1, "x", 0.0),     # id%10==9 → delete, last → gone
        (19, T0 + 1 * S, 2, "y", 0.0),    # delete first
        (20, T0 + 2 * S, 2, "y", 42.0),   # then upsert → resurrected
        (30, T0, 3, "z", 7.0),
    ]
    _write_events(tmp_path, rows)
    got = {(r["user_id"], r["event_type"]): r for r in p4_cdc_apply(spark, str(tmp_path)).collect()}
    assert (1, "x") not in got
    assert got[(2, "y")]["live_value"] == 42.0 and got[(2, "y")]["n_deletes"] == 1
    assert got[(2, "y")]["n_ops"] == 2
    assert got[(3, "z")]["live_event_id"] == 30 and got[(3, "z")]["n_deletes"] == 0
    _roundtrip(spark, str(tmp_path), "p4_cdc_apply")


def test_a22_cms_claims_every_true_heavy_hitter(spark, tmp_path):
    """1000 events for user 1, 200 for user 2, 80 singleton users →
    total 1280, threshold 1280/128 = 10. Users 1 and 2 must be claimed
    with exact counts and flagged true HHs; every claimed row satisfies
    the no-underestimate invariant; singletons are claimed only via
    collision overcount (and then correctly flagged is_true_hh=false)."""
    from etl_pipeline_telecom_spark.plans.sketches import a22_countmin_heavy_hitters

    rows = []
    eid = 0
    for _ in range(1000):
        rows.append((eid, T0 + eid * S, 1, "click", 0.0)); eid += 1
    for _ in range(200):
        rows.append((eid, T0 + eid * S, 2, "click", 0.0)); eid += 1
    for u in range(100, 180):
        rows.append((eid, T0 + eid * S, u, "click", 0.0)); eid += 1
    _write_events(tmp_path, rows)
    out = a22_countmin_heavy_hitters(spark, str(tmp_path)).collect()
    got = {r["user_id"]: r for r in out}
    assert got[1]["exact_cnt"] == 1000 and got[1]["is_true_hh"] is True
    assert got[2]["exact_cnt"] == 200 and got[2]["is_true_hh"] is True
    assert all(r["no_underestimate"] for r in out)
    for r in out:
        if r["user_id"] not in (1, 2):
            assert r["is_true_hh"] is False
    _roundtrip(spark, str(tmp_path), "a22_countmin_heavy_hitters")


def test_t17_encode_matches_reference_bpe_tokenization(spark, tmp_path):
    """Per-doc BPE token counts must equal a pure-python reference BPE
    (train on the corpus, then greedily apply the learned merges to
    each pretoken). Two docs share the vocabulary, so training sees
    the union while each doc's count reflects its own pretokens."""
    import re

    from etl_pipeline_telecom_spark.plans.text import (
        _BPE_MERGES,
        _BPE_PATTERN,
        t17_bpe_encode,
    )
    from .test_r7_guards import _python_bpe

    texts = [
        "low low low low low lower lower newest newest newest newest newest newest widest widest widest",
        "newest widest low",
    ]
    _write_docs_file(str(tmp_path), list(enumerate(texts)))

    freqs: dict[str, int] = {}
    per_doc_toks: list[list[str]] = []
    for t in texts:
        toks = re.findall(_BPE_PATTERN, t.lower())
        per_doc_toks.append(toks)
        for tok in toks:
            freqs[tok] = freqs.get(tok, 0) + 1
    merges = [(a, b) for _, a, b, _ in _python_bpe(freqs, _BPE_MERGES)]

    def encode(word: str) -> list[str]:
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

    expected = {
        doc_id: sum(len(encode(w)) for w in toks)
        for doc_id, toks in enumerate(per_doc_toks)
    }
    got = {r["doc_id"]: r for r in t17_bpe_encode(spark, str(tmp_path)).collect()}
    assert {d: r["n_bpe_tokens"] for d, r in got.items()} == expected
    assert got[0]["n_pretokens"] == len(per_doc_toks[0])
    # compression must be real: fewer BPE tokens than characters
    assert got[0]["n_bpe_tokens"] < got[0]["n_pretoken_chars"]
    _roundtrip(spark, str(tmp_path), "t17_bpe_encode")


def test_sm7_budget_is_a_prefix_cut_in_hash_order(spark, tmp_path):
    """Three 4-token docs + one 1-token doc, budget = floor(13*0.4) = 5:
    admission is a PREFIX of the hash order — once the running total
    would exceed the budget, every later doc is excluded, even a
    1-token doc that would individually fit (quota cut, not bin
    packing). Expected set computed by replaying the rule in python."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.semistructured import (
        _SM7_BUDGET_FRAC,
        sm7_token_budget_cut,
    )

    docs = [(10, "w w w w"), (11, "x x x x"), (12, "y y y y"), (13, "z")]
    _write_docs_file(str(tmp_path), docs)

    ntok = {d: len(t.split()) for d, t in docs}
    budget = int(sum(ntok.values()) * _SM7_BUDGET_FRAC)
    order = sorted(ntok, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
    kept, cum = [], 0
    for d in order:
        cum += ntok[d]
        if cum <= budget:
            kept.append(d)
        else:
            break  # prefix semantics: nothing after the first overflow
    [row] = sm7_token_budget_cut(spark, str(tmp_path)).collect()
    assert row["budget_tokens"] == budget == 5
    assert row["n_docs_kept"] == len(kept)
    assert row["tokens_kept"] == sum(ntok[d] for d in kept)
    _roundtrip(spark, str(tmp_path), "sm7_token_budget_cut")


def test_j9_containment_is_half_open_same_user_and_crosses_buckets(spark, tmp_path):
    """Interval [t0, t0+64s) (event_id 4): a point at +63s is inside, at
    +64s is NOT (half-open), another user's point never matches. A
    second interval straddling a 2048 s bucket boundary must still meet
    a point living in its SECOND bucket — the cross-bucket explode."""
    from etl_pipeline_telecom_spark.plans.joins import (
        _J9_W_US,
        j9_interval_bucket_join,
    )

    w_s = _J9_W_US // 1_000_000
    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    epoch0 = int(t0.timestamp())
    # start 30 s before the next bucket boundary; duration 8%1800+60=68 s
    boundary = (epoch0 // w_s + 1) * w_s
    t_cross = dt.datetime.utcfromtimestamp(boundary - 30)
    rows = [
        (4, t0, 1, "click", 0.0),                      # interval [t0, t0+64)
        (1, t0 + 63 * S, 1, "click", 0.0),             # inside
        (2, t0 + 64 * S, 1, "click", 0.0),             # boundary → outside
        (3, t0 + 10 * S, 2, "click", 0.0),             # other user → no match
        (8, t_cross, 3, "click", 0.0),                 # crosses bucket edge
        (5, t_cross + 50 * S, 3, "click", 0.0),        # in the SECOND bucket
    ]
    _write_events(tmp_path, rows)
    got = {r["user_id"]: r for r in j9_interval_bucket_join(spark, str(tmp_path)).collect()}
    assert got[1]["n_containments"] == 1 and got[1]["n_points_covered"] == 1
    assert 2 not in got
    assert got[3]["n_containments"] == 1  # cross-bucket containment found
    _roundtrip(spark, str(tmp_path), "j9_interval_bucket_join")


def test_g2_throttle_keeps_exact_gap_boundary_and_resets_on_keep(spark, tmp_path):
    """Gap = 1 day. t0 kept; +12 h dropped; +1 d kept (>= is inclusive —
    the exact-boundary event passes); +1 d + 100 s dropped (clock reset
    to the KEPT event, not the dropped one). Second user independent."""
    from etl_pipeline_telecom_spark.plans.semistructured import g2_throttle_debounce

    D12, D1 = dt.timedelta(hours=12), dt.timedelta(days=1)
    rows = [
        (1, T0, 1, "click", 0.0),
        (2, T0 + D12, 1, "click", 0.0),
        (3, T0 + D1, 1, "click", 0.0),
        (4, T0 + D1 + 100 * S, 1, "click", 0.0),
        (5, T0 + D1 + D1, 1, "click", 0.0),
        (6, T0 + D12, 2, "click", 0.0),
    ]
    _write_events(tmp_path, rows)
    kept = sorted(r["event_id"] for r in g2_throttle_debounce(spark, str(tmp_path)).collect())
    assert kept == [1, 3, 5, 6]
    _roundtrip(spark, str(tmp_path), "g2_throttle_debounce")


def test_a23_quantile_lands_in_first_bin_reaching_rank(spark, tmp_path):
    """10 prices at $0,150,300,...,1350 → cents bins of $100: the median
    rank ceil(0.5*10)=5 is reached in the bin holding the 5th value
    ($600 → bin 6); exact interpolated median (575+600)/2*100 cents
    rides along. Bin edges are the estimate — error <= one bin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.sketches import a23_histogram_quantiles

    prices = [i * 150.0 for i in range(10)]
    pq.write_table(
        pa.table({"l_extendedprice": pa.array(prices, pa.float64())}),
        os.path.join(str(tmp_path), "lineitem.parquet"),
    )
    got = {r["p_ppt"]: r for r in a23_histogram_quantiles(spark, str(tmp_path)).collect()}
    # p=0.5: rank ceil(.5*10)=5 → 5th value $600 (60000c) → bin 6 → [60000, 70000)
    assert got[500]["bin_lo_cents"] == 60000 and got[500]["bin_hi_cents"] == 70000
    assert got[500]["exact_cents"] == (60000 + 75000) / 2.0  # cont-interp median
    assert got[500]["n"] == 10
    # p=0.9: rank 9 → value 1200.00 → bin 12
    assert got[900]["bin_lo_cents"] == 120000
    _roundtrip(spark, str(tmp_path), "a23_histogram_quantiles")


def test_st10_stream_matches_batch_cdc_semantics(spark, tmp_path):
    """The stateful streaming CDC apply on the p4 crafted fixture:
    delete-last key absent, delete-then-upsert resurrected, audit
    counts carried — identical to the batch p4 materialization."""
    from etl_pipeline_telecom_spark.plans.streaming import st10_stream_cdc_apply

    rows = [
        (1, T0 + 1 * S, 1, "x", 10.0),
        (2, T0 + 2 * S, 1, "x", 11.0),
        (9, T0 + 3 * S, 1, "x", 0.0),     # delete, last → key gone
        (19, T0 + 1 * S, 2, "y", 0.0),
        (20, T0 + 2 * S, 2, "y", 42.0),   # resurrection
        (30, T0, 3, "z", 7.0),
    ]
    _write_events(tmp_path, rows)
    got = {
        (r["user_id"], r["event_type"]): r
        for r in st10_stream_cdc_apply(spark, str(tmp_path)).collect()
    }
    assert (1, "x") not in got
    assert got[(2, "y")]["live_value"] == 42.0 and got[(2, "y")]["n_deletes"] == 1
    assert got[(3, "z")]["live_event_id"] == 30 and got[(3, "z")]["n_ops"] == 1
    _roundtrip(spark, str(tmp_path), "st10_stream_cdc_apply")


def _write_events_props(tmp_path, rows):
    """Events writer with per-row props (the shared one pins props='{}')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }),
        str(tmp_path / "events.parquet"),
    )


def test_m5_straddling_blob_stays_in_start_shard(spark, tmp_path):
    """Blobs join the shard their running-byte START falls in: with a
    4096-byte budget and 3000-byte blobs, the second blob starts at
    3000 (< 4096) → shard 0 holds 6000 bytes (overflow-tolerant
    next-fit); the third starts at 6000 → shard 1. Replayed in python
    over the same md5 order."""
    from etl_pipeline_telecom_spark.plans.multimodal import (
        _M5_SHARD_BYTES,
        m5_shard_manifest,
    )

    # all doc_ids % 3 == 0 → one media_type ('image')
    docs = [(0, "a" * 3000), (3, "b" * 3000), (6, "c" * 3000), (9, "d" * 200)]
    _write_docs_file(str(tmp_path), docs)
    sizes = {d: len(t) for d, t in docs}
    order = sorted(sizes, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
    shards: dict[int, list[int]] = {}
    cum = 0
    for d in order:
        shards.setdefault(cum // _M5_SHARD_BYTES, []).append(d)
        cum += sizes[d]
    got = {r["shard_id"]: r for r in m5_shard_manifest(spark, str(tmp_path)).collect()}
    assert set(got) == set(shards)
    for sid, members in shards.items():
        assert got[sid]["n_blobs"] == len(members)
        assert got[sid]["shard_bytes"] == sum(sizes[d] for d in members)
    # the straddle really happened: some shard exceeds the budget
    assert any(r["shard_bytes"] > _M5_SHARD_BYTES for r in got.values())
    _roundtrip(spark, str(tmp_path), "m5_shard_manifest")


def test_dq6_detects_orphans_and_childless_parents(spark, tmp_path):
    """Crafted broken star: order 20 references customer 99 (absent) →
    1 orphan, fk_ok false; customer 2 has no orders → childless; a
    lineitem references a missing part."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.quality import dq6_referential_integrity

    def w(name, cols):
        pq.write_table(pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()}),
                       os.path.join(str(tmp_path), f"{name}.parquet"))

    w("customer", {"c_custkey": [1, 2]})
    w("orders", {"o_orderkey": [10, 20], "o_custkey": [1, 99]})
    w("part", {"p_partkey": [100]})
    w("lineitem", {"l_orderkey": [10, 10], "l_partkey": [100, 555]})
    # events needs a ts column (load_table's timestamp sniff reads it)
    import datetime as _dt

    pq.write_table(
        pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([_dt.datetime(2024, 1, 5)], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
        }),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    got = {r["relation"]: r for r in dq6_referential_integrity(spark, str(tmp_path)).collect()}
    assert got["orders->customer"]["n_orphans"] == 1
    assert got["orders->customer"]["fk_ok"] is False
    assert got["orders->customer"]["n_childless_parents"] == 1  # customer 2
    assert got["lineitem->part"]["n_orphans"] == 1
    assert got["lineitem->orders"]["n_orphans"] == 0
    assert got["lineitem->orders"]["fk_ok"] is True
    _roundtrip(spark, str(tmp_path), "dq6_referential_integrity")


def test_w11_last_value_uses_full_frame_not_current_row(spark, tmp_path):
    """Customer 1 has orders 10 < 20 < 30 by date: EVERY row must see
    last_order=30 (full-partition frame — the default frame would make
    last_value echo the current row); second_order=20 everywhere; a
    single-order customer gets second_order NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.windows import w11_value_window_ops

    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([10, 20, 30, 40], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
            "o_orderdate": pa.array(
                [dt.datetime(2024, 1, d) for d in (1, 2, 3, 1)], pa.timestamp("us")
            ),
        }),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    got = {r["o_orderkey"]: r for r in w11_value_window_ops(spark, str(tmp_path)).collect()}
    assert all(got[k]["last_order"] == 30 for k in (10, 20, 30))
    assert all(got[k]["second_order"] == 20 for k in (10, 20, 30))
    assert got[10]["is_first"] == 1 and got[20]["is_first"] == 0
    assert got[40]["second_order"] is None and got[40]["last_order"] == 40
    _roundtrip(spark, str(tmp_path), "w11_value_window_ops")


def test_a24_weights_halve_per_whole_halflife_and_future_rows_drop(spark, tmp_path):
    """Against the fixed 2024-02-01 instant: age 0d → 1e6, exactly 7d →
    500000 (the halving boundary is inclusive via integer //), 14d →
    250000, future rows are excluded entirely."""
    from etl_pipeline_telecom_spark.plans.sketches import a24_decayed_counts

    rows = [
        (1, dt.datetime(2024, 1, 31, 12, 0, 0), 1, "a", 0.0),  # age 0 → 1e6
        (2, dt.datetime(2024, 1, 25, 0, 0, 0), 1, "a", 0.0),   # age 7 → 500000
        (3, dt.datetime(2024, 1, 18, 0, 0, 0), 1, "a", 0.0),   # age 14 → 250000
        (4, dt.datetime(2024, 2, 2, 0, 0, 0), 1, "a", 0.0),    # future → dropped
        (5, dt.datetime(2024, 1, 31, 0, 0, 0), 1, "b", 0.0),   # age 1 → 1e6
    ]
    _write_events(tmp_path, rows)
    got = {r["event_type"]: r for r in a24_decayed_counts(spark, str(tmp_path)).collect()}
    assert got["a"]["n_events"] == 3  # future row gone
    assert got["a"]["decayed_score_ppm"] == 1_000_000 + 500_000 + 250_000
    assert got["a"]["newest_age_days"] == 0
    assert got["b"]["decayed_score_ppm"] == 1_000_000
    _roundtrip(spark, str(tmp_path), "a24_decayed_counts")


def test_x3_counts_malformed_and_keyless_props_separately(spark, tmp_path):
    """'{\"k\": 5}' is an object with k; '{}' is an object WITHOUT k;
    '{oops' is malformed (from_json → NULL, json_valid → false); NULL
    props count as neither. k stats ignore non-k rows."""
    from etl_pipeline_telecom_spark.plans.semistructured import x3_json_schema_audit

    t = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (1, t, 1, "a", 0.0, '{"k": 5}'),
        (2, t, 1, "a", 0.0, "{}"),
        (3, t, 1, "a", 0.0, "{oops"),
        (4, t, 1, "a", 0.0, None),
        (5, t, 1, "a", 0.0, '{"k": 11}'),
    ]
    _write_events_props(tmp_path, rows)
    [row] = x3_json_schema_audit(spark, str(tmp_path)).collect()
    assert row["n_rows"] == 5
    assert row["n_objects"] == 3
    assert row["n_with_k"] == 2
    assert (row["k_min"], row["k_max"], row["k_sum"]) == (5, 11, 16)
    _roundtrip(spark, str(tmp_path), "x3_json_schema_audit")


def test_r3_pivot_carries_latest_value_per_type(spark, tmp_path):
    """User 1 clicks twice — the later value (7.5) wins; view column
    filled, untouched types stay NULL; user 2 independent."""
    from etl_pipeline_telecom_spark.plans.reshape import r3_pivot_latest_value

    rows = [
        (1, T0 + 1 * S, 1, "click", 2.5),
        (2, T0 + 9 * S, 1, "click", 7.5),   # later → wins
        (3, T0 + 5 * S, 1, "view", 1.0),
        (4, T0, 2, "purchase", 99.0),
    ]
    _write_events(tmp_path, rows)
    got = {r["user_id"]: r for r in r3_pivot_latest_value(spark, str(tmp_path)).collect()}
    assert got[1]["click"] == 7.5 and got[1]["view"] == 1.0
    assert got[1]["purchase"] is None and got[1]["error"] is None
    assert got[2]["purchase"] == 99.0 and got[2]["click"] is None
    _roundtrip(spark, str(tmp_path), "r3_pivot_latest_value")


def test_x4_jsonl_roundtrip_survives_nulls_and_float_precision(spark, tmp_path):
    """A null timestamp and a repr-ugly double (0.1+0.2) must survive
    parquet → JSONL → spark.read.json byte-exactly: the oracle
    aggregates the ORIGINAL parquet, so any serialization loss breaks
    the compare."""
    from etl_pipeline_telecom_spark.plans.semistructured import x4_jsonl_source_scan

    ugly = 0.1 + 0.2  # 0.30000000000000004
    rows = [
        (1, T0, 1, "a", ugly),
        (2, None, 1, "a", 1.25),
        (3, T0 + 5 * S, 2, "b", -17.831),
    ]
    _write_events(tmp_path, rows)
    got = {r["event_type"]: r for r in x4_jsonl_source_scan(spark, str(tmp_path)).collect()}
    assert got["a"]["n_rows"] == 2 and got["a"]["n_null_ts"] == 1
    # DECIMAL(18,2) of the ugly double is 0.30; 0.30 + 1.25 = 1.55
    assert got["a"]["sum_value"] == 1.55
    assert got["b"]["max_ts_us"] == int((T0 + 5 * S).timestamp() * 1_000_000)
    _roundtrip(spark, str(tmp_path), "x4_jsonl_source_scan")


def test_v10_sq8_replays_python_reference(spark, tmp_path):
    """Full-pipeline replay on crafted 4-dim vectors: python applies the
    SAME quantize (x*1000 round, then per-dim symmetric int8) and ranks
    both spaces; the Spark recall rows must match exactly. The crafted
    set includes a near-tie the quantizer collapses, so code-space and
    float-space top-3 genuinely differ for one query."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.similarity import v10_sq8_ann_recall

    vecs = {
        0: [1.0, 0.02, 0.0, 0.0],       # query
        10: [1.0, 0.0, 0.0, 0.0],
        11: [0.9995, 0.0002, 0.0, 0.0],  # near-tie with 10; collapses in int8
        12: [0.0, 1.0, 0.0, 0.0],
        13: [0.5, 0.5, 0.0, 0.0],
        14: [0.0, 0.0, 1.0, 0.0],
    }
    pq.write_table(
        pa.table({
            "vec_id": pa.array(list(vecs), pa.int64()),
            "embedding": pa.array(list(vecs.values()), pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int64()),
        }),
        os.path.join(str(tmp_path), "embeddings.parquet"),
    )

    q = {k: [round(float(pa.scalar(x, pa.float32()).as_py()) * 1000) for x in v] for k, v in vecs.items()}
    dims = range(4)
    mx = [max(max(abs(q[k][d]) for k in q), 1.0) for d in dims]
    codes = {k: [round(q[k][d] * 127 / mx[d]) for d in dims] for k in q}

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return d / (math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v)))

    def top3(space):
        scored = sorted(
            ((cos(space[0], space[k]), -k) for k in space if k != 0), reverse=True
        )
        return {-nk for _, nk in scored[:3]}

    sq3, ex3 = top3(codes), top3(q)
    expected_hits = len(sq3 & ex3)
    [row] = v10_sq8_ann_recall(spark, str(tmp_path)).collect()
    assert row["query_id"] == 0 and row["n_sq"] == 3
    assert row["n_hits"] == expected_hits
    _roundtrip(spark, str(tmp_path), "v10_sq8_ann_recall")


def test_pipe3_counts_dup_members_not_groups(spark, tmp_path):
    """Two docs share a fingerprint → n_dup_docs counts BOTH members
    (what a dedup pass touches), a singleton counts zero; token totals
    are per-language sums."""
    from etl_pipeline_telecom_spark.plans.pipeline import pipe3_dataset_card

    same = "the quick brown fox jumps with the dog " * 6
    _write_docs_file(
        str(tmp_path),
        [(0, same.strip()), (1, same.strip()), (2, "one tiny unique doc here")],
    )
    got = {(r["metric"], r["scope"]): r["value"] for r in pipe3_dataset_card(spark, str(tmp_path)).collect()}
    assert got[("n_docs", "en")] == 3
    assert got[("n_dup_docs", "en")] == 2  # members of the copies>1 group
    assert got[("n_tokens", "en")] == 2 * len(same.split()) + len(
        "one tiny unique doc here".split()
    )
    _roundtrip(spark, str(tmp_path), "pipe3_dataset_card")


def test_p5_sink_readback_prunes_partitions(spark, tmp_path):
    """The read side of the partitioned sink must hit ONLY the two
    filtered date directories (PartitionFilters in the scan, 2 of 4
    partitions) and the audit must match a direct filter of the
    original events."""
    import io
    from contextlib import redirect_stdout

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P5_DATES,
        p5_partitioned_sink_audit,
    )

    rows = []
    eid = 0
    for day, n in ((4, 3), (5, 4), (6, 2), (7, 5)):
        for _ in range(n):
            rows.append((eid, dt.datetime(2024, 1, day, 10, 0, 0), 1, "click", 1.5))
            eid += 1
    _write_events(tmp_path, rows)
    got = {str(r["event_date"]): r for r in p5_partitioned_sink_audit(spark, str(tmp_path)).collect()}
    assert set(got) == set(_P5_DATES)
    assert got["2024-01-05"]["n_rows"] == 4 and got["2024-01-06"]["n_rows"] == 2
    assert got["2024-01-05"]["sum_value"] == 6.0

    buf = io.StringIO()
    with redirect_stdout(buf):
        p5_partitioned_sink_audit(spark, str(tmp_path)).explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_date" in plan
    _roundtrip(spark, str(tmp_path), "p5_partitioned_sink_audit")

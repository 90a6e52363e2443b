"""Crafted-data pins for the round-8 operators.

Same discipline as test_r7_ops: hand-computed expectations on tiny
crafted fixtures, plus the DuckDB oracle round-trip where the operator
has one.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from etl_pipeline_telecom_spark import catalog

from .oracle_harness import compare
from .test_r6_ops import _write_events

pytestmark = pytest.mark.usefixtures("spark")

catalog._load_all_plans()

GAP_US = 86_400 * 1_000_000


def _roundtrip(spark, d: str, name: str) -> None:
    spec = catalog.REGISTRY[name]
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, f"{name}: {msg}"


def _collect_sorted(df):
    return sorted(
        (r["user_id"], r["event_id"], r["kept_ts_us"]) for r in df.collect()
    )


def test_g2b_equals_g2_bit_identically_on_fixture(spark, sf_dir):
    """The (user, month) pre-split must be INVISIBLE: same rows, same
    values, on the full driver fixture."""
    from etl_pipeline_telecom_spark.plans.semistructured import (
        g2_throttle_debounce,
        g2b_throttle_skewfree,
    )

    a = _collect_sorted(g2_throttle_debounce(spark, sf_dir))
    # default threshold → every user takes the single-group route;
    # threshold=0 → every user takes the (user, month) pre-split route.
    # The dispatch must be output-invisible either way.
    b = _collect_sorted(g2b_throttle_skewfree(spark, sf_dir))
    c = _collect_sorted(g2b_throttle_skewfree(spark, sf_dir, hot_threshold=0))
    assert a == b == c and len(a) > 0


def test_g2b_crafted_month_straddle_and_suppressed_month(spark, tmp_path):
    """One user dominating the stream, with every cross-month edge the
    decomposition must get right:

    - Jan: t0 kept, +18h dropped, +1d (exact boundary) kept → Jan
      carry-out = Jan 31 12:00.
    - Feb: three first-window events — 00:30 and 11:59:59 suppressed by
      the CARRY-IN (not by any Feb event), 12:00:00 kept at the exact
      carry-in + GAP boundary; then +2d kept.
    - Apr 30 23:00 kept; May's ONLY event (May 1 10:00) falls inside the
      carry-in window → May emits nothing and must pass the April state
      THROUGH to June, whose event is kept.
    - user 2: single event, independent.
    """
    from etl_pipeline_telecom_spark.plans.semistructured import (
        g2_throttle_debounce,
        g2b_throttle_skewfree,
    )

    ts = dt.datetime
    rows = [
        (1, ts(2024, 1, 30, 12, 0, 0), 1, "click", 0.0),   # kept
        (2, ts(2024, 1, 31, 6, 0, 0), 1, "click", 0.0),    # dropped (<1d)
        (3, ts(2024, 1, 31, 12, 0, 0), 1, "click", 0.0),   # kept (= boundary)
        (4, ts(2024, 2, 1, 0, 30, 0), 1, "click", 0.0),    # dropped (carry-in)
        (5, ts(2024, 2, 1, 11, 59, 59), 1, "click", 0.0),  # dropped (carry-in)
        (6, ts(2024, 2, 1, 12, 0, 0), 1, "click", 0.0),    # kept (= carry-in+1d)
        (7, ts(2024, 2, 3, 12, 0, 0), 1, "click", 0.0),    # kept
        (8, ts(2024, 4, 30, 23, 0, 0), 1, "click", 0.0),   # kept
        (9, ts(2024, 5, 1, 10, 0, 0), 1, "click", 0.0),    # dropped → May empty
        (10, ts(2024, 6, 1, 0, 0, 0), 1, "click", 0.0),    # kept (state from Apr)
        (11, ts(2024, 2, 1, 0, 0, 0), 2, "click", 0.0),    # kept (other user)
    ]
    _write_events(tmp_path, rows)
    kept = sorted(
        r["event_id"]
        for r in g2b_throttle_skewfree(spark, str(tmp_path), hot_threshold=0).collect()
    )
    assert kept == [1, 3, 6, 7, 8, 10, 11]
    assert _collect_sorted(g2_throttle_debounce(spark, str(tmp_path))) == (
        _collect_sorted(g2b_throttle_skewfree(spark, str(tmp_path), hot_threshold=0))
    )
    # oracle round-trip on BOTH dispatch routes
    _roundtrip(spark, str(tmp_path), "g2b_throttle_skewfree")
    spec = catalog.REGISTRY["g2b_throttle_skewfree"]
    ok, msg = compare(
        spark,
        str(tmp_path),
        lambda s, d: g2b_throttle_skewfree(s, d, hot_threshold=0),
        spec.sql,
    )
    assert ok, f"g2b hot-path oracle: {msg}"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            # offsets spanning ~3 months so splits + carry-ins actually fire
            st.integers(min_value=0, max_value=90 * 86_400),
            st.integers(min_value=1, max_value=2),
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_g2b_equals_sequential_reference(spark, tmp_path_factory, events):
    """Arbitrary multi-month event sets: g2b ≡ the per-user sequential
    greedy recurrence (the same reference g2's property test uses)."""
    from etl_pipeline_telecom_spark.plans.semistructured import g2b_throttle_skewfree

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    d = tmp_path_factory.mktemp("g2bprop")
    rows = [
        (i, t0 + dt.timedelta(seconds=off), uid, "click", 0.0)
        for i, (off, uid) in enumerate(events)
    ]
    _write_events(d, rows)

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
    got = {
        r["event_id"]
        for r in g2b_throttle_skewfree(spark, str(d), hot_threshold=0).collect()
    }
    assert got == expected


def test_bpe_depth_parameterized_oracle_green_at_depth_20(spark, tmp_path):
    """VERDICT r7 item 4: the merge budget is a parameter, and the
    generated oracle CTE chain tracks it — proven at a SECOND depth
    (N=20; the registered N=8 entries are swept every round). Training
    (merge table) and corpus encode both compare hash-exact."""
    from etl_pipeline_telecom_spark.plans.text import (
        _bpe_encode_corpus,
        _bpe_train,
        _sql_t15,
        _sql_t17,
    )
    from etl_pipeline_telecom_spark.sources import load_table

    from .test_r7_ops import _write_docs_file

    texts = [
        "the quick brown fox jumps over the lazy dog while the eager "
        "hound watches the fox and the dog trade places in the meadow",
        "tokenization tokenizer tokens token tokenized tokenizing "
        "pretokenization pretokenizer subword subwords wordpiece",
        "lower lowest lowering newest newer new widest wider wide "
        "slower slowest slow faster fastest fast",
        "the meadow held the hound and the fox and the dog together",
    ]
    _write_docs_file(str(tmp_path), list(enumerate(texts)))
    N = 20

    def t15_deep(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        merges, _seq = _bpe_train(docs, N)
        out = merges[0]
        for m in merges[1:]:
            out = out.unionByName(m)
        return out

    ok, msg = compare(spark, str(tmp_path), t15_deep, _sql_t15(N))
    assert ok, f"t15@depth{N}: {msg}"

    def t17_deep(spark, sf_dir):
        return _bpe_encode_corpus(load_table(spark, sf_dir, "documents"), N)

    ok, msg = compare(spark, str(tmp_path), t17_deep, _sql_t17(N))
    assert ok, f"t17@depth{N}: {msg}"


def test_p6_zero_violations_on_real_layout_and_audit_catches_unsorted(spark, tmp_path):
    """Positive: the range-sharded export audits clean (row conservation,
    0 sort violations, 0 overlaps). Negative: the SAME audit pass over a
    deliberately unsorted single partition reports violations — the
    audit is live, not vacuously zero."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _p6_shard_audit,
        p6_range_sharded_export,
    )
    from etl_pipeline_telecom_spark.sources import load_table

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    # written DESCENDING in file order
    rows = [
        (i, t0 + dt.timedelta(hours=100 - i), 1, "click", float(i)) for i in range(40)
    ]
    _write_events(tmp_path, rows)
    out = p6_range_sharded_export(spark, str(tmp_path)).collect()[0]
    assert out["n_rows"] == 40
    assert out["n_sort_violations"] == 0
    assert out["n_range_overlaps"] == 0
    _roundtrip(spark, str(tmp_path), "p6_range_sharded_export")

    ev = (
        load_table(spark, str(tmp_path), "events")
        .where(F.col("ts").isNotNull())
        .select(F.unix_micros("ts").alias("t"), "event_id")
    )
    unsorted = ev.coalesce(1).mapInPandas(
        _p6_shard_audit,
        schema="n_rows long, n_viol long, min_t long, min_eid long, max_t long, max_eid long",
    )
    assert unsorted.collect()[0]["n_viol"] > 0


def test_p7_buckets_stay_whole_and_files_match_buckets(spark, tmp_path):
    """Fixed-boundary binning: every bucket appears in exactly one bin
    (bin = floor(rows_before / budget) — a straddling bucket stays whole
    in its start bin, the m5 rule), n_files equals n_buckets (the
    one-file-per-bucket layout invariant read back from _metadata), and
    rows are conserved. Expected bins hand-replayed with the same
    portable md5 bucketing."""
    import datetime as dt
    import hashlib
    import math

    from etl_pipeline_telecom_spark.plans.pipeline import (
        _P7_BINS,
        _P7_BUCKETS,
        p7_compaction_plan,
    )

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [(i, t0 + dt.timedelta(minutes=i), i % 3, "click", float(i)) for i in range(50)]
    _write_events(tmp_path, rows)

    counts: dict[int, int] = {}
    for i in range(50):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _P7_BUCKETS
        counts[b] = counts.get(b, 0) + 1
    budget = math.ceil(sum(counts.values()) / _P7_BINS)
    expected: dict[int, list[int, int]] = {}
    cum = 0
    for b in sorted(counts):
        bin_id = cum // budget
        agg = expected.setdefault(bin_id, [0, 0])
        agg[0] += 1
        agg[1] += counts[b]
        cum += counts[b]

    got = {
        r["bin_id"]: (r["n_buckets"], r["n_files"], r["n_rows"])
        for r in p7_compaction_plan(spark, str(tmp_path)).collect()
    }
    assert got == {k: (v[0], v[0], v[1]) for k, v in expected.items()}
    _roundtrip(spark, str(tmp_path), "p7_compaction_plan")


def test_dq7_gen1_rows_surface_new_column_as_null(spark, tmp_path):
    """mergeSchema contract on the two-generation layout: gen-1 rows all
    carry NULL quality_tier, gen-2 rows all carry a real value with the
    hi/lo split the staging rule implies; no rows lost either side."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    # even ids → gen1 (3 rows); odd ids → gen2 (values 75, 25, 99 → 2 hi 1 lo)
    rows = [
        (0, t0, 1, "click", 10.0),
        (1, t0, 1, "click", 75.0),
        (2, t0, 1, "click", 20.0),
        (3, t0, 1, "click", 25.0),
        (4, t0, 1, "click", 30.0),
        (5, t0, 1, "click", 99.0),
    ]
    _write_events(tmp_path, rows)
    from etl_pipeline_telecom_spark.plans.quality import dq7_schema_evolution

    got = {
        r["gen"]: (r["n_rows"], r["n_null_tier"], r["n_hi"], r["n_lo"])
        for r in dq7_schema_evolution(spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, 3, 0, 0), 2: (3, 0, 2, 1)}
    _roundtrip(spark, str(tmp_path), "dq7_schema_evolution")


def test_t20_classes_partition_text_and_flag_mixed_script(spark, tmp_path):
    """Hand-counted char classes on crafted unicode rows: latin+CJK doc
    flags as mixed; pure-CJK and pure-ascii docs don't; the five classes
    partition every doc exactly (other = total - rest)."""
    from etl_pipeline_telecom_spark.plans.text import t20_script_mix

    from .test_r7_ops import _write_docs_file

    texts = [
        "hello 世界 42",      # 5 latin, 2 digit, 2 space, 2 cjk, 0 other → mixed
        "漢字文化圏",          # 5 cjk
        "plain ascii only",  # 14 latin, 2 space
        "¿dónde? —",         # no cjk; ó/¿/— are 'other': 4 latin+, check below
    ]
    _write_docs_file(str(tmp_path), list(enumerate(texts)))
    row = t20_script_mix(spark, str(tmp_path)).collect()[0]
    # doc 0: latin=5 digit=2 space=2 cjk=2 other=0
    # doc 1: cjk=5
    # doc 2: latin=14 space=2
    # doc 3: "¿dónde? —" → latin d,n,d,e = 4... 'ó' is other; chars:
    #   ¿ d ó n d e ?   — = 9 chars: latin 4 (d,n,d,e), space 1, other 4
    assert (row["n_latin"], row["n_digit"], row["n_space"], row["n_cjk"]) == (
        23, 2, 5, 7,
    )
    assert row["n_other"] == 4
    assert row["n_mixed_script"] == 1
    assert row["n_docs"] == 4
    _roundtrip(spark, str(tmp_path), "t20_script_mix")


def test_sm8_replication_is_exact_per_source(spark, tmp_path):
    """n_rows_replicated must equal rep × n_docs and tok_replicated
    rep × tok_raw, with rep derived from the portable md5 rule —
    replayed in python per source."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.semistructured import (
        sm8_epoch_replication_mix,
    )

    rows = [
        (0, "one two three", "alpha"),
        (1, "four five", "alpha"),
        (2, "six", "beta"),
        (3, "seven eight nine ten", "gamma"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    def rep(src: str) -> int:
        return int(hashlib.md5(src.encode()).hexdigest()[:8], 16) % 3 + 1

    toks = {"alpha": 5, "beta": 1, "gamma": 4}
    docs = {"alpha": 2, "beta": 1, "gamma": 1}
    got = {
        r["source"]: (
            r["rep_factor"], r["n_docs"], r["n_rows_replicated"],
            r["tok_raw"], r["tok_replicated"],
        )
        for r in sm8_epoch_replication_mix(spark, str(tmp_path)).collect()
    }
    expected = {
        s: (rep(s), docs[s], rep(s) * docs[s], toks[s], rep(s) * toks[s])
        for s in docs
    }
    assert got == expected
    _roundtrip(spark, str(tmp_path), "sm8_epoch_replication_mix")


def test_dq8_event_split_leaks_user_split_does_not(spark, tmp_path):
    """A user with many events is all-but-guaranteed to straddle splits
    under the event-hash rule and CANNOT under the user-hash rule;
    expected values replayed exactly with the portable md5 buckets."""
    import datetime as dt
    import hashlib

    from etl_pipeline_telecom_spark.plans.quality import dq8_split_leakage

    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [(i, t0 + dt.timedelta(minutes=i), i % 4, "click", 1.0) for i in range(60)]
    _write_events(tmp_path, rows)

    def bucket(v) -> int:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 100

    def split(b) -> str:
        return "train" if b < 80 else ("val" if b < 90 else "test")

    by_user_of = {}
    masses = {"by_event": {"train": 0, "val": 0, "test": 0},
              "by_user": {"train": 0, "val": 0, "test": 0}}
    for i in range(60):
        se, su = split(bucket(i)), split(bucket(i % 4))
        masses["by_event"][se] += 1
        masses["by_user"][su] += 1
        by_user_of.setdefault(i % 4, set()).add(se)
    n_leak_event = sum(1 for s in by_user_of.values() if len(s) > 1)
    got = {
        r["split_mode"]: (r["n_train"], r["n_val"], r["n_test"], r["n_leaking_users"])
        for r in dq8_split_leakage(spark, str(tmp_path)).collect()
    }
    m = masses["by_event"]
    assert got["by_event"] == (m["train"], m["val"], m["test"], n_leak_event)
    assert n_leak_event > 0  # the crafted case actually exercises leakage
    m = masses["by_user"]
    assert got["by_user"] == (m["train"], m["val"], m["test"], 0)
    _roundtrip(spark, str(tmp_path), "dq8_split_leakage")


def _write_embeddings(d, vecs: dict[int, list[float]], label: int = 0) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(sorted(vecs), pa.int64()),
                "embedding": pa.array(
                    [vecs[k] for k in sorted(vecs)], pa.list_(pa.float32())
                ),
                "label": pa.array([label] * len(vecs), pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )


def test_v11_prefix_prune_keeps_and_misses_by_design(spark, tmp_path):
    """Crafted 64-dim vectors around query 0 (= e0 on the prefix dims):
    nine decoys score high on the PREFIX but low on the full vector; one
    'hidden gem' matches the query perfectly on dims 16-63 but is
    orthogonal on the prefix — stage 1 (top-8 coarse) must PRUNE it, and
    the survivors re-rank by exact full cosine. That asymmetry (decoy
    kept and re-ranked, gem missed) is precisely the matryoshka
    trade-off the operator implements."""
    from etl_pipeline_telecom_spark.plans.similarity import v11_matryoshka_refine

    def vec(prefix_val, tail_val, hot=0):
        v = [0.0] * 64
        v[hot] = prefix_val
        for i in range(16, 64):
            v[i] = tail_val
        return v

    vecs = {0: vec(1.0, 0.0)}  # the query: e_hot, empty tail
    # 9 decoys: strong on the query's prefix dim, noisy tails of
    # DIFFERENT magnitude so full-cosine re-ranking reorders them
    for i in range(1, 10):
        vecs[100 + i] = vec(1.0, 0.01 * i)
    # the hidden gem: zero on the prefix, identical tail — unreachable
    # through a 16-dim coarse score
    vecs[500] = vec(0.0, 1.0)
    _write_embeddings(tmp_path, vecs)

    out = v11_matryoshka_refine(spark, str(tmp_path)).collect()
    mine = sorted(
        ((r["rn"], r["neighbor_id"]) for r in out if r["query_id"] == 0)
    )
    got_ids = [nid for _, nid in mine]
    assert 500 not in got_ids, "prefix pruning should miss the prefix-orthogonal gem"
    # exact full cosine prefers the SMALLEST tail noise among the decoys
    assert got_ids == [101, 102, 103]
    _roundtrip(spark, str(tmp_path), "v11_matryoshka_refine")


def _write_orders_lineitem(d, orders_rows, lineitem_rows) -> None:
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
                "o_custkey": pa.array([1] * len(orders_rows), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(orders_rows), pa.string()),
                "o_totalprice": pa.array([0.0] * len(orders_rows), pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in orders_rows],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array([r[2] for r in orders_rows], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lineitem_rows], pa.int64()),
                "l_extendedprice": pa.array([r[1] for r in lineitem_rows], pa.float64()),
                "l_discount": pa.array([r[2] for r in lineitem_rows], pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )


def test_j10_bloom_is_invisible_and_actually_prunes(spark, tmp_path):
    """Crafted orders: two urgent pre-cutoff (selected), one urgent
    post-cutoff and one low-priority (not selected). The bloom prune
    must keep EXACTLY the matching lineitem rows (3 selected keys in an
    8M-bit sketch → FP odds are nil), and the final aggregate equals the
    plain-join oracle — the bloom is semantically invisible."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans.dedup import (
        _build_bloom,
        bloom_might_contain_udf,
    )
    from etl_pipeline_telecom_spark.plans.joins import j10_bloom_pruned_join
    from etl_pipeline_telecom_spark.sources import load_table

    orders = [
        (1, "1995-01-10", "1-URGENT"),
        (2, "1995-02-20", "1-URGENT"),
        (3, "1997-05-05", "1-URGENT"),   # post-cutoff → excluded
        (4, "1995-01-15", "5-LOW"),      # wrong priority → excluded
    ]
    lineitem = [
        (1, 100.0, 0.10),
        (1, 50.0, 0.00),
        (2, 200.0, 0.25),
        (3, 999.0, 0.00),
        (4, 999.0, 0.00),
    ]
    _write_orders_lineitem(tmp_path, orders, lineitem)
    got = {
        str(r["order_date"]): (r["n_items"], r["revenue"])
        for r in j10_bloom_pruned_join(spark, str(tmp_path)).collect()
    }
    assert got == {
        "1995-01-10": (2, 100.0 * 0.90 + 50.0),
        "1995-02-20": (1, 200.0 * 0.75),
    }
    # the prune really drops the non-selected keys before the join
    sel_keys = load_table(spark, str(tmp_path), "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    bloom = _build_bloom(sel_keys.select(F.xxhash64("o_orderkey").alias("h")))
    probe = bloom_might_contain_udf(spark, bloom)
    pruned_n = (
        load_table(spark, str(tmp_path), "lineitem")
        .where(probe(F.xxhash64("l_orderkey")))
        .count()
    )
    assert pruned_n == 3  # rows of keys 1 and 2 only
    _roundtrip(spark, str(tmp_path), "j10_bloom_pruned_join")


def test_d17_transitive_near_dups_collapse_into_one_cluster(spark, tmp_path):
    """A~B and B~C above the 0.4 cosine threshold while A~C is NEGATIVE:
    the cluster must still be {A, B, C} (transitive collapse — the thing
    pair output alone cannot express), canonical = min id. Vectors are
    built in a 2-dim plane whose two dims carry IDENTICAL sign columns
    across all 8 LSH hyperplanes, so all three land in one bucket:
    at 0°, 60° and 120°, every plane dot keeps one consistent sign
    (|0.866·p_j| > |0.5·p_i|). A fourth orthogonal vector shares no
    qualifying pair and must not appear."""
    from etl_pipeline_telecom_spark.plans.pipeline import d17_semantic_dedup
    from etl_pipeline_telecom_spark.plans.similarity import _HYPERPLANES

    pair = next(
        (i, j)
        for i in range(64)
        for j in range(i + 1, 64)
        if all(p[i] == p[j] for p in _HYPERPLANES)
    )
    i, j = pair

    def vec(ci: float, cj: float, extra_dim: int | None = None) -> list[float]:
        v = [0.0] * 64
        v[i], v[j] = ci, cj
        if extra_dim is not None:
            v = [0.0] * 64
            v[extra_dim] = 1.0
        return v

    k_other = next(k for k in range(64) if k not in (i, j))
    vecs = {
        20: vec(1.0, 0.0),        # A (0°)
        21: vec(0.5, 0.866),      # B (60°): cos(A,B) ≈ 0.5
        22: vec(-0.5, 0.866),     # C (120°): cos(B,C) ≈ 0.5, cos(A,C) ≈ -0.5
        23: vec(0, 0, extra_dim=k_other),  # unrelated direction
    }
    _write_embeddings(tmp_path, vecs)
    rows = d17_semantic_dedup(spark, str(tmp_path)).collect()
    got = {
        r["canonical_vec_id"]: (r["n_members"], r["n_removed"], r["max_member_id"])
        for r in rows
    }
    assert got == {20: (3, 2, 22)}
    _roundtrip(spark, str(tmp_path), "d17_semantic_dedup")


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-4, max_value=4),  # 4 meaningful dims
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
        ),
        min_size=3,
        max_size=14,
        unique=True,
    )
)
def test_v11_two_stage_matches_python_replay(spark, tmp_path_factory, coords):
    """Arbitrary vector sets: v11's two-stage result equals a pure-python
    stage-wise replay (prefix-dot top-8 with (score desc, id) tie-break,
    then exact full cosine top-3) — the pruning, tie-breaks, and rounding
    all reproduced independently."""
    import math

    from etl_pipeline_telecom_spark.plans.similarity import (
        _V11_COARSE_K,
        _V11_FINAL_K,
        _V11_PREFIX,
        v11_matryoshka_refine,
    )

    d = tmp_path_factory.mktemp("v11prop")
    # vec 0 is the only query (vec_id < 10); others are candidates.
    # dims 0,1 live in the prefix; dims 30,31 beyond it.
    vecs = {}
    for idx, (a, b, c, e) in enumerate(coords):
        v = [0.0] * 64
        v[0], v[1], v[30], v[31] = float(a), float(b), float(c), float(e)
        if not any(v):
            v[5] = 1.0  # zero vector would make cosine undefined
        vecs[0 if idx == 0 else 100 + idx] = v
    _write_embeddings(d, vecs)

    q = [round(x * 1000) for x in vecs[0]]
    cands = {k: [round(x * 1000) for x in v] for k, v in vecs.items() if k != 0}
    coarse = sorted(
        cands,
        key=lambda k: (-sum(q[i] * cands[k][i] for i in range(_V11_PREFIX)), k),
    )[:_V11_COARSE_K]

    def cos(k):
        dot = sum(q[i] * cands[k][i] for i in range(64))
        nq = math.sqrt(sum(x * x for x in q))
        nk = math.sqrt(sum(x * x for x in cands[k]))
        return dot / (nq * nk)

    final = sorted(coarse, key=lambda k: (-cos(k), k))[:_V11_FINAL_K]
    expected = {(0, k, r + 1) for r, k in enumerate(final)}

    got = {
        (r["query_id"], r["neighbor_id"], r["rn"])
        for r in v11_matryoshka_refine(spark, str(d)).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10 * 86_400),  # offset seconds
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_p6_export_audits_clean_on_arbitrary_event_sets(spark, tmp_path_factory, offs):
    """Any event set: the range-sharded export must audit to zero sort
    violations and zero range overlaps with exact row conservation —
    the layout invariants hold regardless of key distribution."""
    from etl_pipeline_telecom_spark.plans.pipeline import p6_range_sharded_export

    d = tmp_path_factory.mktemp("p6prop")
    t0 = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(seconds=off), 1, "click", 0.0)
        for i, off in enumerate(offs)
    ]
    _write_events(d, rows)
    out = p6_range_sharded_export(spark, str(d)).collect()[0]
    assert out["n_rows"] == len(offs)
    # shard-count law (ADVICE r8): unique keys + fully-sampled input →
    # exactly one shard per distinct key up to the 16 target, so the
    # oracle's LEAST(16, n) pin is asserted here, not skipped
    assert out["n_shards"] == min(16, len(offs))
    assert out["n_sort_violations"] == 0
    assert out["n_range_overlaps"] == 0


def _python_bpe_batched(word_freqs: dict[str, int], n_rounds: int, k: int):
    """Reference replay of t21's batched semantics: per round, top-k
    candidates from one count snapshot (freq DESC, pair lexicographic),
    keep candidates symbol-disjoint from ALL higher-ranked candidates,
    apply the kept set in one left-to-right pass (equivalent to the
    per-pair run-parity because matches of disjoint pairs are never
    adjacent)."""
    seqs = {w: list(w) for w in word_freqs}
    out = []
    for r in range(1, n_rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        cands = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        kept = []
        for i, ((a, b), f) in enumerate(cands):
            higher = {s for (ha, hb), _ in cands[:i] for s in (ha, hb)}
            if a not in higher and b not in higher:
                kept.append((i + 1, a, b, f))
        out += [(r, rk, a, b, f) for rk, a, b, f in kept]
        pairs = {(a, b) for _, a, b, _ in kept}
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in pairs:
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_t21_batched_bpe_matches_reference_on_random_vocab(
    spark, tmp_path_factory, words
):
    """Arbitrary tiny vocabularies over a 3-letter alphabet (maximal
    symbol sharing → the conflict filter fires constantly): t21's merge
    table must equal the pure-python batched reference exactly —
    round, candidate rank, pair, and snapshot frequency."""
    import re

    from etl_pipeline_telecom_spark.plans.text import (
        _BPE_PATTERN,
        _T21_K,
        _T21_ROUNDS,
        t21_bpe_batched_merges,
    )

    from .test_r7_ops import _write_docs_file

    d = tmp_path_factory.mktemp("t21prop")
    text = " ".join(words)
    _write_docs_file(str(d), [(0, text)])

    freqs: dict[str, int] = {}
    for tok in re.findall(_BPE_PATTERN, text.lower()):
        freqs[tok] = freqs.get(tok, 0) + 1

    expected = sorted(_python_bpe_batched(freqs, _T21_ROUNDS, _T21_K))
    got = sorted(
        (r["round"], r["cand_rank"], r["merge_left"], r["merge_right"], r["pair_freq"])
        for r in t21_bpe_batched_merges(spark, str(d)).collect()
    )
    assert got == expected


def test_t21_conflict_filter_defers_and_batches(spark, tmp_path):
    """Hand-verified trace on a crafted corpus. Pretokens keep their
    leading space (GPT-2 pattern), so ' ' is a symbol every
    space-prefixed pair shares — the conflict filter consequently
    admits only (a,b) in round 1 and DEFERS every space pair; the
    deferred (' ', 'ab') wins round 2 over the merged alphabet; and
    round 4 applies TWO disjoint pairs at once ((' b','c') and
    (' ','x')) — the batching payoff. Snapshot counts per round are
    hand-checked: e.g. round 1 sees (a,b)=6 from ' ab'×5 + 'ab'×1."""
    from etl_pipeline_telecom_spark.plans.text import t21_bpe_batched_merges

    from .test_r7_ops import _write_docs_file

    text = " ".join(["ab"] * 6 + ["bc"] * 5 + ["xy"] * 4)
    _write_docs_file(str(tmp_path), [(0, text)])
    rows = sorted(
        (r["round"], r["cand_rank"], r["merge_left"], r["merge_right"], r["pair_freq"])
        for r in t21_bpe_batched_merges(spark, str(tmp_path)).collect()
    )
    assert rows == [
        (1, 1, "a", "b", 6),      # interior pair; all space pairs deferred
        (2, 1, " ", "ab", 5),     # deferred space pair wins next round
        (3, 1, " ", "b", 5),
        (4, 1, " b", "c", 5),     # two DISJOINT pairs apply together
        (4, 2, " ", "x", 4),
    ]
    _roundtrip(spark, str(tmp_path), "t21_bpe_batched_merges")


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab1 .世界é\t", min_size=1, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_t20_counts_match_python_replay_on_random_unicode(
    spark, tmp_path_factory, texts
):
    """Random strings over a mixed alphabet (latin, digit, space, tab,
    CJK, accented, punctuation): every class count and the mixed-script
    flag must equal an independent python replay — and the five classes
    must partition each text exactly."""
    from etl_pipeline_telecom_spark.plans.text import t20_script_mix

    from .test_r7_ops import _write_docs_file

    d = tmp_path_factory.mktemp("t20prop")
    _write_docs_file(str(d), list(enumerate(texts)))

    def classes(t: str):
        lat = sum(1 for c in t if "a" <= c.lower() <= "z" and c.isascii())
        dig = sum(1 for c in t if c.isascii() and c.isdigit())
        spc = sum(1 for c in t if c in " \t\n\r\f\v")
        cjk = sum(1 for c in t if "一" <= c <= "鿿")
        oth = len(t) - lat - dig - spc - cjk
        return lat, dig, spc, cjk, oth

    per = [classes(t) for t in texts]
    exp = tuple(sum(x) for x in zip(*per))
    n_mixed = sum(1 for lat, _d, _s, cjk, _o in per if lat > 0 and cjk > 0)

    row = t20_script_mix(spark, str(d)).collect()[0]
    got = (row["n_latin"], row["n_digit"], row["n_space"], row["n_cjk"], row["n_other"])
    assert got == exp
    assert row["n_mixed_script"] == n_mixed
    assert row["n_docs"] == len(texts)


def test_s5_bag_multiplicities_are_min_and_saturating_difference(spark, tmp_path):
    """Crafted duplicate counts: key 1 appears F×3 / O×1 → intersect 1,
    except 2; key 2 F×2 / O×5 → intersect 2, except absent (saturates at
    0); key 3 F-only ×2 → except 2; key 4 O-only → appears nowhere."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark.plans.setops import s5_bag_setops

    custkeys = [1] * 3 + [2] * 2 + [3] * 2 + [1] * 1 + [2] * 5 + [4] * 1
    statuses = ["F"] * 7 + ["O"] * 7
    n = len(custkeys)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array(custkeys, pa.int64()),
                "o_orderstatus": pa.array(statuses, pa.string()),
                "o_totalprice": pa.array([0.0] * n, pa.float64()),
                "o_orderdate": pa.array(
                    [dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = {
        (r["op"], r["o_custkey"]): r["cnt"]
        for r in s5_bag_setops(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("intersect_all", 1): 1,
        ("intersect_all", 2): 2,
        ("except_all", 1): 2,
        ("except_all", 3): 2,
    }
    _roundtrip(spark, str(tmp_path), "s5_bag_setops")

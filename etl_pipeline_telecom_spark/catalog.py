"""Query catalog: every implemented operator, with its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) needs ``queries()`` →
callables and ``oracle_sql()`` → equivalent ANSI SQL. This module is the
single registry both are generated from; plan modules under ``plans/``
call :func:`register` at import time.

Oracle-hash discipline (the driver compares order-insensitive value
hashes, so floating-point results must be bit-identical between Spark and
DuckDB):

- **Sums of doubles are NOT reproducible across engines** (different
  accumulation order). Monetary columns are summed as ``DECIMAL(18,2)``
  (exact in both engines) and the final value cast to double.
- **Averages**: exact decimal sum ÷ count, divided as doubles — the same
  two operands in both engines → identical IEEE result — then rounded.
- Every computed column is aliased identically in the Spark plan and the
  SQL (driver hashes sort columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → driver's weaker rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, *, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def dec_sum(col: Column | str, alias: str, *, scale: str = "decimal(18,2)") -> Column:
    """Oracle-safe sum: exact decimal accumulation, final cast to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str, *, ndigits: int = 6, scale: str = "decimal(18,2)") -> Column:
    """Oracle-safe average: exact decimal sum ÷ count as one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(scale)).cast("double") / F.count(F.lit(1)), ndigits).alias(alias)


def sql_dec_sum(expr: str, alias: str, *, scale: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str, *, ndigits: int = 6, scale: str = "DECIMAL(18,2)") -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) / COUNT(*), {ndigits}) AS {alias}"


def _load_all_plans() -> None:
    """Import every plan module (each registers its queries on import)."""
    from .plans import (  # noqa: F401
        parity_aggregates,
        parity_transform,
        joins,
        windows,
        setops,
        text,
        dedup,
        similarity,
        eventtime,
        streaming,
        multimodal,
        quality,
        sketches,
        semistructured,
        pipeline,
        reshape,
    )


# The driver's CORRECTNESS gate verifies only the FIRST 50 entries of
# ``queries()``. Rounds 1+2 put a verdict on the entire catalog
# (CORRECTNESS_r01 + r02); round 3 re-proved its new/changed entries plus
# canaries (CORRECTNESS_r03 — zero red rows). Round 4 keeps the window
# rule (anything NEW or with a CHANGED plan sits in that round's window)
# with these rotations: IN — d12_index_build (new; the build/probe split),
# e4_asof_join (plan rewritten to the linear union+window form),
# t9_tfidf_topterms (vocab-side broadcast hint dropped per ADVICE r3),
# v1_knn_brute (bounded-query guard added to the plan),
# d12_persisted_lsh_probe (now probe-only when the index exists), and
# v4/v5/v6 (tiled _gemm_pairs; v5 additionally has new hyperplane
# literals in both plan and oracle — the r4 OOM fix). The ten
# mid-round-4 additions — t10_bpe_pretokenize, e6_gap_fill,
# p2_upsert_latest, sm3_split_assign, v8_embedding_decontam,
# e7_cohort_retention, w9_ntile_buckets, a18_exact_corr,
# t11_bigram_topk, st5_stream_static_join — are new (no verdict yet) and
# displace ten r3-proven unchanged entries (d9_mllib_minhash,
# e5_band_range_join, m2_frame_sample, a16_freq_items,
# r2_orders_by_month, d6_simhash, d8_neardup_clusters,
# a14_approx_distinct, sm2_stratified_sample, u1_pandas_udf_score;
# d12_index_build already displaced p1_projection_ops). Everything else
# keeps its r1-r3 verdict; this tuple is the explicit, test-asserted
# window.
#
# Round 5: the window rule is now enforced AUTOMATICALLY — every query
# whose normalized optimized-plan hash drifts from PLAN_BASELINE.json
# (the plans as of the last zero-fail full sweep) must appear here
# (tests/test_plan_manifest.py). r5 rotations: IN — a14/a16 (rows-only →
# bound-check oracle forms), st3 (sentinel-replay oracle; already in).
# OUT — a8_pivot_rate, a11_null_counts (r4-green, plans unchanged).
#
# Round 6 rotations: IN — the four new entries (d15 deletion-
# neighborhood linkage, m4 media-blob dedup, st7 streamed bloom refresh,
# st8 centroid drift), t12 (bin arithmetic switched to integer div) and
# d13 (probe half extracted into a shared helper) stay in; st1–st6
# remain in because the streaming-module source hash covers every st*
# entry and streaming/jobs.py changed. OUT — a15_percentile_approx,
# a17_grouped_percentiles, sm3_split_assign, e7_cohort_retention
# (r5-in-window green, plans unchanged this round).
#
# Mid-round-6 additions: IN — t13_line_dedup (corpus boilerplate-line
# dedup), d16_ngram_overlap (per-doc contamination fraction),
# a20_hll_union (mergeable-sketch rollup), sm5_temperature_mix
# (multilingual temperature resampling), t14_cdc_chunks (content-defined
# chunking), t16_unigram_rarity (unigram-LM quality scoring),
# v9_ann_recall_eval (IVF recall graded vs exact top-k),
# e10_time_weighted_avg (LOCF integral over irregular samples),
# dq4_distribution_drift (chi-square histogram drift monitor),
# sm6_fixed_k_per_group (exact-k balanced sampling),
# st9_stream_drift_monitor (streaming twin of dq4; displaces
# a19_grouped_regression, r5-green unchanged),
# j8_temporal_snapshot_join (point-in-time SCD-2 lookup via the linear
# union+window shape; displaces dq3_outlier_bands, r5-green unchanged),
# a21_poisson_bootstrap (deterministic scalable bootstrap SE; displaces
# j6_star_join — its r2 plan rewrite finally got in-window verdicts in
# r5 AND this round's full sweeps) — all new, first driver verdict
# needed. OUT — a14_approx_distinct, a16_freq_items
# (graduated forms in-window green r5, plans unchanged),
# w9_ntile_buckets, sm4_weighted_sample, t10_bpe_pretokenize,
# t11_bigram_topk, e6_gap_fill, e9_windowed_funnel,
# d14_fuzzy_name_pairs, a18_exact_corr (r5-in-window green, plans
# unchanged this round).
#
# Round 7 rotations: IN — t15_bpe_merges (new: the actual BPE training
# loop), d9_mllib_minhash and d12_index_build (graduated from rows-only
# to oracle-backed — plan AND oracle changed), d8_neardup_clusters
# (min-label propagation rewritten as alternating large-star/small-star),
# d10_contamination_check and d13_contamination_bloom (optimized-plan
# hash drifted via the shared shingle-cache plan after the dedup-module
# edits; semantics untouched, but drift means re-verdict; d16 and v7
# drifted the same way and stay/remain in). dq4/st9/t13/a21 stay in
# (ADVICE r6 guards changed their plans). OUT — a20_hll_union,
# sm5_temperature_mix, sm6_fixed_k_per_group (first verdicts green in
# r6, plans unchanged this round) and st2_stream_dedup (green r1-r6;
# streaming module untouched this round, so its source-hash coverage is
# unchanged).
#
# Mid-round-7 additions: IN — w10_rolling_stats (ROWS-frame rolling
# stats), e11_max_concurrency (sweep-line interval overlap),
# dq5_freshness (staleness + day-coverage monitor), t19_gopher_flags
# (Gopher rule filter), t18_pii_scrub (PII redaction with byte-exact
# redacted-output oracle), p4_cdc_apply (changelog apply with delete
# tombstones), a22_countmin_heavy_hitters (exact-replay count-min
# sketch) — all new, first driver verdict needed. OUT —
# st7_stream_bloom_refresh, st8_stream_centroid_drift,
# d15_fuzzy_indel_pairs, m4_media_exact_dedup, t14_cdc_chunks,
# t16_unigram_rarity, e10_time_weighted_avg (first verdicts green in
# the r6 driver window — CORRECTNESS_r06 — and their plans are
# unchanged this round per PLAN_MANIFEST; v9_ann_recall_eval STAYS in —
# its plan drifted with the r7 similarity-module edits). Second batch:
# IN — t17_bpe_encode (corpus encode over t15's learned vocabulary; the
# t15 body was refactored into the shared _bpe_train helper, so t15's
# plan-hash coverage extends to it) and sm7_token_budget_cut (hard
# per-language token-budget prefix cut). OUT — j8_temporal_snapshot_join
# (first verdict green r6, plan unchanged) and e8_funnel_steps
# (r5-verdict green, plan unchanged).
#
# Third mid-r7 batch: IN — j9_interval_bucket_join (fact-to-fact bucketed
# range join), g2_throttle_debounce (applyInPandas greedy throttle with a
# recursive-CTE oracle), a23_histogram_quantiles (mergeable binned
# quantile path), st10_stream_cdc_apply (stateful streaming CDC apply,
# p4's oracle) — all new. st2/st7/st8 REJOIN: the streaming-module source
# hash covers every st* entry and streaming/stateful.py + plans/
# streaming.py changed (st10), so the whole st cohort re-verdicts. OUT —
# e4_asof_join, t9_tfidf_topterms (r4-verdict green, unchanged),
# pipe2_ingest_gate, p2_upsert_latest, p3_scd2_intervals (r5-verdict
# green, unchanged), t12_pack_sequences, e3b_session_window_skewfree
# (r6-verdict green, unchanged).
#
# Fourth mid-r7 batch: IN — m5_shard_manifest (byte-budget blob shards),
# dq6_referential_integrity (FK orphan + childless-parent audit),
# w11_value_window_ops (first/last/nth_value), a24_decayed_counts
# (integer-exact exponential decay), x3_json_schema_audit (typed
# from_json parse audit with corrupt-record detection) — all new. OUT —
# e1_tumbling_window, e3_session_window, m1_media_features,
# dq1_lineitem_checks, v3_label_centroids (r1-proven verdicts, plans
# unchanged; e1/e3's shared oracles stay exercised through in-window
# st1/st3).
#
# Fifth mid-r7 batch: IN — r3_pivot_latest_value (long→wide latest-value
# pivot), x4_jsonl_source_scan (JSONL source round-trip vs the parquet
# oracle), v10_sq8_ann_recall (int8 scalar-quantized search graded by
# recall) — all new. OUT — v2_knn_partitioned, v4_embedding_neardup,
# v6_gemm_neardup (r4-verdict green, plans unchanged this round per
# PLAN_MANIFEST).
#
# Sixth mid-r7 batch: IN — pipe3_dataset_card (per-language release
# audit in long format), p5_partitioned_sink_audit (date-partitioned
# parquet sink read back through a pruned scan, the K-family write
# surface) — both new. OUT — v1_knn_brute, v5_lsh_bucketed_neardup
# (r4-verdict green, plans unchanged this round per PLAN_MANIFEST).
#
# Round 8 rotations: IN — g2b_throttle_skewfree (new: the (user, month)
# pre-split throttle, VERDICT r7 item 3; bit-identical to g2, same
# oracle). t15/t17 STAY in (BPE depth parameterization, VERDICT r7
# item 4, changes their plans). OUT — d9_mllib_minhash (graduated
# oracle form's first verdict green in r7, plan unchanged this round).
#
# Mid-round-8 additions: IN — p6_range_sharded_export (globally-sorted
# range-sharded export with a physical-layout self-audit),
# p7_compaction_plan (small-file compaction planning over a real
# bucketed layout via _metadata), dq7_schema_evolution (mergeSchema
# two-generation read audit) — all new, first driver verdict needed.
# OUT — d10_contamination_check, d16_ngram_overlap (r7 shared-plan
# drift cohort, verdicts green, plans now pinned under the build-order-
# invariant r8 baseline), a21_poisson_bootstrap (green r6 AND r7,
# unchanged).
#
# Second mid-r8 batch: IN — t20_script_mix (unicode char-class
# profile), sm8_epoch_replication_mix (per-domain epoch upsampling),
# dq8_split_leakage (entity-leakage split audit), v11_matryoshka_refine
# (two-stage prefix-dim ANN refine) — all new, first driver verdict
# needed. OUT — w10_rolling_stats, e11_max_concurrency, dq5_freshness,
# t19_gopher_flags (first verdicts green in r7, plans unchanged this
# round per the build-order-invariant manifest).
#
# Third mid-r8 batch: IN — st11_stream_throttle (new: g2's streaming
# twin with a PROVABLY-exact state TTL; the streaming-module source
# hash changed, so the full st cohort re-verdicts — st1-st10 were
# already in). OUT — m5_shard_manifest (first verdict green r7, plan
# unchanged this round).
#
# Sixth mid-r8 batch: IN — s5_bag_setops (INTERSECT ALL / EXCEPT ALL
# bag semantics — the multiplicity-sensitive variants the distinct
# forms collapse). OUT — dq6_referential_integrity (first verdict green
# r7, plan unchanged).
#
# Fifth mid-r8 batch: IN — t21_bpe_batched_merges (batched BPE
# training: top-K conflict-free merges per round — the real-32k cost
# model, closing the r7 verdict's last standing nit concretely). OUT —
# pipe3_dataset_card (first verdict green r7, plan unchanged).
#
# Fourth mid-r8 batch: IN — j10_bloom_pruned_join (runtime-filter
# join: d13's distributed bloom prunes the fact scan before the
# shuffle; plain join is the oracle), d17_semantic_dedup (embedding
# near-dup clusters via star-alternation CC over v5's pairs, d8's
# recursive-CTE oracle pattern) — both new. d13 stays in (the shared
# bloom probe was extracted into bloom_might_contain_udf). OUT —
# r3_pivot_latest_value, x4_jsonl_source_scan (first verdicts green in
# r7, plans unchanged this round).
# Round 9: the rotation discipline is now a WRITTEN, TEST-ASSERTED
# GUARANTEE (VERDICT r8 item 7), not dated comments alone. Policy file:
# window_history.json (same package dir) records, for every catalog
# query, the last round whose driver window included it (reconstructed
# from the git history of this tuple, r2-r9), plus the guarantee
# parameters: ROTATION_K = 5 — every query receives a driver verdict at
# least every 5 rounds (50 slots × 5 rounds = 250 ≥ catalog size with
# churn headroom) — enforced by tests/test_catalog_meta.py from round 12
# onward; rounds 9-11 are the recorded catch-up schedule that drains the
# pre-policy backlog (55 ≥5-rounds-stale entering r9 → 46 after r9 →
# 33 after this round's window; the backlog map must shrink every round
# and the test asserts it). The r11→r12 path: r11's fill drains the
# stalest ~42 of the remaining lw≤6 cohort, r12's own window (the
# staleness check runs AFTER its stamping) absorbs the last lw≤6
# stragglers plus the lw=7 cohort — both within 50 slots.
# Window construction rule, also asserted: new/changed queries first
# (plan-manifest drift + oracle-text changes), then the least-recently-
# windowed remainder, oldest cohort first — no slot is spent on an
# unchanged query that has a fresher verdict than any excluded one
# except through the drift cohort.
#
# Round 11 rotations (the r10-verdict drain tranche — the hard
# obligation before enforcement starts at r12): IN — the 7 new ops
# (t28/d21/sm10/p11/m10/t29/m11) and the 43 stalest fills: the ENTIRE
# lw=3/4/5 cohorts (5+12+16) plus the first 10 of the 27-query lw=6
# cohort, name-ordered. OUT — everything r7+-green with unchanged
# plans and oracles, including the full r10 window (the 7 r10 ops, the
# st cohort — no streaming-module source change this round — and m6).
# The 17 lw=6 stragglers left behind (m1/m4/p2/p3/pipe2/sm5/sm6/t12/
# t14/t16/t9/v1-v6 tail) drain in r12's own window together with the
# 13 lw=7 entries — 30 of its 50 slots, inside budget.
#
# Round 12 rotations (ENFORCEMENT ROUND — test_rotation_staleness_bound_
# enforced is live from this round): IN — the 6 new ops (t30/m12/v15/
# sm11/pipe4, plus dq9 added late in the round) and 44 stalest fills:
# the ENTIRE lw=6 remainder (17, the r11 verdict's named obligation) +
# the ENTIRE lw=7 cohort (13) + the first 14 of the 38-query lw=8
# cohort, name-ordered (dq9's drift slot displaced the 15th,
# g2_throttle_debounce, which stays lw=8 — 4 rounds stale, inside the
# K=5 bound). That drains the backlog to ZERO (backlog map: 17 → 0)
# and leaves the oldest excluded cohort at lw=8. OUT — everything
# r8+-green with unchanged plans and oracles, including the full r11
# window.
#
# r12 POLICY GENERALIZATION (the NOTES_r12 forward flag, resolved in
# round): the feasibility law is now written in its schedulability form
# 50·K ≥ N + 8·K — the original "+40 churn headroom" was the 8-slot
# per-round drift budget × K=5 in disguise. K stays the MINIMAL bound
# the window can guarantee: K = max(5, ceil(N/42)), self-describing in
# window_history.json (k_rule) and asserted by test_catalog_meta, so
# the catalog can grow past 210 (K becomes 6 at 211, covering up to
# 252) without ad-hoc constant surgery, and K can never be loosened as
# a convenience dial.
# Round 13 rotations (K rises 5 → 6 exactly as the k_rule prescribes:
# the registry crossed 210, and ceil(N/42) now binds — no constant
# surgery, the r12 generalization paying off). IN — the new r13
# operators (the drift cohort, recorded per-round in
# window_history.json's "drift" map and capped at 8 by
# test_rotation_drift_cohort_within_budget, ADVICE r12 item 2), then
# the stalest fill: the ENTIRE lw=8 remainder (24, incl.
# g2_throttle_debounce — the r12 displacement repaid) and the first
# name-ordered slice of the 36-query lw=9 cohort. OUT — everything
# r10+-green with unchanged plans and oracles, including the full r12
# window. The lw=9 remainder is 4 rounds stale, inside the K=6 bound,
# and drains across r14-r15.
#
# Round 14 rotations: IN — the four new r14 operators (t32 Kneser–Ney,
# sm13 DSIR resampling, v17 filtered ANN, p12 snapshot read — the drift
# cohort), then the stalest fill: the ENTIRE lw=9 remainder (15 — the
# r13 verdict's named obligation, drained one round ahead of the K=6
# deadline) and the first 31 name-ordered of the 50-query lw=10 cohort
# (which happens to include the full 13-entry st* streaming cohort).
# OUT — everything r11+-green with unchanged plans and oracles,
# including the full r13 window. backlog[14] = 0; the lw=10 remainder
# (19) is 4 rounds stale at r14 close and drains in r15, inside K=6.
#
# Round 15 rotations: IN — the five new r15 operators (d22 span-removal
# dedup, sm14 DoReMi mixture weights, p13 snapshot diff, p14 incremental
# MV maintenance, t33 perplexity bucketing) plus one plan-drift
# re-verdict (p12 — staged-layout cache-key literal changed with the
# driver's mid-round testdata regeneration; see the in-window comment)
# — the 6-slot drift cohort — then the stalest fill: the ENTIRE lw=10
# remainder (19 — the r14 verdict's named obligation, item 3, drained
# exactly at the K=6 deadline) and the first 25 name-ordered of the
# 50-query lw=11 cohort. OUT — everything r12+-green with unchanged
# plans and oracles, including the full r14 window. backlog[15] = 0; the
# lw=11 remainder (25) is 4 rounds stale at r15 close and drains across
# r16-r17, inside K=6. Built by .scratch/build_window_r15.py from the
# pristine r14 stamps (commit d5a08bc); p14/t33/p12 joined the drift
# cohort mid-round, displacing the last three name-ordered lw=11 fills
# (j8_temporal_snapshot_join, j6_star_join, g1_grouped_median — stamps
# reverted to 11).
DRIVER_WINDOW = (
    # --- drift cohort (MUST re-verdict): the new r15 operators
    "d22_span_removal_dedup",
    "sm14_doremi_mixture",
    "p13_snapshot_diff",
    "p14_incremental_mv",
    "t33_perplexity_buckets",
    # plan-drift re-verdict: p12's optimized plan embeds the p11 staged-
    # layout cache key (bare dirname in a Contains literal); the driver's
    # mid-round testdata regeneration changed the key, so the recorded
    # hash legitimately differs from PLAN_BASELINE — the window rule
    # sends it back for a driver verdict (normalizer now masks the key)
    "p12_snapshot_read",
    # --- stalest-first fill (rotation guarantee, window_history.json):
    # lw=10 (all 19 — the r14 verdict's named obligation)
    "st9_stream_drift_monitor",
    "t1_token_stats",
    "t25_langid_train",
    "t26_wordpiece_train",
    "t27_wordpiece_encode",
    "t2_quality_score",
    "t3_langid",
    "t4_fingerprint",
    "t5_top_words_per_lang",
    "v14_ivf_pq_recall",
    "w1_rank_topk_per_group",
    "w2_lag_delta",
    "w3_running_sum",
    "w4_dense_rank",
    "w5_rollup",
    "w6_cube",
    "w7_grouping_sets",
    "w8_pct_rank_cume",
    "x2_event_type_map",
    # lw=11 (first 28 of 50, name-ordered)
    "a11_null_counts",
    "a14_approx_distinct",
    "a15_percentile_approx",
    "a16_freq_items",
    "a17_grouped_percentiles",
    "a18_exact_corr",
    "a19_grouped_regression",
    "a20_hll_union",
    "a8_pivot_rate",
    "d11_incremental_dedup",
    "d14_fuzzy_name_pairs",
    "d15_fuzzy_indel_pairs",
    "d21_semantic_dedup",
    "dq1_lineitem_checks",
    "dq2_orders_checks",
    "dq3_outlier_bands",
    "e10_time_weighted_avg",
    "e1_tumbling_window",
    "e3_session_window",
    "e3b_session_window_skewfree",
    "e4_asof_join",
    "e6_gap_fill",
    "e7_cohort_retention",
    "e8_funnel_steps",
    "e9_windowed_funnel",
)


def rotation_policy() -> dict:
    """The driver-window rotation guarantee (window_history.json): for
    every query, the last round whose 50-slot driver window included it,
    plus ROTATION_K (max rounds between driver verdicts, enforced from
    ``enforced_from_round``) and the catch-up backlog per round."""
    import json
    import os

    with open(os.path.join(os.path.dirname(__file__), "window_history.json")) as f:
        return json.load(f)


def stale_rotation_candidates() -> list[str]:
    """Registry names ordered stalest-first (then by name) — next round's
    window fill, after its new/changed cohort, MUST come from the front
    of this list (asserted by tests/test_catalog_meta.py)."""
    _load_all_plans()
    lw = rotation_policy()["last_windowed"]
    return sorted(REGISTRY, key=lambda n: (lw.get(n, 0), n))


def _ordered_names() -> list[str]:
    """DRIVER_WINDOW first (verbatim order), then the rest by registration."""
    _load_all_plans()
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    window = set(DRIVER_WINDOW)
    return list(DRIVER_WINDOW) + [n for n in REGISTRY if n not in window]


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }


def specs() -> dict[str, QuerySpec]:
    return {name: REGISTRY[name] for name in _ordered_names()}

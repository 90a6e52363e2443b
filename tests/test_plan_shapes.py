"""Physical-plan shape guards — pin the scale properties the sf1 probes
establish (NOTES_r2.md), so a future edit that silently reintroduces a
pair-row join, an extra shuffle, or a nested-loop join fails here long
before a benchmark notices.

These assert on `explain("formatted")` text at sf0.001 — plan SHAPE is
scale-independent for these queries (no AQE runtime flips below the
broadcast threshold at any probed sf; the probe watches the large-scale
shapes separately).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_pipeline_telecom_spark import catalog

SPECS = catalog.specs()


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        SPECS[name].fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", ["v4_embedding_neardup", "v5_lsh_bucketed_neardup", "v6_gemm_neardup"])
def test_embedding_neardup_never_materializes_pair_rows(spark, sf_dir, name):
    """The near-dup verify is one gram matrix per partition (applyInPandas):
    vectors cross the shuffle once; pair ROWS never do. A self-join here is
    the exact plan that went superlinear at sf1 (78s — NOTES_r2.md)."""
    plan = _plan(spark, sf_dir, name)
    assert "FlatMapGroupsInPandas" in plan, f"{name}: GEMM applyInPandas node missing"
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"{name}: pair-materializing join reappeared: {bad}"


def test_doc_chunking_is_narrow(spark, sf_dir):
    """t7 is tokenize → explode → slice: per-row work only, no shuffle.
    (The single AQE result exchange for the final collect is absent because
    there is no aggregation or join at all.)"""
    plan = _plan(spark, sf_dir, "t7_doc_chunks")
    assert "Exchange" not in plan, "chunking gained a shuffle"
    assert "Generate" in plan  # the chunk-index explode


@pytest.mark.parametrize("name", ["j1_broadcast_join", "j6_star_join"])
def test_dim_joins_broadcast(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_join_is_partial_agg_equijoin(spark, sf_dir):
    """d10: equi-join on the shingle key + hash aggregation. Distinct-count
    aggregates still run as hash aggregates (Expand), never a nested loop."""
    plan = _plan(spark, sf_dir, "d10_contamination_check")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_group_avg_single_shuffle(spark, sf_dir):
    """a4 is scan → partial agg → one exchange → final agg. A second
    exchange means map-side combine broke."""
    plan = _plan(spark, sf_dir, "a4_group_avg")
    # "Exchange (n)" matches the plan-tree line only, not the "(n) Exchange"
    # detail block that formatted mode repeats per node
    assert plan.count("Exchange (") == 1, plan


def test_asof_join_is_linear_union_window(spark, sf_dir):
    """e4's contract (VERDICT r3 item 2): the as-of join is a union +
    running-max window — ONE hash exchange on user_id, a Window node, and
    no join at all. The r3 join+max_by shape exploded clicks × all-prior-
    errors per user (quadratic on a hot user); this guard keeps it out."""
    plan = _plan(spark, sf_dir, "e4_asof_join")
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"e4: join reappeared in the as-of plan: {bad}"
    assert "Window" in plan, "e4: running-max window node missing"
    assert plan.count("Exchange (") == 1, f"e4: expected the single user_id shuffle:\n{plan}"


def test_persisted_lsh_index_side_has_no_shuffle(spark, sf_dir):
    """d12's contract: the probe batch's candidate join against the
    persisted band-bucket index shuffles ONLY the batch side — the index
    is read as co-located buckets (Bucketed: true, zero hash Exchange,
    zero per-task sort thanks to sortBy at write time)."""
    from pyspark.sql import functions as F

    from etl_pipeline_telecom_spark.plans import dedup

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        index = dedup.persisted_band_index(spark, sf_dir)
        shing = dedup.corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
        new_b = (
            dedup._band_buckets(dedup._signatures_from_shingled(shing))
            .where(F.col("doc_id") % 7 == 3)
            .select(F.col("doc_id").alias("new_doc"), "band", "k1", "k2")
        )
        join = new_b.join(index, ["band", "k1", "k2"]).select("new_doc", "old_doc")
        plan = join._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, "index scan lost its bucket spec"
        n_hash_exchanges = plan.count("Exchange hashpartitioning")
        assert n_hash_exchanges == 1, f"expected probe-side-only shuffle, saw {n_hash_exchanges}:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


# --- hard guards over the headline/scale set (VERDICT r2 item 4) ---------
#
# The sf1 probe (tests/scale_probe.py) warns on these; a future plan edit
# must not be able to flip them silently, so they are pytest failures here.
# BNLJ allowlist: d6 broadcasts a literal 16-row bit table, e5 a literal
# 3-row band table — bounded by construction. Anything else nested-loop or
# cartesian is a defect.
_BNLJ_ALLOWED = {
    "d6_simhash",        # literal 16-row bit table
    "e5_band_range_join",  # literal 3-row band table
    "v1_knn_brute",      # Q=10 query vectors, bounded by construction
    "t9_tfidf_topterms",  # 1-row corpus-count broadcast
    "v7_ivf_probe",      # centroid broadcast: k = distinct coarse-cluster
                         # ids (the IVF partition contract assumes k stays
                         # k·d floats — small — NOT a fixed literal; a
                         # data-derived k growing past broadcast size would
                         # need explicit k-means with fixed k)
    "e6_gap_fill",       # dense-grid cross join of two AGGREGATED sides:
                         # #hours (from a 1-row bounds agg) × #types —
                         # bounded by wall-clock range and the type enum,
                         # never by corpus size
    "a16_freq_items",    # two 1-row broadcasts: the scalar total-count and
                         # the freqItems sketch row joined onto the
                         # |domain|-row heavy-candidate set — both sides
                         # aggregated, never corpus-sized
    "v9_ann_recall_eval",  # embeds v7 (its centroid broadcast) plus v1's
                         # Q=10 bounded exact side — the ground-truth pass
                         # a recall eval needs, guarded like v1
    "a22_countmin_heavy_hitters",  # 1-row scalar total-count broadcast
                         # onto the distinct-key estimate side (the a16
                         # pattern); the sketch itself joins as a plain
                         # 1024-row BroadcastHashJoin
    "a23_histogram_quantiles",  # 4-row quantile-list literal crossed
                         # onto the BOUNDED bin table (post-agg), the
                         # e6 aggregated-sides pattern
    "v10_sq8_ann_recall",  # v1/v9's bounded Q=10 query-sample broadcast
                         # (guarded by assert_bounded_input), twice:
                         # code-space scan + exact ground-truth pass
    "v12_ivf_sq8_recall",  # composes v7's k-row centroid broadcast with
                         # v10's guarded Q=10 query side and v9's exact
                         # ground-truth pass — every BNLJ side bounded
    "p8_zorder_layout",  # 1-row extent box + 3-row predicate literal
                         # crossed onto the 16-rows-per-layout FILE AUDIT
                         # table (post-agg) — the e6/a23 aggregated-sides
                         # pattern; corpus rows never meet a BNLJ
    "t16_unigram_rarity",  # 1-row scalar broadcast (train token total),
                         # same shape as t9's corpus-count broadcast
    "p7_compaction_plan",  # 1-row row-budget scalar crossed onto the
                         # 24-row per-bucket count table (a16 pattern)
    "v11_matryoshka_refine",  # v1's bounded Q=10 query-sample broadcast
                         # (assert_bounded_input-guarded)
    "dq8_split_leakage",  # two 1-row aggregates crossed per audit mode
                         # (row masses × leaker count), both post-agg
    "a25_kmv_theta_setops",  # every crossed side is a 1-row sketch
                         # aggregate or the ≤64-row KMV sample itself
                         # (k is the sketch parameter, never data-sized);
                         # the only corpus-sized stage is the distinct
    "t24_bigram_surprisal",  # 1-row corpus-mean-surprisal scalar crossed
                         # onto the per-doc table (t9/t16's corpus-count
                         # broadcast pattern)
    "p9_bloom_file_index",  # probe×file-params crossings: 8-row probe
                         # set × 16-row per-file bloom-size table, plus
                         # the 1-row n_files scalar — all post-agg
                         # bounded sides (e6/a16 pattern)
    "sm9_epoch_mix_schedule",  # 4-row epoch dim × 5-row per-lang agg +
                         # the 1-row total-tokens scalar — every crossed
                         # side aggregated/bounded (e6 pattern); nothing
                         # corpus-sized ever meets a BNLJ
    "m9_image_text_score",  # 1-row corpus-mean-threshold scalar crossed
                         # onto the per-doc score table (t24's
                         # data-derived-threshold broadcast pattern)
    "t17_bpe_encode",    # r15: eight 0-or-1-row per-round winner
                         # broadcasts crossed onto the VOCABULARY-sized
                         # symbol table (the array-fold merge chain; the
                         # winners were localCheckpoint-truncated out of
                         # the plan before r15, so the bounded BNLJ is
                         # newly visible, not newly created) — the
                         # t9/t16 1-row-scalar pattern, per round
    "v14_ivf_pq_recall",  # composes v7's k-row centroid broadcast with
                         # v13's guarded Q=10 LUT side and v9's exact
                         # ground-truth pass — every BNLJ side bounded
                         # (same adjudication as v12)
    "d21_semantic_dedup",  # v7's k-row centroid broadcast for cell
                         # assignment (k = IVF parameter, never
                         # data-sized); all pair scoring is inside the
                         # cid-grouped Arrow stage, no pair join at all
    "m10_image_meta_gate",  # 1-row corpus-mean-density scalar crossed
                         # onto the per-image metadata table (t24/m9's
                         # data-derived-threshold broadcast pattern)
    "t29_perplexity_buckets",  # 1-row doc-count scalar onto the
                         # |distinct scores|-sized histogram, then the
                         # 1-row tercile-cutoff row onto the per-doc
                         # table (a23's aggregated-sides pattern)
    "m11_audio_quality_gate",  # 1-row corpus-energy scalar crossed
                         # onto the per-clip feature table (t24/m9/m10
                         # data-derived-threshold pattern)
    "t30_backoff_lm",    # two 1-row scalars (bl(T), eval-corpus mean)
                         # crossed onto the DOC-sized per-doc frame —
                         # t24's data-derived-threshold pattern, never
                         # the bigram-sized frame
    "pipe4_curation_funnel",  # the perplexity stage's 1-row corpus-mean
                         # scalar (t24 pattern) plus the funnel table
                         # itself: six 1-row count aggregates crossed
                         # into one stack() row (e6/a16 aggregated-sides
                         # pattern) — nothing corpus-sized meets a BNLJ
    "sm11_cluster_balanced_mix",  # d21's k-row centroid broadcast for
                         # cell assignment plus the 1-row budget scalar
                         # onto the k-row per-cell frame (sm9 pattern)
    "v15_incremental_ann",  # the persisted k-row centroid broadcast
                         # (v7's adjudication) and v1/v9's guarded Q=10
                         # query-sample broadcast for the exact
                         # ground-truth pass — every BNLJ side bounded
    "pipe5_incremental_curation",  # pipe4's funnel pattern per slice:
                         # six 1-row count aggregates crossed into one
                         # stack() row, plus the frozen LM's 1-row
                         # threshold scalar (t24 pattern) — nothing
                         # corpus-sized meets a BNLJ; the dedup probes
                         # are all equi-joins on band keys
    "t31_trigram_backoff_lm",  # t30's adjudication verbatim: two 1-row
                         # scalars (bl(T), eval-corpus mean) crossed
                         # onto the DOC-sized frame; all five model
                         # joins are vocabulary-keyed LEFT equi-joins
    "v16_index_rebuild_trigger",  # the k-row LIVE-centroid broadcast
                         # for the misassignment compare (v7/v15's
                         # k-row adjudication; k = cells, never
                         # data-sized)
    "t32_kneser_ney_lm",  # t30's two 1-row scalars PLUS the 1-row T2
                         # (distinct-bigram-type count) scalar crossed
                         # onto the eval bigram frame — T2 must sit
                         # inside bl(2·cc·T2) per row, so unlike bl(T)
                         # it cannot factor to the doc level; a 1-row
                         # build side is bounded by construction (t24
                         # adjudication)
    "sm13_dsir_resample",  # 1-row totals scalar onto the 64-row feature
                         # dimension and the 1-row pool-max scalar onto
                         # the doc-sized score frame (t24 pattern); the
                         # occurrence-stream join is a broadcast
                         # EQUI-join on the 64-row dimension
    "v17_filtered_ann",  # v7's k-row centroid broadcast verbatim (the
                         # eligibility predicate adds only a vec_id
                         # equi-join below the probe join)
    "sm14_doremi_mixture",  # t30's 1-row bl(T) scalar broadcast onto the
                         # DOMAIN-keyed frame (t24 adjudication); every
                         # DRO-iteration window runs on the ~20-row
                         # domain dimension, no corpus-sized BNLJ side
}
_GUARDED = [
    "a4_group_avg", "a10_histogram", "a13_median", "j2_revenue_topk",
    "j6_star_join", "j7_salted_join", "w1_rank_topk_per_group",
    "s1_union_distinct", "t2_quality_score", "t7_doc_chunks",
    "d1_exact_dedup", "d5_lsh_jaccard_dedup", "d6_simhash",
    "d10_contamination_check", "d11_incremental_dedup",
    "d12_persisted_lsh_probe", "d13_contamination_bloom", "t9_tfidf_topterms",
    "v1_knn_brute", "v2_knn_partitioned", "v4_embedding_neardup",
    "v5_lsh_bucketed_neardup", "v7_ivf_probe",
    "e1_tumbling_window", "e3_session_window",
    "e4_asof_join", "e5_band_range_join", "m1_media_features",
    "dq1_lineitem_checks", "pipe1_corpus_clean", "sm1_hash_sample",
    "e6_gap_fill", "p2_upsert_latest", "sm3_split_assign",
    "t10_bpe_pretokenize", "v8_embedding_decontam",
    "e7_cohort_retention", "w9_ntile_buckets", "a18_exact_corr",
    "t11_bigram_topk", "a25_kmv_theta_setops", "t24_bigram_surprisal",
    "d19_url_dedup", "d20_domain_blocklist", "v13_pq_adc_refine",
    "p9_bloom_file_index",
    # r10 additions: the langid model join must stay a broadcast equi-
    # join, the WordPiece loops' only non-equi joins are 1-row argmax
    # broadcasts (clean in the executed plan), p10's audit is pure
    # equi-joins over metadata-scale frames, and sm9/m9/v14 carry their
    # justified bounded BNLJs above
    "t25_langid_train", "t26_wordpiece_train", "t27_wordpiece_encode",
    "p10_compaction_exec", "sm9_epoch_mix_schedule", "m9_image_text_score",
    "v14_ivf_pq_recall",
    # r11 additions: t28's model join must stay a broadcast equi-join,
    # sm10/p11 are pure equi-join/metadata shapes, and d21/m10 carry
    # their justified bounded BNLJs above
    "t28_quality_classifier", "d21_semantic_dedup", "sm10_dupaware_weights",
    "p11_incremental_compact", "m10_image_meta_gate",
    "t29_perplexity_buckets", "m11_audio_quality_gate",
    # r12 additions: t30's model joins must stay vocabulary-keyed equi-
    # joins (its two scalars are justified above), m12's self-join is a
    # pure equi-join on the scene signature, and pipe4/sm11/v15 carry
    # their justified bounded BNLJs above
    "t30_backoff_lm", "m12_video_scene_dedup", "pipe4_curation_funnel",
    "sm11_cluster_balanced_mix", "v15_incremental_ann",
    # dq9 rides d5's audited pair surface; its own contract (zero added
    # joins) is pinned separately below
    "dq9_neardup_split_leakage",
    # r13 additions: pipe5/t31/v16 carry their justified bounded BNLJs
    # above; sm12's rank join is a broadcast of the 64-row offset table
    # (equi-join) and m13's candidate join is a pure band-key equi-join
    "pipe5_incremental_curation", "sm12_epoch_shard_shuffle",
    "m13_phash_neardup", "t31_trigram_backoff_lm",
    "v16_index_rebuild_trigger",
    # r14 additions: t32/sm13/v17 carry their justified bounded BNLJs
    # above; p12's audit is pure equi-joins over manifest-planned
    # metadata-scale frames (the p10/p11 shape)
    "t32_kneser_ney_lm", "sm13_dsir_resample", "v17_filtered_ann",
    "p12_snapshot_read",
    # r15 additions: d22 is one shingle-key shuffle + doc_id-keyed
    # windows/joins (d18's shape plus the reassembly groupBy); p13's diff
    # is a single event_id SortMergeJoin over DELTA files only; sm14
    # carries t30's justified 1-row bl(T) broadcast (allowlisted above)
    "d22_span_removal_dedup", "p13_snapshot_diff", "sm14_doremi_mixture",
]


@pytest.mark.parametrize("name", _GUARDED)
def test_no_unexpected_nested_loop_join(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product appeared"
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: BNLJ appeared — only d6/e5 broadcast bounded literal tables"
        )


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.length()):
        yield from _walk(ch.apply(i))


@pytest.mark.parametrize("name", ["j1_broadcast_join", "j2_revenue_topk", "j6_star_join", "j7_salted_join"])
def test_fact_slices_never_broadcast_hinted(spark, sf_dir, name):
    """Dimensions may carry broadcast() hints; lineitem/orders slices are
    unboundable at 100 TB and must NOT — whether they broadcast is AQE's
    runtime decision from observed sizes (plans/joins.py:80-82). Catalyst's
    own static size-based broadcasts at fixture scale are fine; this guard
    catches the explicit HINT, which would force the broadcast at any SF."""
    df = SPECS[name].fn(spark, sf_dir)
    for node in _walk(df._jdf.queryExecution().analyzed()):
        if "Hint" in node.nodeName():
            subtree = node.toString()
            assert "lineitem.parquet" not in subtree and "orders.parquet" not in subtree, (
                f"{name}: broadcast hint over a fact-table scan:\n{subtree[:500]}"
            )


def test_upsert_merge_is_single_shuffle(spark, sf_dir):
    """p2's contract: the SCD-1 merge is ONE hash aggregate over the
    union'd input — conditional max(struct) per side — with map-side
    partial aggregation. A join- or window-based rewrite would add a
    second exchange and lose the partial-agg pushdown."""
    plan = _plan(spark, sf_dir, "p2_upsert_latest")
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct", "Window"):
        assert bad not in plan, f"p2: unexpected {bad} — merge should be one agg"
    assert plan.count("Exchange (") == 1, f"p2: expected a single key shuffle:\n{plan}"


def test_gap_fill_aggregates_fact_before_grid(spark, sf_dir):
    """e6: the events fact collapses to (type, hour) rows in a hash
    aggregate BEFORE the dense-grid join; the grid itself is built from a
    1-row bounds aggregate. No cartesian anywhere (the grid cross join is
    the allowlisted bounded BNLJ)."""
    plan = _plan(spark, sf_dir, "e6_gap_fill")
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan, "e6: fact-side pre-aggregation missing"
    assert "Generate" in plan  # the sequence+explode grid


def test_embedding_decontam_never_materializes_pair_rows(spark, sf_dir):
    """v8: the train×eval screen is one cogrouped per-bucket GEMM
    (FlatMapCoGroupsInPandas) that reduces to per-train top-1 inside the
    worker — vectors cross the shuffle once per side, pair rows never
    exist, and there is no join or window node at all. A join + per-pair
    scoring form ships every same-bucket pair through Arrow (the shape
    v5's sf1 probe showed going superlinear). (The r15 broadcast-eval +
    single-mapInPandas shape was shuffle-free but measured slower at
    both scales — reverted per VERDICT r15 item 1.)"""
    plan = _plan(spark, sf_dir, "v8_embedding_decontam")
    assert "FlatMapCoGroupsInPandas" in plan, "v8: cogrouped GEMM node missing"
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct", "BroadcastNestedLoopJoin", "Window"):
        assert bad not in plan, f"v8: {bad} appeared"
    n_shuffles = plan.count("Exchange (") - plan.count("BroadcastExchange (")
    assert n_shuffles == 2, f"v8: expected one cogroup shuffle per side:\n{plan}"


def test_funnel_is_single_shuffle_no_join(spark, sf_dir):
    """e8: three chained step-windows + the per-user collapse all share ONE
    user_id hash partitioning; the sequence constraint must never become a
    self-join (which would materialize clicks × signups per user)."""
    plan = _plan(spark, sf_dir, "e8_funnel_steps")
    # one user_id hash exchange; the other allowed Exchange is the
    # SinglePartition collapse of the three scalar counts
    assert plan.count("hashpartitioning(user_id") == 1, "funnel gained a data shuffle"
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, f"funnel grew a join: {bad}"


def test_scd2_intervals_single_shuffle_no_join(spark, sf_dir):
    """p3: one window over (user_id sorted by ts) — a lead() lookahead, not
    a self-join against the history."""
    plan = _plan(spark, sf_dir, "p3_scd2_intervals")
    assert plan.count(") Exchange") == 1
    assert "Join" not in plan


def test_outlier_bands_broadcast_bounds_no_fact_shuffle(spark, sf_dir):
    """dq3: the per-group mu/sigma bounds (rows = |groups|) broadcast back
    onto a second scan; the fact table itself must never shuffle — only
    partial-agg rows move."""
    plan = _plan(spark, sf_dir, "dq3_outlier_bands")
    assert "BroadcastHashJoin" in plan
    for bad in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert bad not in plan, f"bounds join stopped broadcasting: {bad}"


def test_v15_probe_scan_is_partition_pruned(spark, sf_dir):
    """v15's IVF read contract: the serving-set scan is cid-PARTITIONED
    and the probe join prunes it — the plan must carry a dynamic-pruning
    partition filter on the index scan (reading every cell for a 2-cell
    probe is the regression this pins out)."""
    from etl_pipeline_telecom_spark.plans.similarity import v15_incremental_ann

    df = v15_incremental_ann(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "cid partition pruning lost"


def test_m12_pair_join_is_signature_equijoin(spark, sf_dir):
    """m12's candidate generation must stay an equi-join on the scene
    signature (d4's bucket shape) — a theta-join or cartesian over the
    scene table is the all-pairs regression."""
    plan = _plan(spark, sf_dir, "m12_video_scene_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dq9_adds_no_joins_over_d5(spark, sf_dir):
    """dq9's contract: the split-leakage audit is d5's pair pipeline plus
    ROW-LOCAL hash expressions and one <=6-row aggregate — a corpus-sized
    split-assignment JOIN sneaking in (the naive implementation) would
    show as extra join nodes over d5's own plan."""
    d5 = _plan(spark, sf_dir, "d5_lsh_jaccard_dedup")
    dq9 = _plan(spark, sf_dir, "dq9_neardup_split_leakage")
    assert dq9.count("Join") == d5.count("Join"), (
        "dq9 grew a join beyond d5's pair surface"
    )

"""Semi-structured data + reproducible sampling + Python-UDF parity ops.

Training-data pipelines live on these four shapes:

- JSON columns (``events.props``): parse/extract with the native JSON
  functions — never a Python UDF — so Catalyst can prune and codegen.
- Reproducible sampling: ``TABLESAMPLE``/``df.sample`` are seed- and
  partitioning-dependent, useless for auditable corpus cuts. Hash-mod
  sampling (md5 of the key) is deterministic on ANY engine and cluster
  layout — the only sane way to cut a 100 TB corpus reproducibly.
- Arrow-vectorized scalar UDFs (``pandas_udf``): the sanctioned escape
  hatch when an expression can't be built from pyspark.sql.functions;
  here one computes a text-quality score and is held to the SAME DuckDB
  oracle as a native expression would be (integer-ratio arithmetic →
  bit-identical doubles).
- Grouped-map ``applyInPandas``: whole-group pandas logic (per-group
  median here) — shuffles once on the group key; each group must fit in
  one executor's memory, which is the documented contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import register
from ..functions.text import hash32, hash_bucket, token_pairs
from ..functions.text import tokens
from ..sources import load_table


@register(
    "x1_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
              COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1""",
    tags=("json", "semistructured"),
    doc="Native JSON extraction over events.props (get_json_object) feeding "
    "a bucketed aggregate — JVM-side, no Python in the loop",
)
def x1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


_HASH_MOD = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


@register(
    "sm1_hash_sample",
    f"""SELECT doc_id, lang FROM documents WHERE {_HASH_MOD} < 20""",
    tags=("sampling",),
    doc="Deterministic ~20% corpus sample by key-hash mod — reproducible "
    "across engines, partitionings, and reruns (unlike df.sample)",
)
def sm1_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    return docs.where(bucket < 20).select("doc_id", "lang")


@register(
    "sm2_stratified_sample",
    f"""SELECT lang, COUNT(*) AS sampled
       FROM documents WHERE {_HASH_MOD} < 50
       GROUP BY lang""",
    tags=("sampling", "stratified"),
    doc="Stratified cut: the hash-mod predicate applies uniformly within "
    "each stratum, so per-language proportions hold without a shuffle",
)
def sm2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    return docs.where(bucket < 50).groupBy("lang").agg(F.count(F.lit(1)).alias("sampled"))


@register(
    "sm3_split_assign",
    f"""SELECT split, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM (
          SELECT lang, n_chars,
                 CASE WHEN {_HASH_MOD} < 90 THEN 'train'
                      WHEN {_HASH_MOD} < 95 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents)
        GROUP BY split, lang""",
    tags=("sampling", "split", "headline"),
    doc="Deterministic train/val/test assignment (90/5/5 by key-hash mod "
    "— the standard leakage-safe corpus split: membership depends only "
    "on the key, so re-runs, engine changes, and repartitioning never "
    "move a document across splits), audited as per-(split, lang) doc "
    "and char counts. Scan-side projection + one hash aggregate on a "
    "15-value key space; integer char sums are exact cross-engine",
)
def sm3_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


# DoubleType() not the DDL string "double": the string form would parse
# DDL at import time, which needs a live SparkSession
@pandas_udf(DoubleType())
def _quality_score_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched scalar UDF: tokens-per-100-chars density score.

    Integer counts divided as doubles → bit-identical to the SQL oracle's
    arithmetic; vectorized pandas string ops, no per-row Python.
    """
    n_tokens = text.str.strip().str.split(r"\s+").str.len()
    n_chars = text.str.len()
    return (n_tokens * 100.0) / n_chars


@register(
    "u1_pandas_udf_score",
    """SELECT doc_id,
              CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) * 100 / len(text)
                  AS density
       FROM documents""",
    tags=("pandas-udf",),
    doc="Arrow-vectorized pandas_udf held to the same DuckDB oracle as a "
    "native expression (token density per 100 chars)",
)
def u1_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _quality_score_udf("text").alias("density"))


_GROUP_MEDIAN_SCHEMA = "source string, median_chars double, n_docs long"


def _group_median(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "source": pdf["source"].iloc[0],
                "median_chars": float(pdf["n_chars"].median()),
                "n_docs": len(pdf),
            }
        ]
    )


@register(
    "g1_grouped_median",
    """SELECT source,
              CAST(median(n_chars) AS DOUBLE) AS median_chars,
              COUNT(*) AS n_docs
       FROM documents GROUP BY source""",
    tags=("applyInPandas", "grouped-map"),
    doc="Grouped-map applyInPandas (per-source exact median in pandas) vs "
    "SQL median — one shuffle on the group key; group-fits-in-memory "
    "contract documented",
)
def g1_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return docs.groupBy("source").applyInPandas(_group_median, schema=_GROUP_MEDIAN_SCHEMA)


@register(
    "x2_event_type_map",
    """SELECT user_id,
              list_aggregate(list_sort(list(event_type || ':' || cnt)), 'string_agg', ',')
                  AS type_counts
       FROM (SELECT user_id, event_type, COUNT(*) AS cnt
             FROM events GROUP BY user_id, event_type)
       GROUP BY user_id""",
    tags=("map-type", "semistructured"),
    doc="MapType aggregation: per-user event_type→count map built with "
    "map_from_entries, then canonicalized to a sorted entries string "
    "(engines surface MAP values in incompatible python shapes, so the "
    "oracle compares the canonical form; the map itself is real Spark "
    "MapType mid-plan)",
)
def x2_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    entries = F.transform(
        F.map_entries("m"), lambda e: F.concat_ws(":", e["key"], e["value"].cast("string"))
    )
    return mapped.select(
        "user_id", F.array_join(F.array_sort(entries), ",").alias("type_counts")
    )


# cross-engine deterministic bucket in [0, 1000): md5-hex prefix, the
# same technique as sm1/sm3 (Spark conv() ≡ DuckDB from_hex via UBIGINT)
_SQL_BUCKET1000 = (
    "CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 1000"
)


@register(
    "sm4_weighted_sample",
    f"""WITH w AS (
          SELECT lang,
                 LEAST(0.9, GREATEST(0.1, n_chars / 2000.0)) AS keep_p,
                 {_SQL_BUCKET1000} AS bucket
          FROM documents)
        SELECT lang, COUNT(*) AS kept
        FROM w WHERE bucket < keep_p * 1000.0
        GROUP BY lang""",
    tags=("sampling", "weighted", "headline"),
    doc="Quality-weighted corpus sampling: each document's keep probability "
    "scales with document length (clamped to [0.1, 0.9] — the standard "
    "up-weight-long-documents heuristic for LLM training mixes), realized "
    "as a DETERMINISTIC per-key hash-bucket threshold instead of rand() — "
    "reproducible across engines, partitionings, reruns, and resumes, "
    "which is what makes a 100 TB sampling job restartable. Pure "
    "scan-side predicate + one hash agg; no shuffle of the kept rows",
)
def sm4_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id", 1000)
    keep_p = F.least(F.lit(0.9), F.greatest(F.lit(0.1), F.col("n_chars") / F.lit(2000.0)))
    return (
        docs.where(bucket < keep_p * F.lit(1000.0))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept"))
    )


_PPM = 1_000_000
_HASH_PPM = f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_PPM}"


@register(
    "sm5_temperature_mix",
    f"""WITH st AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        s1 AS (SELECT lang, n,
                      CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * {_PPM}) AS BIGINT) AS s
               FROM st),
        s2 AS (SELECT lang, n, s, SUM(s) OVER () AS s_tot FROM s1),
        s3 AS (SELECT lang, n, s, s_tot,
                      MIN((CAST(n AS DOUBLE) * CAST(s_tot AS DOUBLE)) / CAST(s AS DOUBLE))
                          OVER () AS c
               FROM s2),
        rates AS (SELECT lang, n,
                         CAST(FLOOR(((c * CAST(s AS DOUBLE)) / CAST(s_tot AS DOUBLE))
                                    / CAST(n AS DOUBLE) * {_PPM}) AS BIGINT) AS keep_ppm
                  FROM s3),
        kept AS (SELECT d.lang, COUNT(*) AS n_kept
                 FROM documents d JOIN rates r ON d.lang = r.lang
                 WHERE {_HASH_PPM} < r.keep_ppm
                 GROUP BY d.lang)
        SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.keep_ppm,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        FROM rates r LEFT JOIN kept k ON r.lang = k.lang""",
    tags=("sampling", "weighted", "multilingual", "headline"),
    doc="Temperature-weighted multilingual resampling (the mBERT/XLM-R "
    "alpha=0.5 recipe): target language shares proportional to "
    "sqrt(p_lang) flatten the head-language dominance, scaled so no "
    "language is UPsampled (the binding language keeps 100%), then "
    "realized as a deterministic per-doc hash-bucket threshold — "
    "restartable at 100 TB, unlike rand(). Cross-engine exactness: the "
    "per-language weight is quantized to integer ppm (sqrt is IEEE-"
    "identical in both engines, the integer sum is exact in any "
    "accumulation order — a raw double sum over languages would not "
    "be), and every later double op has identical operands and shape. "
    "Plan: one hash agg to lang stats (5 rows), rate arithmetic on the "
    "post-agg rows (single-partition window over a BOUNDED language "
    "dimension, never the corpus), then the rates broadcast back onto "
    "the scan — the kept set never shuffles.",
)
def sm5_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    st = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    s = F.floor(F.sqrt(F.col("n").cast("double")) * _PPM).cast("bigint")
    s2 = st.withColumn("s", s).withColumn("s_tot", F.sum("s").over(w))
    c = F.min(
        (F.col("n").cast("double") * F.col("s_tot").cast("double")) / F.col("s").cast("double")
    ).over(w)
    rates = s2.withColumn("c", c).select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.floor(
            ((F.col("c") * F.col("s").cast("double")) / F.col("s_tot").cast("double"))
            / F.col("n").cast("double")
            * _PPM
        )
        .cast("bigint")
        .alias("keep_ppm"),
    )
    bucket = hash_bucket("doc_id", _PPM)
    kept = (
        docs.join(F.broadcast(rates.select("lang", "keep_ppm")), "lang")
        .where(bucket < F.col("keep_ppm"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_docs",
        "keep_ppm",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
    )


_SM6_K = 20
_SM6_ORD = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "sm6_fixed_k_per_group",
    f"""SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY {_SM6_ORD}, doc_id) AS rk
          FROM documents)
        WHERE rk <= {_SM6_K}""",
    tags=("sampling", "balanced", "evaluation"),
    doc="Exactly-k-per-group sampling: each language contributes its "
    "k={_k} lowest-hash documents — the balanced eval-set construction "
    "that per-rate sampling (sm1/sm2/sm5) cannot guarantee (rates give "
    "EXPECTED counts; eval sets need exact ones). Ordering by the md5 "
    "of the key is a deterministic uniform draw — reruns, engines, and "
    "partitionings agree, and adding documents only perturbs the "
    "selection locally (a new doc displaces at most the k-th member of "
    "its own group — hash-ordered selection is stable under growth, "
    "unlike rand()-ranked). Strata smaller than k contribute entirely. "
    "Plan: one window shuffle on the group key; at 100 TB groups are "
    "bounded (languages), and the full sort inside each group is "
    "avoidable with a per-partition top-k combine (rank only the "
    "survivors) — Spark's window TopK pushdown does this when k is a "
    "literal.""".replace("{_k}", str(_SM6_K)),
)
def sm6_fixed_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _SM6_K)
        .select("lang", "doc_id", F.col("rk").cast("bigint").alias("rk"))
    )


_SM7_BUDGET_FRAC = 0.4  # per-language token budget: 40% of observed tokens


@register(
    "sm7_token_budget_cut",
    f"""WITH d AS (
          SELECT doc_id, lang,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tok,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents
       ), b AS (
          SELECT lang, CAST(FLOOR(SUM(n_tok) * {_SM7_BUDGET_FRAC}) AS BIGINT) AS budget
          FROM d GROUP BY lang
       ), r AS (
          SELECT *, SUM(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id) AS cum
          FROM d
       ), k AS (
          SELECT r.lang, r.n_tok, b.budget
          FROM r JOIN b ON r.lang = b.lang
          WHERE r.cum <= b.budget
       )
       SELECT lang,
              COUNT(*) AS n_docs_kept,
              CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
              MAX(budget) AS budget_tokens,
              CAST(FLOOR(CAST(SUM(n_tok) AS DOUBLE) * 1000000.0 / MAX(budget)) AS BIGINT)
                  AS utilization_ppm
       FROM k GROUP BY lang""",
    tags=("sampling", "token-budget", "mixing", "headline"),
    doc="Token-BUDGET corpus cut: each language gets a hard token budget "
    "(40% of its observed whitespace tokens here; production binds "
    "absolute budgets) and admits whole documents in deterministic "
    "hash order until the running token total would exceed it — the "
    "exact-budget counterpart of rate-based sampling (sm1/sm5 give "
    "EXPECTED token shares; a training mix needs a hard ceiling). "
    "Hash-ordered admission is reproducible across engines/reruns and "
    "stable under corpus growth (a new doc displaces only later-hash "
    "docs in its own language). Plan: one narrow token-count scan, a "
    "5-row budget aggregate broadcast back, one per-lang running-sum "
    "window (shuffle bounded by the language key), final 5-row audit "
    "agg. Whole-doc admission means the budget is a floor-threshold, "
    "not bin-packing — t12_pack_sequences handles the packing side",
)
def sm7_token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    b = d.groupBy("lang").agg(
        F.floor(F.sum("n_tok") * F.lit(_SM7_BUDGET_FRAC)).cast("bigint").alias("budget")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = d.withColumn("cum", F.sum("n_tok").over(w))
    k = r.join(F.broadcast(b), "lang").where(F.col("cum") <= F.col("budget"))
    return k.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.max("budget").alias("budget_tokens"),
        F.floor(F.sum("n_tok").cast("double") * 1_000_000.0 / F.max("budget"))
        .cast("bigint")
        .alias("utilization_ppm"),
    )


_G2_GAP_US = 86_400 * 1_000_000  # throttle: min 1 day between KEPT events
_G2_SCHEMA = "user_id long, event_id long, kept_ts_us long"


def _throttle_all(ev: DataFrame) -> DataFrame:
    """All-users greedy throttle over a (user_id, event_id, kept_ts_us)
    frame — ONE shuffle on user_id, then a mapInPandas pass that walks
    every user's jump chain with numpy.

    Replaces ``groupBy(user_id).applyInPandas(_throttle_group)``, whose
    cost at bench scale was per-GROUP overhead: one Python call + one
    pandas frame per user (~1k users ≈ seconds), not the data. Here a
    task processes its whole partition's users from flat numpy arrays
    (guide §4.2/§4.5: batch work in native code, per-task not per-group).
    Same shuffle key, same per-user memory contract (one user's history
    is contiguous in one partition), bit-identical output.

    A user's rows can span Arrow batch boundaries inside a partition, so
    the iterator holds back the trailing (possibly incomplete) user of
    each batch and prepends it to the next — partition-sorted input makes
    users contiguous, which is what makes that carry exact."""

    def walk(it):
        buf: pd.DataFrame | None = None

        def emit(df: pd.DataFrame) -> pd.DataFrame:
            u = df["user_id"].to_numpy(dtype="int64")
            t = df["kept_ts_us"].to_numpy(dtype="int64")
            e = df["event_id"].to_numpy(dtype="int64")
            order = np.lexsort((e, t, u))
            u, t, e = u[order], t[order], e[order]
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            ends = np.r_[starts[1:], len(u)]
            keep: list[int] = []
            for s, z in zip(starts, ends):
                tt = t[s:z]
                jump = np.searchsorted(tt, tt + _G2_GAP_US, side="left")
                i, n = 0, z - s
                while i < n:
                    keep.append(s + i)
                    i = int(jump[i])
            k = np.asarray(keep, dtype="int64")
            return pd.DataFrame(
                {"user_id": u[k], "event_id": e[k], "kept_ts_us": t[k]}
            )

        for pdf in it:
            df = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            if df.empty:
                buf = None
                continue
            last_uid = df["user_id"].iloc[-1]
            head = df[df["user_id"] != last_uid]
            buf = df[df["user_id"] == last_uid]
            if not head.empty:
                yield emit(head)
        if buf is not None and not buf.empty:
            yield emit(buf)

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "kept_ts_us", "event_id")
        .mapInPandas(walk, schema=_G2_SCHEMA)
    )


# shared by g2 (single-group form) and g2b (the (user, month) pre-split
# scale form): both implement the SAME greedy recurrence, so both carry
# the same recursive-CTE oracle
_G2_SQL = f"""WITH RECURSIVE o AS (
         SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
         FROM events WHERE ts IS NOT NULL
       ), walk AS (
         SELECT user_id, rn, t, event_id, TRUE AS kept, t AS last_kept
         FROM o WHERE rn = 1
         UNION ALL
         SELECT o.user_id, o.rn, o.t, o.event_id,
                o.t >= w.last_kept + {_G2_GAP_US} AS kept,
                CASE WHEN o.t >= w.last_kept + {_G2_GAP_US} THEN o.t
                     ELSE w.last_kept END AS last_kept
         FROM walk w JOIN o ON o.user_id = w.user_id AND o.rn = w.rn + 1
       )
       SELECT user_id, event_id, t AS kept_ts_us FROM walk WHERE kept"""


@register(
    "g2_throttle_debounce",
    _G2_SQL,
    tags=("applyInPandas", "grouped-map", "stateful-batch", "throttle"),
    doc="Greedy per-user throttle/debounce (keep an event only if >= 1 "
    "day after the last KEPT event — rate-limiting, notification "
    "dedup, snapshot thinning): the decision depends on the previous "
    "KEPT row, a sequential recurrence no window frame expresses "
    "(lag() sees the previous ROW; a kept-only running max is "
    "circular). Spark side: one shuffle on user_id, then an "
    "applyInPandas per-group scan — linear, executor-side, bound by "
    "the g1 group-fits-in-memory contract (at 100 TB a (user, month) "
    "pre-split with carry-in state would cap group size). The oracle "
    "is a RECURSIVE CTE walking each user's rows in order — all users "
    "advance in parallel per recursion step, so depth = max events "
    "per user, and the throttle rule is replayed exactly",
)
def g2_throttle_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_id", F.unix_micros("ts").alias("kept_ts_us"))
    )
    return _throttle_all(ev)


# --- g2b: the (user, month) pre-split scale form of the same throttle ----
#
# g2's contract is "one user's full history fits in one pandas group".
# g2b removes it exactly, with three bounded stages (the e3b two-level
# idea, extended because the throttle's recurrence CROSSES segment
# boundaries):
#
#   A. per (user, month): sort once, build greedy jump pointers
#      (jump[i] = first event >= t[i] + GAP, one vectorized
#      searchsorted), and a reverse pass gives carryout[i] = timestamp of
#      the LAST kept event if the chain enters at i. Emit only the
#      month's possible ENTRY events — every event in the first
#      GAP-window after month start, plus the first event past it —
#      with their carryouts. A month's kept set given carry-in s is
#      fully determined by its entry (the first event >= s + GAP), so
#      these summary rows are a complete transition function.
#   B. per user, over summaries only: walk months in order threading
#      s (last kept timestamp); each month's entry is one searchsorted
#      into its candidate list. Data per user = months + first-window
#      events, not total events (a 24/7-dense user at GAP = 1 day
#      contributes ~1/30th of its rows here; recursively splittable).
#   C. per (user, month) again, joined with its resolved entry: replay
#      the jump chain from the entry and emit kept rows.
#
# Stage-A correctness of the candidate set: carry-in s is a kept
# timestamp from an EARLIER month, so s < month_start and
# s + GAP < month_start + GAP; the first event >= s + GAP is therefore
# either inside the first GAP-window (all candidates) or the first event
# past it (also a candidate, and it always qualifies since its
# t >= month_start + GAP > s + GAP). Months whose events are all
# suppressed emit no entry and pass s through unchanged.
#
# tests/test_r8_ops.py asserts g2b ≡ g2 bit-identically on the fixture
# AND on a crafted one-user-dominates stream whose events straddle month
# boundaries at the exact GAP edge.

_G2B_SUMMARY_SCHEMA = (
    "user_id long, month_us long, cand_t long, cand_eid long, carryout_t long"
)
_G2B_ENTRY_SCHEMA = "user_id long, month_us long, entry_t long, entry_eid long"


def _g2b_month_summary(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["kept_ts_us", "event_id"]).reset_index(drop=True)
    t = pdf["kept_ts_us"].to_numpy(dtype="int64")
    n = len(t)
    month_us = int(pdf["month_us"].iloc[0])
    jump = np.searchsorted(t, t + _G2_GAP_US, side="left")
    carry = np.empty(n, dtype="int64")
    for i in range(n - 1, -1, -1):  # O(n); jump[i] > i so carry[jump[i]] is final
        carry[i] = t[i] if jump[i] >= n else carry[jump[i]]
    k = int(np.searchsorted(t, month_us + _G2_GAP_US, side="left"))
    m = min(k + 1, n)  # first-window events + the first one past the window
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].to_numpy(dtype="int64")[:m],
            "month_us": np.full(m, month_us, dtype="int64"),
            "cand_t": t[:m],
            "cand_eid": pdf["event_id"].to_numpy(dtype="int64")[:m],
            "carryout_t": carry[:m],
        }
    )


def _g2b_chain_months(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["month_us", "cand_t", "cand_eid"]).reset_index(drop=True)
    uid = int(pdf["user_id"].iloc[0])
    out = []
    s = None  # last kept timestamp across months
    for month_us, grp in pdf.groupby("month_us", sort=True):
        t = grp["cand_t"].to_numpy(dtype="int64")
        j = 0 if s is None else int(np.searchsorted(t, s + _G2_GAP_US, side="left"))
        if j < len(t):
            out.append((uid, int(month_us), int(t[j]), int(grp["cand_eid"].iloc[j])))
            s = int(grp["carryout_t"].iloc[j])
    return pd.DataFrame(out, columns=["user_id", "month_us", "entry_t", "entry_eid"])


def _g2b_replay(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["kept_ts_us", "event_id"]).reset_index(drop=True)
    t = pdf["kept_ts_us"].to_numpy(dtype="int64")
    eid = pdf["event_id"].to_numpy(dtype="int64")
    uid = int(pdf["user_id"].iloc[0])
    entry_t = int(pdf["entry_t"].iloc[0])
    entry_eid = int(pdf["entry_eid"].iloc[0])
    i = int(np.searchsorted(t, entry_t, side="left"))
    while eid[i] != entry_eid:  # timestamp ties: advance to the exact entry event
        i += 1
    jump = np.searchsorted(t, t + _G2_GAP_US, side="left")
    n = len(t)
    out = []
    while i < n:
        out.append((uid, int(eid[i]), int(t[i])))
        i = int(jump[i])
    return pd.DataFrame(out, columns=["user_id", "event_id", "kept_ts_us"])


#: events per user before the pre-split machinery engages. Below it a
#: user's whole history is one comfortable pandas group (100k rows ≈ a
#: few MB) and the single-group loop is strictly cheaper — the measured
#: constant of the 3-stage path is ~2.6× g2's on uniform data
#: (SCALE_r8). Above it, group memory is the thing that breaks first at
#: 100 TB, and the bounded (user, month) path takes over.
_G2B_HOT_THRESHOLD = 1_000_000


@register(
    "g2b_throttle_skewfree",
    _G2_SQL,
    tags=("applyInPandas", "grouped-map", "stateful-batch", "throttle", "skew", "headline"),
    doc="Skew-robust greedy throttle — the (user, month) pre-split with "
    "carry-in state that g2's scale notes promise, IMPLEMENTED and "
    "bit-identical to g2 (same recursive-CTE oracle verbatim), with "
    "HYBRID dispatch: an exact per-user event count routes only users "
    f"above {_G2B_HOT_THRESHOLD:,} events through the pre-split "
    "machinery (the hot set is bounded by corpus/threshold, so it "
    "broadcasts); everyone else keeps g2's one-shuffle single-group "
    "loop. Hot path: phase 1 summarizes each (user, month) into its "
    "possible entry events + greedy carry-outs (jump-pointer chains, "
    "one vectorized searchsorted + one O(n) reverse pass); phase 2 "
    "threads last-kept state across months per user over SUMMARY rows "
    "only (months + first-GAP-window events, ~1/30th of a dense "
    "user's rows at 1-day GAP over monthly splits); phase 3 replays "
    "the chain from each month's resolved entry. Worst-case per-task "
    "memory drops from one user's full history to one user-month; "
    "shuffles stay on (user, month) / user keys — no all-pairs, no "
    "driver state. Both routes are exact, so the dispatch is "
    "output-invisible (tests pin threshold=0 ≡ default ≡ g2)",
)
def g2b_throttle_skewfree(
    spark: SparkSession, sf_dir: str, *, hot_threshold: int = _G2B_HOT_THRESHOLD
) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("kept_ts_us"),
            F.unix_micros(F.date_trunc("month", "ts")).alias("month_us"),
        )
    )
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > hot_threshold)
        .select("user_id")
    )
    cold_out = _throttle_all(
        ev.join(F.broadcast(hot), "user_id", "left_anti").drop("month_us")
    )
    hot_ev = ev.join(F.broadcast(hot), "user_id", "left_semi")
    summaries = hot_ev.groupBy("user_id", "month_us").applyInPandas(
        _g2b_month_summary, schema=_G2B_SUMMARY_SCHEMA
    )
    entries = summaries.groupBy("user_id").applyInPandas(
        _g2b_chain_months, schema=_G2B_ENTRY_SCHEMA
    )
    hot_out = (
        hot_ev.join(entries, ["user_id", "month_us"])
        .groupBy("user_id", "month_us")
        .applyInPandas(_g2b_replay, schema=_G2_SCHEMA)
    )
    return cold_out.unionByName(hot_out)


@register(
    "x3_json_schema_audit",
    # json_extract errors (not NULLs) on malformed input in DuckDB, so
    # every extraction sits behind the json_valid guard
    """WITH p AS (
         SELECT event_type, props,
                COALESCE(CASE WHEN props IS NOT NULL AND json_valid(props)
                               THEN json_type(props) END = 'OBJECT',
                         FALSE) AS is_obj,
                CASE WHEN props IS NOT NULL AND json_valid(props)
                     THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                END AS k
         FROM events)
       SELECT event_type,
              COUNT(*) AS n_rows,
              SUM(CASE WHEN is_obj THEN 1 ELSE 0 END)::BIGINT AS n_objects,
              SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_with_k,
              CAST(MIN(k) AS BIGINT) AS k_min,
              CAST(MAX(k) AS BIGINT) AS k_max,
              CAST(SUM(k) AS BIGINT) AS k_sum
       FROM p GROUP BY event_type""",
    tags=("json", "semistructured", "schema-audit"),
    doc="Typed JSON ingestion audit: props parses through a DECLARED "
    "schema (from_json(props, 'k bigint') — the typed path, vs x1's "
    "stringly get_json_object) and each type reports row count, "
    "well-formed-object count (from_json yields NULL on malformed "
    "input or a non-object; the oracle mirrors that with json_valid + "
    "json_type='OBJECT'), key-presence count, and min/max/sum of the "
    "typed field — the schema-drift tripwire an evolving event feed "
    "needs. Malformed-JSON and missing-key paths are pinned on "
    "crafted rows in tests/test_r7_ops.py (the fixture is uniformly "
    "well-formed). Scan-side projection + one hash agg; JSON parsing "
    "stays inside codegen, no Python",
)
def x3_json_schema_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # PERMISSIVE from_json yields an all-null ROW (not NULL) on malformed
    # input, so well-formedness must be read off a corrupt-record column
    parsed = F.from_json(
        "props",
        "k bigint, _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    is_object = F.col("props").isNotNull() & F.col("p._corrupt").isNull()
    k = parsed["k"]
    return (
        ev.select("event_type", "props", parsed.alias("p"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(is_object, 1).otherwise(0))
            .cast("bigint")
            .alias("n_objects"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_k"),
            F.min("k").cast("bigint").alias("k_min"),
            F.max("k").cast("bigint").alias("k_max"),
            F.sum("k").cast("bigint").alias("k_sum"),
        )
    )


@register(
    "x4_jsonl_source_scan",
    """SELECT event_type,
              COUNT(*) AS n_rows,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
              MIN(event_id) AS min_id,
              MAX(event_id) AS max_id,
              MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us,
              SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_ts
       FROM events GROUP BY event_type""",
    tags=("source", "jsonl", "roundtrip"),
    doc="JSONL source-format round-trip: events export to newline-"
    "delimited JSON (the lingua franca of LLM corpus drops — staged "
    "deterministically, repr-shortest doubles, microsecond timestamp "
    "strings) and re-enter through spark.read.json with an EXPLICIT "
    "schema + timestampFormat (schema inference on JSONL is a "
    "full extra pass AND type-unstable — never at 100 TB). The "
    "aggregate must match DuckDB reading the ORIGINAL parquet: "
    "count, decimal-exact value sums, id range, max event time, null-"
    "timestamp count — any serialization loss (float shortening, "
    "timezone shift, null coercion) breaks the hash. The S-family "
    "counterpart of S1's CSV scan",
)
def x4_jsonl_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import stage_events_jsonl

    path = stage_events_jsonl(sf_dir)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    ev = (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(path)
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null_ts"),
    )


_SM8_HASH_SRC = (
    "CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 3 + 1"
)


@register(
    "sm8_epoch_replication_mix",
    f"""WITH d AS (
         SELECT source, {_SM8_HASH_SRC} AS rep,
                len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok
         FROM documents),
       e AS (SELECT source, rep, n_tok
             FROM d, LATERAL (SELECT unnest(range(rep)) AS epoch) u)
       SELECT source,
              CAST(MAX(rep) AS BIGINT) AS rep_factor,
              CAST(COUNT(*) / MAX(rep) AS BIGINT) AS n_docs,
              COUNT(*) AS n_rows_replicated,
              CAST(SUM(n_tok) / MAX(rep) AS BIGINT) AS tok_raw,
              CAST(SUM(n_tok) AS BIGINT) AS tok_replicated
       FROM e GROUP BY source""",
    tags=("sampling", "mixing", "replication"),
    doc="Epoch-replication mixing — the Llama/Pile-style upsampling "
    "where high-value domains repeat for multiple epochs in one "
    "training pass: each source gets a deterministic replication "
    "factor (portable md5-mod → 1-3 here; production binds curated "
    "weights), documents EXPLODE into per-epoch rows "
    "(explode(sequence(1, rep)) — rows really multiply, downstream "
    "packing/shuffling sees the replicated stream, unlike sm5's "
    "rate-based expected shares), and the audit reports raw vs "
    "replicated doc/token masses per source. The aggregate divides "
    "back by rep to prove replication is EXACT (n_rows = rep × docs). "
    "Scan-side explode + one hash agg; replication factor is a "
    "column, so a 100 TB run never materializes the replicas before "
    "the shuffle that needs them",
)
def sm8_epoch_replication_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rep = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("bigint") % 3 + 1
    )
    d = docs.select(
        "source",
        rep.alias("rep"),
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n_tok"),
    )
    e = d.select(
        "source", "rep", "n_tok", F.explode(F.sequence(F.lit(1), F.col("rep"))).alias("epoch")
    )
    return e.groupBy("source").agg(
        F.max("rep").cast("bigint").alias("rep_factor"),
        (F.count(F.lit(1)) / F.max("rep")).cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_rows_replicated"),
        (F.sum("n_tok") / F.max("rep")).cast("bigint").alias("tok_raw"),
        F.sum("n_tok").cast("bigint").alias("tok_replicated"),
    )


# ---------------------------------------------------------------------------
# sm9: epoch-aware mixture SCHEDULE — sm5 computes one temperature mix;
# real multi-epoch training runs ANNEAL the temperature across epochs.
# Pure metadata op: one corpus agg, then bounded-dimension arithmetic.
# ---------------------------------------------------------------------------

_SM9_EPOCHS = 4
_SM9_SCALE = 1000  # milli-scaled integer weights. SCALE DIAL: keeps
# budget*s inside BIGINT up to ~10^14 corpus tokens; beyond that drop
# to x1 (weights are already >= 10^6 there, quantization loss is ppm)


@register(
    "sm9_epoch_mix_schedule",
    f"""WITH st AS (
          SELECT lang,
                 CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS n
          FROM documents GROUP BY lang),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM st),
        ep AS (SELECT unnest(range(1, {_SM9_EPOCHS} + 1)) AS epoch),
        w AS (
          SELECT e.epoch, s.lang, s.n,
                 CAST(FLOOR(CASE CAST(e.epoch AS INT)
                     WHEN 1 THEN CAST(s.n AS DOUBLE)
                     WHEN 2 THEN SQRT(CAST(s.n AS DOUBLE))
                     WHEN 3 THEN SQRT(SQRT(CAST(s.n AS DOUBLE)))
                     ELSE SQRT(SQRT(SQRT(CAST(s.n AS DOUBLE)))) END
                     * {_SM9_SCALE}) AS BIGINT) AS s
          FROM ep e CROSS JOIN st s),
        sw AS (SELECT epoch, lang, n, s,
                      SUM(s) OVER (PARTITION BY epoch) AS s_tot
               FROM w),
        b AS (SELECT epoch, lang, n, s, s_tot,
                     (t // {_SM9_EPOCHS})
                     + CASE WHEN epoch <= t % {_SM9_EPOCHS} THEN 1 ELSE 0 END
                         AS budget
              FROM sw, tot),
        q AS (SELECT epoch, lang, n, s, s_tot, budget,
                     (budget * s) // s_tot AS base,
                     (budget * s) % s_tot AS rem
              FROM b),
        d AS (SELECT *,
                     budget - SUM(base) OVER (PARTITION BY epoch) AS deficit,
                     ROW_NUMBER() OVER (PARTITION BY epoch
                                        ORDER BY rem DESC, lang) AS rr
              FROM q)
        SELECT CAST(epoch AS INT) AS epoch, lang,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(s AS BIGINT) AS weight_milli,
               CAST(budget AS BIGINT) AS epoch_budget,
               CAST(base + CASE WHEN rr <= deficit THEN 1 ELSE 0 END AS BIGINT)
                   AS quota_tokens
        FROM d""",
    tags=("sampling", "mixing", "schedule", "metadata-only"),
    doc="Epoch-annealed mixture schedule — sm5's temperature mix extended "
    "over a training RUN: epoch e weights language token masses by "
    "n^(1/2^(e-1)), realized as e-1 NESTED SQRTs (each sqrt is "
    "IEEE-identical cross-engine; arbitrary pow() is not guaranteed to "
    "be) — epoch 1 trains proportional, later epochs progressively "
    "flatten toward uniform (the curriculum an annealed multilingual "
    "run uses). The global token budget T (= one corpus mass) splits "
    "into per-epoch budgets T div E (+1 for the first T mod E epochs), "
    "and each epoch's budget apportions across languages by "
    "LARGEST-REMAINDER on milli-scaled integer weights: base = "
    "(B*s) div s_tot, the deficit B - sum(base) goes +1 each to the "
    "largest (rem DESC, lang) ranks. CONSERVATION LAWS (pinned in "
    "tests/test_r10_ops.py): sum of quotas per epoch == that epoch's "
    "budget EXACTLY, and the grand total == T exactly — integer "
    "apportionment, no drifting float shares. Pure metadata: ONE "
    "corpus-sized agg (per-lang token count), then every later stage "
    "operates on the 4x5 epoch-lang frame (bounded crossJoins of "
    "aggregated sides, the e6/a16 pattern); nothing data-sized moves.",
)
def sm9_epoch_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    st = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")))
        .cast("bigint")
        .alias("n")
    )
    tot = st.agg(F.sum("n").cast("bigint").alias("t"))
    ep = spark.range(1, _SM9_EPOCHS + 1).select(F.col("id").alias("epoch"))
    nd = F.col("n").cast("double")
    w_expr = (
        F.when(F.col("epoch") == 1, nd)
        .when(F.col("epoch") == 2, F.sqrt(nd))
        .when(F.col("epoch") == 3, F.sqrt(F.sqrt(nd)))
        .otherwise(F.sqrt(F.sqrt(F.sqrt(nd))))
    )
    w = (
        F.broadcast(ep)
        .crossJoin(st)
        .select(
            "epoch", "lang", "n",
            F.floor(w_expr * _SM9_SCALE).cast("bigint").alias("s"),
        )
    )
    we = Window.partitionBy("epoch")
    sw = w.withColumn("s_tot", F.sum("s").over(we))
    b = sw.crossJoin(F.broadcast(tot)).withColumn(
        "budget",
        F.expr(f"t div {_SM9_EPOCHS}")
        + F.when(F.col("epoch") <= F.col("t") % _SM9_EPOCHS, 1).otherwise(0),
    )
    q = b.withColumn("base", F.expr("(budget * s) div s_tot")).withColumn(
        "rem", (F.col("budget") * F.col("s")) % F.col("s_tot")
    )
    d = q.withColumn("deficit", F.col("budget") - F.sum("base").over(we)).withColumn(
        "rr", F.row_number().over(Window.partitionBy("epoch").orderBy(F.desc("rem"), "lang"))
    )
    return d.select(
        F.col("epoch").cast("int").alias("epoch"),
        "lang",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("s").cast("bigint").alias("weight_milli"),
        F.col("budget").cast("bigint").alias("epoch_budget"),
        (F.col("base") + F.when(F.col("rr") <= F.col("deficit"), 1).otherwise(0))
        .cast("bigint")
        .alias("quota_tokens"),
    )


# ---------------------------------------------------------------------------
# sm10: duplication-aware sampling weights — the data-constrained-scaling
# "soft dedup" (Muennighoff et al. 2023): instead of hard-dropping
# near-duplicates, each dup CLUSTER collectively receives the sampling
# mass one unique document gets, apportioned integer-exactly across its
# members. Composes the d5 LSH pair surface + d8's component discipline.
# ---------------------------------------------------------------------------

_SM10_SCALE = 1_000_000  # micro-scaled integer weights: a singleton doc
# weighs exactly 10^6; a cluster of n near-dups splits 10^6 across its
# members by largest-remainder (10^6 div n each, +1 for the first
# 10^6 mod n members by doc_id) — so SUM(weight) == 10^6 * n_clusters
# EXACTLY (the conservation pin in tests/test_r11_ops.py)


def _sql_sm10() -> str:
    from ..catalog import REGISTRY
    from .dedup import _SQL_CORPUS

    d5 = REGISTRY["d5_lsh_jaccard_dedup"].sql
    return f"""WITH RECURSIVE
        corpus AS MATERIALIZED ({_SQL_CORPUS}),
        pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({d5})),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION
                  SELECT doc_b AS src, doc_a AS dst FROM pairs),
        reach(src, dst) AS (
          SELECT src, src FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
        cc AS (SELECT src AS doc_id, MIN(dst) AS rep FROM reach GROUP BY src),
        m AS (
          SELECT c.doc_id, COALESCE(cc.rep, c.doc_id) AS rep
          FROM corpus c LEFT JOIN cc USING (doc_id)),
        sz AS (SELECT rep, COUNT(*) AS n FROM m GROUP BY rep),
        rn AS (
          SELECT m.doc_id, m.rep, s.n,
                 ROW_NUMBER() OVER (PARTITION BY m.rep ORDER BY m.doc_id) AS rn
          FROM m JOIN sz s ON s.rep = m.rep)
        SELECT doc_id,
               CAST(rep AS BIGINT) AS rep,
               CAST(n AS BIGINT) AS cluster_size,
               CAST(({_SM10_SCALE} // n)
                    + CASE WHEN rn <= {_SM10_SCALE} % n THEN 1 ELSE 0 END
                    AS BIGINT) AS weight_micro
        FROM rn"""


@register(
    "sm10_dupaware_weights",
    _sql_sm10(),
    tags=("sampling", "dedup", "weights", "iterative"),
    doc="Duplication-aware sampling weights — the 'soft dedup' of "
    "data-constrained scaling (Muennighoff et al. 2023 treat repeated "
    "data as worth less than fresh data; production mixes downweight "
    "dup clusters instead of hard-dropping): near-dup clusters come "
    "from the d5 MinHash-LSH pair surface resolved to components by "
    "the d8 large-star/small-star fixpoint (O(log n) rounds), every "
    "corpus doc outside any pair is its own singleton, and each "
    "cluster's members split ONE document's sampling mass (10^6 "
    "micro-units) by largest-remainder apportionment — base = 10^6 "
    "div n, +1 for the first 10^6 mod n members by doc_id. "
    "CONSERVATION LAW (pinned in tests/test_r11_ops.py): "
    "SUM(weight_micro) over any cluster == 10^6 exactly, so the "
    "corpus' total sampling mass equals its UNIQUE-document count — "
    "integer apportionment, no drifting float shares. The oracle "
    "replays the full pipeline (LSH bands -> Jaccard>=0.5 pairs -> "
    "recursive transitive closure -> apportionment). Plan: everything "
    "through components is d5/d8's audited shape (shingle-bucketed "
    "candidates, star rounds on narrow bigint pairs); the weight pass "
    "adds one size agg plus a per-cluster window whose partitions are "
    "dup-cluster-sized (tiny by construction — a 100 TB corpus has "
    "bounded clone-cluster width after d5's banding).",
)
def sm10_dupaware_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import corpus_with_dups, d5_lsh_jaccard_dedup
    from .pipeline import connected_components

    pairs = d5_lsh_jaccard_dedup(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs)
    corpus = corpus_with_dups(spark, sf_dir).select("doc_id")
    m = corpus.join(cc.withColumnRenamed("rep", "cc_rep"), "doc_id", "left").select(
        "doc_id", F.coalesce("cc_rep", "doc_id").alias("rep")
    )
    sz = m.groupBy("rep").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("rep").orderBy("doc_id")
    rn = m.join(sz, "rep").withColumn("rn", F.row_number().over(w))
    return rn.select(
        "doc_id",
        F.col("rep").cast("bigint").alias("rep"),
        F.col("n").cast("bigint").alias("cluster_size"),
        (
            F.expr(f"{_SM10_SCALE} div n")
            + F.when(F.col("rn") <= _SM10_SCALE % F.col("n"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("weight_micro"),
    )


# ---------------------------------------------------------------------------
# sm13: DSIR-style importance resampling (VERDICT r13 item 4)
# ---------------------------------------------------------------------------

# Data Selection with Importance Resampling (Xie et al. 2023, "DSIR"):
# pick raw-pool documents whose hashed n-gram feature profile looks like
# a TARGET domain. Per document, the importance weight is
# Π p_target(feature) / p_proposal(feature) over its (hashed-bigram)
# feature occurrences; DSIR then samples ∝ weight. Engine form, kept
# integer-exact end to end:
#   * features: word bigrams hashed into B=64 buckets (hash32 % B — the
#     shared cross-engine hash idiom);
#   * bucket distributions: add-1 smoothed occurrence counts over the
#     target slice (source = 'src0') and the proposal pool (the rest);
#   * log-weight surrogate: Σ_occurrences bl(tgt[b]·Tp) − bl(prop[b]·Tt)
#     (bl = floor-log2 bit length, the t24/t30 discipline — a SIGNED
#     integer score ≈ log2 of the importance weight);
#   * admission ∝ weight: keep_ppm = 10^6 >> min(20, s_max − score) —
#     halving the admission rate per surrogate bit below the pool max
#     IS "probability proportional to weight" in the integer surrogate
#     space (2^score ∝ weight), realized as sm4/sm5's deterministic
#     per-doc hash-ppm threshold, so the cut is reproducible across
#     engines, partitionings, and resumes.
_SM13_B = 64
_SM13_TARGET = "src0"
_SM13_SHIFT_CAP = 20  # 10^6 >> 20 = 0: >=20 bits below max → never admitted

_SM13_SQL_H32 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


def _sm13_admissions(docs: DataFrame) -> DataFrame:
    """Per-pool-doc DSIR frame: (doc_id, lang, score, shift, keep_ppm,
    admitted). Takes the documents frame as input so tests can feed
    repartitioned variants — every column here is a pure function of the
    DATA (hash32 of content-derived keys), so the output is byte-stable
    under any physical layout (the sm12 determinism contract)."""
    spark = docs.sparkSession
    big = token_pairs(docs, ["doc_id", "lang", "source"], tokens("text"))
    occ = big.select(
        "doc_id", "lang", "source",
        (hash32(F.concat_ws(" ", "w1", "w2")) % _SM13_B).alias("feat"),
    )
    is_tgt = F.col("source") == _SM13_TARGET
    tcnt = occ.where(is_tgt).groupBy("feat").agg(F.count(F.lit(1)).alias("ct"))
    pcnt = occ.where(~is_tgt).groupBy("feat").agg(F.count(F.lit(1)).alias("cp"))
    dim = (
        spark.range(_SM13_B)
        .select(F.col("id").alias("feat"))
        .join(tcnt, "feat", "left")
        .join(pcnt, "feat", "left")
        .select(
            "feat",
            (F.coalesce("ct", F.lit(0)) + 1).cast("bigint").alias("tgt"),
            (F.coalesce("cp", F.lit(0)) + 1).cast("bigint").alias("prop"),
        )
    )
    tot = dim.agg(
        F.sum("tgt").cast("bigint").alias("tt"), F.sum("prop").cast("bigint").alias("tp")
    )
    dim_t = dim.crossJoin(F.broadcast(tot))  # 64 rows — broadcast onto occurrences
    bl = lambda c: F.length(F.bin(c))  # noqa: E731
    term = bl(F.col("tgt") * F.col("tp")) - bl(F.col("prop") * F.col("tt"))
    scored = (
        occ.where(~is_tgt)
        .join(F.broadcast(dim_t), "feat")
        .groupBy("doc_id", "lang")
        .agg(F.sum(term).cast("bigint").alias("score"))
    )
    smax = scored.agg(F.max("score").alias("s_max"))
    shift = F.least(F.lit(_SM13_SHIFT_CAP), F.col("s_max") - F.col("score"))
    return (
        scored.crossJoin(F.broadcast(smax))
        .withColumn("shift", shift.cast("bigint"))
        .withColumn("keep_ppm", F.expr(f"{_PPM} div cast(pow(2, shift) as bigint)"))
        .withColumn("admitted", hash_bucket("doc_id", _PPM) < F.col("keep_ppm"))
        .select("doc_id", "lang", "score", "shift", "keep_ppm", "admitted")
    )


def _sql_sm13() -> str:
    h = _SM13_SQL_H32.format(x="w1 || ' ' || w2")
    hd = _SM13_SQL_H32.format(x="CAST(doc_id AS VARCHAR)")
    return f"""WITH toks AS MATERIALIZED (
          SELECT doc_id, lang, source,
                 string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents),
        big AS (
          SELECT doc_id, lang, source, w1, w2
          FROM (SELECT doc_id, lang, source,
                       unnest(list_transform(range(1, len(t)),
                              i -> {{'w1': t[i], 'w2': t[i + 1]}}),
                              recursive := true)
                FROM toks)),
        occ AS MATERIALIZED (
          SELECT doc_id, lang, source, {h} % {_SM13_B} AS feat FROM big),
        dim AS (
          SELECT r.range AS feat,
                 CAST(1 + COALESCE(tc.ct, 0) AS BIGINT) AS tgt,
                 CAST(1 + COALESCE(pc.cp, 0) AS BIGINT) AS prop
          FROM range({_SM13_B}) r
          LEFT JOIN (SELECT feat, COUNT(*) AS ct FROM occ
                     WHERE source = '{_SM13_TARGET}' GROUP BY feat) tc
            ON r.range = tc.feat
          LEFT JOIN (SELECT feat, COUNT(*) AS cp FROM occ
                     WHERE source <> '{_SM13_TARGET}' GROUP BY feat) pc
            ON r.range = pc.feat),
        tot AS (SELECT CAST(SUM(tgt) AS BIGINT) AS tt,
                       CAST(SUM(prop) AS BIGINT) AS tp FROM dim),
        scored AS MATERIALIZED (
          SELECT o.doc_id, o.lang,
                 CAST(SUM(length(bin(d.tgt * t.tp))
                          - length(bin(d.prop * t.tt))) AS BIGINT) AS score
          FROM occ o JOIN dim d ON o.feat = d.feat CROSS JOIN tot t
          WHERE o.source <> '{_SM13_TARGET}'
          GROUP BY o.doc_id, o.lang),
        smax AS (SELECT MAX(score) AS s_max FROM scored),
        adm AS (
          SELECT doc_id, lang, score,
                 {_PPM} // CAST(POWER(2, LEAST({_SM13_SHIFT_CAP},
                                               s_max - score)) AS BIGINT)
                     AS keep_ppm,
                 {hd} % {_PPM} AS h_ppm
          FROM scored, smax)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_pool,
               CAST(SUM(keep_ppm) AS BIGINT) AS mass_ppm,
               CAST(COUNT(CASE WHEN h_ppm < keep_ppm THEN 1 END) AS BIGINT)
                   AS n_admitted
        FROM adm GROUP BY lang"""


@register(
    "sm13_dsir_resample",
    _sql_sm13(),
    tags=("sampling", "weighted", "dsir", "headline"),
    doc="DSIR-style importance resampling (Xie et al. 2023): select "
    "raw-pool documents whose hashed-bigram feature profile matches the "
    f"target domain (source = '{_SM13_TARGET}'). Feature buckets are "
    f"hash32(bigram) % {_SM13_B}; target/proposal bucket distributions "
    "are add-1 smoothed occurrence counts; the per-doc importance "
    "log-weight is the SIGNED integer surrogate Σ bl(tgt·Tp) − "
    "bl(prop·Tt) (floor-log2 bit lengths — bit-identical cross-engine, "
    "the t24/t30 discipline); admission probability is proportional to "
    "the weight via keep_ppm = 10^6 >> (s_max − score) capped at "
    f"{_SM13_SHIFT_CAP} bits (2^score ∝ weight, so halving the rate per "
    "bit below the pool max IS ∝-weight sampling in surrogate space), "
    "realized as sm4/sm5's deterministic per-doc hash-ppm threshold — "
    "reproducible across engines, partitionings, reruns, and resumes. "
    "Output per language: pool size, admitted integer target mass "
    "(Σ keep_ppm — the conservation quantity tests pin), admitted "
    "count. Plan: ONE tokenize+lead corpus pass; bucket stats are two "
    f"map-side-combinable aggs folded into a {_SM13_B}-row dimension "
    "with a 1-row totals broadcast; scoring joins the occurrence stream "
    "to the BROADCAST 64-row dimension (no shuffle of occurrences "
    "beyond the doc-keyed score agg); the pool-max scalar is a 1-row "
    "broadcast (bounded BNLJ, t24 adjudication). At 100 TB: corpus "
    "passes = 1, everything after is doc-keyed with map-side combine — "
    "the DSIR paper's hashed-feature trick is exactly what keeps the "
    "model a 64-row table instead of a vocabulary.",
)
def sm13_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    adm = _sm13_admissions(docs)
    return adm.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pool"),
        F.sum("keep_ppm").cast("bigint").alias("mass_ppm"),
        F.count(F.when(F.col("admitted"), 1)).cast("bigint").alias("n_admitted"),
    )


# ---------------------------------------------------------------------------
# sm14: DoReMi-style mixture-weight optimization (VERDICT r14 item 6)
# ---------------------------------------------------------------------------

# DoReMi (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up
# Language Model Pretraining") tunes per-domain sampling weights by Group
# DRO: domains whose data the reference model finds HARD (positive excess
# loss) get multiplicatively upweighted, then weights renormalize and mix
# with a little uniform smoothing. Engine form, integer-exact end to end:
#   * frozen reference LM = t30's stupid-backoff bigram model trained on
#     the doc_id % 10 < 8 hash slice — "frozen" because it never changes
#     across iterations (the paper's trained reference checkpoint);
#   * per-domain reference loss L[d] = (10^6 · Σ bits_total) div
#     Σ n_bigrams over ALL of the domain's docs, in the t24/t30 floor-log2
#     surrogate (micro-bits per bigram, a bigint);
#   * T fixed Group-DRO steps (CTE-unrolled in the oracle, the t15
#     discipline). Step t: baseline = (Σ w·L) div PPM (the w-weighted mean
#     loss); excess[d] = clamp(L[d] − baseline, 0, CAP) — the paper's
#     max(0, ·) clamp plus a 1-bit/bigram trust region that also keeps
#     PPM·u inside int64; multiplicative update u = w·(C + excess) (the
#     exponentiated-gradient step, first-order in fixed point with
#     η = 1/C per micro-bit); largest-remainder renormalize to EXACTLY
#     PPM; then smooth w ← ((PPM−SM)·w + SM·uniform) div PPM with a
#     second largest-remainder pass — Σ w == PPM after EVERY step (the
#     conservation law the tests pin).
_SM14_T = 5            # fixed iteration count (unrolled in the oracle)
_SM14_C = 1_000_000    # fixed-point one: update factor = C + excess
_SM14_CAP = 1_000_000  # per-step excess clamp (= 1 bit/bigram)
_SM14_SM = 10_000      # 1% uniform smoothing per step, in ppm


def _sql_sm14() -> str:
    head = f"""WITH toks AS MATERIALIZED (
          SELECT doc_id, source, {_SQL_TOKENS_SM14} AS t FROM documents),
        big AS MATERIALIZED (
          SELECT doc_id, source, w1, w2
          FROM (SELECT doc_id, source,
                       unnest(list_transform(range(1, len(t)),
                              i -> {{'w1': t[i], 'w2': t[i + 1]}}),
                              recursive := true)
                FROM toks)),
        bc AS (SELECT w1, w2, COUNT(*) AS cnt FROM big
               WHERE doc_id % 10 < 8 GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS cc FROM bc GROUP BY w1),
        uni AS (SELECT w2 AS w, COUNT(*) AS ucnt
                FROM (SELECT doc_id, unnest(t) AS w2 FROM toks)
                WHERE doc_id % 10 < 8 GROUP BY w2),
        tt AS (SELECT length(bin(CAST(SUM(ucnt) AS BIGINT))) AS blt FROM uni),
        j AS (
          SELECT e.source, b.cnt, c.cc, u.ucnt
          FROM big e
          LEFT JOIN bc b ON e.w1 = b.w1 AND e.w2 = b.w2
          LEFT JOIN ctx c ON e.w1 = c.w1
          LEFT JOIN uni u ON e.w2 = u.w),
        pd AS (
          SELECT source,
                 COUNT(*) AS n_bigrams,
                 COUNT(CASE WHEN cnt IS NULL AND ucnt IS NOT NULL THEN 1 END)
                     AS n_backoff,
                 COUNT(CASE WHEN cnt IS NULL AND ucnt IS NULL THEN 1 END)
                     AS n_oov,
                 CAST(COALESCE(SUM(CASE WHEN cnt IS NOT NULL
                          THEN length(bin(cc)) - length(bin(cnt)) END), 0)
                      AS BIGINT) AS bits_seen,
                 CAST(COALESCE(SUM(CASE WHEN cnt IS NULL AND ucnt IS NOT NULL
                          THEN length(bin(ucnt)) END), 0)
                      AS BIGINT) AS bl_bo
          FROM j GROUP BY source),
        dom AS MATERIALIZED (
          SELECT source, CAST(n_bigrams AS BIGINT) AS n_bigrams,
                 CAST(bits_seen + (n_backoff + n_oov) * (1 + blt) - bl_bo
                      AS BIGINT) AS bits_total
          FROM pd, tt),
        l AS MATERIALIZED (SELECT source, n_bigrams, bits_total,
                     (bits_total * {_PPM}) // n_bigrams AS micro_loss
              FROM dom),
        kk AS MATERIALIZED (SELECT COUNT(*) AS k FROM l),
        w0 AS MATERIALIZED (
          SELECT source, n_bigrams, bits_total, micro_loss,
                 {_PPM} // k + CASE WHEN ROW_NUMBER() OVER (ORDER BY source)
                                         <= {_PPM} % k THEN 1 ELSE 0 END
                     AS uni_w,
                 CAST({_PPM} // k + CASE WHEN ROW_NUMBER() OVER (ORDER BY source)
                                         <= {_PPM} % k THEN 1 ELSE 0 END
                      AS BIGINT) AS w
          FROM l, kk)"""
    its = []
    for t in range(_SM14_T):
        its.append(f""",
        bl{t} AS MATERIALIZED (
          SELECT CAST(SUM(w * micro_loss) // {_PPM} AS BIGINT) AS b FROM w{t}),
        u{t} AS MATERIALIZED (
          SELECT source, n_bigrams, bits_total, micro_loss, uni_w,
                 w * ({_SM14_C} + LEAST({_SM14_CAP},
                     GREATEST(0, micro_loss - b))) AS u
          FROM w{t}, bl{t}),
        su{t} AS MATERIALIZED (SELECT SUM(u) AS su FROM u{t}),
        r{t} AS MATERIALIZED (
          SELECT source, n_bigrams, bits_total, micro_loss, uni_w,
                 CAST(({_PPM} * u) // su AS BIGINT) AS base,
                 ROW_NUMBER() OVER (
                     ORDER BY ({_PPM} * u) % su DESC, source) AS rr
          FROM u{t}, su{t}),
        sb{t} AS MATERIALIZED (SELECT SUM(base) AS sb FROM r{t}),
        p{t} AS MATERIALIZED (
          SELECT source, n_bigrams, bits_total, micro_loss, uni_w,
                 ({_PPM} - {_SM14_SM})
                   * (base + CASE WHEN rr <= {_PPM} - sb THEN 1 ELSE 0 END)
                 + {_SM14_SM} * uni_w AS wsm
          FROM r{t}, sb{t}),
        sw{t} AS MATERIALIZED (SELECT SUM(wsm // {_PPM}) AS sw FROM p{t}),
        w{t + 1} AS MATERIALIZED (
          SELECT source, n_bigrams, bits_total, micro_loss, uni_w,
                 CAST(wsm // {_PPM}
                      + CASE WHEN ROW_NUMBER() OVER (
                                      ORDER BY wsm % {_PPM} DESC, source)
                                  <= {_PPM} - sw
                             THEN 1 ELSE 0 END AS BIGINT) AS w
          FROM p{t}, sw{t})""")
    return (
        head
        + "".join(its)
        + f"""
        SELECT source, n_bigrams, bits_total,
               CAST(micro_loss AS BIGINT) AS micro_loss,
               CAST(uni_w AS BIGINT) AS w0_ppm,
               w AS weight_ppm
        FROM w{_SM14_T}"""
    )


_SQL_TOKENS_SM14 = "string_split_regex(trim(lower(text)), '\\s+')"


@register(
    "sm14_doremi_mixture",
    _sql_sm14(),
    tags=("sampling", "mixing", "doremi", "headline"),
    doc="DoReMi-style mixture-weight optimization (Xie et al. 2023) over "
    "sm13's domain dimension: per-domain reference loss from t30's FROZEN "
    "stupid-backoff bigram LM (trained once on the doc_id % 10 < 8 hash "
    "slice, scoring every domain's docs — the paper's reference-checkpoint "
    f"role), then {_SM14_T} Group-DRO multiplicative-weight steps, "
    "CTE-unrolled in the oracle (the t15 fixed-iteration discipline). "
    "All-integer: losses are micro-bits/bigram in the floor-log2 "
    "surrogate; each step computes the w-weighted baseline by integer "
    "div, clamps excess into [0, 1 bit/bigram] (the paper's max(0,·) "
    "plus a trust region that also bounds PPM·u inside int64), updates "
    "w ← w·(1 + excess) in fixed point, renormalizes to EXACTLY 10^6 ppm "
    "by largest remainder (ties broken by domain name), and smooths 1% "
    "toward the exact-integer uniform shares with a second largest-"
    "remainder pass — Σ weight_ppm == 10^6 after every step (the "
    "conservation law tests pin), and every quantity is deterministic "
    "under any partitioning. Plan: ONE tokenize+lead corpus pass, t30's "
    "three map-side-combinable model aggs, vocabulary-keyed LEFT joins, "
    "one domain-keyed agg — then the whole DRO loop runs on the K-row "
    "domain frame (unpartitioned windows over ~20 rows, the sm9 "
    "bounded-dimension pattern; nothing data-sized moves after the "
    "corpus pass). At 100 TB the iteration cost is O(T·K) integers — "
    "the same shape DoReMi's own weight updates have.",
)
def sm14_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sm14_weights(load_table(spark, sf_dir, "documents"))


def _sm14_weights(docs: DataFrame) -> DataFrame:
    """The sm14 pipeline over ANY (doc_id, source, text) frame — split out
    so tests can feed repartitioned variants (every quantity is a pure
    integer function of the data, so the output is byte-stable under any
    physical layout: the sm12/sm13 determinism contract)."""
    toks = docs.select("doc_id", "source", F.explode(tokens("text")).alias("tok"))
    big = token_pairs(docs, ["doc_id", "source"], tokens("text"))
    is_train = F.col("doc_id") % 10 < 8
    bc = big.where(is_train).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = bc.groupBy("w1").agg(F.sum("cnt").cast("bigint").alias("cc"))
    uni = (
        toks.where(is_train)
        .groupBy(F.col("tok").alias("w2"))
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    tt = uni.agg(F.length(F.bin(F.sum("ucnt").cast("bigint"))).alias("blt"))
    seen = F.col("cnt").isNotNull()
    known_w2 = F.col("ucnt").isNotNull()
    j = (
        big.join(bc, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(uni, ["w2"], "left")
    )
    pd_dom = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.count(F.when(~seen & known_w2, 1)).alias("n_backoff"),
        F.count(F.when(~seen & ~known_w2, 1)).alias("n_oov"),
        F.coalesce(
            F.sum(F.when(seen, F.length(F.bin("cc")) - F.length(F.bin("cnt")))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("bits_seen"),
        F.coalesce(
            F.sum(F.when(~seen & known_w2, F.length(F.bin("ucnt")))), F.lit(0)
        )
        .cast("bigint")
        .alias("bl_bo"),
    )
    dom = pd_dom.crossJoin(F.broadcast(tt)).select(
        "source",
        "n_bigrams",
        (
            F.col("bits_seen")
            + (F.col("n_backoff") + F.col("n_oov")) * (1 + F.col("blt"))
            - F.col("bl_bo")
        )
        .cast("bigint")
        .alias("bits_total"),
    )
    cur = dom.select(
        "source",
        "n_bigrams",
        "bits_total",
        F.expr(f"(bits_total * {_PPM}) div n_bigrams").alias("micro_loss"),
    )
    # exact-integer uniform shares = w_0 (K-row frame from here on: every
    # window below is unpartitioned over the ~20-row domain dimension —
    # the sm9 bounded-dimension pattern, harmless at any scale)
    cur = (
        cur.withColumn("_rn", F.expr("row_number() over (order by source)"))
        .withColumn("_k", F.expr("count(*) over ()"))
        .withColumn(
            "uni_w",
            F.expr(f"cast({_PPM} div _k + if(_rn <= {_PPM} % _k, 1, 0) as bigint)"),
        )
        .drop("_rn", "_k")
        .withColumn("w", F.col("uni_w"))
    )
    for _ in range(_SM14_T):
        cur = (
            cur.withColumn(
                "_bl", F.expr(f"(sum(w * micro_loss) over ()) div {_PPM}")
            )
            .withColumn(
                "u",
                F.expr(
                    f"w * ({_SM14_C} + least({_SM14_CAP}, "
                    "greatest(0, micro_loss - _bl)))"
                ),
            )
            .withColumn("_su", F.expr("sum(u) over ()"))
            .withColumn("base", F.expr(f"({_PPM} * u) div _su"))
            .withColumn("_rem", F.expr(f"({_PPM} * u) % _su"))
            .withColumn("rr", F.expr("row_number() over (order by _rem desc, source)"))
            .withColumn(
                "wp",
                F.expr(f"base + if(rr <= {_PPM} - sum(base) over (), 1, 0)"),
            )
            .withColumn(
                "wsm", F.expr(f"({_PPM} - {_SM14_SM}) * wp + {_SM14_SM} * uni_w")
            )
            .withColumn("b2", F.expr(f"wsm div {_PPM}"))
            .withColumn(
                "rr2", F.expr(f"row_number() over (order by wsm % {_PPM} desc, source)")
            )
            .withColumn(
                "w",
                F.expr(f"cast(b2 + if(rr2 <= {_PPM} - sum(b2) over (), 1, 0) as bigint)"),
            )
            .select("source", "n_bigrams", "bits_total", "micro_loss", "uni_w", "w")
        )
    return cur.select(
        "source",
        "n_bigrams",
        "bits_total",
        F.col("micro_loss").cast("bigint").alias("micro_loss"),
        F.col("uni_w").cast("bigint").alias("w0_ppm"),
        F.col("w").alias("weight_ppm"),
    )

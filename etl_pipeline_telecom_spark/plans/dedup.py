"""Deduplication operators over ``documents`` (north-star extensions).

Exact dedup (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash, and direct n-gram Jaccard. The similarity unit is
the 3-word shingle — the fixture vocabulary is tiny (31 words), so token
*sets* collide constantly (baseline Jaccard 0.63) while shingles stay
sparse (space ≈ 31³).

Scale design:
- the fixture corpus has no duplicates, so the dedup queries operate on a
  deterministic corpus-with-dups: every doc_id % 10 == 0 is re-inserted
  with doc_id + 10_000_000 (pure projection; no driver-side data).
- MinHash/LSH is the 100 TB path: signatures are a narrow projection per
  doc; candidate generation shuffles only (band, band-signature) keys;
  the quadratic Jaccard verification runs ONLY on bucket-collision pairs.
- all hashes are md5-derived (``functions.text.hash32``) so the DuckDB
  oracle computes bit-identical signatures.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..catalog import register
from ..functions.text import hash32, shingles, tokens
from ..sources import load_table

# (a, b) parameters for the 8 universal-hash functions h_i(x) = (a·x + b) mod P
_MH_PARAMS = [
    (2971, 12041), (4111, 5678), (5077, 91011), (6353, 121314),
    (7919, 151617), (9173, 181920), (10663, 212223), (12041, 242526),
]
_MH_PRIME = 4_294_967_311  # smallest prime > 2^32
_DUP_OFFSET = 10_000_000

_SQL_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"
# 3-word shingles in DuckDB: slice is 1-based inclusive, range end-exclusive
_SQL_SHINGLES = (
    f"CASE WHEN len({_SQL_TOKENS}) >= 3 THEN "
    f"list_transform(range(1, len({_SQL_TOKENS}) - 1), "
    f"i -> array_to_string(({_SQL_TOKENS})[i:i+2], ' ')) "
    f"ELSE [] END"
)
_SQL_CORPUS = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET} AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""
_SQL_DOC_SHINGLE = f"""
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM ({_SQL_CORPUS}))
"""
_SQL_H32 = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"


def corpus_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents plus deterministic duplicate re-insertions (see module doc)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), "text")
    )
    return docs.unionByName(dups)


def shingled_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) for ANY (doc_id, text) DataFrame — batch or a
    micro-batch inside ``foreachBatch`` (st7 streams eval docs through
    this same shingler, so the maintained bloom sees byte-identical
    shingles). See :func:`corpus_shingled` for the tokenizer rationale."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java/DuckDB \s (ASCII), not python's unicode \s

    def batches(pdfs):
        for pdf in pdfs:
            sh = [
                list(
                    dict.fromkeys(  # array_distinct: first-occurrence order
                        " ".join(tk[i : i + 3])
                        for i in range(len(tk) - 2)
                    )
                )
                if len(tk := ws.split(txt.strip().lower())) >= 3
                else []
                for txt in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sh": sh})

    return docs.mapInPandas(batches, schema="doc_id long, sh array<string>")


def corpus_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh: array<string>) — each doc's DISTINCT shingle set as an
    array column, CACHED. ``array_distinct`` dedups within the row, so
    downstream set logic needs NO ``distinct()`` shuffle; docs with < n
    tokens get an empty array (filtered where a set is required).

    The cache is load-bearing, not an optimization garnish: the shingle
    array would otherwise be recomputed by every downstream reference,
    and Spark's Generate re-evaluates an inline generator expression per
    OUTPUT row when exploded (measured 30s vs 0.3s at sf0.1). One
    evaluation per row at fill time, materialized arrays for everyone
    after. Spark dedups cache entries by plan, so the queries sharing this
    builder share one cached table. At 100 TB the same role is played by a
    materialized (doc_id, sh) parquet/bucketed intermediate instead of
    executor memory.

    The array itself is built in an Arrow ``mapInPandas`` batch, not the
    native ``transform``/``slice`` expression chain: higher-order
    functions run interpreted (no codegen) and re-evaluate outer
    expression references per element, measured ~3.2s vs ~0.6s here at
    sf0.1. The python tokenizer pins Java's ASCII ``\\s`` class so the
    values stay byte-identical to the DuckDB oracle's
    ``string_split_regex`` (the equivalent native expression is
    ``functions.text.shingles``, kept as the expression-level API)."""
    corpus = corpus_with_dups(spark, sf_dir)
    # the fixture is a single small file → 1-2 input partitions, which
    # would serialize the python stage onto one core; spread it, but cap at
    # 8: the python work here is sub-second, so more workers only add
    # process spin-up and scheduler contention (worst-case bench runs under
    # load traced to a 32-way fan-out of ~170-row batches). At real scale
    # the input is already wide and this branch is a no-op
    par = min(spark.sparkContext.defaultParallelism, 8)
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    return shingled_from_docs(corpus).cache()


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct pairs — explode of the per-doc set.

    Narrow (zero-shuffle): distinctness comes from ``array_distinct``
    inside the row, not from a global ``distinct()`` exchange."""
    return corpus_shingled(spark, sf_dir).select("doc_id", F.explode("sh").alias("shingle"))


@register(
    "d1_exact_dedup",
    f"""SELECT fingerprint, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS copies
        FROM (SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM ({_SQL_CORPUS}))
        GROUP BY fingerprint""",
    tags=("dedup",),
    doc="Exact dedup: hash-groupBy on normalized-text fingerprint, min-id canonical",
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_dups(spark, sf_dir)
    return (
        corpus.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("copies"))
    )


@register(
    "d2_dedup_stats",
    f"""SELECT COUNT(*) AS total_docs,
               COUNT(DISTINCT md5(lower(trim(text)))) AS unique_docs,
               COUNT(*) - COUNT(DISTINCT md5(lower(trim(text)))) AS removed
        FROM ({_SQL_CORPUS})""",
    tags=("dedup",),
    doc="Dedup summary: corpus size before/after exact dedup",
)
def d2_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = corpus_with_dups(spark, sf_dir)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return corpus.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.count_distinct(fp).alias("unique_docs"),
        (F.count(F.lit(1)) - F.count_distinct(fp)).alias("removed"),
    )


def _sql_minhash_cols() -> str:
    return ", ".join(
        f"MIN(({a} * h + {b}) % {_MH_PRIME}) AS mh{i}" for i, (a, b) in enumerate(_MH_PARAMS)
    )


_SQL_SIGNATURES = f"""
  SELECT doc_id, {_sql_minhash_cols()}
  FROM (SELECT doc_id, {_SQL_H32} AS h FROM ({_SQL_DOC_SHINGLE}))
  GROUP BY doc_id
"""


def _signatures_from_shingled(shingled: DataFrame) -> DataFrame:
    """MinHash signatures WITHOUT a shuffle: per-row higher-order functions
    (``transform`` + ``array_min``) instead of explode + groupBy-min. The
    whole signature computation stays inside one whole-stage-codegen span —
    at 100 TB that removes an exchange of |docs|×|shingles| rows entirely.

    Docs with empty shingle sets are filtered (the groupBy form drops them
    implicitly; ``array_min([])`` would instead yield NULL signatures)."""
    hs = F.transform(
        F.col("sh"), lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
    )
    def mh(a: int, b: int):
        # closure factory — keeps the lambda single-arg for PySpark's
        # higher-order-function arity inspection
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MH_PRIME)

    mh_cols = [
        F.array_min(F.transform("hs", mh(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(_MH_PARAMS)
    ]
    return (
        shingled.where(F.size("sh") > 0)
        .select("doc_id", hs.alias("hs"))
        .select("doc_id", *mh_cols)
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures_from_shingled(corpus_shingled(spark, sf_dir))


@register(
    "d3_minhash_signatures",
    _SQL_SIGNATURES,
    tags=("dedup", "minhash"),
    doc="MinHash signatures (8 md5-derived universal hashes over 3-word shingles)",
)
def d3_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(spark, sf_dir)


# LSH: 4 bands × 2 rows — a pair collides if any band's 2-tuple matches
_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]


def _sql_band_pairs() -> str:
    unions = [
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b
              ON a.mh{i} = b.mh{i} AND a.mh{j} = b.mh{j} AND a.doc_id < b.doc_id"""
        for i, j in _BANDS
    ]
    return " UNION ".join(unions)


def _band_buckets(sig: DataFrame) -> DataFrame:
    """Explode each signature into its 4 (band, key1, key2) bucket rows."""
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.col(f"mh{i}").alias("k1"),
                F.col(f"mh{j}").alias("k2"),
            )
            for bi, (i, j) in enumerate(_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band", "b.k1", "b.k2"
    )


def _candidates_from_sig(sig: DataFrame) -> DataFrame:
    """ONE self-join on the exploded (band, k1, k2) bucket key instead of
    one join per band: a single shuffle of 4·|docs| narrow rows, and the
    within-bucket pairing Catalyst's sort-merge handles. This is the shape
    that survives 100 TB — bucket rows are tiny regardless of doc size."""
    bk = _band_buckets(sig)
    a = bk.alias("a")
    b = bk.alias("b")
    return (
        a.join(b, ["band", "k1", "k2"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

@register(
    "d4_lsh_candidates",
    f"""WITH sig AS ({_SQL_SIGNATURES})
        SELECT doc_a, doc_b FROM ({_sql_band_pairs()})""",
    tags=("dedup", "minhash", "lsh"),
    doc="LSH candidate pairs: banded signature bucket-join (4 bands × 2 rows)",
)

def d4_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _candidates_from_sig(minhash_signatures(spark, sf_dir))


@register(
    "d5_lsh_jaccard_dedup",
    f"""WITH sig AS ({_SQL_SIGNATURES}),
        cand AS (SELECT doc_a, doc_b FROM ({_sql_band_pairs()})),
        ds AS ({_SQL_DOC_SHINGLE}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, COUNT(*) AS both_cnt
          FROM cand c
          JOIN ds sa ON sa.doc_id = c.doc_a
          JOIN ds sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY c.doc_a, c.doc_b)
        SELECT i.doc_a, i.doc_b,
               ROUND(CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt), 6) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt) >= 0.5""",
    tags=("dedup", "minhash", "lsh", "headline"),
    doc="Full MinHash-LSH near-dup pipeline: candidates → exact Jaccard ≥ 0.5. "
    "The quadratic verification only touches bucket-collision pairs — the 100 TB path.",
)
def d5_lsh_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE cached table feeds everything: shingle sets → signatures →
    # candidates, and the same sets drive the Jaccard verification.
    #
    # The verify attaches the shingle ARRAYS to the candidate pairs (two
    # equi-joins against the |docs|-row cached table) and intersects
    # per-pair with array_intersect — set sizes are F.size of the array.
    # The previous shape exploded every (doc, shingle) row and re-joined on
    # the shingle key: a |docs|·|shingles-per-doc|-row shuffle (~800k rows
    # at sf0.1) to serve a few hundred candidate pairs. Shuffling array
    # payloads only for docs that appear in candidates is also the 100 TB
    # shape — verification cost tracks the candidate count, not the corpus.
    shing = corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
    cand = _candidates_from_sig(_signatures_from_shingled(shing))
    arr_a = shing.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    arr_b = shing.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    both = F.size(F.array_intersect("sh_a", "sh_b"))
    pairs = (
        cand.join(arr_a, "doc_a")
        .join(arr_b, "doc_b")
        .withColumn("both_cnt", both)
    )
    jac = F.col("both_cnt").cast("double") / (
        F.size("sh_a") + F.size("sh_b") - F.col("both_cnt")
    )
    return (
        pairs.where(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "d6_simhash",
    f"""SELECT doc_id,
               CAST(SUM(CASE WHEN bit_set THEN power_of_two ELSE 0 END) AS BIGINT) AS simhash
        FROM (
          SELECT doc_id, b.bit AS bit_no, CAST(POW(2, b.bit) AS BIGINT) AS power_of_two,
                 SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) >= 0 AS bit_set
          FROM (SELECT doc_id, {_SQL_H32} AS h FROM ({_SQL_DOC_SHINGLE})),
               (SELECT unnest(range(0, 16)) AS bit) b
          GROUP BY doc_id, b.bit)
        GROUP BY doc_id""",
    tags=("dedup", "simhash"),
    doc="16-bit SimHash over shingle hashes (bitwise majority vote)",
)
def d6_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = doc_shingles(spark, sf_dir).select("doc_id", hash32("shingle").alias("h"))
    bits = hashed.crossJoin(spark.range(16).select(F.col("id").alias("bit_no")))
    # python F.shiftright needs a literal shift; the SQL form takes a column
    bit_of_h = F.expr("shiftright(h, cast(bit_no AS int))").bitwiseAND(F.lit(1))
    per_bit = (
        bits.groupBy("doc_id", "bit_no")
        .agg((F.sum(F.when(bit_of_h == 1, 1).otherwise(-1)) >= 0).alias("bit_set"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("bit_set"), F.pow(F.lit(2), F.col("bit_no")).cast("bigint")).otherwise(0)
        ).cast("bigint").alias("simhash")
    )


@register(
    "d7_ngram_jaccard_pairs",
    f"""WITH ds AS ({_SQL_DOC_SHINGLE}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_cnt
          FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT i.doc_a, i.doc_b,
               ROUND(CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt), 6) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt) >= 0.3""",
    tags=("dedup", "ngram"),
    doc="Direct n-gram Jaccard pairs (shingle join, no LSH prefilter) — the "
    "exhaustive baseline LSH is compared against. NEVER production: the "
    "builder refuses corpora past 20k docs (the guard job touches at most "
    "20k+1 rows) so it cannot be pointed at full-scale data; d5/d12 are "
    "the scale paths",
)
def d7_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..guards import assert_bounded_input

    shing = corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
    assert_bounded_input(shing.select("doc_id"), 20_000, "d7_ngram_jaccard_pairs corpus")
    ds = shing.select("doc_id", F.explode("sh").alias("shingle"))
    sizes = shing.select("doc_id", F.size("sh").alias("n"))
    a = ds.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = ds.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("both_cnt"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("both_cnt").cast("double") / (F.col("na") + F.col("nb") - F.col("both_cnt"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(jac >= 0.3)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# the graduated d9 oracle: the exact Jaccard-≥0.5 pair set over shared
# shingles (every J ≥ 0.5 pair shares shingles, so the shingle equi-join
# sees all of them), each claimed found. MLlib's hash family can't be
# recomputed in DuckDB, but the GRADE of its output against the exact
# answer is deterministic: a missed pair flips mllib_found to false, an
# extra pair adds a row — either hash-mismatches.
_SQL_MLLIB_GRADE = f"""WITH ds AS ({_SQL_DOC_SHINGLE}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
        inter AS (
          SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS both_cnt
          FROM ds sa JOIN ds sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
          GROUP BY sa.doc_id, sb.doc_id)
        SELECT i.doc_a, i.doc_b,
               ROUND(CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt), 6)
                   AS jaccard,
               TRUE AS mllib_found
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt) >= 0.5"""


@register(
    "d9_mllib_minhash",
    _SQL_MLLIB_GRADE,
    tags=("dedup", "minhash", "lsh", "mllib"),
    doc="MLlib MinHashLSH approxSimilarityJoin over hashed shingle vectors "
    "(seeded, deterministic per seed) — the library alternative to the "
    "hand-rolled d3-d5 pipeline — GRADED against the exact answer "
    "(VERDICT r6 item 3): the result is the union of MLlib's found pairs "
    "and the exact Jaccard-≥0.5 pairs, with the EXACT shingle-set jaccard "
    "and an mllib_found flag; the oracle recomputes the exact pair set in "
    "DuckDB claiming every pair found, so a recall miss or a hash-"
    "collision extra is a hash mismatch, even though DuckDB can't replay "
    "MLlib's hash family. Threshold 0.5+1e-6 keeps an exactly-0.5 pair "
    "included whether MLlib's distance filter is strict or inclusive. "
    "Containment verified 0-missed/0-extra on the fixtures (8 OR-ed hash "
    "tables: per-pair miss ≤ 0.5^8 at J=0.5). Recall vs d5 is separately "
    "asserted in tests/test_clustering.py.",
)
def d9_mllib_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shing = corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
    # shingle set → sparse binary vector (HashingTF binary mode keeps set
    # semantics; 2^18 buckets keeps collisions negligible for this corpus)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True)
    vecs = tf.transform(shing).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.5 + 1e-6, distCol="jaccard_dist")
    found = (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .distinct()
        .withColumn("mllib_found", F.lit(True))
    )
    # exact J >= 0.5 pairs over shared shingles (the oracle's pair set)
    ds = shing.select("doc_id", F.explode("sh").alias("shingle"))
    sizes = shing.select("doc_id", F.size("sh").alias("n"))
    inter = (
        ds.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(ds.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("both_cnt"))
    )
    jac = F.col("both_cnt").cast("double") / (F.col("na") + F.col("nb") - F.col("both_cnt"))
    exact = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .where(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    # full outer: a missed exact pair keeps its row with mllib_found=false;
    # an MLlib extra (not exact-≥0.5) surfaces as an added row with a
    # recomputed sub-threshold jaccard — both diverge from the oracle
    arr = shing.select(F.col("doc_id").alias("doc_b2"), F.col("sh").alias("sh_b"))
    arr_a = shing.select(F.col("doc_id").alias("doc_a2"), F.col("sh").alias("sh_a"))
    merged = exact.join(found, ["doc_a", "doc_b"], "full")
    extra_j = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / (
            F.size("sh_a")
            + F.size("sh_b")
            - F.size(F.array_intersect("sh_a", "sh_b"))
        ),
        6,
    )
    return (
        merged.join(arr_a, merged["doc_a"] == arr_a["doc_a2"], "left")
        .join(arr, merged["doc_b"] == arr["doc_b2"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce(F.col("jaccard"), extra_j).alias("jaccard"),
            F.coalesce(F.col("mllib_found"), F.lit(False)).alias("mllib_found"),
        )
    )


_SQL_DOC_SHINGLE_PLAIN = f"""
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM documents)
"""


@register(
    "d10_contamination_check",
    f"""WITH ds AS ({_SQL_DOC_SHINGLE_PLAIN}),
        ev AS (SELECT doc_id, shingle FROM ds WHERE doc_id % 5 = 0),
        tr AS (SELECT doc_id, shingle FROM ds WHERE doc_id % 5 <> 0)
        SELECT ev.doc_id AS eval_doc_id,
               CAST(COUNT(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs,
               CAST(COUNT(DISTINCT ev.shingle) AS BIGINT) AS n_shared_shingles
        FROM ev JOIN tr ON ev.shingle = tr.shingle
        GROUP BY ev.doc_id""",
    tags=("dedup", "contamination"),
    doc="Eval-set decontamination: for each held-out doc (doc_id % 5 == 0), "
    "count training docs sharing any 3-word shingle and the number of shared "
    "shingles — the standard benchmark-leakage check before training. Plan: "
    "one equi-join shuffled on the shingle key (reuses the cached shingle "
    "sets; originals only — the synthetic dup re-insertions are excluded so "
    "the result reflects the real corpus). At 100 TB the join key becomes "
    "the 64-bit shingle hash and the train side gets a bloom-filter "
    "prefilter, but the shape — shuffle on shingle, aggregate on eval doc — "
    "is exactly this.",
)
def d10_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = doc_shingles(spark, sf_dir).where(F.col("doc_id") < _DUP_OFFSET)
    ev = ds.where(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    tr = ds.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    return (
        ev.join(tr, "shingle")
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("train_doc_id").alias("n_train_docs"),
            F.count_distinct("shingle").alias("n_shared_shingles"),
        )
    )


def _sql_new_old_band_pairs() -> str:
    """Band-collision pairs NEW × OLD (vs _sql_band_pairs' self-pairs)."""
    unions = [
        f"""SELECT a.doc_id AS new_doc, b.doc_id AS old_doc
            FROM sig a JOIN sig b
              ON a.mh{i} = b.mh{i} AND a.mh{j} = b.mh{j}
             AND a.doc_id % 7 = 3 AND b.doc_id % 7 <> 3"""
        for i, j in _BANDS
    ]
    return " UNION ".join(unions)


# shared by d11 and d12: the persisted index (d12) must be result-neutral,
# so both are verified against the identical oracle
_SQL_INCREMENTAL_DEDUP = f"""WITH sig AS ({_SQL_SIGNATURES}),
        cand AS (SELECT DISTINCT new_doc, old_doc FROM ({_sql_new_old_band_pairs()})),
        ds AS ({_SQL_DOC_SHINGLE}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
        inter AS (
          SELECT c.new_doc, c.old_doc, COUNT(*) AS both_cnt
          FROM cand c
          JOIN ds sa ON sa.doc_id = c.new_doc
          JOIN ds sb ON sb.doc_id = c.old_doc AND sb.shingle = sa.shingle
          GROUP BY c.new_doc, c.old_doc),
        scored AS (
          SELECT i.new_doc, i.old_doc,
                 CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt) AS j
          FROM inter i
          JOIN sizes na ON na.doc_id = i.new_doc
          JOIN sizes nb ON nb.doc_id = i.old_doc
          WHERE CAST(i.both_cnt AS DOUBLE) / (na.n + nb.n - i.both_cnt) >= 0.5)
        SELECT new_doc_id, match_doc_id, ROUND(j, 6) AS jaccard FROM (
          SELECT new_doc AS new_doc_id, old_doc AS match_doc_id, j,
                 ROW_NUMBER() OVER (PARTITION BY new_doc ORDER BY j DESC, old_doc) AS rn
          FROM scored)
        WHERE rn = 1"""


@register(
    "d11_incremental_dedup",
    _SQL_INCREMENTAL_DEDUP,
    tags=("dedup", "minhash", "lsh", "incremental"),
    doc="Incremental dedup — the production shape for continuous ingestion: "
    "an arriving batch (doc_id % 7 == 3) is checked against the EXISTING "
    "corpus only, via a new×old band-bucket join (never new×new or the full "
    "self-join a batch re-run would pay), then array_intersect Jaccard ≥ 0.5 "
    "on collisions and best-match-per-new-doc (ties → lowest doc id). At "
    "100 TB the old side's bucket rows are a persisted LSH index that the "
    "batch's 4·|batch| bucket rows shuffle-join against.",
)
def d11_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    shing = corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
    bk = _band_buckets(_signatures_from_shingled(shing))
    is_new = F.col("doc_id") % 7 == 3
    new_b = bk.where(is_new).select(F.col("doc_id").alias("new_doc"), "band", "k1", "k2")
    old_b = bk.where(~is_new).select(F.col("doc_id").alias("old_doc"), "band", "k1", "k2")
    return _incremental_best_match(shing, new_b, old_b)


def _incremental_best_match(
    shing: DataFrame, new_b: DataFrame, old_b: DataFrame
) -> DataFrame:
    """Shared d11/d12 tail: new×old band-bucket candidates → array_intersect
    Jaccard ≥ 0.5 → best match per new doc (ties → lowest old doc id)."""
    from pyspark.sql import Window

    cand = new_b.join(old_b, ["band", "k1", "k2"]).select("new_doc", "old_doc").distinct()
    arr_n = shing.select(F.col("doc_id").alias("new_doc"), F.col("sh").alias("sh_n"))
    arr_o = shing.select(F.col("doc_id").alias("old_doc"), F.col("sh").alias("sh_o"))
    both = F.size(F.array_intersect("sh_n", "sh_o"))
    pairs = cand.join(arr_n, "new_doc").join(arr_o, "old_doc").withColumn("both_cnt", both)
    jac = F.col("both_cnt").cast("double") / (
        F.size("sh_n") + F.size("sh_o") - F.col("both_cnt")
    )
    scored = pairs.withColumn("j", jac).where(F.col("j") >= 0.5)
    w = Window.partitionBy("new_doc").orderBy(F.desc("j"), "old_doc")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("new_doc").alias("new_doc_id"),
            F.col("old_doc").alias("match_doc_id"),
            F.round("j", 6).alias("jaccard"),
        )
    )


_INDEX_BUCKETS = 8  # fixture-sized; at 100 TB this is thousands (128-512 MB files)


def _old_band_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OLD corpus's (old_doc, band, k1, k2) bucket rows — d11's old side."""
    shing = corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
    bk = _band_buckets(_signatures_from_shingled(shing))
    return bk.where(~(F.col("doc_id") % 7 == 3)).select(
        F.col("doc_id").alias("old_doc"), "band", "k1", "k2"
    )


def persisted_band_index(
    spark: SparkSession, sf_dir: str, *, rebuild: bool = False
) -> DataFrame:
    """Read (building once if absent) the OLD corpus's LSH band-bucket
    index: a parquet table BUCKETED AND SORTED BY (band, k1, k2).

    This is the persisted form of d11's old-side bucket rows: the one-time
    index build pays the exchange at WRITE time, and every later probe
    batch sort-merge-joins against it with ZERO shuffle on the index side
    (asserted in tests/test_plan_shapes.py). At 100 TB the index is the
    standing dedup state between ingestion batches — rebuilding it per
    batch (what d11 models) re-scans the whole corpus; probing it (d12)
    scans only co-located buckets.

    Keying: table name and path carry a hash of the ABSOLUTE sf_dir, so
    two fixture dirs sharing a basename can never collide on one index
    (ADVICE r3). The build is skipped when the index already exists
    (``rebuild=True`` forces it — the d12_index_build catalog entry);
    if the parquet files exist but the session catalog does not know the
    table (a fresh session), the bucket spec is re-registered with DDL
    instead of rewriting the data — probes measure the probe, never a
    rebuild. Staleness contract: the index is a snapshot of ``sf_dir`` at
    build time; callers mutating the corpus must pass ``rebuild=True``."""
    import hashlib
    import os

    abs_dir = os.path.abspath(sf_dir)
    base = "".join(c if c.isalnum() else "_" for c in abs_dir.rstrip("/").rsplit("/", 1)[-1])
    table = f"lsh_band_index_{base}_{hashlib.sha1(abs_dir.encode()).hexdigest()[:8]}"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        table,
    )
    from ..sources.bucketing import read_bucketed, write_bucketed

    have_table = spark.catalog.tableExists(table)
    have_files = os.path.isdir(path) and any(
        f.startswith("part-") for f in os.listdir(path)
    )
    if not rebuild and have_table and have_files:
        return read_bucketed(spark, table)
    if not rebuild and have_files and not have_table:
        # files from a previous session: re-attach the bucket spec, no rewrite
        old_b = _old_band_rows(spark, sf_dir)
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in old_b.schema.fields)
        keys = "band, k1, k2"
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) INTO {_INDEX_BUCKETS} BUCKETS "
            f"LOCATION '{path}'"
        )
        return read_bucketed(spark, table)
    if have_table:
        # stale/forced: drop so saveAsTable can overwrite the external table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        _old_band_rows(spark, sf_dir), table, path,
        buckets=_INDEX_BUCKETS, keys=["band", "k1", "k2"],
    )
    return read_bucketed(spark, table)


# the graduated d12_index_build oracle: DuckDB recomputes the band rows
# the persisted index MUST contain (signatures → band explode → old-side
# filter) and summarizes them per band. The Spark side reads the summary
# from the index it just WROTE, so a build that dropped/duplicated rows,
# mangled a bucket key, or leaked new-side docs hash-mismatches.
_SQL_INDEX_SUMMARY = f"""WITH sig AS ({_SQL_SIGNATURES}),
        bk AS ({" UNION ALL ".join(
            f"SELECT doc_id, {bi} AS band, mh{i} AS k1, mh{j} AS k2 FROM sig"
            for bi, (i, j) in enumerate(_BANDS))})
        SELECT band, COUNT(*) AS n_rows,
               COUNT(DISTINCT CAST(k1 AS VARCHAR) || ':' || CAST(k2 AS VARCHAR))
                   AS n_buckets,
               COUNT(DISTINCT doc_id) AS n_docs,
               MIN(doc_id) AS min_doc
        FROM bk WHERE doc_id % 7 <> 3
        GROUP BY band"""


@register(
    "d12_index_build",
    _SQL_INDEX_SUMMARY,
    tags=("dedup", "minhash", "lsh", "index"),
    doc="The one-time LSH index BUILD d12 probes against: the old corpus's "
    "band-bucket rows written as a parquet table bucketed+sorted by "
    "(band, k1, k2), keyed by a hash of the absolute fixture dir. Split "
    "from the probe (VERDICT r3) so benchmarks of d12 measure the "
    "shuffle-free probe, not a rebuild-per-run; this entry always rebuilds. "
    "Graduated from rows-only (VERDICT r6 item 2): the result is a "
    "deterministic per-band summary (row/bucket/doc counts + min doc id) "
    "READ BACK from the just-persisted table, verified against DuckDB "
    "recomputing the same band signatures from the corpus — the write "
    "path itself is what the hash checks. The summary agg is a drop in "
    "the bucket (4·|old docs| narrow rows), and at 100 TB doubles as the "
    "index-health stats a standing dedup service reports per rebuild.",
)
def d12_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = persisted_band_index(spark, sf_dir, rebuild=True)
    return idx.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.concat_ws(":", "k1", "k2")).alias("n_buckets"),
        F.count_distinct("old_doc").alias("n_docs"),
        F.min("old_doc").alias("min_doc"),
    )


@register(
    "d12_persisted_lsh_probe",
    _SQL_INCREMENTAL_DEDUP,
    tags=("dedup", "minhash", "lsh", "incremental", "index", "headline"),
    doc="d11's production form: the arriving batch probes a PERSISTED LSH "
    "index — the old corpus's band-bucket rows written once as a parquet "
    "table bucketed+sorted by (band, k1, k2) — instead of recomputing the "
    "old side's signatures per batch. The index side of the candidate join "
    "reads co-located buckets with zero Exchange (plan-asserted); only the "
    "batch's 4·|batch| bucket rows shuffle. Same oracle as d11 — persisting "
    "the index must be result-neutral. Reuses an existing index (built by "
    "d12_index_build or a prior run) so the measured cost is the probe; "
    "builds it once if absent.",
)
def d12_persisted_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    shing = corpus_shingled(spark, sf_dir).where(F.size("sh") > 0)
    index = persisted_band_index(spark, sf_dir)  # rebuild=False: probe-only when index exists
    new_b = (
        _band_buckets(_signatures_from_shingled(shing))
        .where(F.col("doc_id") % 7 == 3)
        .select(F.col("doc_id").alias("new_doc"), "band", "k1", "k2")
    )
    return _incremental_best_match(shing, new_b, index)


# bloom sizing: 8M bits (1 MB sketch), 3 probes — FPP ~2% at a million
# distinct eval shingles; false positives only cost join input rows, never
# correctness (the equi-join removes them)
_BLOOM_BITS = 1 << 23
_BLOOM_WORDS = _BLOOM_BITS >> 6
_BLOOM_K = 3


def _bloom_positions(h):
    """k bit positions per 64-bit hash (numpy, vectorized): two splitmix-style
    mixes of the NATIVE xxhash64 value give (h1, h2), probes h1 + i·h2 —
    standard double hashing, deterministic and engine-independent because the
    input hash is computed by Spark's own xxhash64."""
    import numpy as np

    u = h.astype(np.int64).view(np.uint64)
    h1 = u * np.uint64(0x9E3779B97F4A7C15)
    h1 ^= h1 >> np.uint64(31)
    h2 = (u * np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)  # odd stride
    mask = np.uint64(_BLOOM_BITS - 1)
    return [(h1 + np.uint64(i) * h2) & mask for i in range(_BLOOM_K)]


def _build_bloom(df_hashes) -> bytes:
    """Distributed bloom build: per-partition numpy bitset → nonzero
    (word_idx, word) rows → ``bit_or`` reduce → 1 MB of words to the driver.
    No data rows are collected (only the fixed-size sketch), and the build
    needs no distinct(): OR-ing bits is idempotent. This is the map-side-
    mergeable shape ``bloom_filter_agg`` implements in Scala — that
    aggregate isn't registered in PySpark 4.1's function registry, so the
    merge runs as a plain bit_or hash aggregate instead."""
    import numpy as np

    def bitset_words(pdfs):
        import pandas as pd

        words = np.zeros(_BLOOM_WORDS, dtype=np.uint64)
        for pdf in pdfs:
            h = pdf["h"].to_numpy()
            for pos in _bloom_positions(h):
                np.bitwise_or.at(
                    words, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        nz = np.nonzero(words)[0]
        yield pd.DataFrame({"widx": nz.astype(np.int64), "word": words[nz].view(np.int64)})

    merged = (
        df_hashes.mapInPandas(bitset_words, schema="widx long, word long")
        .groupBy("widx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .collect()
    )
    words = np.zeros(_BLOOM_WORDS, dtype=np.int64)
    for r in merged:
        words[r["widx"]] = r["word"]
    return words.view(np.uint64).tobytes()


# shared with st7 (plans/streaming.py): the streamed-refresh bloom must
# reproduce the batch result exactly, so both registrations carry this SQL
D13_CONTAMINATION_SQL = f"""WITH ds AS ({_SQL_DOC_SHINGLE_PLAIN}),
        ev AS (SELECT doc_id, shingle FROM ds WHERE doc_id % 5 = 0),
        tr AS (SELECT doc_id, shingle FROM ds WHERE doc_id % 5 <> 0)
        SELECT ev.doc_id AS eval_doc_id,
               CAST(COUNT(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs,
               CAST(COUNT(DISTINCT ev.shingle) AS BIGINT) AS n_shared_shingles
        FROM ev JOIN tr ON ev.shingle = tr.shingle
        GROUP BY ev.doc_id"""


def eval_shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval side's xxhash64 shingle hashes — the bloom's input set."""
    ds = doc_shingles(spark, sf_dir).where(F.col("doc_id") < _DUP_OFFSET)
    return ds.where(F.col("doc_id") % 5 == 0).select(F.xxhash64("shingle").alias("h"))


def bloom_might_contain_udf(spark: SparkSession, bloom: bytes):
    """Arrow-vectorized membership probe against a broadcast bitset bloom
    (the sketch bytes from :func:`_build_bloom`). Shared by d13's
    contamination probe, st7's streamed refresh, and j10's bloom-pruned
    fact join — one probe implementation, every consumer exact because
    an equi-join (or exact compare) always follows the prune."""
    bloom_bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        import numpy as np

        words = np.frombuffer(bloom_bc.value, dtype=np.uint64)
        hv = h.to_numpy()
        ok = np.ones(len(hv), dtype=bool)
        for pos in _bloom_positions(hv):
            bit = (words[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
            ok &= bit.astype(bool)
        return pd.Series(ok)

    return might_contain


def bloom_pruned_contamination(spark: SparkSession, sf_dir: str, bloom: bytes) -> DataFrame:
    """The probe half of d13, parameterized by the sketch bytes: st7's
    stream-maintained bloom and d13's eager build share this plan
    verbatim, so 'maintained sketch ≡ rebuilt sketch' implies result
    equality by construction."""
    ds = doc_shingles(spark, sf_dir).where(F.col("doc_id") < _DUP_OFFSET)
    ev = ds.where(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    tr = ds.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    might_contain = bloom_might_contain_udf(spark, bloom)

    tr_pruned = (
        tr.withColumn("h", F.xxhash64("shingle"))
        .where(might_contain("h"))
        .drop("h")
    )
    return (
        ev.join(tr_pruned, "shingle")
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("train_doc_id").alias("n_train_docs"),
            F.count_distinct("shingle").alias("n_shared_shingles"),
        )
    )


@register(
    "d13_contamination_bloom",
    D13_CONTAMINATION_SQL,
    tags=("dedup", "contamination", "bloom", "headline"),
    doc="d10's 100 TB form: a bloom filter built over the EVAL side's "
    "shingle hashes prefilters the TRAIN side BEFORE the shuffle, so the "
    "join exchanges only train shingles that might hit the eval set instead "
    "of the whole training corpus. The build is distributed (per-partition "
    "bitsets bit_or-merged as a hash aggregate — only the fixed 1 MB sketch "
    "reaches the driver) and ships to executors as a broadcast, the same "
    "step Spark's runtime row-level bloom join performs; the membership "
    "test is an Arrow-vectorized pandas UDF over Spark's native xxhash64 "
    "because bloom_filter_agg/might_contain aren't in PySpark 4.1's SQL "
    "registry. Result-neutral by construction (bloom has no false "
    "negatives; the equi-join drops false positives), hence the oracle is "
    "exactly d10's SQL. Train-side shrink is probed at sf1 (NOTES_r3.md). "
    "STATIC-SNAPSHOT assumption (ADVICE r3): the bloom is built EAGERLY at "
    "plan-construction time from the eval side as it exists THEN — the "
    "returned plan captures it as frozen driver state, so plan inspection "
    "pays one Spark job and re-executing after the eval data changes would "
    "probe a stale filter; rebuild the DataFrame to refresh the sketch, or "
    "use st7_stream_bloom_refresh, which maintains the same sketch "
    "incrementally from an eval-document stream.",
)
def d13_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    bloom = _build_bloom(eval_shingle_hashes(spark, sf_dir))
    return bloom_pruned_contamination(spark, sf_dir, bloom)


@register(
    "d14_fuzzy_name_pairs",
    """SELECT a.s_name AS name_a, b.s_name AS name_b,
              levenshtein(a.s_name, b.s_name) AS dist
       FROM supplier a JOIN supplier b
         ON a.s_name < b.s_name AND LENGTH(a.s_name) = LENGTH(b.s_name)
       WHERE levenshtein(a.s_name, b.s_name) <= 1""",
    tags=("dedup", "fuzzy", "record-linkage"),
    doc="Fuzzy record linkage: supplier-name pairs within edit distance 1, "
    "found by POSITION-MASK blocking — each name emits L variants with one "
    "character wildcarded, equal masks are candidates, candidates are "
    "verified with levenshtein and deduped. Linear in names×L, quadratic "
    "only inside identical-mask buckets (true near-duplicate groups) — "
    "never an all-pairs self-join, which is what makes 10⁹-row linkage "
    "feasible; the O(n²) form survives only as the ORACLE. Same-length "
    "masks cover substitutions (all lev≤1 pairs among equal-length names); "
    "general insert/delete linkage uses deletion neighborhoods — the same "
    "join shape with L+1 keys. Both engines' levenshtein are exact "
    "integers, so the verify step is oracle-deterministic",
)
def d14_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select("s_name")
    masked = sup.select(
        "s_name",
        F.explode(F.sequence(F.lit(1), F.length("s_name"))).alias("pos"),
    ).select(
        "s_name",
        F.concat(
            F.expr("substring(s_name, 1, pos - 1)"),
            F.lit("*"),
            F.expr("substring(s_name, pos + 1, 10000)"),
        ).alias("mask"),
    )
    a, b = masked.alias("a"), masked.alias("b")
    cand = (
        a.join(b, F.col("a.mask") == F.col("b.mask"))
        .where(F.col("a.s_name") < F.col("b.s_name"))
        .select(F.col("a.s_name").alias("name_a"), F.col("b.s_name").alias("name_b"))
        .distinct()
    )
    return cand.select(
        "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
    ).where(F.col("dist") <= 1)


@register(
    "d15_fuzzy_indel_pairs",
    """SELECT a.s_name AS name_a, b.s_name AS name_b,
              levenshtein(a.s_name, b.s_name) AS dist
       FROM supplier a JOIN supplier b
         ON a.s_name < b.s_name
        AND ABS(LENGTH(a.s_name) - LENGTH(b.s_name)) <= 1
       WHERE levenshtein(a.s_name, b.s_name) <= 1""",
    tags=("dedup", "fuzzy", "record-linkage", "headline"),
    doc="General lev<=1 record linkage — substitutions AND insert/delete "
    "edits — via DELETION NEIGHBORHOODS (the FastSS scheme d14's "
    "docstring names): each name emits itself plus its L one-character-"
    "deletion variants (L+1 keys); two names are candidates iff their "
    "key sets intersect. Covers every lev<=1 relation: equal names "
    "share the identity key, a substitution at position i shares the "
    "delete-at-i key, and an insertion pairs the shorter name's "
    "identity key with the longer name's deletion key. Collisions at "
    "different deletion positions can propose lev-2 pairs (e.g. a "
    "transposition) — the exact levenshtein verify drops them, so the "
    "O(n^2) self-join survives only as the oracle (its length "
    "prefilter is sound: lev<=1 bounds the length gap by 1). Linear in "
    "names*(L+1); quadratic only inside identical-key buckets, which "
    "are true near-duplicate groups. Complements d14, whose "
    "position-mask blocking is substitution-only",
)
def d15_fuzzy_indel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select("s_name")
    deletions = sup.select(
        "s_name",
        F.explode(F.sequence(F.lit(1), F.length("s_name"))).alias("pos"),
    ).select(
        "s_name",
        F.concat(
            F.expr("substring(s_name, 1, pos - 1)"),
            F.expr("substring(s_name, pos + 1, 10000)"),
        ).alias("key"),
    )
    keys = sup.select("s_name", F.col("s_name").alias("key")).unionByName(deletions)
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(b, F.col("a.key") == F.col("b.key"))
        .where(F.col("a.s_name") < F.col("b.s_name"))
        .select(F.col("a.s_name").alias("name_a"), F.col("b.s_name").alias("name_b"))
        .distinct()
    )
    return cand.select(
        "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
    ).where(F.col("dist") <= 1)


@register(
    "d16_ngram_overlap",
    f"""WITH ds AS ({_SQL_DOC_SHINGLE_PLAIN}),
        ev AS (SELECT doc_id, shingle FROM ds WHERE doc_id % 5 = 0),
        tr AS (SELECT DISTINCT shingle FROM ds WHERE doc_id % 5 <> 0)
        SELECT ev.doc_id AS eval_doc_id,
               COUNT(*) AS n_shingles,
               COUNT(tr.shingle) AS n_shared,
               ROUND(CAST(COUNT(tr.shingle) AS DOUBLE) / COUNT(*), 6) AS overlap_frac,
               COUNT(tr.shingle) >= 0.8 * COUNT(*) AS contaminated
        FROM ev LEFT JOIN tr ON ev.shingle = tr.shingle
        GROUP BY ev.doc_id""",
    tags=("dedup", "contamination"),
    doc="Per-eval-doc contamination SCORE (the GPT-3/PaLM decontamination "
    "metric): fraction of a held-out document's distinct 3-word shingles "
    "that appear anywhere in the training split, flagged at the standard "
    "0.8 overlap threshold. Complements d10 (which counts colliding "
    "train docs) with the continuous per-doc fraction that drives the "
    "actual drop/keep decision. Plan: train side collapses to DISTINCT "
    "shingles (map-side partial agg), then ONE equi-join shuffled on the "
    "shingle key marks eval shingles, and the score is a count ratio "
    "aggregated per eval doc. At 100 TB the join key becomes the 64-bit "
    "shingle hash and the train side gets d13's bloom prefilter; the "
    "shape — shuffle on shingle, aggregate on eval doc — is unchanged.",
)
def d16_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = doc_shingles(spark, sf_dir).where(F.col("doc_id") < _DUP_OFFSET)
    ev = ds.where(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    tr = (
        ds.where(F.col("doc_id") % 5 != 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        ev.join(tr, "shingle", "left")
        .groupBy("eval_doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_shared"),
        )
        .select(
            "eval_doc_id",
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("n_shingles"), 6).alias(
                "overlap_frac"
            ),
            (F.col("n_shared") >= F.lit(0.8) * F.col("n_shingles")).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# d18: exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr dedup family)
# ---------------------------------------------------------------------------

_SUBSTR_K = 8  # token width of the duplication unit (Lee et al. use 50 BPE
# tokens at corpus scale; 8 keeps the fixture corpus' natural cross-doc
# repeats visible while the re-inserted docs exercise long-span merging)


def substring_occurrences(docs: DataFrame, k: int = _SUBSTR_K) -> DataFrame:
    """(doc_id, pos, sh): every k-token shingle occurrence WITH its 1-based
    token position — unlike :func:`shingled_from_docs`, positions and
    within-doc repeats are kept (a substring duplicated inside one doc is
    still a duplicate). Fully NATIVE (zero python): ``posexplode`` of the
    codegen'd tokenizer, then shingle assembly as ``concat_ws`` over k-1
    window ``lead``s per doc — the per-shingle python join this replaced
    measured ~36 s for 26M occurrences at the 100× probe; the window form
    runs in whole-stage-codegen'd JVM. An r15 arrays_zip-of-k-slices
    rewrite (row-local, no doc shuffle) measured ~equal at sf0.1 but
    3× slower at the 100× probe (20.5s vs 6.7s — k=8 slice arrays
    materialized per row dominate on the big side) and was reverted:
    the same corpus-cardinality-stream rule as t11/t24. ``concat_ws``
    skips trailing-null leads, so rows whose window overruns the doc are
    filtered on the LAST lead being present (full k-token shingles
    only)."""
    from pyspark.sql import Window as _W

    toks = docs.select("doc_id", F.posexplode(tokens("text")).alias("pos0", "tok"))
    w = _W.partitionBy("doc_id").orderBy("pos0")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    return (
        toks.select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.concat_ws(" ", *parts).alias("sh"),
            F.lead("tok", k - 1).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .drop("_last")
    )


def _h60(c: Column) -> Column:
    """60-bit md5-prefix fingerprint (15 hex chars — stays inside signed
    bigint in BOTH engines): the d18 shuffle key. 26M occurrences give a
    collision expectation of C(26M,2)/2⁶⁰ ≈ 3·10⁻⁴ — negligible, and both
    engines hash identically so the oracle comparison is unaffected
    either way. At 100 TB this is what keeps the shuffle at 24 B/row
    instead of shipping ~90-byte shingle strings."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


@register(
    "d18_substring_dedup",
    f"""WITH corpus AS MATERIALIZED ({_SQL_CORPUS}),
        occ AS MATERIALIZED (
          SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 array_to_string(tk[i:i+{_SUBSTR_K - 1}], ' ') AS sh
          FROM (SELECT doc_id, {_SQL_TOKENS} AS tk FROM corpus),
               UNNEST(range(1, len(tk) - {_SUBSTR_K - 2})) AS t(i)),
        hocc AS MATERIALIZED (
          SELECT doc_id, pos,
                 CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
          FROM occ),
        dup AS (SELECT h FROM hocc GROUP BY h HAVING COUNT(*) >= 2),
        docc AS (SELECT o.doc_id, o.pos FROM hocc o JOIN dup USING (h)),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN MAX(pos + {_SUBSTR_K - 1}) OVER w IS NULL
                        OR pos > MAX(pos + {_SUBSTR_K - 1}) OVER w + 1
                      THEN 1 ELSE 0 END AS flag
          FROM docc
          WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        grp AS (
          SELECT doc_id, pos,
                 SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl)
        SELECT doc_id, MIN(pos) AS span_start,
               MAX(pos) + {_SUBSTR_K - 1} AS span_end,
               MAX(pos) + {_SUBSTR_K - 1} - MIN(pos) + 1 AS span_tokens,
               COUNT(*) AS n_dup_shingles
        FROM grp GROUP BY doc_id, island""",
    tags=("dedup", "substring", "headline"),
    doc="Exact substring dedup (Lee et al. 2022 ExactSubstr), scale-safe "
    "form: instead of a corpus-wide suffix array, every k-token shingle "
    "occurrence keeps its position, occurrences whose shingle appears ≥2 "
    "times corpus-wide are 'duplicated', and per doc the duplicated "
    "coverage intervals [pos, pos+k-1] merge into MAXIMAL duplicated "
    "token spans (gaps-and-islands: cummax of interval end, new island "
    "when a position clears it by >1). Output = one row per maximal span "
    "with its token extent — the unit a curation pipeline cuts or drops. "
    "Plan: one Arrow-batched shingler (narrow), ONE shuffle on the "
    "shingle key (map-side-combined groupBy for the ≥2 filter + an AQE "
    "skew-splittable join back), then one doc_id-partitioned sort serving "
    "both windows AND the final (doc_id, island) aggregate (hash "
    "partitioning on doc_id satisfies the superset clustering — no "
    "second shuffle). At 100 TB the shingle string becomes a 128-bit "
    "fingerprint (collision-free in practice) so the shuffle carries 16 "
    "bytes/occurrence, and the per-doc window state is one cummax — "
    "memory O(1) per stream, no per-doc materialization.",
)
def d18_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _SUBSTR_K
    occ = (
        substring_occurrences(corpus_with_dups(spark, sf_dir), k)
        .select("doc_id", "pos", _h60(F.col("sh")).alias("h"))
        .cache()
    )
    dup = occ.groupBy("h").count().where(F.col("count") >= 2).select("h")
    docc = occ.join(dup, "h").select("doc_id", "pos")
    w_prev = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + (k - 1)).over(w_prev)
    w_run = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    return (
        docc.withColumn(
            "flag",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
        )
        .withColumn("island", F.sum("flag").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_shingles"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_shingles",
        )
    )


# ---------------------------------------------------------------------------
# d19: canonical-URL dedup — the URL-level pass curation pipelines run
# BEFORE any text dedup (CCNet/C4: most crawl duplication is the same page
# behind scheme/case/port/tracking-param/fragment variants)
# ---------------------------------------------------------------------------

# Deterministic messy-URL synthesis (both engines generate the identical
# raw URL per doc): groups of 10 docs share a page; variants differ in
# scheme case, www + host case, default port, utm tracking params, query
# param ORDER, trailing slash, and fragment.
_SQL_D19_RAW = """
      (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
      (CASE WHEN doc_id % 3 = 0
            THEN upper('www.s' || CAST((doc_id // 10) % 20 AS VARCHAR) || '.example.com')
            WHEN doc_id % 3 = 1
            THEN 'www.s' || CAST((doc_id // 10) % 20 AS VARCHAR) || '.example.com'
            ELSE 's' || CAST((doc_id // 10) % 20 AS VARCHAR) || '.example.com' END) ||
      (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
      '/docs/' || CAST(doc_id // 10 AS VARCHAR) ||
      (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
      (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=a&a=1&b=2'
            WHEN doc_id % 4 = 1 THEN '?b=2&utm_medium=b&a=1'
            WHEN doc_id % 4 = 2 THEN '?b=2&a=1'
            ELSE '?a=1&b=2' END) ||
      (CASE WHEN doc_id % 11 = 0 THEN '#sec' ELSE '' END)
"""

# Canonicalization, rule for rule (the standard crawl-dedup recipe):
# lowercase scheme+host, strip leading www., strip default ports :80/:443,
# strip the fragment, drop utm_* tracking params, SORT surviving params,
# trim one trailing slash from the path.
_SQL_D19_CANON = """
      lower(regexp_extract(raw, '^([A-Za-z]+)://', 1)) || '://' ||
      regexp_replace(regexp_replace(
          lower(regexp_extract(raw, '^[A-Za-z]+://([^/?#]+)', 1)),
          '^www\\.', ''), ':(80|443)$', '') ||
      regexp_replace(regexp_extract(raw, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1),
                     '/$', '') ||
      CASE WHEN len(list_filter(string_split(
                regexp_extract(raw, '\\?([^#]*)', 1), '&'),
                p -> p <> '' AND NOT starts_with(p, 'utm_'))) > 0
           THEN '?' || array_to_string(list_sort(list_filter(string_split(
                regexp_extract(raw, '\\?([^#]*)', 1), '&'),
                p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')
           ELSE '' END
"""


def raw_url_col() -> Column:
    """The messy-URL synthesis as a Column over ``doc_id`` — shared by
    d19 (dedup) and d20 (blocklist filter) so both operate on the same
    deterministic crawl. Mirrors ``_SQL_D19_RAW`` token for token."""
    site = F.concat(
        F.lit("s"), F.expr("CAST((doc_id div 10) % 20 AS STRING)"),
        F.lit(".example.com"),
    )
    return F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTP").otherwise("http"),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.upper(F.concat(F.lit("www."), site)))
         .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("www."), site))
         .otherwise(site),
        F.when(F.col("doc_id") % 5 == 0, ":80").otherwise(""),
        F.lit("/docs/"),
        F.expr("CAST(doc_id div 10 AS STRING)"),
        F.when(F.col("doc_id") % 7 == 0, "/").otherwise(""),
        F.when(F.col("doc_id") % 4 == 0, "?utm_source=a&a=1&b=2")
         .when(F.col("doc_id") % 4 == 1, "?b=2&utm_medium=b&a=1")
         .when(F.col("doc_id") % 4 == 2, "?b=2&a=1")
         .otherwise("?a=1&b=2"),
        F.when(F.col("doc_id") % 11 == 0, "#sec").otherwise(""),
    )


def canonical_url(raw: Column) -> Column:
    """The same canonicalization as a native Column expression — scheme/
    host lowering, www/default-port/fragment stripping, utm_* removal,
    param sort, trailing-slash trim. All codegen'd string/regex ops; at
    100 TB this runs as a narrow projection in the scan stage."""
    scheme = F.lower(F.regexp_extract(raw, r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(raw, r"^[A-Za-z]+://([^/?#]+)", 1)),
            r"^www\.", ""),
        r":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract(raw, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1), r"/$", "")
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(raw, r"\?([^#]*)", 1), "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    query = F.when(F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))).otherwise("")
    return F.concat(scheme, F.lit("://"), host, path, query)


@register(
    "d19_url_dedup",
    f"""WITH raws AS MATERIALIZED (
          SELECT doc_id, ({_SQL_D19_RAW}) AS raw FROM documents),
        canon AS (SELECT doc_id, raw, ({_SQL_D19_CANON}) AS canonical_url
                  FROM raws)
        SELECT canonical_url,
               COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_distinct_raw,
               MIN(doc_id) AS canonical_doc_id
        FROM canon GROUP BY canonical_url""",
    tags=("dedup", "url", "canonicalization", "headline"),
    doc="URL-level dedup — the pass crawl curation runs BEFORE any text "
    "dedup (most crawl duplication is the same page behind scheme-case/"
    "www/default-port/tracking-param/param-order/trailing-slash/fragment "
    "variants — the CCNet/C4 observation). Synthesis gives every group "
    "of 10 docs one page dressed in those seven variant classes; the "
    "canonicalizer (shared Column expression ≡ oracle SQL, rule for "
    "rule) must collapse them — n_distinct_raw > n_canonical pins that "
    "the normalization did real work, and a rule regression (say, utm "
    "params surviving) changes group counts and trips the hash gate. "
    "Plan: canonicalization is a narrow codegen'd projection (regex + "
    "array ops, no UDF), then ONE map-side-combinable groupBy on the "
    "canonical key — d1's exact-dedup shape with the key computed in "
    "the scan stage. At 100 TB this replaces the key with its 128-bit "
    "fingerprint and the shape is unchanged.",
)
def d19_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    canon = docs.select("doc_id", raw_url_col().alias("raw")).select(
        "doc_id", "raw", canonical_url(F.col("raw")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("raw").alias("n_distinct_raw"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


# ---------------------------------------------------------------------------
# d20: domain/path blocklist filter — the URL-level REMOVAL pass that runs
# right after d19's canonicalization in a crawl curation pipeline
# (C4/RefinedWeb: drop documents from blocklisted domains and URL paths)
# ---------------------------------------------------------------------------

#: blocked registrable domains (UT1-style list, here 4 of the 20 synthetic
#: sites) and one blocked path PREFIX (matches /docs/3 and /docs/30-39 —
#: prefix semantics are the point, not exact-path)
_D20_BLOCKED_HOSTS = (
    "s0.example.com",
    "s5.example.com",
    "s10.example.com",
    "s15.example.com",
)
_D20_BLOCKED_PATH_PREFIX = "/docs/3"

_SQL_D20_HOSTLIST = ", ".join(f"('{h}')" for h in _D20_BLOCKED_HOSTS)


@register(
    "d20_domain_blocklist",
    f"""WITH raws AS MATERIALIZED (
          SELECT doc_id, ({_SQL_D19_RAW}) AS raw FROM documents),
        canon AS (SELECT doc_id, ({_SQL_D19_CANON}) AS curl FROM raws),
        parts AS (
          SELECT doc_id,
                 regexp_extract(curl, '^[a-z]+://([^/?#]+)', 1) AS domain,
                 regexp_extract(curl, '^[a-z]+://[^/?#]*([^?#]*)', 1) AS path
          FROM canon),
        flagged AS (
          SELECT p.doc_id, p.domain, p.path,
                 (b.domain IS NOT NULL) AS host_blocked,
                 starts_with(p.path, '{_D20_BLOCKED_PATH_PREFIX}') AS path_blocked
          FROM parts p
          LEFT JOIN (VALUES {_SQL_D20_HOSTLIST}) b(domain)
            ON p.domain = b.domain)
        SELECT domain,
               COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT path) AS BIGINT) AS n_pages,
               CAST(SUM(CASE WHEN host_blocked THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_host_blocked,
               CAST(SUM(CASE WHEN path_blocked THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_path_blocked,
               CAST(SUM(CASE WHEN NOT host_blocked AND NOT path_blocked
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM flagged GROUP BY domain""",
    tags=("dedup", "url", "blocklist", "filter"),
    doc="Domain/path blocklist filtering over d19's canonical URLs — the "
    "removal pass crawl pipelines run between URL canonicalization and "
    "text processing (C4 used badword domain lists; RefinedWeb the UT1 "
    "blocklist + URL scoring). Two rule classes, both pinned per-domain "
    "in the output: registrable-domain membership (4/20 synthetic sites "
    "blocked) via a LEFT broadcast join against the blocklist table — "
    "the shape that holds when the list is UT1-sized (~4M rows, tens of "
    "MB broadcast; past broadcast budget the same plan degrades to one "
    "hash join keyed on domain) — and a blocked path PREFIX "
    "(startswith, so /docs/3 also catches /docs/30-39; a codegen'd "
    "literal here, an Aho-Corasick pandas_udf once the prefix list is "
    "data-sized). n_kept counts docs surviving both rules; host and "
    "path counts overlap deliberately so each rule's reach is "
    "independently hash-pinned. Plan: narrow regex projection in the "
    "scan stage, one broadcast join, one map-side-combinable groupBy on "
    "domain — no UDF, no second shuffle.",
)
def d20_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    curl = canonical_url(raw_url_col())
    parts = docs.select(
        "doc_id",
        F.regexp_extract(curl, r"^[a-z]+://([^/?#]+)", 1).alias("domain"),
        F.regexp_extract(curl, r"^[a-z]+://[^/?#]*([^?#]*)", 1).alias("path"),
    )
    blocklist = spark.createDataFrame(
        [(h,) for h in _D20_BLOCKED_HOSTS], "domain string"
    ).withColumn("host_blocked", F.lit(True))
    flagged = (
        parts.join(F.broadcast(blocklist), "domain", "left")
        .select(
            "domain",
            "path",
            F.coalesce("host_blocked", F.lit(False)).alias("host_blocked"),
            F.col("path").startswith(_D20_BLOCKED_PATH_PREFIX).alias("path_blocked"),
        )
    )
    return flagged.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("path").alias("n_pages"),
        F.sum(F.col("host_blocked").cast("long")).alias("n_host_blocked"),
        F.sum(F.col("path_blocked").cast("long")).alias("n_path_blocked"),
        F.sum(
            (~F.col("host_blocked") & ~F.col("path_blocked")).cast("long")
        ).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# d22: span-level exact-substring REMOVAL with document reassembly — the
# RefinedWeb (Penedo et al. 2023) / SlimPajama recipe built on top of d18's
# span *detection*: duplicated spans of >= _D22_MIN_SPAN tokens are CUT from
# every occurrence except the corpus-wide first, and each document is
# reassembled from its surviving tokens (t13's keep-first discipline, at
# token-span granularity instead of line granularity).
# ---------------------------------------------------------------------------

_D22_MIN_SPAN = 50  # the published ExactSubstr threshold (Lee et al. 2022
# use 50 BPE tokens; RefinedWeb/SlimPajama keep it) — the fixture's
# re-inserted whole-document duplicates clear it, natural short cross-doc
# repeats deliberately do not (they are d18's business, not removal's)

#: first-occurrence total order, encoded as ONE bigint so both engines
#: take min() over the identical scalar: doc_id ⊗ 2^20 + pos (pos < 2^20
#: always — docs are far below a million tokens; doc_id ≤ ~1e7 keeps the
#: product inside int64 with 5 orders of magnitude to spare)
_D22_POS_BITS = 1_048_576


@register(
    "d22_span_removal_dedup",
    f"""WITH corpus AS MATERIALIZED ({_SQL_CORPUS}),
        toks AS MATERIALIZED (
          SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i] AS tok
          FROM (SELECT doc_id, {_SQL_TOKENS} AS tk FROM corpus),
               UNNEST(range(1, len(tk) + 1)) AS t(i)),
        occ AS MATERIALIZED (
          SELECT doc_id, pos,
                 CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
          FROM (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       array_to_string(tk[i:i+{_SUBSTR_K - 1}], ' ') AS sh
                FROM (SELECT doc_id, {_SQL_TOKENS} AS tk FROM corpus),
                     UNNEST(range(1, len(tk) - {_SUBSTR_K - 2})) AS t(i))),
        dup AS (SELECT h, COUNT(*) AS cnt,
                       MIN(doc_id * {_D22_POS_BITS} + pos) AS first_key
                FROM occ GROUP BY h),
        marked AS (
          SELECT o.doc_id, o.pos FROM occ o JOIN dup d USING (h)
          WHERE d.cnt >= 2 AND o.doc_id * {_D22_POS_BITS} + o.pos <> d.first_key),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN MAX(pos + {_SUBSTR_K - 1}) OVER w IS NULL
                        OR pos > MAX(pos + {_SUBSTR_K - 1}) OVER w + 1
                      THEN 1 ELSE 0 END AS flag
          FROM marked
          WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        grp AS (
          SELECT doc_id, pos,
                 SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl),
        spans AS (
          SELECT doc_id, MIN(pos) AS span_start,
                 MAX(pos) + {_SUBSTR_K - 1} AS span_end
          FROM grp GROUP BY doc_id, island
          HAVING MAX(pos) + {_SUBSTR_K - 1} - MIN(pos) + 1 >= {_D22_MIN_SPAN}),
        rm AS (SELECT doc_id, CAST(p AS BIGINT) AS pos
               FROM spans, UNNEST(range(span_start, span_end + 1)) AS t(p)),
        nsp AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id)
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               COUNT(rm.pos) AS n_removed,
               COALESCE(ANY_VALUE(nsp.n_spans), 0) AS n_spans,
               COALESCE(string_agg(CASE WHEN rm.pos IS NULL THEN t.tok END,
                                   ' ' ORDER BY t.pos), '') AS text_dedup
        FROM toks t
        LEFT JOIN rm ON t.doc_id = rm.doc_id AND t.pos = rm.pos
        LEFT JOIN nsp ON t.doc_id = nsp.doc_id
        GROUP BY t.doc_id""",
    tags=("dedup", "substring", "headline"),
    doc="Span-level exact-substring dedup with document REASSEMBLY "
    "(VERDICT r14 item 5 — the RefinedWeb/SlimPajama 'remove duplicated "
    "spans >= 50 tokens, keep the rest of the doc' form; Lee et al. 2022 "
    "ExactSubstr removal). Semantics: every k-token shingle occurrence "
    "keeps its position; for each corpus-duplicated shingle the FIRST "
    "occurrence in (doc_id, pos) order survives (t13's keep-first law, "
    "span-granular); all later occurrences merge into maximal islands "
    "(d18's gaps-and-islands) and islands spanning >= 50 tokens are cut; "
    "each doc is reassembled from its surviving tokens in order. Output: "
    "one row per doc — token counts before/removed, spans cut, and the "
    "reassembled text (empty string when a doc is entirely duplicated, "
    "e.g. the fixture's re-inserted copies). Plan: ONE shuffle on the "
    "60-bit shingle fingerprint (map-side-combined count+min — the keep-"
    "first key is a single bigint min, no struct comparator), the "
    "marked-occurrence join rides the same key (AQE skew-splittable), "
    "then ONE doc_id shuffle serves the island windows, the span "
    "aggregate, the removed-position equi-join (span explode is linear: "
    "at most one row per corpus token) and the final reassembly groupBy "
    "— hash partitioning on doc_id satisfies all four. No all-pairs "
    "stage anywhere; at 100 TB the only wide exchange carries 24 "
    "B/occurrence. Reassembly memory is O(doc tokens) per group — the "
    "same bound t7/t12's packers already rely on.",
)
def d22_span_removal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_removal(corpus_with_dups(spark, sf_dir))


def span_removal(corpus: DataFrame) -> DataFrame:
    """The d22 pipeline over ANY (doc_id, text) frame — split out so tests
    can pin the keep-first law as an INVARIANCE: appending documents with
    larger (doc_id, pos) keys can only add removals to the NEW docs, never
    change an earlier doc's output (tests/test_r15_ops.py)."""
    k = _SUBSTR_K
    toks = corpus.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
    occ = substring_occurrences(corpus, k).select(
        "doc_id", "pos", _h60(F.col("sh")).alias("h")
    )
    okey = F.col("doc_id").cast("long") * _D22_POS_BITS + F.col("pos")
    dup = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(okey).alias("first_key")
    )
    marked = (
        occ.join(dup, "h")
        .where((F.col("cnt") >= 2) & (okey != F.col("first_key")))
        .select("doc_id", "pos")
    )
    w_prev = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + (k - 1)).over(w_prev)
    w_run = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    spans = (
        marked.withColumn(
            "flag",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0),
        )
        .withColumn("island", F.sum("flag").over(w_run))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + (k - 1)).alias("span_end"))
        .where(F.col("span_end") - F.col("span_start") + 1 >= _D22_MIN_SPAN)
    )
    rm = spans.select(
        "doc_id", F.explode(F.sequence("span_start", "span_end")).alias("pos")
    ).withColumn("rm", F.lit(1))
    nsp = spans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    surviving = F.when(F.col("rm").isNull(), F.struct("pos", "tok"))
    return (
        toks.join(rm, ["doc_id", "pos"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("rm").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(surviving)), lambda x: x["tok"]
                ),
                " ",
            ).alias("text_dedup"),
        )
        .join(nsp, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_removed",
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            "text_dedup",
        )
    )

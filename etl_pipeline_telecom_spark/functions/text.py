"""Text-analysis expression helpers (north-star extensions, BASELINE.json:6).

All native Column expressions — tokenization, shingling, hashing, quality
metrics stay inside whole-stage codegen; at 100 TB of documents these run
as a narrow projection with zero Python involvement.

Cross-engine determinism (DuckDB oracle):
- token/shingle hash = first 8 hex chars of md5 → bigint. md5 is identical
  in Spark and DuckDB; the hex slice keeps it under 2³² so downstream
  modular arithmetic stays in exact bigint range.
- ratios are int÷int double divisions (identical IEEE results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a small English stopword set for quality scoring (public-domain list)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with", "is", "are", "was",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization over lower-cased, trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def alnum_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count of [A-Za-z0-9]+ runs (regexp, not split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit("[A-Za-z0-9]+"))


def adjacent_pairs(arr: Column) -> Column:
    """array<struct<w1,w2>> of adjacent element pairs of ``arr``.

    ``explode(adjacent_pairs(<array column>))`` replaces the
    posexplode + window(lead) bigram idiom: pair construction is
    row-local (arrays_zip of two slices — codegen, no doc-keyed
    Exchange + sort), and measured FASTER than the window form even at
    bench scale (0.31s vs 0.48s over sf0.1 documents), while at 100 TB
    it removes the token-stream shuffle entirely. The old ``Generate
    re-evaluates inline expressions per output row'' hazard (t11's 41s
    lesson) applied to per-position transform(sequence...) shingle
    builders — O(len) work per element; slices+zip build the whole pair
    array once per row.

    CAUTION (caught by the r15 100× probe): ``arr`` is referenced FOUR
    times here (two sizes, two slices) — pass a cheap ATTRIBUTE, not an
    expression like ``tokens(text)``, or the tokenizer runs 4× per row
    (t11's big-side wall tripled). :func:`token_pairs` /
    :func:`token_triples` wrap the explode(array(·)) materialization
    barrier that pins one evaluation."""
    n = F.greatest(F.size(arr) - 1, F.lit(0))  # slice length must be >= 0
    return F.arrays_zip(
        F.slice(arr, 1, n).alias("w1"),
        F.slice(arr, 2, n).alias("w2"),
    )


def adjacent_triples(arr: Column) -> Column:
    """array<struct<w1,w2,w3>> of adjacent element triples of ``arr``."""
    n = F.greatest(F.size(arr) - 2, F.lit(0))
    return F.arrays_zip(
        F.slice(arr, 1, n).alias("w1"),
        F.slice(arr, 2, n).alias("w2"),
        F.slice(arr, 3, n).alias("w3"),
    )


def with_materialized_array(df, carry: list[str], arr: Column, out: str):
    """Materialize ``arr`` as a real per-row column via an
    explode(array(·)) barrier: Generate evaluates its child once per
    input row and emits an ATTRIBUTE, and CollapseProject cannot inline
    expressions through a Generate — so downstream multi-references
    (slices, sizes, zips) cost array-pointer reads, not re-evaluations
    of the producing expression."""
    return df.select(*carry, F.explode(F.array(arr)).alias(out))


def token_pairs(df, carry: list[str], arr: Column):
    """(*carry, w1, w2): adjacent-pair occurrences of ``arr`` (one row
    per pair), with the single-evaluation barrier around ``arr``."""
    m = with_materialized_array(df, carry, arr, "_ng_toks")
    return m.select(
        *carry, F.explode(adjacent_pairs(F.col("_ng_toks"))).alias("_pr")
    ).select(*carry, F.col("_pr.w1").alias("w1"), F.col("_pr.w2").alias("w2"))


def token_triples(df, carry: list[str], arr: Column):
    """(*carry, w1, w2, w3): adjacent-triple occurrences of ``arr``."""
    m = with_materialized_array(df, carry, arr, "_ng_toks")
    return m.select(
        *carry, F.explode(adjacent_triples(F.col("_ng_toks"))).alias("_tr")
    ).select(
        *carry,
        F.col("_tr.w1").alias("w1"),
        F.col("_tr.w2").alias("w2"),
        F.col("_tr.w3").alias("w3"),
    )


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-word shingles: ["a","b","c","d"] → ["a b c", "b c d"] (n=3).

    Empty result when the doc has fewer than n tokens. Shingles — not raw
    tokens — are the dedup unit: with a small vocabulary, token *sets*
    collide constantly (measured Jaccard baseline 0.63 on the fixture
    corpus) while 3-word shingles stay sparse.
    """
    t = tokens_col
    # one F.slice per shingle measured ~3× faster than n element_at calls:
    # higher-order lambdas re-evaluate each OUTER expression reference, so
    # fewer references to `t` inside the lambda wins. Consumers should
    # evaluate this once per row into a materialized column (see
    # plans/dedup.corpus_shingled) — never explode it inline.
    gen = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, gen).otherwise(F.array().cast("array<string>"))


def hash32(col: Column | str) -> Column:
    """Deterministic 32-bit hash of a string, identical in Spark and DuckDB.

    ``conv(substr(md5(x),1,8), 16, 10)`` ≡ DuckDB
    ``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def hash_bucket(col: Column | str, mod: int = 100) -> Column:
    """Deterministic bucket in ``[0, mod)``: :func:`hash32` of the key's
    STRING form, mod ``mod`` — the one cross-engine sampling/split idiom
    (sm1/sm2 sample cuts, sm3's 90/5/5 split, sm4's 1000-bucket form,
    dq8's entity split, dq9's leakage ranks). Bucket membership depends
    only on the key, so reruns, engine changes, and repartitioning never
    move a row across buckets — and because every operator shares THIS
    expression, a future change to the rule moves the samplers and their
    audits together instead of silently diverging them."""
    c = F.col(col) if isinstance(col, str) else col
    return hash32(c.cast("string")) % mod


def stopword_ratio(tokens_col: Column) -> Column:
    """Fraction of tokens that are stopwords (int÷int — oracle-exact)."""
    hits = F.size(F.filter(tokens_col, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(tokens_col)


def quality_score(text_col: Column | str) -> Column:
    """Composite quality score in [0,1]: length, stopword and alpha signals.

    Heuristic in the spirit of C4/Gopher quality filters: reward
    mid-length docs with some function words and mostly-alphabetic tokens.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    t = tokens(c)
    n = F.size(t)
    len_score = F.least(n.cast("double") / 50.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(t) * 5.0, F.lit(1.0))
    alpha_ratio = F.regexp_count(c, F.lit("[A-Za-z]")).cast("double") / F.length(c)
    return F.round(0.4 * len_score + 0.3 * stop_score + 0.3 * alpha_ratio, 6)

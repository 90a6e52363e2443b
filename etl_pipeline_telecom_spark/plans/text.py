"""Text-analysis catalog queries over the ``documents`` fixture.

North-star extensions (BASELINE.json:6): token counting, quality scoring,
language-ID heuristic, document fingerprinting, corpus word stats. Every
query is a narrow projection + small aggregation — shuffle only on
low-cardinality keys (lang) or bounded outputs (top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.text import (
    STOPWORDS,
    alnum_token_count,
    quality_score,
    token_count,
    token_pairs,
    token_triples,
    tokens,
    with_materialized_array,
)
from ..sources import load_table

_SQL_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"


@register(
    "t1_token_stats",
    f"""SELECT doc_id,
               len({_SQL_TOKENS}) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_alnum_tokens,
               len(text) AS text_len
        FROM documents""",
    tags=("text",),
    doc="Token counting: whitespace tokens + regex alnum runs + char length",
)
def t1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        alnum_token_count("text").alias("n_alnum_tokens"),
        F.length("text").alias("text_len"),
    )


_SQL_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "t2_quality_score",
    f"""SELECT doc_id,
               ROUND(0.4 * LEAST(len({_SQL_TOKENS}) / 50.0, 1.0)
                   + 0.3 * LEAST(CAST(len(list_filter({_SQL_TOKENS}, t -> t IN ({_SQL_STOP_LIST}))) AS DOUBLE)
                                 / len({_SQL_TOKENS}) * 5.0, 1.0)
                   + 0.3 * (CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / len(text)), 6)
                   AS quality
        FROM documents""",
    tags=("text",),
    doc="Composite quality score (length / stopword / alpha signals, C4-style)",
)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


# marker tokens per language for the n-gram/stopword language-ID heuristic;
# scored against the text, priority order breaks ties deterministically
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "with"),
    "es": ("el", "la", "de", "con"),
    "de": ("der", "die", "und", "mit"),
    "fr": ("le", "la", "et", "avec"),
    "zh": ("de5", "shi4", "zai4", "he2"),
}


def _sql_lang_score(lang: str) -> str:
    toks = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter({_SQL_TOKENS}, t -> t IN ({toks})))"


@register(
    "t3_langid",
    f"""WITH scored AS (
          SELECT doc_id, lang,
                 {_sql_lang_score('en')} AS s_en, {_sql_lang_score('es')} AS s_es,
                 {_sql_lang_score('de')} AS s_de, {_sql_lang_score('fr')} AS s_fr,
                 {_sql_lang_score('zh')} AS s_zh
          FROM documents)
        SELECT doc_id, lang,
               CASE WHEN s_en + s_es + s_de + s_fr + s_zh = 0 THEN 'und'
                    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                    WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
                    WHEN s_fr >= s_zh THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM scored""",
    tags=("text",),
    doc="Language-ID heuristic: marker-token voting with fixed tie-break order",
)
def t3_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    scores = {
        lang: F.size(F.filter(t, lambda tok: tok.isin(*markers))).alias(f"s_{lang}")
        for lang, markers in _LANG_MARKERS.items()
    }
    scored = docs.select("doc_id", "lang", *scores.values())
    s = {k: F.col(f"s_{k}") for k in _LANG_MARKERS}
    pred = (
        F.when(s["en"] + s["es"] + s["de"] + s["fr"] + s["zh"] == 0, "und")
        .when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return scored.select("doc_id", "lang", pred.alias("lang_pred"))


@register(
    "t4_fingerprint",
    """WITH fp AS (SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents)
       SELECT doc_id, fingerprint,
              CAST(COUNT(*) OVER (PARTITION BY fingerprint) > 1 AS INT) AS is_duplicated
       FROM fp""",
    tags=("text", "dedup"),
    doc="Document fingerprinting (md5 of normalized text) + duplicate flag",
)
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id", "fingerprint", (F.count(F.lit(1)).over(w) > 1).cast("int").alias("is_duplicated")
    )


@register(
    "t6_repetition_stats",
    f"""WITH wc AS (
          SELECT doc_id, tok, COUNT(*) AS cnt
          FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents)
          GROUP BY doc_id, tok)
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
               ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS repetition_ratio,
               ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_word_frac
        FROM wc GROUP BY doc_id""",
    tags=("text", "quality"),
    doc="Per-doc repetition signals (Gopher/C4-style quality filters): word "
    "count, distinct-word count, repeated-word ratio, top-word fraction. "
    "Two hash aggregations (doc,word)→doc — shuffle keys stay bounded by "
    "the corpus, no per-doc state beyond the aggregate",
)
def t6_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_words = F.sum("cnt")
    n_distinct = F.count(F.lit(1))
    return wc.groupBy("doc_id").agg(
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.round(1.0 - n_distinct.cast("double") / n_words.cast("double"), 6).alias("repetition_ratio"),
        F.round(F.max("cnt").cast("double") / n_words.cast("double"), 6).alias("top_word_frac"),
    )


_CHUNK, _STRIDE = 32, 24


@register(
    "t7_doc_chunks",
    f"""WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
        n AS (SELECT doc_id, t,
                     1 + CAST(CEIL(GREATEST(len(t) - {_CHUNK}, 0) / {_STRIDE}.0) AS BIGINT) AS n_chunks
              FROM tok)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               CAST(len(t[(CAST(i AS INT) * {_STRIDE} + 1):(CAST(i AS INT) * {_STRIDE} + {_CHUNK})]) AS BIGINT)
                   AS n_words,
               md5(array_to_string(t[(CAST(i AS INT) * {_STRIDE} + 1):(CAST(i AS INT) * {_STRIDE} + {_CHUNK})], ' '))
                   AS chunk_md5
        FROM n, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) u""",
    tags=("text", "chunking"),
    doc=f"Overlapping context-window chunking ({_CHUNK}-word chunks, stride "
    f"{_STRIDE}): the standard LLM-pretraining doc→sample split. Narrow plan "
    "(tokenize → explode chunk index → slice); every chunk is identified by "
    "(doc_id, chunk_idx) with an md5 over its words so downstream dedup can "
    "run at chunk granularity",
)
def t7_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    n_chunks = 1 + F.ceil(F.greatest(F.size(t) - _CHUNK, F.lit(0)) / float(_STRIDE))
    exploded = docs.select(
        "doc_id", t.alias("t"), F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i")
    )
    chunk = F.slice(F.col("t"), F.col("i") * _STRIDE + 1, _CHUNK)
    return exploded.select(
        "doc_id",
        F.col("i").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register(
    "t5_top_words_per_lang",
    f"""SELECT lang, tok, cnt, rn FROM (
          SELECT lang, tok, cnt,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rn
          FROM (
            SELECT lang, tok, COUNT(*) AS cnt
            FROM (SELECT lang, unnest({_SQL_TOKENS}) AS tok FROM documents)
            GROUP BY lang, tok))
        WHERE rn <= 5""",
    tags=("text",),
    doc="Top-5 tokens per language: explode → count → windowed top-k",
)
def t5_top_words_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select("lang", F.explode(tokens("text")).alias("tok"))
    counts = exploded.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "tok")
    return counts.select("lang", "tok", "cnt", F.row_number().over(w).alias("rn")).where(F.col("rn") <= 5)


@register(
    "t8_chunk_dedup",
    f"""WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
        n AS (SELECT doc_id, t,
                     1 + CAST(CEIL(GREATEST(len(t) - {_CHUNK}, 0) / {_STRIDE}.0) AS BIGINT) AS n_chunks
              FROM tok),
        chunks AS (
          SELECT doc_id,
                 md5(array_to_string(t[(CAST(i AS INT) * {_STRIDE} + 1):(CAST(i AS INT) * {_STRIDE} + {_CHUNK})], ' '))
                     AS chunk_md5
          FROM n, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) u)
        SELECT chunk_md5,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               MIN(doc_id) AS canonical_doc_id
        FROM chunks GROUP BY chunk_md5 HAVING COUNT(*) > 1""",
    tags=("text", "chunking", "dedup"),
    doc="Chunk-granularity exact dedup (C4-style span dedup): hash-groupBy "
    "over t7's context-window fingerprints, emitting each duplicated chunk "
    "group with its copy count and min-doc canonical. Composes chunking + "
    "dedup the way a pre-training pipeline dedups repeated boilerplate "
    "spans across documents; one hash aggregation on the chunk fingerprint",
)
def t8_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = t7_doc_chunks(spark, sf_dir)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .where(F.col("n_copies") > 1)
    )


# GPT-2-style pretokenizer, specialized to the ASCII fixture alphabet:
# a token is an (optionally space-prefixed) letter run, digit run, or
# punctuation run, or a residual whitespace run. Both Java regex (Spark)
# and RE2 (DuckDB) use leftmost-first alternation with greedy
# quantifiers, so the match sequence is identical cross-engine; \\p and
# lookahead are deliberately avoided (RE2 has no lookahead).
_BPE_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


@register(
    "t10_bpe_pretokenize",
    f"""SELECT doc_id,
               len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS n_bpe_tokens,
               len({_SQL_TOKENS}) AS n_ws_tokens,
               ROUND(CAST(len(text) AS DOUBLE)
                     / len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')), 6)
                   AS bytes_per_token
        FROM documents""",
    tags=("text", "tokenize", "headline"),
    doc="BPE-ish pretokenization counts (SURVEY §7 token-counting "
    "extension): the GPT-2 pretokenizer split — space-prefixed letter/"
    "digit/punctuation runs — counted per document alongside plain "
    "whitespace tokens, plus bytes-per-token (the standard corpus-cost "
    "estimator; integer byte and token counts divided as doubles → "
    "bit-identical cross-engine). Narrow scan-side projection, no "
    "shuffle; the regex stays leftmost-first-compatible between Java "
    "regex and RE2 by construction (no lookahead, disjoint-by-prefix "
    "alternatives)",
)
def t10_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0))
    return docs.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        token_count("text").alias("n_ws_tokens"),
        F.round(F.length("text").cast("double") / bpe, 6).alias("bytes_per_token"),
    )


@register(
    "t9_tfidf_topterms",
    f"""WITH toks AS (
          SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
        dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT t.doc_id, t.token, t.tf, d.df,
                 CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS score
          FROM tf t JOIN dfreq d USING (token) CROSS JOIN n)
        SELECT doc_id, token, tf, df, ROUND(score, 6) AS score, rnk FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, token) AS rnk
          FROM scored)
        WHERE rnk <= 3""",
    tags=("text", "tfidf", "headline"),
    doc="TF-IDF keyword extraction: top-3 terms per document by tf·idf with "
    "the LINEAR idf variant idf = N/df. Chosen over log-idf deliberately: "
    "ln() is not an IEEE correctly-rounded operation, so Spark (JVM libm) "
    "and DuckDB (C libm) can disagree in the last ulp and flip ranks — "
    "tf·N/df uses only exact integer products and one correctly-rounded "
    "double division, making ranks and the rounded score bit-deterministic "
    "cross-engine (ranking is monotone-equivalent to any idf that is "
    "decreasing in df, ties broken by token). Plan: two hash aggs (tf, df) "
    "+ the tf⋈df token join + one per-doc window. The token-frequency side "
    "is VOCABULARY-sized (grows with the corpus), so it carries NO "
    "broadcast hint — whether it broadcasts is AQE's runtime call from "
    "observed sizes (ADVICE r3); only the 1-row corpus count is hinted",
)
def t9_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df derives from tf (one row per (doc, token) → count per token is
    # the distinct-doc count): no second tokenize pass, and a plain
    # count instead of count_distinct's dedup expansion; the tf exchange
    # is shared by both join sides via ReuseExchange.
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs")).withColumn("k", F.lit(1))
    scored = (
        tf.join(dfreq, "token")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(n_docs), "k")
        .select(
            "doc_id", "token", "tf", "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", F.round("score", 6).alias("score"), "rnk")
    )


@register(
    "t11_bigram_topk",
    f"""SELECT lang, bigram, cnt, rn FROM (
          SELECT lang, bigram, cnt,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rn
          FROM (
            SELECT lang, bigram, COUNT(*) AS cnt
            FROM (
              SELECT lang,
                     unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i + 1])) AS bigram
              FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents))
            GROUP BY lang, bigram))
        WHERE rn <= 10""",
    tags=("text", "ngram", "headline"),
    doc="Top-10 bigrams per language: the n-gram frequency surface "
    "(t5's unigram sibling; the same explode→count→top-k shape extends "
    "to any n). Bigrams materialize as a narrow per-row transform over "
    "the token array — ~1 extra row per token through ONE hash agg on "
    "(lang, bigram) with map-side combine; the top-k window runs on the "
    "aggregated counts, bounded by vocabulary², not the corpus",
)
def t11_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # bigrams via posexplode + a window lead per doc. The r15 zip form
    # (explode(arrays_zip(slice, slice))) measured FASTER at sf0.1
    # (0.31s vs 0.48s) but 1.5-2× slower at the 100× probe even with the
    # single-evaluation barrier (t11's pair stream is the largest of the
    # n-gram family and feeds a near-corpus-cardinality aggregate, so
    # construction cost dominates); the window form's 100× evidence
    # (SCALE_r13: 15.1s / 26×) wins here — kept, with the zip rewrite
    # applied only to the model-training aggregates whose 100× margins
    # are wide (t24/t29/t30/.../sm13/sm14, d18).
    toks = docs.select(
        "doc_id", "lang", F.posexplode(tokens("text")).alias("p", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    nxt = F.lead("tok", 1).over(w)
    exploded = (
        toks.select("lang", F.concat_ws(" ", "tok", nxt).alias("bigram"), nxt.alias("_n"))
        .where(F.col("_n").isNotNull())
        .drop("_n")
    )
    counts = exploded.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    # Two-phase top-k: a single per-lang window collapses to #langs
    # partitions — at the 100× probe that meant one task sorting an
    # entire language's bigram vocabulary (73× wall ratio). Phase 1
    # takes the top-10 within each (lang, salt) slice — every global
    # top-10 row ranks ≤ 10 in its own slice, because any row ahead of
    # it globally is also ahead of it in-slice, so the candidate set
    # provably contains the answer. Phase 2 re-ranks the ≤ 10·SALTS
    # survivors per lang with the ORIGINAL total order, so the result
    # (and the rn column) is identical to the single-window form the
    # oracle computes. The salt is engine-internal (xxhash64) — it only
    # prunes, it never reaches the output.
    salts = 32
    w1 = Window.partitionBy("lang", F.xxhash64("bigram") % salts).orderBy(
        F.desc("cnt"), "bigram"
    )
    cand = (
        counts.withColumn("prn", F.row_number().over(w1))
        .where(F.col("prn") <= 10)
        .drop("prn")
    )
    w2 = Window.partitionBy("lang").orderBy(F.desc("cnt"), "bigram")
    return (
        cand.select("lang", "bigram", "cnt", F.row_number().over(w2).alias("rn"))
        .where(F.col("rn") <= 10)
    )


_PACK_BUDGET = 2048
_PACK_SHARDS = 8
_SQL_SHARD = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8"
)


@register(
    "t12_pack_sequences",
    f"""WITH toks AS (
         SELECT doc_id, {_SQL_SHARD} AS shard, len({_SQL_TOKENS}) AS n_tokens
         FROM documents
       ), packed AS (
         SELECT shard, n_tokens,
                (SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                  // {_PACK_BUDGET} AS bin
         FROM toks
       )
       SELECT shard, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       FROM packed GROUP BY shard, bin""",
    tags=("text", "packing", "training-prep"),
    doc="Sequence packing for training batches: documents are dealt into "
    "deterministic hash shards, ordered by key within the shard, and "
    "assigned to token-budget bins by EXCLUSIVE running token prefix "
    "(offset // 2048) — every engine, partitioning, and rerun produces "
    "the same doc→bin map, which is what makes a packed dataset "
    "resumable and its batches reproducible. One shuffle (the per-shard "
    "window); bins slightly overfill rather than split documents — the "
    "standard contiguous-packing tradeoff. Audited as per-(shard, bin) "
    "doc and exact integer token counts",
)
def t12_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % _PACK_SHARDS
    toks = docs.select(
        "doc_id", shard.alias("shard"), token_count("text").alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # integer `div`, not double `/`+cast: the double path loses exactness
    # once a shard's running token prefix exceeds 2^53, which a 100 TB
    # corpus reaches — the DuckDB oracle's `//` is exact at any magnitude
    packed = toks.withColumn(
        "offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("bin", F.expr(f"offset div {_PACK_BUDGET}")).drop("offset")
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )


# line length (tokens) for the corpus-level line dedup; the fixture corpus
# has no newlines, so "lines" are deterministic 10-token spans — the SAME
# plan runs unchanged on real newline-delimited text by swapping the
# lineation expression for split(text, '\n')
_LINE_TOKENS = 10
_SQL_RAW_TOKENS = "string_split_regex(trim(text), '\\s+')"


@register(
    "t13_line_dedup",
    f"""WITH toks AS (
          SELECT doc_id, {_SQL_RAW_TOKENS} AS tk FROM documents),
        lines AS (
          SELECT doc_id, i AS line_idx,
                 array_to_string(tk[i * {_LINE_TOKENS} + 1 : i * {_LINE_TOKENS} + {_LINE_TOKENS}], ' ') AS line
          FROM toks, LATERAL (
            SELECT unnest(range(0, (len(tk) + {_LINE_TOKENS} - 1) // {_LINE_TOKENS}))
                AS i) t),
        kept AS (
          SELECT doc_id, line_idx, line
          FROM (SELECT doc_id, line_idx, line,
                       ROW_NUMBER() OVER (PARTITION BY line
                                          ORDER BY doc_id, line_idx) AS rn
                FROM lines)
          WHERE rn = 1),
        reassembled AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 md5(string_agg(line, ' ' ORDER BY line_idx)) AS kept_md5
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id,
               CAST((len(t.tk) + {_LINE_TOKENS} - 1) // {_LINE_TOKENS} AS BIGINT) AS n_lines,
               CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(r.kept_md5, md5('')) AS kept_md5
        FROM toks t LEFT JOIN reassembled r ON t.doc_id = r.doc_id""",
    tags=("text", "dedup", "boilerplate", "headline"),
    doc="C4/Gopher-style corpus-level line dedup: every line that occurs "
    "more than once ANYWHERE in the corpus keeps only its first "
    "occurrence (min (doc_id, line_idx)), and each document is "
    "reassembled from its surviving lines in order — the standard "
    "boilerplate-removal pass before LLM training. Fixture docs have no "
    "newlines, so lines are deterministic 10-token spans (same plan, "
    "different lineation expression, on real text). Plan: per-doc "
    "lineation is a narrow in-row projection (no shuffle); the corpus "
    "dedup is ONE groupBy on the line with a MIN(struct) that partial-"
    "aggregates map-side — a boilerplate line duplicated a billion times "
    "combines to one row per map task, so the hot line can't straggle "
    "(vs the row_number window the oracle uses, which would sort the "
    "whole hot partition); reassembly is one shuffle on doc_id. At "
    "100 TB the line string group key becomes xxhash64(line) with the "
    "canonical line carried via min_by, and the reassembled text is "
    "written out instead of fingerprinted.",
)
def t13_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.trim(F.col("text")), r"\s+")
    n_lines = F.expr(f"(size(tk) + {_LINE_TOKENS - 1}) div {_LINE_TOKENS}")
    lines = F.transform(
        F.sequence(F.lit(0), F.col("n_lines") - 1),
        lambda i: F.array_join(F.slice("tk", i * _LINE_TOKENS + 1, _LINE_TOKENS), " "),
    )
    lined = (
        docs.select("doc_id", tk.alias("tk"))
        .withColumn("n_lines", n_lines)
        .select("doc_id", "n_lines", F.posexplode(lines).alias("line_idx", "line"))
    )
    # (doc_id, line_idx) packed into ONE bigint so the canonical-pick MIN
    # is hash-aggregable (min over a struct falls back to SortAggregate,
    # which would sort the hot partition — exactly the straggler the
    # map-side combine is here to prevent). 2^20 lines/doc headroom keeps
    # doc_id * 2^20 + line_idx exact for doc ids up to 2^43 (~8.7e12).
    # Out-of-bound inputs (a >10.5M-token doc, an oversized/negative
    # doc_id) would silently corrupt the canonical pick and the
    # shiftright decode, so the packing raises at runtime instead — an
    # in-row guard in the same task, no extra scan (guards.py discipline
    # applied where a plan-time limit(n).count() can't see the bound).
    pack_ok = (
        (F.col("line_idx") < (1 << 20))
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < (1 << 43))
    )
    packed = F.when(
        pack_ok, F.shiftleft(F.col("doc_id"), 20) + F.col("line_idx")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("t13_line_dedup: (doc_id, line_idx) out of packing "
                      "bounds (need 0 <= doc_id < 2^43, line_idx < 2^20): "),
                F.col("doc_id").cast("string"),
                F.lit(","),
                F.col("line_idx").cast("string"),
            )
        ).cast("bigint")
    )
    packed_first = F.min(packed).alias("first")
    kept = (
        lined.groupBy("line")
        .agg(packed_first)
        .select(
            F.shiftright(F.col("first"), 20).alias("doc_id"),
            (F.col("first") % (1 << 20)).alias("line_idx"),
            "line",
        )
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    per_doc = docs.select("doc_id", F.size(tk).alias("n_tok")).select(
        "doc_id", F.expr(f"(n_tok + {_LINE_TOKENS - 1}) div {_LINE_TOKENS}").alias("n_lines")
    )
    return per_doc.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
    )


@register(
    "t16_unigram_rarity",
    f"""WITH tok AS (
          SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
        tr AS (
          SELECT tok, COUNT(*) AS c FROM tok WHERE doc_id % 5 <> 0 GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_train FROM tok WHERE doc_id % 5 <> 0),
        scored AS (
          SELECT t.doc_id, t.tok, tr.c,
                 (n.n_train * 1000000) // (COALESCE(tr.c, 0) + 1) AS term_u
          FROM tok t CROSS JOIN n LEFT JOIN tr ON t.tok = tr.tok
          WHERE t.doc_id % 5 = 0)
        SELECT doc_id AS eval_doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
               ROUND(CAST(SUM(term_u) AS DOUBLE) / COUNT(*) / 1000000, 6) AS rarity
        FROM scored GROUP BY doc_id""",
    tags=("text", "quality", "language-model"),
    doc="Unigram-LM rarity scoring of held-out documents against the "
    "training split — the CCNet-style 'how surprising is this document "
    "under the corpus LM' quality/importance signal that drives keep/ "
    "drop and sampling weights. Each eval token scores N/(c+1) (add-one "
    "smoothed inverse unigram frequency), quantized to exact integer "
    "micro-units so the cross-token SUM is exact in ANY accumulation "
    "order — a true log-prob would hash-diverge cross-engine (JVM "
    "Math.log and libm disagree by 1 ulp on some inputs; same reason t9 "
    "uses linear idf). The monotone token-level transform preserves the "
    "rarity ordering; swap in ln() at deploy time if bit-exact "
    "verification is not required — the PLAN is unchanged. Plan: one "
    "hash agg for train counts (map-side combine absorbs hot stopwords), "
    "a 1-row scalar broadcast for N, one shuffle join on the token key, "
    "one agg per eval doc. At 1000x the N*1e6 integer headroom needs "
    "DECIMAL(38,0) (int64 caps near N=9e12 tokens).",
)
def t16_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    train = tok.where(F.col("doc_id") % 5 != 0)
    tr = train.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n = train.agg(F.count(F.lit(1)).alias("n_train"))
    ev = tok.where(F.col("doc_id") % 5 == 0)
    scored = (
        ev.crossJoin(F.broadcast(n))
        .join(tr, "tok", "left")
        .select(
            F.col("doc_id").alias("eval_doc_id"),
            F.col("c"),
            F.expr("(n_train * 1000000) div (coalesce(c, 0) + 1)").alias("term_u"),
        )
    )
    return scored.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("c").isNull(), 1).otherwise(0)).cast("bigint").alias("n_unseen"),
        F.round(F.sum("term_u").cast("double") / F.count(F.lit(1)) / 1000000, 6).alias(
            "rarity"
        ),
    )


_CDC_W = 4  # rolling-window width (tokens) for the boundary test
_CDC_M = 8  # boundary when window-hash % M == 0 → expected chunk ~M tokens


@register(
    "t14_cdc_chunks",
    f"""WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS tk FROM documents),
        pos AS (SELECT doc_id, tk, unnest(range(0, len(tk))) AS i FROM tok),
        f AS (
          SELECT doc_id, i, tk[CAST(i + 1 AS INT)] AS tok,
                 CASE WHEN i >= {_CDC_W - 1}
                           AND CAST(('0x' || substr(md5(
                                 array_to_string(tk[CAST(i - {_CDC_W - 2} AS INT):CAST(i + 1 AS INT)], ' ')
                               ), 1, 8)) AS BIGINT) % {_CDC_M} = 0
                      THEN 1 ELSE 0 END AS flag
          FROM pos),
        c AS (
          SELECT doc_id, i, tok,
                 COALESCE(SUM(flag) OVER (PARTITION BY doc_id ORDER BY i
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS chunk_idx
          FROM f),
        g AS (
          SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
                 md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
          FROM c GROUP BY doc_id, chunk_idx)
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               n_tokens, chunk_md5,
               CAST(COUNT(*) OVER (PARTITION BY chunk_md5) AS BIGINT) AS n_copies
        FROM g""",
    tags=("text", "chunking", "dedup", "headline"),
    doc="Content-defined chunking (rsync/LBFS-style): a chunk boundary "
    "falls AFTER token i exactly when the hash of the 4-token window "
    "ending at i is 0 mod 8 — boundaries are a function of CONTENT, not "
    "position, so an insertion near the head re-syncs after one window "
    "and the remaining chunks fingerprint identically (fixed-span "
    "chunking like t7/t13 shifts every downstream chunk). n_copies "
    "counts corpus-wide duplicate chunks — the dedup payoff CDC exists "
    "for. Plan: boundary flags are computed IN-ROW (narrow projection, "
    "no shuffle), the exclusive prefix-sum runs per-doc (window "
    "partitioned by doc_id — task size bounded by one document), then "
    "one hash agg per (doc, chunk) and one window count on the chunk "
    "fingerprint with map-side-combinable cardinality. At 100 TB the "
    "chunk store dedups on chunk_md5 exactly like m4's payload "
    "fingerprints.",
)
def t14_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    lined = docs.select("doc_id", F.posexplode(tk).alias("i", "tok"))
    # rolling window via lag() over the SAME (doc, i) sort the prefix sum
    # needs anyway — measured 1.7x faster than building boundary flags with
    # a higher-order transform() over the token array (HOF lambdas run
    # interpreted and re-evaluate the slice per element; lag is a plain
    # window expression on an already-sorted partition)
    w_ord = Window.partitionBy("doc_id").orderBy("i")
    wstr = F.concat_ws(
        " ",
        F.lag("tok", 3).over(w_ord),
        F.lag("tok", 2).over(w_ord),
        F.lag("tok", 1).over(w_ord),
        F.col("tok"),
    )
    flag = F.when(
        (F.col("i") >= _CDC_W - 1)
        & (F.conv(F.substring(F.md5(wstr), 1, 8), 16, 10).cast("bigint") % _CDC_M == 0),
        1,
    ).otherwise(0)
    w_prefix = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(Window.unboundedPreceding, -1)
    )
    chunks = (
        lined.withColumn("flag", flag)
        .withColumn("chunk_idx", F.coalesce(F.sum("flag").over(w_prefix), F.lit(0)))
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "tok"))), lambda s: s["tok"]
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )
    w_copies = Window.partitionBy("chunk_md5")
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "n_tokens",
        "chunk_md5",
        F.count(F.lit(1)).over(w_copies).cast("bigint").alias("n_copies"),
    )


_BPE_MERGES = 8  # default merge budget for the REGISTERED t15/t17 entries


def _sql_t15(n_merges: int = _BPE_MERGES) -> str:
    """t15's oracle: the SAME ``n_merges`` BPE training rounds, unrolled as
    CTEs (VERDICT r7 item 4: depth is a parameter, and the oracle chain is
    generated for the same depth — tests pin a second, deeper N).

    Each round is pure window/agg SQL (pair counts → deterministic argmax
    → greedy left-to-right merge via the run-parity trick), so DuckDB
    replays the loop exactly — same counting convention (naive adjacent
    pairs, overlaps double-counted, as in Sennrich's reference
    implementation), same tie-break (freq DESC, then pair lexicographic).
    """
    parts = [
        f"""wc AS (
      SELECT tok AS word, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS tok
            FROM documents)
      GROUP BY tok),
    s0 AS MATERIALIZED (
      SELECT word, freq, i - 1 AS pos, substr(word, i, 1) AS sym
      FROM wc, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) t)"""
    ]
    for r in range(n_merges):
        parts.append(f"""pc{r} AS (
      SELECT a, b, SUM(freq) AS f FROM (
        SELECT sym AS a, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b, freq
        FROM s{r})
      WHERE b IS NOT NULL GROUP BY a, b),
    best{r} AS (SELECT a, b, f FROM pc{r} ORDER BY f DESC, a, b LIMIT 1),
    mk{r} AS (
      SELECT s.word, s.freq, s.pos, s.sym, b.a AS ba, b.b AS bb,
             COALESCE(s.sym = b.a
                      AND LEAD(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.b,
                      FALSE) AS m
      FROM s{r} s LEFT JOIN best{r} b ON TRUE),
    rn{r} AS (
      SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
                    OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM mk{r}),
    kp{r} AS (
      SELECT *, m AND (rn - MIN(rn) OVER (PARTITION BY word, m, pos - rn)) % 2 = 0
                    AS keep
      FROM rn{r}),
    dr{r} AS (
      SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY word ORDER BY pos), FALSE)
                    AS consumed
      FROM kp{r}),
    s{r + 1} AS MATERIALIZED (
      SELECT word, freq,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
             CASE WHEN keep THEN ba || bb ELSE sym END AS sym
      FROM dr{r} WHERE NOT consumed)""")
    finals = " UNION ALL ".join(
        f"SELECT {r + 1} AS merge_rank, a AS merge_left, b AS merge_right, "
        f"CAST(f AS BIGINT) AS pair_freq FROM best{r}"
        for r in range(n_merges)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + finals


def _sql_t17(n_merges: int = _BPE_MERGES) -> str:
    """t17's oracle: t15's unrolled training CTEs, then encode the corpus
    by joining each pretoken to its FINAL symbol-sequence length."""
    # reuse the training chain verbatim: split t15's SQL at its final
    # merge-table SELECTs and graft the encode tail onto the CTE chain
    train = _sql_t15(n_merges)
    head, _, _tail = train.partition("\n    SELECT 1 AS merge_rank")
    return (
        head
        + f""",
    ntok AS (SELECT word, COUNT(*) AS n_tok, SUM(len(sym)) AS n_chars
             FROM s{n_merges} GROUP BY word),
    corpus AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS word
      FROM documents)
    SELECT c.doc_id,
           COUNT(*) AS n_pretokens,
           CAST(SUM(n.n_tok) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n.n_chars) AS BIGINT) AS n_pretoken_chars,
           CAST(FLOOR(CAST(SUM(n.n_chars) AS DOUBLE) * 1000000.0
                      / SUM(n.n_tok)) AS BIGINT) AS chars_per_token_ppm
    FROM corpus c JOIN ntok n ON c.word = n.word
    GROUP BY c.doc_id"""
    )


@register(
    "t15_bpe_merges",
    _sql_t15(),
    tags=("text", "tokenize", "bpe", "iterative"),
    doc="The actual BPE TRAINING loop (t10 stops at pretokenization): "
    f"{_BPE_MERGES} iterative pair-merge rounds over the corpus's distinct "
    "pretokens, returning the learned merge table (rank, pair, frequency "
    "at selection). Semantics match Sennrich's reference BPE: pair counts "
    "are naive adjacent pairs weighted by word frequency (overlaps double-"
    "counted, as collections.Counter over zip does), the winner is argmax "
    "by (freq DESC, pair lexicographic) — fully deterministic — and the "
    "merge applies greedily left-to-right (run-parity keeps the 1st, 3rd, "
    "… match of each consecutive-match run; its pair partner is dropped). "
    "Scale: the heavy distributed stage is the pretoken wordcount (one "
    "shuffle over the corpus); the training loop then runs on DISTINCT "
    "pretokens only — bounded by vocabulary, not corpus bytes, exactly "
    "why production BPE trainers operate on word counts. Each round is "
    "windows + one tiny argmax joined back with a broadcast; lineage is "
    "cut per round with localCheckpoint (d8 discipline). The oracle "
    "unrolls the identical rounds as CTEs — same convention, same "
    "tie-break, bit-identical winners.",
)
def t15_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges, _seq = _bpe_train(docs)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_train(docs: DataFrame, n_merges: int = _BPE_MERGES) -> tuple[list[DataFrame], DataFrame]:
    """The t15 training loop, shared with t17's corpus encoder.

    Returns (per-round merge rows, the FINAL symbol sequences) — after
    the last round ``seq`` holds each distinct pretoken's merged symbol
    sequence, i.e. its BPE encoding under the learned vocabulary, which
    is exactly what encoding the corpus needs (join by word; no re-run
    of the merges over raw text).
    """
    wc = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # One ROW per word carrying its symbol ARRAY. The previous shape held
    # one row per (word, pos) and ran every round through three window
    # passes (lead, running-sum run-parity, lag) plus a row_number
    # re-index — each a (word)-keyed sort over the vocab, materialized
    # per round. Adjacent-pair extraction and the greedy merge are
    # row-LOCAL on the array form (guide §2.4: remove shuffles outright)
    # — the only per-round distributed step left is the tiny pair-count
    # aggregate, and the argmax is a single min(struct) agg instead of a
    # global sort + limit 1.
    seq = wc.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    ).localCheckpoint()
    merges = []
    for r in range(n_merges):
        pairs = seq.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                )
            ).alias("p"),
        ).select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        # argmax by (f DESC, a, b) as min(struct(-f, a, b)): one
        # map-side-combinable aggregate, no global sort. min() over an
        # empty input yields a NULL struct — filtered so an exhausted
        # vocabulary emits ZERO merge rows, exactly like the old limit(1).
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("f"))
            .agg(F.min(F.struct((-F.col("f")).alias("nf"), "a", "b")).alias("m"))
            .select(
                F.col("m.a").alias("ba"),
                F.col("m.b").alias("bb"),
                (-F.col("m.nf")).alias("f"),
            )
            .where(F.col("ba").isNotNull())
            .localCheckpoint()  # 0-or-1 row, read twice (merge + output)
        )
        merges.append(
            best.select(
                F.lit(r + 1).alias("merge_rank"),
                F.col("ba").alias("merge_left"),
                F.col("bb").alias("merge_right"),
                F.col("f").cast("bigint").alias("pair_freq"),
            )
        )
        # Greedy left-to-right merge as a fold: append, or fuse the
        # accumulator's last symbol with the current one when they form
        # (ba, bb). Run-parity (keep the 1st, 3rd, … match of a
        # consecutive run) is automatic: a fused token ba||bb can never
        # itself equal ba (length grows), so the 2nd match of a run
        # never fires — the same selection the old window chain
        # computed. A left join against the 0-or-1-row best leaves
        # ba/bb NULL when no merge remains, making the fold a no-op.
        # The fold result is CHECKPOINTED per round (r16): the r15 form
        # let lineage accumulate, so round r's pair aggregate re-ran all
        # r prior folds (and their winner BNLJs) over the vocabulary —
        # quadratic total fold work across the loop, +27%/+30% big-side
        # walls on t17/t26 in SCALE_r15. One eager vocab-sized
        # materialization per round caps the chain at depth 1 (the d8
        # per-round discipline) while keeping the r15 orchestration win
        # (no per-position window passes, one job per round).
        seq = seq.join(F.broadcast(best.select("ba", "bb")), F.lit(True), "left").select(
            "word",
            "freq",
            F.aggregate(
                "syms",
                F.expr("CAST(array() AS array<string>)"),
                lambda acc, s: F.when(
                    (F.try_element_at(acc, F.lit(-1)) == F.col("ba")) & (s == F.col("bb")),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.concat(F.try_element_at(acc, F.lit(-1)), s)),
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ).alias("syms"),
        ).localCheckpoint()
    return merges, seq


@register(
    "t19_gopher_flags",
    f"""WITH w AS (
         SELECT doc_id, {_SQL_RAW_TOKENS} AS words FROM documents
       ), m AS (
         SELECT doc_id,
                len(words) AS n_words,
                list_aggregate(list_transform(words, x -> len(x)), 'sum') AS sum_wl,
                len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
                len(list_filter(words, x -> lower(x) IN ({_SQL_STOP_LIST}))) AS stop_hits,
                len(list_filter(words, x -> regexp_matches(x, '^[^A-Za-z0-9]+$'))) AS sym_words
         FROM w)
       SELECT doc_id,
              CAST(n_words AS BIGINT) AS n_words,
              ROUND(CAST(sum_wl AS DOUBLE) / n_words, 6) AS mean_word_len,
              CAST(FLOOR(CAST(alpha_words AS DOUBLE) * 1000000.0 / n_words) AS BIGINT)
                  AS alpha_ppm,
              CAST(stop_hits AS BIGINT) AS stop_hits,
              (n_words BETWEEN 20 AND 100000) AS r_wordcount,
              (CAST(sum_wl AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0) AS r_meanlen,
              (FLOOR(CAST(alpha_words AS DOUBLE) * 1000000.0 / n_words) >= 800000)
                  AS r_alpha,
              (stop_hits >= 2) AS r_stop,
              (sym_words * 10 <= n_words) AS r_symbol,
              ((n_words BETWEEN 20 AND 100000)
               AND (CAST(sum_wl AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
               AND (FLOOR(CAST(alpha_words AS DOUBLE) * 1000000.0 / n_words) >= 800000)
               AND (stop_hits >= 2)
               AND (sym_words * 10 <= n_words)) AS pass_gopher
       FROM m""",
    tags=("text", "quality-filter", "headline"),
    doc="Gopher-style rule-based document filter (Rae et al. 2021 §A1.1, "
    "thresholds fixture-tuned): word-count bounds, mean-word-length "
    "band, alphabetic-word fraction, minimum stopword evidence, "
    "symbol-token ratio — each surfaced as a flag plus the conjunctive "
    "verdict, so downstream mixes can re-weight rather than hard-drop. "
    "Pure narrow projection (array HOFs inside codegen, no explode, no "
    "shuffle, no Python); ratios are integer-operand double divisions "
    "or pure-integer compares (sym*10 <= n) → bit-exact cross-engine. "
    "At 100 TB this is scan-bound and embarrassingly parallel",
)
def t19_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    m = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
        ).alias("sum_wl"),
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).alias("alpha_words"),
        F.size(F.filter(words, lambda x: F.lower(x).isin(*STOPWORDS))).alias("stop_hits"),
        F.size(F.filter(words, lambda x: x.rlike("^[^A-Za-z0-9]+$"))).alias("sym_words"),
    )
    mean_wl = F.col("sum_wl").cast("double") / F.col("n_words")
    alpha_ppm = F.floor(F.col("alpha_words").cast("double") * 1_000_000.0 / F.col("n_words"))
    r_wordcount = F.col("n_words").between(20, 100000)
    r_meanlen = mean_wl.between(3.0, 10.0)
    r_alpha = alpha_ppm >= 800000
    r_stop = F.col("stop_hits") >= 2
    r_symbol = F.col("sym_words") * 10 <= F.col("n_words")
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        alpha_ppm.cast("bigint").alias("alpha_ppm"),
        F.col("stop_hits").cast("bigint").alias("stop_hits"),
        r_wordcount.alias("r_wordcount"),
        r_meanlen.alias("r_meanlen"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        r_symbol.alias("r_symbol"),
        (r_wordcount & r_meanlen & r_alpha & r_stop & r_symbol).alias("pass_gopher"),
    )


# t18 PII patterns — deliberately restricted to the regex subset where
# Java (Spark) and RE2 (DuckDB) agree: char classes, bounded repeats,
# \b word boundaries; no lookaround, no backrefs.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# the synthetic contact footer (fixture text is digit-free word salad, so
# the PII surface is constructed — identically in both engines — on a
# deterministic third of the corpus; the untouched two-thirds pin the
# negative path)
_SQL_PII_FOOTER = (
    "' Contact: user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
)


@register(
    "t18_pii_scrub",
    f"""WITH aug AS (
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN text || {_SQL_PII_FOOTER}
                     ELSE text END AS text
         FROM documents
       ), red AS (
         SELECT doc_id, text,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                    '{_PII_PHONE}', '<PHONE>', 'g'),
                  '{_PII_IPV4}', '<IP>', 'g') AS clean
         FROM aug)
       SELECT doc_id,
              CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
              CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ips,
              (len(regexp_extract_all(text, '{_PII_EMAIL}'))
               + len(regexp_extract_all(text, '{_PII_PHONE}'))
               + len(regexp_extract_all(text, '{_PII_IPV4}'))) > 0 AS had_pii,
              md5(clean) AS clean_fp,
              CAST(len(clean) AS BIGINT) AS clean_len
       FROM red""",
    tags=("text", "pii", "privacy", "headline"),
    doc="PII detection + redaction pass (emails, dashed phone numbers, "
    "IPv4 literals): per-document match counts, a had_pii flag, and the "
    "md5 fingerprint + length of the REDACTED text — the oracle proves "
    "the actual replacement output byte-for-byte, not just the counts. "
    "Patterns live in the Java∩RE2 regex subset so both engines match "
    "identically; redaction order (email → phone → ip) is pinned since "
    "later patterns could touch earlier spans. Pure narrow projection — "
    "regexp_count/regexp_replace inside codegen, no Python, no shuffle; "
    "at 100 TB this is the scan-bound scrub stage ahead of any "
    "training-data release gate",
)
def t18_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    footer = F.concat(
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1"),
    )
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), footer))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IPV4,
        "<IP>",
    )
    n_emails = F.regexp_count("text", F.lit(_PII_EMAIL))
    n_phones = F.regexp_count("text", F.lit(_PII_PHONE))
    n_ips = F.regexp_count("text", F.lit(_PII_IPV4))
    return aug.select(
        "doc_id",
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
        n_ips.cast("bigint").alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("had_pii"),
        F.md5(clean).alias("clean_fp"),
        F.length(clean).cast("bigint").alias("clean_len"),
    )


@register(
    "t17_bpe_encode",
    _sql_t17(),
    tags=("text", "tokenize", "bpe", "headline"),
    doc="BPE ENCODE over the learned vocabulary — the consumer half of "
    "t15's training loop: after the final merge round each distinct "
    "pretoken's symbol sequence IS its encoding, so the corpus is "
    "tokenized by joining pretokens to a vocabulary-sized (word → "
    "token-count) table — the merges are never re-applied per "
    "occurrence. Emits per-document pretoken/BPE-token/char counts and "
    "the chars-per-token compression ratio (integer ppm — the token-"
    "budget planning number). Scale shape: the only corpus-sized stages "
    "are the pretoken explode joined against a BROADCAST vocabulary and "
    "one map-side-combinable per-doc aggregate; the training loop's "
    "cost is bounded by DISTINCT pretokens (t15's contract). The oracle "
    "replays the identical 8 training rounds as CTEs, then the same "
    "join+agg — bit-identical by the t15 argument.",
)
def t17_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _bpe_encode_corpus(docs)


def _bpe_encode_corpus(docs: DataFrame, n_merges: int = _BPE_MERGES) -> DataFrame:
    """t17's body, depth-parameterized (paired with ``_sql_t17(n_merges)``)."""
    _merges, seq = _bpe_train(docs, n_merges)
    ntok = seq.select(
        "word",
        F.size("syms").cast("bigint").alias("n_tok"),
        F.length(F.concat_ws("", "syms")).cast("bigint").alias("n_chars"),
    )
    corpus = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
        ).alias("word"),
    )
    return (
        corpus.join(F.broadcast(ntok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pretokens"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_pretoken_chars"),
            F.floor(
                F.sum("n_chars").cast("double") * 1_000_000.0 / F.sum("n_tok")
            )
            .cast("bigint")
            .alias("chars_per_token_ppm"),
        )
    )


# script/char-class regexes, one per engine dialect (same classes):
# Java regex uses \uXXXX escapes, RE2 (DuckDB) uses \x{XXXX}
_T20_CLASSES_SPARK = {
    "latin": r"[A-Za-z]",
    "digit": r"[0-9]",
    "space": r"\s",
    "cjk": "[一-鿿]",
}
_T20_CLASSES_SQL = {
    "latin": "[A-Za-z]",
    "digit": "[0-9]",
    "space": r"\s",
    "cjk": r"[\x{4e00}-\x{9fff}]",
}


@register(
    "t20_script_mix",
    f"""WITH d AS (
         SELECT lang, len(text) AS n_chars,
                {', '.join(f"len(regexp_extract_all(text, '{rx}')) AS n_{k}"
                           for k, rx in _T20_CLASSES_SQL.items())}
         FROM documents)
       SELECT lang,
              COUNT(*) AS n_docs,
              CAST(SUM(n_latin) AS BIGINT) AS n_latin,
              CAST(SUM(n_digit) AS BIGINT) AS n_digit,
              CAST(SUM(n_space) AS BIGINT) AS n_space,
              CAST(SUM(n_cjk) AS BIGINT) AS n_cjk,
              CAST(SUM(n_chars - n_latin - n_digit - n_space - n_cjk) AS BIGINT)
                  AS n_other,
              SUM(CASE WHEN n_latin > 0 AND n_cjk > 0 THEN 1 ELSE 0 END)::BIGINT
                  AS n_mixed_script
       FROM d GROUP BY lang""",
    tags=("text", "script", "quality"),
    doc="Script-mix audit — the unicode-class profile a multilingual "
    "corpus intake runs before language-ID can be trusted: per-language "
    "rollup of character-class counts (latin letters, digits, "
    "whitespace, CJK ideographs, other) plus the count of MIXED-script "
    "documents (latin + CJK in one doc — the mojibake/spam/embedded-"
    "markup tripwire; t3's marker voting is blind to it). Counts come "
    "from regexp_extract_all lengths — JVM-side regex, no Python — with "
    "the same character classes expressed in each engine's dialect "
    "(Java \\uXXXX vs RE2 \\x{XXXX}); 'other' is derived by "
    "subtraction so the five classes always partition the text exactly. "
    "Scan + one hash agg on lang; crafted unicode rows pinned in "
    "tests/test_r8_ops.py (the fixture corpus is ASCII)",
)
def t20_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        k: F.size(F.regexp_extract_all("text", F.lit(rx), 0))
        for k, rx in _T20_CLASSES_SPARK.items()
    }
    d = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        *[c.alias(f"n_{k}") for k, c in counts.items()],
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_latin").cast("bigint").alias("n_latin"),
        F.sum("n_digit").cast("bigint").alias("n_digit"),
        F.sum("n_space").cast("bigint").alias("n_space"),
        F.sum("n_cjk").cast("bigint").alias("n_cjk"),
        F.sum(
            F.col("n_chars") - F.col("n_latin") - F.col("n_digit")
            - F.col("n_space") - F.col("n_cjk")
        )
        .cast("bigint")
        .alias("n_other"),
        F.sum(F.when((F.col("n_latin") > 0) & (F.col("n_cjk") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_mixed_script"),
    )


# --- t21: BATCHED BPE training — the real-32k-vocabulary cost model -------
#
# t15 proves the exact Sennrich loop (one merge per distributed round);
# its honest weakness is round count: 32k merges = 32k driver-dispatched
# jobs (~250ms each measured, NOTES_r8). t21 is the production answer:
# each round takes the TOP-K pair candidates and applies every candidate
# that is symbol-disjoint from all HIGHER-RANKED candidates — a
# deterministic, order-free prefix rule (rank 1 is always kept, so every
# round makes progress; a candidate sharing a symbol with any
# higher-ranked candidate waits for the next round's recount). Disjoint
# merges can apply SIMULTANEOUSLY because two matches of different
# symbol-disjoint pairs can never be adjacent in a symbol sequence
# (adjacency would force a shared symbol), so the t15 run-parity trick
# carries over per pair unchanged. Rounds collapse from vocab to
# ~vocab/K_effective. The trade vs t15: merge ranks within a round are
# assigned from the SAME pair-count snapshot (classic batched-BPE
# approximation); t15 remains the reference-exact form.

_T21_ROUNDS = 4
_T21_K = 8


def _sql_t21(n_rounds: int = _T21_ROUNDS, k: int = _T21_K) -> str:
    """t21's oracle: the same batched rounds unrolled as CTEs — top-K
    ranking, the prefix conflict filter as a NOT EXISTS self-join, and
    the simultaneous merge via the shared run-parity machinery."""
    parts = [
        f"""wc AS (
      SELECT tok AS word, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS tok
            FROM documents)
      GROUP BY tok),
    b0 AS MATERIALIZED (
      SELECT word, freq, i - 1 AS pos, substr(word, i, 1) AS sym
      FROM wc, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) t)"""
    ]
    for r in range(n_rounds):
        parts.append(f"""qc{r} AS (
      SELECT a, b, SUM(freq) AS f FROM (
        SELECT sym AS a, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b, freq
        FROM b{r})
      WHERE b IS NOT NULL GROUP BY a, b),
    tk{r} AS (
      SELECT a, b, f, rk FROM (
        SELECT a, b, f, ROW_NUMBER() OVER (ORDER BY f DESC, a, b) AS rk
        FROM qc{r})
      WHERE rk <= {k}),
    kp{r}_sel AS MATERIALIZED (
      SELECT t.a, t.b, t.f, t.rk FROM tk{r} t
      WHERE NOT EXISTS (
        SELECT 1 FROM tk{r} h
        WHERE h.rk < t.rk
          AND (h.a = t.a OR h.a = t.b OR h.b = t.a OR h.b = t.b))),
    mk{r} AS (
      SELECT s.word, s.freq, s.pos, s.sym, sel.a AS ba, sel.b AS bb,
             sel.a IS NOT NULL AS m
      FROM (SELECT *, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
            FROM b{r}) s
      LEFT JOIN kp{r}_sel sel ON s.sym = sel.a AND s.nxt = sel.b),
    rn{r} AS (
      SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
                    OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM mk{r}),
    pa{r} AS (
      SELECT *, m AND (rn - MIN(rn) OVER (PARTITION BY word, m, pos - rn)) % 2 = 0
                    AS keep
      FROM rn{r}),
    dc{r} AS (
      SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY word ORDER BY pos), FALSE)
                    AS consumed
      FROM pa{r}),
    b{r + 1} AS MATERIALIZED (
      SELECT word, freq,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
             CASE WHEN keep THEN ba || bb ELSE sym END AS sym
      FROM dc{r} WHERE NOT consumed)""")
    finals = " UNION ALL ".join(
        f"SELECT {r + 1} AS round, CAST(rk AS BIGINT) AS cand_rank, "
        f"a AS merge_left, b AS merge_right, CAST(f AS BIGINT) AS pair_freq "
        f"FROM kp{r}_sel"
        for r in range(n_rounds)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + finals


def _bpe_train_batched(
    docs: DataFrame, n_rounds: int = _T21_ROUNDS, k: int = _T21_K
) -> list[DataFrame]:
    """The t21 loop: per-round merge tables (round, cand_rank, pair, freq)."""
    wc = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq = wc.select(
        "word",
        "freq",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("pos", "sym"),
    ).localCheckpoint()
    w_word = Window.partitionBy("word").orderBy("pos")
    merges: list[DataFrame] = []
    for r in range(n_rounds):
        pc = (
            seq.withColumn("b", F.lead("sym").over(w_word))
            .where(F.col("b").isNotNull())
            .groupBy(F.col("sym").alias("a"), "b")
            .agg(F.sum("freq").alias("f"))
        )
        topk = (
            pc.orderBy(F.desc("f"), "a", "b")
            .limit(k)
            .withColumn(
                "rk", F.row_number().over(Window.orderBy(F.desc("f"), "a", "b"))
            )
        )
        t, h = topk.alias("t"), topk.alias("h")
        conflict = (F.col("h.rk") < F.col("t.rk")) & (
            (F.col("h.a") == F.col("t.a"))
            | (F.col("h.a") == F.col("t.b"))
            | (F.col("h.b") == F.col("t.a"))
            | (F.col("h.b") == F.col("t.b"))
        )
        sel = (
            t.join(h, conflict, "left_anti")
            .select(
                F.col("a").alias("ba"), F.col("b").alias("bb"), "f", "rk"
            )
            .localCheckpoint()  # ≤ k rows, read twice (merge + output)
        )
        merges.append(
            sel.select(
                F.lit(r + 1).alias("round"),
                F.col("rk").cast("bigint").alias("cand_rank"),
                F.col("ba").alias("merge_left"),
                F.col("bb").alias("merge_right"),
                F.col("f").cast("bigint").alias("pair_freq"),
            )
        )
        dr = (
            seq.withColumn("nxt", F.lead("sym").over(w_word))
            .join(
                F.broadcast(sel.select("ba", "bb")),
                (F.col("sym") == F.col("ba")) & (F.col("nxt") == F.col("bb")),
                "left",
            )
            .withColumn("m", F.col("ba").isNotNull())
            .withColumn("rn", F.sum(F.when(F.col("m"), 1).otherwise(0)).over(w_word))
            .withColumn("grp", F.col("pos") - F.col("rn"))
            .withColumn(
                "minrn", F.min("rn").over(Window.partitionBy("word", "m", "grp"))
            )
            .withColumn("keep", F.col("m") & (((F.col("rn") - F.col("minrn")) % 2) == 0))
            .withColumn("consumed", F.coalesce(F.lag("keep").over(w_word), F.lit(False)))
        )
        seq = (
            dr.where(~F.col("consumed"))
            .select(
                "word",
                "freq",
                (F.row_number().over(w_word) - 1).alias("pos"),
                F.when(F.col("keep"), F.concat("ba", "bb")).otherwise(F.col("sym")).alias("sym"),
            )
            .localCheckpoint()
        )
    return merges


@register(
    "t21_bpe_batched_merges",
    _sql_t21(),
    tags=("text", "tokenize", "bpe", "iterative", "batched"),
    doc="BATCHED BPE training — the production-scale form of t15's loop "
    f"(VERDICT r7 nit: 32k sequential rounds don't fly): each round "
    f"ranks the top-{_T21_K} pair candidates from ONE count snapshot "
    "and applies every candidate that is symbol-disjoint from all "
    "higher-ranked candidates (deterministic prefix rule; rank 1 always "
    "applies, so progress is guaranteed — no livelock). Symbol-disjoint "
    "merges apply simultaneously because their matches can never be "
    "adjacent (adjacency forces a shared symbol), so the run-parity "
    "merge machinery carries over per pair unchanged. Rounds collapse "
    f"from vocabulary-size to ~vocab/{_T21_K}: the driver-dispatch cost "
    "model that makes 32k merges feasible (NOTES_r8 measured "
    "~250ms/round dispatch). Emits (round, cand_rank, pair, freq); the "
    "oracle unrolls identical rounds — same ranking, same NOT-EXISTS "
    "conflict filter, same simultaneous merge",
)
def t21_bpe_batched_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_train_batched(docs)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


# ---------------------------------------------------------------------------
# t22: unigram-LM (SentencePiece-style) tokenizer — one exact EM iteration
# ---------------------------------------------------------------------------

_T22_MAXP = 4   # max piece length (SentencePiece seeds from bounded substrings)
_T22_MAXW = 12  # word-length cap: bounds the lattice (≤ tetranacci(12) ≈ 2.2k
# segmentations per word), applied identically in the oracle
_T22_VOCABS = (40, 120)  # two vocabulary sizes (multi-char pieces; all single
# characters are force-included — SentencePiece's character-coverage rule,
# which also guarantees every word has ≥1 segmentation)


def _t22_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) — the vocabulary-bounded object every tokenizer-training
    stage runs on (t15's discipline: the corpus-sized work is ONE tokenize +
    groupBy; everything after operates on distinct words)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where((F.length("word") >= 1) & (F.length("word") <= _T22_MAXW))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _t22_vocab(spark: SparkSession, sf_dir: str, v: int) -> DataFrame:
    """All single characters + the top-``v`` multi-char pieces by
    freq-weighted occurrence count (ties → lexicographic)."""
    spans = t22_span_occurrences(_t22_words(spark, sf_dir))
    chars = spans.where(F.length("piece") == 1).select("piece").distinct()
    multi = (
        spans.where(F.length("piece") >= 2)
        .groupBy("piece")
        .agg(F.sum("freq").alias("score"))
        .orderBy(F.desc("score"), "piece")
        .limit(v)
        .select("piece")
    )
    return chars.unionByName(multi).distinct()


def t22_span_occurrences(words: DataFrame) -> DataFrame:
    """(word, freq, piece) — exact substring occurrences (one row per
    (word, start, length)), generated positionally so no clamped-tail
    duplicates appear."""
    spans_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("word") - 1),
            lambda i: F.transform(
                # lengths 1..min(MAXP, len - i)
                F.sequence(F.lit(1), F.least(F.lit(_T22_MAXP), F.length("word") - i)),
                lambda l: F.col("word").substr(i + 1, l),
            ),
        )
    )
    return words.select("word", "freq", F.explode(spans_arr).alias("piece"))


def _t22_lattice_counts(word: str, vocab: frozenset, maxp: int) -> tuple[int, dict]:
    """Integer lattice DP under a UNIFORM piece model: fwd/bwd path counts,
    and per-piece path-weighted occurrence counts
    n_with(piece) = Σ_{(i,j): word[i:j]=piece} fwd(i)·bwd(j) — exactly the
    numerator of the EM E-step posterior when all pieces are equally
    likely. All integers → bit-identical in any engine."""
    L = len(word)
    fwd = [0] * (L + 1)
    fwd[0] = 1
    for j in range(1, L + 1):
        for i in range(max(0, j - maxp), j):
            if word[i:j] in vocab:
                fwd[j] += fwd[i]
    bwd = [0] * (L + 1)
    bwd[L] = 1
    for i in range(L - 1, -1, -1):
        for j in range(i + 1, min(L, i + maxp) + 1):
            if word[i:j] in vocab:
                bwd[i] += bwd[j]
    nwith: dict = {}
    for i in range(L):
        for j in range(i + 1, min(L, i + maxp) + 1):
            p = word[i:j]
            if p in vocab and fwd[i] and bwd[j]:
                nwith[p] = nwith.get(p, 0) + fwd[i] * bwd[j]
    return fwd[L], nwith


def t22_estep(words: DataFrame, vocab_pieces: frozenset) -> DataFrame:
    """E-step over the distributed word table: per (word, piece) the
    integer path counts (n_with, n_paths). The vocabulary rides into the
    Arrow tasks as a closure (bounded: V + charset rows — the centroid/
    bloom discipline for small broadcast state)."""
    import pandas as pd

    maxp = _T22_MAXP

    def batches(pdfs):
        for pdf in pdfs:
            words_o, pieces_o, nw_o, np_o = [], [], [], []
            for word in pdf["word"]:
                n_paths, nwith = _t22_lattice_counts(word, vocab_pieces, maxp)
                for piece, nw in sorted(nwith.items()):
                    words_o.append(word)
                    pieces_o.append(piece)
                    nw_o.append(nw)
                    np_o.append(n_paths)
            yield pd.DataFrame(
                {"word": words_o, "piece": pieces_o, "n_with": nw_o, "n_paths": np_o}
            )

    return words.select("word").mapInPandas(
        batches, schema="word string, piece string, n_with long, n_paths long"
    )


def t22_mstep(estep: DataFrame, words: DataFrame) -> DataFrame:
    """M-step, integer-exact: posterior_micro = (n_with·10⁶) div n_paths
    (integer division — identical in Spark and DuckDB), score_micro(piece)
    = Σ_w freq_w · posterior_micro, prob = one double division on exact
    bigint operands."""
    scored = (
        estep.join(words, "word")
        .select("piece", F.expr("freq * ((n_with * 1000000) div n_paths)").alias("c"))
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("score_micro"))
    )
    w = Window.partitionBy()
    return scored.select(
        "piece",
        "score_micro",
        F.round(
            F.col("score_micro").cast("double")
            / F.sum("score_micro").over(w).cast("double"),
            6,
        ).alias("prob"),
    )


def _t22_sql_one(v: int) -> str:
    """Oracle for one vocabulary size: the same E/M arithmetic, with the
    lattice counts obtained by ENUMERATING segmentations in a recursive
    CTE (path multiplicity ≡ fwd·bwd products — feasible because the
    word-length cap bounds paths)."""
    return f"""
        multi{v} AS (SELECT piece FROM (
            SELECT piece, SUM(freq) AS score FROM spans WHERE len(piece) >= 2
            GROUP BY piece)
          ORDER BY score DESC, piece LIMIT {v}),
        vocab{v} AS (SELECT piece FROM chars UNION SELECT piece FROM multi{v}),
        edges{v} AS MATERIALIZED (
          SELECT s.word, s.i, s.i + len(s.piece) AS j, s.piece
          FROM spans s JOIN vocab{v} USING (piece)),
        rec{v} AS (
          SELECT word, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM words
          UNION ALL
          SELECT r.word, e.j, list_append(r.pieces, e.piece)
          FROM rec{v} r JOIN edges{v} e ON e.word = r.word AND e.i = r.pos),
        fullp{v} AS MATERIALIZED (
          SELECT r.word, r.pieces FROM rec{v} r JOIN words w USING (word)
          WHERE r.pos = len(w.word)),
        tot{v} AS (SELECT word, COUNT(*) AS n_paths FROM fullp{v} GROUP BY word),
        nwith{v} AS (SELECT word, piece, COUNT(*) AS n_with
                     FROM (SELECT word, unnest(pieces) AS piece FROM fullp{v})
                     GROUP BY word, piece),
        mstep{v} AS (
          SELECT piece,
                 CAST(SUM(freq * ((n_with * 1000000) // n_paths)) AS BIGINT)
                     AS score_micro
          FROM nwith{v} JOIN tot{v} USING (word) JOIN words USING (word)
          GROUP BY piece)"""


_T22_SQL = f"""WITH RECURSIVE
        words AS MATERIALIZED (
          SELECT word, COUNT(*) AS freq
          FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM documents)
          WHERE len(word) BETWEEN 1 AND {_T22_MAXW} GROUP BY word),
        spans AS MATERIALIZED (
          SELECT w.word, w.freq, CAST(t1.i AS INT) AS i,
                 substr(w.word, CAST(t1.i AS INT) + 1, CAST(t2.l AS INT)) AS piece
          FROM words w,
               UNNEST(range(0, len(w.word))) AS t1(i),
               UNNEST(range(1, {_T22_MAXP} + 1)) AS t2(l)
          WHERE t1.i + t2.l <= len(w.word)),
        chars AS (SELECT DISTINCT piece FROM spans WHERE len(piece) = 1),
        {_t22_sql_one(_T22_VOCABS[0])},
        {_t22_sql_one(_T22_VOCABS[1])}
        SELECT vocab_size, piece, score_micro,
               ROUND(CAST(score_micro AS DOUBLE)
                     / CAST(SUM(score_micro) OVER (PARTITION BY vocab_size) AS DOUBLE),
                     6) AS prob
        FROM (
          SELECT {_T22_VOCABS[0]} AS vocab_size, * FROM mstep{_T22_VOCABS[0]}
          UNION ALL
          SELECT {_T22_VOCABS[1]}, * FROM mstep{_T22_VOCABS[1]})"""


@register(
    "t22_unigram_em",
    _T22_SQL,
    tags=("text", "tokenizer", "unigram", "em"),
    doc="Unigram-LM (SentencePiece-style) tokenizer training step — the "
    "other production tokenizer family next to BPE (t15/t21): seed "
    "vocabulary = all single characters (character-coverage rule) + the "
    "top-V freq-weighted substrings (V = 40 and 120, both emitted), then "
    "ONE exact EM iteration from the uniform init: E-step = per-(word, "
    "piece) lattice posteriors as INTEGER path counts (fwd·bwd products "
    "— under a uniform piece model the posterior is a path-count ratio, "
    "no floats anywhere), M-step = renormalized expected counts with "
    "micro-scaled integer division, one final double division on exact "
    "bigint operands. Oracle: DuckDB re-derives the lattice by "
    "enumerating segmentations in a recursive CTE (path multiplicity ≡ "
    "fwd·bwd), feasible because the 12-char word cap bounds paths at "
    "~2.2k/word; a hypothesis test checks the DP against a pure-python "
    "enumerator on random words. Scale: the corpus-sized stage is ONE "
    "tokenize+groupBy (t15's discipline); the lattice runs per DISTINCT "
    "word with the (V + charset)-row vocabulary carried into Arrow "
    "tasks; subsequent EM iterations reuse the same plan with the "
    "updated piece table.",
)
def t22_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _t22_words(spark, sf_dir)
    out = None
    for v in _T22_VOCABS:
        vocab = frozenset(
            r.piece for r in _t22_vocab(spark, sf_dir, v).collect()
        )  # bounded collect: V + |charset| rows (centroid/bloom discipline)
        m = t22_mstep(t22_estep(words, vocab), words).withColumn(
            "vocab_size", F.lit(v)
        )
        out = m if out is None else out.unionByName(m)
    return out.select("vocab_size", "piece", "score_micro", "prob")


# ---------------------------------------------------------------------------
# t23: unigram-LM ENCODE — min-pieces Viterbi over the trained vocabulary
# ---------------------------------------------------------------------------

_T23_V = _T22_VOCABS[1]  # encode with the larger trained vocabulary


def _t23_encode(word: str, vocab: frozenset, maxp: int) -> tuple[int, tuple]:
    """Viterbi segmentation under the uniform piece model: FEWEST pieces,
    ties broken by the lexicographically smallest piece sequence — both
    integer-/string-exact, so the oracle can enumerate and re-rank.
    Backward DP over (count, sequence) tuples: suffix optimality holds
    because total count forces a count-minimal suffix, and within the
    fixed first piece the lexicographic order of the full sequence is
    the order of the optimal suffix."""
    L = len(word)
    dp: list = [None] * (L + 1)
    dp[L] = (0, ())
    for i in range(L - 1, -1, -1):
        best = None
        for j in range(i + 1, min(L, i + maxp) + 1):
            p = word[i:j]
            if p in vocab and dp[j] is not None:
                cand = (1 + dp[j][0], (p,) + dp[j][1])
                if best is None or cand < best:
                    best = cand
        dp[i] = best
    return dp[0]


def t23_encode_words(words: DataFrame, vocab_pieces: frozenset) -> DataFrame:
    """Distributed encode over the distinct-word table (t22's E-step
    shape: bounded vocabulary in the task closure, lattice per word)."""
    import pandas as pd

    maxp = _T22_MAXP

    def batches(pdfs):
        for pdf in pdfs:
            out = []
            for word in pdf["word"]:
                n, seq = _t23_encode(word, vocab_pieces, maxp)
                out.append((word, n, "|".join(seq)))
            yield pd.DataFrame(out, columns=["word", "n_pieces", "encoded"])

    return words.select("word").mapInPandas(
        batches, schema="word string, n_pieces long, encoded string"
    )


@register(
    "t23_unigram_encode",
    f"""WITH RECURSIVE
        words AS MATERIALIZED (
          SELECT word, COUNT(*) AS freq
          FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM documents)
          WHERE len(word) BETWEEN 1 AND {_T22_MAXW} GROUP BY word),
        spans AS MATERIALIZED (
          SELECT w.word, w.freq, CAST(t1.i AS INT) AS i,
                 substr(w.word, CAST(t1.i AS INT) + 1, CAST(t2.l AS INT)) AS piece
          FROM words w,
               UNNEST(range(0, len(w.word))) AS t1(i),
               UNNEST(range(1, {_T22_MAXP} + 1)) AS t2(l)
          WHERE t1.i + t2.l <= len(w.word)),
        chars AS (SELECT DISTINCT piece FROM spans WHERE len(piece) = 1),
        multi AS (SELECT piece FROM (
            SELECT piece, SUM(freq) AS score FROM spans WHERE len(piece) >= 2
            GROUP BY piece)
          ORDER BY score DESC, piece LIMIT {_T23_V}),
        vocab AS (SELECT piece FROM chars UNION SELECT piece FROM multi),
        edges AS MATERIALIZED (
          SELECT s.word, s.i, s.i + len(s.piece) AS j, s.piece
          FROM spans s JOIN vocab USING (piece)),
        rec AS (
          SELECT word, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM words
          UNION ALL
          SELECT r.word, e.j, list_append(r.pieces, e.piece)
          FROM rec r JOIN edges e ON e.word = r.word AND e.i = r.pos),
        fullp AS MATERIALIZED (
          SELECT r.word, r.pieces FROM rec r JOIN words w USING (word)
          WHERE r.pos = len(w.word)),
        best AS (
          SELECT word, pieces FROM (
            SELECT word, pieces,
                   ROW_NUMBER() OVER (PARTITION BY word
                                      ORDER BY len(pieces), pieces) AS rn
            FROM fullp) WHERE rn = 1)
        SELECT b.word, w.freq,
               CAST(len(b.pieces) AS BIGINT) AS n_pieces,
               array_to_string(b.pieces, '|') AS encoded
        FROM best b JOIN words w USING (word)""",
    tags=("text", "tokenizer", "unigram", "encode"),
    doc="Unigram-LM tokenizer ENCODE — the production counterpart of "
    "t22's training step (t17 is BPE's encode; this is SentencePiece's): "
    "segment every word with the trained vocabulary by Viterbi under "
    "the uniform piece model — FEWEST pieces, lexicographically "
    "smallest sequence on ties — which keeps the whole decision "
    "integer-/string-exact, so the DuckDB oracle enumerates all "
    "segmentations (recursive CTE, path-bounded by the 12-char word "
    "cap) and re-ranks by (length, sequence) to the identical answer. "
    "Character coverage guarantees a segmentation exists for every "
    "word. Scale: corpus work is ONE tokenize+groupBy; the Viterbi runs "
    "per DISTINCT word with the (V+charset)-row vocabulary in the task "
    "closure, and applying the encoding corpus-wide is a broadcast join "
    "of this word→encoding table against the token stream (t17's "
    "apply shape).",
)
def t23_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _t22_words(spark, sf_dir)
    vocab = frozenset(
        r.piece for r in _t22_vocab(spark, sf_dir, _T23_V).collect()
    )  # bounded collect: V + |charset| rows
    return t23_encode_words(words, vocab).join(words, "word").select(
        "word", "freq", "n_pieces", "encoded"
    )


# ---------------------------------------------------------------------------
# t24: bigram-LM surprisal filter — the CCNet family: score every document
# under a language model trained on the corpus itself, flag the tail.
# log2 comes from length(bin(n)) so the whole score is INTEGER-exact.
# ---------------------------------------------------------------------------



@register(
    "t24_bigram_surprisal",
    f"""WITH big AS (
          SELECT doc_id, w1, w2
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> {{'w1': t[i], 'w2': t[i + 1]}}),
                              recursive := true)
                FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents))),
        bc AS (SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS cc FROM bc GROUP BY w1),
        scored AS (
          SELECT b.doc_id,
                 length(bin(c.cc)) - length(bin(k.cnt)) AS bits
          FROM big b
          JOIN bc k ON b.w1 = k.w1 AND b.w2 = k.w2
          JOIN ctx c ON b.w1 = c.w1),
        perdoc AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 CAST(SUM(bits) AS BIGINT) AS surprisal_bits
          FROM scored GROUP BY doc_id),
        corpus AS (
          SELECT (CAST(SUM(surprisal_bits) AS BIGINT) * 1000000)
                 // CAST(SUM(n_bigrams) AS BIGINT) AS corpus_micro
          FROM perdoc)
        SELECT doc_id, n_bigrams, surprisal_bits,
               (surprisal_bits * 1000000) // n_bigrams AS micro_bits_per_bigram,
               ((surprisal_bits * 1000000) // n_bigrams) > corpus_micro
                 AS flagged
        FROM perdoc, corpus""",
    tags=("text", "lm", "quality", "surprisal", "headline"),
    doc="Bigram-LM surprisal filtering — the CCNet recipe (Wenzek et al. "
    "2020): train a language model on the corpus, score every document "
    "by per-token surprisal, flag the high-perplexity tail. The LM is "
    "the corpus's own bigram MLE p(w2|w1) = cnt(w1,w2)/cnt(w1); "
    "surprisal -log2 p is computed as length(bin(ctx)) - "
    "length(bin(cnt)) — floor-log2 via binary STRING length, a pure "
    "integer identical in both engines (ln()/log2() are not correctly "
    "rounded and can flip last-ulp cross-engine — the t9 lesson; the "
    "bit-length surrogate keeps the whole score hash-exact, and in "
    "production the same plan carries float log2). Output: per-doc "
    "bigram count, total surprisal bits, micro-scaled mean, and a flag "
    "for docs above the CORPUS-mean surprisal — a 1-row broadcast "
    "scalar, so the cut tracks the vocabulary at any scale (CCNet cuts "
    "by perplexity quantiles; the mean keeps the threshold a scalar "
    "instead of a global sort). Plan: ONE row-local tokenize+zip pass "
    "builds bigram occurrences (arrays_zip slices — no token-stream "
    "shuffle), collapsed to per-doc bigram counts map-side; counts and "
    "context totals are two stacked map-side-combinable aggs (ctx "
    "derives from bc — the corpus is read once), the doc-bigram⋈count "
    "joins are vocabulary-sized with NO broadcast hint (AQE's call — "
    "the t9 discipline), and the per-doc rollup is one agg keyed "
    "doc_id. At 100 TB: corpus passes = 1, everything else is "
    "vocabulary- or doc-keyed with map-side combine.",
)
def t24_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # KEPT the r13 posexplode+window form: the r15 zip + per-doc-count
    # rewrite measured faster at sf0.1 (~0.8s vs 1.39s) but 66.5s vs
    # 30.5s at the 100× probe (72× — over the 60× gate; the 26M-key
    # (doc, w1, w2) aggregate plus double evaluation of its subtree cost
    # more than the two window passes it replaced). t11's revert logic
    # applies: corpus-cardinality pair streams keep the window; the zip
    # form stays where pair streams feed small model aggregates.
    toks = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("p", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    nxt = F.lead("tok", 1).over(w)
    big = (
        toks.select("doc_id", F.col("tok").alias("w1"), nxt.alias("w2"))
        .where(F.col("w2").isNotNull())
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = bc.groupBy("w1").agg(F.sum("cnt").alias("cc"))
    bits = F.length(F.bin("cc")) - F.length(F.bin("cnt"))
    scored = (
        big.join(bc, ["w1", "w2"]).join(ctx, "w1").select("doc_id", bits.alias("bits"))
    )
    perdoc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").cast("long").alias("surprisal_bits"),
    )
    corpus = perdoc.agg(
        F.expr(
            "(CAST(SUM(surprisal_bits) AS BIGINT) * 1000000)"
            " div CAST(SUM(n_bigrams) AS BIGINT)"
        ).alias("corpus_micro")
    )
    micro = F.expr("(surprisal_bits * 1000000) div n_bigrams")
    return perdoc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "n_bigrams",
        "surprisal_bits",
        micro.alias("micro_bits_per_bigram"),
        (micro > F.col("corpus_micro")).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# t25: TRAINED character-n-gram language identification — the CCNet/C4
# front gate. t3's marker voting consumes a hand-coded stopword list;
# every lang-aware op downstream (t11, sm5, pipe3) consumes the fixture's
# `lang` column — t25 is the op that can PRODUCE one from raw text.
# ---------------------------------------------------------------------------

# character-bigram Naive Bayes: train on the doc_id%10<8 hash split,
# classify the held-out docs. All-integer scoring (micro-probabilities,
# the t22/t24 discipline) so both engines agree bit-for-bit.
_T25_NORM = (
    "' ' || array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ') || ' '"
)


def _t25_bigram_occurrences(norm: DataFrame, out_key: str) -> DataFrame:
    """(out_key, g): every character-bigram occurrence of the normalized
    string ``s`` — explode(adjacent_pairs(char array)): row-local slices
    + zip, no per-doc window shuffle, and pairing can never leak across
    doc boundaries because each row's array is its own document."""
    cols = ["doc_id"] if out_key == "doc_id" else ["doc_id", out_key]
    return (
        token_pairs(norm, cols, F.split("s", ""))
        .select(out_key, F.concat("w1", "w2").alias("g"))
        .where(F.length("g") == 2)
        .select(out_key, "g")
    )

_SQL_T25 = f"""WITH norm AS MATERIALIZED (
      SELECT doc_id, lang, {_T25_NORM} AS s FROM documents),
    tg AS (
      SELECT lang, substr(s, CAST(i AS INT), 2) AS g, COUNT(*) AS cnt
      FROM norm, LATERAL (SELECT unnest(range(1, len(s))) AS i) t
      WHERE doc_id % 10 < 8
      GROUP BY lang, g),
    tot AS (SELECT lang, SUM(cnt) AS tot FROM tg GROUP BY lang),
    model AS (
      SELECT lang AS ml, g, CAST((cnt * 1000000) // tot AS BIGINT) AS mu
      FROM tg JOIN tot USING (lang)),
    eg AS (
      SELECT doc_id, substr(s, CAST(i AS INT), 2) AS g, COUNT(*) AS occ
      FROM norm, LATERAL (SELECT unnest(range(1, len(s))) AS i) t
      WHERE doc_id % 10 >= 8
      GROUP BY doc_id, g),
    sc AS (
      SELECT e.doc_id, m.ml, CAST(SUM(e.occ * m.mu) AS BIGINT) AS score
      FROM eg e JOIN model m USING (g)
      GROUP BY e.doc_id, m.ml),
    best AS (
      SELECT doc_id, ml AS lang_pred, score FROM (
        SELECT doc_id, ml, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, ml) AS rn
        FROM sc) WHERE rn = 1)
    SELECT d.doc_id, d.lang,
           COALESCE(b.lang_pred, 'und') AS lang_pred,
           CAST(COALESCE(b.score, 0) AS BIGINT) AS score_micro,
           CAST(d.lang = COALESCE(b.lang_pred, 'und') AS INT) AS correct
    FROM documents d LEFT JOIN best b USING (doc_id)
    WHERE d.doc_id % 10 >= 8"""


@register(
    "t25_langid_train",
    _SQL_T25,
    tags=("text", "langid", "classifier", "train-eval", "headline"),
    doc="TRAINED character-bigram language identifier (the fastText/CCNet "
    "front gate, reduced to its deterministic core): docs hash-split "
    "8:2 (doc_id %% 10 — restartable, no rand()), per-language bigram "
    "micro-probabilities mu = (cnt*10^6) div total learned from the "
    "train split, held-out docs scored with the multinomial rule "
    "score(L) = sum occ*mu_L over their bigrams, argmax with (score "
    "DESC, lang) tie-break; docs whose bigrams never hit the model "
    "fall back to 'und'. All-integer scoring (t22/t24 micro "
    "discipline) - bit-identical cross-engine. The fixture corpus is "
    "language-DEGENERATE (all langs share one token pool), so the "
    "per-doc `correct` column reports the honest near-prior accuracy "
    "here; tests/test_r10_ops.py pins accuracy=1.0 on a crafted "
    "separable corpus, which is the claim that matters. Scale: the "
    "model is bounded by charset^2 x langs rows (broadcast); corpus "
    "work is one bigram explode + two map-side-combinable hash aggs "
    "keyed (doc,gram)/(doc,lang) - the d18 shingle shape, no "
    "all-pairs stage anywhere.",
)
def t25_langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = F.concat(F.lit(" "), F.concat_ws(" ", tokens("text")), F.lit(" "))
    norm = docs.select("doc_id", "lang", s.alias("s"))
    tg = (
        _t25_bigram_occurrences(norm.where(F.col("doc_id") % 10 < 8), "lang")
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = tg.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    model = (
        tg.join(tot, "lang")
        .select(
            F.col("lang").alias("ml"),
            "g",
            F.expr("(cnt * 1000000) div tot").cast("bigint").alias("mu"),
        )
    )
    eg = (
        _t25_bigram_occurrences(norm.where(F.col("doc_id") % 10 >= 8), "doc_id")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    sc = (
        eg.join(F.broadcast(model), "g")
        .groupBy("doc_id", "ml")
        .agg(F.sum(F.col("occ") * F.col("mu")).cast("bigint").alias("score"))
    )
    # argmax via min(struct(-score, lang)): score DESC then lang ASC -
    # map-side-combinable agg, no per-doc window shuffle
    best = sc.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("score")).alias("ns"),
                F.col("ml").alias("lp"),
                F.col("score").alias("sc"),
            )
        ).alias("b")
    )
    ev = docs.where(F.col("doc_id") % 10 >= 8).select("doc_id", "lang")
    return ev.join(best, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("b.lp"), F.lit("und")).alias("lang_pred"),
        F.coalesce(F.col("b.sc"), F.lit(0)).cast("bigint").alias("score_micro"),
        (
            F.col("lang") == F.coalesce(F.col("b.lp"), F.lit("und"))
        ).cast("int").alias("correct"),
    )


# ---------------------------------------------------------------------------
# t26/t27: WordPiece — the THIRD production tokenizer family (BPE t15/t17/
# t21 picks merges by raw pair frequency; unigram-LM t22/t23 prunes by
# likelihood; WordPiece picks merges by the likelihood RATIO
# count(ab)/(count(a)*count(b)) and encodes by greedy longest-match-first
# with '##' continuation pieces — Schuster & Nakajima 2012, BERT's
# tokenizer).
# ---------------------------------------------------------------------------

_T26_MERGES = 8
_T26_SCALE = 1_000_000_000  # nano-scaled integer merge scores. SCALE DIAL:
# pair_freq * 1e9 stays inside BIGINT up to ~9e9 pair occurrences; at
# larger corpus masses drop a factor of 1000 (scores are >=1e3 there)


def _sql_t26_parts(n_merges: int) -> list[str]:
    """The WordPiece training CTE chain shared by t26's and t27's
    oracles."""
    parts = [
        f"""wc AS (
      SELECT word, COUNT(*) AS freq
      FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM documents)
      WHERE len(word) BETWEEN 1 AND {_T22_MAXW}
      GROUP BY word),
    s0 AS MATERIALIZED (
      SELECT word, freq, i - 1 AS pos,
             CASE WHEN i = 1 THEN substr(word, 1, 1)
                  ELSE '##' || substr(word, i, 1) END AS sym
      FROM wc, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) t)"""
    ]
    for r in range(n_merges):
        parts.append(f"""pc{r} AS (
      SELECT a, b, SUM(freq) AS f FROM (
        SELECT sym AS a, LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS b, freq
        FROM s{r})
      WHERE b IS NOT NULL GROUP BY a, b),
    sc{r} AS (SELECT sym, SUM(freq) AS sf FROM s{r} GROUP BY sym),
    best{r} AS (
      SELECT p.a, p.b, p.f,
             CAST((p.f * {_T26_SCALE}) // (sa.sf * sb.sf) AS BIGINT) AS score
      FROM pc{r} p JOIN sc{r} sa ON sa.sym = p.a JOIN sc{r} sb ON sb.sym = p.b
      ORDER BY score DESC, p.a, p.b LIMIT 1),
    mk{r} AS (
      SELECT s.word, s.freq, s.pos, s.sym, b.a AS ba, b.b AS bb,
             COALESCE(s.sym = b.a
                      AND LEAD(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.b,
                      FALSE) AS m
      FROM s{r} s LEFT JOIN best{r} b ON TRUE),
    rn{r} AS (
      SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
                    OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM mk{r}),
    kp{r} AS (
      SELECT *, m AND (rn - MIN(rn) OVER (PARTITION BY word, m, pos - rn)) % 2 = 0
                    AS keep
      FROM rn{r}),
    dr{r} AS (
      SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY word ORDER BY pos), FALSE)
                    AS consumed
      FROM kp{r}),
    s{r + 1} AS MATERIALIZED (
      SELECT word, freq,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
             CASE WHEN keep THEN ba || regexp_replace(bb, '^##', '') ELSE sym END
                 AS sym
      FROM dr{r} WHERE NOT consumed)""")
    return parts


def _sql_t26(n_merges: int = _T26_MERGES) -> str:
    """t26's oracle: the SAME ``n_merges`` WordPiece training rounds
    unrolled as CTEs (t15's discipline — depth is a parameter and tests
    pin a second, deeper N). Differences from the BPE chain: symbols
    carry the '##' continuation prefix from initialization, the winner
    is argmax of the nano-scaled integer likelihood ratio
    (f*SCALE) div (sf(a)*sf(b)) instead of raw pair frequency, and the
    merged symbol strips the right piece's '##'."""
    parts = _sql_t26_parts(n_merges)
    finals = " UNION ALL ".join(
        f"SELECT {r + 1} AS merge_rank, a AS merge_left, b AS merge_right, "
        f"CAST(f AS BIGINT) AS pair_freq, score AS score_nano FROM best{r}"
        for r in range(n_merges)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + finals


def _sql_t27(n_merges: int = _T26_MERGES) -> str:
    """t27's oracle: t26's unrolled training chain, then the learned
    vocabulary (s0 alphabet + each round's merged product), the
    longest-match edge per (word, position), and a RECURSIVE greedy
    walk — linear because each position has at most one (max-length)
    edge; a word whose walk never reaches its end is [UNK]."""
    parts = _sql_t26_parts(n_merges)
    vocab_union = "\n      UNION\n      ".join(
        f"SELECT a || regexp_replace(b, '^##', '') AS piece FROM best{r}"
        for r in range(n_merges)
    )
    tail = f"""vocab AS (
      SELECT DISTINCT sym AS piece FROM s0
      UNION
      {vocab_union}),
    pos_l AS (
      SELECT w.word, t1.i, t2.l,
             CASE WHEN t1.i = 0 THEN substr(w.word, 1, CAST(t2.l AS INT))
                  ELSE '##' || substr(w.word, CAST(t1.i AS INT) + 1, CAST(t2.l AS INT))
                  END AS form
      FROM wc w,
           UNNEST(range(0, len(w.word))) AS t1(i),
           UNNEST(range(1, len(w.word) + 1)) AS t2(l)
      WHERE t1.i + t2.l <= len(w.word)),
    edge AS (
      SELECT word, i, MAX(l) AS l
      FROM pos_l p JOIN vocab v ON p.form = v.piece
      GROUP BY word, i),
    walk AS (
      SELECT word, CAST(0 AS BIGINT) AS pos, 0 AS n FROM wc
      UNION ALL
      SELECT w.word, w.pos + e.l, w.n + 1
      FROM walk w JOIN edge e ON e.word = w.word AND e.i = w.pos),
    done AS (
      SELECT word, n AS n_pieces FROM walk WHERE pos = len(word)),
    perword AS (
      SELECT w.word,
             COALESCE(d.n_pieces, 1) AS n_tok,
             CASE WHEN d.word IS NULL THEN 1 ELSE 0 END AS unk
      FROM wc w LEFT JOIN done d USING (word)),
    corpus AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS word FROM documents)
    SELECT c.doc_id,
           COUNT(*) AS n_pretokens,
           CAST(SUM(p.n_tok) AS BIGINT) AS n_wp_tokens,
           CAST(SUM(p.unk) AS BIGINT) AS n_unk_words
    FROM corpus c JOIN perword p USING (word)
    GROUP BY c.doc_id"""
    return "WITH RECURSIVE " + ",\n    ".join(parts) + ",\n    " + tail


def _wp_words(docs: DataFrame) -> DataFrame:
    """(word, freq) — t22's vocabulary-bounded word table (whitespace
    tokens, length-capped): the object every WordPiece stage runs on."""
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where((F.length("word") >= 1) & (F.length("word") <= _T22_MAXW))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _wp_train(
    docs: DataFrame, n_merges: int = _T26_MERGES
) -> tuple[list[DataFrame], DataFrame, DataFrame]:
    """The t26 WordPiece training loop (t15's run-parity machinery with
    the likelihood-ratio winner and '##' continuation symbols).

    Returns (per-round merge rows, the INITIAL symbol table s0 — t27's
    alphabet —, and the final symbol sequences)."""
    wc = _wp_words(docs)
    init_sym = (
        "transform(sequence(1, length(word)), i -> "
        "CASE WHEN i = 1 THEN substring(word, 1, 1) "
        "ELSE concat('##', substring(word, i, 1)) END)"
    )
    # Array form (the t15/_bpe_train rewrite, same argument): one row per
    # word carrying its symbol array; pairs and symbol masses come from
    # row-local explodes, the greedy run-parity merge is an array fold,
    # and the only per-round distributed work is two tiny aggregates +
    # the likelihood-ratio argmax as min(struct) — no per-position rows,
    # no window sorts, one checkpoint per round instead of two.
    s0 = wc.select("word", "freq", F.expr(init_sym).alias("syms")).localCheckpoint()
    seq = s0
    merges = []
    for r in range(n_merges):
        pc = (
            seq.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("f"))
        )
        scnt = (
            seq.select("freq", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("freq").alias("sf"))
        )
        best = (
            pc.join(
                scnt.select(F.col("sym").alias("a"), F.col("sf").alias("sfa")), "a"
            )
            .join(
                scnt.select(F.col("sym").alias("b"), F.col("sf").alias("sfb")), "b"
            )
            .withColumn(
                "score", F.expr(f"(f * {_T26_SCALE}) div (sfa * sfb)").cast("bigint")
            )
            .agg(F.min(F.struct((-F.col("score")).alias("ns"), "a", "b", "f")).alias("m"))
            .select(
                F.col("m.a").alias("ba"),
                F.col("m.b").alias("bb"),
                F.col("m.f").alias("f"),
                (-F.col("m.ns")).alias("score"),
            )
            .where(F.col("ba").isNotNull())
            .localCheckpoint()  # 0-or-1 row, read twice (merge + output)
        )
        merges.append(
            best.select(
                F.lit(r + 1).alias("merge_rank"),
                F.col("ba").alias("merge_left"),
                F.col("bb").alias("merge_right"),
                F.col("f").cast("bigint").alias("pair_freq"),
                F.col("score").alias("score_nano"),
            )
        )
        # checkpointed per round for the same reason as _bpe_train (r16):
        # unbounded lineage made round r re-run all prior folds — twice
        # here, since BOTH the pair aggregate and the symbol-mass
        # aggregate scan seq — t26 big wall +30% in SCALE_r15.
        seq = seq.join(F.broadcast(best.select("ba", "bb")), F.lit(True), "left").select(
            "word",
            "freq",
            F.aggregate(
                "syms",
                F.expr("CAST(array() AS array<string>)"),
                lambda acc, s: F.when(
                    (F.try_element_at(acc, F.lit(-1)) == F.col("ba"))
                    & (s == F.col("bb")),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(
                            F.concat(
                                F.try_element_at(acc, F.lit(-1)),
                                F.regexp_replace(s, "^##", ""),
                            )
                        ),
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ).alias("syms"),
        ).localCheckpoint()
    return merges, s0, seq


@register(
    "t26_wordpiece_train",
    _sql_t26(),
    tags=("text", "tokenize", "wordpiece", "iterative"),
    doc="WordPiece TRAINING (Schuster & Nakajima 2012; BERT's tokenizer) "
    f"— {_T26_MERGES} iterative merge rounds over the corpus's distinct "
    "words, returning the learned merge table. Differs from BPE (t15) "
    "in exactly the two places WordPiece differs: symbols carry the "
    "'##' continuation prefix from initialization (so the learned "
    "vocab distinguishes word-initial from word-internal pieces), and "
    "the winner is argmax of the LIKELIHOOD RATIO count(ab) / "
    "(count(a)*count(b)) — nano-scaled integer division, bit-identical "
    "cross-engine; tie-break (score DESC, pair lexicographic) — "
    "instead of raw pair frequency. The greedy left-to-right merge "
    "reuses t15's run-parity machinery with the merged symbol "
    "stripping the right piece's '##'. Scale: corpus-sized work is ONE "
    "tokenize+groupBy; every round then runs on DISTINCT words "
    "(vocabulary-bounded, the production-trainer shape), each round = "
    "two hash aggs (pairs, symbol masses) + a 1-row argmax broadcast "
    "back, lineage cut per round with localCheckpoint (d8 discipline). "
    "The oracle unrolls identical rounds as CTEs; tests pin a deeper "
    "N=12 chain and a property test vs a pure-python replay.",
)
def t26_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges, _s0, _seq = _wp_train(docs)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _wp_encode_word(word: str, vocab: frozenset) -> int | None:
    """Greedy longest-match-first WordPiece encode (BERT's MaxMatch):
    at each position take the LONGEST vocab piece ('##'-prefixed past
    position 0); no match anywhere → the whole word is [UNK] (None)."""
    pos, n, length = 0, 0, len(word)
    while pos < length:
        for piece_len in range(length - pos, 0, -1):
            form = (
                word[pos : pos + piece_len]
                if pos == 0
                else "##" + word[pos : pos + piece_len]
            )
            if form in vocab:
                pos += piece_len
                n += 1
                break
        else:
            return None
    return n


def wp_encode_words(words: DataFrame, vocab: frozenset) -> DataFrame:
    """(word, n_tok, unk) over the distinct-word table — the vocabulary
    rides into the Arrow tasks as a closure (t22/t23's bounded-broadcast
    discipline); [UNK] words count 1 token."""
    import pandas as pd

    def batches(pdfs):
        for pdf in pdfs:
            out_w, out_n, out_u = [], [], []
            for w in pdf["word"]:
                n = _wp_encode_word(w, vocab)
                out_w.append(w)
                out_n.append(1 if n is None else n)
                out_u.append(1 if n is None else 0)
            yield pd.DataFrame({"word": out_w, "n_tok": out_n, "unk": out_u})

    return words.select("word").mapInPandas(
        batches, schema="word string, n_tok long, unk long"
    )


def _wp_vocab(docs: DataFrame, n_merges: int = _T26_MERGES) -> frozenset:
    """The learned WordPiece vocabulary: the s0 alphabet (every initial
    and '##'-continuation character symbol) plus each round's merged
    product. Bounded collects only (|charset|·2 + n_merges rows)."""
    merges, s0, _seq = _wp_train(docs, n_merges)
    vocab = {
        r.sym for r in s0.select(F.explode("syms").alias("sym")).distinct().collect()
    }
    all_merges = merges[0]
    for m in merges[1:]:
        all_merges = all_merges.unionByName(m)
    for r in all_merges.collect():  # one bounded collect (≤ 1 row per round)
        right = r.merge_right
        if right.startswith("##"):
            right = right[2:]
        vocab.add(r.merge_left + right)
    return frozenset(vocab)


@register(
    "t27_wordpiece_encode",
    _sql_t27(),
    tags=("text", "tokenize", "wordpiece", "encode"),
    doc="WordPiece ENCODE over the t26-trained vocabulary: greedy "
    "longest-match-first (BERT's MaxMatch) with '##' continuation "
    "pieces — a word with an unmatchable position becomes one [UNK] "
    "token (counted, and surfaced per doc). Per-doc output: pretokens "
    "within the t22 length cap, WordPiece token count, [UNK] count. "
    "Scale: training + encoding run on DISTINCT words (the t15/t22 "
    "vocabulary-bounded discipline); the learned vocab (alphabet + one "
    "product per merge round) rides into the Arrow encode stage as a "
    "closure; the corpus-sized stages are ONE tokenize+groupBy and the "
    "per-doc word join + hash agg. Oracle: the same greedy walk as a "
    "recursive CTE over precomputed longest-match edges — linear, "
    "since each (word, position) has at most one max-length edge; "
    "tests/test_r10_ops.py pins the encode against a pure-python "
    "replay and an [UNK]-forcing crafted vocab.",
)
def t27_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = _wp_vocab(docs)
    perword = wp_encode_words(_wp_words(docs), vocab)
    corpus = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    return (
        corpus.join(perword, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pretokens"),
            F.sum("n_tok").cast("bigint").alias("n_wp_tokens"),
            F.sum("unk").cast("bigint").alias("n_unk_words"),
        )
    )


# ---------------------------------------------------------------------------
# t28: TRAINED quality classifier — the FineWeb-Edu/DCLM-style gate. The
# engine has LM-based quality SIGNALS (t16 unigram rarity, t24 bigram
# surprisal) and a rule gate (t19 Gopher); t28 is the trained-classifier
# form production curation actually runs: distill the rule gate's verdict
# into a hashed-bag-of-words Naive Bayes scorer (train on the weak labels,
# score held-out docs) — t25's hash-split train/eval machinery on a
# hashed feature space with a binary label.
# ---------------------------------------------------------------------------

_T28_BUCKETS = 256  # hashed-BoW feature space (the fastText hashing trick).
# SCALE DIAL: the model is always <= 2 * _T28_BUCKETS rows (broadcast);
# widen for vocabulary-rich corpora — collision rate, not corpus size,
# is the only reason to grow it. SECOND DIAL (the t26/sm9 discipline):
# mu = (cnt * 10^6) div tot keeps cnt*10^6 inside BIGINT up to ~9e12
# bucket occurrences per class; past ~1e13 training tokens drop the
# micro scale a factor of 1000 (mu resolution is ppm of a class — at
# that corpus mass per-bucket probabilities are >= 1e3 micro anyway).


def _t28_gopher_label() -> Column:
    """t19_gopher_flags' conjunctive verdict as a 0/1 label column over
    ``text`` — the weak label t28 distills. Mirrors plans/text.py t19
    expression-for-expression (kept inline there so t19's registered plan
    never drifts under a refactor of this op)."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    sum_wl = F.aggregate(
        F.transform(words, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    alpha_words = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    stop_hits = F.size(F.filter(words, lambda x: F.lower(x).isin(*STOPWORDS)))
    sym_words = F.size(F.filter(words, lambda x: x.rlike("^[^A-Za-z0-9]+$")))
    mean_wl = sum_wl.cast("double") / n_words
    alpha_ppm = F.floor(alpha_words.cast("double") * 1_000_000.0 / n_words)
    return (
        n_words.between(20, 100000)
        & mean_wl.between(3.0, 10.0)
        & (alpha_ppm >= 800000)
        & (stop_hits >= 2)
        & (sym_words * 10 <= n_words)
    ).cast("int")


_SQL_T28_LABEL = f"""SELECT doc_id, CAST(
        (len(w) BETWEEN 20 AND 100000)
        AND (CAST(list_aggregate(list_transform(w, x -> len(x)), 'sum') AS DOUBLE)
                 / len(w) BETWEEN 3.0 AND 10.0)
        AND (FLOOR(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                 * 1000000.0 / len(w)) >= 800000)
        AND (len(list_filter(w, x -> lower(x) IN ({_SQL_STOP_LIST}))) >= 2)
        AND (len(list_filter(w, x -> regexp_matches(x, '^[^A-Za-z0-9]+$'))) * 10 <= len(w))
        AS INT) AS label
      FROM (SELECT doc_id, {_SQL_RAW_TOKENS} AS w FROM documents)"""


@register(
    "t28_quality_classifier",
    f"""WITH lab AS MATERIALIZED ({_SQL_T28_LABEL}),
        tb AS MATERIALIZED (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % {_T28_BUCKETS} AS b
          FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents)),
        trn AS (
          SELECT l.label AS c, tb.b, COUNT(*) AS cnt
          FROM tb JOIN lab l USING (doc_id)
          WHERE doc_id % 10 < 8
          GROUP BY c, tb.b),
        tot AS (SELECT c, SUM(cnt) AS tot FROM trn GROUP BY c),
        model AS (
          SELECT c, b, CAST((cnt * 1000000) // tot AS BIGINT) AS mu
          FROM trn JOIN tot USING (c)),
        ev AS (
          SELECT doc_id, b, COUNT(*) AS occ FROM tb
          WHERE doc_id % 10 >= 8 GROUP BY doc_id, b),
        sc AS (
          SELECT e.doc_id,
                 CAST(SUM(CASE WHEN m.c = 1 THEN e.occ * m.mu ELSE 0 END) AS BIGINT)
                     AS score_pos_micro,
                 CAST(SUM(CASE WHEN m.c = 0 THEN e.occ * m.mu ELSE 0 END) AS BIGINT)
                     AS score_neg_micro
          FROM ev e JOIN model m USING (b)
          GROUP BY e.doc_id)
        SELECT l.doc_id, l.label,
               CAST(CASE WHEN COALESCE(s.score_pos_micro, 0)
                              > COALESCE(s.score_neg_micro, 0)
                         THEN 1 ELSE 0 END AS INT) AS pred,
               CAST(COALESCE(s.score_pos_micro, 0) AS BIGINT) AS score_pos_micro,
               CAST(COALESCE(s.score_neg_micro, 0) AS BIGINT) AS score_neg_micro,
               CAST(l.label = (CASE WHEN COALESCE(s.score_pos_micro, 0)
                                         > COALESCE(s.score_neg_micro, 0)
                                    THEN 1 ELSE 0 END) AS INT) AS correct
        FROM lab l LEFT JOIN sc s USING (doc_id)
        WHERE l.doc_id % 10 >= 8""",
    tags=("text", "quality-filter", "classifier", "train-eval", "headline"),
    doc="TRAINED quality classifier — the FineWeb-Edu/DCLM-style gate "
    "reduced to its deterministic core: distill t19's Gopher rule "
    "verdict (the weak label; expression-for-expression identical) into "
    "a hashed-bag-of-words multinomial Naive Bayes scorer. Docs "
    "hash-split 8:2 (doc_id %% 10 — restartable, no rand()); every "
    f"token occurrence hashes into {_T28_BUCKETS} md5 buckets (the "
    "fastText hashing trick — fixed feature space regardless of "
    "vocabulary); per-class bucket micro-probabilities mu_c = "
    "(cnt*10^6) div tot_c learned from the train split; held-out docs "
    "scored per class as sum(occ*mu_c), pred = positive iff "
    "score_pos > score_neg (ties and model-miss docs fall to 0, the "
    "conservative gate). All-integer scoring (the t25 discipline) — "
    "bit-identical cross-engine. `correct` reports honest held-out "
    "agreement with the rule gate; tests/test_r11_ops.py pins "
    "accuracy=1.0 on a crafted separable corpus and the "
    "criterion-divergence case. Scale: the model is <= 2*buckets rows "
    "(broadcast); corpus work is one token explode + "
    "map-side-combinable hash aggs keyed (doc,bucket)/(class,bucket) "
    "— the t25 shape, no all-pairs stage, label and features both "
    "scan-side. Reference parity: the trained form of "
    "scripts/transform.py's rule-flag family.",
)
def t28_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select("doc_id", _t28_gopher_label().alias("label"))
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("bigint") % _T28_BUCKETS
    )
    tb = docs.select("doc_id", F.explode(tokens("text")).alias("t")).select(
        "doc_id", bucket.alias("b")
    )
    trn = (
        tb.where(F.col("doc_id") % 10 < 8)
        .join(lab.where(F.col("doc_id") % 10 < 8), "doc_id")
        .groupBy(F.col("label").alias("c"), "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = trn.groupBy("c").agg(F.sum("cnt").alias("tot"))
    model = trn.join(tot, "c").select(
        "c", "b", F.expr("(cnt * 1000000) div tot").cast("bigint").alias("mu")
    )
    ev = (
        tb.where(F.col("doc_id") % 10 >= 8)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    sc = (
        ev.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") == 1, F.col("occ") * F.col("mu")).otherwise(0))
            .cast("bigint")
            .alias("score_pos_micro"),
            F.sum(F.when(F.col("c") == 0, F.col("occ") * F.col("mu")).otherwise(0))
            .cast("bigint")
            .alias("score_neg_micro"),
        )
    )
    pred = F.when(
        F.coalesce("score_pos_micro", F.lit(0)) > F.coalesce("score_neg_micro", F.lit(0)),
        1,
    ).otherwise(0)
    return (
        lab.where(F.col("doc_id") % 10 >= 8)
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            pred.cast("int").alias("pred"),
            F.coalesce("score_pos_micro", F.lit(0)).cast("bigint").alias("score_pos_micro"),
            F.coalesce("score_neg_micro", F.lit(0)).cast("bigint").alias("score_neg_micro"),
            (F.col("label") == pred).cast("int").alias("correct"),
        )
    )

# ---------------------------------------------------------------------------
# t29: CCNet perplexity BUCKETS — t24 flags the above-mean tail; CCNet's
# actual mechanism (Wenzek et al. 2020 §4.3) splits each language's
# corpus into head/middle/tail perplexity TERCILES and downstream mixes
# draw from them at different rates. Exact value-domain terciles, no
# global sort.
# ---------------------------------------------------------------------------

# t24's per-doc surprisal pipeline, repeated inline rather than factored
# out of the registered t24 plan: an extraction that changed t24's plan
# hash would force it back into the (full) driver window — the t28/t19
# label-duplication rationale. The expressions mirror t24 line-for-line;
# tests/test_r11_ops.py pins micro-score equality between the two.
_SQL_T29_PERDOC = f"""big AS (
          SELECT doc_id, w1, w2
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> {{'w1': t[i], 'w2': t[i + 1]}}),
                              recursive := true)
                FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents))),
        bc AS (SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS cc FROM bc GROUP BY w1),
        scored AS (
          SELECT b.doc_id,
                 length(bin(c.cc)) - length(bin(k.cnt)) AS bits
          FROM big b
          JOIN bc k ON b.w1 = k.w1 AND b.w2 = k.w2
          JOIN ctx c ON b.w1 = c.w1),
        perdoc AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 CAST(SUM(bits) AS BIGINT) AS surprisal_bits
          FROM scored GROUP BY doc_id),
        pd2 AS MATERIALIZED (
          SELECT doc_id, n_bigrams,
                 (surprisal_bits * 1000000) // n_bigrams AS micro
          FROM perdoc)"""


@register(
    "t29_perplexity_buckets",
    f"""WITH {_SQL_T29_PERDOC},
        hist AS (SELECT micro, COUNT(*) AS c FROM pd2 GROUP BY micro),
        cum AS (SELECT micro, SUM(c) OVER (ORDER BY micro) AS cum FROM hist),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pd2),
        cuts AS (
          SELECT CAST(MIN(CASE WHEN cum * 3 >= n THEN micro END) AS BIGINT)
                     AS c_head,
                 CAST(MIN(CASE WHEN cum * 3 >= 2 * n THEN micro END) AS BIGINT)
                     AS c_tail
          FROM cum, tot)
        SELECT doc_id, n_bigrams,
               CAST(micro AS BIGINT) AS ppl_micro,
               CASE WHEN micro <= c_head THEN 'head'
                    WHEN micro <= c_tail THEN 'middle'
                    ELSE 'tail' END AS bucket,
               c_head, c_tail
        FROM pd2, cuts""",
    tags=("text", "lm", "quality", "surprisal", "buckets", "headline"),
    doc="CCNet perplexity BUCKETING (Wenzek et al. 2020 §4.3) — the "
    "mechanism t24's above-mean flag approximates: every scoreable doc "
    "(>= 1 bigram, t24's domain) lands in the head / middle / tail "
    "TERCILE of the corpus perplexity distribution, and production "
    "mixes sample the terciles at different rates (head-heavy for "
    "quality, tail kept for diversity audits). Per-doc scores are "
    "t24's integer micro bits-per-bigram (bit-length log2 surrogate — "
    "hash-exact cross-engine). Terciles are EXACT but computed over "
    "the VALUE DOMAIN, not by global sort: one hash agg builds the "
    "(micro, count) histogram, one running sum over the domain-sized "
    "histogram (a23's mergeable-bins discipline — the window is "
    "|distinct scores|-sized, never corpus-sized), and the two cutoffs "
    "(smallest micro with 3*cum >= n / >= 2n — integer cross-mult, no "
    "division) broadcast as one row. Ties share a value, so bucket "
    "membership is VALUE-based: every doc with the cutoff score lands "
    "in the lower bucket — deterministic, no rank tie-break needed. "
    "At 100 TB: the corpus passes are t24's (one tokenize+lead, "
    "vocabulary-keyed joins, doc-keyed rollup); bucketing adds only "
    "histogram-sized work plus a 1-row broadcast.",
)
def t29_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    big = token_pairs(docs, ["doc_id"], tokens("text"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = bc.groupBy("w1").agg(F.sum("cnt").alias("cc"))
    bits = F.length(F.bin("cc")) - F.length(F.bin("cnt"))
    scored = (
        big.join(bc, ["w1", "w2"]).join(ctx, "w1").select("doc_id", bits.alias("bits"))
    )
    pd2 = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("(surprisal_bits * 1000000) div n_bigrams").alias("micro"),
        )
        .cache()  # read by THREE branches (histogram, doc count, final
        # projection): uncached, the whole bigram+window pipeline runs
        # three times (the a25 multi-branch lesson — measured 28x at the
        # 100x probe); the cached frame is 3 ints per doc
    )
    hist = pd2.groupBy("micro").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("micro").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("micro", F.sum("c").over(w_cum).alias("cum"))
    tot = pd2.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cuts = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("micro")))
            .cast("bigint")
            .alias("c_head"),
            F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("micro")))
            .cast("bigint")
            .alias("c_tail"),
        )
    )
    bucket = (
        F.when(F.col("micro") <= F.col("c_head"), "head")
        .when(F.col("micro") <= F.col("c_tail"), "middle")
        .otherwise("tail")
    )
    return pd2.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_bigrams",
        F.col("micro").cast("bigint").alias("ppl_micro"),
        bucket.alias("bucket"),
        "c_head",
        "c_tail",
    )


# ---------------------------------------------------------------------------
# t30: BACKOFF-smoothed LM scoring — t24/t29 score with a bigram MLE
# trained on the SAME corpus they score, so "unseen bigram" cannot happen
# and their inner joins are safe. Production (CCNet's KenLM) scores
# held-out text with a model trained elsewhere: unseen bigrams are the
# NORM, and an inner-join MLE replay silently drops them (scoring a doc by
# only the n-grams the model happens to know — the optimistic-perplexity
# bug). t30 is the honest form: a stupid-backoff bigram→unigram LM
# (Brants et al. 2007) with train/eval hash split, every eval bigram
# scored through exactly one of three paths.
# ---------------------------------------------------------------------------

# Stupid backoff with α = 1/2, in floor-log2 bit-length surrogate space
# (the t24 discipline — ln()/log2() can flip last-ulp cross-engine):
#   seen bigram:      bits = bl(cc(w1)) − bl(cnt(w1,w2))      (t24's MLE)
#   backoff (w2 known): bits = 1 + bl(T) − bl(ucnt(w2))       (α=1/2 → +1 bit)
#   OOV (w2 unknown):   bits = 1 + bl(T)                       (p ≈ 1/(2T))
# where bl(x) = length(bin(x)) and T = total train tokens. α = 1/2 keeps
# the discount an exact integer bit; bl(T) ≥ bl(ucnt) makes every path
# non-negative. The per-bigram T-dependence is factored to the PER-DOC
# level (bits_total = bits_seen + (n_backoff + n_oov)·(1 + bl(T)) −
# Σ bl(ucnt)), so the 1-row bl(T) scalar broadcasts onto the doc-sized
# frame, never the bigram-sized one.

_SQL_T30_BIGRAMS = (
    "unnest(list_transform(range(1, len(t)), "
    "i -> {'w1': t[i], 'w2': t[i + 1]}), recursive := true)"
)


@register(
    "t30_backoff_lm",
    f"""WITH toks AS MATERIALIZED (
          SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
        big AS MATERIALIZED (
          SELECT doc_id, w1, w2
          FROM (SELECT doc_id, {_SQL_T30_BIGRAMS} FROM toks)),
        bc AS (SELECT w1, w2, COUNT(*) AS cnt FROM big
               WHERE doc_id % 10 < 8 GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS cc FROM bc GROUP BY w1),
        uni AS (SELECT w2 AS w, COUNT(*) AS ucnt
                FROM (SELECT doc_id, unnest(t) AS w2 FROM toks)
                WHERE doc_id % 10 < 8 GROUP BY w2),
        tt AS (SELECT length(bin(CAST(SUM(ucnt) AS BIGINT))) AS blt FROM uni),
        j AS (
          SELECT e.doc_id, b.cnt, c.cc, u.ucnt
          FROM (SELECT * FROM big WHERE doc_id % 10 >= 8) e
          LEFT JOIN bc b ON e.w1 = b.w1 AND e.w2 = b.w2
          LEFT JOIN ctx c ON e.w1 = c.w1
          LEFT JOIN uni u ON e.w2 = u.w),
        pd AS (
          SELECT doc_id,
                 COUNT(*) AS n_bigrams,
                 COUNT(cnt) AS n_seen,
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
          FROM j GROUP BY doc_id),
        pd2 AS MATERIALIZED (
          SELECT doc_id, n_bigrams, n_seen, n_backoff, n_oov,
                 bits_seen + (n_backoff + n_oov) * (1 + blt) - bl_bo
                     AS bits_total
          FROM pd, tt),
        corpus AS (
          SELECT (CAST(SUM(bits_total) AS BIGINT) * 1000000)
                 // CAST(SUM(n_bigrams) AS BIGINT) AS corpus_micro
          FROM pd2)
        SELECT doc_id,
               CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(n_seen AS BIGINT) AS n_seen,
               CAST(n_backoff AS BIGINT) AS n_backoff,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST(bits_total AS BIGINT) AS bits_total,
               CAST((bits_total * 1000000) // n_bigrams AS BIGINT)
                   AS micro_bits_per_bigram,
               ((bits_total * 1000000) // n_bigrams) > corpus_micro AS flagged
        FROM pd2, corpus""",
    tags=("text", "lm", "quality", "surprisal", "train-eval", "headline"),
    doc="Backoff-smoothed LM perplexity scoring — the held-out form of "
    "t24/t29 (VERDICT r11 item 4): a stupid-backoff bigram→unigram LM "
    "(Brants et al. 2007, α = 1/2 so the discount is exactly +1 bit in "
    "the floor-log2 bit-length surrogate space) trained on the "
    "doc_id %% 10 < 8 hash split and scoring the held-out 20%%. Every "
    "eval bigram takes exactly one path — seen (t24's MLE bits), "
    "backoff to the unigram (1 + bl(T) − bl(ucnt(w2))), or OOV "
    "(1 + bl(T)) — so unseen n-grams RAISE the doc's surprisal instead "
    "of silently vanishing from an inner join (the optimistic-"
    "perplexity bug tests/test_r12_ops.py pins with a crafted "
    "unseen-bigram doc; it also pins seen-path equality against the "
    "inner-join replay). All-integer scoring (counts, bit lengths, "
    "micro division) — bit-identical cross-engine. Output per eval doc "
    "(≥1 bigram): path counts, total bits, micro bits/bigram, and the "
    "above-eval-corpus-mean flag (t24's 1-row broadcast discipline). "
    "Plan: ONE tokenize+lead pass builds all bigrams (train and eval "
    "filter from it), model counts are three stacked map-side-"
    "combinable aggs, the eval⋈model joins are vocabulary-keyed LEFT "
    "joins with no broadcast hint (the t9/t24 discipline), and the two "
    "1-row scalars (bl(T), corpus mean) broadcast onto the DOC-sized "
    "frame only. The per-doc frame is cached: it feeds the corpus-mean "
    "aggregate AND the final projection (the a25/t29 multi-branch "
    "lesson). At 100 TB: corpus passes = 1, everything else vocabulary- "
    "or doc-keyed with map-side combine — t24's cost shape plus two "
    "cheap left joins.",
)
def t30_backoff_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    big = token_pairs(docs, ["doc_id"], tokens("text"))
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
        big.where(~is_train)
        .join(bc, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(uni, ["w2"], "left")
    )
    pd = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count("cnt").alias("n_seen"),
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
    pd2 = (
        pd.crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            "n_bigrams",
            "n_seen",
            "n_backoff",
            "n_oov",
            (
                F.col("bits_seen")
                + (F.col("n_backoff") + F.col("n_oov")) * (1 + F.col("blt"))
                - F.col("bl_bo")
            ).alias("bits_total"),
        )
        .cache()  # read by the corpus-mean aggregate AND the final
        # projection: uncached, the whole bigram+join pipeline runs twice
        # (the a25/t29 multi-branch lesson); the cached frame is 6 ints/doc
    )
    corpus = pd2.agg(
        F.expr(
            "(CAST(SUM(bits_total) AS BIGINT) * 1000000)"
            " div CAST(SUM(n_bigrams) AS BIGINT)"
        ).alias("corpus_micro")
    )
    micro = F.expr("(bits_total * 1000000) div n_bigrams")
    return pd2.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("n_seen").cast("bigint").alias("n_seen"),
        F.col("n_backoff").cast("bigint").alias("n_backoff"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.col("bits_total").cast("bigint").alias("bits_total"),
        micro.cast("bigint").alias("micro_bits_per_bigram"),
        (micro > F.col("corpus_micro")).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# t31: TRIGRAM stupid backoff — t30's ladder grown one level
# (VERDICT r12 item 5)
# ---------------------------------------------------------------------------

# Same surrogate space and split as t30; each eval TRIGRAM takes exactly
# one of four paths, each backoff level paying α = 1/2 → +1 bit:
#   seen trigram:                  bits = bl(cc3(w1,w2)) − bl(cnt3(w1,w2,w3))
#   backoff→bigram ((w2,w3) seen): bits = 1 + bl(cc2(w2)) − bl(cnt2(w2,w3))
#   backoff→unigram (w3 known):    bits = 2 + bl(T) − bl(ucnt(w3))
#   OOV (w3 unknown):              bits = 2 + bl(T)
# cnt2/cc2 are EXACTLY t30's bigram model (bc/ctx), so the →bigram rung
# is "1 + t30's seen-bigram bits" by construction — pinned relationally
# in tests/test_r13_ops.py. Only the 1-row bl(T) scalar is factored to
# the doc level (t30's discipline); the bigram-rung bits are per-row
# computable from the joined counts.

_SQL_T31_TRIGRAMS = (
    "unnest(list_transform(range(1, len(t) - 1), "
    "i -> {'w1': t[i], 'w2': t[i + 1], 'w3': t[i + 2]}), recursive := true)"
)


@register(
    "t31_trigram_backoff_lm",
    f"""WITH toks AS MATERIALIZED (
          SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
        tri AS MATERIALIZED (
          SELECT doc_id, w1, w2, w3
          FROM (SELECT doc_id, {_SQL_T31_TRIGRAMS} FROM toks)),
        tc3 AS (SELECT w1, w2, w3, COUNT(*) AS cnt3 FROM tri
                WHERE doc_id % 10 < 8 GROUP BY w1, w2, w3),
        c3 AS (SELECT w1, w2, CAST(SUM(cnt3) AS BIGINT) AS cc3
               FROM tc3 GROUP BY w1, w2),
        big AS (
          SELECT doc_id, w1, w2
          FROM (SELECT doc_id, {_SQL_T30_BIGRAMS} FROM toks)),
        bc2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM big
                WHERE doc_id % 10 < 8 GROUP BY w1, w2),
        c2 AS (SELECT w1, CAST(SUM(cnt2) AS BIGINT) AS cc2 FROM bc2 GROUP BY w1),
        uni AS (SELECT w2 AS w, COUNT(*) AS ucnt
                FROM (SELECT doc_id, unnest(t) AS w2 FROM toks)
                WHERE doc_id % 10 < 8 GROUP BY w2),
        tt AS (SELECT length(bin(CAST(SUM(ucnt) AS BIGINT))) AS blt FROM uni),
        j AS (
          SELECT e.doc_id, t3.cnt3, x3.cc3, b2.cnt2, x2.cc2, u.ucnt
          FROM (SELECT * FROM tri WHERE doc_id % 10 >= 8) e
          LEFT JOIN tc3 t3 ON e.w1 = t3.w1 AND e.w2 = t3.w2 AND e.w3 = t3.w3
          LEFT JOIN c3 x3 ON e.w1 = x3.w1 AND e.w2 = x3.w2
          LEFT JOIN bc2 b2 ON e.w2 = b2.w1 AND e.w3 = b2.w2
          LEFT JOIN c2 x2 ON e.w2 = x2.w1
          LEFT JOIN uni u ON e.w3 = u.w),
        pd AS (
          SELECT doc_id,
                 COUNT(*) AS n_trigrams,
                 COUNT(cnt3) AS n_seen3,
                 COUNT(CASE WHEN cnt3 IS NULL AND cnt2 IS NOT NULL THEN 1 END)
                     AS n_backoff2,
                 COUNT(CASE WHEN cnt3 IS NULL AND cnt2 IS NULL
                            AND ucnt IS NOT NULL THEN 1 END) AS n_backoff1,
                 COUNT(CASE WHEN cnt3 IS NULL AND cnt2 IS NULL
                            AND ucnt IS NULL THEN 1 END) AS n_oov,
                 CAST(COALESCE(SUM(CASE WHEN cnt3 IS NOT NULL
                          THEN length(bin(cc3)) - length(bin(cnt3)) END), 0)
                      AS BIGINT) AS bits_seen3,
                 CAST(COALESCE(SUM(CASE WHEN cnt3 IS NULL AND cnt2 IS NOT NULL
                          THEN 1 + length(bin(cc2)) - length(bin(cnt2)) END), 0)
                      AS BIGINT) AS bits_b2,
                 CAST(COALESCE(SUM(CASE WHEN cnt3 IS NULL AND cnt2 IS NULL
                          AND ucnt IS NOT NULL
                          THEN length(bin(ucnt)) END), 0)
                      AS BIGINT) AS bl_b1
          FROM j GROUP BY doc_id),
        pd2 AS MATERIALIZED (
          SELECT doc_id, n_trigrams, n_seen3, n_backoff2, n_backoff1, n_oov,
                 bits_seen3 + bits_b2
                 + (n_backoff1 + n_oov) * (2 + blt) - bl_b1 AS bits_total
          FROM pd, tt),
        corpus AS (
          SELECT (CAST(SUM(bits_total) AS BIGINT) * 1000000)
                 // CAST(SUM(n_trigrams) AS BIGINT) AS corpus_micro
          FROM pd2)
        SELECT doc_id,
               CAST(n_trigrams AS BIGINT) AS n_trigrams,
               CAST(n_seen3 AS BIGINT) AS n_seen3,
               CAST(n_backoff2 AS BIGINT) AS n_backoff2,
               CAST(n_backoff1 AS BIGINT) AS n_backoff1,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST(bits_total AS BIGINT) AS bits_total,
               CAST((bits_total * 1000000) // n_trigrams AS BIGINT)
                   AS micro_bits_per_trigram,
               ((bits_total * 1000000) // n_trigrams) > corpus_micro AS flagged
        FROM pd2, corpus""",
    tags=("text", "lm", "quality", "surprisal", "train-eval", "headline"),
    doc="Trigram stupid backoff — t30's ladder grown one level (VERDICT "
    "r12 item 5): a trigram→bigram→unigram LM (Brants et al. 2007, "
    "α = 1/2 per rung → +1 exact bit each) trained on the doc_id %% 10 "
    "< 8 split, scoring every held-out trigram through exactly one of "
    "four paths — seen trigram (MLE bits), backoff to the bigram "
    "(1 + bl(cc2(w2)) − bl(cnt2(w2,w3)) — cnt2/cc2 ARE t30's bigram "
    "model, so this rung is provably 1 + t30's seen-bigram bits, "
    "pinned relationally in tests/test_r13_ops.py), backoff to the "
    "unigram (2 + bl(T) − bl(ucnt)), or OOV (2 + bl(T)). All-integer "
    "surrogate space (t24/t30 discipline) — bit-identical cross-"
    "engine. Output per eval doc (≥1 trigram): the four path counts, "
    "total bits, micro bits/trigram, above-corpus-mean flag. Plan: ONE "
    "tokenize pass feeds trigram (two leads) and bigram (one lead) "
    "frames; model counts are map-side-combinable aggs; the eval side "
    "takes five vocabulary-keyed LEFT joins (no broadcast hint — the "
    "t9/t24 discipline) and the 1-row bl(T)/corpus-mean scalars "
    "broadcast onto the doc-sized frame only; the per-doc frame is "
    "cached (a25/t29 lesson). At 100 TB: the trigram model table is "
    "the new cost center — it grows with distinct trigrams, which is "
    "why production LMs prune counts < k; the plan's count tables "
    "accept a HAVING cut without reshaping anything else.",
)
def t31_trigram_backoff_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tri = token_triples(docs, ["doc_id"], tokens("text"))
    big = token_pairs(docs, ["doc_id"], tokens("text"))
    is_train = F.col("doc_id") % 10 < 8
    tc3 = tri.where(is_train).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("cnt3")
    )
    c3 = tc3.groupBy("w1", "w2").agg(F.sum("cnt3").cast("bigint").alias("cc3"))
    bc2 = big.where(is_train).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    c2 = bc2.groupBy("w1").agg(F.sum("cnt2").cast("bigint").alias("cc2"))
    uni = (
        toks.where(is_train)
        .groupBy(F.col("tok").alias("w3"))
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    tt = uni.agg(F.length(F.bin(F.sum("ucnt").cast("bigint"))).alias("blt"))
    e = tri.where(~is_train)
    j = (
        e.join(tc3, ["w1", "w2", "w3"], "left")
        .join(c3, ["w1", "w2"], "left")
        .join(
            bc2.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), "cnt2"
            ),
            ["w2", "w3"],
            "left",
        )
        .join(c2.select(F.col("w1").alias("w2"), "cc2"), ["w2"], "left")
        .join(uni, ["w3"], "left")
    )
    seen3 = F.col("cnt3").isNotNull()
    b2 = ~seen3 & F.col("cnt2").isNotNull()
    b1 = ~seen3 & F.col("cnt2").isNull() & F.col("ucnt").isNotNull()
    oov = ~seen3 & F.col("cnt2").isNull() & F.col("ucnt").isNull()
    bl = lambda c: F.length(F.bin(c))  # noqa: E731
    pd = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.count("cnt3").alias("n_seen3"),
        F.count(F.when(b2, 1)).alias("n_backoff2"),
        F.count(F.when(b1, 1)).alias("n_backoff1"),
        F.count(F.when(oov, 1)).alias("n_oov"),
        F.coalesce(F.sum(F.when(seen3, bl(F.col("cc3")) - bl(F.col("cnt3")))), F.lit(0))
        .cast("bigint")
        .alias("bits_seen3"),
        F.coalesce(
            F.sum(F.when(b2, 1 + bl(F.col("cc2")) - bl(F.col("cnt2")))), F.lit(0)
        )
        .cast("bigint")
        .alias("bits_b2"),
        F.coalesce(F.sum(F.when(b1, bl(F.col("ucnt")))), F.lit(0))
        .cast("bigint")
        .alias("bl_b1"),
    )
    pd2 = (
        pd.crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            "n_trigrams",
            "n_seen3",
            "n_backoff2",
            "n_backoff1",
            "n_oov",
            (
                F.col("bits_seen3")
                + F.col("bits_b2")
                + (F.col("n_backoff1") + F.col("n_oov")) * (2 + F.col("blt"))
                - F.col("bl_b1")
            ).alias("bits_total"),
        )
        .cache()  # read by the corpus-mean aggregate AND the final
        # projection (t30's cache rationale); 7 ints per eval doc
    )
    corpus = pd2.agg(
        F.expr(
            "(CAST(SUM(bits_total) AS BIGINT) * 1000000)"
            " div CAST(SUM(n_trigrams) AS BIGINT)"
        ).alias("corpus_micro")
    )
    micro = F.expr("(bits_total * 1000000) div n_trigrams")
    return pd2.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        F.col("n_trigrams").cast("bigint").alias("n_trigrams"),
        F.col("n_seen3").cast("bigint").alias("n_seen3"),
        F.col("n_backoff2").cast("bigint").alias("n_backoff2"),
        F.col("n_backoff1").cast("bigint").alias("n_backoff1"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.col("bits_total").cast("bigint").alias("bits_total"),
        micro.cast("bigint").alias("micro_bits_per_trigram"),
        (micro > F.col("corpus_micro")).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# t32: Kneser–Ney smoothed LM — the t30/t31 backoff ladder grown
# CONTINUATION COUNTS (VERDICT r13 item 5)
# ---------------------------------------------------------------------------

# Stupid backoff (t30/t31) backs off to the RAW unigram distribution,
# which over-scores words that are frequent but contextually promiscuous
# ("Francisco" appears often, yet almost only after "San" — it should be
# a TERRIBLE backoff guess). Kneser–Ney (Kneser & Ney 1995; Chen &
# Goodman 1999) fixes both halves of the estimate:
#   * absolute discounting — every seen bigram gives up a fixed D of its
#     count: p_seen(w2|w1) = (c(w1,w2) − D) / c(w1);
#   * the backoff distribution is the CONTINUATION probability
#     P_cont(w2) = N1+(·,w2) / N1+(··) — "in how many distinct contexts
#     does w2 complete a bigram", not "how often does w2 occur" — with
#     backoff weight λ(w1) = D·N1+(w1,·)/c(w1) (the mass the discount
#     freed, spread over w1's distinct continuations).
# This is the BACKOFF (Katz-style) form of KN, with D = 1/2 as a FIXED
# RATIONAL so every intermediate stays an exact integer:
#   c − 1/2 = (2c−1)/2,  so in floor-log2 bit-length surrogate space
#   (bl(x) = length(bin(x)), the t24/t30/t31 discipline — ln()/log2()
#   can flip last-ulp cross-engine):
#   seen bigram:             bits = bl(2·cc(w1)) − bl(2·cnt(w1,w2) − 1)
#   KN backoff (w1 known):   bits = bl(2·cc(w1)·T2) − bl(n1p(w1)·ct(w2))
#                            [p = λ(w1)·P_cont(w2)
#                               = (n1p·ct) / (2·cc·T2) exactly]
#   continuation (w1 unseen): bits = bl(T2) − bl(ct(w2))   [p = P_cont]
#   OOV (w2 completes nothing): bits = 1 + bl(T2)           [p ≈ 1/(2·T2)]
# where n1p(w1) = N1+(w1,·), ct(w2) = N1+(·,w2), T2 = N1+(··) = distinct
# train bigram types. Every path is non-negative by construction
# (2·cnt−1 < 2·cc, n1p ≤ cc ∧ ct ≤ T2 ⇒ n1p·ct < 2·cc·T2, ct ≤ T2).
# Path taxonomy is exhaustive and mutually exclusive: seen ⇒ ct and cc
# both known; OOV is checked on ct alone (a train token seen ONLY
# doc-initially has ucnt > 0 but ct NULL — t30 would back off to it,
# KN correctly treats it as completing nothing, which is why per-doc
# n_oov here can exceed t30's — the relational pin in
# tests/test_r14_ops.py).

@register(
    "t32_kneser_ney_lm",
    f"""WITH toks AS MATERIALIZED (
          SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
        big AS MATERIALIZED (
          SELECT doc_id, w1, w2
          FROM (SELECT doc_id, {_SQL_T30_BIGRAMS} FROM toks)),
        bc AS MATERIALIZED (
          SELECT w1, w2, COUNT(*) AS cnt FROM big
          WHERE doc_id % 10 < 8 GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS cc,
                       CAST(COUNT(*) AS BIGINT) AS n1p
                FROM bc GROUP BY w1),
        cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS ct
                 FROM bc GROUP BY w2),
        t2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS t2 FROM bc),
        j AS (
          SELECT e.doc_id, b.cnt, c.cc, c.n1p, u.ct, t2.t2
          FROM (SELECT * FROM big WHERE doc_id % 10 >= 8) e
          LEFT JOIN bc b ON e.w1 = b.w1 AND e.w2 = b.w2
          LEFT JOIN ctx c ON e.w1 = c.w1
          LEFT JOIN cont u ON e.w2 = u.w2
          CROSS JOIN t2),
        scored AS (
          SELECT doc_id,
                 CASE WHEN cnt IS NOT NULL THEN 'seen'
                      WHEN ct IS NULL THEN 'oov'
                      WHEN cc IS NOT NULL THEN 'kn'
                      ELSE 'cont' END AS path,
                 CASE WHEN cnt IS NOT NULL
                        THEN length(bin(2 * cc)) - length(bin(2 * cnt - 1))
                      WHEN ct IS NULL THEN 1 + length(bin(t2))
                      WHEN cc IS NOT NULL
                        THEN length(bin(2 * cc * t2)) - length(bin(n1p * ct))
                      ELSE length(bin(t2)) - length(bin(ct)) END AS bits
          FROM j),
        pd2 AS MATERIALIZED (
          SELECT doc_id,
                 COUNT(*) AS n_bigrams,
                 COUNT(CASE WHEN path = 'seen' THEN 1 END) AS n_seen,
                 COUNT(CASE WHEN path = 'kn' THEN 1 END) AS n_kn_backoff,
                 COUNT(CASE WHEN path = 'cont' THEN 1 END) AS n_cont,
                 COUNT(CASE WHEN path = 'oov' THEN 1 END) AS n_oov,
                 CAST(SUM(bits) AS BIGINT) AS bits_total
          FROM scored GROUP BY doc_id),
        corpus AS (
          SELECT (CAST(SUM(bits_total) AS BIGINT) * 1000000)
                 // CAST(SUM(n_bigrams) AS BIGINT) AS corpus_micro
          FROM pd2)
        SELECT doc_id,
               CAST(n_bigrams AS BIGINT) AS n_bigrams,
               CAST(n_seen AS BIGINT) AS n_seen,
               CAST(n_kn_backoff AS BIGINT) AS n_kn_backoff,
               CAST(n_cont AS BIGINT) AS n_cont,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST(bits_total AS BIGINT) AS bits_total,
               CAST((bits_total * 1000000) // n_bigrams AS BIGINT)
                   AS micro_bits_per_bigram,
               ((bits_total * 1000000) // n_bigrams) > corpus_micro AS flagged
        FROM pd2, corpus""",
    tags=("text", "lm", "quality", "surprisal", "train-eval", "headline"),
    doc="Kneser–Ney smoothed LM scoring — the standard data-quality "
    "scorer the stupid-backoff family (t30/t31) approximates (VERDICT "
    "r13 item 5): absolute discounting with D = 1/2 kept as a FIXED "
    "RATIONAL ((2c−1)/2 — every intermediate an exact integer) and the "
    "backoff distribution replaced by CONTINUATION probability "
    "N1+(·,w2)/N1+(··) with backoff weight λ(w1) = D·N1+(w1,·)/c(w1), "
    "so frequent-but-context-bound words stop being good backoff "
    "guesses. Trained on the doc_id %% 10 < 8 split (t30's model "
    "surface grown two count tables: per-context and per-word distinct-"
    "continuation counts — both plain aggregates of the SAME bigram "
    "count table); every held-out bigram takes exactly one of four "
    "paths — discounted-seen, λ·P_cont backoff, raw P_cont (unseen "
    "context), or OOV (completes nothing in train). All-integer "
    "floor-log2 surrogate space (t24/t30/t31 discipline) — "
    "bit-identical cross-engine; products stay < 2^63 for train "
    "corpora up to ~10^9 bigram types × 10^9 context counts (beyond "
    "that, production KN prunes counts < k — the count tables accept "
    "a HAVING cut without reshaping the plan). Output per eval doc: "
    "path counts, total bits, micro bits/bigram, above-corpus-mean "
    "flag. Plan: ONE tokenize+lead pass; the model is bc plus two "
    "GROUP BYs OF bc (map-side-combinable, vocabulary-keyed); eval "
    "joins are vocabulary-keyed LEFT joins (no broadcast hint — the "
    "t9/t24 discipline) plus ONE 1-row T2 scalar broadcast (bounded "
    "BNLJ, the t24 adjudication — T2 must sit inside bl(2·cc·T2) "
    "per-row, so unlike t30's bl(T) it cannot factor to the doc "
    "level); per-doc frame cached (a25/t29 multi-branch lesson). At "
    "100 TB: same cost shape as t30 — one corpus pass, then "
    "vocabulary- and doc-keyed aggregates.",
)
def t32_kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    big = token_pairs(docs, ["doc_id"], tokens("text"))
    is_train = F.col("doc_id") % 10 < 8
    bc = big.where(is_train).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = bc.groupBy("w1").agg(
        F.sum("cnt").cast("bigint").alias("cc"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    t2 = bc.agg(F.count(F.lit(1)).cast("bigint").alias("t2"))
    j = (
        big.where(~is_train)
        .join(bc, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .crossJoin(F.broadcast(t2))
    )
    seen = F.col("cnt").isNotNull()
    oov = F.col("ct").isNull()
    kn = ~seen & ~oov & F.col("cc").isNotNull()
    cont_p = ~seen & ~oov & F.col("cc").isNull()
    bl = lambda c: F.length(F.bin(c))  # noqa: E731
    bits = (
        F.when(seen, bl(2 * F.col("cc")) - bl(2 * F.col("cnt") - 1))
        .when(oov, 1 + bl(F.col("t2")))
        .when(kn, bl(2 * F.col("cc") * F.col("t2")) - bl(F.col("n1p") * F.col("ct")))
        .otherwise(bl(F.col("t2")) - bl(F.col("ct")))
    )
    pd2 = (
        j.select("doc_id", seen.alias("s"), kn.alias("k"), cont_p.alias("c"),
                 oov.alias("o"), bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.when(F.col("s"), 1)).alias("n_seen"),
            F.count(F.when(F.col("k"), 1)).alias("n_kn_backoff"),
            F.count(F.when(F.col("c"), 1)).alias("n_cont"),
            F.count(F.when(F.col("o"), 1)).alias("n_oov"),
            F.sum("bits").cast("bigint").alias("bits_total"),
        )
        .cache()  # read by the corpus-mean aggregate AND the final
        # projection (t30's cache rationale); 7 ints per eval doc
    )
    corpus = pd2.agg(
        F.expr(
            "(CAST(SUM(bits_total) AS BIGINT) * 1000000)"
            " div CAST(SUM(n_bigrams) AS BIGINT)"
        ).alias("corpus_micro")
    )
    micro = F.expr("(bits_total * 1000000) div n_bigrams")
    return pd2.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("n_seen").cast("bigint").alias("n_seen"),
        F.col("n_kn_backoff").cast("bigint").alias("n_kn_backoff"),
        F.col("n_cont").cast("bigint").alias("n_cont"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.col("bits_total").cast("bigint").alias("bits_total"),
        micro.cast("bigint").alias("micro_bits_per_bigram"),
        (micro > F.col("corpus_micro")).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# t33: CCNet-style per-language perplexity bucketing (head/middle/tail)
# ---------------------------------------------------------------------------


@register(
    "t33_perplexity_buckets",
    f"""WITH toks AS MATERIALIZED (
          SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents),
        big AS MATERIALIZED (
          SELECT doc_id, lang, w1, w2
          FROM (SELECT doc_id, lang, {_SQL_T30_BIGRAMS} FROM toks)),
        bc AS (SELECT lang, w1, w2, COUNT(*) AS cnt FROM big
               WHERE doc_id % 10 < 8 GROUP BY lang, w1, w2),
        ctx AS (SELECT lang, w1, CAST(SUM(cnt) AS BIGINT) AS cc
                FROM bc GROUP BY lang, w1),
        uni AS (SELECT lang, w2 AS w, COUNT(*) AS ucnt
                FROM (SELECT doc_id, lang, unnest(t) AS w2 FROM toks)
                WHERE doc_id % 10 < 8 GROUP BY lang, w2),
        tt AS (SELECT lang, length(bin(CAST(SUM(ucnt) AS BIGINT))) AS blt
               FROM uni GROUP BY lang),
        j AS (
          SELECT e.doc_id, e.lang, b.cnt, c.cc, u.ucnt
          FROM big e
          LEFT JOIN bc b ON e.lang = b.lang AND e.w1 = b.w1 AND e.w2 = b.w2
          LEFT JOIN ctx c ON e.lang = c.lang AND e.w1 = c.w1
          LEFT JOIN uni u ON e.lang = u.lang AND e.w2 = u.w),
        pd AS (
          SELECT doc_id, lang,
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
          FROM j GROUP BY doc_id, lang),
        pd2 AS MATERIALIZED (
          SELECT pd.doc_id, pd.lang, pd.n_bigrams,
                 bits_seen + (n_backoff + n_oov) * (1 + tt.blt) - bl_bo
                     AS bits_total
          FROM pd JOIN tt ON pd.lang = tt.lang),
        sc AS MATERIALIZED (
          SELECT doc_id, lang,
                 CAST(n_bigrams AS BIGINT) AS n_bigrams,
                 CAST((bits_total * 1000000) // n_bigrams AS BIGINT)
                     AS micro_bits_per_bigram
          FROM pd2),
        hist AS (SELECT lang, micro_bits_per_bigram AS micro, COUNT(*) AS c
                 FROM sc GROUP BY lang, micro_bits_per_bigram),
        cum AS (SELECT lang, micro,
                       SUM(c) OVER (PARTITION BY lang ORDER BY micro) AS cum
                FROM hist),
        tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                FROM sc GROUP BY lang),
        cuts AS (
          SELECT cum.lang,
                 CAST(MIN(CASE WHEN cum * 3 >= n THEN micro END) AS BIGINT)
                     AS c_head,
                 CAST(MIN(CASE WHEN cum * 3 >= 2 * n THEN micro END) AS BIGINT)
                     AS c_tail
          FROM cum JOIN tot ON cum.lang = tot.lang
          GROUP BY cum.lang)
        SELECT doc_id, sc.lang AS lang, n_bigrams, micro_bits_per_bigram,
               CASE WHEN micro_bits_per_bigram <= c_head THEN 'head'
                    WHEN micro_bits_per_bigram <= c_tail THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM sc JOIN cuts ON sc.lang = cuts.lang""",
    tags=("text", "lm", "quality", "curation", "headline"),
    doc="CCNet per-LANGUAGE perplexity bucketing (Wenzek et al. 2020 "
    "§4.3 as actually deployed: one LM per language, one head/middle/"
    "tail split per language) — the per-language form of t29, which "
    "buckets the whole corpus against one global model. Every document "
    "is scored against its OWN language's LM — the t30 stupid-backoff "
    "bigram→unigram ladder, trained per language on the doc_id %% 10 "
    "< 8 hash slice, so unlike t29's all-seen inner-join model there "
    "are REAL backoff and OOV paths — in t30's integer bit-length "
    "surrogate with every model table keyed by (lang, ngram): seen "
    "bl(cc)−bl(cnt), backoff 1+bl(T_lang)−bl(ucnt), OOV 1+bl(T_lang). "
    "Languages never contaminate each other (a byte-identical text "
    "scores fluent in the language whose LM saw it and OOV in one that "
    "didn't — pinned by a crafted test). Terciles reuse t29's exact "
    "VALUE-DOMAIN method, partitioned by language: a (lang, micro) "
    "histogram, a running sum over the histogram-sized frame, and two "
    "integer cross-mult cutoffs per language (3·cum ≥ n / ≥ 2n) that "
    "broadcast — never a corpus-wide sort, never rank tie-breaks "
    "(cutoff-value docs land in the lower bucket, value-determinism). "
    "Plan: one tokenize+lead pass, three map-side-combinable count "
    "aggs, vocabulary-keyed left joins (no broadcast hint — vocab "
    "scales with corpus), per-language scalars (blt, cutoffs — one row "
    "per language) broadcast onto the doc frame. At 100 TB: t30's cost "
    "shape per language plus histogram-sized bucketing work — the "
    "window frame is |distinct scores per language|, not |docs|.",
)
def t33_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    big = token_pairs(docs, ["doc_id", "lang"], tokens("text"))
    is_train = F.col("doc_id") % 10 < 8
    bc = (
        big.where(is_train)
        .groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ctx = bc.groupBy("lang", "w1").agg(F.sum("cnt").cast("bigint").alias("cc"))
    uni = (
        toks.where(is_train)
        .groupBy("lang", F.col("tok").alias("w2"))
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    tt = uni.groupBy("lang").agg(
        F.length(F.bin(F.sum("ucnt").cast("bigint"))).alias("blt")
    )
    seen = F.col("cnt").isNotNull()
    known_w2 = F.col("ucnt").isNotNull()
    j = (
        big.join(bc, ["lang", "w1", "w2"], "left")
        .join(ctx, ["lang", "w1"], "left")
        .join(uni, ["lang", "w2"], "left")
    )
    pd = j.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
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
    # inner join: a language scores only against its own trained LM (one
    # row per language — broadcast); a language with no train slice has
    # no LM and no buckets, the CCNet contract
    sc = (
        pd.join(F.broadcast(tt), "lang")
        .select(
            "doc_id", "lang",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            (
                F.col("bits_seen")
                + (F.col("n_backoff") + F.col("n_oov")) * (1 + F.col("blt"))
                - F.col("bl_bo")
            ).alias("bits_total"),
        )
        .withColumn(
            "micro",
            F.expr("(bits_total * 1000000) div n_bigrams").cast("bigint"),
        )
        .cache()  # feeds the histogram, the per-lang totals AND the
        # final projection: uncached, the bigram+join pipeline runs
        # three times (the a25/t29 multi-branch lesson); cached it is a
        # few ints per doc
    )
    # t29's exact value-domain terciles, partitioned by language: the
    # running sum ranks the (lang, micro) HISTOGRAM, never the doc frame
    hist = sc.groupBy("lang", "micro").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("lang").orderBy("micro"))
    )
    tot = sc.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cuts = (
        cum.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("micro")))
            .cast("bigint")
            .alias("c_head"),
            F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("micro")))
            .cast("bigint")
            .alias("c_tail"),
        )
    )
    return sc.join(F.broadcast(cuts), "lang").select(
        "doc_id", "lang", "n_bigrams",
        F.col("micro").alias("micro_bits_per_bigram"),
        F.when(F.col("micro") <= F.col("c_head"), "head")
        .when(F.col("micro") <= F.col("c_tail"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )

"""Multimodal catalog queries (SURVEY.md §7 training-data extensions).

The stub decoder derives every feature deterministically from the
payload's md5, so the DuckDB oracle recomputes identical values in pure
SQL: md5 of the (ASCII) document text equals md5 of the utf-8 payload
bytes, and the fake dimensions are nibble arithmetic over the hex digest
(``instr`` against '0123456789abcdef' — no hex-parse builtin needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.multimodal import (
    FRAME_BYTES,
    FRAME_SAMPLE_EVERY,
    arrow_stage_repartitioned,
    frame_sample,
    media_features,
    media_from_documents,
)
from ..sources import load_table


def _nib(pos: int) -> str:
    return f"(instr('0123456789abcdef', substr(m, {pos}, 1)) - 1)"


def _hex4(start: int) -> str:
    return f"((({_nib(start)} * 16 + {_nib(start + 1)}) * 16 + {_nib(start + 2)}) * 16 + {_nib(start + 3)})"


_MEDIA_CTE = """media AS (
         SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                             WHEN 1 THEN 'audio'
                                             ELSE 'video' END AS media_type,
                text, md5(text) AS m, octet_length(encode(text)) AS nbytes
         FROM documents)"""


@register(
    "m1_media_features",
    f"""WITH {_MEDIA_CTE}
       SELECT doc_id, media_type, CAST(nbytes AS BIGINT) AS nbytes, m AS content_md5,
              CAST(32 + {_hex4(1)} % 992 AS BIGINT) AS width,
              CAST(32 + {_hex4(5)} % 992 AS BIGINT) AS height,
              CAST(1 + {_nib(9)} % 4 AS BIGINT) AS channels,
              CAST(GREATEST(1, (32 + {_hex4(1)} % 992) // 2) AS BIGINT) AS thumb_width,
              CAST(GREATEST(1, (32 + {_hex4(5)} % 992) // 2) AS BIGINT) AS thumb_height
       FROM media""",
    tags=("multimodal", "mapInPandas"),
    doc="Binary payload → decode(stub) + feature-extract + resize via one "
    "Arrow mapInPandas pass; oracle recomputes the hash-derived fakes in SQL",
)
def m1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_features(media_from_documents(docs))


@register(
    "m2_frame_sample",
    f"""WITH {_MEDIA_CTE}
       SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
              CAST(octet_length(encode(substr(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES}))) AS BIGINT)
                  AS frame_nbytes,
              md5(substr(text, CAST(i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_md5
       FROM media, LATERAL (SELECT unnest(range(0, CAST(CEIL(CAST(nbytes AS DOUBLE) / {FRAME_BYTES}) AS BIGINT))) AS i) t
       WHERE i % {FRAME_SAMPLE_EVERY} = 0""",
    tags=("multimodal", "mapInPandas", "explode"),
    doc="Frame sampler: fixed-stride frames, every 4th kept — row-exploding "
    "mapInPandas; oracle replays the stride with a range cross join",
)
def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(media_from_documents(docs))


@register(
    "m3_media_type_stats",
    f"""WITH {_MEDIA_CTE}
       SELECT media_type, COUNT(*) AS n_docs,
              CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
              ROUND(CAST(SUM(nbytes) AS DOUBLE) / COUNT(*), 6) AS avg_bytes
       FROM media GROUP BY media_type""",
    tags=("multimodal", "agg"),
    doc="Typed-metadata analytics over the media table (integer-exact sums)",
)
def m3_media_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("meta.nbytes").alias("total_bytes"),
        F.round(F.sum("meta.nbytes").cast("double") / F.count(F.lit(1)), 6).alias("avg_bytes"),
    )


from .dedup import _DUP_OFFSET  # noqa: E402  (same dup-injection constant)


@register(
    "m4_media_exact_dedup",
    f"""SELECT content_md5, MIN(doc_id) AS canonical_doc_id,
              COUNT(*) AS copies,
              CAST((COUNT(*) - 1) * MIN(nbytes) AS BIGINT) AS reclaimable_bytes
       FROM (SELECT doc_id, md5(text) AS content_md5,
                    octet_length(encode(text)) AS nbytes
             FROM (SELECT doc_id, text FROM documents
                   UNION ALL
                   SELECT doc_id + {_DUP_OFFSET} AS doc_id, text
                   FROM documents WHERE doc_id % 10 = 0))
       GROUP BY content_md5""",
    tags=("multimodal", "dedup", "headline"),
    doc="Exact dedup over the BINARY media payload — the first pass of any "
    "100 TB multimodal ingest (d1's discipline on bytes, not text): md5 of "
    "the raw payload, hash-groupBy, canonical-min pick, plus the bytes a "
    "dedup pass would reclaim. BYTE-exact on purpose — unlike d1's "
    "normalized-text fingerprint, two payloads differing only in case or "
    "whitespace are DIFFERENT blobs (tests pin the contrast). Scale shape: "
    "the 16-byte digest is projected per-partition BEFORE the exchange, so "
    "only (digest, doc_id, nbytes) rows shuffle — the payloads themselves "
    "never leave their scan partitions, which is what makes this run at "
    "blob scale. Dup injection mirrors plans/dedup.py::corpus_with_dups",
)
def m4_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import corpus_with_dups

    media = corpus_with_dups(spark, sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return (
        media.select(
            "doc_id",
            F.md5("payload").alias("content_md5"),
            F.octet_length("payload").alias("nbytes"),
        )
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("copies"),
            ((F.count(F.lit(1)) - F.lit(1)) * F.min("nbytes"))
            .cast("bigint")
            .alias("reclaimable_bytes"),
        )
    )


_M5_SHARD_BYTES = 4096  # shard byte budget (WebDataset-style tar shards)


@register(
    "m5_shard_manifest",
    f"""WITH m AS (
         SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                             WHEN 1 THEN 'audio'
                                             ELSE 'video' END AS media_type,
                octet_length(encode(text)) AS nbytes,
                md5(CAST(doc_id AS VARCHAR)) AS h
         FROM documents
       ), c AS (
         SELECT *, SUM(nbytes) OVER (PARTITION BY media_type
                                     ORDER BY h, doc_id) AS cum
         FROM m)
       SELECT media_type,
              CAST((cum - nbytes) // {_M5_SHARD_BYTES} AS BIGINT) AS shard_id,
              COUNT(*) AS n_blobs,
              CAST(SUM(nbytes) AS BIGINT) AS shard_bytes,
              MIN(doc_id) AS min_doc,
              MAX(doc_id) AS max_doc
       FROM c GROUP BY 1, 2""",
    tags=("multimodal", "sharding", "manifest", "headline"),
    doc="Blob shard-manifest builder (the WebDataset/tar-shard layout "
    "step of a multimodal ingest): within each media type, blobs line "
    "up in deterministic hash order and a blob joins the shard its "
    "running-byte START falls in (next-fit with whole-blob assignment "
    "— a straddling blob stays in the shard where it starts, so "
    "shards can exceed the budget by at most one blob; the overflow-"
    "tolerant rule every sequential shard writer uses). The manifest "
    "rows (type, shard, blob count, bytes, doc range) are what the "
    "actual tar-writer job consumes. Plan: one narrow per-type "
    "running-sum window + one hash agg; payload bytes never shuffle — "
    "only (doc_id, nbytes, hash) rows move, the m4 discipline. "
    "Hash-ordered layout is restart-stable: re-runs and engine "
    "changes produce byte-identical shard assignments",
)
def m5_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    m = media.select(
        "doc_id",
        "media_type",
        F.col("meta.nbytes").alias("nbytes"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("media_type")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = m.withColumn("cum", F.sum("nbytes").over(w))
    return (
        c.select(
            "media_type",
            "doc_id",
            "nbytes",
            F.floor((F.col("cum") - F.col("nbytes")) / _M5_SHARD_BYTES)
            .cast("bigint")
            .alias("shard_id"),
        )
        .groupBy("media_type", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("nbytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# m6: perceptual media near-dup (dHash + Hamming-banded LSH)
# ---------------------------------------------------------------------------

_M6_W, _M6_H = 17, 8         # dHash grid → 8×16 = 128 difference bits.
# 128 (not the classic 64) because band width is THE corpus-size dial:
# candidates from RANDOM band collisions grow ~N²·bands/2^width (birthday),
# so 16-bit bands that are fine at 10⁴ docs melt at 10⁶ (measured: 11M+
# candidate pairs at the 100× probe). 4 bands × 32 bits keeps the
# pigeonhole recall guarantee (radius < 4 ⇒ ≥1 clean band) while pushing
# random collisions to ~N²·4/2³² ≈ hundreds at a million docs.
_M6_BITS = _M6_H * (_M6_W - 1)
_M6_BAND_W = 32              # 4 bands × 32 bits
_M6_TWEAK_CELLS = (70, 85, 100, 130)  # bit-tweaked copies: cells in grid
# rows 4..7 only, so dHash bits < 64 (bands 0 and 1) are untouched —
# copy/original band collision is GUARANTEED, not probabilistic
_M6_HAMMING_MAX = 10


def _m6_gray(base: int, tweaked: bool) -> list[int]:
    """Deterministic 17×8 gray grid per base doc: md5-expanded bytes, so the
    DuckDB oracle derives the same grid analytically (md5 is common to
    both engines). Tweaked copies XOR a handful of pixels — a stand-in
    for re-encode noise that perturbs intensities without reordering
    most adjacent-pixel comparisons."""
    import hashlib

    raw = b"".join(
        hashlib.md5(f"{base}:{k}".encode()).digest() for k in range(9)
    )[: _M6_W * _M6_H]
    g = list(raw)
    if tweaked:
        for i in _M6_TWEAK_CELLS:
            g[i] ^= 64
    return g


def media_gray_grids(
    spark: SparkSession, sf_dir: str, *, include_copies: bool = True
) -> DataFrame:
    """(doc_id, g: array<int> 136 grays) — synthesize a REAL 24bpp BMP per
    doc (copies at +offset for doc_id % 10 == 0, pixel-tweaked), then
    round-trip it through the library-free pixel DECODER. Any encoder or
    decoder bug (stride padding, bottom-up rows, luma arithmetic) changes
    the grays and turns the oracle red — the container round-trip is
    inside the verified path, not beside it. ``include_copies=False``
    (m9) keeps the decode stage to the base corpus — filters cannot push
    through mapInPandas, so the cut happens before the Arrow stage."""
    import pandas as pd

    from ..functions.multimodal import bmp_from_gray, bmp_gray_grid

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    corpus = ids.select(
        "doc_id", F.col("doc_id").alias("base"), F.lit(False).alias("tweaked")
    )
    if include_copies:
        corpus = corpus.unionByName(
            ids.where(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.col("doc_id").alias("base"),
                F.lit(True).alias("tweaked"),
            )
        )

    def batches(pdfs):
        for pdf in pdfs:
            grays = []
            for base, tweaked in zip(pdf["base"], pdf["tweaked"]):
                payload = bmp_from_gray(_m6_gray(int(base), bool(tweaked)), _M6_W, _M6_H)
                w, h, g = bmp_gray_grid(payload)
                assert (w, h) == (_M6_W, _M6_H)
                grays.append(g)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "g": grays})

    corpus = arrow_stage_repartitioned(corpus, fanout=1)
    return corpus.mapInPandas(batches, schema="doc_id long, g array<int>")


_M6_SQL_GRAY = (
    f"list_transform(range(0, {_M6_W * _M6_H}), i -> "
    f"CASE WHEN tw = 1 AND i IN {_M6_TWEAK_CELLS} "
    "THEN xor(CAST(('0x' || substr(hx, 2*i + 1, 2)) AS INT), 64) "
    "ELSE CAST(('0x' || substr(hx, 2*i + 1, 2)) AS INT) END)"
)
_M6_SQL_BITS = (
    f"list_transform(range(0, {_M6_BITS}), j -> CASE WHEN "
    f"g[(j // {_M6_W - 1}) * {_M6_W} + (j % {_M6_W - 1}) + 2] "
    f"> g[(j // {_M6_W - 1}) * {_M6_W} + (j % {_M6_W - 1}) + 1] "
    "THEN 1 ELSE 0 END)"
)


@register(
    "m6_perceptual_neardup",
    f"""WITH ids AS (
          SELECT doc_id, doc_id AS base, 0 AS tw FROM documents
          UNION ALL
          SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        grid AS MATERIALIZED (
          SELECT doc_id, {_M6_SQL_GRAY} AS g
          FROM (SELECT doc_id, tw,
                       md5(base || ':0') || md5(base || ':1') || md5(base || ':2')
                       || md5(base || ':3') || md5(base || ':4') || md5(base || ':5')
                       || md5(base || ':6') || md5(base || ':7') || md5(base || ':8') AS hx
                FROM ids)),
        perdoc AS MATERIALIZED (
          SELECT doc_id, {_M6_SQL_BITS} AS bits
          FROM grid),
        bands AS MATERIALIZED (
          SELECT doc_id,
                 unnest(list_transform(range(0, 4), b -> {{'band': b,
                   'key': CAST(list_sum(list_transform(range(0, {_M6_BAND_W}),
                          j -> bits[b * {_M6_BAND_W} + j + 1]
                               * (CAST(1 AS BIGINT) << j))) AS BIGINT)}}),
                        recursive := true)
          FROM perdoc),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(list_sum(list_transform(range(0, 128),
                    j -> CASE WHEN x.bits[j + 1] <> y.bits[j + 1]
                         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        FROM cand
        JOIN perdoc x ON x.doc_id = cand.doc_a
        JOIN perdoc y ON y.doc_id = cand.doc_b
        WHERE list_sum(list_transform(range(0, 128),
              j -> CASE WHEN x.bits[j + 1] <> y.bits[j + 1]
                   THEN 1 ELSE 0 END)) <= {_M6_HAMMING_MAX}""",
    tags=("multimodal", "dedup", "perceptual", "headline"),
    doc="Perceptual media near-dup: m4 is byte-exact, but real media dedup "
    "must catch RE-ENCODED copies. Pipeline: real 24bpp BMP pixel decode "
    "(library-free, the encode→decode round-trip runs inside the "
    "operator), 128-bit dHash (adjacent-intensity comparisons — invariant "
    "to small pixel perturbation), Hamming-banded LSH blocking (4 bands "
    "× 32 bits; near-dups within radius r collide in ≥1 band whenever "
    "r < 4 by pigeonhole), exact Hamming verify ≤ 10 on candidates only. "
    "Tweaked copies perturb only grid rows 4-7, so bands 0/1 are "
    "untouched — copy recall is deterministic, while unrelated docs hit "
    "a band with p≈2⁻³² each and are killed by the verify. Plan shape = "
    "d6's SimHash banding: decode is a narrow Arrow stage, ONE shuffle "
    "on the (band, key) bucket, verification joins touch candidates "
    "only — never all pairs. At 100 TB: same shape with a pHash/cv2 "
    "decode plugged into the same seam.",
)
def m6_perceptual_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    grids = media_gray_grids(spark, sf_dir)
    bpr = _M6_W - 1  # difference bits per grid row
    perdoc = grids.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_M6_BITS - 1)),
            lambda j: F.when(
                F.element_at("g", ((j / bpr).cast("int") * _M6_W + j % bpr + 2).cast("int"))
                > F.element_at("g", ((j / bpr).cast("int") * _M6_W + j % bpr + 1).cast("int")),
                1,
            ).otherwise(0),
        ).alias("bits"),
    ).cache()
    bands = perdoc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("band"),
                    # Horner form of sum(bit[j] << j): fold j = W-1 → 0 with
                    # acc*2 + bit (F.shiftleft needs a literal shift width);
                    # bigint accumulator — a 32-bit band key overflows int32
                    F.aggregate(
                        F.sequence(F.lit(_M6_BAND_W - 1), F.lit(0), F.lit(-1)),
                        F.lit(0).cast("bigint"),
                        lambda acc, jj: acc * 2
                        + F.element_at(F.col("bits"), (b * _M6_BAND_W + jj + 1).cast("int")),
                    )
                    .cast("bigint")
                    .alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = perdoc.select(F.col("doc_id").alias("doc_a"), F.col("bits").alias("bits_a"))
    y = perdoc.select(F.col("doc_id").alias("doc_b"), F.col("bits").alias("bits_b"))
    ham = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda p, q: F.when(p != q, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= _M6_HAMMING_MAX)
    )


# ---------------------------------------------------------------------------
# m7: audio feature extraction over a REAL (library-free) WAV codec
# ---------------------------------------------------------------------------

_M7_N = 64       # samples per synthetic clip (8 md5 rounds × 8 int16)
_M7_RATE = 8000  # Hz


def audio_pcm_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s: array<int> of 64 signed int16 samples) — synthesize a
    REAL RIFF/WAVE payload per doc (md5-derived PCM), then round-trip it
    through the library-free WAV decoder inside the operator (the m6
    discipline for audio): a chunk-walk, fmt-validation, or endianness
    bug changes the samples and trips the oracle hash gate."""
    import hashlib

    import pandas as pd

    from ..functions.multimodal import wav_from_pcm, wav_pcm_samples

    ids = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(pdfs):
        for pdf in pdfs:
            out = []
            for doc_id in pdf["doc_id"]:
                raw = b"".join(
                    hashlib.md5(f"{int(doc_id)}:a{k}".encode()).digest()
                    for k in range(8)
                )[: _M7_N * 2]
                samples = [
                    (v - 65536) if (v := raw[2 * i] + 256 * raw[2 * i + 1]) >= 32768 else v
                    for i in range(_M7_N)
                ]
                rate, decoded = wav_pcm_samples(wav_from_pcm(samples, _M7_RATE))
                assert rate == _M7_RATE
                out.append((int(doc_id), decoded))
            yield pd.DataFrame(out, columns=["doc_id", "s"])

    ids = arrow_stage_repartitioned(ids, fanout=1)
    return ids.mapInPandas(batches, schema="doc_id long, s array<int>")


_M7_SQL_SAMPLE = (
    f"list_transform(range(0, {_M7_N}), i -> CASE WHEN "
    "CAST(('0x' || substr(hx, 4*i + 3, 2) || substr(hx, 4*i + 1, 2)) AS INT) >= 32768 "
    "THEN CAST(('0x' || substr(hx, 4*i + 3, 2) || substr(hx, 4*i + 1, 2)) AS INT) - 65536 "
    "ELSE CAST(('0x' || substr(hx, 4*i + 3, 2) || substr(hx, 4*i + 1, 2)) AS INT) END)"
)


@register(
    "m7_audio_features",
    f"""WITH hexes AS (
          SELECT doc_id,
                 md5(doc_id || ':a0') || md5(doc_id || ':a1') || md5(doc_id || ':a2')
                 || md5(doc_id || ':a3') || md5(doc_id || ':a4') || md5(doc_id || ':a5')
                 || md5(doc_id || ':a6') || md5(doc_id || ':a7') AS hx
          FROM documents),
        pcm AS MATERIALIZED (SELECT doc_id, {_M7_SQL_SAMPLE} AS s FROM hexes)
        SELECT doc_id,
               CAST(len(s) AS BIGINT) AS n_samples,
               CAST(len(s) * 1000000 // {_M7_RATE} AS BIGINT) AS duration_us,
               CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
               CAST(len(list_filter(list_transform(range(1, {_M7_N}),
                    i -> s[i] * s[i + 1]), p -> p < 0)) AS BIGINT) AS zero_crossings,
               ROUND(sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS DOUBLE)
                          / len(s)), 6) AS rms
        FROM pcm""",
    tags=("multimodal", "audio", "features"),
    doc="Audio feature extraction over REAL WAV containers — extends the "
    "multimodal family beyond images with the same library-free "
    "discipline as m6's BMP path: each doc synthesizes a RIFF/WAVE "
    "payload (16-bit mono PCM, md5-derived samples) and the operator "
    "DECODES it with the chunk-walking WAV parser (fmt validation, "
    "extra-chunk tolerance, little-endian int16) before any feature is "
    "computed — so the container round-trip sits inside the oracle-"
    "verified path. Features are the standard audio-curation screens, "
    "all integer/IEEE-exact: duration, peak amplitude, zero-crossing "
    "count (the classic voiced/unvoiced + DC-offset screen), and RMS "
    "loudness (exact integer sum-of-squares, one double sqrt on "
    "identical operands in both engines). Plan: one narrow Arrow decode "
    "stage, features as codegen'd array expressions, NO shuffle at all "
    "— at 100 TB this is a pure map over the blob store; cut rows are "
    "whichever clips fail the loudness/crossing screens.",
)
def m7_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    pcm = audio_pcm_samples(spark, sf_dir)
    n = F.size("s")
    sum_sq = F.aggregate(
        F.col("s"), F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint") * x
    )
    crossings = F.expr(
        "size(filter(zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), "
        "(a, b) -> a * b < 0), x -> x))"
    )
    return pcm.select(
        "doc_id",
        n.cast("bigint").alias("n_samples"),
        (n.cast("bigint") * 1_000_000 / _M7_RATE).cast("bigint").alias("duration_us"),
        F.array_max(F.transform(F.col("s"), F.abs)).cast("bigint").alias("peak"),
        crossings.cast("bigint").alias("zero_crossings"),
        F.round(F.sqrt(sum_sq.cast("double") / n), 6).alias("rms"),
    )


# ---------------------------------------------------------------------------
# m8: video shot-boundary detection — the frame-sequence sibling of m6:
# decode every frame (real BMP round-trip), difference CONSECUTIVE frames
# (window lead), cut where the intensity distance jumps
# ---------------------------------------------------------------------------

_M8_SCENE_LEN = 4          # frames per synthetic scene
_M8_PX = _M6_W * _M6_H     # same 17x8 grid as m6
_M8_THRESH = _M8_PX * 8    # sum-abs-diff cut threshold (in-scene diff is
#                            ~1/px from the brightness jitter; cross-scene
#                            grids are independent md5 bytes, ~83/px)


def _m8_gray(doc: int, frame: int) -> list[int]:
    """Frame gray grid: the SCENE owns the md5-derived base image
    (scene = frame // 4); frames inside a scene differ by a small
    constant brightness jitter (frame % 4). Analytic, so the DuckDB
    oracle re-derives every pixel."""
    import hashlib

    scene = frame // _M8_SCENE_LEN
    raw = b"".join(
        hashlib.md5(f"{doc}:{scene}:{k}".encode()).digest() for k in range(9)
    )[:_M8_PX]
    return [b % 250 + frame % _M8_SCENE_LEN for b in raw]


def _m8_n_frames_expr() -> Column:
    return (F.lit(8) + (F.col("doc_id") % 3) * 4).cast("int")


def video_frame_grids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, f, g): every clip frame synthesized as a REAL 24bpp BMP
    and round-tripped through the library-free decoder (m6 discipline —
    a codec bug changes the grays and trips the hash gate). Clips are
    8/12/16 frames (doc_id % 3), scenes of 4."""
    import pandas as pd

    from ..functions.multimodal import bmp_from_gray, bmp_gray_grid

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _m8_n_frames_expr().alias("nf")
    )

    def batches(pdfs):
        import hashlib

        import numpy as np

        for pdf in pdfs:
            out_doc, out_f, out_g = [], [], []
            for doc, nf in zip(pdf["doc_id"], pdf["nf"]):
                doc, nf = int(doc), int(nf)
                for scene in range(nf // _M8_SCENE_LEN):
                    # one md5 grid per SCENE; the 4 frames differ only by
                    # the jitter — numpy adds it (≡ _m8_gray per frame,
                    # property-pinned, 4x less hashing)
                    raw = b"".join(
                        hashlib.md5(f"{doc}:{scene}:{k}".encode()).digest()
                        for k in range(9)
                    )[:_M8_PX]
                    base = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) % 250
                    for j in range(_M8_SCENE_LEN):
                        payload = bmp_from_gray(
                            (base + j).tolist(), _M6_W, _M6_H
                        )
                        w, h, g = bmp_gray_grid(payload)
                        assert (w, h) == (_M6_W, _M6_H)
                        out_doc.append(doc)
                        out_f.append(scene * _M8_SCENE_LEN + j)
                        out_g.append(g)
            yield pd.DataFrame({"doc_id": out_doc, "f": out_f, "g": out_g})

    # full-width Arrow stage: each input doc fans out to 8-16 frame rows
    # of 136-int arrays, so the python stage — not the scan — is the
    # bottleneck; the m6 min(.,8) cap measured 324x at the 100x probe
    # here (6M frames through <=8 workers)
    docs = arrow_stage_repartitioned(docs, fanout=12)
    return docs.mapInPandas(batches, schema="doc_id long, f int, g array<int>")


_M8_SQL_GRAY = (
    f"list_transform(range(0, {_M8_PX}), i -> "
    "CAST(('0x' || substr(hx, 2*i + 1, 2)) AS INT) % 250 "
    f"+ f % {_M8_SCENE_LEN})"
)


@register(
    "m8_shot_boundaries",
    f"""WITH clips AS (
          SELECT doc_id, CAST(8 + (doc_id % 3) * 4 AS INT) AS nf FROM documents),
        frames AS MATERIALIZED (
          SELECT doc_id, f, {_M8_SQL_GRAY} AS g
          FROM (SELECT c.doc_id, CAST(t.f AS INT) AS f,
                       md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':0')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':1')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':2')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':3')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':4')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':5')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':6')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':7')
                       || md5(c.doc_id || ':' || (t.f // {_M8_SCENE_LEN}) || ':8') AS hx
                FROM clips c, UNNEST(range(0, c.nf)) AS t(f))),
        diffs AS (
          SELECT doc_id, f AS after_frame,
                 CAST(list_sum(list_transform(range(0, {_M8_PX}),
                      i -> abs(g[i + 1] - gn[i + 1]))) AS BIGINT) AS sad
          FROM (SELECT doc_id, f, g,
                       LEAD(g) OVER (PARTITION BY doc_id ORDER BY f) AS gn
                FROM frames)
          WHERE gn IS NOT NULL)
        SELECT doc_id, after_frame, sad
        FROM diffs WHERE sad > {_M8_THRESH}""",
    tags=("multimodal", "video", "shot-boundary"),
    doc="Video shot-boundary detection — the frame-SEQUENCE member of the "
    "media family (m2 samples frames; m6 near-dups stills): every frame "
    "of every clip is synthesized as a real 24bpp BMP and round-tripped "
    "through the library-free pixel decoder INSIDE the operator (m6's "
    "verified-path discipline), consecutive frames are differenced with "
    "a window LEAD over (clip, frame), and a cut is declared where the "
    "sum-abs intensity distance jumps past the threshold — the classic "
    "pixel-domain shot detector (pairwise pixel comparison, Zhang et "
    "al. 1993). Clips are 8/12/16 frames in 4-frame scenes; in-scene "
    "frames differ by ~1/pixel of brightness jitter, scene cuts are "
    "independent md5 images (~83/pixel) — a >100x margin the threshold "
    "sits inside, so the boundary SET is stable but every sad value "
    "still hash-pins the whole decode+diff arithmetic. Plan: decode is "
    "one narrow Arrow stage (numpy-vectorized codec), the lead window "
    "shuffles once on doc_id (frames of a clip co-locate), the diff is "
    "a codegen'd zip_with/aggregate — no python in the hot loop. At "
    "100 TB: same shape with a real keyframe decoder in the Arrow "
    "stage; the window state is one frame's grid.",
)
def m8_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = video_frame_grids(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("f")
    diffs = frames.withColumn("gn", F.lead("g").over(w)).where(
        F.col("gn").isNotNull()
    )
    sad = F.aggregate(
        F.zip_with("g", "gn", lambda x, y: F.abs(x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )
    return (
        diffs.select(
            "doc_id", F.col("f").alias("after_frame"), sad.alias("sad")
        )
        .where(F.col("sad") > _M8_THRESH)
    )


# ---------------------------------------------------------------------------
# m9: image-text pair scoring — the LAION-style cross-modal filter. The
# multimodal family has payloads (m1), dedup (m4/m6), and per-modality
# features (m6/m7/m8); m9 is the op that scores an (image, caption) PAIR.
# ---------------------------------------------------------------------------

_M9_DIMS = 8  # shared feature space: 8 grid-row sums vs 8 hashed BoW buckets


@register(
    "m9_image_text_score",
    f"""WITH ids AS (SELECT doc_id, doc_id AS base, 0 AS tw FROM documents),
        grid AS MATERIALIZED (
          SELECT doc_id, {_M6_SQL_GRAY} AS g
          FROM (SELECT doc_id, tw,
                       md5(base || ':0') || md5(base || ':1') || md5(base || ':2')
                       || md5(base || ':3') || md5(base || ':4') || md5(base || ':5')
                       || md5(base || ':6') || md5(base || ':7') || md5(base || ':8') AS hx
                FROM ids)),
        img AS (
          SELECT doc_id,
                 list_transform(range(0, {_M9_DIMS}),
                                r -> list_sum(g[(r * {_M6_W} + 1):(r * {_M6_W} + {_M6_W})]))
                     AS vi,
                 list_sum(g) AS n_img
          FROM grid),
        tb AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(tok), 1, 2)) AS INT) % {_M9_DIMS} AS b,
                 COUNT(*) AS cnt
          FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
                FROM documents)
          GROUP BY doc_id, b),
        sc AS (
          SELECT t.doc_id,
                 CAST(SUM(i.vi[t.b + 1] * t.cnt) AS BIGINT) AS dot,
                 CAST(MAX(i.n_img) AS BIGINT) AS n_img,
                 CAST(SUM(t.cnt) AS BIGINT) AS n_tok
          FROM tb t JOIN img i USING (doc_id)
          GROUP BY t.doc_id),
        m AS (
          SELECT CAST(SUM((dot * 1000000) // (n_img * n_tok)) // COUNT(*) AS BIGINT)
              AS thr
          FROM sc)
        SELECT doc_id, dot, n_tok,
               CAST((dot * 1000000) // (n_img * n_tok) AS BIGINT) AS score_micro,
               ((dot * 1000000) // (n_img * n_tok)) > thr AS matched
        FROM sc, m""",
    tags=("multimodal", "cross-modal", "scoring", "filter", "headline"),
    doc="Image-text pair scoring — the LAION/CLIP-filter shape with the "
    "real Spark plumbing and a deterministic stand-in scorer: the image "
    "side embeds each doc's decoded BMP grid (the m6 codec round-trip, "
    "base corpus only) into 8 integer grid-row sums; the caption side "
    "embeds the token bag into 8 md5-hashed BoW bucket counts (the "
    "hashing-trick projection — portable to any engine); pair score = "
    "the integer cross-moment dot(vi, vtxt), L1-normalized to "
    "micro-scale via (dot*10^6) div (n_img*n_tok) — all BIGINT, "
    "bit-identical cross-engine. The keep threshold is the CORPUS MEAN "
    "score as a 1-row broadcast scalar (the t24 data-derived-threshold "
    "pattern: a fixed cutoff saturates across SFs). A real CLIP scorer "
    "drops into the image-embed seam; everything downstream (pair "
    "join, normalization, threshold broadcast, flag) is the production "
    "plan. Plan: decode is a fanout=1 Arrow stage over the base corpus "
    "only (copies cut BEFORE mapInPandas — filters cannot push through "
    "it); the pair join is doc_id equi-join; scoring is one "
    "map-side-combinable agg; the only crossJoin is the 1-row "
    "threshold. tests/test_r10_ops.py pins matched/mismatched crafted "
    "pairs through the same scorer.",
)
def m9_image_text_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    grids = media_gray_grids(spark, sf_dir, include_copies=False)
    img = grids.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_M9_DIMS - 1)),
            lambda r: F.aggregate(
                F.slice("g", r * _M6_W + 1, _M6_W),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        ).alias("vi"),
        F.aggregate("g", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "n_img"
        ),
    )
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokens

    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("int") % _M9_DIMS
    )
    tb = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .select("doc_id", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sc = (
        tb.join(img, "doc_id")
        .select(
            "doc_id",
            (F.element_at("vi", F.col("b") + 1) * F.col("cnt")).alias("contrib"),
            "n_img",
            "cnt",
        )
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").cast("bigint").alias("dot"),
            F.max("n_img").cast("bigint").alias("n_img"),
            F.sum("cnt").cast("bigint").alias("n_tok"),
        )
    )
    micro = F.expr("(dot * 1000000) div (n_img * n_tok)")
    thr = sc.agg(
        F.expr(
            "CAST(SUM((dot * 1000000) div (n_img * n_tok)) div COUNT(*) AS BIGINT)"
        ).alias("thr")
    )
    return sc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "dot",
        "n_tok",
        micro.cast("bigint").alias("score_micro"),
        (micro > F.col("thr")).alias("matched"),
    )


# ---------------------------------------------------------------------------
# m10: metadata-gate image filter — the LAION-style pre-filter that runs
# BEFORE m9's cross-modal scoring: dims / aspect-ratio / byte-density
# gates over the image HEADER metadata (the width/height/nbytes contract
# m1's stub decode establishes), header-only — no Arrow decode stage.
# ---------------------------------------------------------------------------


@register(
    "m10_image_meta_gate",
    """WITH img AS (
         SELECT doc_id, md5(text) AS m, octet_length(encode(text)) AS nbytes
         FROM documents WHERE doc_id % 3 = 0),
       d AS (
         SELECT doc_id, nbytes,
                32 + CAST(('0x' || substr(m, 1, 4)) AS BIGINT) % 992 AS width,
                32 + CAST(('0x' || substr(m, 5, 4)) AS BIGINT) % 992 AS height
         FROM img),
       e AS (
         SELECT doc_id, width, height, nbytes,
                (nbytes * 1000000) // (width * height) AS density_micro
         FROM d),
       t AS (SELECT CAST(SUM(density_micro) AS BIGINT) AS s,
                    COUNT(*) AS n FROM e)
       SELECT doc_id,
              CAST(width AS BIGINT) AS width,
              CAST(height AS BIGINT) AS height,
              CAST(nbytes AS BIGINT) AS nbytes,
              CAST(density_micro AS BIGINT) AS density_micro,
              (width >= 64 AND height >= 64) AS g_dims,
              (GREATEST(width, height) * 2 <= LEAST(width, height) * 5)
                  AS g_aspect,
              (density_micro * n >= s) AS g_density,
              (width >= 64 AND height >= 64
               AND GREATEST(width, height) * 2 <= LEAST(width, height) * 5
               AND density_micro * n >= s) AS pass_meta
       FROM e, t""",
    tags=("multimodal", "quality-filter", "metadata-only", "headline"),
    doc="Image METADATA gate — the LAION pre-filter that runs before any "
    "decode or pairing (m9): minimum-dimension, aspect-ratio and "
    "byte-density rules over the header fields the m1 stub-decode "
    "contract derives (width = 32 + md5-hex4(1) %% 992, height = hex4(5) "
    "— the exact values m1 emits as the parsed 'header'), surfaced as "
    "per-gate flags plus the conjunctive verdict in t19's Gopher form so "
    "downstream mixes can re-weight rather than hard-drop. Header-only "
    "by design: production runs this on catalog metadata columns before "
    "paying for pixel decode, so the plan is a pure narrow projection — "
    "no Arrow stage, no explode, no shuffle except one 1-row corpus "
    "aggregate. Gates are integer-exact cross-engine: aspect <= 2.5 as "
    "the cross-multiplication max*2 <= min*5 (no division), byte density "
    "as micro-scaled integer division (nbytes*10^6 div w*h), and the "
    "density threshold is the CORPUS MEAN as a 1-row broadcast compared "
    "by cross-multiplication density*n >= sum (the t24/m9 data-derived "
    "threshold pattern — fixed cutoffs saturate across SFs; integer "
    "cross-mult stays inside BIGINT up to ~4e18/2e6 = 2e12 image rows). "
    "Reference parity: extends scripts/transform.py's rule-flag family "
    "(F7/F8 0/1 flags) to the multimodal surface.",
)
def m10_image_meta_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    m = F.md5("text")

    def hex4(pos: int) -> Column:
        return F.conv(F.substring(m, pos, 4), 16, 10).cast("bigint")

    e = docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("nbytes"),
        (F.lit(32) + hex4(1) % 992).alias("width"),
        (F.lit(32) + hex4(5) % 992).alias("height"),
    ).withColumn("density_micro", F.expr("(nbytes * 1000000) div (width * height)"))
    t = e.agg(
        F.sum("density_micro").cast("bigint").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    g_dims = (F.col("width") >= 64) & (F.col("height") >= 64)
    g_aspect = (
        F.greatest("width", "height") * 2 <= F.least("width", "height") * 5
    )
    g_density = F.col("density_micro") * F.col("n") >= F.col("s")
    return e.crossJoin(F.broadcast(t)).select(
        "doc_id",
        "width",
        "height",
        "nbytes",
        "density_micro",
        g_dims.alias("g_dims"),
        g_aspect.alias("g_aspect"),
        g_density.alias("g_density"),
        (g_dims & g_aspect & g_density).alias("pass_meta"),
    )

# ---------------------------------------------------------------------------
# m11: audio quality gate — the gate that CONSUMES m7's feature table
# (clipping / activity / energy screens), the audio counterpart of m10's
# image metadata gate: per-gate flags + conjunctive verdict, with the
# loudness threshold corpus-derived.
# ---------------------------------------------------------------------------

_M11_PEAK_CEIL = 30000  # int16 clipping screen: peak at/above this ≈ clipped
_M11_MIN_CROSSINGS = 8  # activity screen: DC offset / silence / pure rumble


@register(
    "m11_audio_quality_gate",
    f"""WITH hexes AS (
          SELECT doc_id,
                 md5(doc_id || ':a0') || md5(doc_id || ':a1') || md5(doc_id || ':a2')
                 || md5(doc_id || ':a3') || md5(doc_id || ':a4') || md5(doc_id || ':a5')
                 || md5(doc_id || ':a6') || md5(doc_id || ':a7') AS hx
          FROM documents),
        pcm AS MATERIALIZED (SELECT doc_id, {_M7_SQL_SAMPLE} AS s FROM hexes),
        f AS (
          SELECT doc_id,
                 CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
                 CAST(len(list_filter(list_transform(range(1, {_M7_N}),
                      i -> s[i] * s[i + 1]), p -> p < 0)) AS BIGINT)
                     AS zero_crossings,
                 CAST(list_sum(list_transform(s, x -> CAST(x AS BIGINT) * x))
                      AS BIGINT) AS energy
          FROM pcm),
        t AS (SELECT CAST(SUM(energy) AS BIGINT) AS se, COUNT(*) AS n FROM f)
        SELECT doc_id, peak, zero_crossings, energy,
               (peak < {_M11_PEAK_CEIL}) AS g_peak,
               (zero_crossings >= {_M11_MIN_CROSSINGS}) AS g_active,
               (energy * n >= se) AS g_energy,
               (peak < {_M11_PEAK_CEIL}
                AND zero_crossings >= {_M11_MIN_CROSSINGS}
                AND energy * n >= se) AS pass_audio
        FROM f, t""",
    tags=("multimodal", "audio", "quality-filter", "headline"),
    doc="Audio quality gate — the screen that consumes m7's feature "
    "contract, in t19/m10's per-gate-flags + conjunctive-verdict form: "
    "clipping (peak below the int16 ceiling), activity (zero-crossing "
    "minimum — the DC-offset/silence screen), and loudness (integer "
    "sample energy at or above the CORPUS MEAN — the t24/m9/m10 "
    "data-derived-threshold pattern, compared by cross-multiplication "
    "energy*n >= sum so no division ever happens; 64-sample int16 "
    "energy tops out at ~6.9e10, leaving BIGINT headroom past 1e8 "
    "clips). The Spark side decodes the REAL RIFF/WAVE payloads "
    "through m7's chunk-walking parser (audio_pcm_samples — the codec "
    "round-trip stays inside the verified path) and computes the gates "
    "as codegen'd array expressions; the oracle recomputes the PCM "
    "from the md5 contract in pure SQL. Plan: one fanout=1 Arrow "
    "decode stage, one 1-row corpus aggregate broadcast, no other "
    "shuffle — scan-bound at 100 TB like every pre-decode gate should "
    "be.",
)
def m11_audio_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pcm = audio_pcm_samples(spark, sf_dir)
    energy = F.aggregate(
        F.col("s"), F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint") * x
    )
    crossings = F.expr(
        "size(filter(zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), "
        "(a, b) -> a * b < 0), x -> x))"
    )
    f = pcm.select(
        "doc_id",
        F.array_max(F.transform("s", lambda x: F.abs(x))).cast("bigint").alias("peak"),
        crossings.cast("bigint").alias("zero_crossings"),
        energy.cast("bigint").alias("energy"),
    ).cache()  # read by BOTH the threshold aggregate and the final
    # projection: uncached, the Arrow WAV-decode stage runs twice (the
    # a25 multi-branch lesson — measured 55x -> ~28x at the 100x probe);
    # the cached frame is 4 ints per doc
    t = f.agg(
        F.sum("energy").cast("bigint").alias("se"), F.count(F.lit(1)).alias("n")
    )
    g_peak = F.col("peak") < _M11_PEAK_CEIL
    g_active = F.col("zero_crossings") >= _M11_MIN_CROSSINGS
    g_energy = F.col("energy") * F.col("n") >= F.col("se")
    return f.crossJoin(F.broadcast(t)).select(
        "doc_id",
        "peak",
        "zero_crossings",
        "energy",
        g_peak.alias("g_peak"),
        g_active.alias("g_active"),
        g_energy.alias("g_energy"),
        (g_peak & g_active & g_energy).alias("pass_audio"),
    )


# ---------------------------------------------------------------------------
# m12: video SCENE-level near-dup detection — m8 finds shot boundaries
# WITHIN a clip; m12 finds clips that SHARE scenes (re-uploads, compilation
# edits, stock-footage reuse — the video-dedup pass a multimodal curation
# run needs before training). Composes m8's per-scene synthesis/decode
# discipline with d4's bucket-join candidate shape: one signature per
# SCENE (the coarsest shared md5 grid granularity — never per frame), an
# equi-self-join on the signature, and a scene-set Jaccard verdict.
# ---------------------------------------------------------------------------

_M12_SCENES = "CAST(2 + doc_id % 3 AS INT)"  # = m8's (8 + doc_id%3*4) / 4
# scene-content key: docs 4k and 4k+1 share scenes 0-1 (doc 4k+1 "borrows"
# its opening from doc 4k — the compilation-edit case); every other scene
# is unique to its doc. Keyed ':s' so m12's synthetic scene space can
# never collide with m8's frame space.
_M12_SQL_HX = " || ".join(
    f"md5(ck || ':s' || s || ':{k}')" for k in range(9)
)
_M12_SQL_GRID = (
    f"list_transform(range(0, {_M8_PX}), i -> "
    "CAST(('0x' || substr(hx, 2*i + 1, 2)) AS INT) % 250)"
)


def video_scene_grids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s, g): each clip's scene-LEADING frames, synthesized as
    real 24bpp BMPs and round-tripped through the library-free decoder
    (the m6/m8 verified-path discipline). One row per scene, not per
    frame — the coarsest granularity that identifies scene content (the
    m8 fan-out lesson: derive shared md5 grids per scene)."""
    import pandas as pd

    from ..functions.multimodal import bmp_from_gray, bmp_gray_grid

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_M12_SCENES).alias("ns")
    )

    def batches(pdfs):
        import hashlib

        for pdf in pdfs:
            out_doc, out_s, out_g = [], [], []
            for doc, ns in zip(pdf["doc_id"], pdf["ns"]):
                doc, ns = int(doc), int(ns)
                for s in range(ns):
                    ck = doc - 1 if (doc % 4 == 1 and s < 2) else doc
                    raw = b"".join(
                        hashlib.md5(f"{ck}:s{s}:{k}".encode()).digest()
                        for k in range(9)
                    )[:_M8_PX]
                    payload = bmp_from_gray([b % 250 for b in raw], _M6_W, _M6_H)
                    w, h, g = bmp_gray_grid(payload)
                    assert (w, h) == (_M6_W, _M6_H)
                    out_doc.append(doc)
                    out_s.append(s)
                    out_g.append(g)
            yield pd.DataFrame({"doc_id": out_doc, "s": out_s, "g": out_g})

    # fan-out stage (2-4 scene rows per doc): the m8 parallelism rule —
    # never the m6 min(par, 8) cap
    docs = arrow_stage_repartitioned(docs, fanout=3)
    return docs.mapInPandas(batches, schema="doc_id long, s int, g array<int>")


@register(
    "m12_video_scene_dedup",
    f"""WITH clips AS (SELECT doc_id, {_M12_SCENES} AS ns FROM documents),
        sc AS (
          SELECT doc_id, CAST(t.s AS INT) AS s,
                 CASE WHEN doc_id % 4 = 1 AND t.s < 2
                      THEN doc_id - 1 ELSE doc_id END AS ck
          FROM clips c, UNNEST(range(0, c.ns)) AS t(s)),
        hx AS (SELECT doc_id, s, {_M12_SQL_HX} AS hx FROM sc),
        sig AS MATERIALIZED (
          SELECT doc_id, s,
                 md5(array_to_string({_M12_SQL_GRID}, ',')) AS sig
          FROM hx),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
          FROM sig a JOIN sig b ON a.sig = b.sig AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT p.doc_a, p.doc_b,
               CAST(p.shared AS BIGINT) AS shared_scenes,
               CAST(ca.ns AS BIGINT) AS n_scenes_a,
               CAST(cb.ns AS BIGINT) AS n_scenes_b,
               (p.shared * 2 >= ca.ns + cb.ns - p.shared) AS is_neardup
        FROM p
        JOIN clips ca ON ca.doc_id = p.doc_a
        JOIN clips cb ON cb.doc_id = p.doc_b""",
    tags=("multimodal", "video", "dedup", "headline"),
    doc="Video scene-level near-dup detection (VERDICT r11 item 7) — the "
    "clip-vs-clip member of the media-dedup family (m4 hashes whole "
    "payloads, m6 near-dups stills, m8 cuts clips into scenes): every "
    "scene-LEADING frame is synthesized as a real 24bpp BMP and decoded "
    "through the library-free pixel parser (the m6/m8 verified-path "
    "discipline — a codec bug changes the grays, the signature, and the "
    "pair set), each scene gets ONE content signature (md5 over the "
    "comma-joined decoded grid — computed by the engine's native md5, "
    "the d4 bucket-key shape), clips sharing a signature become "
    "candidate pairs via an equi-self-join, and the verdict is scene-"
    "set Jaccard >= 1/2 by integer cross-multiplication (shared*2 >= "
    "union). The synthetic corpus plants compilation edits — doc 4k+1 "
    "opens with doc 4k's first two scenes — so both verdicts occur "
    "(pinned in tests/test_r12_ops.py, including the scenes-shared-but-"
    "distinct-elsewhere case). Plan: one Arrow fan-out decode stage "
    "(2-4 scene rows per doc, the m8 defaultParallelism*2 rule — never "
    "the m6 cap), the signature in codegen, ONE equi-join on the "
    "signature (bucket-sized collision groups, d4's scaling argument: "
    "pairs track true scene reuse, never all-pairs), and bounded "
    "metadata joins for the scene counts. The signature frame is "
    "cached — BOTH sides of the self-join read it (the a25 lesson). At "
    "100 TB: scene count ~ corpus minutes / scene length; the join key "
    "space is content-sized, so skewed reuse (a viral intro scene) is "
    "the d4 hot-bucket case — salt or cap collision groups there.",
)
def m12_video_scene_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    grids = video_scene_grids(spark, sf_dir)
    sig = F.md5(F.concat_ws(",", F.transform("g", lambda x: x.cast("string"))))
    sigs = grids.select("doc_id", "s", sig.alias("sig")).cache()
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig"))
    p = (
        a.join(b, "sig")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    clips = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_M12_SCENES).alias("ns")
    )
    ca = clips.select(F.col("doc_id").alias("doc_a"), F.col("ns").alias("ns_a"))
    cb = clips.select(F.col("doc_id").alias("doc_b"), F.col("ns").alias("ns_b"))
    return (
        p.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("bigint").alias("shared_scenes"),
            F.col("ns_a").cast("bigint").alias("n_scenes_a"),
            F.col("ns_b").cast("bigint").alias("n_scenes_b"),
            (
                F.col("shared") * 2 >= F.col("ns_a") + F.col("ns_b") - F.col("shared")
            ).alias("is_neardup"),
        )
    )


# ---------------------------------------------------------------------------
# m13: pHash (DCT) perceptual image near-dup — m6's frequency-domain
# cross-check (VERDICT r12 item 4)
# ---------------------------------------------------------------------------

# m6's dHash compares ADJACENT intensities, so high-frequency noise (the
# dominant re-encode artifact) flips one difference bit per perturbed
# pixel pair and a noisy copy drifts past the Hamming gate. pHash hashes
# the LOW-FREQUENCY DCT block instead: pixel-local noise lands in the
# high-frequency coefficients the hash never looks at. The m13 fixture
# makes that contrast exact: tweaked copies add a full-grid ±24
# checkerboard — spectrally the highest (u, v) frequency — so dHash
# flips ~30% of its 128 adjacent comparisons (Hamming ≥ 23 measured
# over every fixture pair, far past its gate) while the kept DCT
# coefficients barely move. tests/test_r13_ops.py pins the
# disagreement with python references for both hashes on the same grids.
#
# All arithmetic is INTEGER: the cosine basis is a fixed-point table
# (round(cos·2^13)) generated once here and embedded as literals in BOTH
# the Spark kernel and the DuckDB oracle, and each bit is the SIGN of a
# coefficient — no cross-engine float anywhere (the t24/t30 surrogate-
# space discipline applied to a transform).
#
# Deterministic copy recall, m6's guarantee rebuilt in frequency space:
# the rounded tables keep the exact cosine symmetries, so the
# checkerboard's leakage into the kept block — shift[u,v] = d·AX[u]·AY[v]
# with AX[u] = Σ_x (−1)^x CX[u,x], AY[v] = Σ_y (−1)^y CY[v,y] — vanishes
# EXACTLY wherever u is odd (AX = 0) or v is even (AY = 0). Bands
# therefore group coefficients by v-parity: bands 0/1 hold the 32
# even-v bits, which are bit-identical between a copy and its original
# by integer algebra — copy/original band collision is GUARANTEED, not
# probabilistic — while generic near-dups keep the standard pigeonhole
# (radius < 4 ⇒ ≥1 clean band of 4).

_M13_SCALE = 1 << 13
_M13_U, _M13_V = 8, 8            # kept low-frequency block → 64 bits
_M13_BITS = _M13_U * _M13_V
_M13_BAND_W = 16                 # 4 bands × 16 bits (see m6's band-width note:
# at 10⁶+ docs widen the grid and bands together — the dial is identical)
_M13_HAMMING_MAX = 10
_M13_TWEAK = 24

# bit order: even-v coefficients first (bands 0/1 — exactly invariant
# under the fixture tweak), then odd-v (bands 2/3); u-major within each
_M13_PERM = tuple(
    u * _M13_V + v
    for vs in ((0, 2, 4, 6), (1, 3, 5, 7))
    for v in vs
    for u in range(_M13_U)
)


def _m13_cos_table(n_freq: int, n: int) -> tuple[tuple[int, ...], ...]:
    import math

    return tuple(
        tuple(
            int(round(math.cos(math.pi * (2 * x + 1) * u / (2 * n)) * _M13_SCALE))
            for x in range(n)
        )
        for u in range(n_freq)
    )


_M13_CX = _m13_cos_table(_M13_U, _M6_W)   # 8 × 17
_M13_CY = _m13_cos_table(_M13_V, _M6_H)   # 8 × 8


def _m13_gray(base: int, tweaked: bool) -> list[int]:
    """Deterministic 17×8 grid per base doc: md5-expanded bytes folded to
    64..191 so the ±24 checkerboard never clamps (clamping would smear
    the perturbation into low frequencies and break the exact-leakage
    algebra above). Same md5 chain as m6's grids."""
    import hashlib

    raw = b"".join(
        hashlib.md5(f"{base}:{k}".encode()).digest() for k in range(9)
    )[: _M6_W * _M6_H]
    g = [64 + (b % 128) for b in raw]
    if tweaked:
        for i in range(len(g)):
            g[i] += _M13_TWEAK if (i % _M6_W + i // _M6_W) % 2 == 0 else -_M13_TWEAK
    return g


def _m13_phash_bits(g: list[int]) -> list[int]:
    """64 pHash bits in _M13_PERM order: separable integer DCT (rows then
    columns, fixed-point tables), keep the 8×8 low-frequency block, each
    bit = sign of its coefficient."""
    import numpy as np

    grid = np.asarray(g, dtype=np.int64).reshape(_M6_H, _M6_W)
    cx = np.asarray(_M13_CX, dtype=np.int64)
    cy = np.asarray(_M13_CY, dtype=np.int64)
    ru = grid @ cx.T                 # (y, u)
    co = (cy @ ru).T.reshape(-1)     # u-major: co[u*8 + v]
    return [int(co[c] > 0) for c in _M13_PERM]


def m13_phash_grids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bits: array<int> 64) — BMP encode→decode round-trip (the
    m6 seam: container bugs turn the oracle red) then the integer-DCT
    pHash kernel, all inside one Arrow stage (the DCT is a vectorized
    int64 matmul — exactly the numeric kernel an Arrow batch is for)."""
    import pandas as pd

    from ..functions.multimodal import bmp_from_gray, bmp_gray_grid

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    corpus = ids.select(
        "doc_id", F.col("doc_id").alias("base"), F.lit(False).alias("tweaked")
    ).unionByName(
        ids.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"),
            F.col("doc_id").alias("base"),
            F.lit(True).alias("tweaked"),
        )
    )

    def batches(pdfs):
        for pdf in pdfs:
            bits = []
            for base, tweaked in zip(pdf["base"], pdf["tweaked"]):
                payload = bmp_from_gray(_m13_gray(int(base), bool(tweaked)), _M6_W, _M6_H)
                w, h, g = bmp_gray_grid(payload)
                assert (w, h) == (_M6_W, _M6_H)
                bits.append(_m13_phash_bits(g))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "bits": bits})

    corpus = arrow_stage_repartitioned(corpus, fanout=1)
    return corpus.mapInPandas(batches, schema="doc_id long, bits array<int>")


def _m13_sql() -> str:
    cxl = "[" + ", ".join(str(v) for row in _M13_CX for v in row) + "]"
    cyl = "[" + ", ".join(str(v) for row in _M13_CY for v in row) + "]"
    perm = "[" + ", ".join(str(c) for c in _M13_PERM) + "]"
    gray = (
        f"list_transform(range(0, {_M6_W * _M6_H}), i -> "
        "64 + CAST(('0x' || substr(hx, 2*i + 1, 2)) AS INT) % 128 "
        f"+ CASE WHEN tw = 1 THEN CASE WHEN (i % {_M6_W} + i // {_M6_W}) % 2 = 0 "
        f"THEN {_M13_TWEAK} ELSE -{_M13_TWEAK} END ELSE 0 END)"
    )
    ru = (
        f"list_transform(range(0, {_M13_U * _M6_H}), k -> "
        f"list_sum(list_transform(range(0, {_M6_W}), x -> "
        f"g[(k % {_M6_H}) * {_M6_W} + x + 1] * cxl[(k // {_M6_H}) * {_M6_W} + x + 1])))"
    )
    co = (
        f"list_transform(range(0, {_M13_BITS}), c -> "
        f"list_sum(list_transform(range(0, {_M6_H}), y -> "
        f"ru[(c // {_M13_V}) * {_M6_H} + y + 1] * cyl[(c % {_M13_V}) * {_M6_H} + y + 1])))"
    )
    return f"""WITH ids AS (
          SELECT doc_id, doc_id AS base, 0 AS tw FROM documents
          UNION ALL
          SELECT doc_id + {_DUP_OFFSET}, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        grid AS MATERIALIZED (
          SELECT doc_id, {gray} AS g
          FROM (SELECT doc_id, tw,
                       md5(base || ':0') || md5(base || ':1') || md5(base || ':2')
                       || md5(base || ':3') || md5(base || ':4') || md5(base || ':5')
                       || md5(base || ':6') || md5(base || ':7') || md5(base || ':8') AS hx
                FROM ids)),
        dct AS (
          SELECT doc_id, {co} AS co
          FROM (SELECT doc_id, {ru} AS ru, CAST({cyl} AS BIGINT[]) AS cyl
                FROM (SELECT doc_id, g, CAST({cxl} AS BIGINT[]) AS cxl FROM grid))),
        perdoc AS MATERIALIZED (
          SELECT doc_id,
                 list_transform(CAST({perm} AS INT[]), c ->
                     CASE WHEN co[c + 1] > 0 THEN 1 ELSE 0 END) AS bits
          FROM dct),
        bands AS MATERIALIZED (
          SELECT doc_id,
                 unnest(list_transform(range(0, 4), b -> {{'band': b,
                   'key': CAST(list_sum(list_transform(range(0, {_M13_BAND_W}),
                          j -> bits[b * {_M13_BAND_W} + j + 1]
                               * (CAST(1 AS BIGINT) << j))) AS BIGINT)}}),
                        recursive := true)
          FROM perdoc),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(list_sum(list_transform(range(0, {_M13_BITS}),
                    j -> CASE WHEN x.bits[j + 1] <> y.bits[j + 1]
                         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        FROM cand
        JOIN perdoc x ON x.doc_id = cand.doc_a
        JOIN perdoc y ON y.doc_id = cand.doc_b
        WHERE list_sum(list_transform(range(0, {_M13_BITS}),
              j -> CASE WHEN x.bits[j + 1] <> y.bits[j + 1]
                   THEN 1 ELSE 0 END)) <= {_M13_HAMMING_MAX}"""


@register(
    "m13_phash_neardup",
    _m13_sql(),
    tags=("multimodal", "dedup", "perceptual", "dct", "headline"),
    doc="pHash perceptual image near-dup — the frequency-domain cross-"
    "check to m6's dHash (VERDICT r12 item 4), sharing its banded-LSH "
    "surface: BMP encode→decode round-trip, separable integer DCT "
    "(fixed-point cosine tables round(cos·2^13), embedded as literals "
    "in both engines — every coefficient is exact int64 arithmetic), "
    "keep the 8×8 low-frequency block, each bit = the coefficient's "
    "SIGN → 64 bits → 4 bands × 16 bits → exact Hamming ≤ 10 verify on "
    "band collisions only. The fixture's copies add a full-grid ±24 "
    "checkerboard: spectrally the highest frequency, so dHash flips "
    "~30%% of its adjacent comparisons (≥ 23 on every fixture pair — "
    "the noisy-copy case m6 provably misses, pinned with both python "
    "references in tests/test_r13_ops.py) while pHash's kept "
    "coefficients barely move. Copy recall is DETERMINISTIC, m6's "
    "guarantee rebuilt in frequency space: the rounded tables keep the "
    "exact cosine symmetries, so the checkerboard's leakage vanishes "
    "identically at odd u or even v; bands group bits by v-parity and "
    "bands 0/1 (even v) are bit-identical between copy and original by "
    "integer algebra. Plan shape is m6's: one Arrow decode+DCT stage "
    "(vectorized int64 matmul), ONE shuffle on the (band, key) bucket, "
    "verification joins touch candidates only. At 100 TB the grid "
    "widens (32×32 → the classic 8×8 block) and bands widen with it — "
    "m6's band-width dial, unchanged.",
)
def m13_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    perdoc = m13_phash_grids(spark, sf_dir).cache()
    bands = perdoc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("band"),
                    # Horner fold, bigint accumulator (m6's band-key shape)
                    F.aggregate(
                        F.sequence(F.lit(_M13_BAND_W - 1), F.lit(0), F.lit(-1)),
                        F.lit(0).cast("bigint"),
                        lambda acc, jj: acc * 2
                        + F.element_at(
                            F.col("bits"), (b * _M13_BAND_W + jj + 1).cast("int")
                        ),
                    )
                    .cast("bigint")
                    .alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    x = perdoc.select(F.col("doc_id").alias("doc_a"), F.col("bits").alias("bits_a"))
    y = perdoc.select(F.col("doc_id").alias("doc_b"), F.col("bits").alias("bits_b"))
    ham = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda p, q: F.when(p != q, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= _M13_HAMMING_MAX)
    )

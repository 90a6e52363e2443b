"""Multimodal catalog queries (SURVEY.md §7 training-data extensions).

The stub decoder derives every feature deterministically from the
payload's md5, so the DuckDB oracle recomputes identical values in pure
SQL: md5 of the (ASCII) document text equals md5 of the utf-8 payload
bytes, and the fake dimensions are nibble arithmetic over the hex digest
(``instr`` against '0123456789abcdef' — no hex-parse builtin needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.multimodal import (
    FRAME_BYTES,
    FRAME_SAMPLE_EVERY,
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

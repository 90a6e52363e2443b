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

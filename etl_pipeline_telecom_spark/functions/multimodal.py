"""Multimodal (binary) column plumbing: opaque payloads + typed metadata,
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

The container ships no image/audio codecs (no PIL/cv2/ffmpeg), so the
DECODE step is stubbed: :func:`decode_media` derives deterministic fake
dimensions from the payload's md5 (so every downstream feature is
reproducible and oracle-checkable), and :func:`decode_media_real` is the
clearly-marked seam where a real codec plugs in. Everything Spark-side —
binary schema, Arrow batch shape, multi-row frame explosion, partition
behavior — is real and tested.

Scale notes (100 TB of media):
- payloads stay in executor-side Arrow batches; nothing is collected.
- ``mapInPandas`` streams batches, so peak memory is one Arrow batch of
  payloads per task — size ``spark.sql.execution.arrow.maxRecordsPerBatch``
  down when payloads are MBs, not the defaults tuned for scalar rows.
- frame sampling multiplies rows ~N_frames×; it yields per-batch pandas
  frames rather than accumulating, so output streams too.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real codecs are optional; the engine falls back to the stub decoder
    import PIL.Image  # type: ignore # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

FRAME_BYTES = 256  # fake "frame" stride within a payload
FRAME_SAMPLE_EVERY = 4  # keep every 4th frame

MEDIA_FEATURES_SCHEMA = (
    "doc_id long, media_type string, nbytes long, content_md5 string, "
    "width long, height long, channels long, thumb_width long, thumb_height long"
)
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_nbytes long, frame_md5 string"

_MEDIA_TYPES = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents(text) → media table: opaque binary payload + typed metadata.

    Stand-in for a real landing table of blobs: ``payload`` is the utf-8
    bytes of the document, ``media_type`` a deterministic label. A real
    pipeline would read ``binaryFile`` sources into the same shape.
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length("text").cast("long").alias("nbytes"),
            F.col("source"),
        ).alias("meta"),
    )


def decode_media_real(payload: bytes, media_type: str) -> dict:
    """Real decoder seam — requires codec libraries not in this container."""
    if media_type == "image" and _HAVE_PIL:
        raise NotImplementedError("PIL present but real decode is out of scope here")
    raise NotImplementedError(
        f"no codec available for media_type={media_type!r}; "
        "install PIL/cv2/ffmpeg bindings and implement decode_media_real"
    )


def decode_media(payload: bytes, media_type: str) -> dict:
    """STUB decode: deterministic fake dimensions from the payload hash.

    width/height ∈ [32, 1023], channels ∈ [1, 4] — pure functions of the
    md5 so the DuckDB oracle can recompute them (see plans/multimodal.py).
    """
    h = hashlib.md5(payload).hexdigest()
    return {
        "content_md5": h,
        "width": 32 + int(h[0:4], 16) % 992,
        "height": 32 + int(h[4:8], 16) % 992,
        "channels": 1 + int(h[8], 16) % 4,
    }


def resize_stub(width: int, height: int, *, factor: int = 2) -> tuple[int, int]:
    """Resize stub: integer halving with a floor of 1 (thumbnail dims)."""
    return max(1, width // factor), max(1, height // factor)


def _media_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, media_type, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
            b = bytes(payload)
            d = decode_media(b, media_type)
            tw, th = resize_stub(d["width"], d["height"])
            rows.append(
                (int(doc_id), media_type, len(b), d["content_md5"], d["width"], d["height"], d["channels"], tw, th)
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "media_type", "nbytes", "content_md5",
                "width", "height", "channels", "thumb_width", "thumb_height",
            ],
        )


def _spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions that the python stage uses every core —
    a single-file landing table arrives as 1-2 partitions and would run
    the Arrow batches serially. No-op when the input is already wide."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def media_features(media: DataFrame) -> DataFrame:
    """decode + feature-extract + resize, one Arrow pass over payloads."""
    return _spread(media.select("doc_id", "media_type", "payload")).mapInPandas(
        _media_features_batches, schema=MEDIA_FEATURES_SCHEMA
    )


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for i in range(0, math.ceil(len(b) / FRAME_BYTES)):
                if i % FRAME_SAMPLE_EVERY:
                    continue
                chunk = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                rows.append((int(doc_id), i, len(chunk), hashlib.md5(chunk).hexdigest()))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_nbytes", "frame_md5"])


def frame_sample(media: DataFrame) -> DataFrame:
    """Frame sampler: fixed-stride 'frames' of each payload, keeping every
    k-th — the row-explosion shape of a video frame extractor."""
    return _spread(media.select("doc_id", "payload")).mapInPandas(
        _frame_sample_batches, schema=FRAME_SCHEMA
    )

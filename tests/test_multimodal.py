"""Multimodal plumbing tests beyond the oracle parity (which covers values)."""

from __future__ import annotations

import pytest

from etl_pipeline_telecom_spark.functions.multimodal import (
    decode_media,
    decode_media_real,
    media_from_documents,
    media_features,
    resize_stub,
)
from etl_pipeline_telecom_spark.sources import load_table


def test_decode_media_real_is_a_stub():
    with pytest.raises(NotImplementedError):
        decode_media_real(b"\x89PNG...", "image")


def test_decode_media_deterministic():
    a = decode_media(b"same bytes", "image")
    assert a == decode_media(b"same bytes", "video")
    assert 32 <= a["width"] <= 1023 and 32 <= a["height"] <= 1023
    assert 1 <= a["channels"] <= 4
    assert resize_stub(33, 1) == (16, 1)


def test_media_schema_and_partitioning(spark, sf_dir):
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<nbytes:bigint")
    # feature extraction must not change partitioning (narrow mapInPandas)
    feats = media_features(media.repartition(4))
    assert feats.rdd.getNumPartitions() == 4
    assert feats.count() == media.count()


def test_m4_media_dedup_is_byte_exact_not_normalized(spark, tmp_path):
    """m4 dedups the BINARY payload byte-exactly: case/whitespace variants
    that d1's normalized-text fingerprint would merge stay separate blobs,
    while byte-identical payloads collapse to the min-id canonical."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_telecom_spark import catalog

    from .oracle_harness import compare

    texts = {
        1: "hello world",
        2: "hello world",    # byte-identical dup of 1
        3: "Hello World",    # case variant: SAME under d1, DIFFERENT under m4
        4: " hello world ",  # whitespace variant: same under d1, different here
        5: "something else",
    }
    table = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["crafted"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts.values()], pa.int64()),
        }
    )
    d = str(tmp_path)
    pq.write_table(table, os.path.join(d, "documents.parquet"))

    spec = catalog.specs()["m4_media_exact_dedup"]
    rows = {
        r["canonical_doc_id"]: (r["copies"], r["reclaimable_bytes"])
        for r in spec.fn(spark, d).collect()
    }
    # dup injection adds nothing (no doc_id % 10 == 0 in the fixture), so
    # copies come only from the byte-identical pair 1/2
    assert rows[1] == (2, len("hello world"))
    assert rows[3] == (1, 0)   # case variant NOT merged
    assert rows[4] == (1, 0)   # whitespace variant NOT merged
    assert rows[5] == (1, 0)
    assert len(rows) == 4
    ok, msg = compare(spark, d, spec.fn, spec.sql)
    assert ok, msg


def test_m4_matches_oracle_on_fixture(spark, sf_dir):
    from etl_pipeline_telecom_spark import catalog

    from .oracle_harness import compare

    spec = catalog.specs()["m4_media_exact_dedup"]
    ok, msg = compare(spark, sf_dir, spec.fn, spec.sql)
    assert ok, msg

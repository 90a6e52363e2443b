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

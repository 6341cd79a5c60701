"""Multimodal plumbing tests: binary payload typing, Arrow batch flow
through mapInPandas, schema contract, determinism of the stub decode."""

from __future__ import annotations

import hashlib

from pyspark.sql.types import BinaryType

from hadoop_tfidf_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    media_pipeline,
    with_binary_payload,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "")],
        ["doc_id", "text"],
    )


def test_payload_is_binary_typed(spark):
    media = with_binary_payload(_docs(spark))
    assert isinstance(media.schema["payload"].dataType, BinaryType)
    assert media.columns == ["doc_id", "payload", "media_type"]


def test_decode_schema_contract(spark):
    out = media_pipeline(_docs(spark))
    assert out.schema == DECODED_SCHEMA


def test_decode_matches_local_hash(spark):
    rows = {r.doc_id: r for r in media_pipeline(_docs(spark)).collect()}
    h = hashlib.md5(b"hello world").hexdigest()
    assert rows[1].content_md5 == h
    assert rows[1].n_bytes == len(b"hello world")
    assert rows[1].width == int(h[0:2], 16)
    assert rows[1].height == int(h[2:4], 16)
    assert rows[1].n_frames == int(h[4:5], 16)


def test_empty_payload_handled(spark):
    rows = {r.doc_id: r for r in media_pipeline(_docs(spark)).collect()}
    assert rows[3].n_bytes == 0
    assert rows[3].content_md5 == hashlib.md5(b"").hexdigest()


def test_partitioning_preserved(spark):
    """mapInPandas is a narrow transformation — partition count in = out."""
    docs = _docs(spark).repartition(3)
    out = decode_media(with_binary_payload(docs))
    assert out.rdd.getNumPartitions() == 3

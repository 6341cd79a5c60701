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


def test_resize_clamps_and_hashes(spark):
    from hadoop_tfidf_spark.operators.multimodal import RESIZED_SCHEMA, resize_media

    out = resize_media(media_pipeline(_docs(spark)), max_dim=64)
    assert out.schema == RESIZED_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    h = hashlib.md5(b"hello world").hexdigest()
    w, ht = int(h[0:2], 16), int(h[2:4], 16)
    ow, oh = min(w, 64), min(ht, 64)
    assert (rows[1].out_width, rows[1].out_height) == (ow, oh)
    assert rows[1].resized_md5 == hashlib.md5(f"{h}:{ow}x{oh}".encode()).hexdigest()


def test_sample_frames_fanout(spark):
    """1:N fan-out inside the Arrow stream: up to 3 evenly spaced frames,
    deduped; zero-frame items emit nothing."""
    from hadoop_tfidf_spark.operators.multimodal import FRAMES_SCHEMA, sample_frames

    out = sample_frames(media_pipeline(_docs(spark)), n_samples=3)
    assert out.schema == FRAMES_SCHEMA
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_md5))
    for doc_id, text in [(1, b"hello world"), (2, b"spark engine"), (3, b"")]:
        h = hashlib.md5(text).hexdigest()
        n = int(h[4:5], 16)
        want = sorted({(k * n) // 3 for k in range(3)}) if n > 0 else []
        idxs = sorted(i for i, _ in got.get(doc_id, []))
        assert idxs == want, (doc_id, n)
        for idx, fh in got.get(doc_id, []):
            assert fh == hashlib.md5(f"{h}:{idx}".encode()).hexdigest()

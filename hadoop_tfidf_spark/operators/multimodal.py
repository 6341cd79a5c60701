"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, plus Arrow-batched decode /
feature-extract stages via ``mapInPandas``.

The decode step is a STUB (this container has no image/audio libraries):
it derives deterministic fake features from the payload's md5, clearly
marked below. Everything Spark-side — schemas, batch iteration, partition
behavior, output typing — is real and tested, and the fake is reproducible
in SQL, so even the Pandas-UDF path is covered by the DuckDB oracle.

Scale design: payloads stay opaque bytes end-to-end (no driver collect);
``mapInPandas`` streams Arrow record batches through Python with O(batch)
memory; decode parallelism = input partitions, so a 100 TB media corpus
just needs sane ``maxPartitionBytes``. Real deployments replace
``_fake_decode_row`` with PIL/ffmpeg calls — the operator shape, schema
contract, and partitioning are unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of the decode stage — what a real image decoder would
#: produce (dims + a compact feature digest) alongside the source id.
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque media column: ``(doc_id, payload BINARY, media_type)``.

    Here the payload is the utf-8 text bytes (the container has no real
    media); a production ingest reads files via ``spark.read.format
    ("binaryFile")`` into the identical schema.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode / feature-extract stage: Arrow-batched ``mapInPandas`` over
    the binary payload column. Returns :data:`DECODED_SCHEMA` rows.

    The worker function is deliberately self-contained (no references to
    this module's globals) so cloudpickle ships it BY VALUE — Python
    workers never need ``hadoop_tfidf_spark`` importable, which matters
    when an external driver process imports this package off sys.path
    without installing it.
    """

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        def fake_decode(payload: bytes) -> tuple[int, str, int, int, int]:
            # STUB decoder — deterministic fake features from the payload
            # md5. A real decoder (PIL / ffmpeg) is not installed in this
            # container; the fake keeps the full Arrow plumbing testable
            # and oracle-checkable (md5-derived, so SQL reproduces it).
            h = hashlib.md5(payload).hexdigest()
            return (len(payload), h, int(h[0:2], 16), int(h[2:4], 16), int(h[4:5], 16))

        for pdf in batches:
            feats = [fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=["n_bytes", "content_md5", "width", "height", "n_frames"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_pipeline(docs: DataFrame) -> DataFrame:
    """Full multimodal ingest: attach payload → Arrow decode → typed
    features. One narrow Python stage, no shuffle."""
    return decode_media(with_binary_payload(docs))


#: Output schema of the resize stage.
RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_media(decoded: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize stage over decoded media: clamp each dimension to
    ``max_dim`` preserving nothing fancy (STUB — a real implementation
    calls PIL/opencv per row; the fake derives the "resized" content
    digest from the source digest + target dims so the DuckDB oracle can
    reproduce it). Same 1:1 Arrow ``mapInPandas`` shape as decode: O(batch)
    memory, no shuffle, parallelism = input partitions."""

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        md = max_dim  # closed-over scalar; no module globals

        for pdf in batches:
            ow = pdf["width"].clip(upper=md)
            oh = pdf["height"].clip(upper=md)
            rh = [
                hashlib.md5(f"{m}:{w}x{h}".encode()).hexdigest()
                for m, w, h in zip(pdf["content_md5"], ow, oh)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pdf["width"].values,
                    "height": pdf["height"].values,
                    "out_width": ow.values,
                    "out_height": oh.values,
                    "resized_md5": rh,
                }
            )

    return decoded.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


#: Output schema of the frame-sampling stage (1:N fan-out).
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(decoded: DataFrame, n_samples: int = 3) -> DataFrame:
    """Frame-sampling stage: emit up to ``n_samples`` evenly spaced frames
    per media item — the 1:N fan-out shape (video → frames) the 1:1 decode
    doesn't exercise. Sampled indices are ``floor(k·n_frames/n_samples)``
    for k < n_samples, deduped; items with ``n_frames = 0`` emit nothing.
    STUB frame content: md5 of ``content_md5:frame_idx`` (deterministic,
    SQL-reproducible). ``mapInPandas`` may yield more rows than its input
    batch — the fan-out happens inside the Arrow stream, no explode/join.
    """

    def frame_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        ns = n_samples

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, md5_, n_frames in zip(
                pdf["doc_id"], pdf["content_md5"], pdf["n_frames"]
            ):
                n = int(n_frames)
                if n <= 0:
                    continue
                for idx in sorted({(k * n) // ns for k in range(ns)}):
                    ids.append(doc_id)
                    idxs.append(idx)
                    digests.append(
                        hashlib.md5(f"{md5_}:{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return decoded.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)

"""Multimodal column plumbing: image AND audio payloads as opaque
``binary`` columns with typed metadata, plus Arrow-batched decode /
resize / frame-sample / perceptual-hash / resample stages via
``mapInPandas``.

The decode step is REAL pixel math on a real container: payloads are
multi-frame binary PPM (``P6``) streams — concatenated header + raw RGB
frames, the "MJPEG of PPM" pattern — and every downstream stage parses
the actual bytes (header walk, channel sums, nearest-neighbor
downsample, per-frame checksums). No image library is needed: P6 is a
pure header-plus-raw-triplets format, decodable in a few lines of
stdlib Python. The synthetic payloads are generated deterministically
from ``(doc_id, length(text))`` with an integer pixel formula, so the
DuckDB oracle reproduces every decoded number analytically while the
engine side derives them ONLY by parsing bytes. Swapping the generator
for ``spark.read.format("binaryFile")`` over real ``.ppm``/decoded
frames changes nothing downstream.

Scale design: payloads stay opaque bytes end-to-end (no driver
collect); ``mapInPandas`` streams Arrow record batches through Python
with O(batch) memory; decode parallelism = input partitions, so a
100 TB media corpus just needs sane ``maxPartitionBytes``. Feature
outputs are exact BIGINT sums/checksums (associative, engine-order
independent) — the same hash-gate trick the streaming sums use.

The audio half mirrors the image half one-for-one: synthetic mono
PCM16 WAVs with the REAL RIFF + fmt + data chunk layout, decoded by
walking the actual chunks (any chunk order, word alignment honored),
with exact BIGINT sample sums and a position-weighted nearest-neighbor
resample checksum — same generator-formula-vs-byte-parse gate.

Reference parity note: liuhoward/hadoop-tfidf has no media surface at
all (6 text-only MapReduce classes); this family is north-star depth
for LLM training-data pipelines, not reference parity.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

def _check_errors_mode(op: str, errors: str) -> bool:
    """Validate the decode-family ``errors`` parameter; True = tolerant
    (``"keep"``: malformed payloads become NULL-feature rows with a
    trailing ``err`` string instead of failing the stage)."""
    if errors not in ("raise", "keep"):
        raise ValueError(f"{op}: errors must be 'raise' or 'keep', got {errors!r}")
    return errors == "keep"


def _with_err(schema: StructType) -> StructType:
    """``schema`` plus the trailing nullable ``err`` string column the
    tolerant decode mode emits."""
    return StructType(list(schema.fields) + [StructField("err", StringType())])


#: Schema of the media relation every stage consumes.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
    ]
)

#: Output schema of the decode stage — parsed dims/frame count plus
#: exact per-channel pixel sums over all frames (BIGINT, associative).
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)

PPM_MEDIA_TYPE = "image/x-portable-pixmap"


def _parse_ppm_frames(buf: bytes) -> list[tuple[int, int, bytes]]:
    """Parse a concatenated binary-PPM (``P6``) stream into
    ``[(width, height, pixel_bytes), ...]`` — real byte walking: magic
    check, whitespace-separated ``w h maxval`` header, then
    ``w*h*3`` raw RGB bytes per frame. Raises on malformed input."""
    frames = []
    pos, n = 0, len(buf)
    while pos < n:
        if buf[pos : pos + 2] != b"P6":
            raise ValueError(f"bad PPM magic at byte {pos}")
        pos += 2
        vals = []
        while len(vals) < 3:
            while pos < n and buf[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while pos < n and not buf[pos : pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError(f"truncated PPM header at byte {pos}")
            vals.append(int(buf[start:pos]))
        pos += 1  # the single whitespace byte that ends the header
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError(f"unsupported maxval {maxval}")
        need = w * h * 3
        if n - pos < need:
            raise ValueError("truncated PPM pixel data")
        frames.append((w, h, buf[pos : pos + need]))
        pos += need
    return frames


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque media column: ``(doc_id, payload BINARY,
    media_type)`` where payload is a deterministic synthetic multi-frame
    binary PPM built from ``(doc_id, length(text))``:

    - ``w = 4 + L % 13``, ``h = 4 + doc_id % 11``, ``frames = 1 + L % 3``
    - pixel ``(f, y, x, c)`` value =
      ``((doc_id % 256)*31 + f*17 + y*7 + x*3 + c*11) % 256``

    The formula exists ONLY here and in the DuckDB oracle; every
    downstream stage recovers dims/values by parsing the bytes. A
    production ingest replaces this with ``spark.read.format
    ("binaryFile")`` into the identical :data:`MEDIA_SCHEMA`."""

    def gen_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            L = len(text if text is not None else "")
            d = int(doc_id)
            w, h, nf = 4 + L % 13, 4 + d % 11, 1 + L % 3
            base = (d % 256) * 31
            # vectorized pixel plane: v[y, x, c] = base + f*17 + y*7 +
            # x*3 + c*11 (mod 256) — broadcasting, no per-pixel loop
            plane = (
                7 * np.arange(h, dtype=np.int64)[:, None, None]
                + 3 * np.arange(w, dtype=np.int64)[None, :, None]
                + 11 * np.arange(3, dtype=np.int64)[None, None, :]
            )
            out = bytearray()
            for f in range(nf):
                out += b"P6\n%d %d\n255\n" % (w, h)
                out += ((base + f * 17 + plane) % 256).astype(np.uint8).tobytes()
            return bytes(out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        build(i, t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "media_type": PPM_MEDIA_TYPE,
                }
            )

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        gen_batches, schema=MEDIA_SCHEMA
    )


def decode_media(media: DataFrame, errors: str = "raise") -> DataFrame:
    """Decode / feature-extract stage: Arrow-batched ``mapInPandas`` over
    the binary payload column. REAL decoding: parses every frame header,
    validates magic/maxval, and computes exact per-channel BIGINT pixel
    sums across all frames via strided slices over the raw bytes.
    Returns :data:`DECODED_SCHEMA` rows.

    ``errors``: ``"raise"`` (default — one malformed payload fails the
    stage, the right contract for the synthetic gate corpus where any
    parse error is an engine bug) or ``"keep"`` — the 100 TB production
    shape: a malformed payload yields NULL features plus a trailing
    ``err`` string naming the parse failure, good rows are untouched,
    and the job survives the one truncated file per billion a real
    scrape always contains (the same conservative keep-all failure mode
    the dedup valves follow; filter or quarantine on ``err IS NOT
    NULL`` downstream).

    The worker function is deliberately self-contained (no references to
    this module's globals) so cloudpickle ships it BY VALUE — Python
    workers never need ``hadoop_tfidf_spark`` importable, which matters
    when an external driver process imports this package off sys.path
    without installing it.
    """
    tolerant = _check_errors_mode("decode_media", errors)

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def parse(buf: bytes):
            frames = []
            pos, n = 0, len(buf)
            while pos < n:
                if buf[pos : pos + 2] != b"P6":
                    raise ValueError(f"bad PPM magic at byte {pos}")
                pos += 2
                vals = []
                while len(vals) < 3:
                    while pos < n and buf[pos : pos + 1].isspace():
                        pos += 1
                    start = pos
                    while pos < n and not buf[pos : pos + 1].isspace():
                        pos += 1
                    if start == pos:
                        raise ValueError("truncated PPM header")
                    vals.append(int(buf[start:pos]))
                pos += 1
                w, h, maxval = vals
                if maxval != 255:
                    raise ValueError(f"unsupported maxval {maxval}")
                need = w * h * 3
                if n - pos < need:
                    raise ValueError("truncated PPM pixel data")
                frames.append((w, h, buf[pos : pos + need]))
                pos += need
            return frames

        def decode(payload: bytes):
            import numpy as np

            buf = bytes(payload)
            frames = parse(buf)
            w, h = frames[0][0], frames[0][1]
            sr = sg = sb = 0
            for fw, fh, data in frames:
                a = np.frombuffer(data, dtype=np.uint8)  # zero-copy view
                sr += int(a[0::3].sum(dtype=np.int64))
                sg += int(a[1::3].sum(dtype=np.int64))
                sb += int(a[2::3].sum(dtype=np.int64))
            return (len(buf), w, h, len(frames), sr, sg, sb)

        cols = [
            "n_bytes", "width", "height", "n_frames",
            "sum_r", "sum_g", "sum_b",
        ]
        for pdf in batches:
            if tolerant:
                feats = []
                for p in pdf["payload"]:
                    try:
                        feats.append(decode(p) + (None,))
                    except Exception as ex:  # malformed payload, keep row
                        feats.append(
                            (None,) * len(cols)
                            + (f"{type(ex).__name__}: {ex}",)
                        )
                out = pd.DataFrame(feats, columns=cols + ["err"])
            else:
                out = pd.DataFrame(
                    [decode(p) for p in pdf["payload"]], columns=cols
                )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    schema = _with_err(DECODED_SCHEMA) if tolerant else DECODED_SCHEMA
    return media.mapInPandas(decode_batches, schema=schema)


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
        StructField("checksum", LongType()),
    ]
)


def resize_media(media: DataFrame, max_dim: int = 8) -> DataFrame:
    """Resize stage over the raw media relation: nearest-neighbor
    downsample of FRAME 0 to ``min(dim, max_dim)`` per axis — real pixel
    sampling over the parsed bytes (``src = (out_idx * in_dim) //
    out_dim``), emitted as a position-weighted exact checksum
    ``Σ value · (pixel_index + 1)`` so layout (not just the value
    multiset) is pinned and any engine can replay it in integer SQL.
    Same 1:1 Arrow ``mapInPandas`` shape as decode: O(batch) memory, no
    shuffle, parallelism = input partitions."""

    def resize_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        md = max_dim  # closed-over scalar; no module globals

        def resize(payload: bytes):
            buf = bytes(payload)
            if buf[:2] != b"P6":
                raise ValueError("bad PPM magic")
            vals, pos, n = [], 2, len(buf)
            while len(vals) < 3:
                while pos < n and buf[pos : pos + 1].isspace():
                    pos += 1
                start = pos
                while pos < n and not buf[pos : pos + 1].isspace():
                    pos += 1
                vals.append(int(buf[start:pos]))
            pos += 1
            w, h, _ = vals
            import numpy as np

            a = np.frombuffer(
                buf, dtype=np.uint8, count=w * h * 3, offset=pos
            ).astype(np.int64)
            ow, oh = min(w, md), min(h, md)
            # vectorized nearest-neighbor gather + position weights
            ys = (np.arange(oh, dtype=np.int64) * h) // oh
            xs = (np.arange(ow, dtype=np.int64) * w) // ow
            src = ((ys[:, None] * w + xs[None, :]) * 3).ravel()
            ob = 3 * np.arange(oh * ow, dtype=np.int64)
            checksum = int(
                (a[src] * (ob + 1)).sum()
                + (a[src + 1] * (ob + 2)).sum()
                + (a[src + 2] * (ob + 3)).sum()
            )
            return (w, h, ow, oh, checksum)

        for pdf in batches:
            feats = [resize(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=["width", "height", "out_width", "out_height", "checksum"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


#: Output schema of the frame-sampling stage (1:N fan-out).
FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def sample_frames(media: DataFrame, n_samples: int = 3) -> DataFrame:
    """Frame-sampling stage: emit up to ``n_samples`` evenly spaced
    frames per media item — the 1:N fan-out shape (video → frames) the
    1:1 decode doesn't exercise. Sampled indices are
    ``floor(k·n_frames/n_samples)`` for ``k < n_samples``, deduped; each
    sampled frame's REAL pixel bytes are read and emitted as the exact
    position-weighted checksum ``Σ byte_i · (i + 1)`` over that frame.
    ``mapInPandas`` may yield more rows than its input batch — the
    fan-out happens inside the Arrow stream, no explode/join."""

    def frame_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        ns = n_samples

        def parse(buf: bytes):
            frames = []
            pos, n = 0, len(buf)
            while pos < n:
                if buf[pos : pos + 2] != b"P6":
                    raise ValueError("bad PPM magic")
                pos += 2
                vals = []
                while len(vals) < 3:
                    while pos < n and buf[pos : pos + 1].isspace():
                        pos += 1
                    start = pos
                    while pos < n and not buf[pos : pos + 1].isspace():
                        pos += 1
                    vals.append(int(buf[start:pos]))
                pos += 1
                w, h, _ = vals
                need = w * h * 3
                frames.append(buf[pos : pos + need])
                pos += need
            return frames

        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = parse(bytes(payload))
                n = len(frames)
                if n <= 0:
                    continue
                for idx in sorted({(k * n) // ns for k in range(ns)}):
                    data = frames[idx]
                    a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                    ids.append(doc_id)
                    idxs.append(idx)
                    sums.append(
                        int((a * np.arange(1, a.size + 1)).sum())
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return media.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)


#: Output schema of the perceptual-hash stage.
PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("phash", LongType()),
    ]
)


def media_phash(media: DataFrame, grid: int = 4) -> DataFrame:
    """Perceptual fingerprint (average hash) of FRAME 0 over the parsed
    pixel bytes — the image-modality counterpart of
    :func:`~hadoop_tfidf_spark.operators.dedup.simhash`: downsample to a
    ``grid x grid`` luminance grid by nearest-neighbor gather
    (``src = (out_idx * in_dim) // grid``, the :func:`resize_media`
    rule), then bit ``Y*grid+X`` is set iff that cell's gray exceeds
    the grid mean. All-integer: gray = r+g+b (no /3), and the mean
    compare is ``gray * grid² > total`` (strict; ties clear the bit) —
    so the hash replays exactly in integer SQL and any engine agrees
    bit-for-bit. Output ``(doc_id, width, height, phash)`` with phash
    in the low ``grid²`` bits of a BIGINT.

    Same 1:1 Arrow ``mapInPandas`` shape as decode/resize: O(batch)
    memory, no shuffle, parallelism = input partitions — a 100 TB media
    corpus hashes in one scan. Near-identical frames (re-encodes,
    brightness-stable crops of the synthetic gradient family) collide
    or sit within small Hamming distance; feed the output to
    :func:`phash_dedup` / :func:`phash_near_pairs`."""

    if grid * grid > 63:
        raise ValueError(
            f"grid {grid} needs {grid * grid} bits; the BIGINT hash "
            "holds at most 63"
        )

    def hash_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        g = grid  # closed-over scalar; no module globals

        def ph(payload: bytes):
            buf = bytes(payload)
            if buf[:2] != b"P6":
                raise ValueError("bad PPM magic")
            vals, pos, n = [], 2, len(buf)
            while len(vals) < 3:
                while pos < n and buf[pos : pos + 1].isspace():
                    pos += 1
                start = pos
                while pos < n and not buf[pos : pos + 1].isspace():
                    pos += 1
                vals.append(int(buf[start:pos]))
            pos += 1
            w, h, _ = vals
            import numpy as np

            a = np.frombuffer(
                buf, dtype=np.uint8, count=w * h * 3, offset=pos
            ).astype(np.int64)
            ys = (np.arange(g, dtype=np.int64) * h) // g
            xs = (np.arange(g, dtype=np.int64) * w) // g
            src = ((ys[:, None] * w + xs[None, :]) * 3).ravel()
            gray = a[src] + a[src + 1] + a[src + 2]
            tot = int(gray.sum())
            bits = (gray * (g * g)) > tot
            val = int(
                (bits.astype(np.int64) << np.arange(g * g, dtype=np.int64))
                .sum()
            )
            return (w, h, val)

        for pdf in batches:
            feats = [ph(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=["width", "height", "phash"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(hash_batches, schema=PHASH_SCHEMA)


def phash_dedup(media: DataFrame, grid: int = 4) -> DataFrame:
    """Exact perceptual dedup over the image modality: documents whose
    frame-0 average hash collides are perceptual duplicates; the lowest
    ``doc_id`` in each hash group survives (the
    :func:`~hadoop_tfidf_spark.operators.dedup.exact_dedup` keep rule,
    applied to pixels instead of text bytes). Output one row per doc:
    ``(doc_id, phash, is_dup, keep)``.

    Plan shape: one Arrow hash scan, then ONE phash-partitioned window
    tags group membership in place (``min != max`` doc_id = the ≥2-docs
    test, ``doc_id == min`` = the survivor — the same single-window
    pattern span dedup uses; integer rows only, no agg + join-back,
    never all-pairs)."""
    from pyspark.sql import Window

    h = media_phash(media, grid=grid)
    w = Window.partitionBy("phash")
    return h.select(
        "doc_id",
        "phash",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w))
        .cast("int")
        .alias("is_dup"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("int").alias("keep"),
    )


def phash_near_pairs(
    media: DataFrame,
    max_hamming: int = 1,
    grid: int = 4,
    band_bits: int = 4,
) -> DataFrame:
    """NEAR-duplicate image pairs by banded Hamming join over the
    perceptual hash — the SimHash blocking recipe on the image
    modality: split the ``grid²``-bit hash into ``band_bits``-wide
    bands; a pair within Hamming ``max_hamming`` differs in at most
    ``max_hamming`` bands, so it shares at least one band whenever
    ``n_bands > max_hamming`` (pigeonhole — asserted). Candidates come
    from a band-keyed equi-join (never all-pairs); the exact distance
    check is one ``bit_count(xor)`` per candidate. Output
    ``(doc_id_a, doc_id_b, hamming)``, each unordered pair once.

    Scale: blocking cost follows band-bucket sizes exactly like LSH —
    hash-alike corpora (re-encoded frame farms) concentrate, which is
    precisely what the dedup exists to find; the verify step is a
    codegen bit op, so the join output never carries pixel data."""
    n_bits = grid * grid
    n_bands = (n_bits + band_bits - 1) // band_bits
    if n_bands <= max_hamming:
        raise ValueError(
            f"banding cannot guarantee hamming<={max_hamming} with "
            f"{n_bands} bands (need n_bands > max_hamming)"
        )
    h = media_phash(media, grid=grid)
    mask = (1 << band_bits) - 1
    # per-band (index, value) structs with literal shift widths — the
    # shift amount is compile-time, so the whole banding is codegen
    bands = h.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("phash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "phash", F.col("bv.band").alias("band"),
             F.col("bv.band_val").alias("band_val"))
    a = bands.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("phash").alias("_ha"),
        "band",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("phash").alias("_hb"),
        "band",
        "band_val",
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", "_ha", "_hb")
        .distinct()
    )
    return cand.select(
        "doc_id_a",
        "doc_id_b",
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        .cast("bigint")
        .alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


# -- audio modality ---------------------------------------------------------

WAV_MEDIA_TYPE = "audio/x-wav"

#: Output schema of the audio decode stage — parsed header fields plus
#: exact BIGINT sample sums (associative, engine-order independent).
AUDIO_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("sum_abs", LongType()),
    ]
)

#: Output schema of the audio resample stage.
AUDIO_RESAMPLED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("out_rate", LongType()),
        StructField("out_samples", LongType()),
        StructField("checksum", LongType()),
    ]
)


def with_audio_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque AUDIO column: ``(doc_id, payload BINARY,
    media_type)`` where payload is a deterministic synthetic mono
    PCM16 WAV (RIFF + fmt + data chunks, little-endian — the real
    container layout) built from ``(doc_id, length(text))``:

    - ``sample_rate = 4000 · (1 + L % 3)`` (4/8/12 kHz),
      ``n_samples = 64 + doc_id % 101``
    - ``sample[i] = ((doc_id % 256)·131 + i·17) % 65536 − 32768``
      (int16 sawtooth)

    The formula exists ONLY here and in the DuckDB oracle — downstream
    stages recover rate/length/values by walking the actual RIFF
    chunks. A production ingest replaces this with
    ``spark.read.format("binaryFile")`` over real ``.wav`` files into
    the identical :data:`MEDIA_SCHEMA`."""

    def gen_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            L = len(text if text is not None else "")
            d = int(doc_id)
            sr = 4000 * (1 + L % 3)
            n = 64 + d % 101
            base = (d % 256) * 131
            samples = (
                (base + 17 * np.arange(n, dtype=np.int64)) % 65536 - 32768
            ).astype("<i2")
            data = samples.tobytes()
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVE"
                + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                + b"data"
                + struct.pack("<I", len(data))
            )
            return hdr + data

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        build(i, t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                    "media_type": WAV_MEDIA_TYPE,
                }
            )

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        gen_batches, schema=MEDIA_SCHEMA
    )


def decode_audio(media: DataFrame, errors: str = "raise") -> DataFrame:
    """Audio decode / feature-extract stage: Arrow-batched
    ``mapInPandas`` that walks the real RIFF chunks per payload and
    emits exact integer features — sample count, signed sample sum,
    absolute-value sum (BIGINT, associative). Same 1:1 scan shape as
    the image decode: O(batch) memory, zero shuffles, parallelism =
    input partitions.

    ``errors="keep"`` is the 100 TB production mode (see
    :func:`decode_media`): a truncated/corrupt payload yields NULL
    features + a trailing ``err`` string instead of poisoning the
    stage; the default ``"raise"`` keeps the strict gate contract."""
    tolerant = _check_errors_mode("decode_audio", errors)

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def parse(buf: bytes):
            buf = bytes(buf)
            if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
                raise ValueError("bad RIFF/WAVE magic")
            pos, n = 12, len(buf)
            sr, data = None, None
            while pos + 8 <= n:
                cid = buf[pos : pos + 4]
                (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                body = buf[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt, ch, sr_, _, _, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                    if fmt != 1 or ch != 1 or bits != 16:
                        raise ValueError(
                            f"unsupported WAV: fmt={fmt} channels={ch} "
                            f"bits={bits}"
                        )
                    sr = sr_
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)
            if sr is None or data is None:
                raise ValueError("missing fmt/data chunk")
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            return (
                len(buf),
                int(sr),
                len(s),
                int(s.sum()),
                int(np.abs(s).sum()),
            )

        cols = ["n_bytes", "sample_rate", "n_samples", "sum_samples", "sum_abs"]
        for pdf in batches:
            if tolerant:
                feats = []
                for p in pdf["payload"]:
                    try:
                        feats.append(parse(p) + (None,))
                    except Exception as ex:  # malformed payload, keep row
                        feats.append(
                            (None,) * len(cols)
                            + (f"{type(ex).__name__}: {ex}",)
                        )
                out = pd.DataFrame(feats, columns=cols + ["err"])
            else:
                out = pd.DataFrame(
                    [parse(p) for p in pdf["payload"]], columns=cols
                )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    schema = _with_err(AUDIO_DECODED_SCHEMA) if tolerant else AUDIO_DECODED_SCHEMA
    return media.mapInPandas(decode_batches, schema=schema)


#: Output schema of the audio frame-energy / VAD stage.
AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_active", LongType()),
        StructField("first_active", LongType()),
        StructField("last_active", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_energy(
    media: DataFrame,
    frame: int = 16,
    threshold_amp: int = 8192,
    errors: str = "raise",
) -> DataFrame:
    """Frame-energy / voice-activity stage: split the parsed samples
    into fixed ``frame``-sample windows (tail window partial) and emit
    per-doc activity telemetry — the silence-trim / VAD pass an audio
    training pipeline runs before feature extraction:

    - ``energy`` = Σ sample² over the whole clip (exact BIGINT,
      associative);
    - a window is ACTIVE iff its energy ≥ ``n_in_window ·
      threshold_amp²`` (i.e. mean square amplitude beats the
      threshold — integer compare, no division);
    - ``first_active`` / ``last_active`` are the trim boundaries
      (frame indices, NULL when the clip is all-silence).

    Same 1:1 Arrow ``mapInPandas`` scan shape as :func:`decode_audio`:
    O(batch) memory, zero shuffles, parallelism = input partitions —
    at 100 TB this is a pure map stage over the binary column.
    ``errors="keep"`` is the production malformed-payload mode (NULL
    features + trailing ``err`` string; see :func:`decode_media`)."""
    tolerant = _check_errors_mode("audio_energy", errors)

    def energy_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        fr = int(frame)
        thr2 = int(threshold_amp) * int(threshold_amp)

        def feats(buf: bytes):
            buf = bytes(buf)
            if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
                raise ValueError("bad RIFF/WAVE magic")
            pos, n = 12, len(buf)
            sr, data = None, None
            while pos + 8 <= n:
                cid = buf[pos : pos + 4]
                (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                body = buf[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt, ch, sr_, _, _, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                    if fmt != 1 or ch != 1 or bits != 16:
                        raise ValueError("unsupported WAV")
                    sr = sr_
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)
            if sr is None or data is None:
                raise ValueError("missing fmt/data chunk")
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            ns = len(s)
            starts = np.arange(0, ns, fr, dtype=np.int64)
            en = np.add.reduceat(s * s, starts) if ns else np.array([], dtype=np.int64)
            fn = np.minimum(fr, ns - starts)
            act = en >= fn * thr2
            idx = np.nonzero(act)[0]
            return (
                int(sr),
                ns,
                len(starts),
                int(act.sum()),
                int(idx[0]) if len(idx) else None,
                int(idx[-1]) if len(idx) else None,
                int(en.sum()),
            )

        cols = [
            "sample_rate", "n_samples", "n_frames", "n_active",
            "first_active", "last_active", "energy",
        ]
        for pdf in batches:
            if tolerant:
                rows = []
                for p in pdf["payload"]:
                    try:
                        rows.append(feats(p) + (None,))
                    except Exception as ex:  # malformed payload, keep row
                        rows.append(
                            (None,) * len(cols)
                            + (f"{type(ex).__name__}: {ex}",)
                        )
                out = pd.DataFrame(rows, columns=cols + ["err"])
            else:
                out = pd.DataFrame(
                    [feats(p) for p in pdf["payload"]], columns=cols
                )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    schema = _with_err(AUDIO_ENERGY_SCHEMA) if tolerant else AUDIO_ENERGY_SCHEMA
    return media.mapInPandas(energy_batches, schema=schema)


def resample_audio(media: DataFrame, target_rate: int = 4000) -> DataFrame:
    """Nearest-neighbor resample to ``target_rate`` over the parsed
    samples (``src = (out_i · n) // out_n`` with ``out_n =
    max(1, (n · target) // sr)`` — the :func:`resize_media` gather rule
    on the time axis), emitted as the position-weighted exact checksum
    ``Σ sample[src]·(out_i + 1)`` so ORDER is pinned, not just the
    value multiset. Real decimation on real bytes; an upsample
    (target > sr) repeats source samples, exactly like the image
    nearest-neighbor."""

    def resample_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        tr = int(target_rate)

        def rs(buf: bytes):
            buf = bytes(buf)
            if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
                raise ValueError("bad RIFF/WAVE magic")
            pos, n = 12, len(buf)
            sr, data = None, None
            while pos + 8 <= n:
                cid = buf[pos : pos + 4]
                (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                body = buf[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt, ch, sr_, _, _, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                    if fmt != 1 or ch != 1 or bits != 16:
                        raise ValueError("unsupported WAV")
                    sr = sr_
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)
            if sr is None or data is None:
                raise ValueError("missing fmt/data chunk")
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            ns = len(s)
            out_n = max(1, (ns * tr) // int(sr))
            src = (np.arange(out_n, dtype=np.int64) * ns) // out_n
            checksum = int(
                (s[src] * (np.arange(out_n, dtype=np.int64) + 1)).sum()
            )
            return (int(sr), ns, tr, out_n, checksum)

        for pdf in batches:
            feats = [rs(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=[
                    "sample_rate", "n_samples", "out_rate",
                    "out_samples", "checksum",
                ],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(resample_batches, schema=AUDIO_RESAMPLED_SCHEMA)

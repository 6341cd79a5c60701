"""Multimodal declared queries (binary image/audio decode, phash dedup, frame sampling).

Split from the original single-module ``extensions.py`` (round 15) with
block text preserved verbatim; see the package ``__init__`` for the
registry contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from hadoop_tfidf_spark.operators.multimodal import media_pipeline
from hadoop_tfidf_spark.extensions._base import (
    _docs,
)



def q_multimodal_decode(spark, sf_dir):
    """Real pixel decode: synthetic multi-frame binary-PPM payloads are
    PARSED byte-by-byte (magic, header walk, raw RGB triplets) and the
    per-channel BIGINT pixel sums must match the oracle's analytic
    replay of the generator formula — the engine side never sees the
    formula, only the bytes."""
    return media_pipeline(_docs(spark, sf_dir))


def q_multimodal_resize(spark, sf_dir):
    """Real nearest-neighbor downsample of frame 0 to ≤8×8 over the
    parsed pixel bytes, pinned by a position-weighted integer checksum
    (layout-sensitive, not just a value multiset)."""
    from hadoop_tfidf_spark.operators.multimodal import (
        resize_media,
        with_binary_payload,
    )

    return resize_media(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_frames(spark, sf_dir):
    """1:N frame sampling with real per-frame pixel reads: evenly spaced
    frame indices, each emitted as the exact Σ byte·(pos+1) checksum of
    that frame's raw bytes."""
    from hadoop_tfidf_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    return sample_frames(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_phash(spark, sf_dir):
    """Perceptual average-hash of frame 0 over the PARSED pixel bytes:
    4x4 nearest-neighbor luminance grid, bit set iff cell gray beats
    the grid mean (all-integer: gray=r+g+b, compare gray*16 > total).
    The engine walks real bytes; the oracle replays the generator
    formula analytically — identical 16-bit hashes or the gate fails."""
    from hadoop_tfidf_spark.operators.multimodal import (
        media_phash,
        with_binary_payload,
    )

    return media_phash(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_phash_dedup(spark, sf_dir):
    """Image-modality exact perceptual dedup: docs whose frame-0 aHash
    collides are perceptual duplicates (the synthetic gradient family
    collides heavily BY DESIGN — 72 distinct hashes over 500 docs at
    sf0.01, so the gate relation is far from vacuous); lowest doc_id
    survives. One Arrow hash scan + ONE phash window — the span-dedup
    single-window tag on pixels."""
    from hadoop_tfidf_spark.operators.multimodal import (
        phash_dedup,
        with_binary_payload,
    )

    return phash_dedup(with_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_phash_pairs(spark, sf_dir):
    """NEAR-duplicate image pairs within Hamming 1 of the perceptual
    hash, found by the banded blocking join (4 bands x 4 bits —
    pigeonhole-complete for hamming<=1); exact distance = one
    bit_count(xor) per candidate. The SimHash recipe on pixels."""
    from hadoop_tfidf_spark.operators.multimodal import (
        phash_near_pairs,
        with_binary_payload,
    )

    return phash_near_pairs(
        with_binary_payload(_docs(spark, sf_dir)), max_hamming=1
    )


def q_multimodal_audio_decode(spark, sf_dir):
    """AUDIO decode — the second real binary modality: synthetic mono
    PCM16 WAVs (real RIFF + fmt + data chunk layout) are parsed by
    walking the actual chunks byte-by-byte; the exact BIGINT sample
    sums must match the oracle's analytic replay of the generator
    sawtooth — the engine side never sees the formula, only bytes."""
    from hadoop_tfidf_spark.operators.multimodal import (
        decode_audio,
        with_audio_payload,
    )

    return decode_audio(with_audio_payload(_docs(spark, sf_dir)))


def q_multimodal_audio_resample(spark, sf_dir):
    """Real nearest-neighbor decimation of the parsed samples to 4 kHz
    (the resize_media gather rule on the time axis), pinned by a
    position-weighted integer checksum — layout-sensitive, not just the
    value multiset."""
    from hadoop_tfidf_spark.operators.multimodal import (
        resample_audio,
        with_audio_payload,
    )

    return resample_audio(
        with_audio_payload(_docs(spark, sf_dir)), target_rate=4000
    )


def q_multimodal_audio_energy(spark, sf_dir):
    """Audio frame-energy / VAD stage over the synthetic PCM16 WAVs:
    16-sample windows, a window is active iff its energy beats the
    mean-square threshold (8192² per sample — integer compare), per-doc
    activity counts + trim boundaries + exact BIGINT total energy. The
    engine walks real RIFF bytes; the oracle replays the generator
    sawtooth analytically with the same ``i // 16`` framing."""
    from hadoop_tfidf_spark.operators.multimodal import (
        audio_energy,
        with_audio_payload,
    )

    return audio_energy(with_audio_payload(_docs(spark, sf_dir)))


#: Every doc_id ≡ AUDIO_POISON_RES (mod AUDIO_POISON_MOD) has its WAV
#: payload truncated to the first AUDIO_POISON_BYTES bytes — cutting
#: mid-RIFF-magic, so the parser's "bad RIFF/WAVE magic" guard fires
#: deterministically. A modulo rule (not one literal id) so the poison
#: density stays constant as the corpus scales.
AUDIO_POISON_MOD = 250
AUDIO_POISON_RES = 83
AUDIO_POISON_BYTES = 11


def q_multimodal_audio_keep(spark, sf_dir):
    """The 100 TB malformed-payload contract UNDER THE GATE: the audio
    corpus with every poisoned payload (see :data:`AUDIO_POISON_MOD`)
    truncated mid-header, decoded with ``errors="keep"`` — good rows
    must stay byte-identical to ``multimodal_audio_decode``'s features
    (the oracle reuses that row's analytic replay verbatim), poisoned
    rows surface NULL features plus the deterministic ``err`` string
    instead of failing the stage. The strict default (``errors=
    "raise"``) on the same corpus is test-pinned to fail — this row
    proves the production mode, the tests pin the contrast."""
    from hadoop_tfidf_spark.operators.multimodal import (
        decode_audio,
        with_audio_payload,
    )

    media = with_audio_payload(_docs(spark, sf_dir))
    poisoned = media.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % AUDIO_POISON_MOD == AUDIO_POISON_RES,
            F.expr(f"substring(payload, 1, {AUDIO_POISON_BYTES})"),
        ).otherwise(F.col("payload")),
    )
    return decode_audio(poisoned, errors="keep")

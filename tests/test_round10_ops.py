"""Round-10 operator pins: audio frame-energy/VAD, per-source corpus
governance stats, n-gram novelty, INT8 scalar-quantized two-stage
retrieval, and the variance-balanced (OPQ-lite) PQ permutation."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


def _wav(sr: int, samples: list[int]) -> bytes:
    import numpy as np

    data = np.array(samples, dtype="<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ---------------------------------------------------------------- audio


def test_audio_energy_hand_computed(spark):
    """Three constructed clips: all-loud, all-quiet, and a quiet-loud-
    quiet clip whose trim boundaries must isolate the middle frame."""
    from hadoop_tfidf_spark.operators.multimodal import audio_energy

    loud = [20000] * 8  # one 4-sample frame pair, both active
    quiet = [10] * 8
    mixed = [0] * 4 + [30000] * 4 + [0] * 4  # frames 0,2 silent; 1 active
    rows = [
        (1, bytearray(_wav(8000, loud)), "audio/x-wav"),
        (2, bytearray(_wav(8000, quiet)), "audio/x-wav"),
        (3, bytearray(_wav(4000, mixed)), "audio/x-wav"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id BIGINT, payload BINARY, media_type STRING"
    )
    out = {
        r["doc_id"]: r
        for r in audio_energy(media, frame=4, threshold_amp=8192).collect()
    }
    assert out[1]["n_frames"] == 2 and out[1]["n_active"] == 2
    assert out[1]["first_active"] == 0 and out[1]["last_active"] == 1
    assert out[1]["energy"] == 8 * 20000 * 20000
    assert out[2]["n_active"] == 0
    assert out[2]["first_active"] is None and out[2]["last_active"] is None
    assert out[3]["n_frames"] == 3 and out[3]["n_active"] == 1
    assert out[3]["first_active"] == 1 and out[3]["last_active"] == 1
    assert out[3]["energy"] == 4 * 30000 * 30000


def test_audio_energy_partial_tail_frame(spark):
    """A 6-sample clip at frame=4 has a 2-sample tail frame; the active
    rule scales with the ACTUAL frame length (mean-square compare), so
    a loud tail of 2 samples still activates."""
    from hadoop_tfidf_spark.operators.multimodal import audio_energy

    clip = [0, 0, 0, 0, 20000, 20000]
    media = spark.createDataFrame(
        [(7, bytearray(_wav(8000, clip)), "audio/x-wav")],
        "doc_id BIGINT, payload BINARY, media_type STRING",
    )
    r = audio_energy(media, frame=4, threshold_amp=8192).first()
    assert r["n_frames"] == 2
    assert r["n_active"] == 1
    assert r["first_active"] == 1 and r["last_active"] == 1
    assert r["energy"] == 2 * 20000 * 20000


def test_audio_energy_matches_python_on_generated_corpus(spark):
    """Cross-check the whole stage against an independent pure-Python
    computation over the synthetic WAV generator's formula."""
    from hadoop_tfidf_spark.operators.multimodal import (
        audio_energy,
        with_audio_payload,
    )

    docs = spark.createDataFrame(
        [(i, "x" * (i % 7 + 1)) for i in range(40)],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["doc_id"]: r
        for r in audio_energy(with_audio_payload(docs)).collect()
    }
    for i in range(40):
        n = 64 + i % 101
        base = (i % 256) * 131
        s = [(base + 17 * j) % 65536 - 32768 for j in range(n)]
        frames = [s[f : f + 16] for f in range(0, n, 16)]
        act = [
            1 if sum(v * v for v in fr) >= len(fr) * 8192 * 8192 else 0
            for fr in frames
        ]
        r = got[i]
        assert r["n_frames"] == len(frames)
        assert r["n_active"] == sum(act)
        assert r["energy"] == sum(v * v for v in s)
        if sum(act):
            first = act.index(1)
            last = len(act) - 1 - act[::-1].index(1)
            assert (r["first_active"], r["last_active"]) == (first, last)
        else:
            assert r["first_active"] is None


# ------------------------------------------------------- source stats


def test_source_stats_hand_computed(spark):
    from hadoop_tfidf_spark.functions.text import source_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a a", "de", "s1"),
            (3, "x", "en", "s2"),
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING",
    )
    out = {r["source"]: r for r in source_stats(docs).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 2 and s1["n_tokens"] == 5
    assert s1["vocab"] == 3  # {a, b, c}
    assert s1["n_langs"] == 2
    assert abs(s1["avg_tokens"] - 2.5) < 1e-9
    s2 = out["s2"]
    assert s2["n_docs"] == 1 and s2["vocab"] == 1 and s2["n_langs"] == 1


def test_source_stats_empty_text_counts_doc_not_tokens(spark):
    from hadoop_tfidf_spark.functions.text import source_stats

    docs = spark.createDataFrame(
        [(1, "", "en", "s"), (2, "w", "en", "s")],
        "doc_id BIGINT, text STRING, lang STRING, source STRING",
    )
    r = source_stats(docs).first()
    assert r["n_docs"] == 2 and r["n_tokens"] == 1 and r["vocab"] == 1


# ------------------------------------------------------------ novelty


def test_ngram_novelty_hand_computed(spark):
    """doc1/doc2 share exactly one trigram ('b c d'); doc3 is fully
    novel; doc4 is too short to have any trigram and emits no row."""
    from hadoop_tfidf_spark.functions.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),  # grams: 'a b c', 'b c d'
            (2, "b c d e"),  # grams: 'b c d', 'c d e'
            (3, "p q r"),  # gram: 'p q r'
            (4, "x y"),  # no trigram
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_grams"] == 2 and out[1]["n_shared"] == 1
    assert abs(out[1]["novelty"] - 0.5) < 1e-9
    assert out[2]["n_shared"] == 1
    assert out[3]["n_grams"] == 1 and out[3]["n_shared"] == 0
    assert abs(out[3]["novelty"] - 1.0) < 1e-9


def test_ngram_novelty_repeated_gram_in_one_doc_is_not_shared(spark):
    """A gram repeated WITHIN one doc only (distinct per doc) keeps
    df=1 — novelty is about cross-document sharing."""
    from hadoop_tfidf_spark.functions.text import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "z z z z")],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    # doc1 grams: 'a b c','b c a','c a b','a b c' -> 3 distinct, df=1 each
    assert out[1]["n_grams"] == 3 and out[1]["n_shared"] == 0
    # doc2: 'z z z' x2 -> 1 distinct
    assert out[2]["n_grams"] == 1 and out[2]["n_shared"] == 0


# ----------------------------------------------------------------- sq


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def test_sq_topk_full_candidates_equals_exact(spark):
    """With candidates >= corpus size the candidate cut keeps everyone,
    so sq_topk must equal int_l2_topk exactly (same d2_u, same order)."""
    import random

    from hadoop_tfidf_spark.operators.similarity import int_l2_topk, sq_topk

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    emb = _emb_df(spark, rows)
    q = emb.where(F.col("vec_id") < 2)
    got = sq_topk(emb, q, k=5, candidates=100, in_dim=8).collect()
    want = int_l2_topk(emb, q, k=5).collect()
    key = lambda r: (r["query_id"], r["rn"])
    got_s = sorted(((r["query_id"], r["rn"], r["vec_id"], r["d2_u"]) for r in got))
    want_s = sorted(((r["query_id"], r["rn"], r["vec_id"], r["d2_u"]) for r in want))
    assert got_s == want_s


def test_sq_topk_code_range_and_zero_corpus(spark):
    """Codes stay in [-128, 127]; an all-zero corpus (vmax clamp to 1)
    must not divide by zero."""
    from hadoop_tfidf_spark.operators.similarity import sq_topk

    emb = _emb_df(spark, [(i, [0.0] * 4) for i in range(5)])
    out = sq_topk(emb, emb.where(F.col("vec_id") == 0), k=2,
                  candidates=10, in_dim=4).collect()
    assert len(out) == 2 and all(r["d2_u"] == 0 for r in out)


def test_sq_topk_recall_reasonable_on_random(spark):
    """At a tight candidate budget the SQ cut should still recover most
    of the true top-k on random data (resolution loss, not dimension
    collision)."""
    import random

    from hadoop_tfidf_spark.operators.similarity import int_l2_topk, sq_topk

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    emb = _emb_df(spark, rows)
    q = emb.where(F.col("vec_id") < 3)
    truth = {
        (r["query_id"], r["vec_id"])
        for r in int_l2_topk(emb, q, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in sq_topk(emb, q, k=5, candidates=15, in_dim=16).collect()
    }
    assert len(got & truth) >= int(0.8 * len(truth))


# ---------------------------------------------------------------- opq


def test_opq_permutation_balances_variance(spark):
    """8 dims where dims 0-3 carry huge variance and 4-7 almost none:
    round-robin by variance rank must put exactly one hot dim in each
    of the 4 subspaces (contiguous splitting would give subspace 0 all
    four)."""
    import random

    from hadoop_tfidf_spark.operators.similarity import opq_permutation

    rng = random.Random(3)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) * 8 for _ in range(4)]
            + [rng.uniform(-1, 1) * 0.05 for _ in range(4)],
        )
        for i in range(64)
    ]
    emb = _emb_df(spark, rows)
    perm = opq_permutation(emb, m=4, in_dim=8, sample_n=64)
    assert sorted(perm) == list(range(8))
    sub = 2
    for s in range(4):
        block = perm[s * sub : (s + 1) * sub]
        assert sum(1 for d in block if d < 4) == 1, (s, perm)


def test_opq_beats_contiguous_pq_on_skewed_dims(spark):
    """On a variance-skewed corpus (first quarter of the dims 8x hot),
    OPQ's balanced subspaces should recall at least as much of the
    exact top-k as contiguous PQ, and strictly more in aggregate."""
    import random

    from hadoop_tfidf_spark.operators.similarity import (
        int_l2_topk,
        opq_topk,
        pq_build,
        pq_topk,
    )

    rng = random.Random(5)
    dim, n = 16, 150
    rows = [
        (
            i,
            [rng.uniform(-1, 1) * 8 for _ in range(dim // 4)]
            + [rng.uniform(-1, 1) for _ in range(dim - dim // 4)],
        )
        for i in range(n)
    ]
    emb = _emb_df(spark, rows)
    qids = [0, 1, 2, 3, 4]
    q = emb.where(F.col("vec_id").isin(qids))
    truth = {
        (r["query_id"], r["vec_id"])
        for r in int_l2_topk(emb, q, k=8).collect()
    }
    codes, books = pq_build(emb, m=4, k=16, iters=1, pack=True)
    pq_hits = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(emb, codes, books, qids, k=8).collect()
    }
    opq_hits = {
        (r["query_id"], r["vec_id"])
        for r in opq_topk(emb, qids, k=8, m=4, pq_k=16, iters=1,
                          in_dim=dim, sample_n=n).collect()
    }
    assert len(opq_hits & truth) > len(pq_hits & truth)


def test_opq_permutation_rejects_wrong_dim(spark):
    from hadoop_tfidf_spark.operators.similarity import opq_permutation

    emb = _emb_df(spark, [(i, [0.1] * 6) for i in range(8)])
    with pytest.raises(Exception):
        opq_permutation(emb, m=4, in_dim=8, sample_n=8)

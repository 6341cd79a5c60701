"""Round-11 hardening pins: the malformed-payload ``errors="keep"``
mode across the decode family, the ``vmax=`` precomputed calibration
path of the SQ index, and the OPQ divisibility guard."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

MEDIA_DDL = "doc_id BIGINT, payload BINARY, media_type STRING"


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


def _ppm(w: int, h: int, fill: int) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + bytes([fill]) * (w * h * 3)


# ------------------------------------------------ malformed payloads


def _poison_media(spark, good_payloads):
    """ids 1..n carry good payloads; id 99 carries garbage bytes."""
    rows = [
        (i + 1, bytearray(p), "x") for i, p in enumerate(good_payloads)
    ] + [(99, bytearray(b"\x00garbage-not-a-container"), "x")]
    return spark.createDataFrame(rows, MEDIA_DDL)


@pytest.mark.parametrize("op_name", ["decode_media", "decode_audio", "audio_energy"])
def test_decode_family_raise_mode_poison_pill(spark, op_name):
    """Default mode: one malformed payload still fails the stage —
    the strict contract the synthetic gate corpus wants."""
    import hadoop_tfidf_spark.operators.multimodal as M

    op = getattr(M, op_name)
    good = _ppm(2, 2, 7) if op_name == "decode_media" else _wav(8000, [5] * 8)
    media = _poison_media(spark, [good])
    with pytest.raises(Exception):
        op(media).collect()


@pytest.mark.parametrize("op_name", ["decode_media", "decode_audio", "audio_energy"])
def test_decode_family_keep_mode(spark, op_name):
    """errors='keep': the poison row survives with NULL features and a
    populated err string; the good rows carry values identical to the
    raise-mode output on the clean subset."""
    import hadoop_tfidf_spark.operators.multimodal as M

    op = getattr(M, op_name)
    if op_name == "decode_media":
        good = [_ppm(2, 2, 7), _ppm(3, 1, 200)]
    else:
        good = [_wav(8000, [5] * 8), _wav(4000, [30000] * 4)]
    media = _poison_media(spark, good)
    clean = media.where(F.col("doc_id") != 99)

    kept = {r["doc_id"]: r.asDict() for r in op(media, errors="keep").collect()}
    strict = {r["doc_id"]: r.asDict() for r in op(clean).collect()}

    assert set(kept) == set(strict) | {99}
    bad = kept[99]
    assert bad["err"] and "ValueError" in bad["err"]
    feature_cols = [c for c in bad if c not in ("doc_id", "err")]
    assert all(bad[c] is None for c in feature_cols)
    for doc_id, want in strict.items():
        got = kept[doc_id]
        assert got["err"] is None
        assert {k: got[k] for k in want} == want


def test_decode_family_rejects_bad_errors_mode(spark):
    from hadoop_tfidf_spark.operators.multimodal import decode_audio

    media = spark.createDataFrame([], MEDIA_DDL)
    with pytest.raises(ValueError, match="errors must be"):
        decode_audio(media, errors="ignore")


# ------------------------------------------------- SQ vmax calibration


def test_sq_topk_vmax_param_matches_derived(spark):
    """Passing the precomputed corpus scale through vmax= must produce
    the exact ranking the derive-from-data default produces."""
    from hadoop_tfidf_spark.operators.similarity import sq_topk, sq_vmax

    rows = [
        (i, [((i * 31 + d * 7) % 13 - 6) / 7.0 for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    queries = emb.where(F.col("vec_id") < 2)

    derived = sq_topk(
        emb, queries, k=5, candidates=10, units=1000, in_dim=8
    ).collect()
    vmax = sq_vmax(emb, units=1000, in_dim=8)
    passed = sq_topk(
        emb, queries, k=5, candidates=10, units=1000, in_dim=8, vmax=vmax
    ).collect()
    key = lambda r: (r["query_id"], r["rn"])
    assert sorted(map(tuple, derived)) == sorted(map(tuple, passed))
    assert len({key(r) for r in derived}) == len(derived) == 10


def test_sq_vmax_is_corpus_abs_max_in_units(spark):
    from hadoop_tfidf_spark.operators.similarity import sq_vmax

    emb = spark.createDataFrame(
        [(0, [0.5, -0.75]), (1, [0.25, 0.1])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    assert sq_vmax(emb, units=1000, in_dim=2) == 750


# ------------------------------------------------- OPQ divisibility


def test_opq_permutation_rejects_indivisible_dim(spark):
    from hadoop_tfidf_spark.operators.similarity import opq_permutation

    emb = spark.createDataFrame(
        [(0, [0.1] * 6)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        opq_permutation(emb, m=4, in_dim=6, sample_n=1)


# ------------------------------------------------- IVF-SQ8 index


def _ivfsq_emb(spark):
    rows = [
        (i, [((i * 37 + d * 11) % 17 - 8) / 9.0 for d in range(8)])
        for i in range(48)
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_ivfsq_full_probe_full_budget_equals_exact(spark):
    """With every cell probed and an uncut candidate budget, the
    two-stage IVF-SQ ranking must collapse to the exact integer-L2
    ranking (stage 1 can then only reorder candidates that stage 2
    re-ranks exactly)."""
    from hadoop_tfidf_spark.operators.similarity import (
        int_l2_topk,
        ivfsq_topk,
    )

    emb = _ivfsq_emb(spark)
    queries = emb.where(F.col("vec_id") < 2)
    exact = int_l2_topk(emb, queries, k=5, units=1000)
    got = ivfsq_topk(
        emb, [0, 1], k=5, candidates=100, nprobe=4, coarse_k=4,
        coarse_iters=1, units=1000, in_dim=8,
    )
    key = lambda r: (r["query_id"], r["rn"], r["vec_id"], r["d2_u"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exact.collect()))


def test_ivfsq_prebuilt_index_matches_internal_build(spark):
    from hadoop_tfidf_spark.operators.similarity import ivfsq_build, ivfsq_topk

    emb = _ivfsq_emb(spark)
    internal = ivfsq_topk(
        emb, [0, 1], k=5, candidates=10, nprobe=2, coarse_k=4,
        coarse_iters=1, units=1000, in_dim=8,
    ).collect()
    index, cents, vmax = ivfsq_build(
        emb, coarse_k=4, coarse_iters=1, units=1000, in_dim=8
    )
    prebuilt = ivfsq_topk(
        emb, [0, 1], k=5, candidates=10, nprobe=2, units=1000, in_dim=8,
        index=index, centroids=cents, vmax=vmax,
    ).collect()
    assert sorted(map(tuple, internal)) == sorted(map(tuple, prebuilt))


def test_ivfsq_codes_are_bytes_and_probe_bounds_scan(spark):
    """The stored index is one signed byte per component (codes in
    [-127, 127] by construction of the corpus-wide vmax), and a
    1-probe search only returns members of the probed cells."""
    from hadoop_tfidf_spark.operators.similarity import ivfsq_build, ivfsq_topk

    emb = _ivfsq_emb(spark)
    index, cents, vmax = ivfsq_build(
        emb, coarse_k=4, coarse_iters=1, units=1000, in_dim=8
    )
    rng = index.select(
        F.min(F.array_min("_sq")).alias("lo"),
        F.max(F.array_max("_sq")).alias("hi"),
    ).first()
    assert -127 <= rng["lo"] and rng["hi"] <= 127
    got = ivfsq_topk(
        emb, [0], k=5, candidates=100, nprobe=1, units=1000, in_dim=8,
        index=index, centroids=cents, vmax=vmax,
    )
    probed = {
        r["cluster"]
        for r in index.join(
            got.select("vec_id"), "vec_id", "leftsemi"
        ).select("cluster").collect()
    }
    assert len(probed) == 1


# ------------------------------------------------- binary quantization


def test_bq_pack_hand_computed(spark):
    """Pin the packed words: dims 0..7 alternating +/− micro-units →
    bits 10101010… per construction (bit j of word 0 = 1 iff u_j >= 0;
    quantized 0 counts as non-negative)."""
    from hadoop_tfidf_spark.operators.similarity import bq_build

    vec = [(0.001 if d % 2 == 0 else -0.001) for d in range(8)]
    emb = spark.createDataFrame(
        [(0, vec)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    r = bq_build(emb, units=1000, in_dim=8).first()
    want = sum(1 << j for j in range(0, 8, 2))
    assert list(r["_bq"]) == [want]


def test_bq_full_budget_equals_exact(spark):
    """With the candidate budget covering the corpus, the BQ two-stage
    ranking collapses to the exact integer-L2 ranking."""
    from hadoop_tfidf_spark.operators.similarity import bq_topk, int_l2_topk

    emb = _ivfsq_emb(spark)
    queries = emb.where(F.col("vec_id") < 2)
    exact = int_l2_topk(emb, queries, k=5, units=1000)
    got = bq_topk(emb, queries, k=5, candidates=100, units=1000, in_dim=8)
    key = lambda r: (r["query_id"], r["rn"], r["vec_id"], r["d2_u"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exact.collect()))


def test_bq_hamming_matches_python_popcount(spark):
    """Stage-1 Hamming over packed words == the per-dimension sign
    disagreement count from an independent pure-Python replay."""
    from hadoop_tfidf_spark.operators.similarity import bq_build

    emb = _ivfsq_emb(spark)
    packed = {r["vec_id"]: list(r["_bq"]) for r in
              bq_build(emb, units=1000, in_dim=8).collect()}
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def signs(v):
        return [1 if round(x * 1000) >= 0 else 0 for x in v]

    import itertools
    for a, b in itertools.islice(itertools.combinations(sorted(raw), 2), 60):
        want = sum(x != y for x, y in zip(signs(raw[a]), signs(raw[b])))
        got = sum(
            bin(wa ^ wb).count("1")
            for wa, wb in zip(packed[a], packed[b])
        )
        assert got == want


# ------------------------------------------------- hybrid RRF fusion


def test_hybrid_rrf_hand_computed(spark, tmp_path):
    """Fuse hand-built rankings through the declared query's arithmetic:
    a doc in both lists must score 1/(60+r_lex) + 1/(60+r_sem); a doc in
    one list scores its single term; ordering breaks ties by doc_id."""
    from hadoop_tfidf_spark.extensions import RRF_K

    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id STRING, doc_id BIGINT, r_lex BIGINT"
    )
    sem = spark.createDataFrame(
        [("q", 2, 1), ("q", 3, 2)], "query_id STRING, doc_id BIGINT, r_sem BIGINT"
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full").select(
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0)
            ),
            6,
        ).alias("s"),
    )
    got = {r["doc_id"]: r["s"] for r in fused.collect()}
    assert got[1] == round(1 / 61, 6)
    assert got[2] == round(1 / 62 + 1 / 61, 6)
    assert got[3] == round(1 / 62, 6)


def test_hybrid_rrf_query_shape(spark):
    """The declared query returns RRF_TOPK rows per lexical query, rnk
    dense from 1, scores non-increasing, and every row flags at least
    one source list."""
    from hadoop_tfidf_spark.extensions import (
        RRF_TOPK,
        q_search_hybrid_rrf,
    )
    from tests.conftest import SF_DIR_SMOKE

    rows = q_search_hybrid_rrf(spark, SF_DIR_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(len(v) for v in by_q.values()) == {RRF_TOPK}
    for v in by_q.values():
        v.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in v] == list(range(1, RRF_TOPK + 1))
        scores = [r["rrf_score"] for r in v]
        assert scores == sorted(scores, reverse=True)
        assert all(
            r["r_lex"] is not None or r["r_sem"] is not None for r in v
        )

"""Round-12 pins: the unified quantization-tier frontier, the
update-mode streaming governance twin, and the poisoned-corpus
``errors="keep"`` gate row (good rows byte-equal the strict decode,
the poisoned rows surface their ``err``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMOKE


# ------------------------------------------------ tier frontier


@pytest.fixture(scope="module")
def frontier_rows(spark):
    from hadoop_tfidf_spark.extensions import q_sim_tier_frontier

    return {
        r["tier"]: r
        for r in q_sim_tier_frontier(spark, SF_DIR_SMOKE).collect()
    }


def test_frontier_covers_all_six_tiers(frontier_rows):
    from hadoop_tfidf_spark.extensions import TIER_BYTES

    assert set(frontier_rows) == set(TIER_BYTES) == {
        "sq", "ivfsq", "pq", "ivfpq_res", "opq_ivfpq", "bq",
    }


def test_frontier_bytes_accounting(frontier_rows):
    """bytes/vec follows the documented accounting: 1 B/dim SQ codes,
    2 B cell ids, 4-bit PQ codes (PQ_K=16), 1 bit/dim signs."""
    from hadoop_tfidf_spark.extensions import PQ_CODE_BYTES, TIER_BYTES

    assert PQ_CODE_BYTES == 2
    assert TIER_BYTES["sq"] == 64
    assert TIER_BYTES["ivfsq"] == 66
    assert TIER_BYTES["ivfpq_res"] == TIER_BYTES["opq_ivfpq"] == 4
    assert TIER_BYTES["bq"] == 8
    for tier, row in frontier_rows.items():
        assert row["bytes_per_vec"] == TIER_BYTES[tier]


def test_frontier_recall_is_hits_over_denominator(frontier_rows):
    from hadoop_tfidf_spark.extensions import SIM_K, SIM_QUERY_IDS

    denom = SIM_K * len(SIM_QUERY_IDS)
    for row in frontier_rows.values():
        assert 0 <= row["n_hits"] <= denom
        assert row["recall"] == pytest.approx(
            round(row["n_hits"] / denom, 6)
        )


def test_frontier_sq_dominates_its_own_compressions(frontier_rows):
    """Fixture-specific ordering pin (NOT a structural invariant:
    ivfsq's residual SQ codes use a smaller vmax — finer resolution —
    than flat sq, and neither ivfsq's nor bq's stage-1 candidate set is
    a subset of sq's c50 re-rank set, so sq >= ivfsq/bq recall is only
    empirical). On THIS corpus flat SQ8's full-corpus 8-bit re-rank is
    the frontier ceiling; a regression here means a tier chain changed
    behaviour, not that the maths broke."""
    sq = frontier_rows["sq"]["recall"]
    for tier in ("ivfsq", "bq"):
        assert frontier_rows[tier]["recall"] <= sq


# ------------------------------------------------ audio keep gate row


def test_audio_keep_good_rows_match_strict_decode(spark):
    """errors="keep" over the poisoned corpus: non-poisoned rows carry
    EXACTLY the strict decode's features (same values, err NULL)."""
    from hadoop_tfidf_spark.extensions import (
        AUDIO_POISON_MOD,
        AUDIO_POISON_RES,
        q_multimodal_audio_decode,
        q_multimodal_audio_keep,
    )

    keep = {
        r["doc_id"]: r
        for r in q_multimodal_audio_keep(spark, SF_DIR_SMOKE).collect()
    }
    strict = {
        r["doc_id"]: r
        for r in q_multimodal_audio_decode(spark, SF_DIR_SMOKE).collect()
    }
    assert set(keep) == set(strict)
    cols = ["n_bytes", "sample_rate", "n_samples", "sum_samples", "sum_abs"]
    n_bad = 0
    for doc_id, row in keep.items():
        if doc_id % AUDIO_POISON_MOD == AUDIO_POISON_RES:
            n_bad += 1
            assert all(row[c] is None for c in cols)
            assert row["err"] == "ValueError: bad RIFF/WAVE magic"
        else:
            assert row["err"] is None
            assert [row[c] for c in cols] == [strict[doc_id][c] for c in cols]
    assert n_bad >= 1


def test_audio_poisoned_corpus_fails_strict_mode(spark):
    """The same truncation under the default errors="raise" poisons the
    stage — the contrast the keep row exists to fix."""
    from hadoop_tfidf_spark.extensions import (
        AUDIO_POISON_BYTES,
        AUDIO_POISON_MOD,
        AUDIO_POISON_RES,
        _docs,
    )
    from hadoop_tfidf_spark.operators.multimodal import (
        decode_audio,
        with_audio_payload,
    )

    media = with_audio_payload(_docs(spark, SF_DIR_SMOKE))
    poisoned = media.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % AUDIO_POISON_MOD == AUDIO_POISON_RES,
            F.expr(f"substring(payload, 1, {AUDIO_POISON_BYTES})"),
        ).otherwise(F.col("payload")),
    )
    with pytest.raises(Exception):
        decode_audio(poisoned).collect()


# ------------------------------------------------ update-mode governance


def test_update_twin_equals_batch_rollup(spark):
    """Upsert-reconstructed final state == the batch per-source
    roll-up computed directly on the table."""
    from hadoop_tfidf_spark.extensions import (
        q_streaming_source_stats_update,
    )

    got = {
        r["source"]: r
        for r in q_streaming_source_stats_update(
            spark, SF_DIR_SMOKE
        ).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    want = {
        r["source"]: r
        for r in (
            docs.groupBy("source", "lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.size(words)).alias("n_tokens"),
            )
            .groupBy("source")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                F.round(F.sum("n_tokens") / F.sum("n_docs"), 6).alias(
                    "avg_tokens"
                ),
                F.count("*").cast("bigint").alias("n_langs"),
            )
            .collect()
        )
    }
    assert set(got) == set(want)
    for src in got:
        for c in ("n_docs", "n_tokens", "avg_tokens", "n_langs"):
            assert got[src][c] == want[src][c], (src, c)


# ------------------------------------------------ streaming round-12 twins


def test_phash_update_twin_equals_batch_groups(spark):
    """Update-mode upsert reconstruction == the batch phash groups."""
    from hadoop_tfidf_spark.extensions import (
        q_streaming_phash_dedup_update,
    )
    from hadoop_tfidf_spark.operators.multimodal import (
        media_phash,
        with_binary_payload,
    )

    got = {
        r["phash"]: (r["n_docs"], r["keep_doc_id"])
        for r in q_streaming_phash_dedup_update(
            spark, SF_DIR_SMOKE
        ).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    want = {
        r["phash"]: (r["n_docs"], r["keep_doc_id"])
        for r in (
            media_phash(with_binary_payload(docs.select("doc_id", "text")))
            .groupBy("phash")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            )
            .collect()
        )
    }
    assert got == want


def test_streaming_knn_equals_batch_search(spark):
    """Answering streamed queries against the static prebuilt BQ index
    == answering them all at rest."""
    from hadoop_tfidf_spark.extensions import (
        IVF_UNITS,
        RP_TOPK_CANDIDATES,
        SIM_K,
        SIM_QUERY_IDS,
        q_streaming_knn_bq,
    )
    from hadoop_tfidf_spark.operators.similarity import bq_topk

    got = sorted(
        tuple(r) for r in q_streaming_knn_bq(spark, SF_DIR_SMOKE).collect()
    )
    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet")
    queries = emb.where(F.col("vec_id").isin(SIM_QUERY_IDS))
    want = sorted(
        tuple(r)
        for r in bq_topk(
            emb, queries, k=SIM_K, candidates=RP_TOPK_CANDIDATES,
            units=IVF_UNITS, in_dim=64,
        )
        .select("query_id", "vec_id", "d2_u", "rn")
        .collect()
    )
    assert got == want


# ------------------------------------- adaptive quality + trained-tier ingest


def test_quality_adaptive_per_source_cutoffs(spark):
    """Kept set per source is exactly the top ceil(q·n) by
    (quality desc, doc_id) — counts and boundary both pinned."""
    import math

    from hadoop_tfidf_spark.extensions import (
        QUALITY_TOP_FRAC,
        _tbl,
        q_text_quality_adaptive,
    )
    from hadoop_tfidf_spark.functions.text import quality_score

    kept = q_text_quality_adaptive(spark, SF_DIR_SMOKE).collect()
    docs = _tbl(spark, SF_DIR_SMOKE, "documents")
    n_by_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    from collections import Counter

    kept_by_source = Counter(r["source"] for r in kept)
    for src, n in n_by_source.items():
        assert kept_by_source[src] == math.ceil(QUALITY_TOP_FRAC * n), src
    # boundary: every kept quality >= every dropped quality per source
    q = {
        r["doc_id"]: r["quality"]
        for r in quality_score(
            spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
        ).collect()
    }
    src_of = {r["doc_id"]: r["source"] for r in docs.collect()}
    kept_ids = {r["doc_id"] for r in kept}
    for source in n_by_source:
        kept_q = [q[d] for d in kept_ids if src_of[d] == source]
        dropped_q = [
            q[d]
            for d in src_of
            if src_of[d] == source and d not in kept_ids
        ]
        if kept_q and dropped_q:
            assert min(kept_q) >= max(dropped_q), source


def test_streaming_ivfsq_encode_equals_batch_build(spark):
    """The stateless prebuilt-index encode over the stream reproduces
    the batch build's index byte for byte (cluster + full code md5)."""
    from pyspark.sql import functions as SF

    from hadoop_tfidf_spark.extensions import (
        IVF_ITERS,
        IVF_K,
        IVF_UNITS,
        q_streaming_ivfsq_index,
    )
    from hadoop_tfidf_spark.operators.similarity import ivfsq_build

    got = {
        r["vec_id"]: (r["cluster"], r["sq_md5"])
        for r in q_streaming_ivfsq_index(spark, SF_DIR_SMOKE).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet")
    index, _, _ = ivfsq_build(
        emb, coarse_k=IVF_K, coarse_iters=IVF_ITERS,
        units=IVF_UNITS, in_dim=64,
    )
    want = {
        r["vec_id"]: (r["cluster"], r["sq_md5"])
        for r in index.select(
            "vec_id",
            SF.col("cluster").cast("bigint").alias("cluster"),
            SF.md5(
                SF.concat_ws(
                    ",", SF.transform(SF.col("_sq"), lambda x: x.cast("string"))
                ).cast("binary")
            ).alias("sq_md5"),
        ).collect()
    }
    assert got == want

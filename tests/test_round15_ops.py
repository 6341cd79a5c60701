"""Round-15 pins: ledger read/guard hardening (local-path assertion,
race-free generation snapshots), self-describing Bloom bitmaps (hash
tag), and ivfpq_topk query-source exclusivity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# ------------------------------------------------ ledger local-path guard


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k STRING, n BIGINT")


def test_ledger_verbs_refuse_remote_uris(spark, tmp_path):
    """The replay-vs-compaction guards probe the LOCAL filesystem; on an
    hdfs://, s3a://, or even file:// sink they would silently never fire
    — a replayed batch could overwrite a compacted base. Every verb that
    relies on those probes must fail loudly at entry instead."""
    from hadoop_tfidf_spark.streaming.ledger import (
        compact_ledger,
        ledger_upsert,
        read_ledger,
    )

    for uri in ("hdfs://nn/ledger", "s3a://bucket/ledger", "file:///x/y"):
        with pytest.raises(ValueError, match="scheme"):
            ledger_upsert(uri)
        with pytest.raises(ValueError, match="scheme"):
            read_ledger(spark, uri)
        with pytest.raises(ValueError, match="scheme"):
            compact_ledger(spark, uri, ["k"], through=0)
    # plain local paths are untouched
    sink = str(tmp_path / "ledger")
    ledger_upsert(sink)(_mk(spark, [("a", 1)]), 0)
    assert read_ledger(spark, sink).count() == 1


def test_read_ledger_snapshot_is_race_stable(spark, tmp_path, monkeypatch):
    """The TOCTOU fix: a compaction's first trash-rename landing between
    the partial-swap assertion and the generation glob must not let a
    reader silently reconstruct partial state. The snapshot re-globs
    after listing and retries on churn — and gives up LOUDLY (never
    silently partial) if the set never settles."""
    from hadoop_tfidf_spark.streaming import ledger as L

    sink = str(tmp_path / "ledger")
    up = L.ledger_upsert(sink)
    for b in range(3):
        up(_mk(spark, [("a", b)]), b)

    # stable directory: snapshot returns the true list first try
    assert L._stable_generations(sink) == [0, 1, 2]

    # churning directory: every listing differs from the last → the
    # reader must raise rather than return a maybe-partial list
    calls = {"n": 0}
    real = L.ledger_generations

    def churning(s):
        calls["n"] += 1
        return real(s)[: 1 + calls["n"] % 2]

    monkeypatch.setattr(L, "ledger_generations", churning)
    with pytest.raises(RuntimeError, match="changing"):
        L._stable_generations(sink)


def test_read_ledger_still_blocks_mid_swap(spark, tmp_path):
    """The genuinely partial window (tmp + trash coexisting) still fails
    loudly through the new snapshot path."""
    from hadoop_tfidf_spark.streaming.ledger import ledger_upsert, read_ledger

    sink = str(tmp_path / "ledger")
    up = ledger_upsert(sink)
    for b in range(2):
        up(_mk(spark, [("a", b)]), b)
    (tmp_path / "ledger" / "_compact_tmp_through=1").mkdir()
    (tmp_path / "ledger" / "_trash_batch_id=0").mkdir()
    with pytest.raises(RuntimeError, match="mid-compaction"):
        read_ledger(spark, sink)


# ------------------------------------------------ Bloom hash self-description


def _bench(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i}") for i in range(30)],
        "doc_id BIGINT, text STRING",
    )


def test_bloom_bitmap_carries_its_hash_count(spark):
    """A prebuilt bitmap self-describes BOTH geometry numbers: bits from
    the word count and hashes from the trailing sentinel. A probe with
    no hashes= adopts the build's value; an explicit contradicting value
    raises instead of silently breaking the no-false-negative rule."""
    from hadoop_tfidf_spark.functions.text import (
        bloom_bitmap,
        bloom_geometry,
        contamination_bloom,
        contamination_bloom_stateless,
        decontaminate_bloom,
    )

    bench = _bench(spark)
    bits, hashes = bloom_geometry(500, bits_per_key=10)
    assert hashes != 4  # the default — the tag must do real work here
    bm = bloom_bitmap(bench, k=3, bits=bits, hashes=hashes)
    assert bm[-1] == -hashes  # the tag

    # hashes omitted == hashes explicit (the tag supplies it)
    tagged = sorted(
        map(tuple, contamination_bloom_stateless(bench, bm, k=3).collect())
    )
    explicit = sorted(
        map(
            tuple,
            contamination_bloom_stateless(bench, bm, k=3, hashes=hashes).collect(),
        )
    )
    assert tagged == explicit
    # every bench doc must self-hit (no false negative possible)
    assert all(r[2] == r[1] for r in tagged)  # n_hits == n_shingles

    # the aggregate probe form adopts the tag the same way
    agg = sorted(
        map(tuple, contamination_bloom(bench, bitmap=bm, k=3).collect())
    )
    assert all(r[2] == r[1] for r in agg)

    # a contradicting explicit value is the silent-loss case — loud now
    for fn in (
        lambda: contamination_bloom_stateless(bench, bm, k=3, hashes=hashes + 1),
        lambda: contamination_bloom(bench, bitmap=bm, k=3, hashes=hashes + 1),
        lambda: decontaminate_bloom(bench, bitmap=bm, k=3, hashes=hashes + 1),
    ):
        with pytest.raises(ValueError, match="built with hashes"):
            fn()


def test_bloom_untagged_bitmap_stays_probeable(spark):
    """Legacy untagged word lists (all lanes >= 0) keep working with the
    default geometry, so stored filters from before the tag don't brick."""
    from hadoop_tfidf_spark.functions.text import (
        BLOOM_HASHES,
        bloom_bitmap,
        contamination_bloom_stateless,
    )

    bench = _bench(spark)
    tagged = bloom_bitmap(bench, k=3)  # default geometry, tag == -4
    assert tagged[-1] == -BLOOM_HASHES
    legacy = tagged[:-1]  # what a pre-tag caller would have stored
    a = sorted(
        map(tuple, contamination_bloom_stateless(bench, tagged, k=3).collect())
    )
    b = sorted(
        map(tuple, contamination_bloom_stateless(bench, legacy, k=3).collect())
    )
    assert a == b


# ------------------------------------------------ ivfpq query-source guard


def test_ivfpq_topk_rejects_both_query_sources(spark):
    """query_ids= and queries= are alternative query sets; passing both
    used to silently drop query_ids (the relation path won), which can
    mask a call-site bug — it must raise, mirroring the neither-given
    check."""
    from hadoop_tfidf_spark.operators.similarity import (
        ivf_build,
        ivfpq_topk,
        pq_build,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), float(i % 3), float(i % 2)])
         for i in range(40)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    assigned, centroids = ivf_build(emb, k=2, iters=1)
    codes, codebooks = pq_build(emb, m=2, k=4, iters=1)
    with pytest.raises(ValueError, match="not both"):
        ivfpq_topk(
            assigned, centroids, codes, codebooks,
            query_ids=[0, 1], queries=emb.limit(2), nprobe=1, k=3,
        )

"""Incremental LSH dedup index: batch-partition equivalence with the
one-shot operator, replay idempotence, and crash recovery."""

from __future__ import annotations

from hadoop_tfidf_spark.operators.dedup import minhash_lsh_dedup
from hadoop_tfidf_spark.streaming.dedup import IncrementalLshIndex

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = BASE.replace("afternoon", "evening")
OTHER = (
    "completely different subject matter about distributed query engines "
    "and columnar storage formats for analytical workloads"
)
OTHER_NEAR = OTHER.replace("analytical", "transactional")


def _corpus(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER), (5, OTHER_NEAR), (6, "x y z")],
        ["doc_id", "text"],
    )


def _pairs_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_incremental_equals_batch_lsh(spark, tmp_path):
    """Any batch partition of the corpus yields exactly the one-shot
    pairs: cross-batch near-dups surface via the new-vs-old index join,
    same-batch ones via the self-join."""
    docs = _corpus(spark)
    expected = _pairs_set(minhash_lsh_dedup(docs))
    assert expected  # planted dups must actually pair

    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    # split so that near-dup pairs straddle batches: (1,4) | (2,5) | (3,6)
    for bid, ids in enumerate([(1, 4), (2, 5), (3, 6)]):
        idx.merge_batch(docs.where(docs.doc_id.isin(*ids)), bid)
    assert _pairs_set(idx.candidate_pairs()) == expected


def test_replayed_batch_is_noop(spark, tmp_path):
    docs = _corpus(spark)
    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    idx.merge_batch(docs.where(docs.doc_id.isin(1, 2)), 0)
    before = _pairs_set(idx.candidate_pairs())
    idx.merge_batch(docs.where(docs.doc_id.isin(1, 2)), 0)  # at-least-once replay
    assert _pairs_set(idx.candidate_pairs()) == before
    assert len(idx._committed_batches()) == 1


def test_crash_before_commit_is_recoverable(spark, tmp_path):
    """A staging dir without the commit rename is invisible to readers and
    does not block the re-run."""
    docs = _corpus(spark)
    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    idx.merge_batch(docs.where(docs.doc_id.isin(1, 2)), 0)
    # simulate a crash: a staging dir for batch 1 exists, never renamed
    staged = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    (tmp_path / "idx" / "_staging_1").mkdir()
    assert len(idx._committed_batches()) == 1  # staging not visible
    staged.merge_batch(docs.where(docs.doc_id.isin(3,)), 1)
    assert len(idx._committed_batches()) == 2


def test_streaming_attach_drains(spark, tmp_path):
    """End-to-end through readStream + foreachBatch with availableNow."""
    docs = _corpus(spark)
    src = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    idx.attach(stream).awaitTermination()
    assert _pairs_set(idx.candidate_pairs()) == _pairs_set(minhash_lsh_dedup(docs))


def test_orphaned_staging_from_other_batch_is_swept(spark, tmp_path):
    """A _staging_* dir from a crashed batch that is NEVER replayed (job
    restarted with a fresh checkpoint → new epoch ids) must be cleaned
    by a later merge, not accumulate forever."""
    docs = _corpus(spark)
    idx = IncrementalLshIndex(spark, str(tmp_path / "idx"))
    idx.merge_batch(docs.where(docs.doc_id.isin(1, 2)), 0)
    orphan = tmp_path / "idx" / "_staging_99"
    (orphan / "bands").mkdir(parents=True)
    idx.merge_batch(docs.where(docs.doc_id.isin(3, 4)), 1)
    names = [p.name for p in (tmp_path / "idx").iterdir()]
    assert "_staging_99" not in names
    assert "batch=0" in names and "batch=1" in names

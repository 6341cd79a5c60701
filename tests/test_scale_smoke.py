"""Scale smoke: the heavy operators on an 8x-replicated sf0.01 corpus
(≈4k docs → 32k docs with distinct ids). Not a benchmark — asserts the
operators COMPLETE at a larger scale with sane output cardinalities, and
that nothing explodes combinatorially (the LSH self-join must stay
bounded by real near-dup clusters even when every doc suddenly has 8
exact replicas ... which is exactly the boilerplate-megacluster stress
the bucket cap exists for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_tfidf_spark.corpus import load_docs, rebalance_scan
from hadoop_tfidf_spark.functions.text import fingerprint
from hadoop_tfidf_spark.operators import dedup as D
from hadoop_tfidf_spark.tfidf import tfidf

REPLICAS = 8
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def big_docs(spark):
    base = load_docs(spark, f"{SF_DIR}/documents.parquet")
    n = base.count()
    parts = [
        base.select((F.col("doc_id") + F.lit(i * 10 * n)).alias("doc_id"), "text")
        for i in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return rebalance_scan(out, spark).persist()


def test_tfidf_scales(spark, big_docs):
    """df counts every replica; vocabulary is unchanged."""
    base = tfidf(load_docs(spark, f"{SF_DIR}/documents.parquet"), tokenizer_pattern=" ")
    big = tfidf(big_docs, tokenizer_pattern=" ")
    base_vocab = base.select("word").distinct().count()
    assert big.select("word").distinct().count() == base_vocab
    # every (word, doc) row exists once per replica
    assert big.count() == REPLICAS * base.count()


def test_exact_dedup_collapses_replicas(spark, big_docs):
    groups = D.exact_dedup(big_docs)
    # replication multiplies dup_count by 8, never the group count
    base_groups = D.exact_dedup(
        load_docs(spark, f"{SF_DIR}/documents.parquet")
    ).count()
    assert groups.count() == base_groups
    assert groups.agg(F.min("dup_count")).collect()[0][0] >= REPLICAS


def test_lsh_megacluster_cap_bounds_fanout(spark, big_docs):
    """Every doc now sits in an 8-replica bucket: uncapped pair count is
    ≥ C(8,2)=28 per base doc; the cap keeps candidate generation bounded
    (the 100 TB survival property) while exact-dup handling is the
    documented pre-pass for megaclusters."""
    bands = D.lsh_bands(D.minhash_signatures(D.shingles(big_docs, k=3)))
    capped = D.lsh_candidate_pairs(bands, max_bucket_size=4).count()
    assert capped == 0  # every bucket ≥ 8 members → all dropped by the cap


def test_fingerprint_zero_shuffle_at_scale(spark, big_docs):
    out = fingerprint(big_docs)
    assert out.count() > 0
    # narrow plan: output partitioning == input partitioning
    assert out.rdd.getNumPartitions() == big_docs.rdd.getNumPartitions()

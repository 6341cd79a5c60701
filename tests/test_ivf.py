"""IVF (coarse-quantized ANN) tests: assignment sanity and recall vs the
brute-force baseline on the real embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_tfidf_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(emb):
    return ivf_build(emb, k=8, iters=2)


def test_assignment_covers_corpus(emb, index):
    assigned, cents = index
    assert assigned.count() == emb.count()
    assert len(cents) == 8
    clusters = {r.cluster for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(8))
    assert len(clusters) > 1  # corpus actually spreads over clusters


def test_ivf_recall_vs_brute(spark, emb, index):
    assigned, cents = index
    queries = emb.where(F.col("vec_id") < 5)
    brute = brute_force_topk(emb, queries, k=10)
    ivf = ivf_topk(assigned, cents, queries, k=10, nprobe=4)
    b = {(r.query_id, r.vec_id) for r in brute.collect()}
    a = {(r.query_id, r.vec_id) for r in ivf.collect()}
    recall = len(a & b) / len(b)
    # nprobe=4 of 8 clusters: recall must beat random cluster coverage
    assert recall >= 0.5, recall
    # every IVF result must be a real vector with a sane rank
    assert all(rn >= 1 for _, rn in ((r.query_id, r.rn) for r in ivf.collect()))

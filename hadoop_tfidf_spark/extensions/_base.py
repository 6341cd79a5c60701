"""Shared gate fixtures/loaders for the extension queries.

Split from the original single-module ``extensions.py`` (round 15) with
block text preserved verbatim; see the package ``__init__`` for the
registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from hadoop_tfidf_spark.corpus import load_docs



def _docs(spark: SparkSession, sf_dir: str, rebalance: bool = False) -> DataFrame:
    """``rebalance=True`` for md5-per-shingle CPU-bound operators (MinHash,
    Jaccard, fingerprint): spreads an under-partitioned scan across cores
    (no-op on a well-split cluster read — see ``corpus.rebalance_scan``)."""
    return load_docs(spark, f"{sf_dir}/documents.parquet", rebalance=rebalance)


def _emb(spark: SparkSession, sf_dir: str, rebalance: bool = False) -> DataFrame:
    """``rebalance=True`` applies :func:`corpus.rebalance_scan` — opt in
    for the CPU-bound vector operators (per-pair dot/L2 scoring, per-row
    quantize+encode/centroid-argmin projections): the gate/bench corpus
    arrives as ONE unsplittable parquet row group, so without it every
    narrow vector stage (and the build side of each broadcast candidate
    join, which runs at the scan's parallelism) is pinned to a single
    core. No-op on a well-partitioned cluster read (see rebalance_scan);
    the census tracks the round-robin exchange separately from semantic
    shuffles (plans.inspect.PlanStats.rebalance_exchanges)."""
    from hadoop_tfidf_spark.corpus import rebalance_scan

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return rebalance_scan(df, spark) if rebalance else df


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

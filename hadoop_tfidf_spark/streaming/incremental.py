"""Incremental TF-IDF statistics maintenance — SURVEY.md §7 step 6: the
streaming form of document frequency kept in a persistent stats table via
``foreachBatch`` micro-batch upsert.

Each micro-batch of new documents contributes its per-word distinct-doc
counts; the merge aggregates them into the running ``(word, df)`` table
plus a 1-row ``(num_docs, last_batch_id)`` side table, from which idf is
derivable at query time — so TF-IDF scoring stays current without
recomputing the corpus.

Storage: plain parquet with read-merge-overwrite per batch (atomic-rename
semantics are the lakehouse layer's job — on a cluster this merge is one
``MERGE INTO`` against Delta/Iceberg with identical dataflow; the
read-merge-write here keeps the container dependency-free). State volume
is |vocabulary| rows, not corpus-sized, so the merge stays cheap at any
corpus scale.

Failure semantics under foreachBatch's at-least-once contract: the meta
table records the last applied ``batch_id``; a batch replayed after a
crash between the state write and the checkpoint commit is detected and
skipped, so df/num_docs are never double-counted. First-run missing-path
reads are the ONLY errors treated as empty state — transient I/O or
corrupt-footer errors propagate instead of silently zeroing the
accumulated stats.
"""

from __future__ import annotations

import shutil

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _is_missing_path(e: AnalysisException) -> bool:
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


class IncrementalTfidfStats:
    """Maintains ``{stats_dir}/df`` (word, df) and ``{stats_dir}/meta``
    (num_docs, last_batch_id) under a stream of new documents."""

    def __init__(self, spark: SparkSession, stats_dir: str) -> None:
        self.spark = spark
        self.stats_dir = stats_dir

    # -- state access ------------------------------------------------------
    def df_table(self) -> DataFrame:
        try:
            return self.spark.read.parquet(f"{self.stats_dir}/df")
        except AnalysisException as e:
            # only the first-run missing-path case means "empty state";
            # any other read failure must surface, not reset the stats
            if _is_missing_path(e):
                return self.spark.createDataFrame([], "word STRING, df BIGINT")
            raise

    def _meta(self) -> tuple[int, int]:
        """(num_docs, last_batch_id); (0, -1) on first run."""
        try:
            rows = self.spark.read.parquet(f"{self.stats_dir}/meta").collect()
        except AnalysisException as e:
            if _is_missing_path(e):
                return 0, -1
            raise
        if not rows:
            return 0, -1
        r = rows[0]
        return int(r.num_docs), int(r.last_batch_id)

    def num_docs(self) -> int:
        return self._meta()[0]

    def last_batch_id(self) -> int:
        return self._meta()[1]

    # -- merge -------------------------------------------------------------
    def merge_batch(self, docs_batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body: fold one micro-batch of (doc_id, text) into
        the stats tables. Idempotent under at-least-once replay: a
        ``batch_id`` at or below the recorded ``last_batch_id`` (a replay
        of a batch whose state write completed but whose checkpoint commit
        did not) is skipped."""
        total, last_applied = self._meta()
        if batch_id <= last_applied:
            return
        delta = (
            docs_batch.select(
                "doc_id", F.explode(F.split("text", " ")).alias("word")
            )
            .where(F.col("word") != "")
            .dropDuplicates(["doc_id", "word"])
            .groupBy("word")
            .agg(F.count("*").alias("df"))
        )
        merged = (
            self.df_table()
            .unionByName(delta)
            .groupBy("word")
            .agg(F.sum("df").cast("bigint").alias("df"))
        )
        n_new = docs_batch.select("doc_id").distinct().count()
        total += n_new
        # overwrite via temp-then-replace: the read above materialized into
        # the plan, but parquet overwrite of the path being read is unsafe;
        # stage to a sibling and swap, then drop the staging dir
        tmp = f"{self.stats_dir}/df_tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(f"{self.stats_dir}/df")
        self.spark.createDataFrame(
            [(total, batch_id)], "num_docs BIGINT, last_batch_id BIGINT"
        ).write.mode("overwrite").parquet(f"{self.stats_dir}/meta")
        shutil.rmtree(tmp.removeprefix("file:"), ignore_errors=True)

    # -- wiring ------------------------------------------------------------
    def attach(self, doc_stream: DataFrame):
        """Attach to a streaming (doc_id, text) DataFrame; returns the
        started StreamingQuery (caller owns termination)."""
        return (
            doc_stream.writeStream.foreachBatch(
                lambda batch, bid: self.merge_batch(batch, bid)
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{self.stats_dir}/_checkpoint")
            .start()
        )

    # -- derived -----------------------------------------------------------
    def idf(self) -> DataFrame:
        """Current idf per word from the maintained stats (reference
        integer-division form, TFIDF.java:163)."""
        n = self.num_docs()
        return self.df_table().select(
            "word",
            F.log10(F.lit(1.0) + F.floor(F.lit(n) / F.col("df"))).alias("idf"),
        )

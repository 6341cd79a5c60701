"""Incremental TF-IDF statistics maintenance — SURVEY.md §7 step 6: the
streaming form of document frequency kept in a persistent stats table via
``foreachBatch`` micro-batch upsert.

Each micro-batch of new documents contributes its per-word distinct-doc
counts; the merge aggregates them into the running ``(word, df)`` table
plus a 1-row ``(num_docs)`` side table, from which idf is derivable at
query time — so TF-IDF scoring stays current without recomputing the
corpus.

Storage: plain parquet with read-merge-overwrite per batch (atomic-rename
semantics are the lakehouse layer's job — on a cluster this merge is one
``MERGE INTO`` against Delta/Iceberg with identical dataflow; the
read-merge-write here keeps the container dependency-free). State volume
is |vocabulary| rows, not corpus-sized, so the merge stays cheap at any
corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalTfidfStats:
    """Maintains ``{stats_dir}/df`` (word, df) and ``{stats_dir}/meta``
    (num_docs) under a stream of new documents."""

    def __init__(self, spark: SparkSession, stats_dir: str) -> None:
        self.spark = spark
        self.stats_dir = stats_dir

    # -- state access ------------------------------------------------------
    def df_table(self) -> DataFrame:
        try:
            return self.spark.read.parquet(f"{self.stats_dir}/df")
        except Exception:
            return self.spark.createDataFrame([], "word STRING, df BIGINT")

    def num_docs(self) -> int:
        try:
            row = self.spark.read.parquet(f"{self.stats_dir}/meta").collect()
            return int(row[0].num_docs) if row else 0
        except Exception:
            return 0

    # -- merge -------------------------------------------------------------
    def merge_batch(self, docs_batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch body: fold one micro-batch of (doc_id, text) into
        the stats tables. Idempotence across retries comes from the
        lakehouse MERGE in production; here batches are applied once."""
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
        total = self.num_docs() + n_new
        # overwrite via temp-then-replace: the read above materialized into
        # the plan, but parquet overwrite of the path being read is unsafe;
        # stage to a sibling and swap
        tmp = f"{self.stats_dir}/df_tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(f"{self.stats_dir}/df")
        self.spark.createDataFrame([(total,)], "num_docs BIGINT").write.mode(
            "overwrite"
        ).parquet(f"{self.stats_dir}/meta")

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

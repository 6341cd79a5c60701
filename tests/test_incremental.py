"""Incremental TF-IDF stats: streaming 3 micro-batches of documents must
produce exactly the stats a batch pass over the full corpus produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_tfidf_spark.corpus import tokenize
from hadoop_tfidf_spark.streaming.incremental import IncrementalTfidfStats
from hadoop_tfidf_spark.tfidf import doc_frequency, doc_word_count

BATCHES = [
    [(1, "a b c"), (2, "a b")],
    [(3, "a d")],
    [(4, "b d e"), (5, "a")],
]


def test_incremental_matches_batch(spark, tmp_path):
    stats = IncrementalTfidfStats(spark, str(tmp_path / "stats"))
    src = str(tmp_path / "docs_src")
    for i, batch in enumerate(BATCHES):
        spark.createDataFrame(batch, ["doc_id", "text"]).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stats.attach(stream)
    q.awaitTermination()

    all_docs = spark.createDataFrame(
        [r for b in BATCHES for r in b], ["doc_id", "text"]
    )
    want = {
        r.word: r.df
        for r in doc_frequency(doc_word_count(tokenize(all_docs, " "))).collect()
    }
    got = {r.word: r.df for r in stats.df_table().collect()}
    assert got == want
    assert stats.num_docs() == 5

    idf = {r.word: r.idf for r in stats.idf().collect()}
    import math
    assert idf["a"] == pytest.approx(math.log10(1 + 5 // 4))  # df(a)=4
    assert idf["e"] == pytest.approx(math.log10(1 + 5 // 1))  # df(e)=1

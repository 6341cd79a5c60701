"""SQL query surface: register the testdata tables and the engine's
derived TF-IDF relations as temp views so everything is queryable with
``spark.sql`` (the reference has no SQL surface at all — its queries are
hardcoded job chains, SURVEY.md §3).

The derived views are LAZY — ``tfidf`` as a view re-plans per query, so
Catalyst can push query-specific predicates (e.g. ``WHERE word = 'x'``)
below the aggregations where legal. Register once per session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create temp views: every raw table, the normalized ``events`` (nano
    timestamps handled), and derived ``tokens``/``doc_word_count``/
    ``term_frequency``/``doc_frequency``/``tfidf``."""
    from hadoop_tfidf_spark.corpus import SPACE_TOKEN_PATTERN, load_docs, tokenize
    from hadoop_tfidf_spark.sources.events import load_events
    from hadoop_tfidf_spark.tfidf import (
        doc_frequency,
        doc_word_count,
        term_frequency,
        tfidf,
    )

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    load_events(spark, sf_dir).createOrReplaceTempView("events")

    docs = load_docs(spark, f"{sf_dir}/documents.parquet")
    tokens = tokenize(docs, SPACE_TOKEN_PATTERN)
    tokens.createOrReplaceTempView("tokens")
    dwc = doc_word_count(tokens)
    dwc.createOrReplaceTempView("doc_word_count")
    term_frequency(dwc).createOrReplaceTempView("term_frequency")
    doc_frequency(dwc).createOrReplaceTempView("doc_frequency")
    tfidf(docs, tokens=tokens).createOrReplaceTempView("tfidf")

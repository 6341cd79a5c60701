"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship full pipeline (docs → tfidf → search → rank)
on sf0.001. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2 plus the LLM-pipeline extension operators; the
driver runs both sides at sf0.01 and hash-compares.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full docs → tfidf →
    search → rank pipeline (reference Rank.main, 4 MR jobs → one lazy
    Spark plan)."""
    from hadoop_tfidf_spark.declared import q_rank

    return q_rank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from hadoop_tfidf_spark.declared import CORE_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(CORE_QUERIES)
    try:
        from hadoop_tfidf_spark.extensions import EXTENSION_QUERIES

        out.update(EXTENSION_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (omitted ⇒ rows-only)."""
    from hadoop_tfidf_spark.declared import CORE_ORACLE_SQL

    out: dict[str, str] = {}
    out.update(CORE_ORACLE_SQL)
    try:
        from hadoop_tfidf_spark.extensions import EXTENSION_ORACLE_SQL

        out.update(EXTENSION_ORACLE_SQL)
    except ImportError:
        pass
    return out

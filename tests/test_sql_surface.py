"""SQL surface tests: the registered views answer pure-SQL queries and
agree with the DataFrame API results."""

from __future__ import annotations

import pytest

from hadoop_tfidf_spark.sql import register_views
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF_DIR_SMOKE)


def test_sql_tfidf_matches_api(spark):
    import __spark_entry__ as e

    api = e.queries()["tfidf"](spark, SF_DIR_SMOKE)
    sql = spark.sql(
        "SELECT word, doc_id, round(tfidf, 6) AS tfidf FROM tfidf"
    )
    a = {(r.word, r.doc_id, r.tfidf) for r in api.collect()}
    s = {(r.word, r.doc_id, r.tfidf) for r in sql.collect()}
    assert a == s


def test_sql_search_composes(spark):
    """A user can express the whole search pipeline in one SQL statement
    over the registered views."""
    rows = spark.sql(
        """
        SELECT doc_id, round(sum(tfidf), 6) AS score
        FROM tfidf WHERE word IN ('data', 'table')
        GROUP BY doc_id ORDER BY score DESC LIMIT 5
        """
    ).collect()
    assert len(rows) > 0
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_sql_predicate_pushes_below_aggregation(spark):
    """WHERE word = 'x' on the tfidf view must prune the tf branch's
    aggregation to that word (partial filter pushdown through the plan)."""
    plan = spark.sql(
        "SELECT * FROM tfidf WHERE word = 'data'"
    )._jdf.queryExecution().optimizedPlan().toString()
    # the filter must appear below the final join in the optimized plan —
    # i.e. at least one scan-adjacent Filter mentions the literal
    assert "data" in plan
    assert plan.index("Join") < plan.rindex("data")


def test_sql_events_view_normalized(spark):
    row = spark.sql(
        "SELECT count(*) AS n, min(ts_ns) AS lo FROM events"
    ).collect()[0]
    assert row.n == 1000 and row.lo > 0

"""applyInPandasWithState operator test: state must survive across
micro-batches (the source feeds one file per trigger), and the final
per-user totals must equal the batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_tfidf_spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def multi_batch_dir(spark, tmp_path_factory):
    """Three separate parquet files → three micro-batches with
    maxFilesPerTrigger=1, so per-user state genuinely crosses batches."""
    d = tmp_path_factory.mktemp("stateful_events")
    rows = [
        # (user_id, value) spread so users recur across files
        [(1, 10.0), (2, 5.0)],
        [(1, 1.0), (3, 7.0)],
        [(1, 2.0), (2, 3.0), (3, 1.0)],
    ]
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, ["user_id", "value"]).coalesce(1).write.parquet(
            f"{d}/b{i}"
        )
    return str(d)


def test_state_crosses_micro_batches(spark, multi_batch_dir):
    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{multi_batch_dir}/*")
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends each emission; the LAST row per
    # user is the final running total
    rows = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM running_totals
        ) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got[1] == (3, 13.0)
    assert got[2] == (2, 8.0)
    assert got[3] == (2, 8.0)
    # intermediate emissions exist → state was updated across batches
    n_emissions = spark.table("running_totals").count()
    assert n_emissions > len(got)


def test_idle_timeout_arg_wires_the_timeout_conf(spark, multi_batch_dir):
    """idle_timeout_ms plumbs ProcessingTimeTimeout into the plan —
    construction-level pin only. An end-to-end drain is deliberately NOT
    tested: measured on this box, an availableNow drain with a
    processing-time timeout set NEVER terminated (12+ min with a 3 s
    timeout — the engine keeps scheduling batches for pending/fired
    timeouts), which is exactly why the operator docstring scopes the
    option to continuously-running ingest stopped via q.stop()."""
    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{multi_batch_dir}/*")
    )
    out = running_user_totals(stream, idle_timeout_ms=5_000)
    assert out.isStreaming
    plan = out._jdf.queryExecution().logical().toString()
    assert "ProcessingTimeTimeout" in plan
    default = running_user_totals(stream)
    assert "NoTimeout" in default._jdf.queryExecution().logical().toString()

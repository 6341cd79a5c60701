"""Events-table loader.

The testdata ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]) unless
``spark.sql.legacy.parquet.nanosAsLong`` is on — and then the column
arrives as a BIGINT of epoch *nanoseconds*. The loader normalizes to:

* ``ts_ns BIGINT`` — exact epoch nanos (the arithmetic column: window
  bucketing and session gaps use integer ``div`` on it, which is
  bit-identical to DuckDB's ``epoch_ns(ts) //`` — no float in the path);
* ``ts TIMESTAMP`` — microsecond-truncated event time for humans and for
  Structured Streaming (watermarks/windows need a real timestamp type).

Scale note: the conversion is a narrow projection; event-time operators
downstream shuffle on (window, key) as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_PER_MICRO = 1_000
NANOS_PER_SEC = 1_000_000_000
NANOS_PER_HOUR = 3_600 * NANOS_PER_SEC


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events.parquet`` with nano-timestamp normalization.

    Returns ``(event_id, ts_ns BIGINT, ts TIMESTAMP, user_id, event_type,
    value, props)``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        F.col("ts").alias("ts_ns"),
        F.timestamp_micros(F.expr(f"ts div {NANOS_PER_MICRO}")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )

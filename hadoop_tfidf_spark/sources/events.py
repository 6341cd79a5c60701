"""Events-table loader.

The testdata ``events.parquet`` has shipped ``ts`` in two physical forms
across driver generations:

* parquet TIMESTAMP(MICROS) — Spark reads it as TIMESTAMP (or
  TIMESTAMP_NTZ when the file is not adjusted-to-UTC);
* parquet TIMESTAMP(NANOS) — Spark's reader rejects it
  ([PARQUET_TYPE_ILLEGAL]) unless ``spark.sql.legacy.parquet.nanosAsLong``
  is on, and then the column arrives as a BIGINT of epoch *nanoseconds*.

The loader sniffs the actual column type and normalizes BOTH forms to the
same two-column contract:

* ``ts_ns BIGINT`` — exact epoch nanos (the arithmetic column: window
  bucketing and session gaps use integer ``div`` on it, which is
  bit-identical to DuckDB's ``epoch_ns(ts) //`` — no float in the path);
* ``ts TIMESTAMP`` — microsecond event time for humans and for
  Structured Streaming (watermarks/windows need a real timestamp type).

Timezone: the session zone is pinned to UTC here (runtime-settable conf)
so a TIMESTAMP_NTZ→TIMESTAMP cast is wallclock-identity, matching DuckDB's
naive-timestamp ``epoch_ns`` semantics regardless of the host zone.

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
    """Load ``events.parquet`` with timestamp normalization.

    Returns ``(event_id, ts_ns BIGINT, ts TIMESTAMP, user_id, event_type,
    value, props)`` regardless of the file's physical timestamp encoding.
    """
    # Both confs are runtime-settable, so this works under any caller's
    # session (the driver harness builds its own).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) file read as epoch-nanos long
        ts_ns = F.col("ts")
        ts = F.timestamp_micros(F.expr(f"ts div {NANOS_PER_MICRO}"))
    else:  # timestamp / timestamp_ntz
        ts = F.col("ts").cast("timestamp")
        ts_ns = F.unix_micros(ts) * F.lit(NANOS_PER_MICRO)
    return raw.select(
        "event_id",
        ts_ns.alias("ts_ns"),
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )

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

Timezone: every conversion here is session-timezone-INDEPENDENT. A
TIMESTAMP_NTZ column (file not adjusted-to-UTC) is interpreted as UTC
wallclock via integer ``timestampdiff`` from the NTZ epoch — matching
DuckDB's naive-timestamp ``epoch_ns`` semantics — rather than a
``cast(… as timestamp)``, which would bake the *session* zone into the
instant. The loader therefore never touches ``spark.sql.session.timeZone``
(an earlier revision pinned it globally, silently changing timestamp-cast
semantics for every co-resident query in a caller's session).

The one session conf it does set is
``spark.sql.legacy.parquet.nanosAsLong`` — required *before* the scan or
Spark refuses TIMESTAMP(NANOS) files outright, and read-path-scoped: it
only changes how a nanos physical type arrives (BIGINT), never the
semantics of other expressions.

Rendering note: ``ts`` is an instant; collecting it to pandas renders
wallclock in the session zone. ``session.get_spark`` pins UTC so oracle
comparisons see UTC wallclock; callers who bring their own session and
collect raw ``ts`` should do the same (all declared queries compare on
integer ``ts_ns``/epoch columns, which no zone can affect).

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
    # Runtime-settable and read-path-scoped (see module docstring); must be
    # on before the scan or a TIMESTAMP(NANOS) file fails to load at all.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) file read as epoch-nanos long
        ts_ns = F.col("ts")
        ts = F.timestamp_micros(F.expr(f"ts div {NANOS_PER_MICRO}"))
    elif ts_type == "timestamp_ntz":
        # Naive wallclock == UTC by the testdata contract. Integer
        # timestampdiff from the NTZ epoch — exact and independent of
        # spark.sql.session.timeZone (a cast to timestamp is NOT).
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        ts_ns = ts_us * F.lit(NANOS_PER_MICRO)
        ts = F.timestamp_micros(ts_us)
    else:  # timestamp — already an instant; epoch extraction is zone-free
        ts = F.col("ts")
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

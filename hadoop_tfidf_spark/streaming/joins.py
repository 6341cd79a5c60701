"""Stream-stream joins over the events stream.

Structured Streaming's interval join buffers both sides in state and
emits a pair as soon as both rows have arrived; the watermark plus the
time-band condition let Spark evict state once a row can no longer match
(clicks older than watermark + horizon are dropped). This is the
streaming twin of ``operators/relational.click_purchase_interval_join``
— identical pair semantics, which is what the batch-equivalence test
asserts. Both sides truncate event time to WHOLE SECONDS before the band
condition: the batch twin (and its DuckDB oracle) compare on
``ts_ns div 1e9``, so comparing raw microsecond timestamps here would
diverge at boundaries — a purchase sub-second *before* its click inside
the same second pairs in batch but not in stream, and a lag straddling
exactly the horizon can flip either way. Truncating makes the two
definitions equal by construction, not by data luck.

Scale design: state is keyed by user_id via the join's shuffle; the
watermark bounds per-key buffered rows to the horizon window, so state
size tracks event rate × horizon, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_stream_join(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each click to the same user's purchases within ``horizon``
    after it, both sides streaming. Returns
    ``(click_id, purchase_id, user_id, lag_s, purchase_value)``.
    """
    # Whole-second event time = the batch twin's `ts_ns div 1e9` basis (see
    # module docstring). Truncation before the watermark keeps eviction
    # reasoning on the same column the join condition uses.
    sec = F.date_trunc("second", F.col("ts"))
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            sec.alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            sec.alias("p_ts"),
            "value",
        )
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"c_user_id = p_user_id AND p_ts >= c_ts "
            f"AND p_ts <= c_ts + interval {horizon}"
        ),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user_id").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("lag_s"),
        F.round("value", 6).alias("purchase_value"),
    )

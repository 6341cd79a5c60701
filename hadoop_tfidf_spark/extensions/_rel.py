"""Relational / event-window / as-of declared queries (TPC-H-shaped breadth).

Split from the original single-module ``extensions.py`` (round 15) with
block text preserved verbatim; see the package ``__init__`` for the
registry contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from hadoop_tfidf_spark.operators import relational as R
from hadoop_tfidf_spark.sources.events import load_events
from hadoop_tfidf_spark.extensions._base import (
    _tbl,
)



def q_rel_pricing_summary(spark, sf_dir):
    return R.pricing_summary(_tbl(spark, sf_dir, "lineitem"))


def q_rel_revenue_by_region(spark, sf_dir):
    return R.revenue_by_region(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_top_customers(spark, sf_dir):
    return R.top_customers_per_nation(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
    )


def q_rel_acctbal_rollup(spark, sf_dir):
    return R.acctbal_rollup(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_events_tumbling(spark, sf_dir):
    return R.events_tumbling(load_events(spark, sf_dir))


def q_events_sessionize(spark, sf_dir):
    return R.sessionize(load_events(spark, sf_dir))


def q_events_json_props(spark, sf_dir):
    return R.json_props_stats(load_events(spark, sf_dir))


def q_asof_last_purchase(spark, sf_dir):
    """Backward as-of join: each event gets the user's most recent purchase
    value at-or-before its timestamp. Oracle = DuckDB's native ASOF LEFT
    JOIN — an independent implementation checking the union+window one."""
    from hadoop_tfidf_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    # microsecond basis: DuckDB truncates nanosecond parquet timestamps to
    # micros on read, so cross-engine event-time comparisons use ts_us
    ev = ev.withColumn("ts_us", F.expr("ts_ns div 1000"))
    left = ev.select("event_id", "user_id", "ts_us")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("pts"))
        .agg(F.max("value").alias("pval"))
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts_us", right_time="pts",
        right_values=["pval"],
    )
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("pval_asof").alias("last_purchase_value"),
    )


def q_rel_event_pivot(spark, sf_dir):
    return R.event_type_pivot(load_events(spark, sf_dir))


def q_rel_region_year_cube(spark, sf_dir):
    return R.region_year_cube(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_customers_without_orders(spark, sf_dir):
    """Customers with no orders in 1995. Scoped to a year because at every
    driver SF each customer has *some* order — the unscoped variant returns
    the empty set and the gate row would vacuously compare {} to {} (326
    rows at sf0.01 with the year scope)."""
    return R.customers_without_orders(
        _tbl(spark, sf_dir, "customer"), _tbl(spark, sf_dir, "orders"), year=1995
    )


def q_rel_approx_distinct(spark, sf_dir):
    """Sketch-based aggregates — rows-only (no oracle entry: HLL++/GK
    results are approximations; tests/test_relational_ops.py bounds the
    error against exact instead; the hash-gated envelope form is
    ``rel_approx_distinct_bounds``)."""
    return R.approx_distinct_stats(_tbl(spark, sf_dir, "lineitem"))


def q_rel_approx_distinct_bounds(spark, sf_dir):
    """Error-envelope form of the sketch aggregates UNDER the hash gate:
    exact values + in-bounds flags that the oracle asserts are literally 1
    (relational.approx_distinct_bounds) — a sketch drifting past its
    contract flips a flag and fails the row."""
    return R.approx_distinct_bounds(_tbl(spark, sf_dir, "lineitem"))


def q_events_moving_avg(spark, sf_dir):
    return R.user_value_moving_avg(load_events(spark, sf_dir))


def q_rel_repeat_customers(spark, sf_dir):
    return R.repeat_customers(_tbl(spark, sf_dir, "orders"), 1996, 1997)


def q_rel_price_bands(spark, sf_dir):
    return R.price_band_summary(_tbl(spark, sf_dir, "orders"), spark)


def q_rel_order_calendar(spark, sf_dir):
    return R.order_calendar(_tbl(spark, sf_dir, "orders"))


def q_events_click_purchase(spark, sf_dir):
    return R.click_purchase_funnel(load_events(spark, sf_dir))


def q_rel_lapsed_customers(spark, sf_dir):
    return R.lapsed_customers(_tbl(spark, sf_dir, "orders"), 1996, 1997)


def q_rel_grouping_sets(spark, sf_dir):
    return R.segment_region_grouping_sets(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_order_gaps(spark, sf_dir):
    return R.order_gaps(_tbl(spark, sf_dir, "orders"))


def q_rel_acctbal_ntiles(spark, sf_dir):
    return R.acctbal_ntiles(
        _tbl(spark, sf_dir, "customer"), _tbl(spark, sf_dir, "nation")
    )


def q_rel_percentiles(spark, sf_dir):
    return R.price_percentiles(_tbl(spark, sf_dir, "lineitem"))


def q_events_hopping(spark, sf_dir):
    return R.events_hopping(load_events(spark, sf_dir))


def q_rel_parts_with_shipments(spark, sf_dir):
    return R.parts_with_shipments(
        _tbl(spark, sf_dir, "part"), _tbl(spark, sf_dir, "lineitem"), 1995
    )


#: As-of tolerance: purchases older than this (µs) don't carry forward.
ASOF_TOLERANCE_US = 30 * 24 * 3600 * 1_000_000


def q_asof_last_purchase_30d(spark, sf_dir):
    """Tolerance-bounded as-of join: the matched purchase value is kept
    only when it is at most 30 days old at event time (the standard
    tolerance/staleness knob of time-series as-of joins). The match time
    rides along as a second as-of value column; the tolerance is a
    post-join projection, so the join dataflow is identical to the
    unbounded variant."""
    from hadoop_tfidf_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    left = ev.select("event_id", "user_id", "ts_us")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts_us").alias("pts"))
        .agg(F.max("value").alias("pval"))
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts_us", right_time="pts",
        right_values=["pval", "pts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(
            F.col("pts_asof") >= F.col("ts_us") - F.lit(ASOF_TOLERANCE_US),
            F.col("pval_asof"),
        ).alias("recent_purchase_value"),
    )


def q_events_time_rollup(spark, sf_dir):
    return R.events_time_rollup(load_events(spark, sf_dir))


def q_rel_market_share(spark, sf_dir):
    return R.nation_market_share(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_rel_status_priority(spark, sf_dir):
    return R.status_priority_mix(
        _tbl(spark, sf_dir, "lineitem"), _tbl(spark, sf_dir, "orders")
    )


def q_rel_returned_top(spark, sf_dir):
    return R.returned_item_customers(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "lineitem"),
        _tbl(spark, sf_dir, "nation"),
    )


def q_events_range_frame(spark, sf_dir):
    return R.events_range_frame(load_events(spark, sf_dir))


def q_events_user_extremes(spark, sf_dir):
    return R.user_event_extremes(load_events(spark, sf_dir))


def q_rel_orders_above_avg(spark, sf_dir):
    return R.orders_above_customer_avg(_tbl(spark, sf_dir, "orders"))


def q_asof_next_event(spark, sf_dir):
    """FORWARD as-of join: each order gets the customer's next event
    at-or-after the order date (first touch after purchase decision) —
    the direction="forward" path of operators/asof.asof_join. Oracle =
    a min()-over-join SQL formulation (DuckDB ASOF is backward-only), an
    independent implementation of the same semantics."""
    from hadoop_tfidf_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    orders = _tbl(spark, sf_dir, "orders")
    # Tz-free date→epoch-µs (days × 86400e6): a cast-to-timestamp would
    # bake the session zone into the as-of comparison point.
    left = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
            * F.lit(86_400_000_000)
        ).alias("ots_us"),
    )
    # unique per (user, ts): earliest event_id wins a same-µs tie
    right = ev.groupBy("user_id", F.col("ts_us").alias("ets_us")).agg(
        F.min("event_id").alias("next_event_id")
    )
    out = asof_join(
        left, right, on="user_id", left_time="ots_us", right_time="ets_us",
        right_values=["next_event_id"], direction="forward",
    )
    return out.select(
        "o_orderkey",
        "user_id",
        F.col("next_event_id_asof").cast("bigint").alias("next_event_id"),
    )


def q_events_interval_join(spark, sf_dir):
    return R.click_purchase_interval_join(load_events(spark, sf_dir))

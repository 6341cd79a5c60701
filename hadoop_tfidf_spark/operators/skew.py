"""Skew-mitigation primitives (SURVEY.md §4 P12, §7 step 7).

AQE's skew-join splitting handles most runtime skew automatically (it's on
in ``session.get_spark``); these helpers cover the cases AQE can't:
aggregations whose single hot key would overwhelm one reducer even after
map-side partial aggregation (e.g. ``collect_list``/``collect_set`` state,
or extreme-cardinality combiners), and joins against a known-skewed key
distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    salt_buckets: int = 32,
    merge: str = "sum",
) -> DataFrame:
    """Two-phase salted aggregation for an algebraic aggregate: phase 1
    aggregates on (key, random salt) so a hot key spreads over
    ``salt_buckets`` reducers; phase 2 merges the partials per key.

    ``merge`` must be the combine function of the phase-1 aggregate (sum
    for sum/count, max for max, …) — only algebraic aggregates qualify.

    NOTE: plain ``sum``/``count``/``min``/``max`` do NOT need this (partial
    aggregation already collapses them map-side); use it when phase-1 is
    something with per-key state that partial agg can't bound, or when a
    single hot key's final-agg row count (= number of map partitions)
    still overwhelms one task at extreme cluster sizes.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    merge_fn = getattr(F, merge)
    return phase1.groupBy(key).agg(merge_fn("_partial").alias(alias))


def skewed_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
) -> DataFrame:
    """Manual hot-key split join for when AQE's skew splitting isn't
    available (e.g. a non-shuffle join input): route the known-hot keys
    through a broadcast join and the long tail through the normal path,
    then union. ``hot_keys`` typically comes from a cheap
    ``approx_count_distinct``/top-k profiling pass."""
    is_hot = F.col(key).isin(hot_keys)
    hot = fact.where(is_hot).join(
        F.broadcast(dim.where(F.col(key).isin(hot_keys))), key
    )
    cold = fact.where(~is_hot).join(dim.where(~F.col(key).isin(hot_keys)), key)
    return hot.unionByName(cold)

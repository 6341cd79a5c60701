"""Deterministic content-addressed sampling — the reproducible form of
corpus subsetting a training-data pipeline needs (train/test splits,
ablation subsets, QA samples).

``df.sample()``/``sampleBy()`` are seed-deterministic only for a fixed
partitioning — a repartition, AQE re-plan, or engine change reshuffles the
sample. Hashing the document KEY instead makes membership a pure function
of the data: stable across engines (md5-based, DuckDB-reproducible),
re-runs, partitionings, and incremental ingests (a doc's split never
changes when more data arrives — critical for contamination-free eval
splits). Pure projection + filter: no shuffle, pushed to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_tfidf_spark.functions.hashing import hex_to_long, seeded_md5


def hash_bucket_col(key: Column, buckets: int = 100, seed: int | str = 0) -> Column:
    """Stable bucket in ``[0, buckets)`` from any key column:
    ``md5("{seed}:{key}") → first 15 hex → mod buckets``."""
    return hex_to_long(seeded_md5(seed, key.cast("string"))) % F.lit(buckets)


def hash_sample(
    df: DataFrame, key: str, pct: int, seed: int | str = 0
) -> DataFrame:
    """Keep rows whose key hashes into the first ``pct`` of 100 buckets —
    a deterministic ~pct% sample."""
    return df.where(hash_bucket_col(F.col(key), 100, seed) < pct)


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    stratum: Column | str,
    rates: dict[str, int],
    seed: int | str = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its key's hash
    bucket is below the stratum's percentage (``rates[stratum]``; strata
    absent from ``rates`` are dropped). The content-addressed analogue of
    ``df.sampleBy`` — same membership on every engine/partitioning/rerun,
    and a doc's verdict never changes as other data arrives. The typical
    pretraining use: downsample the over-represented language/domain while
    keeping the rare stratum intact.

    Pure projection + filter (the stratum CASE and the md5 bucket are
    row-local); pushable to the scan like :func:`hash_sample`.
    """
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    bucket = hash_bucket_col(F.col(key), 100, seed)
    rate = None
    for name in sorted(rates):
        cond = s == name
        rate = (
            F.when(cond, rates[name])
            if rate is None
            else rate.when(cond, rates[name])
        )
    rate = rate.otherwise(F.lit(0)) if rate is not None else F.lit(0)
    return df.where(bucket < rate)


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int],
    seed: int | str = 0,
) -> DataFrame:
    """Label each row with a split name from cumulative bucket ranges,
    e.g. ``{"train": 90, "valid": 5, "test": 5}`` (must sum to 100).
    Returns the input plus a ``split`` column; membership is a pure
    function of the key, so later ingests never move earlier docs between
    splits."""
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = hash_bucket_col(F.col(key), 100, seed)
    expr = None
    lo = 0
    for name, width in splits.items():
        cond = (bucket >= lo) & (bucket < lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr)

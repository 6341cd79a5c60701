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


def mixture_weights(docs: DataFrame, strata: list[str] | None = None) -> DataFrame:
    """Data-mixture accounting for pretraining: per stratum (default
    ``(source, lang)``) document and token counts, the stratum's share of
    all corpus tokens, and the resampling weight that would flatten the
    mixture to UNIFORM across observed strata (``weight > 1`` ⇒ upsample
    the rare domain, ``< 1`` ⇒ downsample the dominant crawl — the
    mixture-reweighting step every corpus recipe starts from, cf. The Pile
    / Gopher per-source weights). Feed the weights to
    :func:`stratified_hash_sample` to materialize the resampled corpus.

    One hash aggregation keyed on the (low-cardinality) strata — partial
    aggregation means the shuffle carries one row per (partition, stratum),
    not per doc. The corpus totals come from an unpartitioned WINDOW over
    the strata-sized aggregation output (one task over tens of rows —
    benign), NOT from a separate totals-aggregate branch: the aggregation
    is a plan diamond and Spark recomputes diamonds, so the
    crossJoin(totals) form scanned the corpus twice. Output is
    strata-sized (tiny) regardless of corpus size; one corpus pass.
    """
    from pyspark.sql import Window

    strata = strata or ["source", "lang"]
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    groups = (
        docs.groupBy(*strata)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(n_tokens).cast("bigint").alias("n_tokens"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    total_tokens = F.sum("n_tokens").over(w).cast("bigint")
    n_strata = F.count("*").over(w).cast("bigint")
    return groups.select(
        *strata,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / total_tokens, 6).alias("token_share"),
        F.round(
            total_tokens / (n_strata * F.col("n_tokens")), 6
        ).alias("uniform_weight"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_buckets: int = 8,
    partition_by: list[str] | None = None,
    shuffle_seed: int | str | None = None,
) -> DataFrame:
    """Deterministic sequence packing: assign each document to a training
    pack of ~``budget`` tokens. Docs are sharded into ``n_buckets`` by
    :func:`hash_bucket_col` over ``doc_id`` (md5-based — works for ANY id
    type; a ``doc_id % n_buckets`` formulation silently casts string ids
    to NULL under ANSI-off engines, landing the whole corpus in ONE null
    bucket and serializing it through a single window task, and throws
    CAST_INVALID_INPUT under Spark 4 ANSI), ordered by ``doc_id`` within
    the shard, and packed contiguously: a doc's pack is
    ``floor(tokens_before / budget)``
    of the running token count before it (a doc may straddle a boundary —
    the standard concat-then-chunk packing of GPT-style pretraining, where
    sequences are cut at exactly ``budget`` tokens regardless of doc
    edges). Output: ``(doc_id, bucket, pack_id, n_tokens,
    offset_in_pack)`` — all integers, bit-stable on any engine.

    Scale: packing is inherently sequential *within* a shard (each pack id
    depends on the running sum), so the operator parallelizes ACROSS
    shards — one window per bucket, each a sort + linear pass. At 100 TB
    raise ``n_buckets`` to ~the cluster's task count; real pipelines pack
    per output shard exactly like this because a single global order would
    serialize the whole corpus through one task. ``partition_by`` adds
    outer packing partitions ahead of the bucket — e.g. ``["split"]``
    packs each train/valid/test split independently (a doc never shares
    a pack with another split's doc), the layout a training loader
    actually consumes. ``shuffle_seed`` orders docs within each shard by
    ``md5("{seed}:{doc_id}")`` instead of ``doc_id`` — the deterministic
    global shuffle a training loader wants (every engine/partitioning/
    rerun packs the same order; change the seed to re-deal).
    """
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    from pyspark.sql import Window

    extra = list(partition_by or [])
    order = (
        [F.col("_ord"), F.col("doc_id")]
        if shuffle_seed is not None
        else [F.col("doc_id")]
    )
    w = (
        Window.partitionBy(*extra, "bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id",
            *extra,
            hash_bucket_col(F.col("doc_id"), n_buckets).cast("bigint").alias("bucket"),
            n_tokens.cast("bigint").alias("n_tokens"),
            *(
                [
                    hex_to_long(
                        seeded_md5(shuffle_seed, F.col("doc_id").cast("string"))
                    ).alias("_ord")
                ]
                if shuffle_seed is not None
                else []
            ),
        )
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
        )
        .select(
            "doc_id",
            *extra,
            "bucket",
            F.floor(F.col("cum_before") / budget).cast("bigint").alias("pack_id"),
            "n_tokens",
            (F.col("cum_before") % budget).cast("bigint").alias("offset_in_pack"),
        )
    )

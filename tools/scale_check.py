"""Empirical scale validation: measure headline families at 1× (sf0.1)
and R× (a derived replicated corpus) and report wall times, per-family
scaling exponents, and plan-shape stability.

The 100 TB claims elsewhere in this repo ride on plan census + asymptotic
argument; this tool converts them to measurement. The derived corpus
replicates sf0.1 R times with re-keyed ids; replicas > 0 get every token
suffixed with ``_r<k>`` so the per-replica duplicate / near-duplicate
structure is preserved exactly (the dedup workload grows linearly in the
input) while no shingle or vocabulary collides across replicas — cross-
replica near-dup clusters would quadratically inflate the PAIR data
semantics, which would measure the fixture, not the engine. Embeddings
replicate with re-keyed ``vec_id`` (identical vectors: cells get R×
denser uniformly, ties broken deterministically by id).

Timing is END-TO-END per family: query construction (eager index builds
included — at scale the build IS part of the cost) + full
materialization to the noop sink, min over ``--trials`` runs with the
cache cleared between.

The scaling exponent ``alpha = log(T_R / T_1) / log(R)``: 1.0 = linear,
< 1 = sublinear (fixed overheads amortizing), > 1 = superlinear (the
round-13 fix list). Plan shape (shuffles / joins / cartesians) is
censused at both scales; a family whose plan CHANGES shape with data
size is flagged (AQE strategy flips are legitimate but must be seen).

Usage: python tools/scale_check.py [replicas] [trials]
Prints ONE JSON line; SCALE.md records the adjudicated results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_FAMILIES = [
    # full reference pipeline: tokens → tf-idf → search → per-query rank
    "rank",
    # banded MinHash near-dup (shingle → signature → band join)
    "dedup_minhash_lsh",
    # ANN with an eager coarse-Lloyd build + probe-bounded byte scan
    "sim_topk_ivfsq",
    # lang-id → quality → exact dedup → near-dup → split, one lazy plan
    "pipeline_curate",
]
#: Override with SPARK_GRAFT_SCALE_FAMILIES=a,b,c — e.g. the round-12
#: second sweep added text_dsir (hashed-bigram selection),
#: dedup_span_sliding (span-granular exact dedup) and multimodal_decode
#: (the Arrow binary path) on the same derived corpora.
FAMILIES = os.environ.get(
    "SPARK_GRAFT_SCALE_FAMILIES", ",".join(DEFAULT_FAMILIES)
).split(",")
PLAN_FIELDS = (
    "shuffle_exchanges",
    "broadcast_hash_joins",
    "sort_merge_joins",
    "cartesian_products",
    "nested_loop_joins",
)


def build_replicated(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    """Materialize the R× derived corpus (documents + embeddings only —
    the measured families touch nothing else)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_r"), F.col("rep")),
            )
        )
        .alias("text"),
        "lang",
        "source",
    )
    big_docs = big_docs.withColumn("n_chars", F.length("text"))
    big_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    n_vecs = emb.agg(F.max("vec_id")).first()[0] + 1
    emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * n_vecs).alias("vec_id"),
        "embedding",
        "label",
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def measure(spark, queries, sf_dir: str, trials: int) -> tuple[dict, dict]:
    from hadoop_tfidf_spark.plans.inspect import plan_stats

    times: dict[str, float] = {}
    shapes: dict[str, dict] = {}
    for name in FAMILIES:
        best = None
        for _ in range(trials):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
            spark.catalog.clearCache()
        times[name] = round(best, 3)
        stats = plan_stats(queries[name](spark, sf_dir))
        shapes[name] = {f: getattr(stats, f) for f in PLAN_FIELDS}
        spark.catalog.clearCache()
    return times, shapes


def main() -> None:
    import math

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from hadoop_tfidf_spark.session import get_spark

    spark = get_spark(app_name="hadoop_tfidf_spark_scale_check")
    queries = entrymod.queries()

    out_dir = f"/tmp/spark_graft_scale_{replicas}x"
    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        build_replicated(spark, BASE_DIR, out_dir, replicas)

    # Untimed warmup pass: one full run of every family at 1× so JVM/
    # codegen/JIT warmup isn't billed to whichever scale runs first
    # (measured: without this the 1× pass absorbs ALL first-call JIT and
    # the exponents come out negative).
    for name in FAMILIES:
        queries[name](spark, BASE_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    t1, shape1 = measure(spark, queries, BASE_DIR, trials)
    tR, shapeR = measure(spark, queries, out_dir, trials)

    report = {
        "metric": "scale_check",
        "base_dir": BASE_DIR,
        "replicas": replicas,
        "trials": trials,
        "t_1x": t1,
        f"t_{replicas}x": tR,
        "alpha": {
            name: round(
                math.log(tR[name] / t1[name]) / math.log(replicas), 3
            )
            for name in FAMILIES
        },
        "plan_shape_stable": {
            name: shape1[name] == shapeR[name] for name in FAMILIES
        },
        "plan_shape_1x": shape1,
        f"plan_shape_{replicas}x": shapeR,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()

"""Empirical scale validation for the update-mode ledgers: measure
latest-row-per-key reconstruction cost as the generation count grows
(10× steps), then the same reconstruction after ``compact_ledger`` folds
history into one base generation.

The update twins (``streaming_source_stats_update``,
``streaming_phash_dedup_update``) reconstruct state as a window over ALL
generations, so an always-on stream's read cost grows with commit count
forever — SCALE.md asserted that shape scale-safe but unmeasured; this
tool measures it and prices the compaction policy. The synthetic ledger
mirrors the governance twins' grain: ``n_keys`` strata keys, each
generation upserting a ``delta_frac`` random-ish (hash-derived,
deterministic) subset — so ledger rows = generations × keys × delta_frac,
exactly the "ledger is delta-sized, never corpus-sized" contract.

Reported per generation count G: reconstruction wall time over the full
ledger, generation-dir count, ledger row count, then the same after
``compact_ledger(through=G-2)`` (policy: keep the newest generation as
the live delta, fold everything older). The scaling exponent
``alpha = log(T_G2/T_G1) / log(G2/G1)`` prices the no-compaction path;
``t_compacted`` is what the policy buys back.

Usage: python tools/ledger_scale_check.py [gens...] [--keys N] [--policy N]
Defaults: gens 10 100 1000, 2000 keys, 10% delta. ``--policy N`` builds
each ledger through ``ledger_upsert(compact_every=N)`` instead — the
shipped round-14 steady-state path — and reports the (flat) read cost
an always-on stream actually pays. Prints ONE JSON line;
SCALE.md records the adjudicated results. Run EXCLUSIVELY (no concurrent
Spark timing jobs).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_ledger(
    spark,
    sink: str,
    gens: int,
    n_keys: int,
    delta_frac: float,
    compact_every: int | None = None,
):
    """Deterministic synthetic ledger: generation g upserts the keys with
    ``hash-ish(k, g) < delta_frac`` (plus key g mod n_keys, so no
    generation is empty). One parquet write per generation — the same
    physical layout ``ledger_upsert`` produces, without paying a
    streaming query per generation. ``compact_every`` routes through the
    sink's own fold policy — the round-14 steady-state path."""
    from pyspark.sql import functions as F

    from hadoop_tfidf_spark.streaming.ledger import ledger_upsert

    up = ledger_upsert(
        sink,
        keys=["k"] if compact_every is not None else None,
        compact_every=compact_every,
    )
    keys = spark.range(n_keys).withColumnRenamed("id", "k")
    cut = int(delta_frac * 1_000_000)
    for g in range(gens):
        delta = keys.where(
            (F.abs(F.hash(F.col("k"), F.lit(g))) % 1_000_000 < cut)
            | (F.col("k") == g % n_keys)
        ).select(
            "k",
            (F.col("k") * 1000 + g).cast("bigint").alias("n_docs"),
            (F.col("k") + g).cast("bigint").alias("n_tokens"),
        )
        up(delta, g)


def time_reconstruct(spark, sink: str, trials: int) -> tuple[float, int]:
    from hadoop_tfidf_spark.streaming.ledger import (
        read_ledger,
        reconstruct_latest,
    )

    best, n_rows = None, 0
    for _ in range(trials):
        t0 = time.time()
        df = reconstruct_latest(read_ledger(spark, sink), ["k"])
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.time() - t0
        best = elapsed if best is None else min(best, elapsed)
        n_rows = read_ledger(spark, sink).count()
    return round(best, 3), n_rows


def main() -> None:
    n_keys, delta_frac, trials, policy = 2000, 0.1, 2, None
    usage = "usage: ledger_scale_check.py [gens...] [--keys N] [--policy N]"
    args = sys.argv[1:]
    for flag in ("--keys", "--policy"):
        if flag in args:
            i = args.index(flag)
            try:
                v = int(args[i + 1])
            except (IndexError, ValueError):
                sys.exit(usage)
            if flag == "--keys":
                n_keys = v
            else:
                if v < 1:
                    sys.exit("--policy must be >= 1")
                policy = v
            del args[i : i + 2]
    if not all(a.isdigit() for a in args):
        sys.exit(usage)
    gens_list = [int(a) for a in args] or [10, 100, 1000]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from hadoop_tfidf_spark.session import get_spark
    from hadoop_tfidf_spark.streaming.ledger import (
        compact_ledger,
        ledger_generations,
    )

    spark = get_spark(app_name="hadoop_tfidf_spark_ledger_scale")
    results = {}
    # untimed warmup so the first measured leg doesn't absorb JIT
    warm = f"/tmp/spark_graft_ledger_warm"
    shutil.rmtree(warm, ignore_errors=True)
    build_ledger(spark, warm, 5, n_keys, delta_frac)
    time_reconstruct(spark, warm, 1)

    for gens in gens_list:
        sink = f"/tmp/spark_graft_ledger_{gens}"
        shutil.rmtree(sink, ignore_errors=True)
        if policy is not None:
            # the shipped steady-state path: the SINK folds itself every
            # `policy` commits — measure what an always-on stream's read
            # actually costs after `gens` commits (should be flat in
            # gens, bounded by policy+1 generations)
            t0 = time.time()
            build_ledger(
                spark, sink, gens, n_keys, delta_frac, compact_every=policy
            )
            t_build = round(time.time() - t0, 3)
            t_rec, rows = time_reconstruct(spark, sink, trials)
            results[str(gens)] = {
                "t_build_with_policy": t_build,
                "t_reconstruct": t_rec,
                "ledger_rows": rows,
                "generations_on_disk": len(ledger_generations(sink)),
            }
            continue
        build_ledger(spark, sink, gens, n_keys, delta_frac)
        t_full, rows_full = time_reconstruct(spark, sink, trials)
        folded = compact_ledger(spark, sink, ["k"], through=gens - 2)
        t_comp, rows_comp = time_reconstruct(spark, sink, trials)
        results[str(gens)] = {
            "t_reconstruct": t_full,
            "ledger_rows": rows_full,
            "folded_generations": folded,
            "generations_after_compact": len(ledger_generations(sink)),
            "t_reconstruct_compacted": t_comp,
            "ledger_rows_compacted": rows_comp,
        }

    alphas = {}
    for lo, hi in zip(gens_list, gens_list[1:]):
        a = math.log(
            results[str(hi)]["t_reconstruct"]
            / results[str(lo)]["t_reconstruct"]
        ) / math.log(hi / lo)
        alphas[f"{lo}->{hi}"] = round(a, 3)

    print(
        json.dumps(
            {
                "metric": "ledger_scale_check",
                "policy": policy,
                "n_keys": n_keys,
                "delta_frac": delta_frac,
                "trials": trials,
                "per_gens": results,
                ("alpha_with_policy" if policy is not None else "alpha_uncompacted"): alphas,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Skew stress for the word-keyed paths (SURVEY.md §4 P12).

The synthetic corpus can't exhibit the 100 TB skew point naturally — its
vocabulary is 31 words that ALL have df ≈ 0.8·N (every word is a
stopword). This tool derives a corpus with a realistic shape: every
token is suffixed with a doc-group id (``_g<doc_id % GROUPS>``), giving
a long tail of GROUPS×31 words with df ≈ 0.8·N/GROUPS each, then ONE
unsuffixed boilerplate token is appended to HOT_PCT of docs — the
stopword-grade hot key whose df dwarfs the tail.

Measured on that fixture:

1. ``doc_frequency`` vs ``doc_frequency_salted`` — the count-shaped agg.
   Expected result: parity. Map-side partial aggregation already
   collapses the hot key to one row per map partition, so salting buys
   nothing here; the salted variant exists for aggregates partial-agg
   can't bound (collect_set-grade state). The measurement pins that
   claim instead of asserting it.
2. ``doc_similarity`` uncapped vs ``df_cap`` — the QUADRATIC skew point:
   the within-word self-join emits ~df²/2 pairs per word, so the one
   hot key contributes (HOT_PCT·N)²/2 pairs against the tail's
   GROUPS·(0.8N/GROUPS)²/2. ``df_cap`` prunes the hot word before the
   join (its idf weight is near-zero anyway); the wall-time delta IS
   the cost of the skew and the census row shows whether AQE's
   skew-join splitting engaged on the uncapped run (``skew=true``
   markers in the executed plan).

Usage: python tools/skew_check.py [hot_pct] [groups] [trials]
Prints ONE JSON line; SCALE.md records the adjudicated numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_WORD = "boilerplateterm"
DF_CAP = 1000


def build_skewed(spark, src_dir: str, out_dir: str, hot_pct: int, groups: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    skewed = docs.select(
        "doc_id",
        F.concat(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_g"), F.col("doc_id") % groups),
            ),
            F.when(
                F.col("doc_id") % 100 < hot_pct, F.lit(f" {HOT_WORD}")
            ).otherwise(F.lit("")),
        ).alias("text"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))
    skewed.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def timed(df, trials: int) -> float:
    best = None
    for _ in range(trials):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
        df.sparkSession.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    hot_pct = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 97
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from hadoop_tfidf_spark.declared import _tfidf_rounded
    from hadoop_tfidf_spark.search import doc_similarity
    from hadoop_tfidf_spark.session import get_spark

    spark = get_spark(app_name="hadoop_tfidf_spark_skew_check")
    queries = entrymod.queries()
    out_dir = f"/tmp/spark_graft_skew_{hot_pct}p_{groups}g"
    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        build_skewed(spark, BASE_DIR, out_dir, hot_pct, groups)

    # fixture facts: the hot key's df vs the tail
    from pyspark.sql import functions as F

    df_rows = queries["doc_frequency"](spark, out_dir)
    hot_df = df_rows.where(F.col("word") == HOT_WORD).first()["df"]
    tail_max = (
        df_rows.where(F.col("word") != HOT_WORD).agg(F.max("df")).first()[0]
    )

    # untimed warmup (JIT order-bias guard, same rationale as scale_check)
    for name in ("doc_frequency", "doc_frequency_salted"):
        queries[name](spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    t_df = timed(queries["doc_frequency"](spark, out_dir), trials)
    t_df_salted = timed(queries["doc_frequency_salted"](spark, out_dir), trials)

    t = _tfidf_rounded(spark, out_dir)
    uncapped = doc_similarity(t, k=100)
    capped = doc_similarity(t, k=100, df_cap=DF_CAP)
    uncapped.write.format("noop").mode("overwrite").save()  # warmup
    spark.catalog.clearCache()
    t_uncapped = timed(uncapped, trials)
    t_capped = timed(capped, trials)

    # AQE skew census, on the FINALIZED plan (plans/inspect.executed_plan
    # collects so the inspected AdaptiveSparkPlan is the one that ran — a
    # noop write finalizes a COPY and leaves this one isFinalPlan=false,
    # which silently reports skew=false; measured, then fixed here).
    from hadoop_tfidf_spark.plans.inspect import executed_plan

    aqe_skew = "skew=true" in executed_plan(
        doc_similarity(_tfidf_rounded(spark, out_dir), k=100)
    )

    # Mechanism probe, two parts. At production thresholds the hot
    # partition here is far below 256 MB so the split correctly stays
    # off; lowering the thresholds to toy-scale values, disabling
    # broadcast and raising shuffle partitions (so the hot key's
    # partition stands out against the median) must make AQE split a
    # skewed partition — IF the join is eligible. Two probes:
    # (a) the word self-join: NEVER eligible — both children read the
    #     SAME exchange (ReusedExchange), and OptimizeSkewedJoin cannot
    #     split one consumer of a shared shuffle. For the quadratic
    #     pair join AQE cannot save you even in principle — df_cap (the
    #     near-zero-idf cut) is the ONLY defense. Expected: false.
    # (b) a word-keyed fact⋈dim join with an INDEPENDENT dim exchange
    #     (vocab-sized, built from collected rows): eligible — expected
    #     true, proving the guardrail engages when partition stats
    #     qualify. Confs are runtime-settable; restored after.
    demo_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "512",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {}
    for k, v in demo_confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        self_join_plan = executed_plan(
            doc_similarity(_tfidf_rounded(spark, out_dir), k=100)
        )
        aqe_demo_self = "skew=true" in self_join_plan

        from hadoop_tfidf_spark.corpus import SPACE_TOKEN_PATTERN, tokenize
        from hadoop_tfidf_spark.tfidf import doc_frequency, doc_word_count

        docs = spark.read.parquet(f"{out_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        dwc = doc_word_count(tokenize(docs, SPACE_TOKEN_PATTERN))
        vocab = [
            (r["word"], r["df"]) for r in doc_frequency(dwc).collect()
        ]
        dim = spark.createDataFrame(vocab, "word STRING, df BIGINT")
        dim_join_plan = executed_plan(
            dwc.join(dim, "word").select("word", "doc_id", "n", "df")
        )
        aqe_demo_dim = "skew=true" in dim_join_plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    print(
        json.dumps(
            {
                "metric": "skew_check",
                "base_dir": BASE_DIR,
                "hot_pct": hot_pct,
                "groups": groups,
                "trials": trials,
                "hot_df": hot_df,
                "tail_max_df": tail_max,
                "doc_frequency_plain_s": t_df,
                "doc_frequency_salted_s": t_df_salted,
                "doc_similarity_uncapped_s": t_uncapped,
                "doc_similarity_df_cap_s": t_capped,
                "df_cap": DF_CAP,
                "aqe_skew_split_engaged": aqe_skew,
                "aqe_demo_self_join_split": aqe_demo_self,
                "aqe_demo_dim_join_split": aqe_demo_dim,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced to full materialization with the noop sink (no
driver-side collect cost, no result-size bias). The reported ``value`` is
total wall-clock seconds across the headline set; per-query seconds are in
``queries``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

#: The headline set: the full core TF-IDF pipeline plus one representative
#: query per extension family. The remaining declared queries still run in
#: the correctness gate (they're all in queries()); keeping the bench set
#: curated bounds wall-clock and keeps the timing signal per-family.
HEADLINE = [
    # core pipeline (reference parity)
    "tokens", "doc_word_count", "term_frequency", "doc_frequency",
    "tfidf", "search", "rank", "tfidf_rank",
    # end-to-end corpus curation (lang→quality→dedup→near-dup→split)
    "pipeline_curate",
    # modern ranking (Okapi BM25 over the same corpus + query literals)
    "search_bm25",
    # dedup family (minhash twice: free-running + megabucket cap engaged,
    # so the 100 TB safety valve's sizes-agg + filter-join has a timing row)
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_capped",
    "dedup_simhash", "dedup_embedding",
    # similarity search
    "sim_topk_brute", "sim_topk_lsh",
    # text analysis
    "text_quality", "text_fingerprint",
    # multimodal (Arrow mapInPandas path)
    "multimodal_decode",
    # relational / events
    "rel_pricing_summary", "rel_revenue_by_region", "rel_top_customers",
    "events_sessionize", "asof_last_purchase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hadoop_tfidf_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="hadoop_tfidf_spark_bench")

    queries = entrymod.queries()
    timings: dict[str, float] = {}

    # JVM/codegen warmup on the smallest table so the first measured query
    # doesn't pay one-time session costs.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    names = [n for n in HEADLINE if n in queries]
    for name in names:
        best = None
        for _ in range(trials):
            df = queries[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
            # queries may persist shared intermediates (tfidf dwc, shingle
            # sets); drop them so memory stays flat across the whole set,
            # no query is timed against another's cache, and trial 2
            # rebuilds from scratch (min-of-N damps host-contention noise)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
